package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Deterministic synthetic chain (FIXTURES.md §3): event logs spanning
  * [EPOCH, EPOCH+2500) so a full catch-up needs >=3 batch splits at
  * JOB_BLOCK_BATCH_SIZE=1000. Planted cases: REQUIRED-violating rows
  * (null listing_id), foreign-address noise, empty blocks.
  */
object ChainFixture {
  val Epoch = 10014455L                 // main.py:29
  val Span = 2500L

  /** JSON-escape a string for embedding as a JSON string value. */
  private def jesc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c => c.toString
  }

  def listingPayload(id: Long, bad: Boolean): String = {
    val lid = if (bad) "null" else "\"listing-" + id + "\""
    s"""{"listing_id": $lid, "ipfs_hash": "Qm$id", "listing_type": "unit", "category": "cat${id % 7}", "subcategory": null, "language": "en", "title": "item $id", "description": "desc $id", "price": ${(id % 100) + 0.5}, "currency": "ETH"}"""
  }

  def catalogPayload(id: Long, nProducts: Int): String = {
    val products = (0 until nProducts).map { p =>
      s"""{"product_id": "p$id-$p", "external_id": "x$p", "parent_external_id": null, "title": "prod $p", "description": "pd $p", "price": ${100 + p}, "currency": "USD", "option1": "s", "option2": null, "option3": null, "image": "img$p"}"""
    }.mkString(",")
    s"""{"listing_id": "dshop-$id", "ipfs_path": "/dshop/$id", "products": [$products]}"""
  }

  private def line(block: Long, logIndex: Long, addr: String, topic: String,
      payload: Option[String]): String = {
    val p = payload.map(s => "\"" + jesc(s) + "\"").getOrElse("null")
    s"""{"block_number": $block, "log_index": $logIndex, "address": "$addr", "topic0": "$topic", "payload": $p}"""
  }

  def write(dir: Path, headBlock: Long = Epoch + Span - 1): Unit = {
    Files.createDirectories(dir)
    val sb = new StringBuilder
    var b = Epoch
    while (b < Epoch + Span) {
      val logType = b % 10
      if (logType < 4) { // marketplace listing event
        val bad = b % 50 == 3 // planted REQUIRED violation
        sb.append(line(b, 0, EtlJob.MarketplaceAddr, EtlJob.MarketplaceTopic,
          Some(listingPayload(b, bad)))).append('\n')
      } else if (logType < 6) { // dshop catalog event with 3 products
        sb.append(line(b, 1, EtlJob.MarketplaceAddr, EtlJob.DshopTopic,
          Some(catalogPayload(b, 3)))).append('\n')
      } else if (logType < 8) { // noise: foreign contract
        sb.append(line(b, 2, "0x_other", "Transfer", None)).append('\n')
      } // else: empty block (no logs)
      b += 1
    }
    Files.write(dir.resolve("blocks.ndjson"),
      sb.toString.getBytes(StandardCharsets.UTF_8))
    setHead(dir, headBlock)
  }

  def setHead(dir: Path, headBlock: Long): Unit =
    Files.write(dir.resolve("head.json"),
      s"""{"latest_block": $headBlock}""".getBytes(StandardCharsets.UTF_8))

  /** Expected (valid, rejected) marketplace rows for blocks <= maxBlock. */
  def expectedMarketplace(maxBlock: Long): (Long, Long) = {
    var valid = 0L; var bad = 0L
    var b = Epoch
    while (b <= math.min(maxBlock, Epoch + Span - 1)) {
      if (b % 10 < 4) { if (b % 50 == 3) bad += 1 else valid += 1 }
      b += 1
    }
    (valid, bad)
  }

  def expectedDshopRows(maxBlock: Long): Long = {
    var n = 0L
    var b = Epoch
    while (b <= math.min(maxBlock, Epoch + Span - 1)) {
      if (b % 10 >= 4 && b % 10 < 6) n += 3
      b += 1
    }
    n
  }
}
