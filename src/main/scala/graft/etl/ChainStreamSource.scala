package graft.etl

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util
import scala.jdk.CollectionConverters._

/** DataSource V2 micro-batch stream over the chain fixture — the
  * production shape of reference P1-P4 (SURVEY §4.2 "Block-range
  * micro-batch source"): offsets are block numbers, `latestOffset`
  * applies the 4-block confirmation lag (P2), and each micro-batch is
  * planned as ceil(range/1000) input partitions of <=1000 blocks (P4,
  * JOB_BLOCK_BATCH_SIZE — "Alchemy's limit", main.py:34-35), so
  * extraction parallelism scales with the cluster instead of the
  * reference's fixed 5 threads. In production the PartitionReader's
  * body is an eth_getLogs RPC per split; here it reads the fixture
  * NDJSON, which keeps the planning/offset/commit machinery identical.
  *
  * Usage:
  *   spark.readStream.format("graft.etl.ChainStreamSource")
  *     .option("chainDir", dir).option("startBlock", epoch)
  *     .option("blockLag", 4).option("batchSize", 1000).load()
  *
  * Checkpointed offsets make restart-resume exact: Spark persists the
  * last committed block (the etl_cursor analog) in the checkpoint log.
  */
class ChainStreamSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.chainLog

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChainTable(new CaseInsensitiveStringMap(properties))
}

final class ChainTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"chain(${options.get("chainDir")})"
  override def schema(): StructType = Schemas.chainLog
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = Schemas.chainLog
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ChainMicroBatchStream(
          chainDir = opts.get("chainDir"),
          startBlock = opts.getLong("startBlock", 10014455L),
          blockLag = opts.getLong("blockLag", 4L),
          batchSize = opts.getLong("batchSize", 1000L))
    }
}

final case class BlockOffset(block: Long) extends Offset {
  override def json(): String = block.toString
}

final case class BlockRangePartition(from: Long, to: Long, chainDir: String)
  extends InputPartition

final class ChainMicroBatchStream(
    chainDir: String, startBlock: Long, blockLag: Long, batchSize: Long)
    extends MicroBatchStream {

  /** P1+P2: head probe capped by the confirmation lag. */
  override def latestOffset(): Offset = {
    val src = scala.io.Source.fromFile(s"$chainDir/head.json")
    val head =
      try """"latest_block"\s*:\s*(\d+)""".r.findFirstMatchIn(src.mkString)
        .map(_.group(1).toLong).getOrElse(startBlock - 1)
      finally src.close()
    BlockOffset(math.max(startBlock - 1, head - blockLag))
  }

  override def initialOffset(): Offset = BlockOffset(startBlock - 1)

  override def deserializeOffset(json: String): Offset = BlockOffset(json.toLong)

  /** P4: split the micro-batch range into <=batchSize-block partitions. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[BlockOffset].block + 1
    val to = end.asInstanceOf[BlockOffset].block
    if (to < from) Array.empty
    else (from to to by batchSize).map { lo =>
      BlockRangePartition(lo, math.min(lo + batchSize - 1, to), chainDir)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[BlockRangePartition]
      new ChainPartitionReader(p)
    }

  override def commit(end: Offset): Unit = () // checkpoint log is the cursor
  override def stop(): Unit = ()
}

/** Reads one block-range split. Production: one bounded eth_getLogs
  * call per split; fixture: filter the NDJSON by range.
  */
final class ChainPartitionReader(p: BlockRangePartition)
    extends PartitionReader[InternalRow] {

  private val lineRe =
    """"block_number"\s*:\s*(\d+)\s*,\s*"log_index"\s*:\s*(\d+)\s*,\s*"address"\s*:\s*"([^"]*)"\s*,\s*"topic0"\s*:\s*"([^"]*)"\s*,\s*"payload"\s*:\s*(null|".*")\s*}""".r

  /** One left-to-right pass over the escapes ChainFixture.jesc emits
    * (\" \\ \n) — sequential .replace() calls both missed \n (batch and
    * streaming readers diverged on newline payloads) and could corrupt
    * adjacent escapes (\\n is a backslash + 'n', not a newline).
    */
  private def unescape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => b.append('"')
          case '\\' => b.append('\\')
          case 'n'  => b.append('\n')
          case other => b.append('\\').append(other)
        }
        i += 2
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  // lazy line iterator — no whole-file materialization; the source is
  // closed in close() after Spark drains the reader
  private val src = scala.io.Source.fromFile(s"${p.chainDir}/blocks.ndjson")
  private val it =
    src.getLines().flatMap { line =>
      lineRe.findFirstMatchIn(line).flatMap { m =>
        val block = m.group(1).toLong
        if (block < p.from || block > p.to) None
        else {
          val payload = m.group(5) match {
            case "null" => null
            case quoted =>
              UTF8String.fromString(unescape(quoted.substring(1, quoted.length - 1)))
          }
          Some(InternalRow(block, m.group(2).toLong,
            UTF8String.fromString(m.group(3)), UTF8String.fromString(m.group(4)),
            payload))
        }
      }
    }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (it.hasNext) { current = it.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = src.close()
}
