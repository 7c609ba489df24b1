package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Instant

/** Durable single-row stream cursor — the Spark-native stand-in for the
  * reference's Postgres etl_cursor table (main.py:118-142, migration
  * 6278201ba186). Same fields, same contract: read at startup, written
  * only after a fully successful cycle (main.py:209-216), so a failed
  * cycle replays its whole range (at-least-once, main.py:217-220).
  *
  * Durability: write-to-temp + atomic rename, so a crash mid-write
  * leaves the previous cursor intact (the Postgres transaction analog).
  */
final class Cursor(path: Path) {

  def read(): Option[Long] =
    if (!Files.exists(path)) None
    else {
      val s = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      """"block_number"\s*:\s*(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    }

  def write(blockNumber: Long): Unit = {
    val now = Instant.now().toString
    val createdAt = if (Files.exists(path)) {
      val s = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      """"created_at"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(s)
        .map(_.group(1)).getOrElse(now)
    } else now
    val json =
      s"""{"id": 1, "block_number": $blockNumber, "created_at": "$createdAt", "updated_at": "$now"}"""
    val tmp = Paths.get(path.toString + ".tmp")
    Files.createDirectories(path.toAbsolutePath.getParent)
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

object Cursor {
  def apply(dir: String): Cursor = new Cursor(Paths.get(dir, "etl_cursor.json"))
}
