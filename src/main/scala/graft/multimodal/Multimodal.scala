package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media payloads as
  * opaque BINARY columns + typed metadata struct, with decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, batch-shaped partition processing,
  * partition sizing — is real and tested. The actual codec call is a
  * STUB (this container has no image/audio libraries): `decodeStub`
  * derives deterministic fake features from the bytes. In production
  * that one function body becomes the JNI/library call (or the stage
  * moves to `mapInPandas` on PySpark with the same batch contract);
  * nothing else changes.
  *
  * Scale notes: media rows are orders of magnitude wider than text rows
  * — the media table is partitioned so a partition holds
  * ~targetPartitionBytes of payload (not a fixed row count), and
  * feature extraction is mapPartitions so codec initialization is paid
  * once per partition, not per row.
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, duration_ms: Long)

  final case class MediaRow(
      doc_id: Long, media_type: String, content: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long, checksum: Long,
      embedding: Array[Float])

  /** Build a deterministic media table over the documents fixture:
    * payload = the doc's text bytes, modality cycling by doc_id.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val mt = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val meta = mt match {
          case "image" => MediaMeta("png", 64 + (id % 16).toInt * 64,
            64 + (id % 9).toInt * 64, 0L)
          case "audio" => MediaMeta("wav", 0, 0, 1000L + (id % 60) * 1000L)
          case _ => MediaMeta("mp4", 1280, 720, 2000L + (id % 30) * 1000L)
        }
        MediaRow(id, mt, text.getBytes("UTF-8"), meta)
      }
  }

  /** STUB decode: a real implementation calls the codec here. The fake
    * is deterministic in the payload bytes so tests are stable.
    */
  private[multimodal] def decodeStub(row: MediaRow): MediaFeatures = {
    val crc = new java.util.zip.CRC32
    crc.update(row.content)
    val sum = crc.getValue
    // fake 8-dim "embedding" derived from byte statistics
    val emb = Array.tabulate(8) { i =>
      val slice = row.content.iterator.drop(i).grouped(8).map(_.head)
      var acc = 0L; var n = 0
      slice.foreach { b => acc += (b & 0xff); n += 1 }
      if (n == 0) 0f else (acc.toFloat / n / 255f)
    }
    MediaFeatures(row.doc_id, row.media_type, row.content.length.toLong, sum, emb)
  }

  /** Feature extraction: batch-shaped mapPartitions — the codec (stub)
    * is initialized once per partition; rows stream through it.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init goes here (stub has none)
      it.map(decodeStub)
    }
  }

  /** Frame sampling for video: one row per sampled frame index at the
    * given fps — a generator (explode) over the metadata, no decode.
    */
  def frameSample(media: Dataset[MediaRow], everyMs: Long = 1000L): DataFrame =
    media.toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs)))
          .as("frame_ms"))

  /** Resize: pure metadata transform (the pixel work happens in the
    * decode stage of a real pipeline).
    */
  def resizeMeta(media: Dataset[MediaRow], maxDim: Int): DataFrame =
    // explicit floor: `/` is double division and a bare cast-to-int
    // truncates in Spark but ROUNDS in a double->int cast elsewhere
    // (DuckDB) — floor() makes the scaling semantics engine-portable
    media.toDF().withColumn("meta",
      when(col("media_type") === "image" &&
        greatest(col("meta.width"), col("meta.height")) > maxDim,
        struct(
          col("meta.format"),
          floor(col("meta.width") * maxDim /
            greatest(col("meta.width"), col("meta.height"))).cast("int").as("width"),
          floor(col("meta.height") * maxDim /
            greatest(col("meta.width"), col("meta.height"))).cast("int").as("height"),
          col("meta.duration_ms")))
        .otherwise(col("meta")))

  /** Repartition so each partition carries ~targetBytes of payload —
    * the knob that matters for wide binary rows at 100 TB.
    */
  def sizeByPayload(media: Dataset[MediaRow], targetBytes: Long): Dataset[MediaRow] = {
    val total = media.toDF()
      .agg(sum(length(col("content")))).head.getLong(0)
    val parts = math.max(1, (total / targetBytes).toInt)
    media.repartition(parts)
  }
}
