package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: media payloads as
  * opaque BINARY columns + typed metadata struct, with decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The payloads carry REAL container structure: each media row's bytes
  * begin with a genuine format header — PNG signature + IHDR chunk
  * (CRC-valid), RIFF/WAVE fmt+data chunks, MP4 ftyp + moov/mvhd boxes
  * — built deterministically from the row's metadata, followed by the
  * document's text bytes as the (fake) sample data. `decode` parses
  * those headers back with a pure-JVM byte walk: the width/height/
  * duration features come from the ACTUAL payload bytes, exactly the
  * work a production header-sniff stage does. Only the sample-data
  * decode (pixels, PCM frames — which would need codec libraries this
  * container doesn't ship) remains fake: the embedding is a
  * deterministic byte-statistics fold standing in for the model call.
  * In production that one fold becomes the JNI/library call (or the
  * stage moves to `mapInPandas` on PySpark with the same batch
  * contract); nothing else changes.
  *
  * Scale notes: media rows are orders of magnitude wider than text rows
  * — the media table is partitioned so a partition holds
  * ~targetPartitionBytes of payload (not a fixed row count), and
  * feature extraction is mapPartitions so codec initialization is paid
  * once per partition, not per row. Header parsing never touches more
  * than the first ~140 bytes of a payload.
  */
object Multimodal {

  final case class MediaMeta(
      format: String, width: Int, height: Int, duration_ms: Long)

  final case class MediaRow(
      doc_id: Long, media_type: String, content: Array[Byte], meta: MediaMeta)

  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long, checksum: Long,
      embedding: Array[Float], parsed_format: String, parsed_width: Int,
      parsed_height: Int, parsed_duration_ms: Long)

  // ------------------------------------------------------- byte builders

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** PNG signature + CRC-valid IHDR (8-bit truecolor), then payload
    * standing in for the compressed IDAT stream. Header = 33 bytes.
    */
  private[multimodal] def pngBytes(width: Int, height: Int,
      payload: Array[Byte]): Array[Byte] = {
    val body = ascii("IHDR") ++ be32(width.toLong) ++ be32(height.toLong) ++
      Array[Byte](8, 2, 0, 0, 0)
    val crc = new java.util.zip.CRC32
    crc.update(body)
    PngSig ++ be32(13) ++ body ++ be32(crc.getValue) ++ payload
  }

  private val WavByteRate = 16000L // 8 kHz mono 16-bit PCM

  /** RIFF/WAVE header (fmt + data chunk declarations) whose declared
    * data size encodes the duration at 8 kHz mono 16-bit, then payload
    * standing in for the PCM frames. Header = 44 bytes.
    */
  private[multimodal] def wavBytes(durationMs: Long,
      payload: Array[Byte]): Array[Byte] = {
    val dataSize = durationMs * WavByteRate / 1000L
    ascii("RIFF") ++ le32(36L + dataSize) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16L) ++ le16(1) ++ le16(1) ++ le32(8000L) ++
      le32(WavByteRate) ++ le16(2) ++ le16(16) ++
      ascii("data") ++ le32(dataSize) ++ payload
  }

  /** MP4 ftyp box + moov/mvhd (timescale 1000, so duration == ms),
    * then payload standing in for the mdat box. Header = 132 bytes.
    */
  private[multimodal] def mp4Bytes(durationMs: Long,
      payload: Array[Byte]): Array[Byte] = {
    val mvhd = be32(108L) ++ ascii("mvhd") ++
      be32(0L) ++ // version + flags
      be32(0L) ++ be32(0L) ++ // ctime, mtime
      be32(1000L) ++ be32(durationMs) ++ // timescale, duration
      be32(0x00010000L) ++ // rate 1.0
      Array.fill[Byte](76)(0) // volume+reserved+matrix+predefined+next_track
    val moov = be32(8L + mvhd.length) ++ ascii("moov") ++ mvhd
    val ftyp = be32(16L) ++ ascii("ftyp") ++ ascii("isom") ++ be32(0L)
    ftyp ++ moov ++ payload
  }

  /** Per-format header size prepended to the text payload — xm1's
    * oracle accounts for these constants.
    */
  val HeaderBytes: Map[String, Int] =
    Map("image" -> 33, "audio" -> 44, "video" -> 132)

  /** Build a deterministic media table over the documents fixture:
    * payload = a real format header (built from the metadata) followed
    * by the doc's text bytes, modality cycling by doc_id.
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
        val payload = text.getBytes("UTF-8")
        val content = mt match {
          case "image" => pngBytes(meta.width, meta.height, payload)
          case "audio" => wavBytes(meta.duration_ms, payload)
          case _ => mp4Bytes(meta.duration_ms, payload)
        }
        MediaRow(id, mt, content, meta)
      }
  }

  // -------------------------------------------------------- header parse

  // All offsets are Longs with explicit [0, length] guards: size
  // fields are UNSIGNED 32-bit, so a corrupt payload can declare
  // sizes >= 0x80000000 that would wrap an Int offset negative and
  // turn the never-throw parse into a crash (or a zero-advance hang).
  private def rbe32(b: Array[Byte], off: Long): Long =
    if (off < 0 || off + 4 > b.length) -1L
    else {
      val i = off.toInt
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    }

  private def rle32(b: Array[Byte], off: Long): Long =
    if (off < 0 || off + 4 > b.length) -1L
    else {
      val i = off.toInt
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    }

  private def tag(b: Array[Byte], off: Long): String =
    if (off < 0 || off + 4 > b.length) ""
    else new String(b, off.toInt, 4, "US-ASCII")

  /** Result of a container-header parse: the metadata fields plus
    * `headerLen`, the offset where the SAMPLE DATA begins — the bytes
    * a real pixel/PCM decoder would consume. Unknown formats carry
    * headerLen 0 (the whole payload is "sample").
    */
  final case class ParsedHeader(format: String, width: Int, height: Int,
      durationMs: Long, headerLen: Int)

  private val Unknown = ParsedHeader("unknown", 0, 0, 0L, 0)

  /** Sniff + parse a payload's container header. Unrecognized or
    * truncated bytes parse as `Unknown` — a decode stage must never
    * throw on a corrupt payload.
    */
  private[multimodal] def parseHeader(b: Array[Byte]): ParsedHeader = {
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
        tag(b, 12) == "IHDR") {
      // sample (IDAT stand-in) starts after sig + IHDR chunk:
      // 8 + (4 len + 4 tag + body + 4 crc), body length from the file
      val ihdrLen = rbe32(b, 8) // unsigned: in [0, 2^32)
      val w = rbe32(b, 16)
      val h = rbe32(b, 20)
      // PNG dims are 31-bit and nonzero by spec; a mutated header can
      // carry values whose Int narrowing goes NEGATIVE — downstream
      // features must never see a negative geometry, so out-of-spec
      // dims classify the payload as unknown (fuzz-asserted)
      if (w < 1 || w > Int.MaxValue || h < 1 || h > Int.MaxValue) Unknown
      else ParsedHeader("png", w.toInt, h.toInt, 0L,
        math.min(b.length.toLong, 20L + ihdrLen).toInt)
    } else if (tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE") {
      // chunk walk: byte rate from 'fmt ', declared size from 'data';
      // the PCM sample region starts right after the data declaration.
      // Long offsets: each step advances by >= 8, so the walk always
      // terminates and never goes negative, whatever sizes claim.
      var off = 12L
      var byteRate = -1L
      var dataSize = -1L
      var dataOff = -1L
      while (off + 8 <= b.length && (byteRate < 0 || dataSize < 0)) {
        val id = tag(b, off)
        val sz = rle32(b, off + 4)
        if (id == "fmt " && off + 16 + 4 <= b.length)
          byteRate = rle32(b, off + 16)
        if (id == "data") { dataSize = sz; dataOff = off + 8 }
        off += 8 + math.max(0L, sz) // data is last; walk stops there
      }
      if (byteRate > 0 && dataSize >= 0)
        ParsedHeader("wav", 0, 0, dataSize * 1000L / byteRate,
          math.min(b.length.toLong, dataOff).toInt)
      else Unknown
    } else if (tag(b, 4) == "ftyp") {
      // top-level box walk to moov, then child walk to mvhd; the mdat
      // stand-in starts where the moov box ends. Long offsets with
      // >= 8 advance per step — see the RIFF note.
      var off = 0L
      var out: Option[Long] = None
      var hdrEnd = 0
      while (out.isEmpty && off + 8 <= b.length) {
        val sz = rbe32(b, off)
        if (tag(b, off + 4) == "moov") {
          var c = off + 8
          val end = math.min(b.length.toLong, off + math.max(8L, sz))
          while (out.isEmpty && c + 8 <= end) {
            val csz = rbe32(b, c)
            if (tag(b, c + 4) == "mvhd" && c + 28 <= b.length) {
              val timescale = rbe32(b, c + 20)
              val duration = rbe32(b, c + 24)
              if (timescale > 0) {
                out = Some(duration * 1000L / timescale)
                hdrEnd = end.toInt
              }
            }
            c += math.max(8L, csz)
          }
        }
        if (sz < 8) off = b.length.toLong // malformed: stop
        else off += sz
      }
      out.map(d => ParsedHeader("mp4", 1280, 720, d, hdrEnd))
        .getOrElse(Unknown)
    } else Unknown
  }

  /** Decode one media row from the REAL payload bytes: parse the
    * container header, then derive the 8-dim feature vector from the
    * PARSE RESULT — dims 0-2 encode the parsed geometry
    * (width/4096, height/4096, duration_s/256: exactly the fields
    * xm5 hash-certifies, so MultimodalSpec ties features to the
    * audited parse), dims 3-7 are strided byte means over the SAMPLE
    * REGION only (the bytes after the parsed header — what a real
    * pixel/PCM decoder would consume; a corrupt payload has
    * headerLen 0 and features over everything). The stats fold is
    * the one piece standing in for a model call — in production it
    * becomes the JNI/library invocation with the same per-partition
    * batch contract; everything feeding it is real parsed payload.
    */
  private[multimodal] def decode(row: MediaRow): MediaFeatures = {
    val crc = new java.util.zip.CRC32
    crc.update(row.content)
    val sum = crc.getValue
    val p = parseHeader(row.content)
    val from = math.min(math.max(p.headerLen, 0), row.content.length)
    val emb = new Array[Float](8)
    emb(0) = p.width / 4096f
    emb(1) = p.height / 4096f
    emb(2) = p.durationMs / 1000f / 256f
    var i = 0
    while (i < 5) {
      var acc = 0L; var n = 0; var j = from + i
      while (j < row.content.length) {
        acc += row.content(j) & 0xff; n += 1; j += 5
      }
      emb(3 + i) = if (n == 0) 0f else acc.toFloat / n / 255f
      i += 1
    }
    MediaFeatures(row.doc_id, row.media_type, row.content.length.toLong,
      sum, emb, p.format, p.width, p.height, p.durationMs)
  }

  /** Feature extraction: batch-shaped mapPartitions — codec state is
    * initialized once per partition; rows stream through it.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec init goes here (the header parser needs
      // none; a real pixel/PCM decoder would allocate here)
      it.map(decode)
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
      .agg(sum(length(col("content")))).head().getLong(0)
    val parts = math.max(1, (total / targetBytes).toInt)
    media.repartition(parts)
  }
}
