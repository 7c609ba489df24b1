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
  * document's text bytes as the sample data. `decode` parses those
  * headers back with a pure-JVM byte walk: the width/height/duration
  * features come from the ACTUAL payload bytes, exactly the work a
  * production header-sniff stage does.
  *
  * The REAL-codec path (`encodedMediaTable` / `decodeSamples` /
  * `extractFeaturesReal`, below) goes further: image rows are complete
  * deflate-compressed PNGs decoded back through `javax.imageio`, audio
  * rows real 16-bit PCM WAVs decoded by the RIFF chunk walk — both
  * with nothing but the JDK, and both hash-certified end to end
  * against a DuckDB recompute of the planted pixel/PCM rules (xm6).
  * Video rows are complete YUV4MPEG2 streams — the uncompressed-frame
  * interchange format needs no H.264 codec, a byte walk IS the decoder
  * — so every modality's sample decode is real and hash-certified
  * (xm6 for image/audio, xm7 for video). A production compressed-video
  * stage swaps the byte walk for the JNI/library call (or moves to
  * `mapInPandas` on PySpark with the same batch contract); nothing
  * else changes.
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

  // ---------------------------------------------- real codecs (PNG / PCM)

  /** Planted pixel rule for the REAL-codec image fixture: every channel
    * value is a closed-form function of (x, y, doc_id), so a DuckDB
    * oracle can recompute the exact channel sums/extrema arithmetically
    * while the Spark side must recover them through a genuine PNG
    * encode (java.util.zip.Deflater) -> decode (javax.imageio) round
    * trip. All values land in [0, 255] by construction.
    */
  @inline def pixR(x: Int, y: Int, id: Long): Int =
    ((x * 7 + y * 13 + id) % 256).toInt
  @inline def pixG(x: Int, y: Int, id: Long): Int =
    ((x * 3 + y * 5 + id * 2) % 256).toInt
  @inline def pixB(x: Int, y: Int, id: Long): Int =
    ((x + y + id * 3) % 256).toInt

  /** Real-codec image dims — small on purpose (the codec cost per row
    * is the point, not payload bulk): w in [8, 68], h in [8, 40].
    */
  @inline def encWidth(id: Long): Int = 8 + (id % 16).toInt * 4
  @inline def encHeight(id: Long): Int = 8 + (id % 9).toInt * 4

  /** Planted PCM rule: 16-bit signed samples in [-2048, 2047], again a
    * closed form of (i, doc_id) so the oracle recomputes sums exactly.
    */
  @inline def pcmSample(i: Int, id: Long): Int =
    ((id * 31 + i * 17) % 4096).toInt - 2048

  /** Sample count for the real-PCM fixture: multiple of 8 so the
    * duration the 8 kHz mono 16-bit header declares (n/8 ms) is exact.
    */
  @inline def encSamples(id: Long): Int = 400 + (id % 60).toInt * 40

  private def chunk(tag4: String, body: Array[Byte]): Array[Byte] = {
    val tb = ascii(tag4) ++ body
    val crc = new java.util.zip.CRC32
    crc.update(tb)
    be32(body.length.toLong) ++ tb ++ be32(crc.getValue)
  }

  /** A complete, decodable PNG: IHDR + one IDAT holding the deflate of
    * filter-0 truecolor scanlines of the planted pixel rule + IEND.
    * Pure JDK (Deflater); PNG is lossless, so a decoder must read back
    * the exact planted values.
    */
  private[multimodal] def pngEncode(id: Long): Array[Byte] = {
    val w = encWidth(id); val h = encHeight(id)
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0
    while (y < h) {
      val base = y * (1 + w * 3) // raw(base) = 0: filter None
      var x = 0
      while (x < w) {
        val o = base + 1 + x * 3
        raw(o) = pixR(x, y, id).toByte
        raw(o + 1) = pixG(x, y, id).toByte
        raw(o + 2) = pixB(x, y, id).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++ Array[Byte](8, 2, 0, 0, 0)
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** A real PCM WAV: the standard 44-byte header (8 kHz mono 16-bit)
    * whose declared data size exactly covers the little-endian samples
    * of the planted rule.
    */
  private[multimodal] def wavEncode(id: Long): Array[Byte] = {
    val n = encSamples(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = pcmSample(i, id)
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    wavBytes(n.toLong / 8L, pcm) // 16000 B/s => n/8 ms spans n samples
  }

  /** Real-codec media table: image rows are complete deflate-compressed
    * PNGs, audio rows real 16-bit PCM WAVs — both decodable with
    * nothing but the JDK — and video rows complete YUV4MPEG2 streams
    * (the uncompressed-frame interchange format: no H.264 codec
    * needed, a byte walk IS the decoder). Modality cycles doc_id % 3
    * exactly like mediaTable.
    */
  def encodedMediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // The sf fixtures are single-row-group parquet, so the scan is ONE
    // split and the per-row encode (Deflater) would run single-threaded;
    // spread rows across cores first. At 100 TB the scan is thousands
    // of splits and this is a no-op-sized narrow shuffle (same remedy
    // as Ctx.documents).
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .map { case (id, text) =>
        (id % 3) match {
          case 0 =>
            MediaRow(id, "image", pngEncode(id),
              MediaMeta("png", encWidth(id), encHeight(id), 0L))
          case 1 =>
            MediaRow(id, "audio", wavEncode(id),
              MediaMeta("wav", 0, 0, encSamples(id) / 8L))
          case _ =>
            MediaRow(id, "video", y4mEncode(id),
              MediaMeta("y4m", vidWidth(id), vidHeight(id),
                vidFrames(id) * 40L)) // 25 fps
        }
      }
  }

  /** Exact per-row sample statistics out of a REAL decode: channel
    * sums/extrema over ImageIO-decoded pixels (image), signed-sample
    * sums/extrema over the PCM data chunk (audio). Integer math only —
    * the numbers a DuckDB oracle recomputes from the planted rules.
    * s1/s2/s3 = R/G/B channel sums (audio: s1 = sample sum, s2 = abs
    * sum); mn/mx over channel 1 (audio: over samples).
    */
  final case class SampleStats(doc_id: Long, media_type: String,
      fmt: String, width: Int, height: Int, n_samples: Long,
      s1: Long, s2: Long, s3: Long, mn: Int, mx: Int)

  /** Decode one REAL payload with the JDK's own codecs. Corrupt or
    * unsupported payloads yield fmt="unknown" with zeroed stats — a
    * decode stage never throws.
    */
  private[multimodal] def decodeSamples(id: Long, mt: String,
      content: Array[Byte]): SampleStats = {
    val bad = SampleStats(id, mt, "unknown", 0, 0, 0L, 0L, 0L, 0L, 0, 0)
    try {
      val p = parseHeader(content)
      p.format match {
        case "png" =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(content))
          if (img == null) bad
          else {
            val raster = img.getRaster
            val w = img.getWidth; val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var mn = 255; var mx = 0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val r = raster.getSample(x, y, 0)
                sr += r; sg += raster.getSample(x, y, 1)
                sb += raster.getSample(x, y, 2)
                if (r < mn) mn = r
                if (r > mx) mx = r
                x += 1
              }
              y += 1
            }
            SampleStats(id, mt, "png", w, h, w.toLong * h, sr, sg, sb, mn, mx)
          }
        case "wav" =>
          // PCM region = [headerLen, headerLen + declared data size);
          // every 2 bytes one little-endian signed 16-bit sample
          val from = p.headerLen
          val n = math.min(
            (content.length - from) / 2, (p.durationMs * 16L / 2L).toInt)
          if (n <= 0) bad
          else {
            var s = 0L; var sa = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
            var i = 0
            while (i < n) {
              val o = from + i * 2
              val v = ((content(o) & 0xff) | (content(o + 1) << 8)).toShort.toInt
              s += v; sa += math.abs(v)
              if (v < mn) mn = v
              if (v > mx) mx = v
              i += 1
            }
            SampleStats(id, mt, "wav", 0, 0, n.toLong, s, sa, 0L, mn, mx)
          }
        case _ => bad
      }
    } catch { case _: Throwable => bad }
  }

  // --------------------------------------------------- raw video (y4m)

  /** Raw-video fixture geometry/rules (xm7): YUV4MPEG2 is the
    * uncompressed-frame interchange format (ffmpeg/mjpegtools) — a
    * plain ASCII stream header, then per frame a FRAME marker and the
    * raw planes. C444 keeps all three planes full-resolution so the
    * closed-form pixel rules recompute exactly in SQL.
    */
  @inline def vidWidth(id: Long): Int = 8 + (id % 8).toInt * 4
  @inline def vidHeight(id: Long): Int = 8 + (id % 6).toInt * 4
  @inline def vidFrames(id: Long): Int = 2 + (id % 4).toInt
  @inline def vidY(x: Int, y: Int, f: Int, id: Long): Int =
    ((x * 7 + y * 13 + f * 19 + id) % 256).toInt
  @inline def vidU(x: Int, y: Int, f: Int, id: Long): Int =
    ((x * 3 + y * 5 + f * 7 + id * 2) % 256).toInt
  @inline def vidV(x: Int, y: Int, f: Int, id: Long): Int =
    ((x + y + f * 3 + id * 3) % 256).toInt

  /** A complete YUV4MPEG2 stream: `YUV4MPEG2 W<w> H<h> F25:1 Ip A1:1
    * C444\n` then per frame `FRAME\n` + Y, U, V planes (w*h bytes
    * each) of the planted rules. Decodable by any y4m consumer.
    */
  private[multimodal] def y4mEncode(id: Long): Array[Byte] = {
    val w = vidWidth(id); val h = vidHeight(id); val nf = vidFrames(id)
    val hdr = ascii(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C444\n")
    val frameMark = ascii("FRAME\n")
    val out = new java.io.ByteArrayOutputStream(
      hdr.length + nf * (frameMark.length + 3 * w * h))
    out.write(hdr, 0, hdr.length)
    var f = 0
    while (f < nf) {
      out.write(frameMark, 0, frameMark.length)
      var plane = 0
      while (plane < 3) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            out.write(plane match {
              case 0 => vidY(x, y, f, id)
              case 1 => vidU(x, y, f, id)
              case _ => vidV(x, y, f, id)
            })
            x += 1
          }
          y += 1
        }
        plane += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Raw-video table over the video-assigned docs (doc_id % 3 = 2,
    * the same modality cycling as mediaTable/encodedMediaTable).
    */
  def rawVideoTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .filter(col("doc_id") % 3 === 2)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .map { id =>
        MediaRow(id, "video", y4mEncode(id),
          MediaMeta("y4m", vidWidth(id), vidHeight(id),
            vidFrames(id) * 40L)) // 25 fps => 40 ms/frame
      }
  }

  /** Decode one y4m payload by plain byte walk: parse the ASCII stream
    * header (W/H/C tokens), require C444, then fold every frame's
    * planes. s1/s2/s3 = Y/U/V sums over ALL frames, mn/mx over the Y
    * plane, n_samples = w*h*frames (per plane). Corrupt/truncated/
    * non-444 input yields fmt="unknown" — a decode stage never throws.
    */
  private[multimodal] def decodeVideo(id: Long,
      content: Array[Byte]): SampleStats = {
    val bad = SampleStats(id, "video", "unknown", 0, 0, 0L, 0L, 0L, 0L, 0, 0)
    try {
      val nl = content.indexOf('\n'.toByte)
      if (nl <= 0) return bad
      val hdr = new String(content, 0, nl, "US-ASCII")
      val toks = hdr.split(" ")
      if (toks.isEmpty || toks(0) != "YUV4MPEG2") return bad
      def tag(c: Char): Option[String] =
        toks.find(t => t.nonEmpty && t.head == c).map(_.tail)
      val w = tag('W').map(_.toInt).getOrElse(return bad)
      val h = tag('H').map(_.toInt).getOrElse(return bad)
      // Only full-res planes are decoded here; an ABSENT C tag means
      // 4:2:0 by the y4m spec, so it must be present and 444 — a
      // C-less stream parsed as 4:4:4 would read garbage plane sums.
      if (!tag('C').contains("444")) return bad
      if (w <= 0 || h <= 0) return bad
      val plane = w * h
      val frameMark = "FRAME".getBytes("US-ASCII")
      var off = nl + 1
      var nf = 0
      var sy = 0L; var su = 0L; var sv = 0L
      var mn = 255; var mx = 0
      while (off < content.length) {
        // FRAME line (parameters until newline allowed by the spec)
        if (off + frameMark.length > content.length ||
            !frameMark.indices.forall(i => content(off + i) == frameMark(i)))
          return bad
        val fnl = content.indexOf('\n'.toByte, off)
        if (fnl < 0 || fnl + 1 + 3 * plane > content.length) return bad
        var o = fnl + 1
        var i = 0
        while (i < plane) { // Y
          val v = content(o + i) & 0xff
          sy += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        o += plane
        i = 0
        while (i < plane) { su += content(o + i) & 0xff; i += 1 } // U
        o += plane
        i = 0
        while (i < plane) { sv += content(o + i) & 0xff; i += 1 } // V
        off = o + plane
        nf += 1
      }
      if (nf == 0) bad
      else SampleStats(id, "video", "y4m", w, h, plane.toLong * nf,
        sy, su, sv, mn, mx)
    } catch { case _: Throwable => bad }
  }

  /** Raw-video sample-decode stage — the xm7 scan: one byte walk per
    * row, no shuffle until the caller's output sort.
    */
  def videoDecodeStats(media: Dataset[MediaRow]): Dataset[SampleStats] = {
    import media.sparkSession.implicits._
    media.filter(r => r.media_type == "video")
      .mapPartitions(_.map(r => decodeVideo(r.doc_id, r.content)))
  }

  // ------------------------------------------------- MJPEG (xm8)

  /** MJPEG fixture geometry/rules (xm8): the COMPRESSED-codec half of
    * the video boundary y4m sidesteps. MJPEG is a stream of complete
    * baseline JPEG frames (the raw/HTTP MJPEG form; AVI wraps the
    * same frames) — the one compressed video codec a bare JDK can
    * decode, via `javax.imageio`'s JPEG reader.
    *
    * JPEG is lossy, so the closed-form-oracle trick needs planted
    * content the codec reproduces BIT-EXACTLY: grayscale frames that
    * are CONSTANT PER 8x8 BLOCK. Baseline JPEG codes each 8x8 block
    * independently (DC differences are entropy-coded losslessly); a
    * constant block has only a DC coefficient, which the default
    * luminance quantization reproduces exactly for every value
    * 0..255 — verified exhaustively (all 256 values, mixed-block
    * images) against the JDK codec in MultimodalSpec. The oracle
    * recomputes stats per (block, frame) and scales by the 64 pixels
    * each block contributes.
    */
  @inline def mjBlocksW(id: Long): Int = 1 + (id % 4).toInt // 8..32 px
  @inline def mjBlocksH(id: Long): Int = 1 + (id % 3).toInt // 8..24 px
  @inline def mjFrames(id: Long): Int = 1 + (id % 3).toInt
  @inline def mjVal(bx: Int, by: Int, f: Int, id: Long): Int =
    ((bx * 31 + by * 57 + f * 19 + id) % 256).toInt

  /** One MJPEG stream: `mjFrames` concatenated baseline JPEGs of the
    * block-constant planted rule.
    */
  private[multimodal] def mjpegEncode(id: Long): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val wB = mjBlocksW(id); val hB = mjBlocksH(id)
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < mjFrames(id)) {
      val img = new java.awt.image.BufferedImage(
        wB * 8, hB * 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var by = 0
      while (by < hB) {
        var bx = 0
        while (bx < wB) {
          val v = mjVal(bx, by, f, id)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              raster.setSample(bx * 8 + x, by * 8 + y, 0, v)
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      javax.imageio.ImageIO.write(img, "jpg", out)
      f += 1
    }
    out.toByteArray
  }

  /** MJPEG table over the video-assigned docs (doc_id % 3 = 2, the
    * modality cycling of mediaTable/encodedMediaTable).
    */
  def mjpegVideoTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
      .filter(col("doc_id") % 3 === 2)
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .map { id =>
        MediaRow(id, "video", mjpegEncode(id),
          MediaMeta("mjpeg", mjBlocksW(id) * 8, mjBlocksH(id) * 8,
            mjFrames(id) * 40L)) // 25 fps => 40 ms/frame
      }
  }

  /** Decode one MJPEG stream: split at frame boundaries (EOI, FF D9 —
    * byte stuffing guarantees a raw FF inside entropy data is
    * followed by 00 or a restart marker, so EOI cannot appear inside
    * a frame's scan), decode each complete JPEG with the JDK codec,
    * and fold luma stats: s1 = Σv, s2 = Σv², s3 = Σ v·(frame+1) (the
    * frame-weighted sum that catches frame-order mistakes). Frames
    * must agree on dimensions; corrupt/misshapen input folds to
    * 'unknown', never throws.
    */
  private[multimodal] def decodeMjpeg(id: Long,
      content: Array[Byte]): SampleStats = {
    val bad = SampleStats(id, "video", "unknown", 0, 0, 0L, 0L, 0L, 0L, 0, 0)
    try {
      if (content.length < 4 ||
          (content(0) & 0xff) != 0xff || (content(1) & 0xff) != 0xd8)
        return bad
      var s1 = 0L; var s2 = 0L; var s3 = 0L
      var mn = 255; var mx = 0
      var w = -1; var h = -1
      var nf = 0
      var start = 0
      var i = 0
      while (i + 1 < content.length) {
        if ((content(i) & 0xff) == 0xff && (content(i + 1) & 0xff) == 0xd9) {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(content, start, i + 2 - start))
          if (img == null) return bad
          if (w < 0) { w = img.getWidth; h = img.getHeight }
          else if (img.getWidth != w || img.getHeight != h) return bad
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = raster.getSample(x, y, 0)
              s1 += v; s2 += v.toLong * v; s3 += v.toLong * (nf + 1)
              if (v < mn) mn = v
              if (v > mx) mx = v
              x += 1
            }
            y += 1
          }
          nf += 1
          start = i + 2
          i += 2
        } else i += 1
      }
      if (nf == 0 || start != content.length) bad
      else SampleStats(id, "video", "mjpeg", w, h, w.toLong * h * nf,
        s1, s2, s3, mn, mx)
    } catch { case _: Throwable => bad }
  }

  /** MJPEG sample-decode stage — the xm8 scan shape: per-partition
    * codec init, one pass per row, no shuffle until the output sort.
    */
  def mjpegDecodeStats(media: Dataset[MediaRow]): Dataset[SampleStats] = {
    import media.sparkSession.implicits._
    media.filter(r => r.media_type == "video")
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map(r => decodeMjpeg(r.doc_id, r.content))
      }
  }

  /** Real sample-decode stage over the encoded table: mapPartitions so
    * codec setup (ImageIO's disk cache OFF — a temp file per decode
    * would turn a CPU stage into an I/O one) is paid once per
    * partition. Only image/audio rows — the decodable modalities.
    */
  def decodeStats(media: Dataset[MediaRow]): Dataset[SampleStats] = {
    import media.sparkSession.implicits._
    media.filter(r => r.media_type == "image" || r.media_type == "audio")
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map(r => decodeSamples(r.doc_id, r.media_type, r.content))
      }
  }

  /** Feature extraction v2 — REAL decode where the JVM has a codec:
    * image embeddings from ImageIO-decoded channel means/extrema,
    * audio from PCM sample stats, video (no JDK codec) from the parsed
    * header + strided byte stats over the mdat region as before. All
    * dims in [0, 1]; dims 0-2 stay the parsed-geometry encoding xm5
    * certifies.
    */
  def extractFeaturesReal(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        val base = decode(row) // crc + header parse + byte-stat fold
        if (row.media_type == "video") {
          val st = decodeVideo(row.doc_id, row.content)
          if (st.fmt != "y4m" || st.n_samples == 0L) base
          else {
            // real decoded stats, the same dim layout as png: channel
            // means in 3-5, extrema in 6-7; geometry dims 0-2 from the
            // DECODED stream (frames*40 ms at the declared 25 fps)
            val frames = st.n_samples / (st.width.toLong * st.height)
            val emb = base.embedding.clone()
            emb(0) = st.width / 4096f
            emb(1) = st.height / 4096f
            emb(2) = frames * 40L / 1000f / 256f
            emb(3) = st.s1.toFloat / st.n_samples / 255f
            emb(4) = st.s2.toFloat / st.n_samples / 255f
            emb(5) = st.s3.toFloat / st.n_samples / 255f
            emb(6) = st.mx / 255f
            emb(7) = st.mn / 255f
            base.copy(embedding = emb, parsed_format = "y4m",
              parsed_width = st.width, parsed_height = st.height,
              parsed_duration_ms = frames * 40L)
          }
        } else {
        val st = decodeSamples(row.doc_id, row.media_type, row.content)
        if (st.fmt == "unknown" || st.n_samples == 0L) base
        else {
          val emb = base.embedding.clone()
          if (st.fmt == "png") {
            emb(3) = st.s1.toFloat / st.n_samples / 255f
            emb(4) = st.s2.toFloat / st.n_samples / 255f
            emb(5) = st.s3.toFloat / st.n_samples / 255f
            emb(6) = st.mx / 255f
            emb(7) = st.mn / 255f
          } else {
            emb(3) = st.s2.toFloat / st.n_samples / 32768f
            emb(4) = (st.mn + 32768).toFloat / 65536f
            emb(5) = (st.mx + 32768).toFloat / 65536f
            emb(6) = 0f
            emb(7) = 0f
          }
          base.copy(embedding = emb)
        }
        }
      }
    }
  }
}
