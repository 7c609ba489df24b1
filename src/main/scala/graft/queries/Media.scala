package graft.queries

import org.apache.spark.sql.functions._
import Det._
import graft.multimodal.Multimodal

/** Multimodal-column queries over the synthetic media table (binary
  * payload + typed metadata derived deterministically from documents —
  * see graft.multimodal.Multimodal for the decode-stub contract).
  */
object Media {

  // Aggregate stats over the binary column — oracle-matched (payload
  // bytes == real format header + utf8 text bytes, modality ==
  // doc_id % 3 by construction; header sizes are per-format constants,
  // Multimodal.HeaderBytes).
  val xm1 = GQuery(
    "xm1_media_stats",
    (s, d) => {
      val media = Multimodal.mediaTable(s, d).toDF()
      canon(media
        .groupBy("media_type")
        .agg(
          count(lit(1)).as("n_media"),
          sum(length(col("content")).cast("long")).as("total_bytes"),
          max(col("meta.duration_ms")).as("max_duration_ms")))
    },
    Some(
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  COUNT(*) AS n_media,
        |  CAST(SUM(strlen(text) + CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 44 ELSE 132 END) AS BIGINT) AS total_bytes,
        |  MAX(CASE doc_id % 3 WHEN 0 THEN 0
        |      WHEN 1 THEN 1000 + (doc_id % 60) * 1000
        |      ELSE 2000 + (doc_id % 30) * 1000 END) AS max_duration_ms
        |FROM documents GROUP BY 1""".stripMargin +
        orderAll("media_type", "n_media", "total_bytes", "max_duration_ms")))

  // Decoded features (mapPartitions batch shape) over the REAL-codec
  // table: image embeddings come from ImageIO-decoded pixel channel
  // stats, audio from decoded PCM sample stats, video (no JDK codec)
  // from the parsed header + strided byte stats over the mdat region.
  // Dims 0-2 re-encode the parsed geometry (the walk xm5
  // hash-certifies); dims 3-7 are the decoded-sample stats xm6
  // hash-certifies against DuckDB's closed-form recompute. ⊘ rows-only
  // (checksum/embedding aren't SQL-expressible); xr15 certifies the
  // non-SQL halves with independent in-Spark recomputation.
  val xm2 = GQuery(
    "xm2_media_features",
    (s, d) => {
      val feats = Multimodal.extractFeaturesReal(
        Multimodal.encodedMediaTable(s, d)).toDF()
      canon(feats.select(
        col("doc_id"), col("media_type"), col("n_bytes"), col("checksum"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e0"),
        col("parsed_format"), col("parsed_width"), col("parsed_height"),
        col("parsed_duration_ms")))
    },
    None)

  // Header-parse audit — the oracle-matched half of xm2: every parsed
  // (format, width, height, duration) comes from walking the payload's
  // ACTUAL container header (PNG IHDR / RIFF chunks / MP4 mvhd), and
  // the oracle recomputes what the builder encoded from doc_id — a
  // single wrong byte anywhere in build or parse fails the hash.
  val xm5 = GQuery(
    "xm5_header_parse",
    (s, d) => {
      val feats = Multimodal.extractFeatures(Multimodal.mediaTable(s, d)).toDF()
      canon(feats.select(
        col("doc_id"), col("parsed_format"), col("parsed_width"),
        col("parsed_height"), col("parsed_duration_ms")))
    },
    Some(
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'mp4' END AS parsed_format,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 64 + (doc_id % 16) * 64 WHEN 1 THEN 0 ELSE 1280 END AS INTEGER) AS parsed_width,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 64 + (doc_id % 9) * 64 WHEN 1 THEN 0 ELSE 720 END AS INTEGER) AS parsed_height,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 0
        |       WHEN 1 THEN 1000 + (doc_id % 60) * 1000
        |       ELSE 2000 + (doc_id % 30) * 1000 END AS BIGINT) AS parsed_duration_ms
        |FROM documents""".stripMargin +
        orderAll("doc_id", "parsed_format", "parsed_width", "parsed_height",
          "parsed_duration_ms")))

  // Frame sampling generator — oracle-matched (pure metadata explode).
  val xm3 = GQuery(
    "xm3_frame_sample",
    (s, d) => {
      canon(Multimodal.frameSample(Multimodal.mediaTable(s, d), 1000L))
    },
    Some(
      """SELECT doc_id,
        |  UNNEST(range(0, CAST(2000 + (doc_id % 30) * 1000 AS BIGINT), 1000)) AS frame_ms
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin +
        orderAll("doc_id", "frame_ms")))

  // Resize as a metadata transform (aspect-preserving cap at 256 on the
  // long edge; pixel work belongs to the decode stage) — oracle-matched
  // on the integer scaling arithmetic.
  val xm4 = GQuery(
    "xm4_resize",
    (s, d) => {
      val resized = Multimodal.resizeMeta(Multimodal.mediaTable(s, d), 256)
      canon(resized
        .filter(col("media_type") === "image")
        .select(col("doc_id"),
          col("meta.width").as("width"),
          col("meta.height").as("height")))
    },
    Some(
      """WITH img AS (
        |  SELECT doc_id,
        |    64 + (doc_id % 16) * 64 AS w,
        |    64 + (doc_id % 9) * 64 AS h
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id,
        |  CAST(CASE WHEN greatest(w, h) > 256
        |    THEN FLOOR(w * 256.0 / greatest(w, h)) ELSE w END AS INT) AS width,
        |  CAST(CASE WHEN greatest(w, h) > 256
        |    THEN FLOOR(h * 256.0 / greatest(w, h)) ELSE h END AS INT) AS height
        |FROM img""".stripMargin +
        orderAll("doc_id", "width", "height")))

  // REAL codec round trip, oracle-matched end to end: image rows are
  // complete deflate-compressed PNGs and audio rows real 16-bit PCM
  // WAVs (Multimodal.encodedMediaTable), decoded back with nothing but
  // the JDK (javax.imageio for pixels, the RIFF chunk walk + LE16 reads
  // for samples). The planted pixel/PCM rules are closed forms of
  // (x, y, doc_id) / (i, doc_id), so the DuckDB oracle recomputes the
  // exact channel sums/extrema arithmetically — the hash passes only if
  // encode -> compress -> decode -> aggregate recovers every planted
  // value bit-exactly. This retires the round-12 "sample decode is
  // fake" caveat for the modalities the JVM can decode: image (PNG),
  // audio (WAV), and — since encodedMediaTable moved its video column
  // to uncompressed YUV4MPEG2 — video too, certified separately by
  // xm7's plane-rule hash match (compressed H.264 stays out: no JDK
  // codec; MJPEG covers the compressed case via xm8).
  val xm6 = GQuery(
    "xm6_real_decode",
    (s, d) => {
      val stats = Multimodal.decodeStats(Multimodal.encodedMediaTable(s, d)).toDF()
      canon(stats)
    },
    Some(
      """WITH img AS (
        |  SELECT doc_id, 8 + (doc_id % 16) * 4 AS w, 8 + (doc_id % 9) * 4 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |ix AS (SELECT doc_id, w, h, UNNEST(range(w)) AS x FROM img),
        |px AS (SELECT doc_id, w, h, x, UNNEST(range(h)) AS y FROM ix),
        |istat AS (
        |  SELECT doc_id, 'image' AS media_type, 'png' AS fmt,
        |    CAST(MAX(w) AS INTEGER) AS width, CAST(MAX(h) AS INTEGER) AS height,
        |    CAST(COUNT(*) AS BIGINT) AS n_samples,
        |    CAST(SUM((x*7 + y*13 + doc_id) % 256) AS BIGINT) AS s1,
        |    CAST(SUM((x*3 + y*5 + doc_id*2) % 256) AS BIGINT) AS s2,
        |    CAST(SUM((x + y + doc_id*3) % 256) AS BIGINT) AS s3,
        |    CAST(MIN((x*7 + y*13 + doc_id) % 256) AS INTEGER) AS mn,
        |    CAST(MAX((x*7 + y*13 + doc_id) % 256) AS INTEGER) AS mx
        |  FROM px GROUP BY doc_id),
        |aud AS (
        |  SELECT doc_id, 400 + (doc_id % 60) * 40 AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |smp AS (SELECT doc_id, UNNEST(range(n)) AS i FROM aud),
        |astat AS (
        |  SELECT doc_id, 'audio' AS media_type, 'wav' AS fmt,
        |    CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
        |    CAST(COUNT(*) AS BIGINT) AS n_samples,
        |    CAST(SUM((doc_id*31 + i*17) % 4096 - 2048) AS BIGINT) AS s1,
        |    CAST(SUM(ABS((doc_id*31 + i*17) % 4096 - 2048)) AS BIGINT) AS s2,
        |    CAST(0 AS BIGINT) AS s3,
        |    CAST(MIN((doc_id*31 + i*17) % 4096 - 2048) AS INTEGER) AS mn,
        |    CAST(MAX((doc_id*31 + i*17) % 4096 - 2048) AS INTEGER) AS mx
        |  FROM smp GROUP BY doc_id)
        |SELECT * FROM istat UNION ALL SELECT * FROM astat""".stripMargin +
        orderAll("doc_id", "media_type", "fmt", "width", "height",
          "n_samples", "s1", "s2", "s3", "mn", "mx")))

  /** xm7: RAW VIDEO sample decode, oracle-matched end to end — the
    * last multimodal modality joins xm6's closed-form family. Payloads
    * are complete YUV4MPEG2 streams (the uncompressed-frame
    * interchange format; the JDK ships no H.264 decoder, but y4m needs
    * none — a byte walk IS the decoder), planted with per-(x,y,frame)
    * modular pixel rules; Spark decodes every frame's Y/U/V planes and
    * DuckDB recomputes the identical sums/extrema arithmetically. A
    * single wrong byte in encode or decode — header parse, plane
    * order, frame boundary — shifts a sum and fails the hash.
    */
  val xm7 = GQuery(
    "xm7_video_decode",
    (s, d) => {
      val stats = Multimodal.videoDecodeStats(Multimodal.rawVideoTable(s, d)).toDF()
      canon(stats)
    },
    Some(
      """WITH vid AS (
        |  SELECT doc_id, 8 + (doc_id % 8) * 4 AS w, 8 + (doc_id % 6) * 4 AS h,
        |         2 + (doc_id % 4) AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fx AS (SELECT doc_id, w, h, nf, UNNEST(range(nf)) AS f FROM vid),
        |xx AS (SELECT doc_id, w, h, nf, f, UNNEST(range(w)) AS x FROM fx),
        |px AS (SELECT doc_id, w, h, nf, f, x, UNNEST(range(h)) AS y FROM xx)
        |SELECT doc_id, 'video' AS media_type, 'y4m' AS fmt,
        |  CAST(MAX(w) AS INTEGER) AS width, CAST(MAX(h) AS INTEGER) AS height,
        |  CAST(COUNT(*) AS BIGINT) AS n_samples,
        |  CAST(SUM((x*7 + y*13 + f*19 + doc_id) % 256) AS BIGINT) AS s1,
        |  CAST(SUM((x*3 + y*5 + f*7 + doc_id*2) % 256) AS BIGINT) AS s2,
        |  CAST(SUM((x + y + f*3 + doc_id*3) % 256) AS BIGINT) AS s3,
        |  CAST(MIN((x*7 + y*13 + f*19 + doc_id) % 256) AS INTEGER) AS mn,
        |  CAST(MAX((x*7 + y*13 + f*19 + doc_id) % 256) AS INTEGER) AS mx
        |FROM px GROUP BY doc_id""".stripMargin +
        orderAll("doc_id", "media_type", "fmt", "width", "height",
          "n_samples", "s1", "s2", "s3", "mn", "mx")))

  /** xm8: COMPRESSED-video decode, oracle-matched end to end — MJPEG
    * (concatenated baseline JPEGs, the one compressed video codec a
    * bare JDK decodes). Frames are grayscale and constant per 8x8
    * block, which baseline JPEG reproduces bit-exactly (DC-only
    * blocks; see Multimodal.mjpegEncode), so the DuckDB oracle
    * recomputes the decoded luma stats from the planted block rule —
    * the hash passes only if encode → JPEG compress → decode →
    * aggregate recovers every planted value exactly. Closes the
    * compressed half of the video boundary xm7's y4m sidesteps
    * (H.264/VP9 remain out: no JDK codec).
    */
  val xm8 = GQuery(
    "xm8_mjpeg_decode",
    (s, d) => {
      val stats = Multimodal.mjpegDecodeStats(
        Multimodal.mjpegVideoTable(s, d)).toDF()
      canon(stats)
    },
    Some(
      """WITH vid AS (
        |  SELECT doc_id, 1 + (doc_id % 4) AS wb, 1 + (doc_id % 3) AS hb,
        |         1 + (doc_id % 3) AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fx AS (SELECT doc_id, wb, hb, nf, UNNEST(range(nf)) AS f FROM vid),
        |bb AS (SELECT doc_id, wb, hb, nf, f, UNNEST(range(wb)) AS bx FROM fx),
        |px AS (SELECT doc_id, wb, hb, nf, f, bx, UNNEST(range(hb)) AS by FROM bb),
        |vv AS (SELECT doc_id, wb, hb, f,
        |         (bx*31 + by*57 + f*19 + doc_id) % 256 AS val FROM px)
        |SELECT doc_id, 'video' AS media_type, 'mjpeg' AS fmt,
        |  CAST(MAX(wb)*8 AS INTEGER) AS width,
        |  CAST(MAX(hb)*8 AS INTEGER) AS height,
        |  CAST(COUNT(*)*64 AS BIGINT) AS n_samples,
        |  CAST(SUM(64*val) AS BIGINT) AS s1,
        |  CAST(SUM(64*val*val) AS BIGINT) AS s2,
        |  CAST(SUM(64*val*(f+1)) AS BIGINT) AS s3,
        |  CAST(MIN(val) AS INTEGER) AS mn,
        |  CAST(MAX(val) AS INTEGER) AS mx
        |FROM vv GROUP BY doc_id""".stripMargin +
        orderAll("doc_id", "media_type", "fmt", "width", "height",
          "n_samples", "s1", "s2", "s3", "mn", "mx")))

  def queries: Seq[GQuery] = Seq(xm1, xm2, xm3, xm4, xm5, xm6, xm7, xm8)
}
