package graft.multimodal

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing invariants: schema shape, deterministic stub
  * decode, payload-sized partitioning, metadata transforms.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("media table schema: binary payload + typed metadata struct") {
    val media = Multimodal.mediaTable(spark, sf)
    val s = media.schema
    assert(s("content").dataType == BinaryType)
    assert(s("meta").dataType.isInstanceOf[StructType])
    assert(media.count() == 500)
  }

  test("stub decode is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.doc_id -> (f.checksum, f.embedding.toSeq)).toMap
    val f2 = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sf).repartition(7)) // different batching
      .collect().map(f => f.doc_id -> (f.checksum, f.embedding.toSeq)).toMap
    assert(f1 == f2, "features must not depend on partitioning")
    assert(f1.values.forall(_._2.length == 8))
  }

  test("payload-based partition sizing") {
    val media = Multimodal.mediaTable(spark, sf)
    val sized = Multimodal.sizeByPayload(media, targetBytes = 16 * 1024)
    assert(sized.rdd.getNumPartitions >= 2,
      "500 docs x ~300B should exceed one 16KB partition")
  }

  test("resize caps image dimensions, leaves other modalities alone") {
    val resized = Multimodal.resizeMeta(Multimodal.mediaTable(spark, sf), 256)
    val over = resized.filter(col("media_type") === "image" &&
      greatest(col("meta.width"), col("meta.height")) > 256)
    assert(over.isEmpty)
    val vids = resized.filter(col("media_type") === "video" &&
      col("meta.width") =!= 1280)
    assert(vids.isEmpty)
  }

  test("frame sampling yields duration/step frames per video") {
    val frames = Multimodal.frameSample(Multimodal.mediaTable(spark, sf), 1000L)
    val perDoc = frames.groupBy("doc_id").count()
    val media = Multimodal.mediaTable(spark, sf).toDF()
      .filter(col("media_type") === "video")
      .select(col("doc_id"), (col("meta.duration_ms") / 1000).cast("long").as("exp"))
    val joined = perDoc.join(media, "doc_id")
      .filter(col("count") =!= col("exp"))
    assert(joined.isEmpty)
  }

  test("header parse roundtrips the builder's metadata from REAL bytes") {
    val rows = Multimodal.mediaTable(spark, sf).collect()
    rows.foreach { r =>
      val p = Multimodal.parseHeader(r.content)
      assert(p.format == r.meta.format, s"doc ${r.doc_id}")
      if (p.format == "png") {
        assert(p.width == r.meta.width && p.height == r.meta.height,
          s"doc ${r.doc_id}")
      }
      if (p.format == "wav" || p.format == "mp4")
        assert(p.durationMs == r.meta.duration_ms, s"doc ${r.doc_id}")
      // headerLen lands exactly on the builder's header/payload seam
      assert(p.headerLen == Multimodal.HeaderBytes(r.media_type),
        s"doc ${r.doc_id}: headerLen ${p.headerLen}")
    }
  }

  test("parse handles direct builder output and corruption gracefully") {
    val p = "payload".getBytes("UTF-8")
    assert(Multimodal.parseHeader(Multimodal.pngBytes(640, 480, p))
      == Multimodal.ParsedHeader("png", 640, 480, 0L, 33))
    assert(Multimodal.parseHeader(Multimodal.wavBytes(12345L, p))
      == Multimodal.ParsedHeader("wav", 0, 0, 12345L, 44))
    assert(Multimodal.parseHeader(Multimodal.mp4Bytes(98765L, p))
      == Multimodal.ParsedHeader("mp4", 1280, 720, 98765L, 132))
    // corrupt/unknown payloads must parse as unknown, never throw
    assert(Multimodal.parseHeader(Array.empty[Byte]).format == "unknown")
    assert(Multimodal.parseHeader("just text".getBytes).format == "unknown")
    assert(Multimodal.parseHeader(
      Multimodal.pngBytes(1, 1, p).take(10)).format == "unknown")
    val truncatedWav = Multimodal.wavBytes(1000L, p).take(20)
    assert(Multimodal.parseHeader(truncatedWav).format == "unknown")
  }

  test("hostile unsigned size fields parse as unknown — no crash, no hang") {
    def le(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def be(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def a(s: String) = s.getBytes("US-ASCII")
    // chunk size >= 0x80000000 once wrapped an Int offset NEGATIVE
    // (StringIndexOutOfBounds in tag()); 0xFFFFFFF8 made the Int
    // advance ZERO (infinite loop in an executor task)
    val riffCrash = a("RIFF") ++ le(36) ++ a("WAVE") ++
      a("junk") ++ le(0xFFFFFF00L) ++ Array.fill[Byte](40)(0)
    assert(Multimodal.parseHeader(riffCrash).format == "unknown")
    val riffHang = a("RIFF") ++ le(36) ++ a("WAVE") ++
      a("junk") ++ le(0xFFFFFFF8L) ++ Array.fill[Byte](40)(0)
    assert(Multimodal.parseHeader(riffHang).format == "unknown")
    val mp4Evil = be(16) ++ a("ftyp") ++ a("isom") ++ be(0) ++
      be(0xFFFFFFFFL) ++ a("moov") ++ Array.fill[Byte](60)(0)
    assert(Multimodal.parseHeader(mp4Evil).format == "unknown")
    // and decode (the production entry) survives them end-to-end
    val row = Multimodal.MediaRow(1L, "audio", riffHang,
      Multimodal.MediaMeta("wav", 0, 0, 0L))
    val f = Multimodal.extractFeatures(
      spark.createDataset(Seq(row))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]))
      .collect().head
    assert(f.parsed_format == "unknown" && f.embedding.length == 8)
  }

  test("parseHeader is a total function on arbitrary bytes (property)") {
    // the decode stage's hard contract: ANY payload parses without
    // throwing, terminates, and reports a headerLen inside the
    // payload. Random bytes rarely hit the magic prefixes, so also
    // fuzz MUTATIONS of real headers (valid magics + arbitrary size
    // fields — the adversarial shape the walks must survive).
    val rnd = new scala.util.Random(42)
    val real = Seq(
      Multimodal.pngBytes(64, 48, Array.fill[Byte](32)(7)),
      Multimodal.wavBytes(2000L, Array.fill[Byte](32)(7)),
      Multimodal.mp4Bytes(3000L, Array.fill[Byte](32)(7)))
    val cases =
      (1 to 300).map { _ =>
        val b = new Array[Byte](rnd.nextInt(200)); rnd.nextBytes(b); b
      } ++
      (1 to 300).map { _ =>
        val base = real(rnd.nextInt(real.size)).clone()
        // corrupt 1-4 bytes anywhere (size fields included)
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte
        }
        base
      }
    cases.foreach { b =>
      val p = Multimodal.parseHeader(b) // must not throw nor hang
      assert(p.headerLen >= 0 && p.headerLen <= b.length,
        s"headerLen ${p.headerLen} outside [0, ${b.length}]")
    }
  }

  test("xm2 features derive from the parsed payload, tied to xm5's fields") {
    // geometry dims reconstruct exactly the parsed header fields xm5
    // hash-certifies — the features demonstrably come from the REAL
    // parse, not a stub
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect()
    feats.foreach { f =>
      assert(math.round(f.embedding(0) * 4096f) == f.parsed_width,
        s"doc ${f.doc_id}: e0 vs parsed_width")
      assert(math.round(f.embedding(1) * 4096f) == f.parsed_height,
        s"doc ${f.doc_id}: e1 vs parsed_height")
      assert(math.round(f.embedding(2) * 256f * 1000f).toLong
          == f.parsed_duration_ms,
        s"doc ${f.doc_id}: e2 vs parsed_duration_ms")
    }
    // sample dims cover ONLY the bytes after the parsed header: for a
    // hand-built payload the strided means over the sample region are
    // computable by hand — "abc" at stride 5 puts one byte per stripe
    val row = Multimodal.MediaRow(1L, "image",
      Multimodal.pngBytes(64, 64, "abc".getBytes("US-ASCII")),
      Multimodal.MediaMeta("png", 64, 64, 0L))
    val emb = Multimodal.extractFeatures(
      spark.createDataset(Seq(row))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]))
      .collect().head.embedding
    assert(emb(3) == 'a' / 255f && emb(4) == 'b' / 255f && emb(5) == 'c' / 255f)
    assert(emb(6) == 0f && emb(7) == 0f)
  }

  test("PNG encode -> ImageIO decode recovers every planted pixel value") {
    // the REAL-codec contract: deflate-compress the planted rule, read
    // it back through javax.imageio, and the channel sums/extrema must
    // equal the closed-form arithmetic — per id, exact integer math
    Seq(0L, 3L, 9L, 42L, 123L, 498L).foreach { id =>
      val st = Multimodal.decodeSamples(id, "image", Multimodal.pngEncode(id))
      val w = Multimodal.encWidth(id); val h = Multimodal.encHeight(id)
      assert(st.fmt == "png" && st.width == w && st.height == h, s"id $id")
      assert(st.n_samples == w.toLong * h, s"id $id")
      var s1 = 0L; var s2 = 0L; var s3 = 0L; var mn = 255; var mx = 0
      for (y <- 0 until h; x <- 0 until w) {
        val r = Multimodal.pixR(x, y, id)
        s1 += r; s2 += Multimodal.pixG(x, y, id)
        s3 += Multimodal.pixB(x, y, id)
        mn = math.min(mn, r); mx = math.max(mx, r)
      }
      assert(st.s1 == s1 && st.s2 == s2 && st.s3 == s3, s"id $id sums")
      assert(st.mn == mn && st.mx == mx, s"id $id extrema")
    }
  }

  test("WAV encode -> PCM walk recovers every planted sample") {
    Seq(1L, 4L, 10L, 55L, 301L).foreach { id =>
      val st = Multimodal.decodeSamples(id, "audio", Multimodal.wavEncode(id))
      val n = Multimodal.encSamples(id)
      assert(st.fmt == "wav" && st.n_samples == n.toLong, s"id $id")
      val samples = (0 until n).map(i => Multimodal.pcmSample(i, id))
      assert(st.s1 == samples.map(_.toLong).sum, s"id $id sum")
      assert(st.s2 == samples.map(v => math.abs(v).toLong).sum, s"id $id abs")
      assert(st.mn == samples.min && st.mx == samples.max, s"id $id extrema")
    }
  }

  test("JPEG reproduces block-constant grayscale bit-exactly for ALL " +
      "256 values — the lossless island xm8's oracle stands on") {
    // xm8's closed-form oracle is only sound if the LOSSY codec is
    // exact on the planted content class: grayscale frames constant
    // per 8x8 block (DC-only blocks; DC differences entropy-code
    // losslessly). Exhaustive: every value 0..255, mixed-block images.
    javax.imageio.ImageIO.setUseCache(false)
    (0 until 256).foreach { base =>
      val img = new java.awt.image.BufferedImage(
        24, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      def v(bx: Int, by: Int) = (base + bx * 31 + by * 57) % 256
      for (by <- 0 until 2; bx <- 0 until 3; y <- 0 until 8; x <- 0 until 8)
        r.setSample(bx * 8 + x, by * 8 + y, 0, v(bx, by))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(out.toByteArray))
      for (by <- 0 until 2; bx <- 0 until 3; y <- 0 until 8; x <- 0 until 8)
        assert(dec.getRaster.getSample(bx * 8 + x, by * 8 + y, 0)
          == v(bx, by), s"base $base block ($bx,$by)")
    }
  }

  test("MJPEG encode -> JDK decode recovers every planted block value") {
    Seq(2L, 5L, 8L, 11L, 47L, 500L).foreach { id =>
      val st = Multimodal.decodeMjpeg(id, Multimodal.mjpegEncode(id))
      val w = Multimodal.mjBlocksW(id) * 8
      val h = Multimodal.mjBlocksH(id) * 8
      val nf = Multimodal.mjFrames(id)
      assert(st.fmt == "mjpeg" && st.width == w && st.height == h, s"id $id")
      assert(st.n_samples == w.toLong * h * nf, s"id $id")
      var s1 = 0L; var s2 = 0L; var s3 = 0L; var mn = 255; var mx = 0
      for (f <- 0 until nf;
           by <- 0 until Multimodal.mjBlocksH(id);
           bx <- 0 until Multimodal.mjBlocksW(id)) {
        val v = Multimodal.mjVal(bx, by, f, id)
        s1 += 64L * v; s2 += 64L * v * v; s3 += 64L * v * (f + 1)
        mn = math.min(mn, v); mx = math.max(mx, v)
      }
      assert(st.s1 == s1 && st.s2 == s2 && st.s3 == s3, s"id $id sums")
      assert(st.mn == mn && st.mx == mx, s"id $id extrema")
    }
  }

  test("real decode stage never throws on corrupt payloads") {
    // truncations at every interesting seam of a real PNG and WAV
    val png = Multimodal.pngEncode(7L)
    val wav = Multimodal.wavEncode(7L)
    Seq(0, 7, 8, 20, 33, png.length - 5).foreach { k =>
      val st = Multimodal.decodeSamples(7L, "image", png.take(k))
      assert(st.fmt == "unknown" || st.n_samples >= 0, s"png take($k)")
    }
    Seq(0, 3, 12, 20, 43).foreach { k =>
      assert(Multimodal.decodeSamples(7L, "audio", wav.take(k)).fmt
        == "unknown", s"wav take($k)")
    }
    // flipped IDAT byte: ImageIO either errors (caught -> unknown) or
    // yields pixels — never a crash out of the stage
    val mut = png.clone(); mut(45) = (mut(45) ^ 0x5a).toByte
    Multimodal.decodeSamples(7L, "image", mut) // must not throw
  }

  test("extractFeaturesReal embeds decoded stats, video keeps byte fold") {
    val feats = Multimodal.extractFeaturesReal(
      Multimodal.encodedMediaTable(spark, sf)).collect()
    assert(feats.length == 500)
    feats.filter(_.media_type == "image").take(20).foreach { f =>
      val st = Multimodal.decodeSamples(f.doc_id, "image",
        Multimodal.pngEncode(f.doc_id))
      assert(f.embedding(3) == st.s1.toFloat / st.n_samples / 255f,
        s"doc ${f.doc_id} e3")
      assert(f.embedding(6) == st.mx / 255f && f.embedding(7) == st.mn / 255f,
        s"doc ${f.doc_id} extrema dims")
    }
    // video rows now embed REAL decoded y4m plane stats (xm7's decoder)
    feats.filter(_.media_type == "video").take(5).foreach { f =>
      assert(f.parsed_format == "y4m")
      assert(f.parsed_width == Multimodal.vidWidth(f.doc_id))
      assert(f.parsed_height == Multimodal.vidHeight(f.doc_id))
      assert(f.parsed_duration_ms == Multimodal.vidFrames(f.doc_id) * 40L)
      val st = Multimodal.decodeVideo(f.doc_id,
        Multimodal.y4mEncode(f.doc_id))
      assert(f.embedding(3) == st.s1.toFloat / st.n_samples / 255f,
        s"doc ${f.doc_id} video Y mean")
      assert(f.embedding(6) == st.mx / 255f && f.embedding(7) == st.mn / 255f,
        s"doc ${f.doc_id} video extrema")
    }
  }
}
