package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import Multimodal.{MediaMeta, MediaRow, ParsedHeader}

/** Fuzz the container-header parse and the decode fold — the decode
  * stage's never-throw / always-terminate / sane-ranges contract is
  * load-bearing for every multimodal pipeline stage (a single corrupt
  * payload must not kill a 100 TB backfill task). Three adversarial
  * input families:
  *  - arbitrary byte soup (no structure at all);
  *  - valid builder output with single-byte mutations (the realistic
  *    bit-rot / truncated-upload shape — magic bytes often survive,
  *    so the size/dimension fields are what the parser must distrust);
  *  - valid builder output truncated at every interesting length.
  * Deterministic sampling (PropertySpec's seed discipline — the
  * scalatestplus bridge is not in the offline cache).
  */
class MultimodalFuzzSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))

  private val payload = "sample payload text 0123456789".getBytes("UTF-8")

  private def builders: Seq[Array[Byte]] = Seq(
    Multimodal.pngBytes(640, 480, payload),
    Multimodal.wavBytes(12345L, payload),
    Multimodal.mp4Bytes(98765L, payload))

  /** Every parse must terminate, never throw, and keep its fields in
    * the documented ranges whatever the bytes claim.
    */
  private def checkSane(b: Array[Byte]): Unit = {
    val p = Multimodal.parseHeader(b)
    assert(p.headerLen >= 0 && p.headerLen <= b.length,
      s"headerLen ${p.headerLen} outside [0, ${b.length}]")
    assert(p.durationMs >= 0L, s"negative duration ${p.durationMs}")
    assert(p.width >= 0 && p.height >= 0,
      s"negative geometry ${p.width}x${p.height}")
    if (p.format == "png")
      assert(p.width >= 1 && p.height >= 1,
        s"png with out-of-spec dims ${p.width}x${p.height}")
    // the decode fold downstream of the parse must also hold its
    // contract on the same bytes: finite features, byte-stat dims in
    // [0,1], checksum = CRC32 of exactly these bytes
    val f = Multimodal.decode(
      MediaRow(0L, "fuzz", b, MediaMeta("?", 0, 0, 0L)))
    assert(f.embedding.length == 8)
    assert(f.embedding.forall(v => !v.isNaN && !v.isInfinity))
    (3 until 8).foreach { i =>
      assert(f.embedding(i) >= 0f && f.embedding(i) <= 1f,
        s"byte-stat dim $i out of [0,1]: ${f.embedding(i)}")
    }
    val crc = new java.util.zip.CRC32
    crc.update(b)
    assert(f.checksum == crc.getValue)
    assert(f.n_bytes == b.length.toLong)
  }

  test("byte soup: arbitrary arrays parse without throwing, fields sane") {
    val g = Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    (0 until 200).foreach(i => checkSane(sample(g, i.toLong).toArray))
  }

  test("single-byte mutations of valid headers: no throw, no negative fields") {
    builders.foreach { valid =>
      // mutate every header-region byte through several values — the
      // magic usually survives a 1-byte flip elsewhere, so this drives
      // the size/dimension field paths (the Int-narrowing trap)
      val headerRegion = math.min(valid.length, 140)
      (0 until headerRegion).foreach { pos =>
        Seq(0x00, 0x7f, 0x80, 0xff).foreach { v =>
          val m = valid.clone()
          m(pos) = v.toByte
          checkSane(m)
        }
      }
      // and a few random multi-byte mutations
      val g = Gen.listOfN(4,
        Gen.zip(Gen.choose(0, valid.length - 1), Gen.choose(0, 255)))
      (0 until 50).foreach { i =>
        val m = valid.clone()
        sample(g, 9000L + i).foreach { case (pos, v) => m(pos) = v.toByte }
        checkSane(m)
      }
    }
  }

  test("truncations of valid payloads: every prefix parses sanely") {
    builders.foreach { valid =>
      (0 until math.min(valid.length, 160)).foreach(n =>
        checkSane(valid.take(n)))
      checkSane(valid)
    }
  }

  /** The y4m byte-walk decoder (xm7) holds the same never-throw /
    * sane-ranges contract: unknown or damaged input folds to
    * fmt="unknown" with zeroed stats, never an exception or a
    * partial/insane row.
    */
  private def checkVideoSane(b: Array[Byte]): Unit = {
    val st = Multimodal.decodeVideo(7L, b)
    assert(st.fmt == "y4m" || st.fmt == "unknown")
    if (st.fmt == "unknown")
      assert(st == st.copy(width = 0, height = 0, n_samples = 0L,
        s1 = 0L, s2 = 0L, s3 = 0L, mn = 0, mx = 0))
    else {
      assert(st.width >= 1 && st.height >= 1 && st.n_samples >= 1L)
      assert(st.mn >= 0 && st.mx <= 255 && st.mn <= st.mx)
      assert(st.s1 >= 0L && st.s2 >= 0L && st.s3 >= 0L)
    }
  }

  test("y4m decode: soup, mutations, and truncations never throw") {
    val valid = Multimodal.y4mEncode(7L)
    // un-mutated stream decodes to its planted geometry
    val st = Multimodal.decodeVideo(7L, valid)
    assert(st.fmt == "y4m")
    assert(st.width == Multimodal.vidWidth(7L))
    assert(st.height == Multimodal.vidHeight(7L))
    assert(st.n_samples ==
      st.width.toLong * st.height * Multimodal.vidFrames(7L))
    // every truncation of the header + first frame region
    (0 until math.min(valid.length, 200)).foreach(n =>
      checkVideoSane(valid.take(n)))
    // single-byte header mutations (the W/H/C token parse paths)
    (0 until math.min(valid.length, 48)).foreach { pos =>
      Seq(0x00, ' '.toInt, '9'.toInt, 0xff).foreach { v =>
        val m = valid.clone(); m(pos) = v.toByte
        checkVideoSane(m)
      }
    }
    // byte soup
    val g = Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    (0 until 100).foreach(i => checkVideoSane(sample(g, 400L + i).toArray))
    // a C420 stream (subsampled planes) is declared out of contract:
    // the decoder must refuse it as unknown, not misread plane sizes
    val c420 = new String(valid, "ISO-8859-1").replaceFirst("C444", "C420")
      .getBytes("ISO-8859-1")
    assert(Multimodal.decodeVideo(7L, c420).fmt == "unknown")
  }

  private def checkMjpegSane(b: Array[Byte]): Unit = {
    val st = Multimodal.decodeMjpeg(7L, b)
    assert(st.fmt == "mjpeg" || st.fmt == "unknown")
    if (st.fmt == "unknown")
      assert(st == st.copy(width = 0, height = 0, n_samples = 0L,
        s1 = 0L, s2 = 0L, s3 = 0L, mn = 0, mx = 0))
    else {
      assert(st.width >= 1 && st.height >= 1 && st.n_samples >= 1L)
      assert(st.mn >= 0 && st.mx <= 255 && st.mn <= st.mx)
      assert(st.s1 >= 0L && st.s2 >= 0L && st.s3 >= 0L)
    }
  }

  test("mjpeg decode: soup, mutations, and truncations never throw") {
    val valid = Multimodal.mjpegEncode(8L) // id%3==2: a video doc
    val st = Multimodal.decodeMjpeg(8L, valid)
    assert(st.fmt == "mjpeg")
    assert(st.width == Multimodal.mjBlocksW(8L) * 8)
    assert(st.height == Multimodal.mjBlocksH(8L) * 8)
    // truncations: every prefix across the first frame and a sweep of
    // coarser cuts over the rest (trailing garbage / half frames must
    // fold to unknown, not throw or double-count)
    (0 until math.min(valid.length, 300)).foreach(n =>
      checkMjpegSane(valid.take(n)))
    (300 until valid.length by 97).foreach(n =>
      checkMjpegSane(valid.take(n)))
    // single-byte mutations across the first frame's header region
    (0 until math.min(valid.length, 64)).foreach { pos =>
      Seq(0x00, 0xd9, 0xff).foreach { v =>
        val m = valid.clone(); m(pos) = v.toByte
        checkMjpegSane(m)
      }
    }
    // byte soup
    val g = Gen.choose(0, 300).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
    (0 until 100).foreach(i => checkMjpegSane(sample(g, 900L + i).toArray))
  }

  test("a valid payload round-trips through mutation checks unchanged") {
    // guard the guard: the un-mutated builders still parse to their
    // encoded fields after the PNG dimension-sanity change
    assert(Multimodal.parseHeader(builders(0)) ==
      ParsedHeader("png", 640, 480, 0L, 33))
    assert(Multimodal.parseHeader(builders(1)).format == "wav")
    assert(Multimodal.parseHeader(builders(1)).durationMs == 12345L)
    assert(Multimodal.parseHeader(builders(2)).format == "mp4")
    assert(Multimodal.parseHeader(builders(2)).durationMs == 98765L)
  }
}
