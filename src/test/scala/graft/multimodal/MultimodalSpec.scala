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
      val (fmt, w, h, dur) = Multimodal.parseHeader(r.content)
      assert(fmt == r.meta.format, s"doc ${r.doc_id}")
      if (fmt == "png") {
        assert(w == r.meta.width && h == r.meta.height, s"doc ${r.doc_id}")
      }
      if (fmt == "wav" || fmt == "mp4")
        assert(dur == r.meta.duration_ms, s"doc ${r.doc_id}")
    }
  }

  test("parse handles direct builder output and corruption gracefully") {
    val p = "payload".getBytes("UTF-8")
    assert(Multimodal.parseHeader(Multimodal.pngBytes(640, 480, p))
      == ("png", 640, 480, 0L))
    assert(Multimodal.parseHeader(Multimodal.wavBytes(12345L, p))
      == ("wav", 0, 0, 12345L))
    assert(Multimodal.parseHeader(Multimodal.mp4Bytes(98765L, p))
      == ("mp4", 1280, 720, 98765L))
    // corrupt/unknown payloads must parse as unknown, never throw
    assert(Multimodal.parseHeader(Array.empty[Byte])._1 == "unknown")
    assert(Multimodal.parseHeader("just text".getBytes)._1 == "unknown")
    assert(Multimodal.parseHeader(
      Multimodal.pngBytes(1, 1, p).take(10))._1 == "unknown")
    val truncatedWav = Multimodal.wavBytes(1000L, p).take(20)
    assert(Multimodal.parseHeader(truncatedWav)._1 == "unknown")
  }
}
