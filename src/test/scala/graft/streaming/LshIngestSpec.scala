package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming LSH band index must surface EXACTLY the candidate
  * pairs the batch band self-join finds on the same corpus — across
  * micro-batch boundaries (a doc in batch 1 pairs with a near-dup in
  * batch 3), within one batch (same-batch peers pair), and exactly
  * once per pair despite multi-band collisions.
  */
class LshIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // near-dup-rich corpus: clusters of shared sentences + singletons
  private val docs: Seq[(Long, String)] = {
    val base = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank",
      "a completely different document about spark shuffle partitions and joins",
      "minhash signatures band together to find similar documents quickly")
    (0L until 24L).map { i =>
      val b = base((i % 3).toInt)
      // small per-doc mutation so clusters are near- not exact dups
      val txt = if (i % 4 == 0) b else b + s" extra token${i % 5}"
      (i, txt)
    } ++ Seq((100L, "entirely unrelated content zebra quartz vortex"))
  }

  test("stream candidates across 3 micro-batches == batch band self-join") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    graft.functions.TextOps.register(s)
    import s.implicits._

    val input = MemoryStream[(Long, String)](s)
    val out = StreamingOps.lshCandidates(
      input.toDF().toDF("doc_id", "text"))
    val q = out.writeStream
      .format("memory").queryName("lshcand").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("lsh-ckpt").toString)
      .start()

    docs.grouped(9).foreach { batch =>
      input.addData(batch: _*)
      q.processAllAvailable()
    }
    q.stop()

    val got = s.table("lshcand").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch expectation: the SAME band projection, self-joined
    val bk = StreamingOps.bandKeys(
      docs.toDF("doc_id", "text"))
    val expected = bk.as("a").join(bk.as("b"), "band_key")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == expected)
    // sanity on the fixture: cross-cluster isolation + real candidates
    assert(expected.nonEmpty)
    assert(!expected.exists { case (a, b) => a == 100L || b == 100L },
      "singleton must not pair")
    // every within-cluster pair should band-collide on this fixture
    assert(expected.exists { case (a, b) => a % 3 == b % 3 })
  }

  test("pairs emit exactly once and state dedups replayed members") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    graft.functions.TextOps.register(s)
    import s.implicits._

    val input = MemoryStream[(Long, String)](s)
    val out = StreamingOps.lshCandidates(
      input.toDF().toDF("doc_id", "text"))
    val q = out.writeStream
      .format("memory").queryName("lshonce").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("lsh-ckpt2").toString)
      .start()

    val twin = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"))
    input.addData(twin: _*)
    q.processAllAvailable()
    // the same docs again: members already indexed, no new pairs
    input.addData(twin: _*)
    q.processAllAvailable()
    q.stop()

    val rows = s.table("lshonce").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 2L)),
      s"identical twin docs must pair exactly once, got $rows")
  }
}
