package graft.operators

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming BM25 serving over the persisted postings layout: the
  * standing index must answer exactly like the batch retrieval query
  * (xs7) on the same corpus/query split, micro-batch answers must
  * equal probeBatch, and append must fold new documents in under the
  * FROZEN collection statistics (xs5's assign-only honesty, lexical
  * edition).
  */
class Bm25ServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text")

  test("probeBatch == xs7 on the fixture's corpus/query split") {
    val path = Files.createTempDirectory("bm25idx").toString + "/idx"
    Bm25Index.build(spark, docs.filter(col("doc_id") % 20 =!= 0), path)
    val queries = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("query_id"), col("text"))
    val got = Bm25Index.probeBatch(spark, path, queries, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    val want = graft.queries.Similarity.xs7.fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(want.nonEmpty && got == want)
  }

  test("serve: per-batch streaming answers equal probeBatch; batch dirs idempotent") {
    val s = spark.newSession()
    import s.implicits._
    val root = Files.createTempDirectory("bm25serve").toString
    val path = s"$root/idx"
    val out = s"$root/out"
    val d = s.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    Bm25Index.build(s, d.filter(col("doc_id") % 20 =!= 0), path)
    val qtexts = d.filter(col("doc_id") % 20 === 0)
      .orderBy("doc_id").limit(3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(qtexts.length >= 2)

    val input = MemoryStream[(Long, String)](s)
    val q = Bm25Index.serve(input.toDF().toDF("query_id", "text"),
      path, out, Files.createTempDirectory("bm25serve-ckpt").toString, k = 10)
    input.addData(qtexts(0), qtexts(1))
    q.processAllAvailable()
    input.addData(qtexts.last)
    q.processAllAvailable()
    q.stop()

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int, Long)] =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    val b0 = rows(s.read.parquet(s"$out/batch=0"))
    val b1 = rows(s.read.parquet(s"$out/batch=1"))
    def expect(qs: Seq[(Long, String)]): Set[(Long, Long, Int, Long)] =
      rows(Bm25Index.probeBatch(s, path,
        qs.toDF("query_id", "text"), k = 10))
    assert(b0 == expect(qtexts.take(2)))
    assert(b1 == expect(Seq(qtexts.last)))

    // replay: rewriting batch 1 produces identical rows
    Bm25Index.probeBatch(s, path, Seq(qtexts.last).toDF("query_id", "text"), 10)
      .write.mode("overwrite").parquet(s"$out/batch=1")
    assert(rows(s.read.parquet(s"$out/batch=1")) == b1)
  }

  test("append folds in under FROZEN stats; new terms become retrievable") {
    val s = spark.newSession()
    import s.implicits._
    val path = Files.createTempDirectory("bm25grow").toString + "/idx"
    val base = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta gamma delta"),
      (3L, "alpha delta delta")).toDF("doc_id", "text")
    Bm25Index.build(s, base, path)
    // frozen model of record
    val statsRow = s.read.parquet(s"$path/stats").head()
    val (n, avgdl) = (statsRow.getLong(0), statsRow.getDouble(1))
    val frozenDf = s.read.parquet(s"$path/df")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    Bm25Index.append(s, Seq((9L, "zeta zeta alpha")).toDF("doc_id", "text"), path)

    // the appended doc's postings carry cu computed with the FROZEN
    // (n, avgdl) and frozen df (new term zeta: df = 1)
    val got = s.read.parquet(s"$path/postings")
      .filter(col("doc_id") === 9L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val dl9 = 3L
    def cu(tf: Long, df: Long): Long = {
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl9 / avgdl))
      math.floor(idf * tfn * 1e6 + 0.5).toLong
    }
    assert(got == Map("zeta" -> cu(2, 1), "alpha" -> cu(1, frozenDf("alpha"))))

    // retrievable by the new term, old docs unaffected
    val hits = Bm25Index.probeBatch(s, path,
        Seq((100L, "zeta")).toDF("query_id", "text"), k = 5)
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(hits.toSeq == Seq((9L, 1)))
    // a second append reusing the recorded df for zeta scores equally
    Bm25Index.append(s, Seq((10L, "zeta zeta alpha")).toDF("doc_id", "text"), path)
    val cu10 = s.read.parquet(s"$path/postings")
      .filter(col("doc_id") === 10L && col("term") === "zeta")
      .head().getLong(2)
    assert(cu10 == cu(2, 1))
  }

  test("append drift gauge: zero under replay, moves under vocabulary shift") {
    val s = spark.newSession()
    import s.implicits._
    val path = Files.createTempDirectory("bm25drift").toString + "/idx"
    val base = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta gamma delta"),
      (3L, "alpha delta delta")).toDF("doc_id", "text")
    Bm25Index.build(s, base, path)

    // replaying the build corpus: df shares, vocabulary, and avgdl all
    // match the frozen model exactly — every signal is 0
    val replay = Bm25Index.append(s, base, path)
    assert(replay.dfTvDrift == 0.0, s"tv=${replay.dfTvDrift}")
    assert(replay.oovMass == 0.0, s"oov=${replay.oovMass}")
    assert(replay.avgdlDrift == 0.0, s"avgdl=${replay.avgdlDrift}")
    assert(!replay.needsRebaseline)

    // a vocabulary-shifted, longer-doc batch: all three signals move
    val shifted = Bm25Index.append(s,
      Seq((20L, "omega sigma sigma tau tau tau omega kappa"),
        (21L, "omega kappa kappa sigma rho rho rho rho")).toDF("doc_id", "text"),
      path)
    assert(shifted.dfTvDrift > 0.3, s"tv=${shifted.dfTvDrift}")
    assert(shifted.oovMass > 0.9, s"oov=${shifted.oovMass}")
    assert(shifted.avgdlDrift > 0.5, s"avgdl=${shifted.avgdlDrift}")
    // the declared re-baseline threshold separates the two regimes
    assert(shifted.needsRebaseline)

    // the gauge history is persisted next to the index for thresholding
    val hist = s.read.parquet(s"$path/drift")
    assert(hist.count() == 2L)
    assert(hist.columns.toSet ==
      Set("df_tv_drift", "oov_mass", "avgdl_drift"))
  }
}
