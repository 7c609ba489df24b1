package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

/** Incremental dedup (xd6): batch-vs-corpus matching replayed in plain
  * scala on the fixture, and the bipartite edge generator checked on
  * both sides of the vocabulary gate (mask popcount vs token
  * co-occurrence must agree exactly, like the symmetric form).
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def tokset(t: String): Set[String] =
    t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSet

  test("xd6 matches a brute-force batch-vs-corpus replay") {
    val texts = Ctx(spark, sf).documents.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), tokset(r.getString(1))))
    val corpus = texts.filter(_._1 % 5 != 0)
    val batch = texts.filter(_._1 % 5 == 0)
    val expected = batch.flatMap { case (db, sb) =>
      val cands = corpus.flatMap { case (da, sa) =>
        val j = (sa intersect sb).size.toDouble / (sa union sb).size
        if (j >= 0.8)
          Some((da, BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        else None
      }
      if (cands.isEmpty) None
      else {
        val (da, j) = cands.minBy { case (id, j) => (-j, id) }
        Some((db, da, j))
      }
    }.toSet
    val got = Dedup.xd6.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
  }

  test("bipartite gated == general on both sides of the vocab gate") {
    def sides(df: org.apache.spark.sql.DataFrame) = {
      val groups = Dedup.setGroups(df)
      import org.apache.spark.sql.functions._
      val s = groups.select(col("gid"), col("toks"), col("htoks"), col("sz"),
        expr("filter(ids, i -> i % 2 != 0)").as("ic"),
        expr("filter(ids, i -> i % 2 = 0)").as("ib"))
      val ga = s.filter(size(col("ic")) > 0)
        .select(col("gid").as("gid_a"), col("toks").as("toks_a"),
          col("htoks").as("h_a"), col("sz").as("sa"))
      val gb = s.filter(size(col("ib")) > 0)
        .select(col("gid").as("gid_b"), col("toks").as("toks_b"),
          col("htoks").as("h_b"), col("sz").as("sb"))
      val gated = Dedup.crossEdgesGated(groups, ga, gb, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val general = Dedup.crossEdgesGeneral(ga, gb, 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      groups.unpersist()
      (gated, general)
    }
    // <=64-vocab fixture: gate takes the mask path
    val (gm, gg) = sides(Ctx(spark, sf).documents)
    assert(gm == gg && gm.nonEmpty)
    // >64-vocab synthetic corpus (GeneralVocabSpec's construction):
    // gate must fall through to co-occurrence
    import spark.implicits._
    val vocab = for (i <- 0 until 200)
      yield s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val docs = (0 until 10).flatMap { c =>
      val base = (0 until 40).map(k => vocab((c * 13 + k) % 200)).toSet
      val near = base.take(38) ++
        Set(vocab((c * 13 + 77) % 200), vocab((c * 13 + 91) % 200))
      Seq((c * 3L, base), (c * 3L + 1, base), (c * 3L + 2, near))
    }.map { case (id, toks) => (id, toks.toSeq.sorted.mkString(" ")) }
      .toDF("doc_id", "text")
    val (bm, bg) = sides(docs)
    assert(bm == bg && bm.nonEmpty)
  }

  test("identical set split across sides yields a J = 1 self-gid edge") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa bb cc dd"), // corpus (odd)
      (2L, "aa bb cc dd"), // batch (even) — identical set, same gid
      (4L, "zz yy xx ww")) // batch, no corpus match
      .toDF("doc_id", "text")
    val groups = Dedup.setGroups(docs)
    import org.apache.spark.sql.functions._
    val s = groups.select(col("gid"), col("toks"), col("htoks"), col("sz"),
      expr("filter(ids, i -> i % 2 != 0)").as("ic"),
      expr("filter(ids, i -> i % 2 = 0)").as("ib"))
    val ga = s.filter(size(col("ic")) > 0)
      .select(col("gid").as("gid_a"), col("toks").as("toks_a"),
        col("htoks").as("h_a"), col("sz").as("sa"))
    val gb = s.filter(size(col("ib")) > 0)
      .select(col("gid").as("gid_b"), col("toks").as("toks_b"),
        col("htoks").as("h_b"), col("sz").as("sb"))
    val edges = Dedup.crossEdgesGated(groups, ga, gb, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    groups.unpersist()
    assert(edges.length == 1)
    assert(edges.head._1 == edges.head._2 && edges.head._3 == 1.0)
  }
}
