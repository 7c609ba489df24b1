package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The dedup family at vocabularies the 64-bit mask fast path cannot
  * represent (VERDICT r1 "what's wrong" #2): a deterministic synthetic
  * corpus over a 200-token vocabulary, verified against a brute-force
  * Jaccard oracle computed in plain Scala. Also the >=1024-distinct-
  * shingle regression for the (since removed) packed-long key in xd3.
  */
class GeneralVocabSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 200 two-letter alphabetic tokens (tokenizer-safe: Llm.tokens
    * splits on non-alpha).
    */
  private val vocab: IndexedSeq[String] =
    for (i <- 0 until 200)
      yield s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"

  /** 10 clusters; per cluster: a base 40-token set, an exact duplicate,
    * and a near-dup sharing 38 of its tokens plus 2 fresh (J = 38/42 ≈
    * 0.905). Cluster bases stride by 13 so neighboring clusters overlap
    * at J ≈ 0.51 — below the 0.8 threshold. All index arithmetic, no
    * RNG: the expected answer is stable across runs.
    */
  private val corpus: Seq[(Long, Set[String])] = (0 until 10).flatMap { c =>
    val base = (0 until 40).map(k => vocab((c * 13 + k) % 200)).toSet
    val near = base.take(38) ++ Set(vocab((c * 13 + 77) % 200), vocab((c * 13 + 91) % 200))
    Seq((c * 3L, base), (c * 3L + 1, base), (c * 3L + 2, near))
  }

  private def docsDf = {
    import spark.implicits._
    corpus.map { case (id, toks) => (id, toks.toSeq.sorted.mkString(" ")) }
      .toDF("doc_id", "text")
  }

  /** Brute-force J >= t pairs over the Scala sets. */
  private def oracle(t: Double): Set[(Long, Long)] =
    (for {
      (a, sa) <- corpus
      (b, sb) <- corpus
      if a < b
      j = (sa intersect sb).size.toDouble / (sa union sb).size
      if j >= t
    } yield (a, b)).toSet

  test("corpus really exceeds the 64-token mask limit") {
    assert(corpus.flatMap(_._2).distinct.size > 64)
  }

  test("exactJaccardPairs matches the brute-force oracle at vocab > 64") {
    val got = Dedup.exactJaccardPairs(Dedup.setGroups(docsDf), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == oracle(0.8))
  }

  test("exactJaccardPairs scores match the oracle's Jaccard values") {
    val got = Dedup.exactJaccardPairs(Dedup.setGroups(docsDf), 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val sets = corpus.toMap
    for (((a, b), j) <- got) {
      val exp = (sets(a) intersect sets(b)).size.toDouble / (sets(a) union sets(b)).size
      assert(math.abs(j - exp) < 5e-5, s"pair ($a,$b): got $j expected $exp")
    }
  }

  test("minhashPairs: no false positives and recall >= 0.95 at vocab > 64") {
    val exact = oracle(0.8)
    val got = Dedup.minhashPairs(Dedup.setGroups(docsDf), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact),
      s"false positives: ${got diff exact}") // verify stage is exact
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall below 0.95")
  }

  test("qx2 mask fast path == general co-occurrence path on the <=64-vocab fixture") {
    val sf = "/root/testdata/sf0.001"
    val viaMask = Llm.qx2.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val docs = Ctx(spark, sf).documents
    val viaGeneral = Dedup.exactJaccardPairs(Dedup.setGroups(docs), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaMask == viaGeneral)
  }

  test("groupEdgesGated == groupEdgesGeneral on both sides of the vocab gate") {
    import org.apache.spark.sql.functions.col
    def edges(df: org.apache.spark.sql.DataFrame) = {
      val groups = Dedup.setGroups(df)
      val gated = Dedup.groupEdgesGated(groups, 0.8)
        .select("gid_a", "gid_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val general = Dedup.groupEdgesGeneral(groups, 0.8)
        .select("gid_a", "gid_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      groups.unpersist()
      (gated, general)
    }
    // >64-vocab corpus: the gate must take the general path
    val (gatedBig, generalBig) = edges(docsDf)
    assert(gatedBig == generalBig && gatedBig.nonEmpty)
    // <=64-vocab fixture: the gate takes the MASK path; popcount
    // arithmetic must produce exactly the co-occurrence path's edges
    val fixture = Ctx(spark, "/root/testdata/sf0.001").documents
    val (gatedMask, generalSmall) = edges(fixture)
    assert(gatedMask == generalSmall && gatedMask.nonEmpty)
  }

  test("shinglePairs survives docs with >= 1024 distinct shingles") {
    import spark.implicits._
    // ~1500 tokens -> ~1498 distinct shingles per doc; the old
    // doc_id*1024+size packed key wrapped here and corrupted both
    // fields. Two identical long docs (J = 1.0) + one unrelated.
    val longText = (0 until 1500)
      .map(k => s"${('a' + k / 676 % 26).toChar}${('a' + k / 26 % 26).toChar}${('a' + k % 26).toChar}")
      .mkString(" ")
    val docs = Seq(
      (100L, longText),
      (200L, longText),
      (300L, "zz yy xx ww vv uu tt ss rr qq")).toDF("doc_id", "text")
    val got = Dedup.shinglePairs(docs, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((100L, 200L, 1.0)))
  }

  test("containmentPairs: asymmetric direction and empty-set docs") {
    import spark.implicits._
    // base: 40 tokens; sub: its first 20 tokens (C(sub->base)=1.0,
    // C(base->sub)=0.5 — only one direction passes 0.9); two token-less
    // docs (digits only) must emit NOTHING (containment is 0/0)
    val base = (0 until 40).map(vocab).toSeq
    val sub = base.take(20)
    val docs = Seq(
      (1L, base.mkString(" ")),
      (2L, sub.mkString(" ")),
      (3L, "123 456"),
      (4L, "789")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(Dedup.setGroups(docs), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((2L, 1L, 1.0)))
  }

  test("containment prefix filter: stop-word saturation stays sub-quadratic") {
    import spark.implicits._
    // 120 docs, each: 30 unique tokens (disjoint across docs) + the
    // SAME 10 stop words. Every doc pair shares the stop words, so a
    // token-equality candidate join would emit all 120*119/2 = 7140
    // pairs (x100 stop-token rows); true containment is 10/40 = 0.25
    // — nothing qualifies. Under the rarity-ordered prefix (k =
    // floor(40*0.1)+2 = 6 rarest tokens, all doc-unique), stop words
    // never enter a prefix and the candidate set is EMPTY.
    def al(n: Int): String =
      s"${('a' + n / 26).toChar}${('a' + n % 26).toChar}"
    def uniq(d: Int): Seq[String] = (0 until 30).map(i => s"q${al(d)}${al(i)}")
    val stop = (0 until 10).map(i => s"zz${vocab(i)}")
    val docs = (0 until 120).map { d =>
      (d.toLong, (uniq(d) ++ stop).mkString(" "))
    }.toDF("doc_id", "text")
    val groups = Dedup.setGroups(docs)
    assert(Dedup.containmentCandidates(groups, 0.9).count() == 0L)
    assert(Dedup.containmentPairs(groups, 0.9).count() == 0L)
    groups.unpersist()

    // and the filter keeps genuine containment: one doc fully inside
    // a saturated other still surfaces
    val withDup = (0 until 60).map { d =>
      (d.toLong, (uniq(d) ++ stop).mkString(" "))
    } :+ (999L, (uniq(7).take(27) ++ stop).mkString(" "))
    val g2 = Dedup.setGroups(withDup.toDF("doc_id", "text"))
    val got = Dedup.containmentPairs(g2, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    g2.unpersist()
    // doc 999: 37 tokens, 37 shared with doc 7 (27 uniq + 10 stop) = 1.0
    assert(got.contains((999L, 7L)))
  }
}
