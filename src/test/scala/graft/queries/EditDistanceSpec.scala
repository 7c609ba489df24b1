package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** xd9's banded length-blocking must be LOSSLESS: the binned candidate
  * join plus threshold-bounded levenshtein returns exactly the pairs a
  * brute-force all-pairs scan returns, including pairs whose lengths
  * straddle a bin boundary. Oracle = textbook DP levenshtein in plain
  * Scala over every a<b pair.
  */
class EditDistanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Deterministic corpus engineered around the K=4 band edges used in
    * the spec: clusters of strings at distances 0..6 apart, plus
    * length outliers. Lengths span several bins of width 5 and
    * include same-length-different-content and cross-bin near pairs.
    */
  private val corpus: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog"
    Seq(
      0L -> base,                                       // len 43
      1L -> base,                                       // dup: dist 0
      2L -> base.replace("quick", "quack"),             // dist 1 (substitution)
      3L -> base.replace("brown", "red"),               // dist 4 (2 sub + 2 del)
      4L -> (base + " twice"),                          // dist 6 (over K=4)
      5L -> base.drop(4),                               // dist 4 (prefix removal)
      6L -> "entirely different words here",            // far from all
      7L -> "abcd",                                     // short outlier, len 4 (bin 0)
      8L -> "abcx",                                     // dist 1 from 7
      9L -> "abcdefg",                                  // len 7 (bin 1): dist 3 from 7, crosses bin 0->1
      10L -> ("x" * 60),                                // long outlier
      11L -> ("x" * 58))                                // dist 2 from 10, bin boundary 59/60
  }

  private def docsDf = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  /** Full DP levenshtein — no banding, no early exit. */
  private def lev(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(
        math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  private def oracle(k: Int): Map[(Long, Long), Int] =
    (for {
      (a, ta) <- corpus
      (b, tb) <- corpus
      if a < b
      d = lev(ta, tb)
      if d <= k
    } yield (a, b) -> d).toMap

  test("fixture exercises cross-bin pairs (len diff > 0, same pair kept)") {
    // 7L (len 5) vs 9L (len 8) live in different width-5 bins; the
    // exploded probe range must still produce the pair.
    assert(corpus(7)._2.length / 5 != corpus(9)._2.length / 5)
    assert(lev(corpus(7)._2, corpus(9)._2) <= 4)
  }

  test("banded pairs == brute force, each pair exactly once (K=4)") {
    val got = Dedup.editDistancePairs(docsDf, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
    // no duplicate pair rows from the exploded bins
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.toMap == oracle(4))
  }

  test("distance values are the true edit distances (not -1 markers)") {
    val got = Dedup.editDistancePairs(docsDf, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val exp = oracle(4)
    assert(got.keySet == exp.keySet)
    got.foreach { case (p, d) => assert(d == exp(p), s"pair $p") }
  }

  test("threshold is a hard cutoff: K=1 drops the distance-4 pairs") {
    val got = Dedup.editDistancePairs(docsDf, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == oracle(1).keySet)
    assert(oracle(4).keySet.diff(got).nonEmpty) // K really tightened
  }
}
