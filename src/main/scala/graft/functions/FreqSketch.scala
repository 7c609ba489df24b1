package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (term, est) entry of a frequent-items summary. */
case class TermCount(term: String, est: Long)

/** Misra-Gries buffer: parallel arrays, unsorted (insertion order);
  * the total count feeds the merged error bound N/cap.
  */
case class MGBuf(terms: Array[String], counts: Array[Long], n: Long)

/** Misra-Gries frequent-items sketch as a typed [[Aggregator]] — the
  * heavy-hitters scale path. A capacity-`cap` summary guarantees, for
  * every term, trueCount − N/cap ≤ est ≤ trueCount (N = tokens seen),
  * so every term with frequency above N/cap is retained. Merging two
  * summaries (sum shared counts, then subtract the (cap+1)-th largest
  * and drop non-positives) preserves the bound with errors adding —
  * the classic mergeable-summaries result (Agarwal et al., PODS'12).
  *
  * Why an Aggregator: groupBy(lang).agg(freq_sketch(term)) runs as
  * ObjectHashAggregate with map-side partials, so each task reduces
  * its token stream to ≤ cap entries per language BEFORE the exchange.
  * The shuffle is bounded by groups × cap — constant in corpus size —
  * instead of the full (lang, term) vocabulary an exact count
  * shuffles. At 100 TB that is the difference between a sketch-sized
  * and a vocabulary-sized exchange; the exact form (xt7) stays the
  * reference the sketch is spec-tested against.
  *
  * Determinism: when cap ≥ the true vocabulary of a group no
  * decrement ever fires and the sketch is EXACT regardless of
  * partitioning or merge order (FreqSketchSpec proves invariance
  * under repartition). Under pressure (cap < vocab) the estimates are
  * partitioning-dependent within the error bound — callers wanting a
  * hash-stable output must use the exact form.
  */
class FreqSketch(cap: Int) extends Aggregator[String, MGBuf, Seq[TermCount]] {

  override def zero: MGBuf = MGBuf(Array.empty, Array.empty, 0L)

  override def reduce(b: MGBuf, term: String): MGBuf = {
    val idx = b.terms.indexOf(term)
    if (idx >= 0) {
      b.counts(idx) += 1 // in-place: Spark owns the buffer between calls
      MGBuf(b.terms, b.counts, b.n + 1)
    } else if (b.terms.length < cap) {
      MGBuf(b.terms :+ term, b.counts :+ 1L, b.n + 1)
    } else {
      // MG decrement step: every counter down one, drop the zeros.
      // The arriving term is "absorbed" by the decrement (not stored).
      val keep = Array.newBuilder[Int]
      var i = 0
      while (i < b.counts.length) {
        if (b.counts(i) > 1) keep += i
        i += 1
      }
      val ks = keep.result()
      MGBuf(ks.map(b.terms), ks.map(b.counts(_) - 1), b.n + 1)
    }
  }

  override def merge(x: MGBuf, y: MGBuf): MGBuf = {
    if (y.terms.isEmpty) return MGBuf(x.terms, x.counts, x.n + y.n)
    if (x.terms.isEmpty) return MGBuf(y.terms, y.counts, x.n + y.n)
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var i = 0
    while (i < x.terms.length) { m.update(x.terms(i), x.counts(i)); i += 1 }
    i = 0
    while (i < y.terms.length) {
      m.update(y.terms(i), m.getOrElse(y.terms(i), 0L) + y.counts(i))
      i += 1
    }
    if (m.size > cap) {
      // subtract the (cap+1)-th largest count from everything; at most
      // cap entries stay strictly positive
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      m.mapValuesInPlace((_, v) => v - cut)
      m.filterInPlace((_, v) => v > 0)
    }
    MGBuf(m.keys.toArray, m.values.toArray, x.n + y.n)
  }

  /** Summary sorted by (est DESC, term ASC) — a deterministic order of
    * the retained entries, ready for slice-based top-k.
    */
  override def finish(b: MGBuf): Seq[TermCount] =
    b.terms.indices
      .map(i => TermCount(b.terms(i), b.counts(i)))
      .sortBy(tc => (-tc.est, tc.term))

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]

  override def outputEncoder: Encoder[Seq[TermCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TermCount]]()
}
