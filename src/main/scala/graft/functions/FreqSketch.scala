package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (term, est) entry of a frequent-items summary. */
case class TermCount(term: String, est: Long)

/** Misra-Gries buffer: term -> running count, plus the total token
  * count `n` feeding the merged error bound N/cap. Backed by a hash
  * map so the per-token hot path is O(1) expected — a parallel-array
  * buffer would pay an O(cap) string scan per token plus a full copy
  * per new term, on exactly the path the sketch exists to optimize.
  * Immutable: reduce/merge never alias or mutate an input buffer, so
  * any merge order / buffer reuse by the aggregation iterator is safe.
  */
case class MGBuf(m: Map[String, Long], n: Long)

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

  override def zero: MGBuf = MGBuf(Map.empty, 0L)

  override def reduce(b: MGBuf, term: String): MGBuf =
    b.m.get(term) match {
      case Some(c) => MGBuf(b.m.updated(term, c + 1), b.n + 1)
      case None if b.m.size < cap =>
        MGBuf(b.m.updated(term, 1L), b.n + 1)
      case None =>
        // MG decrement step: every counter down one, drop the zeros.
        // The arriving term is "absorbed" by the decrement (not stored).
        val dec = b.m.collect { case (t, c) if c > 1 => t -> (c - 1) }
        MGBuf(dec, b.n + 1)
    }

  override def merge(x: MGBuf, y: MGBuf): MGBuf = {
    if (y.m.isEmpty) return MGBuf(x.m, x.n + y.n)
    if (x.m.isEmpty) return MGBuf(y.m, x.n + y.n)
    val combined = y.m.foldLeft(x.m) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    val trimmed =
      if (combined.size <= cap) combined
      else {
        // subtract the (cap+1)-th largest count from everything; at
        // most cap entries stay strictly positive
        val cut = combined.values.toArray
          .sorted(Ordering[Long].reverse).apply(cap)
        combined.collect { case (t, c) if c > cut => t -> (c - cut) }
      }
    MGBuf(trimmed, x.n + y.n)
  }

  /** Summary sorted by (est DESC, term ASC) — a deterministic order of
    * the retained entries, ready for slice-based top-k.
    */
  override def finish(b: MGBuf): Seq[TermCount] =
    b.m.toSeq
      .map { case (t, c) => TermCount(t, c) }
      .sortBy(tc => (-tc.est, tc.term))

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]

  override def outputEncoder: Encoder[Seq[TermCount]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TermCount]]()
}
