package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for a bounded top-k. */
case class Scored(score: Double, id: Long)

/** Aggregation buffer: the current best-k, kept sorted best-first by
  * (score DESC, id ASC). Parallel primitive arrays — no per-entry
  * boxing in the hash-map-resident buffer, and the product encoder
  * serializes them as compact primitive arrays at shuffle boundaries.
  */
case class TopKBuf(scores: Array[Double], ids: Array[Long])

/** Bounded top-k by (score DESC, id ASC) as a typed [[Aggregator]].
  *
  * Why an Aggregator and not a ranking window: row_number() over
  * (PARTITION BY key ORDER BY score) must shuffle and sort EVERY
  * candidate row. This aggregate is partial-aggregating
  * (ObjectHashAggregate): each map task reduces its candidates to at
  * most k entries per key before the exchange, so an n²-pair
  * similarity join shuffles ≤ k rows per key instead of n. That is
  * the difference between a 100 TB all-pairs stage whose shuffle is
  * bounded by keys·k and one bounded by the pair count.
  *
  * Determinism: insertion keeps a total order (score DESC, id ASC);
  * merge order across partials cannot affect the final set because
  * membership is decided by that total order alone.
  */
class TopK(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def insert(b: TopKBuf, s: Double, id: Long): TopKBuf = {
    val n = b.scores.length
    // common case after warm-up: strictly worse than the current k-th
    if (n == k && !better(s, id, b.scores(n - 1), b.ids(n - 1))) return b
    var pos = 0
    while (pos < n && better(b.scores(pos), b.ids(pos), s, id)) pos += 1
    if (pos >= k) return b
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m)
    val ni = new Array[Long](m)
    System.arraycopy(b.scores, 0, ns, 0, pos)
    System.arraycopy(b.ids, 0, ni, 0, pos)
    ns(pos) = s
    ni(pos) = id
    val rest = m - pos - 1
    if (rest > 0) {
      System.arraycopy(b.scores, pos, ns, pos + 1, rest)
      System.arraycopy(b.ids, pos, ni, pos + 1, rest)
    }
    TopKBuf(ns, ni)
  }

  override def reduce(b: TopKBuf, a: Scored): TopKBuf =
    insert(b, a.score, a.id)

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    var acc = x
    var i = 0
    while (i < y.scores.length) {
      acc = insert(acc, y.scores(i), y.ids(i))
      i += 1
    }
    acc
  }

  override def finish(b: TopKBuf): Seq[Scored] =
    b.scores.indices.map(i => Scored(b.scores(i), b.ids(i)))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
