package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types._

/** Bloom-filter join pruning — cut a fact-side shuffle down to
  * (probably) matching rows BEFORE the exchange, the standard
  * runtime-filtering move for selective joins at warehouse scale
  * (Spark's own runtime row-level filtering, Trino's dynamic
  * filtering, and every MPP engine's bloom pushdown do exactly this).
  *
  * Shape: one distributed aggregate over the dim side builds the
  * filter (mergeable partials — each task sketches its split, the
  * driver ORs them), the bits broadcast to every executor, and the
  * fact side drops non-matching rows at the scan stage. The exchange
  * then moves only the ~matching slice: for a 1% -selective dim key
  * on a 100 TB fact table that is a 100× smaller shuffle for one
  * broadcast of filter bits.
  *
  * Exactness: a bloom filter has false POSITIVES only — extra rows
  * survive the prune and the downstream exact join removes them.
  * False negatives cannot occur, so `prune` composed with the real
  * join returns byte-identical results to the unpruned join (spec'd
  * in BloomPruneSpec; q44 hash-checks it against the oracle).
  *
  * Sizing at scale: ~9.6 bits/key at 1% fpp — 1M keys ≈ 1.2 MB,
  * 100M keys ≈ 120 MB. Past broadcastable sizes the right tool is a
  * shuffled semi-join (q09), not a bigger bloom; callers hold the
  * expectedKeys estimate and make that call. Catalyst's own
  * runtime bloom injection (spark.sql.optimizer.runtime.bloomFilter)
  * covers the automatic case; this operator is the explicit form for
  * when the caller knows the selectivity Catalyst can't see.
  */
object BloomPrune {

  /** A pruned plan plus the lifecycle of its broadcast filter bits:
    * `release()` unpersists the broadcast once every query derived
    * from `df` has COMPLETED — executor copies are dropped
    * immediately (the memory that actually accumulates in a
    * long-lived service), while the driver-held value stays readable
    * so an ASYNC consumer that re-touches the plan after release —
    * Spark's QueryExecutionListener bus re-evaluating observed
    * metrics is the concrete one — lazily re-broadcasts instead of
    * hitting a use-after-destroy ("Attempted to use Broadcast(n)
    * after it was destroyed", poisoning every registered listener).
    * The ContextCleaner reaps the remainder once the plan is
    * unreachable; `destroy()` is deliberately NOT exposed.
    */
  final case class Pruned(df: DataFrame, release: () => Unit)

  /** `fact` rows whose `factKey` probably appears in `dim`'s `dimKey`
    * (false positives at ~`fpp`, zero false negatives). Long-ish and
    * string keys supported — the two shapes join keys actually take.
    *
    * One-shot convenience over `pruneManaged`: the broadcast filter
    * lives until application end. Fine for a query-at-a-time driver;
    * repeated callers should use `pruneManaged` and release.
    */
  def prune(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame =
    pruneManaged(fact, dim, factKey, dimKey, expectedKeys, fpp).df

  /** As `prune`, returning the broadcast's lifecycle handle. */
  def pruneManaged(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedKeys: Long, fpp: Double = 0.01): Pruned = {
    val bf = dim.stat.bloomFilter(dimKey, math.max(expectedKeys, 1L), fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val pred = fact.schema(factKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
          .apply(col(factKey).cast("long"))
      case StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
          .apply(col(factKey))
      case other => throw new IllegalArgumentException(
        s"bloom prune supports integral/string keys, got ${other.sql}")
    }
    Pruned(fact.filter(pred), () => bc.unpersist(blocking = false))
  }
}
