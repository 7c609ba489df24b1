package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension history (SURVEY §2.A P14c) — keep every
  * attribute version a key has ever had, with its validity interval,
  * while Upsert (P14b) keeps only the latest. The warehouse shape for
  * "what did this customer's segment look like when the order shipped?"
  *
  * Architecture: APPEND-ONLY over the versioned snapshot lake. A
  * change batch appends one row per key whose attributes actually
  * changed (or is new), stamped `valid_from = asOf`; nothing is ever
  * rewritten. `valid_to` / `is_current` are DERIVED at read with one
  * per-key window (`lead(valid_from)`), not stored — the classic
  * stored-SCD2 design has to rewrite the dimension to close rows on
  * every batch, which at scale turns each merge into a full-dimension
  * shuffle; here ingest cost is delta-sized and the close is a column
  * the reader computes. Compact/optimize can materialize it later if
  * a serving layer wants it flat.
  *
  * Riding `Snapshot` buys the rest of the semantics free: time travel
  * (the dimension AS OF lake version v), exactly-once stream appends
  * (commitAppendOnce), and vacuum. `asOf` here is BUSINESS time
  * (validity), snapshot versions are SYSTEM time — bitemporal, the
  * two axes deliberately independent.
  *
  * No-op suppression is part of the contract: re-applying a batch
  * whose values already match current state appends ZERO rows, so
  * retried extracts don't grow history with phantom versions.
  *
  * Contract: `asOf` must strictly increase across batches that touch
  * the same key — two versions of one key sharing a valid_from have
  * no defined order (current() and the view's lead window would both
  * tie-break arbitrarily). Any monotone batch clock satisfies this;
  * applyChangesOnce's batchId ordering implies it for streams.
  */
object Scd2 {

  final case class ApplyStats(appended: Long, noops: Long, version: Option[Long])

  private val From = "valid_from"

  /** Create the dimension at `path`: every row of df becomes the
    * initial current version, valid from `asOf`.
    */
  def init(df: DataFrame, path: String, asOf: Timestamp): Long =
    Snapshot.commitOverwrite(df.withColumn(From, lit(asOf)), path)

  /** Apply a change batch effective `asOf`: rows whose attributes
    * differ from the key's CURRENT version (or whose key is new)
    * append as new versions; identical rows are suppressed. `changes`
    * must be key-unique and share the dimension's business schema
    * (everything except valid_from).
    */
  def applyChanges(spark: SparkSession, path: String, changes: DataFrame,
      keys: Seq[String], asOf: Timestamp): ApplyStats = {
    val attrs = changes.columns.filterNot(keys.contains).toSeq
    val cur = current(spark, path, keys)
      .select(keys.map(col) :+
        struct(attrs.map(col): _*).as("_cur_attrs") :+
        lit(true).as("_matched"): _*)
    // one key-shuffle join of the (small) batch against current rows;
    // null-safe struct compare so NULL attribute flips count as changes
    // and a brand-new key with all-NULL attributes still inserts
    // (_matched distinguishes "no current row" from "nulls matched")
    val delta = changes
      .join(cur, keys, "left")
      .filter(col("_matched").isNull ||
        !(struct(attrs.map(col): _*) <=> col("_cur_attrs")))
      .select(changes.columns.map(col).toIndexedSeq: _*)
      .persist()
    val appended = delta.count()
    val stats =
      if (appended == 0) ApplyStats(0, changes.count(), None)
      else {
        val v = Snapshot.commitAppend(delta.withColumn(From, lit(asOf)), path)
        ApplyStats(appended, changes.count() - appended, Some(v))
      }
    delta.unpersist()
    stats
  }

  /** Exactly-once streaming form of applyChanges — for a dimension
    * maintained from a change STREAM (foreachBatch). Value-level no-op
    * suppression alone makes replays of the LATEST batch idempotent,
    * but cannot protect against the at-least-once double-apply hazard:
    * if batch N set a→b, batch N+1 set b→a, and batch N then REPLAYS,
    * its delta is non-empty again and would re-append stale history.
    * The (streamId, batchId) marker rides the manifest commit
    * (Snapshot.commitAppendOnce — one atomic rename commits data AND
    * marker), so a replayed batch is skipped outright. An empty delta
    * still publishes a marker-only version: the skip must engage even
    * when the batch happened to be all no-ops.
    */
  def applyChangesOnce(spark: SparkSession, path: String, changes: DataFrame,
      keys: Seq[String], asOf: Timestamp, streamId: String,
      batchId: Long): Option[ApplyStats] = {
    val attrs = changes.columns.filterNot(keys.contains).toSeq
    val cur = current(spark, path, keys)
      .select(keys.map(col) :+
        struct(attrs.map(col): _*).as("_cur_attrs") :+
        lit(true).as("_matched"): _*)
    val delta = changes
      .join(cur, keys, "left")
      .filter(col("_matched").isNull ||
        !(struct(attrs.map(col): _*) <=> col("_cur_attrs")))
      .select(changes.columns.map(col).toIndexedSeq: _*)
      .persist()
    val appended = delta.count()
    val committed = Snapshot.commitAppendOnce(
      delta.withColumn(From, lit(asOf)), path, streamId, batchId)
    delta.unpersist()
    committed.map(v => ApplyStats(appended, changes.count() - appended, Some(v)))
  }

  /** Full history with derived validity: valid_from, valid_to (NULL =
    * open), is_current. One window per key — the only shuffle.
    */
  def view(spark: SparkSession, path: String,
      keys: Seq[String], version: Option[Long] = None): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(From))
    Snapshot.read(spark, path, version)
      .withColumn("valid_to", lead(col(From), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** The dimension as of BUSINESS time `ts` (validity-interval
    * filter). `version` optionally pins SYSTEM time too — bitemporal.
    */
  def asOf(spark: SparkSession, path: String, keys: Seq[String],
      ts: Timestamp, version: Option[Long] = None): DataFrame =
    view(spark, path, keys, version)
      .filter(col(From) <= lit(ts) &&
        (col("valid_to").isNull || col("valid_to") > lit(ts)))
      .drop("valid_to", "is_current")

  /** Current rows only: the row with max valid_from per key, via a
    * partial-aggregating max_by over the full row struct — one
    * map-side-combined shuffle, never a window that materializes every
    * historical version per key.
    */
  def current(spark: SparkSession, path: String, keys: Seq[String]): DataFrame = {
    val snap = Snapshot.read(spark, path)
    snap
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(snap.columns.map(col).toIndexedSeq: _*), col(From)).as("r"))
      .select(col("r.*"))
  }
}
