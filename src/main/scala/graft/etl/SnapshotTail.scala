package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental consumption of a Snapshot table — tail the version
  * history and process each delta once per cursor state: the
  * lakehouse analog of the ETL loop's chain cursor (P13/P20), and the
  * polling form of a Delta streaming source. A downstream pipeline
  * (embedding refresh, incremental dedup xd6, training-mix rebuild)
  * calls `poll` on its trigger and receives exactly the rows appended
  * since its last successful poll, read via Snapshot.readChanges —
  * O(new files) I/O, never a table rescan.
  *
  * Delivery contract is the ETL layer's: the cursor (any CursorStore:
  * atomic-rename file or JDBC row) advances only AFTER the handler
  * returns, so a crashed handler replays its whole delta —
  * at-least-once. Exactly-once end-to-end composes the same way as
  * the chain pipeline: a handler that lands its output through
  * `Snapshot.commitAppendOnce(out, sink, consumerId, until)` makes
  * the replayed delta a recognized duplicate (the until-version is
  * the batch id — monotone per consumer, exactly the Delta txn
  * shape).
  *
  * Rewrites (optimize / overwrite / rollback inside the uncommitted
  * range) make the delta inexpressible as added-files; the policy is
  * the caller's:
  *  - `OnRewrite.Fail` (default): surface the IllegalStateException —
  *    the Delta-source-without-ignoreChanges posture;
  *  - `OnRewrite.FullRefresh`: deliver the ENTIRE current version as
  *    the delta (refresh = since 0) and advance — for consumers whose
  *    processing is idempotent per (consumer, version).
  */
object SnapshotTail {

  sealed trait OnRewrite
  object OnRewrite {
    case object Fail extends OnRewrite
    case object FullRefresh extends OnRewrite
  }

  /** One delivered delta: rows added in versions (since, until]. A
    * FullRefresh delivery has since = 0.
    */
  final case class Delta(since: Long, until: Long, rows: DataFrame)

  /** Process the next unconsumed version range, if any. Returns the
    * delivered (since, until] range, or None when the cursor is
    * already at the table head (nothing new — the P11 short-circuit:
    * no read, no handler call).
    */
  def poll(spark: SparkSession, path: String, cursor: CursorStore,
      onRewrite: OnRewrite = OnRewrite.Fail)(f: Delta => Unit)
      : Option[(Long, Long)] = {
    val since = cursor.read().getOrElse(0L)
    val until = Snapshot.currentVersion(path).getOrElse(0L)
    if (until <= since) None
    else {
      val delta =
        try Delta(since, until,
          Snapshot.readChanges(spark, path, since, Some(until)))
        catch {
          case e: IllegalStateException => onRewrite match {
            case OnRewrite.Fail => throw e
            case OnRewrite.FullRefresh =>
              Delta(0L, until, Snapshot.read(spark, path, Some(until)))
          }
        }
      f(delta)
      cursor.write(until) // only after a fully successful handler run
      Some((delta.since, until))
    }
  }
}
