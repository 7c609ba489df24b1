package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-insensitive table fingerprinting — the reconciliation
  * primitive for lake operations at scale: after a migration,
  * compaction, engine swap, or backfill, prove two table versions
  * hold the SAME multiset of rows without sorting or joining either
  * side. Each row hashes to a 60-bit integer (md5 over a canonical
  * rendering — md5 is bit-identical across engines, unlike any
  * engine-native hash), and the table's checksum is the exact
  * decimal SUM of row hashes: commutative, so partial sums
  * map-side-combine and NO row order, partitioning, or file layout
  * affects the result. Comparing two 100 TB tables costs one scan +
  * one tiny aggregate each, zero shuffles of data rows.
  *
  * Collision posture: a forged collision needs row-hash sums to
  * coincide (birthday ~n²/2^60 for accidental equality) — right for
  * validation, not for adversarial integrity (use a Merkle tree and
  * a crypto hash if an attacker controls the data).
  *
  * Null caveat: concat_ws SKIPS nulls in both engines, so ('a', null)
  * and ('a') render alike — callers whose key columns are nullable
  * should coalesce to a sentinel first.
  */
object TableCheck {

  /** 60-bit row hash of `cols`' canonical rendering — the Md5Hash60
    * kernel, bit-identical to `conv(substring(md5(x), 1, 15), 16, 10)`
    * without the per-row hex string + substring + base-16 parse
    * allocations (this projection runs once per row of a 100 TB
    * table). Each value is LENGTH-PREFIXED before joining, so the
    * rendering is unambiguous under embedded delimiters: ("a|b", "c")
    * renders "3:a|b|1:c" while ("a", "b|c") renders "1:a|3:b|c" — a
    * bare '|' join would hash both identically and silently certify a
    * value shifted across a column boundary.
    */
  private def rowHash(df: DataFrame, cols: Seq[String]): Column = {
    graft.functions.Md5Hash60.register(df.sparkSession)
    val rendered = cols.map { c =>
      val s = col(c).cast("string")
      concat(length(s).cast("string"), lit(":"), s)
    }
    call_function("md5_60",
      concat_ws("|", rendered: _*).cast("binary"))
      .cast("decimal(38,0)")
  }

  /** One (n_rows, checksum) row for the whole table. */
  def checksum(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"), sum(rowHash(df, cols)).as("checksum"))

  /** Per-group (group, n_rows, checksum) — reconcile partition-sized
    * slices so a mismatch localizes to the slice, not the table.
    */
  def checksumBy(df: DataFrame, groupCols: Seq[String],
      cols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(rowHash(df, cols)).as("checksum"))
}
