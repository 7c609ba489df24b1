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
  * decimal SUM of row hashes (folded mod 2^60 on output, below):
  * commutative, so partial sums
  * map-side-combine and NO row order, partitioning, or file layout
  * affects the result. Comparing two 100 TB tables costs one scan +
  * one tiny aggregate each, zero shuffles of data rows.
  *
  * Collision posture: a forged collision needs row-hash sums to
  * coincide (birthday ~n²/2^60 for accidental equality) — right for
  * validation, not for adversarial integrity (use a Merkle tree and
  * a crypto hash if an attacker controls the data).
  *
  * The published checksum is the exact sum FOLDED mod 2^60 into
  * BIGINT range. Folding preserves order-insensitivity
  * ((a+b) mod m = ((a mod m)+(b mod m)) mod m) and collision odds
  * (the fold range equals the row-hash range), and keeps the value
  * exact through every serialization layer — the raw DECIMAL(38,0)
  * sum exceeds 2^53 and silently loses digits in any float64 hop
  * (e.g. a dataframe bridge on the comparing side).
  *
  * Nulls render as the reserved token "N" — unambiguous because
  * every non-null value renders length-prefixed as "len:value",
  * which always contains ':'. So ('a', NULL, 'b') and
  * ('a', 'b', NULL) hash differently, and nullable key columns need
  * no caller-side coalesce.
  */
object TableCheck {

  /** 2^60 — fold modulus; published checksums are in [0, 2^60). */
  val FoldMod: Long = 1L << 60

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
  private[operators] def rowHash(df: DataFrame, cols: Seq[String]): Column = {
    graft.functions.Md5Hash60.register(df.sparkSession)
    val rendered = cols.map { c =>
      val s = col(c).cast("string")
      // NULL → reserved "N"; non-null always contains ':' so the two
      // namespaces cannot collide and concat_ws never drops a token.
      when(s.isNull, lit("N"))
        .otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    call_function("md5_60",
      concat_ws("|", rendered: _*).cast("binary"))
      .cast("decimal(38,0)")
  }

  /** Exact DECIMAL(38,0) interior sum, folded to BIGINT on output.
    * The interior stays exact (no per-row mod) so partial aggregates
    * map-side-combine in decimal; one fold at the end.
    */
  private[operators] def foldedSum(h: Column): Column =
    (sum(h) % lit(FoldMod)).cast("long")

  /** One (n_rows, checksum) row for the whole table. */
  def checksum(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      foldedSum(rowHash(df, cols)).as("checksum"))

  /** Per-group (group, n_rows, checksum) — reconcile partition-sized
    * slices so a mismatch localizes to the slice, not the table.
    */
  def checksumBy(df: DataFrame, groupCols: Seq[String],
      cols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        foldedSum(rowHash(df, cols)).as("checksum"))
}
