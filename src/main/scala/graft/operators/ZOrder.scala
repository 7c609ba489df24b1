package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping — the lake-layout complement to `etl.Compact`.
  *
  * A table laid out by ONE sort key prunes scans filtered on that key
  * only; a query filtering on a second dimension still touches every
  * file. Interleaving the bits of several normalized keys into one
  * Morton code and range-partitioning + sorting by it gives every
  * file a small bounding box in ALL clustered dimensions, so parquet
  * footer min/max stats prune files for predicates on ANY of them —
  * the same trick Delta's OPTIMIZE ZORDER BY and Databricks liquid
  * clustering apply at petabyte scale.
  *
  * Scale shape: one tiny min/max aggregate per clustering column (a
  * single partial-aggregated scan, broadcast back as literals), then
  * the z-value is a per-row codegen-friendly expression;
  * `repartitionByRange` samples the z-values for balanced output
  * files and `sortWithinPartitions` makes each file a contiguous
  * curve segment. Nothing here is driver-bound or quadratic.
  *
  * Normalization is min/max linear scaling to a 16-bit grid —
  * deterministic, two-pass-free, and adequate for the bounding-box
  * guarantee (rank-based grids handle pathological skew better but
  * need a global sort or sampled quantiles; the caller can pre-warp a
  * heavy-tailed column if needed).
  */
object ZOrder {

  private val Bits = 16 // bits/dim at 2-3 dims; 15 at 4 (see below)

  /** The Morton code of `cols` (2-4 columns), each min/max-scaled to
    * [0, 2^bits). Bit i of dim d lands at position i*dims + d — dims
    * interleaved coarsest-bit-first so the curve is the standard
    * Z-curve. At 4 dims only 15 bits/dim are used: 4x16 would put the
    * top interleaved bit at position 63 — the BIGINT sign bit — making
    * half the curve negative and splitting it under the signed
    * range-sort (the boundary file would get a full-width bounding
    * box).
    */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2 && cols.size <= 4, "z-order needs 2-4 columns")
    val dims = cols.size
    val bits = if (dims == 4) 15 else Bits
    // one partial-aggregated pass for the per-column bounds
    val aggCols = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).cast("double").as(s"mn$i"),
        max(col(c)).cast("double").as(s"mx$i"))
    }
    val bounds = df.agg(aggCols.head, aggCols.tail.toIndexedSeq: _*).head()
    // empty input or an all-null column yields null bounds: degrade to
    // a degenerate [0,0] range instead of an NPE — every row (if any)
    // lands in grid cell 0 for that dim.
    def bound(i: Int): Double =
      if (bounds.isNullAt(i)) 0.0 else bounds.getDouble(i)
    val grid = (1 << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, d) =>
      val mn = bound(2 * d)
      val mx = bound(2 * d + 1)
      val range = if (mx > mn) mx - mn else 1.0
      // null cells cluster at grid 0 (coalesce to mn) — a deterministic
      // placement; least() would otherwise skip the null and send them
      // to the far end of the curve.
      least(lit(grid),
        floor((coalesce(col(c).cast("double"), lit(mn)) - lit(mn))
          / lit(range) * lit(grid + 1)))
        .cast("long")
    }
    // interleave: OR together each dim's bit i shifted to i*dims + d
    (0 until bits).flatMap { i =>
      scaled.zipWithIndex.map { case (s, d) =>
        shiftleft(shiftright(s, i).bitwiseAND(lit(1L)), i * dims + d)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` clustered on the Morton code of `cols` into
    * `targetFiles` parquet files at `path`: range-partition by
    * z-value (sampled boundaries → balanced files), sort within each
    * partition (each file = one contiguous curve segment), drop the
    * helper column on write.
    */
  def writeClustered(df: DataFrame, cols: Seq[String], path: String,
      targetFiles: Int): Unit =
    df.withColumn("_z", zvalue(df, cols))
      .repartitionByRange(targetFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
