package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The recursive distributed prefix sum behind xc11/xc12's packed
  * offsets (Curation.exclusivePrefix): equality with the naive global
  * window, multi-level recursion with a small B, gapped keys, and the
  * window-discipline guarantee (every empty-PARTITION-BY window in the
  * plan tree runs over a recursion level already <= B rows).
  */
class ExclusivePrefixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def naive(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (k, v) =>
      val r = k -> acc; acc += v; r
    }.toMap
  }

  private def viaSpark(rows: Seq[(Long, Long)], b: Long): Map[Long, Long] = {
    import spark.implicits._
    Det.reap {
      val df = Det.own(rows.toDF("k", "v").repartition(7).persist())
      Curation.exclusivePrefix(df, "k", "v", "pre", B = b)
    }.collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("pre")).toMap
  }

  test("matches the naive global-window prefix at every recursion depth") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 300L).map(k => k -> rnd.nextInt(100).toLong)
    val expected = naive(rows)
    // B=1024: base case immediately (0 levels of blocking)
    assert(viaSpark(rows, 1024L) == expected)
    // B=64: one blocking level (300 -> 5 block totals)
    assert(viaSpark(rows, 64L) == expected)
    // B=4: FOUR blocking levels (300 -> 75 -> 19 -> 5 -> base)
    assert(viaSpark(rows, 4L) == expected)
  }

  test("keys need not be dense — DIV blocking only needs their order") {
    val rnd = new scala.util.Random(11)
    // sparse, clumpy ids (the post-dedup doc_id shape)
    val keys = (1 to 200).map(_ => rnd.nextLong(1000000L)).distinct
    val rows = keys.map(k => k -> rnd.nextInt(50).toLong)
    assert(viaSpark(rows, 8L) == naive(rows))
  }

  test("zero-value and single-row inputs") {
    assert(viaSpark(Seq(5L -> 0L), 4L) == Map(5L -> 0L))
    val rows = Seq(1L -> 0L, 2L -> 3L, 9L -> 0L, 10L -> 7L)
    assert(viaSpark(rows, 2L) == naive(rows))
  }

  test("every global window in the recursion runs over <= B rows") {
    import spark.implicits._
    // inspect the UNREAPED plan: with 300 keys and B=4 the recursion
    // has four partitioned-window levels and exactly ONE empty-
    // PARTITION-BY window — the <= 4-row base case
    Det.reap {
      val df = Det.own(
        (0L until 300L).map(k => k -> 1L).toDF("k", "v").persist())
      val out = Curation.exclusivePrefix(df, "k", "v", "pre", B = 4L)
      val globals = out.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(globals.size == 1,
        s"expected exactly one base-case global window, got ${globals.size}")
      // and the base case input is a recursion level, not the data:
      // 300 keys / 4 / 4 / 4 = 4.7 -> <= 4 rows after the next level
      val partitioned = out.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.nonEmpty => w
      }
      assert(partitioned.size >= 3, "blocking levels lost their windows")
      out
    }
  }
}
