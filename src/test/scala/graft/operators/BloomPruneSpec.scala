package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom pruning must (a) never change the downstream exact join's
  * result — false positives are allowed, false negatives are not —
  * and (b) actually shrink the fact side for a selective dim, which
  * is the whole point of spending a broadcast on it.
  */
class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("pruned exact join equals the unpruned join; prune is selective") {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val urgent = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000.0)
      .select("o_orderkey")

    val pruned = BloomPrune.prune(
      lineitem, urgent, "l_orderkey", "o_orderkey",
      expectedKeys = urgent.count())

    // no false negatives: every actually-matching row survives
    val joinedPruned = pruned
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber")
    val joinedPlain = lineitem
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber")
    assert(joinedPruned.exceptAll(joinedPlain).isEmpty &&
      joinedPlain.exceptAll(joinedPruned).isEmpty)

    // selectivity: the filter drops the bulk of the fact side
    val total = lineitem.count().toDouble
    val kept = pruned.count().toDouble
    assert(kept < total * 0.5,
      s"bloom kept $kept of $total rows — dim not selective or filter inert")
  }

  test("string keys and null keys behave (null never matches)") {
    import spark.implicits._
    val dim = Seq("a", "b").toDF("k")
    val fact = Seq(Some("a"), Some("zzz"), None).toDF("k")
    val pruned = BloomPrune.prune(fact, dim, "k", "k", expectedKeys = 2)
    val got = pruned.collect().map(_.getString(0)).toSet
    assert(got.contains("a"))
    assert(!got.contains(null.asInstanceOf[String]), "null key must be dropped")
  }

  test("pruneManaged release drops executor copies without poisoning the plan") {
    import spark.implicits._
    val dim = Seq(1L, 2L).toDF("k")
    val fact = Seq(1L, 2L, 999L).toDF("k")
    val h = BloomPrune.pruneManaged(fact, dim, "k", "k", expectedKeys = 2)
    val kept = h.df.count()
    assert(kept >= 2 && kept <= 3) // exact matches + possible fp
    h.release()
    // release() unpersists (executor copies dropped) but must NOT
    // destroy: an async consumer that re-touches the plan after
    // release — concretely the QueryExecutionListener bus
    // re-evaluating observed metrics — would otherwise hit
    // "Attempted to use Broadcast(n) after it was destroyed" and
    // poison every registered listener. A re-touched plan lazily
    // re-broadcasts instead and computes the same result.
    assert(h.df.count() === kept)
  }

  test("release never surfaces a use-after-free to query listeners") {
    import spark.implicits._
    // the round-7 failure mode: a listener's async callback walks the
    // executed plan AFTER release() — with destroy() this raised
    // [FAILED_EXECUTE_UDF] inside the listener bus. Register a
    // listener that re-executes the pruned predicate on success and
    // assert it observes no error across release.
    @volatile var listenerError: Option[Throwable] = None
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = ()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = { listenerError = Some(exception) }
    }
    spark.listenerManager.register(listener)
    try {
      val dim = Seq(7L).toDF("k")
      val fact = Seq(7L, 8L).toDF("k")
      val h = BloomPrune.pruneManaged(fact, dim, "k", "k", expectedKeys = 1)
      h.df.collect()
      h.release()
      // a post-release re-execution (what the async bus effectively
      // does) must succeed and report no listener failure
      h.df.collect()
      // the bus delivers asynchronously (no public drain hook);
      // give it a beat before asserting nothing failed
      Thread.sleep(1000)
      assert(listenerError.isEmpty, s"listener saw: $listenerError")
    } finally spark.listenerManager.unregister(listener)
  }
}
