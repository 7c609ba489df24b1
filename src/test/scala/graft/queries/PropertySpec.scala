package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.2.4): dedup idempotence,
  * set-operation algebra, window-frame sums vs brute force. ScalaCheck
  * generators sampled at fixed seeds (scalatestplus bridge is not in
  * the offline dependency cache).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = Gen.listOfN(60,
    Gen.zip(Gen.choose(0L, 20L), Gen.choose(0, 5), Gen.choose(-100.0, 100.0)))

  /** Deterministic forAll: sample the generator at seeds 0..n-1. */
  private def forAll[A](g: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator exhausted at seed $i")))
    }

  private def forAll2[A](g: Gen[A], n: Int)(body: (A, A) => Unit): Unit =
    (0 until n).foreach { i =>
      val a = g.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val b = g.apply(Gen.Parameters.default, Seed(1000L + i)).get
      body(a, b)
    }

  private def dedup(df: DataFrame): DataFrame = {
    val w = Window.partitionBy($"k").orderBy($"a".asc, $"v".asc)
    df.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
  }

  test("ranked-window dedup is idempotent: f(f(x)) == f(x)") {
    forAll(rows) { data =>
      val df = data.toDF("k", "a", "v")
      val once = dedup(df).collect().toSet
      val twice = dedup(dedup(df)).collect().toSet
      assert(once == twice)
    }
  }

  test("set algebra: (A except B) union (A intersect B) == distinct A") {
    forAll2(rows, 5) { (da, db) =>
      val a = da.toDF("k", "a", "v").select($"k")
      val b = db.toDF("k", "a", "v").select($"k")
      val lhs = a.except(b).union(a.intersect(b)).collect().map(_.getLong(0)).toSet
      val rhs = a.distinct().collect().map(_.getLong(0)).toSet
      assert(lhs == rhs)
    }
  }

  test("running-frame sum equals brute-force prefix sum") {
    forAll(rows) { data =>
      val df = data.zipWithIndex
        .map { case ((k, a, v), i) => (k, i.toLong, v) }.toDF("k", "seq", "v")
      val w = Window.partitionBy($"k").orderBy($"seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = df.withColumn("cum", sum($"v").over(w))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
      val expect = data.zipWithIndex
        .map { case ((k, a, v), i) => (k, i.toLong, v) }
        .groupBy(_._1).flatMap { case (k, rs) =>
          val sorted = rs.sortBy(_._2)
          sorted.inits.toList.reverse.drop(1).map { prefix =>
            (k, prefix.last._2) -> prefix.map(_._3).sum
          }
        }
      for ((key, v) <- expect)
        assert(math.abs(got(key) - v) < 1e-9, s"at $key")
    }
  }

  test("binned range join equals the naive theta join on random event times") {
    // q11b's binning must be a pure plan transformation: same result as
    // comparing every pair, for any time distribution (including bursts
    // inside one bin and spans across bin boundaries)
    val W = 1000L
    val times = Gen.listOfN(80, Gen.choose(0L, 5000L))
    forAll(times) { ts =>
      val e = ts.zipWithIndex.map { case (m, id) => (id.toLong, m) }.toDF("event_id", "m")
      val probe = e.select($"event_id", $"m",
        explode(array(expr(s"m DIV $W"), expr(s"m DIV $W") + 1)).as("bin"))
      val build = e.select($"event_id".as("eid2"), $"m".as("m2"),
        expr(s"m DIV $W").as("bin"))
      val binned = probe.join(build, "bin")
        .filter($"m2" >= $"m" && $"m2" < $"m" + W && $"eid2" =!= $"event_id")
        .groupBy("event_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val naive = (for {
        (ma, ida) <- ts.zipWithIndex
        (mb, idb) <- ts.zipWithIndex
        if idb != ida && mb >= ma && mb < ma + W
      } yield ida).groupBy(identity).map { case (k, v) => (k.toLong, v.size.toLong) }
      assert(binned == naive)
    }
  }

  test("sequence packing invariants: offsets within budget, ids contiguous") {
    val sf = "/root/testdata/sf0.001"
    val budget = 2048L
    val rows = Curation.xc5.fn(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((lang, grp) <- rows.groupBy(_._1)) {
      // every doc's start offset lies inside its sequence's budget
      assert(grp.forall { case (_, _, _, off) => off >= 0 && off < budget })
      // seq ids start at 0, never exceed the shard's token total, and
      // are contiguous whenever no single doc spans a whole budget
      // (only an over-budget doc can leave a sequence with no starts)
      val ids = grp.map(_._3).distinct.sorted
      val total = grp.map(_._2).sum
      val expectMax = math.max(0L, (total - 1) / budget)
      assert(ids.head == 0L && ids.last <= expectMax,
        s"$lang: ids ${ids.head}..${ids.last}, cap $expectMax")
      if (grp.forall(_._2 < budget))
        assert(ids.toSeq == (0L until ids.length.toLong),
          s"$lang: non-contiguous ${ids.mkString(",")}")
    }
  }

  test("union-all count is additive; union-distinct bounded by sum") {
    forAll2(rows, 5) { (da, db) =>
      val a = da.toDF("k", "a", "v")
      val b = db.toDF("k", "a", "v")
      assert(a.unionAll(b).count() == a.count() + b.count())
      assert(a.select($"k").union(b.select($"k")).distinct().count() <=
        a.select($"k").distinct().count() + b.select($"k").distinct().count())
    }
  }

  test("Misra-Gries bounds hold for random streams, chunkings, and caps") {
    val streams = Gen.zip(
      Gen.choose(4, 24), // cap
      Gen.listOfN(400, Gen.frequency(
        (6, Gen.const("hot")), (2, Gen.const("warm")),
        (4, Gen.choose(0, 50).map(i => s"t$i")))))
    forAll(streams, 8) { case (cap, stream) =>
      val sk = new graft.functions.FreqSketch(cap)
      // random chunking exercises merge paths, not just reduce
      val chunks = stream.grouped(math.max(1, stream.size / 7)).toSeq
      val merged = chunks
        .map(c => c.foldLeft(sk.zero)(sk.reduce))
        .reduce(sk.merge)
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = stream.size.toLong
      val summary = sk.finish(merged).map(tc => tc.term -> tc.est).toMap
      assert(summary.size <= cap)
      summary.foreach { case (t, est) =>
        assert(est <= truth(t), s"cap=$cap $t overestimated: $est > ${truth(t)}")
        assert(est >= truth(t) - n / cap,
          s"cap=$cap $t est $est below ${truth(t)} - ${n / cap}")
      }
      // every true heavy hitter (freq > N/cap) survives
      truth.filter(_._2 > n / cap).keys.foreach { t =>
        assert(summary.contains(t), s"cap=$cap heavy '$t' evicted")
      }
    }
  }

  test("z-values match an independent Scala reimplementation of the curve") {
    val pts = Gen.listOfN(80,
      Gen.zip(Gen.choose(0L, 1000L), Gen.choose(0L, 1000L)))
    forAll(pts, 3) { data =>
      val df = data.toDF("x", "y")
      val got = df
        .withColumn("z", graft.operators.ZOrder.zvalue(df, Seq("x", "y")))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val xs = data.map(_._1); val ys = data.map(_._2)
      def scale(v: Long, mn: Long, mx: Long): Long = {
        val range = if (mx > mn) (mx - mn).toDouble else 1.0
        math.min(65535L, math.floor((v - mn) / range * 65536.0).toLong)
      }
      def interleave(a: Long, b: Long): Long =
        (0 until 16).foldLeft(0L) { (acc, i) =>
          acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
        }
      data.foreach { case (x, y) =>
        val exp = interleave(scale(x, xs.min, xs.max), scale(y, ys.min, ys.max))
        assert(got((x, y)) == exp, s"($x,$y): got ${got((x, y))}, expected $exp")
      }
    }
  }
}
