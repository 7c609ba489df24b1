package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SortedIntersectCount: the merge-walk kernel must agree with
  * size(array_intersect) on every sorted-distinct input, including the
  * degenerate shapes (empty, disjoint, identical, subset, null array).
  */
class ArrayOpsSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("matches size(array_intersect) on randomized sorted-distinct long arrays") {
    ArrayOps.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      expr("sorted_intersect_count(a, b)").as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    cmp.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // the overlap bound [0..60) makes most rows intersect; make sure the
    // fixture wasn't degenerate in either direction
    assert(cmp.exists(_.getInt(0) > 0) && cmp.exists(_.getInt(0) == 0))
  }

  test("edge shapes: empty, identical, subset, null") {
    ArrayOps.register(spark)
    val df = Seq(
      (1L, Some(Seq.empty[Long]), Some(Seq(1L, 2L))),
      (2L, Some(Seq(1L, 2L, 3L)), Some(Seq(1L, 2L, 3L))),
      (3L, Some(Seq(2L)), Some(Seq(1L, 2L, 3L))),
      (4L, None, Some(Seq(1L)))).toDF("id", "a", "b")
    val out = df.select(col("id"), expr("sorted_intersect_count(a, b)").as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getInt(1))).toMap
    assert(out(1L) == 0 && out(2L) == 3 && out(3L) == 1 && out(4L) == null)
  }

  test("vec_dot_i8 matches the double dot on int8-representable inputs") {
    VectorOps.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(16)((rnd.nextInt(255) - 127).toByte))
    }
    val df = rows.toDF("id", "q")
    val cmp = df.as("a").crossJoin(df.as("b"))
      .select(
        expr("vec_dot_i8(a.q, b.q)").as("i8"),
        expr("vec_dot(CAST(a.q AS ARRAY<DOUBLE>), CAST(b.q AS ARRAY<DOUBLE>))").as("d"))
      .collect()
    cmp.foreach(r => assert(r.getLong(0).toDouble == r.getDouble(1)))
  }

  test("vec_dot_i8 null contract: ragged and null array propagate null") {
    VectorOps.register(spark)
    val df = Seq(
      (1L, Some(Seq[Byte](1, 2)), Some(Seq[Byte](3, 4))),
      (2L, Some(Seq[Byte](1, 2, 3)), Some(Seq[Byte](3, 4))),
      (3L, None, Some(Seq[Byte](3, 4)))).toDF("id", "a", "b")
    val out = df.select(col("id"), expr("vec_dot_i8(a, b)").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(out(1L) == 11L && out(2L) == null && out(3L) == null)
  }

  test("simhash_sig matches the nested-aggregate HOF form (incl. negatives)") {
    SimHashSig.register(spark)
    val rnd = new scala.util.Random(11)
    // signed longs — xd2's htoks are raw xxhash64 values, so the kernel
    // must read bit j of NEGATIVE hashes exactly like shiftright+%2
    val rows = (1 to 300).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(30))(rnd.nextLong()))
    }
    val df = rows.toDF("id", "hs")
    for (bits <- Seq(60, 64)) {
      val cmp = df.select(
        expr(s"simhash_sig(hs, $bits)").as("fast"),
        expr(
          s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT),
             |  (acc, j) -> acc + shiftleft(CAST(
             |    aggregate(hs, 0,
             |      (s, h) -> s + CASE WHEN (shiftright(h, j) % 2) != 0
             |                         THEN 1 ELSE -1 END) > 0 AS BIGINT), j))""".stripMargin)
          .as("ref")).collect()
      cmp.foreach(r => assert(r.getLong(0) == r.getLong(1), s"bits=$bits"))
      assert(cmp.map(_.getLong(0)).distinct.length > 100)
    }
    // null array propagates; tie votes (even count, split bits) give 0
    val edge = Seq((1L, Some(Seq(1L, 2L))), (2L, None)).toDF("id", "hs")
      .select(col("id"), expr("simhash_sig(hs, 2)").as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    // hashes 1 (01) and 2 (10): each bit splits 1-vs-1 -> tie -> 0
    assert(edge(1L) == 0L && edge(2L) == null)
  }

  test("simhash_md5_sig matches the composed md5_60-then-simhash_sig form") {
    Md5Hash60.register(spark)
    SimHashSig.register(spark)
    SimHashMd5Sig.register(spark)
    val rnd = new scala.util.Random(23)
    val words = Vector("alpha", "beta", "gamma", "delta", "x", "", "émü",
      "the", "quick", "brown", "fox", "zz9")
    val rows = (1 to 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(25))(words(rnd.nextInt(words.size))))
    }
    val df = rows.toDF("id", "toks")
    val cmp = df.select(
      expr("simhash_md5_sig(toks, 60)").as("fast"),
      expr("simhash_sig(transform(toks, t -> md5_60(cast(t as binary))), 60)")
        .as("ref")).collect()
    cmp.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(cmp.map(_.getLong(0)).distinct.length > 50)
    // empty array votes nothing -> all ties -> 0; null propagates
    val edge = Seq((1L, Some(Seq.empty[String])), (2L, None))
      .toDF("id", "toks")
      .select(col("id"), expr("simhash_md5_sig(toks, 60)").as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(edge(1L) == 0L && edge(2L) == null)
  }

  test("stays inside whole-stage codegen") {
    ArrayOps.register(spark)
    // non-literal input: a literal row would be constant-folded into a
    // LocalTableScan before any codegen happens
    val df = spark.range(10)
      .select(expr("sequence(id, id + 3)").as("a"), expr("sequence(id + 2, id + 5)").as("b"))
      .select(expr("sorted_intersect_count(a, b)").as("c"))
    // the simple plan string marks WholeStageCodegen spans with "*(n)"
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [sortedintersectcount"),
      s"expression not inside a codegen span in:\n$plan")
  }
}
