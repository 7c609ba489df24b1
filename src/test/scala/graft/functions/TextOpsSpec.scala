package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The fused Tokenize kernel must equal the declarative
  * filter(split(lower(text), "[^a-z]+"), t -> t <> '') form on ASCII
  * input — including punctuation runs, leading/trailing separators,
  * all-separator strings, empty strings, and mixed case.
  */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def hof(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "[^a-z]+"), t => t =!= "")

  private def both(strings: Seq[String]): Seq[(Seq[String], Seq[String])] = {
    TextOps.register(spark)
    strings.toDF("s")
      .select(call_function("tokenize", col("s")).as("fast"), hof(col("s")).as("ref"))
      .collect()
      .map(r => (r.getSeq[String](0), r.getSeq[String](1)))
      .toIndexedSeq
  }

  test("edge cases match the HOF reference") {
    val cases = Seq(
      "", " ", "...", "abc", "ABC", "a b c", "  leading", "trailing  ",
      "Mixed CASE Words", "punct,sep;and--dashes", "digits123between456words",
      "a", "Z", "a1b2c3", "\ttabs\nand\nnewlines\t", "ALLCAPS",
      "repeated   spaces", "x" * 300)
    both(cases).foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("random ASCII strings match the HOF reference") {
    val g = Gen.listOfN(200, Gen.listOfN(40,
      Gen.frequency(
        (8, Gen.alphaChar), (2, Gen.oneOf(' ', '.', ',', '1', '-', '\t'))))
      .map(_.mkString))
    val strings = g.apply(Gen.Parameters.default, Seed(7L)).get
    both(strings).foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("null propagates") {
    TextOps.register(spark)
    val r = Seq[Option[String]](None, Some("a b")).toDF("s")
      .select(call_function("tokenize", col("s"))).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getSeq[String](0) == Seq("a", "b"))
  }

  test("term_counts equals tokenize-then-count") {
    TextOps.register(spark)
    val g = Gen.listOfN(200, Gen.listOfN(60,
      Gen.frequency(
        (6, Gen.oneOf('a', 'b', 'c', 'A', 'B')),
        (2, Gen.oneOf(' ', '.', ',', '1', '-')),
        (1, Gen.alphaChar))).map(_.mkString))
    val strings = g.apply(Gen.Parameters.default, Seed(13L)).get ++
      Seq("", "   ", "a a a", "A a aa", "x" * 300, "the the THE cat")
    val rows = strings.toDF("s")
      .select(call_function("term_counts", col("s")).as("m"),
        call_function("tokenize", col("s")).as("toks"))
      .collect()
    rows.foreach { r =>
      val m = r.getMap[String, Int](0).toMap
      val toks = r.getSeq[String](1)
      val ref = toks.groupBy(identity).map { case (t, g) => t -> g.size }
      assert(m == ref, s"input row: $toks")
    }
  }

  test("bigram_counts equals the declarative substring-window form") {
    TextOps.register(spark)
    val g = Gen.listOfN(200, Gen.listOfN(50,
      Gen.frequency(
        (6, Gen.oneOf('a', 'b', 'c', 'x')),
        (3, Gen.const(' ')),
        (1, Gen.oneOf('.', '1', '-')))).map(_.mkString))
    val strings = g.apply(Gen.Parameters.default, Seed(17L)).get ++
      Seq("", " ", "a", "ab", "a b", "  ", "abc", "ab cd ef", "x" * 200)
    val rows = strings.toDF("s")
      .select(call_function("bigram_counts", col("s")).as("m"),
        expr("""filter(transform(sequence(1, greatest(length(s) - 1, 1)),
               |  i -> substring(s, i, 2)),
               |  g -> length(g) = 2 AND NOT contains(g, ' '))""".stripMargin)
          .as("ref"))
      .collect()
    rows.foreach { r =>
      val m = r.getMap[String, Int](0).toMap
      val ref = r.getSeq[String](1)
        .groupBy(identity).map { case (t, gs) => t -> gs.size }
      assert(m == ref, s"ref grams: ${r.getSeq[String](1)}")
    }
  }

  test("term_counts null propagates") {
    TextOps.register(spark)
    val r = Seq[Option[String]](None, Some("a b a")).toDF("s")
      .select(call_function("term_counts", col("s"))).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getMap[String, Int](0) == Map("a" -> 2, "b" -> 1))
  }

  test("shingle_hash equals the declarative xxhash64-over-concat form") {
    TextOps.register(spark)
    val g = Gen.listOfN(120, Gen.choose(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("key", "agg", "row", "scan", "slow",
        "fast", "table", "value", "part", "hash"))))
    val arrays = g.apply(Gen.Parameters.default, Seed(11L)).get ++
      Seq(Nil, List("one"), List("one", "two"), List("a", "a", "a", "a"))
    val rows = arrays.map(a => Tuple1(a)).toDF("toks")
      .select(
        call_function("shingle_hash", col("toks"), lit(3)).as("fast"),
        expr("CASE WHEN size(toks) < 3 THEN array() " +
          "ELSE array_distinct(transform(sequence(1, size(toks) - 2), " +
          "i -> xxhash64(concat_ws(' ', slice(toks, i, 3))))) END").as("ref"),
        size(col("toks")).as("m"))
      .collect()
    rows.foreach { r =>
      val fast = r.getSeq[Long](0)
      val ref = if (r.getInt(2) < 3) Seq.empty[Long] else r.getSeq[Long](1)
      assert(fast == ref, s"m=${r.getInt(2)}")
    }
  }
}
