package graft

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Graft.init must expose every custom kernel as a SQL function in
  * one call — the library front door for SQL-first users.
  */
class GraftInitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("init registers every kernel, callable from SQL text") {
    Graft.init(spark)
    val r = spark.sql(
      """SELECT
        |  tokenize('The quick Fox!') AS toks,
        |  term_counts('a b a') AS tc,
        |  bigram_counts('abc ab') AS bc,
        |  shingle_hash(array('a','b','c','d'), 3) AS sh,
        |  vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS vd,
        |  sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS ic,
        |  md5_60(CAST('x' AS BINARY)) AS h
        |""".stripMargin).head
    assert(r.getSeq[String](0) == Seq("the", "quick", "fox"))
    assert(r.getMap[String, Int](1).toMap == Map("a" -> 2, "b" -> 1))
    assert(r.getMap[String, Int](2).toMap == Map("ab" -> 2, "bc" -> 1))
    assert(r.getSeq[Long](3).size == 2)
    assert(r.getDouble(4) == 11.0)
    assert(r.getInt(5) == 2)
    assert(r.getLong(6) > 0L)
    // idempotent: a second init must not throw or change resolution
    Graft.init(spark)
    assert(spark.sql("SELECT size(tokenize('a b')) s").head.getInt(0) == 2)
  }
}
