package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral invariants of the curation operators (xc1-xc4) on the
  * sf0.001 fixture, independent of the DuckDB oracle: the oracle proves
  * cross-engine agreement, these prove the SEMANTICS are the declared
  * ones (caps hold, sampling is deterministic and correctly stratified,
  * decontamination never flags eval docs, redaction leaves no digits).
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("xc1 sample is deterministic, capped, and matches a scala replay") {
    val out = Curation.xc1.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val out2 = Curation.xc1.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.sameElements(out2), "re-run must select identical rows")

    // per-stratum cap holds, ranks are 1..n without gaps
    val byLang = out.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      assert(rows.length <= 20, s"$lang over cap")
      assert(rows.map(_._4).sorted.sameElements(1L to rows.length),
        s"$lang ranks not dense")
    }

    // replay the whole query in plain scala from the raw fixture
    val docs = Ctx(spark, sf).documents.select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val sampled = docs
      .map { case (id, lang) =>
        (id, lang, java.lang.Math.floorMod(id * 2654435761L, 4294967296L)) }
      .filter(_._3 % 100 < 30)
    val expected = sampled.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._1)).take(20).zipWithIndex
        .map { case ((id, lang, h), i) => (id, lang, h, (i + 1).toLong) }
    }.toSet
    assert(out.toSet == expected)
  }

  test("xc2 fractions match a scala replay per document") {
    val got = Curation.xc2.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val texts = Ctx(spark, sf).documents.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    texts.foreach { case (id, text) =>
      val toks = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      if (toks.length >= 2) {
        val bg = toks.sliding(2).map(_.mkString(" ")).toSeq
        val counts = bg.groupBy(identity).view.mapValues(_.size)
        val expect = (bg.size.toLong, counts.size.toLong, counts.values.max.toLong)
        assert(got(id) == expect, s"doc $id")
      } else assert(!got.contains(id), s"doc $id should be filtered")
    }
  }

  test("xc3 never flags eval docs and overlap counts are exact") {
    val res = Curation.xc3.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(res.nonEmpty, "fixture corpus should contain contaminated docs")
    assert(res.forall(_._1 % 41 != 0), "eval docs must never appear")
    assert(res.forall(_._2 >= 1))

    // exact overlap replay
    val texts = Ctx(spark, sf).documents.select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def sh(t: String): Set[String] = {
      val toks = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val evalSh = texts.filter(_._1 % 41 == 0).flatMap(t => sh(t._2)).toSet
    val expected = texts.filter(_._1 % 41 != 0)
      .map { case (id, t) => (id, sh(t).count(evalSh.contains).toLong) }
      .filter(_._2 > 0).toSet
    assert(res.toSet == expected)
  }

  test("xc4 redaction accounting is exact and leaves no digits") {
    val events = Ctx(spark, sf).events.select("event_type", "props")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = events.groupBy(_._1).map { case (et, rows) =>
      val runs = rows.map(r => "[0-9]+".r.findAllIn(r._2).size.toLong).sum
      val red = rows.map(r => r._2.replaceAll("[0-9]+", "#"))
      assert(red.forall(!_.exists(_.isDigit)))
      (et, rows.length.toLong, runs,
        red.map(_.length.toLong).sum, rows.map(_._2.length.toLong).sum)
    }.toSet
    val got = Curation.xc4.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expected)
  }

  test("xc11 two-level prefix sum equals the naive global window; spans chain") {
    import org.apache.spark.sql.expressions.Window
    val out = Curation.xc11.fn(spark, sf)
      .select("doc_id", "n_tokens", "start_tok", "start_seq", "end_seq",
        "n_splits")
      .collect().sortBy(_.getLong(0))
    // naive single-window reference on the same tokenizer
    val naive = Ctx(spark, sf).documents
      .select(col("doc_id"),
        size(Llm.tokens(spark, col("text"))).cast("long").as("t"))
      .withColumn("pre", coalesce(sum(col("t")).over(
        Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(out.length == naive.length)
    out.zip(naive).foreach { case (g, (id, t, pre)) =>
      assert(g.getLong(0) == id && g.getLong(1) == t &&
        g.getLong(2) == pre, s"offset mismatch at doc $id")
      // span arithmetic: start/end sequence indices and split count
      val (start, end) = (pre / 256L,
        if (t == 0L) pre / 256L else (pre + t - 1) / 256L)
      assert(g.getLong(3) == start && g.getLong(4) == end &&
        g.getLong(5) == end - start)
    }
    // conservation: consecutive spans chain with no gap or overlap
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(2) + a.getLong(1) == b.getLong(2),
          s"packed stream gap between docs ${a.getLong(0)}/${b.getLong(0)}")
      case _ =>
    }
  }

  test("xc12 census inverts xc11's spans; membership ranges are contiguous") {
    val spans = Curation.xc11.fn(spark, sf)
      .select("doc_id", "start_seq", "end_seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val census = Curation.xc12.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // every sequence from 0 to the max end_seq appears exactly once
    val maxSeq = spans.map(_._3).max
    assert(census.map(_._1).sorted.sameElements(0L to maxSeq),
      "census must cover every packed sequence exactly once")
    census.foreach { case (seq, nDocs, first, last, pure) =>
      // membership from the spans directly (docs whose span covers seq)
      val members = spans.filter(s => s._2 <= seq && seq <= s._3).map(_._1)
      assert(members.length.toLong == nDocs && members.min == first &&
        members.max == last, s"census mismatch at seq $seq")
      // contiguity: (first, last, n_docs) is the full membership list
      assert(last - first + 1 == nDocs,
        s"non-contiguous doc range in sequence $seq")
      assert(pure == (nDocs == 1L))
    }
  }
}
