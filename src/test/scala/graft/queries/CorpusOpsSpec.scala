package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral invariants of the corpus-statistics operators (xd11,
  * xt9, xe3) on the sf0.001 fixture, independent of the DuckDB oracle:
  * the oracle proves cross-engine agreement, these prove the SEMANTICS
  * are the declared ones — span coverage is a true interval union,
  * vocabulary stats match a from-scratch replay, and the transition
  * matrix is a proper per-source probability distribution.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq

  test("xd11 dup-span coverage matches a scala interval-union replay") {
    val K = 8
    val got = Dedup.xd11.fn(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

    val docs = Ctx(spark, sf).documents.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> tokens(r.getString(1)))
    val grams = docs.flatMap { case (id, toks) =>
      toks.sliding(K).filter(_.size == K).zipWithIndex
        .map { case (g, i) => (id, i, g.mkString(" ")) }
    }
    val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size > 1).keySet
    val flaggedBy = grams.filter(g => dup(g._3)).groupBy(_._1)

    docs.foreach { case (id, toks) =>
      val (nTok, nGrams, covered, frac) = got(id)
      assert(nTok == toks.size.toLong)
      val starts = flaggedBy.getOrElse(id, Array.empty).map(_._2).sorted
      assert(nGrams == starts.length.toLong, s"doc $id flagged-gram count")
      // union length of the fixed-length intervals [i, i+K-1]
      val expected = starts.zipAll(starts.drop(1).map(Some(_)), 0, None)
        .map { case (a, nxt) => nxt.map(n => math.min(n - a, K)).getOrElse(K) }
        .sum.toLong
      assert(covered == expected, s"doc $id coverage")
      assert(covered <= nTok, s"doc $id coverage exceeds tokens")
      assert(math.abs(frac - covered.toDouble / nTok) < 1e-6)
    }
    // the fixture contains genuine cross-document duplication
    assert(got.values.exists(_._3 > 0), "fixture has no dup spans to test")
  }

  test("xt9 vocabulary stats match a from-scratch replay") {
    val out = TextAnalysis.xt9.fn(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap

    val docs = Ctx(spark, sf).documents.select("lang", "text")
      .collect().map(r => r.getString(0) -> tokens(r.getString(1)))
    docs.groupBy(_._1).foreach { case (lang, rows) =>
      val counts = rows.flatMap(_._2).groupBy(identity).map(_._2.size)
      val nTokens = counts.sum.toLong
      val nVocab = counts.size.toLong
      val nHapax = counts.count(_ == 1).toLong
      val top = counts.max.toLong
      val (gTok, gVoc, gHap, gHapF, gTopS) = out(lang)
      assert(gTok == nTokens && gVoc == nVocab && gHap == nHapax, lang)
      assert(math.abs(gHapF - nHapax.toDouble / nVocab) < 1e-6, lang)
      assert(math.abs(gTopS - top.toDouble / nTokens) < 1e-6, lang)
    }
    assert(out.keySet == docs.map(_._1).toSet)
  }

  test("xe3 transition matrix is a per-source distribution and conserves steps") {
    val out = EventOps.xe3.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))

    // each source row's probabilities sum to ~1 (rounding at 6 digits)
    out.groupBy(_._1).foreach { case (src, rows) =>
      val p = rows.map(_._4).sum
      assert(math.abs(p - 1.0) < 1e-4, s"src $src sums to $p")
      rows.foreach { case (_, _, n, prob) =>
        val total = rows.map(_._3).sum
        assert(math.abs(prob - n.toDouble / total) < 1e-6)
      }
    }

    // total steps = events - distinct users (each user chain has
    // length events(u) - 1)
    val ev = Ctx(spark, sf).events.select("user_id")
      .collect().map(_.getLong(0))
    val expectedSteps = ev.length - ev.distinct.length
    assert(out.map(_._3).sum == expectedSteps.toLong)
  }

  test("xd12 decontamination matches a scala shingle-overlap replay") {
    val got = Dedup.xd12.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap

    val docs = Ctx(spark, sf).documents.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> tokens(r.getString(1)))
      .filter(_._2.size >= 5)
    val shingles = docs.map { case (id, toks) =>
      id -> toks.sliding(5).filter(_.size == 5).map(_.mkString(" ")).toSet
    }.toMap
    val bench = shingles.filter(_._1 % 20 == 0)
    val corpus = shingles.filter(_._1 % 20 != 0)
    val expected = (for {
      (cid, cs) <- corpus; (bid, bs) <- bench
      inter = (cs & bs).size if inter >= 3
    } yield (cid, bid) -> ((inter.toLong,
      math.round(inter.toDouble / cs.size * 1e4) / 1e4))).toMap

    assert(got == expected, s"got $got, expected $expected")
    // sides are disjoint: no benchmark doc is ever reported as training
    assert(got.keys.forall { case (cid, bid) =>
      cid % 20 != 0 && bid % 20 == 0 })
  }

  test("xt13 plants PII exactly where declared and the redaction removes it all") {
    val got = TextAnalysis.xt13.fn(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap

    val docs = Ctx(spark, sf).documents.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.keySet == docs.map(_._1).toSet)

    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val phoneRe = "\\+1-555-[0-9]{4}".r
    docs.foreach { case (id, text) =>
      val planted = text +
        (if (id % 7 == 0) s" contact user$id@example.com now" else "") +
        (if (id % 11 == 0) s" call +1-555-${"%04d".format(id % 10000)} today"
         else "")
      val (nEmail, nPhone, redLen, redMd5) = got(id)
      assert(nEmail == (if (id % 7 == 0) 1L else 0L), s"doc $id email count")
      assert(nPhone == (if (id % 11 == 0) 1L else 0L), s"doc $id phone count")
      val redacted = phoneRe.replaceAllIn(
        emailRe.replaceAllIn(planted, "<EMAIL>"), "<PHONE>")
      assert(redLen == redacted.length.toLong, s"doc $id redacted length")
      assert(emailRe.findFirstIn(redacted).isEmpty &&
        phoneRe.findFirstIn(redacted).isEmpty,
        s"doc $id still contains PII after redaction")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(redacted.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(redMd5 == md5, s"doc $id redacted md5")
    }
    // fixture plants both PII kinds
    assert(got.values.exists(_._1 == 1L) && got.values.exists(_._2 == 1L))
  }
}
