package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE semantics pinned on hand-checkable inputs: the binding
  * fixpoint-replace merge application (boundary safety, overlap runs,
  * rank-ascending completeness), a hand corpus with derivable merges,
  * and the provenance of the shipped constant table.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def toks(s: String): Seq[String] =
    s.split(" +").filter(_.nonEmpty).toSeq

  test("spacedDoc: one symbol per alpha char, >= 3-space word gaps") {
    assert(toks(Bpe.spacedDoc("cat")) == Seq("c", "a", "t"))
    assert(toks(Bpe.spacedDoc("Cat, hat!")) ==
      Seq("c", "a", "t", "h", "a", "t"))
    // gap width blocks cross-word merges: t|h adjacent across words
    val s = Bpe.spacedDoc("cat hat")
    assert(s.contains("t    h") || s.contains("t   h"),
      s"word gap too narrow in '$s'")
    assert(Bpe.applyMerge(s, "t", "h") == s,
      "merge must not fire across a word boundary")
    assert(toks(Bpe.spacedDoc("")) == Nil)
    assert(toks(Bpe.spacedDoc("123 !?")) == Nil)
  }

  test("applyMerge: boundary safety and overlap runs") {
    // token 'ba' followed by 'b': pattern ' a b ' must NOT match the
    // 'a' inside 'ba' (the naive unflanked replace bug)
    assert(Bpe.applyMerge(" ba b ", "a", "b") == " ba b ")
    // overlap run: one replace-all pass leaves ' aa a a '; the
    // fixpoint closes it to ' aa aa '
    assert(Bpe.applyMerge(" a a a a ", "a", "a") == " aa aa ")
    // odd run: greedy-left — [aa, a]
    assert(Bpe.applyMerge(" a a a ", "a", "a") == " aa a ")
    // no occurrence: unchanged
    assert(Bpe.applyMerge(" x y ", "a", "b") == " x y ")
  }

  test("encode applies ranks in order; later merges consume earlier outputs") {
    // 'hash' under the shipped chain (a,s)->(as,h)->(h,ash): one token
    val enc = Bpe.encode("hash", Bpe.ShippedMerges)
    assert(toks(enc) == Seq("hash"))
    assert(toks(Bpe.encode("join", Bpe.ShippedMerges)) == Seq("join"))
    assert(toks(Bpe.encode("batch", Bpe.ShippedMerges)) == Seq("batch"))
    // a word none of the merges touch stays char-split
    assert(toks(Bpe.encode("qqq", Bpe.ShippedMerges)) == Seq("q", "q", "q"))
  }

  private def drainCaches(): Unit = {
    // train persists internally via own(); outside a reap those are
    // bare persists — drop them so the suite leaves no cache behind
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  test("trainer on a hand corpus learns the derivable merges") {
    import spark.implicits._
    // 'abab' x3 + 'ab' x2: pair counts a|b=8, b|a=3 -> merge 1 = (a,b);
    // then ab|ab=3 -> merge 2 = (ab,ab)
    val docs = Seq("abab abab abab", "ab ab").toDF("text")
    try {
      val (ms, v) = Bpe.trainWithVocab(spark, docs, 2)
      assert(ms == Seq(("a", "b"), ("ab", "ab")), s"learned $ms")
      assert(v.count() == 2) // vocabulary: {abab, ab}
      val forms = v.collect().map(r => r.getString(0).trim).sorted.toSeq
      assert(forms == Seq("ab", "abab"),
        s"final vocab state wrong: $forms") // 'abab' fully merged
    } finally drainCaches()
  }

  test("shipped constants ARE the sf0.01 trainer output (provenance)") {
    try {
      val ms = Bpe.train(spark,
        Ctx(spark, "/root/testdata/sf0.01").documents, 24)
      assert(ms == Bpe.ShippedMerges,
        "ShippedMerges drifted from the fixture trainer output")
    } finally drainCaches()
  }

  test("encodeStats columns: conservation and zero-token docs") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bpedoc").toString
    Seq((1L, "spark joins", 11L), (2L, "1234 !!", 7L), (3L, "", 0L))
      .toDF("doc_id", "text", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = Bpe.encodeStats(spark, tmp, Bpe.ShippedMerges)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4))).toMap
    assert(rows(1L)._1 == 2 && rows(1L)._2 == 10) // 'sparkjoins' chars
    assert(rows(1L)._3 < rows(1L)._2, "merges must compress 'joins'")
    assert(rows(2L) == ((0, 0, 0, 0.0)), "no-alpha doc: all zeros")
    assert(rows(3L) == ((0, 0, 0, 0.0)), "empty doc: all zeros")
  }
}
