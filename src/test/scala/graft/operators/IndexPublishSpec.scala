package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The index layouts' atomic-publish contract (IndexManifest): a probe
  * concurrent with an append reads a consistent version — entirely
  * before or entirely after the batch, never a subset of it — and
  * pre-manifest (r10) layouts on disk stay probe-able and append-able,
  * including the r9 pre-ubs Bm25 layout (bounds derived, not
  * PATH_NOT_FOUND).
  */
class IndexPublishSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def queriesDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("query_id", "text")
  }

  private val corpus = Seq(
    1L -> "spark joins shuffle data across the cluster",
    2L -> "broadcast joins avoid the shuffle for small tables",
    3L -> "columnar scans prune unused columns at the source",
    4L -> "the optimizer pushes filters into the scan")

  private def topDocs(path: String): Map[Long, Seq[Long]] =
    Bm25Index.probeBatch(spark, path,
      queriesDf(Seq(100L -> "shuffle joins", 200L -> "columnar scans")), 3)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }

  test("Bm25: a staged-but-unpublished append is invisible; publish flips atomically") {
    val path = Files.createTempDirectory("bm25pub").toString + "/idx"
    Bm25Index.build(spark, docsDf(corpus), path)
    val before = topDocs(path)
    assert(before.nonEmpty && before.values.forall(_.nonEmpty))

    // simulate an append CRASHED (or still in flight) after staging its
    // epoch dirs but before the manifest publish — the torn-read window
    // of the r10 raw-dir layout. A probe must see the OLD version.
    val e = IndexManifest.nextEpoch(spark, path, Seq("postings", "df", "ubs"))
    import spark.implicits._
    Seq(("shuffle", 99L, 5000000L))
      .toDF("term", "doc_id", "cu")
      .write.parquet(IndexManifest.epochDir(path, "postings", e))
    Seq(("shuffle", 99L, 5000000L)).toDF("term", "doc_id", "cu")
      .limit(0).select(col("term"), lit(1L).as("df"))
      .write.parquet(IndexManifest.epochDir(path, "df", e))
    Seq(("shuffle", 5000000L)).toDF("term", "ub")
      .write.parquet(IndexManifest.epochDir(path, "ubs", e))
    assert(topDocs(path) == before,
      "staged epoch leaked into a probe before publish")

    // publish -> the batch becomes visible as a whole: doc 99's huge
    // cu must now take over the 'shuffle' query's top spot
    IndexManifest.publish(spark, path, e)
    val after = topDocs(path)
    assert(after(100L).head == 99L)
    assert(after(200L) == before(200L), "untouched query changed")
  }

  test("Bm25: real append is atomic and probe-consistent") {
    val path = Files.createTempDirectory("bm25pub2").toString + "/idx"
    Bm25Index.build(spark, docsDf(corpus), path)
    val before = topDocs(path)
    val d = Bm25Index.append(spark,
      docsDf(Seq(9L -> "shuffle shuffle shuffle joins shuffle")), path)
    assert(d.oovMass == 0.0)
    val after = topDocs(path)
    assert(after(100L).contains(9L), "appended doc missing from probe")
    assert(after(200L) == before(200L))
    // two epochs visible, both tables consistent
    assert(IndexManifest.visibleEpochs(spark, path).get.size == 2)
  }

  test("Bm25: empty/zero-token append batch returns a zero gauge, no NPE") {
    val path = Files.createTempDirectory("bm25pub3").toString + "/idx"
    Bm25Index.build(spark, docsDf(corpus), path)
    val d1 = Bm25Index.append(spark, docsDf(Nil), path)
    assert(d1 == Bm25Index.Drift(0.0, 0.0, 0.0))
    val d2 = Bm25Index.append(spark, docsDf(Seq(77L -> "123 456 !!!")), path)
    assert(d2 == Bm25Index.Drift(0.0, 0.0, 0.0))
    // nothing was published for the empty batches
    assert(IndexManifest.visibleEpochs(spark, path).get == Seq(0))
  }

  /** Flatten a v2 index to the r10 raw-dir layout (files moved out of
    * epoch=0, manifest removed) — the on-disk shape upgrades meet.
    */
  private def downgradeToV1(path: String, tables: Seq[String]): Unit = {
    for (t <- tables) {
      val ed = Paths.get(s"$path/$t/epoch=0")
      if (Files.exists(ed)) {
        Files.list(ed).forEach { f =>
          val n = f.getFileName.toString
          if (!n.startsWith(".") && !n.startsWith("_"))
            Files.move(f, Paths.get(s"$path/$t/$n"),
              StandardCopyOption.REPLACE_EXISTING)
        }
        // remove leftovers (SUCCESS markers etc.), then the dir
        Files.walk(ed).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
    }
    Files.walk(Paths.get(s"$path/manifests"))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  test("Bm25: pre-manifest v1 layout probes identically; missing ubs degrades, append keeps v1") {
    val v2 = Files.createTempDirectory("bm25v2").toString + "/idx"
    Bm25Index.build(spark, docsDf(corpus), v2)
    val expected = topDocs(v2)

    val v1 = Files.createTempDirectory("bm25v1").toString + "/idx"
    Bm25Index.build(spark, docsDf(corpus), v1)
    downgradeToV1(v1, Seq("postings", "df", "ubs"))
    assert(IndexManifest.visibleEpochs(spark, v1).isEmpty)
    assert(topDocs(v1) == expected, "v1 fallback read differs")

    // r9 shape: ubs sidecar absent entirely — probe derives the bounds
    Files.walk(Paths.get(s"$v1/ubs"))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    assert(topDocs(v1) == expected, "missing-ubs fallback differs")

    // append to the v1 index keeps raw-dir semantics and stays correct
    Bm25Index.append(spark,
      docsDf(Seq(9L -> "shuffle shuffle shuffle joins shuffle")), v1)
    assert(IndexManifest.visibleEpochs(spark, v1).isEmpty)
    assert(topDocs(v1)(100L).contains(9L))
  }

  test("AnnIndex/PqIndex: staged epoch invisible until publish; v1 msd/recon fallbacks") {
    graft.functions.VectorOps.register(spark)
    import spark.implicits._
    val emb = (1L to 30L).map { i =>
      i -> Array.tabulate(8)(j => (((i * 7 + j * 3) % 11) - 5).toDouble / 5.0)
    }.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 3L)
      .select(col("embedding")).head.getSeq[Double](0).toArray

    val ap = Files.createTempDirectory("annpub").toString + "/idx"
    AnnIndex.build(spark, emb, ap)
    val before = AnnIndex.probe(spark, ap, q, 5, 2).collect().toSeq
    // staged (unpublished) cells epoch must not change a probe
    val e = IndexManifest.nextEpoch(spark, ap, Seq("cells"))
    Seq((0, 999L, Array.fill(8)(1.0), math.sqrt(8.0)))
      .toDF("cid", "vec_id", "v", "nrm")
      .write.partitionBy("cid")
      .parquet(IndexManifest.epochDir(ap, "cells", e))
    assert(AnnIndex.probe(spark, ap, q, 5, 2).collect().toSeq == before)
    IndexManifest.publish(spark, ap, e)
    val ids = AnnIndex.probe(spark, ap, q, 30, 99).collect().map(_.getLong(0))
    assert(ids.contains(999L), "published epoch missing from probe")

    // v1 AnnIndex without the msd baseline: append establishes it
    val a1 = Files.createTempDirectory("annv1").toString + "/idx"
    AnnIndex.build(spark, emb, a1)
    downgradeToV1WithCells(a1)
    Files.walk(Paths.get(s"$a1/msd"))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    val d = AnnIndex.append(spark, emb.filter(col("vec_id") <= 5L), a1)
    assert(d.msdDrift == 0.0, "missing-msd append must self-baseline")
    assert(Files.exists(Paths.get(s"$a1/msd")))

    // PqIndex append is published atomically
    val pp = Files.createTempDirectory("pqpub").toString + "/idx"
    PqIndex.build(spark, emb, pp)
    assert(IndexManifest.visibleEpochs(spark, pp).get == Seq(0))
    PqIndex.append(spark,
      (31L to 35L).map { i =>
        i -> Array.tabulate(8)(j => (((i * 5 + j) % 7) - 3).toDouble / 3.0)
      }.toDF("vec_id", "embedding"), pp)
    assert(IndexManifest.visibleEpochs(spark, pp).get.size == 2)
    val probed = PqIndex.probeBatch(spark, pp,
      Seq(1L -> Array.tabulate(8)(j => (j + 1).toDouble / 8.0))
        .toDF("query_id", "embedding"), 40)
      .collect().map(_.getLong(1)).toSet
    assert(probed.exists(_ > 30L), "appended codes missing from ADC probe")
  }

  test("two-writer race: same allocated epoch — loser fails loudly, index never torn") {
    // the Bm25Index.append comment's promise, pinned: two appenders
    // that BOTH allocate the same next epoch (each computed nextEpoch
    // before either staged) collide on the errorIfExists stage dir —
    // the loser throws before any publish, and probes see either the
    // pre-race index or the winner's complete batch, never a blend
    val path = Files.createTempDirectory("bm25race").toString + "/idx"
    Bm25Index.build(spark, docsDf(corpus), path)
    val before = topDocs(path)
    val e1 = IndexManifest.nextEpoch(spark, path, Seq("postings", "df", "ubs"))
    val e2 = IndexManifest.nextEpoch(spark, path, Seq("postings", "df", "ubs"))
    assert(e1 == e2, "race precondition: both writers allocated one epoch")
    // winner stages + publishes a full append
    val drift = Bm25Index.append(spark,
      docsDf(Seq(9L -> "shuffle shuffle shuffle wins the race")), path)
    assert(drift.dfTvDrift >= 0.0)
    val afterWin = topDocs(path)
    assert(afterWin(100L).contains(9L), "winner's batch not visible")
    // loser tries to stage ITS batch at the same epoch id: the
    // errorIfExists stage write must throw — before any manifest write
    import spark.implicits._
    val thrown = intercept[Exception] {
      Seq(("shuffle", 66L, 9000000L)).toDF("term", "doc_id", "cu")
        .write.mode("errorifexists")
        .parquet(IndexManifest.epochDir(path, "postings", e2))
    }
    assert(thrown.getMessage != null)
    // the failed stage changed nothing a reader can see
    assert(topDocs(path) == afterWin, "loser's failed stage tore the index")
    // and the loser's documented recovery — re-allocate — gets a FRESH
    // epoch (nextEpoch scans staged dirs, so the winner's is skipped)
    val e3 = IndexManifest.nextEpoch(spark, path, Seq("postings", "df", "ubs"))
    assert(e3 > e2, "retry re-allocated the contended epoch")
    assert(before.nonEmpty)
  }

  test("concurrent manifest publishes serialize: every epoch lands, versions strictly ordered") {
    // 8 threads CAS-publishing distinct epochs through one manifest:
    // every publish must land (the loop retries on rename-CAS loss),
    // the final manifest must list all of them, and the version chain
    // must be gap-free — the serialization the rename-onto-existing
    // semantics promise
    val path = Files.createTempDirectory("manifestrace").toString + "/idx"
    // seed a v2 layout with epoch 0 visible
    val (minEpoch, n) = (1, 8)
    IndexManifest.publish(spark, path, 0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (minEpoch until minEpoch + n).map { e =>
      new Thread(() => {
        try IndexManifest.publish(spark, path, e)
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"publish thread failed: ${errs.peek()}")
    val visible = IndexManifest.visibleEpochs(spark, path)
    assert(visible.contains((0 to n).toSeq),
      s"lost a racing publish: $visible")
    // version chain: v00000 .. v0000{n} present with no gaps
    val md = new java.io.File(s"$path/manifests")
    val vs = md.listFiles().map(_.getName)
      .filter(f => f.startsWith("v") && f.endsWith(".txt"))
      .map(_.stripPrefix("v").stripSuffix(".txt").toInt).sorted
    assert(vs.toSeq == (0 to n).toSeq, s"version chain has gaps: ${vs.toSeq}")
  }

  test("compact collapses epochs with identical probes; vacuum reclaims, spares newest orphan") {
    val path = Files.createTempDirectory("bm25cmp").toString + "/idx"
    Bm25Index.build(spark, docsDf(corpus), path)
    Bm25Index.append(spark,
      docsDf(Seq(9L -> "shuffle shuffle shuffle joins shuffle")), path)
    Bm25Index.append(spark,
      docsDf(Seq(10L -> "columnar pruning of unused columns")), path)
    assert(IndexManifest.visibleEpochs(spark, path).get.size == 3)
    val before = topDocs(path)

    Bm25Index.compact(spark, path)
    val vis = IndexManifest.visibleEpochs(spark, path).get
    assert(vis.size == 1, s"compact must leave ONE visible epoch, got $vis")
    assert(topDocs(path) == before, "compaction changed probe results")
    // compaction materialized the df/ubs collapse: no duplicate terms
    val dfT = IndexManifest.readTable(spark, path, "df").get
    assert(dfT.count() == dfT.select("term").distinct().count())

    // stage an orphan (simulated in-flight append) ABOVE everything,
    // then vacuum: the 3 superseded epochs go, the orphan survives
    val orphan = IndexManifest.nextEpoch(spark, path,
      Seq("postings", "df", "ubs"))
    import spark.implicits._
    Seq(("x", 1L, 1L)).toDF("term", "doc_id", "cu")
      .write.parquet(IndexManifest.epochDir(path, "postings", orphan))
    val deleted = Bm25Index.vacuum(spark, path)
    // postings: dead {0,1,2,orphan}, newest (the orphan) spared -> 3;
    // df/ubs: dead {0,1,2}, newest spared conservatively -> 2 each
    assert(deleted == 7, s"expected 3+2+2 reclaimed dirs, got $deleted")
    assert(Files.exists(Paths.get(
      IndexManifest.epochDir(path, "postings", orphan))),
      "vacuum must spare the newest unpublished dir (possible in-flight append)")
    assert(topDocs(path) == before, "vacuum broke the live view")

    // AnnIndex + PqIndex compact: same contract, spot-checked
    graft.functions.VectorOps.register(spark)
    val emb = (1L to 30L).map { i =>
      i -> Array.tabulate(8)(j => (((i * 7 + j * 3) % 11) - 5).toDouble / 5.0)
    }.toDF("vec_id", "embedding")
    val ap = Files.createTempDirectory("anncmp").toString + "/idx"
    AnnIndex.build(spark, emb, ap)
    AnnIndex.append(spark, (31L to 35L).map { i =>
      i -> Array.tabulate(8)(j => (((i * 5 + j) % 7) - 3).toDouble / 3.0)
    }.toDF("vec_id", "embedding"), ap)
    val q = emb.filter(col("vec_id") === 3L)
      .select(col("embedding")).head.getSeq[Double](0).toArray
    val annBefore = AnnIndex.probe(spark, ap, q, 5, 2).collect().toSeq
    AnnIndex.compact(spark, ap)
    assert(IndexManifest.visibleEpochs(spark, ap).get.size == 1)
    assert(AnnIndex.probe(spark, ap, q, 5, 2).collect().toSeq == annBefore)
    // dead {0,1}, newest dead spared conservatively -> 1 reclaimed
    assert(AnnIndex.vacuum(spark, ap) == 1)

    val pp = Files.createTempDirectory("pqcmp").toString + "/idx"
    PqIndex.build(spark, emb, pp)
    PqIndex.append(spark, (31L to 35L).map { i =>
      i -> Array.tabulate(8)(j => (((i * 5 + j) % 7) - 3).toDouble / 3.0)
    }.toDF("vec_id", "embedding"), pp)
    val qdf = Seq(1L -> Array.tabulate(8)(j => (j + 1).toDouble / 8.0))
      .toDF("query_id", "embedding")
    val pqBefore = PqIndex.probeBatch(spark, pp, qdf, 10).collect().toSeq
    PqIndex.compact(spark, pp)
    assert(IndexManifest.visibleEpochs(spark, pp).get.size == 1)
    assert(PqIndex.probeBatch(spark, pp, qdf, 10).collect().toSeq == pqBefore)
    assert(PqIndex.vacuum(spark, pp) == 1)
  }

  /** cells' epoch=0 contains cid=N partition dirs — move those up. */
  private def downgradeToV1WithCells(path: String): Unit = {
    val ed = Paths.get(s"$path/cells/epoch=0")
    Files.list(ed).forEach { d =>
      val n = d.getFileName.toString
      if (n.startsWith("cid="))
        Files.move(d, Paths.get(s"$path/cells/$n"))
      else if (!Files.isDirectory(d)) Files.deleteIfExists(d)
    }
    Files.walk(ed).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    Files.walk(Paths.get(s"$path/manifests"))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }
}
