package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup-at-ingest composition: intra-batch exact-set dedup +
  * near-dup match against the accumulated lake + exactly-once append
  * + idempotent quarantine — replays must change nothing, and the
  * final lake must hold exactly the distinct survivors.
  */
class DedupIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val a = "the quick brown fox jumps over the lazy dog by the river"
  private val aNear = a + " tonight" // J vs a: 11/12 > 0.8
  private val b = "spark shuffle partitions and broadcast joins explained"
  private val c = "minhash signatures band together for similar documents"

  test("batches dedup against the growing lake; replay is a no-op") {
    val root = Files.createTempDirectory("ingest").toString
    val lake = s"$root/lake"
    val quar = s"$root/quarantine"

    // batch 0: two distinct docs
    val r0 = DedupIngest.ingestBatch(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), 0L, "s1", lake, quar)
    assert(r0.appended == 2 && r0.quarantined == 0 && r0.version.nonEmpty)

    // batch 1: near-dup of a (corpus_dup), new doc c + its exact twin
    // (one keeps, one batch_dup)
    val r1 = DedupIngest.ingestBatch(
      Seq((10L, aNear), (11L, c), (12L, c)).toDF("doc_id", "text"),
      1L, "s1", lake, quar)
    assert(r1.appended == 1 && r1.quarantined == 2)

    val lakeIds = Snapshot.read(spark, lake)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(lakeIds == Seq(1L, 2L, 11L))

    val q = spark.read.parquet(s"$quar/batch=1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(q == Set((10L, 1L, "corpus_dup"), (12L, 11L, "batch_dup")))

    // replay batch 1 (crash-redelivery): lake version unchanged,
    // quarantine rewritten identically
    val r1b = DedupIngest.ingestBatch(
      Seq((10L, aNear), (11L, c), (12L, c)).toDF("doc_id", "text"),
      1L, "s1", lake, quar)
    assert(r1b.version.isEmpty, "replayed batch must not commit")
    assert(r1b.appended == 0 && r1b.quarantined == 0,
      "replay must skip every side effect")
    assert(Snapshot.read(spark, lake).count() == 3)
    val q2 = spark.read.parquet(s"$quar/batch=1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(q2 == q)

    // batch 2: near-dup of the doc batch 1 appended — the lake GREW
    // and the new increment dedups against that growth
    val r2 = DedupIngest.ingestBatch(
      Seq((20L, c + " again"), (21L, "totally novel content here"))
        .toDF("doc_id", "text"), 2L, "s1", lake, quar)
    assert(r2.appended == 1 && r2.quarantined == 1)
    assert(Snapshot.read(spark, lake).count() == 4)
    val q3 = spark.read.parquet(s"$quar/batch=2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(q3 == Set((20L, 11L, "corpus_dup")))
  }

  test("crash between quarantine write and lake commit converges on redelivery") {
    val root = Files.createTempDirectory("ingest-crash").toString
    val lake = s"$root/lake"
    val quar = s"$root/quarantine"
    DedupIngest.ingestBatch(
      Seq((1L, a)).toDF("doc_id", "text"), 0L, "s3", lake, quar)
    // simulate the crash window: batch 1's quarantine dir holds STALE
    // bytes from a run that died before commitAppendOnce published —
    // the lake has no batch-1 marker, so redelivery recomputes from
    // the PRE-BATCH corpus state and overwrites the dir correctly
    Seq((99L, 99L, "garbage")).toDF("doc_id", "match_id", "reason")
      .write.mode("overwrite").parquet(s"$quar/batch=1")
    val r = DedupIngest.ingestBatch(
      Seq((10L, aNear), (11L, c)).toDF("doc_id", "text"),
      1L, "s3", lake, quar)
    assert(r.appended == 1 && r.quarantined == 1 && r.version.nonEmpty)
    val q = spark.read.parquet(s"$quar/batch=1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(q == Set((10L, 1L, "corpus_dup")), s"stale bytes must be replaced: $q")
  }

  test("a corpus read failure fails the batch instead of faking an empty corpus") {
    val root = Files.createTempDirectory("ingest-fail").toString
    val lake = s"$root/lake"
    val quar = s"$root/quarantine"
    DedupIngest.ingestBatch(
      Seq((1L, a)).toDF("doc_id", "text"), 0L, "s4", lake, quar)
    // make the committed data files "vanish" (the visible shape of a
    // transient FS/listing error): the manifest still lists them, so
    // the corpus read fails with something that is NOT the
    // missing-table signal — swallowing it would dedup against an
    // empty corpus and append permanent duplicates, so the batch must
    // FAIL (stream retries).
    def parquetsUnder(f: java.io.File): Seq[java.io.File] =
      Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap { c =>
        if (c.isDirectory && c.getName != "manifests") parquetsUnder(c)
        else if (c.getName.endsWith(".parquet")) Seq(c) else Nil
      }
    val victims = parquetsUnder(new java.io.File(lake))
    assert(victims.nonEmpty, "fixture: expected committed data files")
    victims.foreach(v => assert(v.delete()))
    // The planted failure makes Spark's OWN ObservationManager listener
    // log one expected ExecutionListenerBus ERROR: once any Observation
    // has ever registered on a session, its session-lifetime listener's
    // onFailure forces the failed query's executedPlan (observedMetrics)
    // and rethrows the planted AnalysisException inside the bus. There
    // is nothing to unregister at our level (the manager listener is a
    // singleton), so scope the expected noise OUT of the log — a real
    // listener error elsewhere in the suite still prints.
    val lbLogger = "org.apache.spark.sql.util.ExecutionListenerBus"
    val prev = org.apache.logging.log4j.LogManager.getLogger(lbLogger).getLevel
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      lbLogger, org.apache.logging.log4j.Level.FATAL)
    try {
      intercept[Exception] {
        DedupIngest.ingestBatch(
          Seq((10L, aNear)).toDF("doc_id", "text"), 1L, "s4", lake, quar)
      }
      // the listener bus delivers asynchronously — give the queue a
      // moment to drain before restoring the level, or the ERROR lands
      // after the restore anyway (the drain API is private[spark])
      Thread.sleep(2000)
    } finally org.apache.logging.log4j.core.config.Configurator.setLevel(
      lbLogger, prev)
    assert(Snapshot.lastCommittedBatch(lake, "s4").contains(0L),
      "the failed batch must not have committed")
  }

  test("streaming sink wires the same semantics") {
    val s = spark.newSession()
    graft.functions.TextOps.register(s)
    import s.implicits._
    val root = Files.createTempDirectory("ingest-stream").toString
    val input = MemoryStream[(Long, String)](s)
    val q = DedupIngest.sink(input.toDF().toDF("doc_id", "text"),
      "s2", s"$root/lake", s"$root/q",
      Files.createTempDirectory("ingest-ckpt").toString)
    input.addData((1L, a), (2L, b))
    q.processAllAvailable()
    input.addData((3L, aNear), (4L, c))
    q.processAllAvailable()
    q.stop()
    val ids = Snapshot.read(s, s"$root/lake")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L))
    assert(s.read.parquet(s"$root/q/batch=1").count() == 1)
  }
}
