package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ANN serving over the persisted IVF layout: every
  * micro-batch answer must equal the one-query [[AnnIndex.probe]] for
  * the same vector (same scoring, rounding, ties), the cell read must
  * stay a PARTITION filter (the property that keeps a 100 TB index
  * serveable), and a replayed batch must rewrite identical bytes.
  */
class AnnServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  // the batch probe's plan is AQE-wrapped (joins + windows) — walk
  // through adaptive and query-stage nodes to reach the real scans
  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(q.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other =>
      other.children.flatMap(fileScans) ++
        other.subqueries.flatMap(fileScans)
  }

  private def cellScanFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = fileScans(df.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("/cells")))
    assert(scans.nonEmpty, "expected a cells scan in the batch-probe plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  private def parquetFilesUnder(dir: String): Int = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return 0
    var n = 0
    Files.walk(root).forEach { p =>
      val f = p.getFileName.toString
      if (f.endsWith(".parquet") && !f.startsWith("_")) n += 1
    }
    n
  }

  test("probeBatch == probe per query; cells scan is partition-pruned") {
    val path = Files.createTempDirectory("annserve").toString + "/idx"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    AnnIndex.build(spark, emb, path)

    val qids = Seq(3L, 7L, 11L)
    val qvecs = qids.map { id =>
      id -> emb.filter(col("vec_id") === id)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0).toArray
    }
    import spark.implicits._
    val batch = qvecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("query_id", "embedding")

    val got = AnnIndex.probeBatch(spark, path, batch, k = 5, nprobe = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(x => (-x._2, x._1)).toSeq).toMap

    for ((id, v) <- qvecs) {
      val want = AnnIndex.probe(spark, path, v, k = 5, nprobe = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got(id) == want, s"batch answer for query $id diverges from probe")
    }

    // partition pruning: the batch plan reads exactly the UNION of the
    // three queries' probed dirs, and strictly less than the index
    val probedUnion = qvecs
      .flatMap { case (_, v) => AnnIndex.probedCells(spark, path, v, 3) }
      .distinct
    val expectFiles = probedUnion
      .map(c => parquetFilesUnder(s"$path/cells/epoch=0/cid=$c")).sum
    val planned = cellScanFiles(
      AnnIndex.probeBatch(spark, path, batch, 5, 3))
    assert(planned == expectFiles.toLong,
      s"planned $planned files, probed dirs hold $expectFiles")
    assert(planned < parquetFilesUnder(s"$path/cells").toLong,
      "batch probe must not scan the whole index")
  }

  test("serve: per-batch streaming answers equal probe; replay idempotent") {
    val s = spark.newSession()
    graft.functions.VectorOps.register(s)
    import s.implicits._
    val root = Files.createTempDirectory("annserve-stream").toString
    val path = s"$root/idx"
    val out = s"$root/out"
    val emb = s.read.parquet(s"$sf/embeddings.parquet")
    AnnIndex.build(s, emb, path)

    def vec(id: Long): Array[Double] = emb.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0).toArray

    val input = MemoryStream[(Long, Seq[Double])](s)
    val q = AnnIndex.serve(input.toDF().toDF("query_id", "embedding"),
      path, out, Files.createTempDirectory("annserve-ckpt").toString,
      k = 5, nprobe = 3)
    input.addData((3L, vec(3L).toSeq), (7L, vec(7L).toSeq))
    q.processAllAvailable()
    input.addData((11L, vec(11L).toSeq))
    q.processAllAvailable()
    q.stop()

    val b0 = s.read.parquet(s"$out/batch=0")
    val b1 = s.read.parquet(s"$out/batch=1")
    assert(b0.select("query_id").distinct().count() == 2)
    assert(b1.select("query_id").distinct().count() == 1)
    for ((id, df) <- Seq((3L, b0), (7L, b0), (11L, b1))) {
      val got = df.filter(col("query_id") === id)
        .select("neighbor_id", "score")
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(x => (-x._2, x._1)).toSeq
      val want = AnnIndex.probe(s, path, vec(id), 5, 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == want, s"streamed answer for query $id diverges from probe")
    }

    // replay: re-running batch 1's work overwrites its dir with
    // identical rows (per-batch dirs are the idempotence unit)
    val before = b1.collect().map(_.toString).sorted.toSeq
    AnnIndex.probeBatch(s, path,
        Seq((11L, vec(11L).toSeq)).toDF("query_id", "embedding"), 5, 3)
      .write.mode("overwrite").parquet(s"$out/batch=1")
    val after = s.read.parquet(s"$out/batch=1")
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
  }

  test("the index stays serveable during growth: append lands mid-stream") {
    val s = spark.newSession()
    graft.functions.VectorOps.register(s)
    import s.implicits._
    val root = Files.createTempDirectory("annserve-grow").toString
    val path = s"$root/idx"
    val out = s"$root/out"
    val emb = s.read.parquet(s"$sf/embeddings.parquet")
    // build on 90% of the corpus; the rest arrives while serving
    AnnIndex.build(s, emb.filter(col("vec_id") % 10 =!= 0), path)
    def vec(id: Long): Array[Double] = emb.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0).toArray

    val input = MemoryStream[(Long, Seq[Double])](s)
    val q = AnnIndex.serve(input.toDF().toDF("query_id", "embedding"),
      path, out, Files.createTempDirectory("annserve-grow-ckpt").toString,
      k = 5, nprobe = 3)
    input.addData((3L, vec(3L).toSeq))
    q.processAllAvailable()
    // growth between micro-batches: assign-only fold-in, frozen
    // centroids — no rebuild, no stream restart
    AnnIndex.append(s, emb.filter(col("vec_id") % 10 === 0), path)
    input.addData((3L, vec(3L).toSeq))
    q.processAllAvailable()
    q.stop()

    // batch 1 answered against the GROWN index: equal to a fresh
    // probe over it, and at least as good as batch 0's answer set
    // (appended vectors are now candidates)
    val g1 = s.read.parquet(s"$out/batch=1")
      .select("neighbor_id", "score")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(x => (-x._2, x._1)).toSeq
    val want = AnnIndex.probe(s, path, vec(3L), 5, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(g1 == want, "post-append batch must match a fresh probe of the grown index")
    val g0Top = s.read.parquet(s"$out/batch=0")
      .agg(max(col("score"))).head.getDouble(0)
    assert(g1.head._2 >= g0Top,
      "growing the index must never worsen the best answer")
  }
}
