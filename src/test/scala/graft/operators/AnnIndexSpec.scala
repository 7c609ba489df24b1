package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF index must (1) partition the corpus exactly once
  * across cell directories, (2) answer probes identically to scoring
  * the probed cells of the in-memory layout, and (3) — the point —
  * PLAN only the probed cells' files: the cid filter is a partition
  * filter, so probe I/O is NProbe/Cells of the corpus by
  * construction, which is the property that keeps a 100 TB index
  * serveable.
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def parquetFilesUnder(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return Nil
    val out = Seq.newBuilder[String]
    Files.walk(root).forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".parquet") && !n.startsWith("_")) out += p.toString
    }
    out.result()
  }

  private def scanNumFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a parquet scan in the probe plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("build + probe: partition-pruned I/O and correct top-k") {
    val path = Files.createTempDirectory("annidx").toString + "/idx"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    AnnIndex.build(spark, emb, path)

    // (1) every vector lands in exactly one cell (cells now live in
    // manifest-published epoch dirs — read through the manifest)
    val cells = IndexManifest.readTable(spark, path, "cells").get
    assert(cells.count() == emb.count())
    assert(cells.select("vec_id").distinct().count() == emb.count())
    val nCells = cells.select("cid").distinct().count()
    assert(nCells > 1, "k-means must spread the corpus across cells")

    // a probe query: vector 7's embedding
    val q = emb.filter(col("vec_id") === 7L)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0).toArray
    val probed = AnnIndex.probedCells(spark, path, q, nprobe = 3)
    assert(probed.size == 3 && probed.distinct.size == 3)

    // (2) probe == brute force over exactly the probed cells
    val res = AnnIndex.probe(spark, path, q, k = 5, nprobe = 3)
    val got = res.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    graft.functions.VectorOps.register(spark)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val expected = cells.filter(col("cid").isin(probed: _*))
      .withColumn("qv", array(q.map(lit): _*))
      .select(col("vec_id").as("neighbor_id"),
        round(expr("vec_dot(v, qv)") / (col("nrm") * lit(qn)), 4).as("score"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
      .limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
    assert(got.size == 5)

    // (3) the executed probe scan planned ONLY the probed dirs' files
    val probedFiles =
      probed.flatMap(c => parquetFilesUnder(s"$path/cells/epoch=0/cid=$c")).size
    val allFiles = parquetFilesUnder(s"$path/cells").size
    val planned = scanNumFiles(AnnIndex.probe(spark, path, q, 5, 3))
    assert(planned == probedFiles.toLong,
      s"planned $planned files, probed dirs hold $probedFiles")
    assert(planned < allFiles.toLong,
      "pruning must beat a full scan on a multi-cell index")
  }

  test("zero-norm vectors never reach the index or hijack a probe") {
    import spark.implicits._
    val path = Files.createTempDirectory("annidx0").toString + "/idx"
    // a tiny corpus with one all-zero embedding: cosine against it is
    // 0/0 = NaN, and NaN sorts ABOVE every real score descending — it
    // must be excluded at build, and probe must guard anyway
    val rows = (1L to 40L).map { i =>
      val v = if (i == 13L) Array.fill(4)(0.0f)
        else Array.tabulate(4)(j => (((i * 7 + j * 3) % 11) - 5).toFloat)
      (i, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    AnnIndex.build(spark, emb, path)
    val stored = spark.read.parquet(s"$path/cells")
      .select("vec_id").as[Long].collect().toSet
    assert(!stored.contains(13L), "zero vector must not be indexed")
    assert(stored.size == 39)
    val got = AnnIndex.probe(spark, path, Array(1.0, -1.0, 2.0, 0.5),
        k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 5)
    assert(got.forall { case (id, s) => id != 13L && !s.isNaN })
    // a zero QUERY has no direction to rank by — refuse loudly
    intercept[IllegalArgumentException](
      AnnIndex.probe(spark, path, Array(0.0, 0.0, 0.0, 0.0), 5, 2))
  }

  test("append drift gauge: zero under replay, moves when vectors outgrow centroids") {
    val path = Files.createTempDirectory("anndrift").toString + "/idx"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    AnnIndex.build(spark, emb, path)
    // replaying the build corpus: same vectors, same frozen centroids,
    // same assignment — the mean squared distance matches the baseline
    val replay = AnnIndex.append(spark, emb, path)
    assert(replay.msdDrift < 1e-12, s"replay drift=${replay.msdDrift}")
    assert(!replay.needsRebaseline)
    // vectors pushed far from every frozen centroid: the gauge moves
    val shifted = emb.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      expr("transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x * 5.0d + 3.0d)")
        .as("embedding"))
    val moved = AnnIndex.append(spark, shifted, path)
    assert(moved.msdDrift > 0.5, s"shifted drift=${moved.msdDrift}")
    // the declared re-baseline threshold separates the two regimes
    assert(moved.needsRebaseline)
    // history persisted for thresholding
    assert(spark.read.parquet(s"$path/drift").count() == 2L)
  }

  test("append folds new vectors into existing cells, probe sees them") {
    val path = Files.createTempDirectory("annidx2").toString + "/idx"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val extra = emb.filter(col("vec_id") % 10 === 0)
    AnnIndex.build(spark, base, path)
    val before = spark.read.parquet(s"$path/cells").count()
    AnnIndex.append(spark, extra, path)
    val after = spark.read.parquet(s"$path/cells")
    assert(after.count() == emb.count() && before < emb.count())
    // appended rows are routed by the FROZEN centroids: re-ranking any
    // appended vector against the stored routing table agrees with the
    // cell directory it landed in
    graft.functions.VectorOps.register(spark)
    val cents = broadcast(spark.read.parquet(s"$path/centroids"))
    val want = graft.queries.Similarity.rankAgainst(
        after.filter(col("vec_id") % 10 === 0).select("vec_id", "v", "nrm"),
        cents)
      .filter(col("rn") === 1).select(col("vec_id"), col("cid").as("want"))
    val mismatch = after.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("cid"))
      .join(want, "vec_id")
      .filter(col("cid") =!= col("want")).count()
    assert(mismatch == 0L)
  }
}
