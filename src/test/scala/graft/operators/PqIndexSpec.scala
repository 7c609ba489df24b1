package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PQ serving layout: coded probe answers, exact-rescore mode,
  * append drift (zero on replay, non-zero under a distribution shift),
  * the code file's bandwidth advantage over a vector file, and
  * batch == stream serving equivalence.
  */
class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def bytesUnder(dir: String): Long = {
    val root = Paths.get(dir)
    var n = 0L
    Files.walk(root).forEach { p =>
      val f = p.getFileName.toString
      if (f.endsWith(".parquet") && !f.startsWith("_"))
        n += Files.size(p)
    }
    n
  }

  test("build + ADC probe: k answers per query, deterministic, codes are the scan") {
    val root = Files.createTempDirectory("pqidx").toString
    val path = s"$root/idx"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    PqIndex.build(spark, emb, path)

    import spark.implicits._
    val batch = Seq(0L, 20L, 40L).map { id =>
      id -> emb.filter(col("vec_id") === id)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0)
    }.map { case (id, v) => (id, v) }.toDF("query_id", "embedding")

    def run() = PqIndex.probeBatch(spark, path, batch, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val a = run()
    assert(a == run(), "two probes of the same batch diverged")
    assert(a.groupBy(_._1).forall(_._2.size == 5), "expected 5 answers per query")
    // every answer must come from the stored code file
    val stored = spark.read.parquet(s"$path/codes")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(a.forall(t => stored(t._2)), "an answer is not in the code file")

    // the PQ bandwidth claim: the code file is a small fraction of the
    // same corpus stored as full vectors (same writer, same rows)
    val vecDir = s"$root/vectors"
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
      .write.parquet(vecDir)
    val ratio = bytesUnder(s"$path/codes").toDouble / bytesUnder(vecDir)
    assert(ratio < 0.5, f"code file is $ratio%.2f of the vector file — too large")
  }

  test("rescore mode emits exact cosine for survivors and beats ADC recall") {
    val root = Files.createTempDirectory("pqidx-rs").toString
    val path = s"$root/idx"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    PqIndex.build(spark, emb, path)
    import spark.implicits._
    val batch = Seq(0L, 20L).map { id =>
      (id, emb.filter(col("vec_id") === id)
        .select(col("embedding").cast("array<double>"))
        .head.getSeq[Double](0))
    }.toDF("query_id", "embedding")
    val out = PqIndex.probeBatch(spark, path, batch, k = 5,
      rescoreWith = Some(emb))
    // recompute each emitted score exactly
    graft.functions.VectorOps.register(spark)
    val all = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
    val va = all.select(col("vec_id").as("query_id"), col("v").as("va"),
      col("nrm").as("na"))
    val vb = all.select(col("vec_id").as("neighbor_id"), col("v").as("vb"),
      col("nrm").as("nb"))
    val bad = out.join(va, "query_id").join(vb, "neighbor_id")
      .filter(col("score") =!=
        round(expr("vec_dot(va, vb)") / (col("na") * col("nb")), 4))
    assert(bad.count() == 0, "a rescored answer carries a non-exact score")
  }

  test("append drift: zero on replay, positive under a shifted batch") {
    val root = Files.createTempDirectory("pqidx-drift").toString
    val path = s"$root/idx"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 400)
    PqIndex.build(spark, emb, path)
    val replay = PqIndex.append(spark,
      emb.withColumn("vec_id", col("vec_id") + 100000), path)
    assert(replay.mseDrift == 0.0,
      s"replaying the build corpus must not drift (got ${replay.mseDrift})")
    assert(!replay.needsRebaseline)
    // a shifted batch: vectors scaled + offset far from every codebook
    val shifted = emb
      .withColumn("vec_id", col("vec_id") + 200000)
      .withColumn("embedding",
        expr("transform(embedding, x -> x * CAST(7.0 AS FLOAT) + CAST(3.0 AS FLOAT))"))
    val moved = PqIndex.append(spark, shifted, path)
    assert(moved.mseDrift > 0.5,
      s"a shifted batch must move the drift gauge (got ${moved.mseDrift})")
    // the declared re-baseline threshold separates the two regimes
    assert(moved.needsRebaseline)
    // drift history: one row per append
    assert(spark.read.parquet(s"$path/drift").count() == 2)
    // appended codes are probeable alongside the originals
    import spark.implicits._
    val q = Seq((0L, emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0))).toDF("query_id", "embedding")
    val withReplay = PqIndex.probeBatch(spark, path, q, k = 3)
    assert(withReplay.count() == 3)
  }

  test("serve: streamed batch answers equal probeBatch; replay idempotent") {
    val s = spark.newSession()
    graft.functions.VectorOps.register(s)
    import s.implicits._
    val root = Files.createTempDirectory("pqidx-stream").toString
    val path = s"$root/idx"
    val emb = s.read.parquet(s"$sf/embeddings.parquet")
    PqIndex.build(s, emb, path)
    def vec(id: Long) = emb.filter(col("vec_id") === id)
      .select(col("embedding").cast("array<double>"))
      .head.getSeq[Double](0)
    val input = MemoryStream[(Long, Seq[Double])](s)
    val q = PqIndex.serve(input.toDF().toDF("query_id", "embedding"),
      path, s"$root/out", Files.createTempDirectory("pqidx-ckpt").toString,
      k = 5)
    input.addData((0L, vec(0L)), (20L, vec(20L)))
    q.processAllAvailable()
    q.stop()
    import s.implicits._
    val streamed = s.read.parquet(s"$root/out/batch=0")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val batch = Seq((0L, vec(0L)), (20L, vec(20L))).toDF("query_id", "embedding")
    val direct = PqIndex.probeBatch(s, path, batch, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(streamed == direct, "streamed answers diverge from the batch probe")
  }
}
