package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization machinery behind xs9/xr12: codebook training
  * determinism, encode invariants, and the ADC identity (the
  * approximate dot IS the dot against the reconstruction, exactly).
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def corpusSv() = {
    graft.functions.VectorOps.register(spark)
    val e = Ctx(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id") % 20 =!= 0)
    Similarity.subvectors(e)
  }

  test("codebook training is deterministic and constant-bounded") {
    val sv = corpusSv()
    def tab() = Similarity.trainPqCodebooks(sv)
      .select("m", "code", "cv").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2))
    val a = tab(); val b = tab()
    assert(a.toSeq == b.toSeq, "two trainings diverged")
    assert(a.length <= 8 * 32, s"codebook not constant-bounded: ${a.length}")
    assert(a.map(_._1).distinct.sorted.toSeq == (0 until 8),
      "every subspace must carry a codebook")
    assert(a.forall(_._3.length == 8), "subvector dim must be 64/8")
  }

  test("encode assigns every (vector, subspace) exactly one nearest code") {
    val sv = corpusSv().persist()
    val cb = Similarity.trainPqCodebooks(sv)
    val codes = Similarity.pqAssign(sv, cb)
    val n = sv.count()
    assert(codes.count() == n, "conservation: one code per (vec, m)")
    // argmin re-check on a sample: no other code may be strictly closer
    val better = sv.limit(50).join(cb, "m")
      .select(col("vec_id"), col("m"), col("code").as("alt"),
        (col("cnrm2") - lit(2.0) * expr("vec_dot(sv, cv)")).as("alt_dist"))
      .join(
        codes.join(sv, Seq("vec_id", "m")).join(cb, Seq("m", "code"))
          .select(col("vec_id"), col("m"),
            (col("cnrm2") - lit(2.0) * expr("vec_dot(sv, cv)")).as("dist")),
        Seq("vec_id", "m"))
      .filter(col("alt_dist") < col("dist"))
    assert(better.count() == 0, "a strictly closer code was not chosen")
    sv.unpersist()
  }

  test("ADC dot equals the dot against the code reconstruction") {
    val sv = corpusSv().persist()
    val cb = Similarity.trainPqCodebooks(sv)
    val codes = Similarity.pqAssign(sv, cb)
    // reconstruction r(item) = concat_m cv(code_m); ADC(q, item) must
    // equal vec_dot(q_m, cv(code_m)) summed — same terms by definition,
    // so check against the whole-vector dot of the reconstruction
    val recon = codes.join(cb, Seq("m", "code"))
      .select(col("vec_id"), col("m"), col("cv"))
      .groupBy("vec_id")
      .agg(expr("flatten(transform(array_sort(collect_list(struct(m, cv))), p -> p.cv))").as("rv"))
    val q = Ctx(spark, sf).embeddings
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qv"))
      .filter(col("qid") % 20 === 0).limit(5)
    val qsv = Similarity.subvectors(
      q.select(col("qid").as("vec_id"), col("qv").as("v")))
    val adc = qsv.join(cb, "m")
      .select(col("vec_id").as("qid"), col("m"), col("code"),
        expr("vec_dot(sv, cv)").as("t"))
      .join(codes.select(col("vec_id"), col("m"), col("code")), Seq("m", "code"))
      .groupBy("qid", "vec_id").agg(sum("t").as("adot"))
    val direct = q.crossJoin(recon)
      .select(col("qid"), col("vec_id"), expr("vec_dot(qv, rv)").as("ddot"))
    val dev = adc.join(direct, Seq("qid", "vec_id"))
      .select(max(abs(col("adot") - col("ddot"))).as("dev"))
      .head.getDouble(0)
    assert(dev < 1e-9, s"ADC deviates from reconstruction dot by $dev")
    sv.unpersist()
  }

  test("xs9 emits exact cosine scores for its survivors, top-5 per query") {
    val out = Similarity.xs9.fn(spark, sf).persist()
    val perQuery = out.groupBy("vec_id").count()
      .agg(max("count")).head.getLong(0)
    assert(perQuery <= 5, "more than k rows for a query")
    // every emitted score must BE the exact rounded cosine
    graft.functions.VectorOps.register(spark)
    val all = Ctx(spark, sf).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
    val va = all.select(col("vec_id"), col("v").as("va"), col("nrm").as("na"))
    val vb = all.select(col("vec_id").as("neighbor_id"),
      col("v").as("vb"), col("nrm").as("nb"))
    val bad = out.join(va, "vec_id").join(vb, "neighbor_id")
      .filter(col("score") =!=
        round(expr("vec_dot(va, vb)") / (col("na") * col("nb")), 4))
    assert(bad.count() == 0, "a rescored survivor carries a non-exact score")
    out.unpersist()
  }
}
