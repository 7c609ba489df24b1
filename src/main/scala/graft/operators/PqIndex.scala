package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PQ code file AS A LAKE LAYOUT — xs9's product quantization
  * persisted as the serving artifact (Jégou et al., TPAMI 2011; the
  * code-file organization IVFADC serves from, minus the coarse
  * quantizer AnnIndex already provides). Where AnnIndex's cells store
  * FULL vectors, this layout stores PqM one-byte codes plus the exact
  * norm per vector — the memory/bandwidth form a 100 TB corpus is
  * actually scanned in: PqIndexSpec asserts the on-disk code file is a
  * fraction of the equivalent vector file, and the probe's executed
  * scan reads only the codes directory.
  *
  * Layout under `path`:
  *   codebooks/      PqM·PqCodes rows (m, code, cv, cnrm2) — tiny
  *   codes/epoch=E/  (vec_id, codes: array<tinyint> ordered by m, nrm)
  *                   per build (0) / append batch, atomically visible
  *                   via the IndexManifest epoch manifest
  *   manifests/      the visible-epoch manifest (see IndexManifest)
  *   recon/          build-time mean squared reconstruction error (the
  *                   append-drift baseline)
  *   drift/          one row per append: |batch_mse / build_mse − 1|
  *
  * Probe is ADC (asymmetric distance computation): the query builds a
  * PqM·PqCodes lookup table of subvector·centroid dots; a corpus
  * item's approximate dot is the sum of its PqM table entries —
  * micro-unit BIGINT summation, so float order can't reorder ties.
  * Scores are approximate BY CONTRACT (the PQ trade); callers holding
  * the original vectors elsewhere pass them via `rescoreWith` to get
  * xs9's candidate-cut + exact-rescore tail on top of the coded scan.
  *
  * `append` encodes new vectors under the FROZEN codebooks (the
  * assign-only maintenance contract shared with AnnIndex/Bm25Index)
  * and emits the reconstruction-error drift gauge: 0 on replay of the
  * build corpus, growing as new vectors stop being representable by
  * the frozen codebooks — the retrain-rebuild signal.
  */
object PqIndex {

  /** Same door policy as AnnIndex: zero-norm vectors have no cosine. */
  private def normalized(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
      .filter(col("nrm") > 0)

  final case class Drift(mseDrift: Double) {
    /** Re-baseline (retrain codebooks + re-encode) when appended
      * vectors stop being representable by the frozen codebooks.
      * Threshold 0.25 splits the measured separation — replay drifts
      * exactly 0 (micro-unit integer error arithmetic) while a
      * scaled+offset batch measures > 0.5 (PqIndexSpec) — with 2×
      * margin on either side. Same loop shape as AnnIndex:
      * `if (append(...).needsRebaseline) build(...)`.
      */
    def needsRebaseline: Boolean = mseDrift > PqIndex.RebaselineThreshold
  }

  val RebaselineThreshold = 0.25

  /** (vec_id, codes, nrm) of `e` under the given codebooks, plus the
    * batch's mean squared reconstruction error (per-subspace errors
    * sum exactly: ||v − r||² = Σ_m ||sv_m − cv_{code_m}||², and each
    * term is sv·sv + the assignment's (cnrm2 − 2 sv·cv) distance).
    */
  private def encoded(e: DataFrame, cb: DataFrame): DataFrame = {
    val sv = graft.queries.Similarity.subvectors(e)
    val assigned = graft.queries.Similarity.pqAssign(sv, cb)
    assigned.join(sv, Seq("vec_id", "m")).join(cb, Seq("m", "code"))
      // micro-unit-quantized so the batch error aggregates as exact
      // BIGINT sums — replay of the build corpus yields the IDENTICAL
      // mse (bit-equal drift 0), no float-summation-order epsilon
      .select(col("vec_id"), col("m"), col("code"),
        (round(expr("vec_dot(sv, sv)") + col("cnrm2") -
          lit(2.0) * expr("vec_dot(sv, cv)"), 6) * 1e6).cast("long").as("se"))
      .groupBy("vec_id")
      .agg(expr(
        "transform(array_sort(collect_list(struct(m, code))), p -> CAST(p.code AS TINYINT))")
        .as("codes"),
        sum(col("se")).as("se"))
      .join(e.select(col("vec_id"), col("nrm")), "vec_id")
  }

  /** Write codes to the given directory + return the batch mse; the
    * persisted intermediate is scoped here (the write and the error
    * aggregate both read it).
    */
  private def writeCodes(enc: DataFrame, dir: String,
      mode: String): Option[Double] = {
    val persisted = enc.persist()
    try {
      persisted.select("vec_id", "codes", "nrm")
        .write.mode(mode).parquet(dir)
      persisted.agg((avg(col("se")) / 1e6).as("mse")).head() match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getDouble(0))
      }
    } finally persisted.unpersist(blocking = false)
  }

  /** Train per-subspace codebooks on `embeddings` and write the full
    * layout. The codebook train + encode collects are bounded by the
    * PqM·PqCodes constants, never the corpus. Codes land in an
    * `epoch=0` directory published through [[IndexManifest]] (atomic
    * append visibility); rebuild clears prior epochs + manifest.
    */
  def build(spark: SparkSession, embeddings: DataFrame, path: String): Unit = {
    graft.functions.VectorOps.register(spark)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("codes", "manifests").foreach { t =>
      fs.delete(new org.apache.hadoop.fs.Path(hp, t), true) }
    val e = normalized(embeddings).persist()
    try {
      val cb = graft.queries.Similarity.trainPqCodebooks(
        graft.queries.Similarity.subvectors(e))
      cb.write.mode("overwrite").parquet(s"$path/codebooks")
      val mse = writeCodes(encoded(e, cb),
        IndexManifest.epochDir(path, "codes", 0), "overwrite")
      import spark.implicits._
      Seq(mse.getOrElse(0.0)).toDF("mse")
        .write.mode("overwrite").parquet(s"$path/recon")
      IndexManifest.publish(spark, path, 0)
    } finally e.unpersist(blocking = false)
  }

  /** Encode new vectors under the FROZEN codebooks, append to the
    * code file, emit the reconstruction drift gauge.
    *
    * Publish is atomic via [[IndexManifest]] (Bm25Index's note): the
    * batch stages an immutable `codes/epoch=N` directory and one
    * manifest CAS makes it visible — a concurrent probe sees the code
    * file before or after the batch, never partially. A pre-manifest
    * on-disk layout keeps its raw-dir append semantics.
    */
  def append(spark: SparkSession, embeddings: DataFrame, path: String): Drift = {
    graft.functions.VectorOps.register(spark)
    val cb = broadcast(spark.read.parquet(s"$path/codebooks"))
    val e = normalized(embeddings).persist()
    try {
      val mse = IndexManifest.visibleEpochs(spark, path) match {
        case Some(_) =>
          val ep = IndexManifest.nextEpoch(spark, path, Seq("codes"))
          val m = writeCodes(encoded(e, cb),
            IndexManifest.epochDir(path, "codes", ep), "errorifexists")
          IndexManifest.publish(spark, path, ep)
          m
        case None =>
          writeCodes(encoded(e, cb), s"$path/codes", "append")
      }
      val buildMse = spark.read.parquet(s"$path/recon").head().getDouble(0)
      val drift = mse match {
        case None => Drift(0.0)
        case Some(b) if buildMse == 0.0 =>
          Drift(if (b == 0.0) 0.0 else Double.PositiveInfinity)
        case Some(b) => Drift(math.abs(b / buildMse - 1.0))
      }
      import spark.implicits._
      Seq(drift.mseDrift).toDF("mse_drift")
        .write.mode("append").parquet(s"$path/drift")
      drift
    } finally e.unpersist(blocking = false)
  }

  /** Compact the code file's visible epochs into one fresh epoch
    * (Bm25Index.compact's contract) — the PQ scan is
    * bandwidth-bound, so collapsing per-append small files back into
    * full-size code files is exactly the maintenance the layout's
    * read path wants. Atomic flip; [[vacuum]] reclaims.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val view = IndexManifest.visibleEpochs(spark, path)
    require(view.isDefined, s"compact requires the epoch layout: $path")
    if (view.get.size <= 1) return
    val e = IndexManifest.nextEpoch(spark, path, Seq("codes"))
    IndexManifest.readTableAt(spark, path, "codes", view).get
      .write.mode("errorifexists")
      .parquet(IndexManifest.epochDir(path, "codes", e))
    IndexManifest.publishReplacing(spark, path, e)
  }

  def vacuum(spark: SparkSession, path: String): Int =
    IndexManifest.vacuum(spark, path, Seq("codes"))

  /** ADC top-k for a batch of queries (query_id, embedding). The
    * corpus-sized scan reads ONLY the code file; the per-query lookup
    * table (PqM·PqCodes rows each) and the codebooks broadcast. With
    * `rescoreWith` (a (vec_id, embedding) table — the original
    * vectors, stored wherever the lake keeps them), the ADC ranking
    * becomes a PqCandFactor·k candidate cut and survivors get exact
    * cosine scores — full vectors are fetched for candidates only.
    */
  def probeBatch(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, rescoreWith: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.register(spark)
    val cb = broadcast(spark.read.parquet(s"$path/codebooks"))
    val q = queries
      .select(col("query_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("qn", sqrt(expr("vec_dot(v, v)")))
      .filter(col("qn") > 0)
    val qsv = graft.queries.Similarity.subvectors(
      q.select(col("query_id").as("vec_id"), col("v")))
    // the ADC lookup table: micro-unit-quantized so the per-item sum
    // of PqM entries is exact integer arithmetic (xs9's discipline)
    val qtable = qsv.join(cb, "m")
      .select(col("vec_id").as("query_id"), col("m"), col("code"),
        (round(expr("vec_dot(sv, cv)"), 6) * 1e6).cast("long").as("t"))
    val codes = IndexManifest.readTable(spark, path, "codes")
      .getOrElse(sys.error(s"no PQ code file at $path"))
      .select(col("vec_id"), col("nrm"),
        posexplode(col("codes")).as(Seq("m", "code")))
      .select(col("vec_id"), col("nrm"), col("m"), col("code").cast("int").as("code"))
    val approx = codes
      .join(broadcast(qtable), Seq("m", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg((sum(col("t")) / 1e6).as("adot"), first(col("nrm")).as("nrm"))
      .join(broadcast(q.select(col("query_id"), col("qn"))), "query_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (col("adot") / (col("qn") * col("nrm"))).as("ascore"))
    val wA = Window.partitionBy("query_id")
      .orderBy(col("ascore").desc, col("neighbor_id").asc)
    rescoreWith match {
      case None =>
        approx
          .withColumn("rn", row_number().over(wA))
          .filter(col("rn") <= k)
          .select(col("query_id"), col("neighbor_id"),
            round(col("ascore"), 4).as("score"))
      case Some(vectors) =>
        val cand = approx
          .withColumn("rn", row_number().over(wA))
          .filter(col("rn") <= k * graft.queries.Similarity.PqCandFactor)
          .select("query_id", "neighbor_id")
        val vb = normalized(vectors)
          .select(col("vec_id").as("neighbor_id"),
            col("v").as("vb"), col("nrm").as("nb"))
        val va = q.select(col("query_id"), col("v").as("va"), col("qn"))
        cand
          .join(broadcast(va), "query_id")
          .join(vb, "neighbor_id")
          .select(col("query_id"), col("neighbor_id"),
            round(expr("vec_dot(va, vb)") / (col("qn") * col("nb")), 4).as("score"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("query_id")
              .orderBy(col("score").desc, col("neighbor_id").asc)))
          .filter(col("rn") <= k)
          .select("query_id", "neighbor_id", "score")
    }
  }

  /** Micro-batched serving over the code file — AnnIndex.serve's
    * idempotent per-batch-directory pattern over the PQ layout.
    */
  def serve(queries: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, k: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        probeBatch(df.sparkSession, indexPath, df, k)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
