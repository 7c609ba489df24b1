package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The IVF index AS A LAKE LAYOUT — xs2's cell assignment persisted as
  * cell-partitioned parquet, so that at probe time the cell filter is
  * a PARTITION filter and Spark plans only the probed cells'
  * directories. This is the claim xs2's doc makes ("at 100 TB the
  * cell assignment becomes the partitioning key, so a probe reads
  * only its cells' files") turned into an actual on-disk operator
  * with an executed-plan proof (AnnIndexSpec counts the scan's
  * planned files): probe I/O scales with NProbe/Cells of the corpus,
  * not the corpus.
  *
  * Layout under `path`:
  *   centroids/           K rows (cid, cv, cnrm2) — the routing table
  *   cells/epoch=E/cid=N/ the inverted file: (vec_id, v, nrm) of cell
  *                        N as of build (E=0) or append batch E, made
  *                        visible atomically via IndexManifest
  *   manifests/vNNNNN.txt the visible-epoch manifest (see IndexManifest)
  *
  * Build trains xs2's deterministic k-means (lowest-xxhash init,
  * fixed Lloyd iterations, rounded re-centers) and writes each
  * vector into its nearest-centroid partition. `append` folds new
  * vectors in ASSIGN-ONLY (xs5's maintenance contract: centroids
  * frozen, new files land inside existing cell directories) — the
  * index stays serveable during growth, retrain is a rebuild.
  */
object AnnIndex {

  /** Normalize raw embeddings to the (vec_id, v, nrm) working shape.
    * Zero-norm vectors are EXCLUDED at the door: a zero vector has no
    * direction, so its cosine against anything is 0/0 = NaN — and
    * Spark's descending sort ranks NaN above every real number, so a
    * single zero vector in a probed cell would hijack the top-k.
    */
  private def normalized(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
      .filter(col("nrm") > 0)

  /** Assignment-quality drift of one appended batch vs the BUILD-time
    * baseline — the "re-baseline now" gauge for assign-only
    * maintenance (Bm25Index.Drift's dense sibling, and the persisted
    * form of xs5's fold-in signal): msdDrift = |batch mean squared
    * distance to the assigned (frozen) centroid / build-time mean − 1|.
    * Exactly 0 when the appended batch replays the build corpus;
    * grows as new vectors land far from every frozen centroid — the
    * signal that the frozen partitioning no longer fits the data and
    * a retrain-rebuild is due. History appends to `path/drift`.
    */
  final case class Drift(msdDrift: Double) {
    /** The maintenance loop's decision: re-baseline (retrain-rebuild)
      * when the batch's assignment quality has left the frozen
      * centroids' regime. Threshold 0.25 splits the measured
      * separation — replay of the build corpus drifts < 1e-12 while a
      * scaled+offset distribution shift measures > 0.5 (AnnIndexSpec)
      * — with 2× margin on either side.
      */
    def needsRebaseline: Boolean = msdDrift > AnnIndex.RebaselineThreshold
  }

  /** See [[Drift.needsRebaseline]]; the loop itself is
    * `if (append(...).needsRebaseline) build(...)` — append keeps the
    * index serveable meanwhile (frozen centroids stay valid), so the
    * rebuild is a background republish, not an outage.
    */
  val RebaselineThreshold = 0.25

  private def msdOf(ranked: DataFrame): Option[Double] =
    ranked.agg(avg(col("dist") + col("nrm") * col("nrm")).as("msd"))
      .head() match {
        case r if r.isNullAt(0) => None
        case r => Some(r.getDouble(0))
      }

  /** Train centroids on `embeddings` and write the full index.
    * Cells land in an `epoch=0` directory published through
    * [[IndexManifest]] (atomic append visibility — see Bm25Index's
    * publish note); rebuild clears prior epochs + manifest first.
    */
  def build(spark: SparkSession, embeddings: DataFrame, path: String): Unit = {
    graft.functions.VectorOps.register(spark)
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("cells", "manifests").foreach { t =>
      fs.delete(new org.apache.hadoop.fs.Path(hp, t), true) }
    val e = normalized(embeddings)
    val centroids = graft.queries.Similarity.trainCentroids(e)
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    val ranked = graft.queries.Similarity.rankAgainst(e, centroids)
      .filter(col("rn") === 1)
      .persist()
    try {
      ranked.select(col("cid"), col("vec_id"), col("v"), col("nrm"))
        .write.mode("overwrite").partitionBy("cid")
        .parquet(IndexManifest.epochDir(path, "cells", 0))
      // build-time assignment-quality baseline for append drift
      import spark.implicits._
      Seq(msdOf(ranked).getOrElse(0.0)).toDF("msd")
        .write.mode("overwrite").parquet(s"$path/msd")
      IndexManifest.publish(spark, path, 0)
    } finally ranked.unpersist(blocking = false)
  }

  /** Assign-only fold-in of new vectors against the FROZEN centroid
    * table (xs5's maintenance semantics): new files append inside
    * their cells' directories; no existing file is touched. Returns
    * the batch's [[Drift]] gauge.
    */
  def append(spark: SparkSession, embeddings: DataFrame, path: String): Drift = {
    graft.functions.VectorOps.register(spark)
    val centroids = broadcast(spark.read.parquet(s"$path/centroids"))
    val ranked = graft.queries.Similarity
      .rankAgainst(normalized(embeddings), centroids)
      .filter(col("rn") === 1)
      .persist()
    try {
      IndexManifest.visibleEpochs(spark, path) match {
        case Some(_) =>
          val e = IndexManifest.nextEpoch(spark, path, Seq("cells"))
          ranked.select(col("cid"), col("vec_id"), col("v"), col("nrm"))
            .write.mode("errorifexists").partitionBy("cid")
            .parquet(IndexManifest.epochDir(path, "cells", e))
          IndexManifest.publish(spark, path, e)
        case None =>
          // pre-manifest layout on disk: keep raw-dir append semantics
          ranked.select(col("cid"), col("vec_id"), col("v"), col("nrm"))
            .write.mode("append").partitionBy("cid")
            .parquet(s"$path/cells")
      }
      // an index persisted before the drift gauge existed has no msd
      // baseline — establish it from this batch (drift 0) instead of
      // failing the append with PATH_NOT_FOUND
      val msdPath = new org.apache.hadoop.fs.Path(s"$path/msd")
      val msdFs = msdPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val buildMsd =
        if (msdFs.exists(msdPath))
          spark.read.parquet(s"$path/msd").head().getDouble(0)
        else {
          val b = msdOf(ranked).getOrElse(0.0)
          import spark.implicits._
          Seq(b).toDF("msd").write.mode("overwrite").parquet(s"$path/msd")
          b
        }
      val drift = msdOf(ranked) match {
        case None => Drift(0.0) // empty batch: nothing to signal
        case Some(b) if buildMsd == 0.0 =>
          Drift(if (b == 0.0) 0.0 else Double.PositiveInfinity)
        case Some(b) => Drift(math.abs(b / buildMsd - 1.0))
      }
      import spark.implicits._
      Seq(drift.msdDrift).toDF("msd_drift")
        .write.mode("append").parquet(s"$path/drift")
      drift
    } finally ranked.unpersist(blocking = false)
  }

  /** Compact the cell table's visible epochs into one fresh epoch
    * (Bm25Index.compact's contract): every append lands small files
    * inside per-epoch cell dirs, so compaction both collapses the
    * epoch fan-out AND re-clusters each cell's vectors into full-size
    * files. Atomic flip via publishReplacing; [[vacuum]] reclaims the
    * superseded dirs.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val view = IndexManifest.visibleEpochs(spark, path)
    require(view.isDefined, s"compact requires the epoch layout: $path")
    if (view.get.size <= 1) return
    val e = IndexManifest.nextEpoch(spark, path, Seq("cells"))
    IndexManifest.readTableAt(spark, path, "cells", view).get
      .write.mode("errorifexists").partitionBy("cid")
      .parquet(IndexManifest.epochDir(path, "cells", e))
    IndexManifest.publishReplacing(spark, path, e)
  }

  def vacuum(spark: SparkSession, path: String): Int =
    IndexManifest.vacuum(spark, path, Seq("cells"))

  /** The `nprobe` nearest cell ids to a query vector — K driver-side
    * rows of routing math (bounded by the constant K, never the
    * corpus), the same argmin arithmetic the build used.
    */
  def probedCells(spark: SparkSession, path: String,
      query: Array[Double], nprobe: Int): Seq[Int] = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cid"), col("cv"), col("cnrm2")).collect()
    cents.map { r =>
        val cv = r.getSeq[Double](1)
        val dot = cv.iterator.zip(query.iterator).map { case (a, b) => a * b }.sum
        (r.getInt(0), r.getDouble(2) - 2.0 * dot)
      }
      .sortBy { case (cid, dist) => (dist, cid) }
      .take(nprobe).map(_._1).toSeq
  }

  /** Top-k per query for a BATCH of queries (query_id, embedding) —
    * the per-micro-batch core of [[serve]], and the batch form of
    * [[probe]] (identical scoring, rounding, and tie rules, proven
    * equal in AnnServeSpec). Routing runs distributed (each query ×
    * K broadcast centroids, row_number over (dist, cid) — the same
    * argmin/tie arithmetic probedCells applies on the driver); the
    * batch's probed-cell UNION — at most K ids, bounded by the
    * constant K — is collected so the cell read stays a PARTITION
    * filter, and one equi-join on cid scores each query against only
    * its probed cells' vectors.
    */
  def probeBatch(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorOps.register(spark)
    val cents = spark.read.parquet(s"$path/centroids")
    val q = queries
      .select(col("query_id"), col("embedding").cast("array<double>").as("qv"))
      .withColumn("qn", sqrt(expr("vec_dot(qv, qv)")))
      .filter(col("qn") > 0) // zero-norm queries have no direction
    // Routing is a scan-stage argmin over the literal centroid array
    // (the same rankedCells form the build-side assignment uses —
    // bounded by the constant K): per query, sort the K (dist, cid)
    // pairs in-row and explode the first nprobe. The r14 form's
    // crossJoin + row_number window shuffled queries×K rows and
    // needed an eager localCheckpoint so its two consumers wouldn't
    // re-run that shuffle; the narrow projection re-computes for
    // pennies, so the checkpoint (and its block residue) is gone too.
    val ranked = q.select(col("query_id"), col("qv"), col("qn"),
        explode(slice(
          graft.queries.Similarity.rankedCells(
            graft.queries.Similarity.centroidsLitOf(cents), col("qv")),
          1, nprobe)).as("pc"))
      .select(col("query_id"), col("qv"), col("qn"), col("pc.cid").as("cid"))
    val cids = ranked.select("cid").distinct().collect().map(_.getInt(0))
    if (cids.isEmpty)
      // empty THROUGH the input projection so query_id keeps the
      // caller's type — a hardcoded schema would make empty batches
      // write a different parquet type than normal ones
      return q.select(col("query_id"), lit(0L).as("neighbor_id"),
        lit(0.0).as("score")).limit(0)
    val cells = IndexManifest.readTable(spark, path, "cells")
      .getOrElse(sys.error(s"no ANN index cells at $path"))
      .filter(col("cid").isin(cids.toSeq: _*) && col("nrm") > 0)
    ranked.join(cells, "cid")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(expr("vec_dot(v, qv)") / (col("nrm") * col("qn")), 4).as("score"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("neighbor_id").asc)))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "score")
  }

  /** Micro-batched SERVING over the persisted layout — the production
    * shape xs4 models in batch: a standing index on disk, a stream of
    * query vectors, per-batch top-k answers. Each micro-batch probes
    * via [[probeBatch]] (partition-pruned cell reads against FROZEN
    * centroids — `append` can keep folding vectors in underneath) and
    * lands its answers in an IDEMPOTENT per-batch directory, so a
    * replayed batch rewrites identical bytes instead of duplicating
    * results (the quarantine-dir pattern).
    */
  def serve(queries: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, k: Int, nprobe: Int)
      : org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        probeBatch(df.sparkSession, indexPath, df, k, nprobe)
          .write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()

  /** Top-k neighbors of `query` among the probed cells ONLY. The
    * cid filter is a partition filter — AnnIndexSpec asserts the
    * executed scan plans just the probed directories' files.
    */
  def probe(spark: SparkSession, path: String, query: Array[Double],
      k: Int, nprobe: Int): DataFrame = {
    graft.functions.VectorOps.register(spark)
    val probed = probedCells(spark, path, query, nprobe)
    val qv = array(query.map(lit): _*)
    val qn = math.sqrt(query.map(x => x * x).sum)
    require(qn > 0, "cannot probe with a zero-norm query vector")
    // nrm > 0 also re-checked here: build/append exclude zero vectors,
    // but an index dir written by other tooling must not let a NaN
    // score outrank every real neighbor
    val cells = IndexManifest.readTable(spark, path, "cells")
      .getOrElse(sys.error(s"no ANN index cells at $path"))
      .filter(col("cid").isin(probed: _*) && col("nrm") > 0)
    // sort+limit plans TakeOrderedAndProject — per-partition top-k
    // then a k-row driver merge, no single-partition window
    cells
      .withColumn("qv", qv)
      .select(col("vec_id").as("neighbor_id"),
        round(expr("vec_dot(v, qv)") / (col("nrm") * lit(qn)), 4).as("score"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
      .limit(k)
  }
}
