package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A BM25 lexical index persisted as a lake layout — the serving-side
  * counterpart of the xs7 retrieval query, mirroring AnnIndex's
  * contract for the dense arm:
  *
  *  - `build`: one term_counts pass over the corpus writes the SCORED
  *    postings table (term, doc_id, cu) — BM25 is additive over
  *    postings, so the per-(term, doc) micro-unit contribution is the
  *    entire index; queries never re-touch documents. The collection
  *    statistics that parameterized the scores (N, avgdl, per-term df)
  *    are persisted next to it as the frozen model of record.
  *  - `probeBatch`: a query batch (query_id, text) tokenizes to its
  *    distinct terms (map_keys of the fused term_counts kernel — no
  *    explode+distinct), broadcasts against the standing postings on
  *    the term key (size-gated; the corpus-sized side never shuffles),
  *    and per-query sums partial-aggregate into the bounded TopK —
  *    identical ranks to the batch query by construction
  *    (Bm25ServeSpec asserts equality with xs7 on the same split).
  *  - `append`: incremental maintenance under FROZEN collection
  *    statistics — new documents' postings are scored with the stored
  *    (N, avgdl, df), exactly xs5's assign-only fold-in honesty: the
  *    index stays serveable and existing postings stay valid, at the
  *    cost of statistics drift that a periodic `build` re-baseline
  *    clears. Terms unseen at build time enter with df = 1 (the
  *    appending document defines them) and are recorded so later
  *    appends reuse the same df.
  *  - `serve`: foreachBatch over a query stream; every micro-batch
  *    writes an idempotent `batch=<id>` directory (replays rewrite
  *    identical bytes — AnnIndex.serve's contract).
  *
  * At 100 TB the postings table is the sharded inverted index
  * (corpus-linear, narrow rows); probes are query-batch-broadcast
  * joins. `build`/`append` persist per-term score upper bounds
  * (`ubs`: max cu per term — the max-score statistic) next to the
  * postings, and `probeBatch` runs the max-score PRUNED probe
  * (Similarity.bm25TopKPruned): exact top-k, strictly fewer postings
  * rows than full scoring. Appends under frozen stats can raise a
  * term's bound (higher tf, shorter dl), so each append writes its
  * batch's per-term max and readers collapse via max — ub stays a
  * true upper bound across incremental maintenance.
  *
  * Publish is ATOMIC at append granularity via [[IndexManifest]]:
  * build and every append stage an immutable `epoch=N` directory for
  * postings/df/ubs and then CAS-publish ONE manifest version listing
  * the visible epochs — a probe resolves the manifest once and reads
  * exactly those directories, so it sees the index entirely before or
  * entirely after an append, never a subset of an in-flight batch and
  * never postings without their matching ubs (IndexPublishSpec).
  * Pre-manifest (r10) indexes on disk keep their raw-dir read/append
  * semantics; a missing `ubs` sidecar on such an index degrades to
  * deriving the bounds from the postings instead of failing the probe.
  */
object Bm25Index {

  // the contribution expression and tokenize projection are the batch
  // queries' own definitions (Similarity.CuSql / tfTable) — shared so
  // a parameter change cannot desynchronize index from query
  private def cuCol = expr(graft.queries.Similarity.CuSql)

  private def tfOf(s: SparkSession, docs: DataFrame): DataFrame =
    graft.queries.Similarity.tfTable(s, docs)

  private val Tables = Seq("postings", "df", "ubs")

  def build(s: SparkSession, docs: DataFrame, path: String): Unit = {
    // rebuild contract: a build REPLACES the index (v1 semantics were
    // a destructive overwrite too). Clear the epoch tables + manifest
    // so stale epochs can't leak into the fresh index's view; drift
    // history is deliberately retained.
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(s.sparkContext.hadoopConfiguration)
    (Tables :+ "manifests").foreach { t =>
      fs.delete(new org.apache.hadoop.fs.Path(hp, t), true) }
    val tf = tfOf(s, docs).persist()
    try {
      val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val stats = dl.agg(count(lit(1)).as("n"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val p0 = IndexManifest.epochDir(path, "postings", 0)
      tf.join(graft.queries.Scale.maybeBroadcast(dfT), "term")
        .join(graft.queries.Scale.maybeBroadcast(dl), "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("term"), col("doc_id"), cuCol.as("cu"))
        .write.mode("overwrite").parquet(p0)
      dfT.write.mode("overwrite")
        .parquet(IndexManifest.epochDir(path, "df", 0))
      stats.write.mode("overwrite").parquet(s"$path/stats")
      // per-term max cu — the max-score pruning statistic; computed
      // from the narrow written postings (one scan, vocabulary-sized)
      graft.queries.Similarity.termUbs(s.read.parquet(p0))
        .write.mode("overwrite")
        .parquet(IndexManifest.epochDir(path, "ubs", 0))
      IndexManifest.publish(s, path, 0)
    } finally tf.unpersist(blocking = false)
  }

  /** Statistics drift of one appended batch vs the FROZEN collection
    * model — the "re-baseline now" gauge frozen-stats maintenance
    * otherwise lacks (xs5's IVF fold-in emits mean-squared-distance
    * drift; this is the lexical analog). All three signals are exactly
    * 0 when the appended batch replays the build corpus and move when
    * the vocabulary or document-length profile shifts:
    *  - dfTvDrift: total-variation distance (0.5·L1, bounded [0,1])
    *    between the batch's per-term df SHARE distribution and the
    *    frozen one, over the union vocabulary — no smoothing needed.
    *  - oovMass: fraction of the batch's df mass on terms the frozen
    *    model has never seen.
    *  - avgdlDrift: |batch avgdl / frozen avgdl − 1|.
    * Appended as a row to `path/drift` so a maintenance loop can
    * threshold the history without re-reading the corpus.
    */
  final case class Drift(dfTvDrift: Double, oovMass: Double,
      avgdlDrift: Double) {
    /** Re-baseline (full `build`) when ANY signal leaves the frozen
      * model's regime. Per-signal thresholds split the measured
      * separations (Bm25ServeSpec: replay = 0 on all three; a
      * disjoint-vocabulary batch measures tv > 0.3, oov > 0.9,
      * avgdl > 0.5) with ≥2× margin: tv 0.15, oov 0.10, avgdl 0.25.
      * Loop shape: `if (append(...).needsRebaseline) build(...)` —
      * appends keep serving under the frozen stats meanwhile.
      */
    def needsRebaseline: Boolean =
      dfTvDrift > 0.15 || oovMass > 0.10 || avgdlDrift > 0.25
  }

  /** Fold new documents in against the FROZEN statistics (df rows for
    * genuinely new terms are appended with df = 1 so later appends and
    * probes stay consistent; duplicate df rows from concurrent appends
    * collapse via max on read). Returns the batch's [[Drift]] gauge.
    */
  def append(s: SparkSession, docs: DataFrame, path: String): Drift = {
    val tf = tfOf(s, docs).persist()
    try {
      // zero-token batch: nothing to score, nothing to publish — and
      // the drift aggregates below would be 0/0 nulls (the NPE the
      // r10 version had; AnnIndex/PqIndex already mapped the empty
      // batch to a zero gauge)
      if (tf.isEmpty) return Drift(0.0, 0.0, 0.0)
      val frozenDf = IndexManifest.readTable(s, path, "df")
        .getOrElse(sys.error(s"no BM25 index df table at $path"))
        .groupBy("term").agg(max(col("df")).as("df"))
      val stats = s.read.parquet(s"$path/stats")
      val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      // computed once, consumed by BOTH writes (postings + df): the
      // frozen-df scan and anti-join would otherwise run twice
      val newTerms = tf.select("term").distinct()
        .join(frozenDf, Seq("term"), "left_anti")
        .select(col("term"), lit(1L).as("df"))
        .persist()
      val scored = tf.join(graft.queries.Scale.maybeBroadcast(
          frozenDf.unionByName(newTerms)), "term")
        .join(graft.queries.Scale.maybeBroadcast(dl), "doc_id")
        .crossJoin(broadcast(stats))
        .select(col("term"), col("doc_id"), cuCol.as("cu"))
        .persist()
      try {
        // drift gauge FIRST: frozenDf lazily re-reads path/df on every
        // action, so these aggregates must run before the df append
        // below makes this batch's new terms look "already known".
        // Vocabulary-sized aggregates only (batch df vs frozen df
        // shares + one avgdl scalar), never the corpus.
        val batchDf = tf.groupBy("term").agg(count(lit(1)).as("bdf"))
        val shares = batchDf.join(frozenDf, Seq("term"), "full_outer")
          .agg(
            (sum(when(col("df").isNull, col("bdf")).otherwise(lit(0L)))
              .cast("double") / sum(coalesce(col("bdf"), lit(0L))))
              .as("oov"),
            sum(coalesce(col("bdf"), lit(0L))).as("btot"),
            sum(coalesce(col("df"), lit(0L))).as("ftot"))
          .head
        val (oov, btot, ftot) =
          (shares.getDouble(0), shares.getLong(1), shares.getLong(2))
        val tv = batchDf.join(frozenDf, Seq("term"), "full_outer")
          .select(abs(
            coalesce(col("bdf"), lit(0L)).cast("double") / lit(btot.toDouble) -
              coalesce(col("df"), lit(0L)).cast("double") / lit(ftot.toDouble))
            .as("d"))
          .agg((sum(col("d")) / 2.0).as("tv")).head.getDouble(0)
        val frozenAvgdl = stats.select("avgdl").head.getDouble(0)
        val batchAvgdl = dl.agg(
          (sum(col("dl")).cast("double") / count(lit(1))).as("a"))
          .head.getDouble(0)
        val drift = Drift(tv, oov,
          math.abs(batchAvgdl / frozenAvgdl - 1.0))
        IndexManifest.visibleEpochs(s, path) match {
          case Some(_) =>
            // v2: stage an immutable epoch for all three tables, then
            // ONE atomic publish — concurrent probes see the index
            // before or after this batch, never a subset of it.
            // errorIfExists on the stage dirs makes a concurrent
            // appender fail fast instead of interleaving files.
            val e = IndexManifest.nextEpoch(s, path, Tables)
            scored.write.mode("errorifexists")
              .parquet(IndexManifest.epochDir(path, "postings", e))
            newTerms.write.mode("errorifexists")
              .parquet(IndexManifest.epochDir(path, "df", e))
            // this batch's per-term max keeps ubs a true upper bound:
            // frozen-stats scoring can exceed the build-time bound
            graft.queries.Similarity.termUbs(scored)
              .write.mode("errorifexists")
              .parquet(IndexManifest.epochDir(path, "ubs", e))
            IndexManifest.publish(s, path, e)
          case None =>
            // pre-manifest (r10) on-disk layout: keep its raw-dir
            // append semantics (documented torn-read window) instead
            // of mixing layouts inside one table
            scored.write.mode("append").parquet(s"$path/postings")
            newTerms.write.mode("append").parquet(s"$path/df")
            graft.queries.Similarity.termUbs(scored)
              .write.mode("append").parquet(s"$path/ubs")
        }
        import s.implicits._
        Seq((drift.dfTvDrift, drift.oovMass, drift.avgdlDrift))
          .toDF("df_tv_drift", "oov_mass", "avgdl_drift")
          .write.mode("append").parquet(s"$path/drift")
        drift
      } finally {
        scored.unpersist(blocking = false)
        newTerms.unpersist(blocking = false)
      }
    } finally tf.unpersist(blocking = false)
  }

  /** Epoch maintenance: every append adds an epoch directory, so a
    * long-lived index's reads fan out over one dir per batch. Compact
    * rewrites the CURRENT view into one fresh epoch — postings as-is,
    * df/ubs with their cross-epoch max collapse MATERIALIZED (probes
    * after compaction skip the collapse aggregate entirely) — and
    * publishes it as the sole visible epoch in one manifest CAS;
    * concurrent probes flip atomically, readers pinned to the old view
    * keep working off the superseded dirs until [[vacuum]] removes
    * them. Same single-maintainer contract as append.
    */
  def compact(s: SparkSession, path: String): Unit = {
    val view = IndexManifest.visibleEpochs(s, path)
    require(view.isDefined, s"compact requires the epoch layout: $path")
    if (view.get.size <= 1) return // nothing to merge
    val e = IndexManifest.nextEpoch(s, path, Tables)
    IndexManifest.readTableAt(s, path, "postings", view).get
      .write.mode("errorifexists")
      .parquet(IndexManifest.epochDir(path, "postings", e))
    IndexManifest.readTableAt(s, path, "df", view).get
      .groupBy("term").agg(max(col("df")).as("df"))
      .write.mode("errorifexists")
      .parquet(IndexManifest.epochDir(path, "df", e))
    IndexManifest.readTableAt(s, path, "ubs", view).get
      .groupBy("term").agg(max(col("ub")).as("ub"))
      .write.mode("errorifexists")
      .parquet(IndexManifest.epochDir(path, "ubs", e))
    IndexManifest.publishReplacing(s, path, e)
  }

  /** Remove epoch directories no longer reachable from the current
    * manifest (compaction garbage, crashed-append orphans). Returns
    * the deleted directory count.
    */
  def vacuum(s: SparkSession, path: String): Int =
    IndexManifest.vacuum(s, path, Tables)

  /** Top-k BM25 per query of the batch against the standing postings,
    * via the max-score PRUNED probe (exact top-k; common terms' huge
    * posting lists are read only for surviving candidates). Duplicate
    * ub rows from appends collapse via max on read.
    * Output: (query_id, doc_id, rank, score_micro).
    */
  def probeBatch(s: SparkSession, path: String, queries: DataFrame,
      k: Int): DataFrame = graft.queries.Det.reap {
    // reap: the pruned probe persists its query-batch-sized phase
    // frames (qts/qmeta/cand); scoping them here frees the blocks per
    // probe call, so the per-micro-batch `serve` loop cannot
    // accumulate caches across batches. The reap's eager checkpoint
    // materializes only the (queries x k)-row result.
    val qt = queries.select(col("query_id"),
      explode(map_keys(graft.queries.Llm.termCounts(s, col("text")))).as("term"))
    // one manifest resolution backs BOTH table reads, so postings and
    // ubs always come from the same published version
    val view = IndexManifest.visibleEpochs(s, path)
    val postings = IndexManifest.readTableAt(s, path, "postings", view)
      .getOrElse(sys.error(s"no BM25 index postings at $path"))
    val ubs = IndexManifest.readTableAt(s, path, "ubs", view) match {
      case Some(u) => u.groupBy("term").agg(max(col("ub")).as("ub"))
      case None =>
        // pre-ubs (r9) on-disk index: derive the bounds from the
        // postings instead of failing the probe with PATH_NOT_FOUND
        graft.queries.Similarity.termUbs(postings)
    }
    graft.queries.Similarity.bm25TopKPruned(
      postings, ubs, qt, "query_id", k)
  }

  /** Streaming serving loop: micro-batches of (query_id, text) probe
    * the standing index; `batch=<id>` output dirs are idempotent under
    * replay.
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
