package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Dedup-at-ingest into the exactly-once lake — the composition a
  * training-data pipeline actually runs on every crawl increment:
  *
  *   batch → intra-batch exact-set dedup → near-dup match against the
  *   CURRENT lake corpus (J >= threshold) → survivors appended
  *   exactly-once (Snapshot.commitAppendOnce) → everything else lands
  *   in an idempotent per-batch quarantine with its reason and match.
  *
  * Semantics per batch group (one distinct token set):
  *   - group matches some corpus set at J >= t → EVERY member
  *     quarantines as `corpus_dup` with the best corpus match
  *     (highest rounded J, ties to the lowest corpus doc id);
  *   - otherwise the group's min doc id appends, remaining members
  *     quarantine as `batch_dup` pointing at the keeper.
  *
  * Exactly-once discipline: the lake append carries the (streamId,
  * batchId) transaction marker — a replayed micro-batch appends
  * nothing — and the quarantine writes OVERWRITE into a
  * `batch=<id>` directory, so a replay rewrites identical bytes
  * instead of duplicating rows. The corpus match re-derives the
  * corpus group table per batch, honest for a demo-scale corpus;
  * production keeps the index as its own maintained lake table
  * (Dedup.maskIndex / xd6's shape) and this operator's contract
  * doesn't change.
  *
  * Scale shape: the batch side is small by nature (one increment);
  * the corpus side shuffles only its distinct token sets; the
  * bipartite edge join (Dedup.crossEdgesGeneral) is linear in
  * sum-of-set-sizes — corpus × corpus pairs are never generated.
  */
object DedupIngest {

  /** Outcome of one micro-batch, for the caller's ops counters. */
  final case class BatchReport(appended: Long, quarantined: Long,
      version: Option[Long])

  def ingestBatch(batch: DataFrame, batchId: Long, streamId: String,
      lakePath: String, quarantinePath: String,
      threshold: Double = 0.8): BatchReport = {
    val s = batch.sparkSession
    // replay probe FIRST: after the original commit the lake already
    // holds this batch's survivors, so recomputing the match would see
    // the batch matching ITSELF (and rewrite a different quarantine).
    // The lake marker is the single source of truth for "this batch
    // happened"; a replay skips every side effect.
    if (Snapshot.lastCommittedBatch(lakePath, streamId).exists(_ >= batchId))
      return BatchReport(0L, 0L, None)
    val bg = Dedup.setGroups(batch.select(col("doc_id"), col("text")))
    // ONLY the missing-table signal means "no corpus yet". Any other
    // failure (a transient FS/listing error during version resolution,
    // a corrupt manifest) must FAIL the batch so the stream retries —
    // treating it as an empty corpus would append real corpus dups,
    // permanent duplicates in an exactly-once lake.
    val cgOpt =
      (try Some(Snapshot.read(s, lakePath).select(col("doc_id"), col("text")))
      catch {
        case e: IllegalStateException
            if e.getMessage != null &&
              e.getMessage.startsWith("no snapshot versions") => None
      }).map(Dedup.setGroups)
    var tagged: DataFrame = null
    try {
      // best corpus match per batch group, if a corpus exists
      val corpusMatch: DataFrame = cgOpt match {
        case Some(cg) =>
          val ga = cg.select(col("gid").as("gid_a"), col("htoks").as("h_a"),
            col("sz").as("sa"), element_at(col("ids"), 1).as("min_a"))
          val gb = bg.select(col("gid").as("gid_b"), col("htoks").as("h_b"),
            col("sz").as("sb"))
          Dedup.crossEdgesGeneral(ga, gb, threshold)
            .join(ga.select(col("gid_a"), col("min_a")), "gid_a")
            .groupBy("gid_b")
            .agg(max(struct(col("jaccard"), (-col("min_a")).as("neg")))
              .as("best"))
            .select(col("gid_b").as("gid"),
              (-col("best.neg")).as("corpus_match"))
        case None =>
          import s.implicits._
          Seq.empty[(Long, Long)].toDF("gid", "corpus_match")
      }
      // persisted: the quarantine write, the keeper append, and both
      // report counts all read this one-row-per-group table — without
      // the persist each action replans the whole corpus-match join
      // (batch re-read + crossEdgesGeneral, measured up to 2 extra
      // executions per micro-batch just for the counts)
      tagged = bg.join(corpusMatch, Seq("gid"), "left_outer")
        .select(col("gid"), col("ids"), col("corpus_match"))
        .persist()

      val corpusDup = tagged.filter(col("corpus_match").isNotNull)
        .select(explode(col("ids")).as("doc_id"),
          col("corpus_match").as("match_id"), lit("corpus_dup").as("reason"))
      val batchDup = tagged.filter(col("corpus_match").isNull)
        .select(element_at(col("ids"), 1).as("match_id"),
          explode(expr("slice(ids, 2, size(ids))")).as("doc_id"))
        .select(col("doc_id"), col("match_id"), lit("batch_dup").as("reason"))
      val quarantined = corpusDup.unionByName(batchDup)
      // idempotent quarantine: a replayed batch overwrites its own dir
      quarantined.write.mode("overwrite")
        .parquet(s"$quarantinePath/batch=$batchId")

      val keepers = tagged.filter(col("corpus_match").isNull)
        .select(element_at(col("ids"), 1).as("doc_id"))
      val clean = batch.join(keepers, Seq("doc_id"), "left_semi")
      val version = Snapshot.commitAppendOnce(clean, lakePath,
        streamId, batchId)
      // appended counts the rows actually committed (clean replans
      // only the batch scan + semi join against the PERSISTED group
      // table — never the corpus match), so a micro-batch carrying
      // duplicate doc_id rows reports what really landed instead of
      // one-per-keeper-group; quarantined reads the persisted table
      BatchReport(clean.count(), quarantined.count(), version)
    } finally {
      bg.unpersist()
      cgOpt.foreach(_.unpersist())
      if (tagged != null) tagged.unpersist()
    }
  }

  /** Streaming entry: docs (doc_id, text, ...) → the lake, deduped. */
  def sink(docs: DataFrame, streamId: String, lakePath: String,
      quarantinePath: String, checkpoint: String,
      threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (df: DataFrame, id: Long) =>
        ingestBatch(df, id, streamId, lakePath, quarantinePath, threshold)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
