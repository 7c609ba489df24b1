package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming counterparts of the batch dedup (Q29/QX1) and join
  * operators — the pieces an unbounded ingest pipeline needs beyond
  * windowed aggregation (StreamingWindows).
  *
  * Scale posture: both operators keep per-key state that the watermark
  * bounds. Dedup state is one entry per event id seen within the
  * watermark horizon; join state buffers each side only until the
  * other side's watermark passes the join window. Without those bounds
  * neither operator is runnable on an unbounded stream — with them,
  * state is O(arrival rate × horizon), independent of stream length.
  */
object StreamingOps {

  /** Event shape carrying an explicit id — the dedup/join key. */
  final case class IdEv(ts: java.sql.Timestamp, user_id: Long,
      event_type: String, event_id: Long)

  /** Q29/QX1 streaming form: exact at-most-once emission of each
    * event_id, with dedup state evicted once the 30-min watermark
    * passes — a replayed/duplicated event inside the horizon is
    * dropped, and state cannot grow beyond the horizon's arrivals
    * (dropDuplicates without the watermark variant would keep every id
    * forever).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Exactly-once lake landing on top of at-least-once micro-batches:
    * each batch overwrites ONLY its own batch_id partition (dynamic
    * partition overwrite), so a replayed batch — checkpoint recovery
    * re-delivering the last uncommitted batch — rewrites the same
    * partition instead of appending duplicates. The streaming analog
    * of the ETL layer's idempotent block-bucket overwrite (P14):
    * at-least-once delivery + idempotent writes = effective
    * exactly-once in the lake.
    */
  def writeBatch(df: DataFrame, batchId: Long, path: String): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  def sinkExactlyOnce(events: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch((df: DataFrame, id: Long) => writeBatch(df, id, path))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** STREAM-STATIC incremental dedup — xd6's streaming form: every
    * arriving document is matched against a pre-built static corpus
    * index (Dedup.maskIndex) and emitted once per matching corpus set
    * at J >= threshold, with the corpus set's min doc id as match_id.
    *
    * Entirely STATELESS streaming: the per-row token mask is computed
    * from a <=64-entry vocabulary literal inside the scan projection
    * (no streaming aggregation, no state store, no watermark), and the
    * static index joins as a broadcast — so each micro-batch costs one
    * codegen'd projection plus a broadcast join probe, and a replayed
    * batch reproduces identical output (the mask and the index are both
    * deterministic). Tokens outside the corpus vocabulary cannot
    * intersect any corpus set; they still count in the document's set
    * size, so Jaccard stays exact for out-of-vocabulary content.
    *
    * Corpora beyond 64 vocabulary tokens: run the general verification
    * per micro-batch via foreachBatch + Dedup.crossEdgesGated — batch
    * code reused verbatim, at the cost of a per-batch shuffle.
    */
  def incrementalDedup(docs: DataFrame, index: DataFrame,
      vocab: Seq[String], threshold: Double): DataFrame = {
    require(vocab.size <= 64, "mask form requires a <=64-token vocabulary")
    val vmap = map(vocab.zipWithIndex.flatMap {
      case (t, i) => Seq(lit(t), lit(i)) }: _*)
    val masked = docs
      .withColumn("toks",
        array_distinct(graft.queries.Llm.tokens(docs.sparkSession, col("text"))))
      .withColumn("sz_b", size(col("toks")).cast("long"))
      .withColumn("vmap", vmap)
      .withColumn("mask_b", expr(
        """aggregate(toks, CAST(0 AS BIGINT), (acc, t) ->
          |  acc + CASE WHEN map_contains_key(vmap, t)
          |             THEN shiftleft(CAST(1 AS BIGINT), vmap[t])
          |             ELSE CAST(0 AS BIGINT) END)""".stripMargin))
      .select(col("doc_id"), col("sz_b"), col("mask_b"))
    val inter = bit_count(col("mask_b").bitwiseAND(col("mask")))
    masked.join(broadcast(index),
        inter.cast("double") / (col("sz_b") + col("sz") - inter) >= threshold)
      .select(col("doc_id"), col("min_id").as("match_id"),
        round(inter.cast("double") / (col("sz_b") + col("sz") - inter), 4)
          .as("jaccard"))
  }

  /** Streaming incremental rollup — queries.Aggregates.xi1's streaming
    * form. Each micro-batch reduces to per-(month, status) partial
    * aggregates (count / exact-decimal sum / min / max) and lands in an
    * append-only partial log via the same idempotent batch_id-partition
    * overwrite as sinkExactlyOnce: a replayed batch rewrites its own
    * partition and can never double-count. The report then merges
    * partials at read — sums of sums, min of mins, avg from merged
    * sum÷count — so each order is aggregated exactly once on arrival
    * and the fact stream is never rescanned. State lives in the lake
    * (the partial log), not the state store: the streaming query
    * itself is stateless, and the partial table stays
    * months×statuses-sized regardless of stream length.
    */
  def orderPartials(orders: DataFrame): DataFrame =
    orders
      .withColumn("mon", date_trunc("month", col("o_orderdate")).cast("date"))
      .groupBy("mon", "o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(graft.queries.Det.dec(col("o_totalprice"))).as("s"),
        min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"))

  def rollupSink(orders: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    orders.writeStream
      .foreachBatch((df: DataFrame, id: Long) => writeBatch(orderPartials(df), id, path))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** Merge the partial log into the per-status report — identical
    * arithmetic to xi1's merge stage, so the streamed result is
    * bit-equal to the direct batch aggregation over the same rows.
    */
  def rollupReport(partials: DataFrame): DataFrame =
    partials.groupBy("o_orderstatus")
      .agg(sum(col("n")).as("n_orders"),
        sum(col("s")).cast("double").as("revenue"),
        (sum(col("s")).cast("double") / sum(col("n"))).as("avg_price"),
        min(col("mn")).as("min_price"),
        max(col("mx")).as("max_price"))

  /** Streaming incremental quantiles — queries.Aggregates.xi2's
    * streaming form, same lake-partial architecture as rollupSink:
    * each micro-batch reduces to fixed-width (bin, n) histogram counts
    * and lands in an append-only partial log partitioned by batch_id
    * (idempotent under replay — a re-run batch overwrites its own
    * partition, never double-counts). The report merges bins at read
    * and runs xi2's OWN stage-2 (`Aggregates.quantilesFromHist`), so
    * the streamed quantiles are bit-equal to the direct batch query
    * over the same rows. The log stays bins×batches-sized; the
    * streaming query is stateless.
    */
  def priceHistPartials(orders: DataFrame): DataFrame =
    orders
      .withColumn("bin",
        floor(col("o_totalprice") / graft.queries.Aggregates.QuantileBinWidth)
          .cast("long"))
      .groupBy("bin").agg(count(lit(1)).as("n"))

  def histSink(orders: DataFrame, path: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    orders.writeStream
      .foreachBatch((df: DataFrame, id: Long) => writeBatch(priceHistPartials(df), id, path))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  def quantileReport(partials: DataFrame): DataFrame =
    graft.queries.Det.reap(graft.queries.Aggregates.quantilesFromHist(
      partials.groupBy("bin").agg(sum(col("n")).as("cnt"))))

  /** One (lang, term) token arrival for the streaming sketch. */
  final case class LangTok(lang: String, term: String)

  /** Per-language heavy-hitter snapshot after a micro-batch: `n` =
    * tokens absorbed so far (monotone — the latest snapshot per lang
    * is the one with max n), `top` = current top-k by (est DESC,
    * term ASC).
    */
  final case class LangTops(lang: String, n: Long,
      top: Seq[graft.functions.TermCount])

  /** Streaming heavy hitters — xt8's Misra-Gries sketch maintained as
    * STREAMING STATE: one capacity-`cap` summary per language lives in
    * the state store, each micro-batch folds its tokens in via
    * mapGroupsWithState, and the current top-k is emitted per updated
    * key. Where the rollup/quantile operators keep their state in the
    * LAKE (partial logs, stateless query), here the sketch IS the
    * state — and stays cap-bounded per key by construction, so the
    * state store holds ≤ groups × cap entries no matter how long the
    * stream runs: the property that makes an unbounded top-k stream
    * feasible at all. With cap ≥ the vocabulary the emitted top-k is
    * EXACTLY the batch xt7 answer (HeavyHitterStreamSpec); under
    * pressure the mergeable-MG error bound applies cumulatively.
    */
  def topTermsStream(toks: org.apache.spark.sql.Dataset[LangTok],
      cap: Int, k: Int): org.apache.spark.sql.Dataset[LangTops] = {
    import toks.sparkSession.implicits._
    val sk = new graft.functions.FreqSketch(cap)
    toks.groupByKey(_.lang)
      .mapGroupsWithState[graft.functions.MGBuf, LangTops](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (lang, it, state) =>
          val buf = it.foldLeft(state.getOption.getOrElse(sk.zero)) {
            (b, r) => sk.reduce(b, r.term)
          }
          state.update(buf)
          LangTops(lang, buf.n, sk.finish(buf).take(k))
      }
  }

  /** Stream-stream inner join: each click joined to the SAME USER's
    * view events that happen within the hour after the click. Both
    * sides carry watermarks and the join condition bounds event-time
    * distance in both directions, so each side's buffered state is
    * evicted once the other side's watermark clears the window —
    * the requirement for an unbounded stream-stream join to run with
    * bounded memory.
    */
  def clickThenView(clicks: DataFrame, views: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val v = views.withWatermark("ts", "30 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    c.join(v,
      col("user_id") === col("v_user") &&
        col("view_ts") >= col("click_ts") &&
        col("view_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** One (user, count, exact decimal sum) snapshot per updated key. */
  final case class UserTotals(user_id: Long, n: Long, sum_c: Long)

  /** Running per-user totals via Spark 4's transformWithState — the
    * arbitrary-state API succeeding mapGroupsWithState: typed state
    * handles (ValueState here; List/Map state and timers for richer
    * shapes) live in the RocksDB state store, so per-key state is
    * disk-backed and changelog-checkpointed rather than bounded by
    * executor memory — the state-scale headroom the older API lacks.
    * The sum accumulates in integer CENTS: exact under any arrival
    * order/partitioning, so the stream converges bit-for-bit to the
    * batch groupBy answer (spec'd), matching the engine-wide decimal
    * discipline (Det).
    */
  class RunningTotals
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), UserTotals] {
    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Long)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserTotals] = {
      var (n, s) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { case (_, cents) => n += 1; s += cents }
      state.update((n, s))
      Iterator.single(UserTotals(key, n, s))
    }
  }

  /** events (user_id, value-in-cents) -> running totals stream. */
  def runningTotals(events: org.apache.spark.sql.Dataset[(Long, Long)])
      : org.apache.spark.sql.Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningTotals,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  final case class EvIn(user_id: Long, event_id: Long, tsMicros: Long,
      event_type: String)
  final case class Step(user_id: Long, src: String, dst: String)

  /** Streaming twin of batch xe3 (Markov transition steps): per-user
    * event CHAINING across micro-batch boundaries — the one shape no
    * window can express, because a user's last event of batch N must
    * pair with their first event of batch N+17. State is one
    * (ts, event_id, event_type) triple per user (constant per key, in
    * the RocksDB store); each incoming event emits its (src → dst)
    * step and becomes the new tail.
    *
    * Ordering contract: rows WITHIN a micro-batch reach the processor
    * unordered, so they are sorted by (ts, event_id) per key per batch
    * (bounded by one user's arrivals in one batch, not history);
    * ACROSS batches events are chained in batch-arrival order — with
    * a time-ordered source this converges exactly to the batch query
    * (spec'd); an out-of-order straggler chains from the stored tail,
    * which is arrival-order semantics, the honest behavior of any
    * at-least-once chain without a reordering buffer. Downstream, the
    * step stream feeds the same (src, dst) count/normalize aggregate
    * as the batch form.
    */
  class TransitionChain
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EvIn, Step] {
    @transient private var tail:
        org.apache.spark.sql.streaming.ValueState[(Long, Long, String)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      tail = getHandle.getValueState[(Long, Long, String)]("tail",
        org.apache.spark.sql.Encoders.product[(Long, Long, String)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvIn],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Step] = {
      val sorted = rows.toIndexedSeq.sortBy(e => (e.tsMicros, e.event_id))
      var prev = if (tail.exists()) Some(tail.get()) else None
      val out = IndexedSeq.newBuilder[Step]
      sorted.foreach { e =>
        prev.foreach { case (_, _, src) => out += Step(key, src, e.event_type) }
        prev = Some((e.tsMicros, e.event_id, e.event_type))
      }
      prev.foreach(tail.update)
      out.result().iterator
    }
  }

  /** events -> per-user transition steps stream (append semantics:
    * each step is emitted exactly once).
    */
  def transitionSteps(events: org.apache.spark.sql.Dataset[EvIn])
      : org.apache.spark.sql.Dataset[Step] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TransitionChain,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Attribution input: value in integer CENTS (runningTotals'
    * exactness convention — float revenue would drift per merge order).
    */
  final case class AttrIn(user_id: Long, event_id: Long, tsMicros: Long,
      event_type: String, valueCents: Long)

  /** One attributed purchase: channel = the user's most recent
    * preceding non-purchase event type; latency floored to seconds
    * (xe4's exactness move).
    */
  final case class Attr(user_id: Long, event_id: Long, channel: String,
      valueCents: Long, latencySec: Long)

  /** Streaming twin of batch xe4 (last-touch attribution): the
    * carry-forward "last non-purchase event" lives as one
    * (ts, event_id, type) ValueState per user instead of a window, so
    * a purchase in batch N+17 attributes to a touchpoint from batch N
    * — the cross-boundary credit a per-batch window can never give.
    * Purchases read the state and never write it (consecutive
    * purchases attribute to the same touchpoint — exactly the batch
    * window's ignoreNulls carry-forward semantics); non-purchases
    * replace it. Same ordering contract as TransitionChain: in-batch
    * rows sort by (ts, event_id) per key; across batches,
    * arrival order — converges to batch xe4 on a time-ordered source
    * (spec'd). Each attributed purchase is emitted exactly once;
    * the downstream per-channel aggregate is the batch query's.
    */
  class AttributionChain
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, AttrIn, Attr] {
    @transient private var touch:
        org.apache.spark.sql.streaming.ValueState[(Long, Long, String)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      touch = getHandle.getValueState[(Long, Long, String)]("touch",
        org.apache.spark.sql.Encoders.product[(Long, Long, String)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[AttrIn],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Attr] = {
      val sorted = rows.toIndexedSeq.sortBy(e => (e.tsMicros, e.event_id))
      var last = if (touch.exists()) Some(touch.get()) else None
      val out = IndexedSeq.newBuilder[Attr]
      sorted.foreach { e =>
        if (e.event_type == "purchase")
          last.foreach { case (srcTs, _, srcType) =>
            out += Attr(key, e.event_id, srcType, e.valueCents,
              (e.tsMicros - srcTs) / 1000000L)
          }
        else last = Some((e.tsMicros, e.event_id, e.event_type))
      }
      last.foreach(touch.update)
      out.result().iterator
    }
  }

  /** events -> attributed purchases stream (exactly-once per purchase). */
  def attributedPurchases(events: org.apache.spark.sql.Dataset[AttrIn])
      : org.apache.spark.sql.Dataset[Attr] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new AttributionChain,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** Trailing-window input/output (value in integer cents — the
    * runningTotals exactness convention).
    */
  final case class TrailIn(user_id: Long, event_id: Long, tsMicros: Long,
      valueCents: Long)
  final case class Trail(user_id: Long, event_id: Long, tsMicros: Long,
      n1h: Long, valCents1h: Long)

  /** Streaming twin of batch q16c (per-event trailing-hour activity):
    * every event is emitted with the count and exact cents-sum of its
    * user's events in [ts-1h, ts] — the per-row anchored window no
    * tumbling/sliding grid expresses, and in streaming form the
    * rate-counter primitive (fraud velocity checks, per-user rate
    * limits). State is ONE ListState buffer per user holding only the
    * trailing hour's (ts, cents) pairs — evicted as each event
    * arrives, so state is bounded by a user's one-hour event rate,
    * not history. Frame boundary matches q16c exactly (RANGE ...
    * 3600000000 PRECEDING is inclusive: evict strictly-older only),
    * and so do TIES: a batch RANGE frame ends at CURRENT ROW's VALUE,
    * so same-timestamp peers include each other — tied rows are
    * processed as one group here and each emits the peer-inclusive
    * count/sum. Same ordering contract as TransitionChain: in-batch
    * rows sort by (ts, event_id) per key; across batches, arrival
    * order — on a source where tied events share a micro-batch this
    * converges exactly to the batch frame (spec'd across boundaries
    * and on ties); a straggler — late OR a tied peer split across
    * batches — counts the buffer as of arrival, the honest
    * at-least-once behavior without a reordering buffer.
    */
  class TrailingWindow
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TrailIn, Trail] {
    private val HourUs = 3600000000L
    @transient private var buf:
        org.apache.spark.sql.streaming.ListState[(Long, Long)] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      buf = getHandle.getListState[(Long, Long)]("trail",
        org.apache.spark.sql.Encoders.product[(Long, Long)],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TrailIn],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Trail] = {
      val sorted = rows.toIndexedSeq.sortBy(e => (e.tsMicros, e.event_id))
      var window = buf.get().toIndexedSeq
      val out = IndexedSeq.newBuilder[Trail]
      var i = 0
      while (i < sorted.length) {
        // tied timestamps form ONE frame group: all peers enter the
        // window first, then every member emits the same inclusive
        // count/sum — the batch RANGE-frame tie semantics
        val ts = sorted(i).tsMicros
        var j = i
        while (j < sorted.length && sorted(j).tsMicros == ts) j += 1
        window = window.filter { case (t, _) => t >= ts - HourUs }
        (i until j).foreach { k =>
          window = window :+ (ts, sorted(k).valueCents)
        }
        val cnt = window.length.toLong
        val cents = window.map(_._2).sum
        (i until j).foreach { k =>
          out += Trail(key, sorted(k).event_id, ts, cnt, cents)
        }
        i = j
      }
      buf.put(window.toArray)
      out.result().iterator
    }
  }

  /** events -> per-event trailing-hour counters (exactly-once). */
  def trailingHour(events: org.apache.spark.sql.Dataset[TrailIn])
      : org.apache.spark.sql.Dataset[Trail] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TrailingWindow,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  /** One (band_key, doc_id) row per MinHash band of an arriving doc. */
  final case class BandIn(band_key: Long, doc_id: Long)

  /** A near-dup candidate pair surfaced at ingest (doc_a < doc_b). */
  final case class CandPair(doc_a: Long, doc_b: Long)

  /** Per-document MinHash band keys with EXACTLY batch xd1's formulas
    * (same tokenizer, same xxhash64 permutations, same 16-band x 4-row
    * banding — Dedup.NumPerms/BandRows), but at DOC level: streaming
    * has no corpus to compress into distinct-set groups, and identical
    * docs collide on every band anyway. Works on a static frame too —
    * the spec's batch expectation is this same projection self-joined.
    */
  def bandKeys(docs: DataFrame): DataFrame = {
    val perms = graft.queries.Dedup.NumPerms
    val rows = graft.queries.Dedup.BandRows
    docs
      .withColumn("htoks", expr(
        "array_distinct(transform(array_distinct(tokenize(text)), t -> xxhash64(t)))"))
      .withColumn("sig", expr(
        s"""transform(sequence(0, ${perms - 1}),
           |  i -> array_min(transform(htoks, h -> xxhash64(i, h))))""".stripMargin))
      .select(col("doc_id"),
        explode(expr(
          s"transform(sequence(0, ${perms / rows - 1}), " +
            s"b -> xxhash64(b, slice(sig, b * $rows + 1, $rows)))"))
          .as("band_key"))
  }

  /** The LSH band index as STREAMING STATE — dedup-at-ingest: each
    * band key owns the list of doc ids previously seen in that band,
    * and an arriving document immediately emits a candidate pair
    * against every prior member of any band it lands in (including
    * same-micro-batch peers, in doc_id order). This is xd1's
    * candidate generator turned into an online index: the nightly
    * batch pass (xd1/xd6) stays the exact-verification authority;
    * at-ingest the pipeline gets the candidate signal the moment a
    * document arrives, without rescanning the corpus.
    *
    * Scale/state story: state is (band_key -> member ids), total 16
    * ids per document ever ingested — linear in corpus, RocksDB-
    * backed, and shardable by band key (bands are hash-spread by
    * construction). Production would bound it with TTLConfig (dedup
    * against a trailing window) or periodic flush-to-lake compaction
    * of the band index (xd6's static-index form); TTLConfig.NONE here
    * keeps the spec deterministic. Replayed batches re-emit their
    * pairs (at-least-once) but never duplicate state: ids already in
    * the member list are not re-appended.
    */
  class BandIndex
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, BandIn, CandPair] {
    @transient private var members:
        org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[BandIn],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CandPair] = {
      val prior = members.get().toIndexedSeq
      val priorSet = prior.toSet
      val fresh = rows.map(_.doc_id).toIndexedSeq.distinct.sorted
        .filterNot(priorSet)
      val out = IndexedSeq.newBuilder[CandPair]
      var seen = prior
      fresh.foreach { b =>
        seen.foreach { a =>
          if (a != b)
            out += (if (a < b) CandPair(a, b) else CandPair(b, a))
        }
        seen = seen :+ b
      }
      if (fresh.nonEmpty) members.appendList(fresh.toArray)
      out.result().iterator
    }
  }

  /** docs (doc_id, text) -> distinct near-dup candidate pairs, online.
    * The trailing dropDuplicates is itself stateful (a pair found in
    * several bands, or found again on replay, emits once); production
    * would give it a watermark/TTL alongside the band state's.
    */
  def lshCandidates(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    graft.functions.TextOps.register(s)
    import s.implicits._
    bandKeys(docs).as[BandIn]
      .groupByKey(_.band_key)
      .transformWithState(new BandIndex,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
      .toDF()
      .dropDuplicates("doc_a", "doc_b")
  }

  /** One (lang, term, count) arrival from a streamed document. */
  final case class TermArrival(lang: String, term: String, cnt: Long)

  /** Per-language drift snapshot after a micro-batch: `n_terms` =
    * stream-side vocabulary so far, `stream_tokens` = its mass,
    * `js_div` = Jensen-Shannon divergence between the running stream
    * term distribution and the reference profile (xt14's statistic,
    * online). Update semantics: the LAST row per lang is current.
    */
  final case class Drift(lang: String, n_terms: Long, stream_tokens: Long,
      js_div: Double)

  /** xt14's drift monitor ONLINE — the distribution-shift alarm a
    * training pipeline runs against the live ingest stream instead of
    * between snapshots: per language, exact running term counts as
    * MapState (vocabulary-bounded, the xt7/MG-sketch state
    * discipline; a production deployment caps it with the same MG
    * summary or a df floor), and after each micro-batch the JS
    * divergence of the stream-so-far distribution against a FROZEN
    * reference profile (a lake snapshot's (lang, term, cnt) table).
    *
    * Determinism: xt14's fixed-point discipline — each term's JS
    * contribution is quantized to BIGINT (×1e9) before the fold, and
    * integer addition is order-free, so the emitted js_div is
    * identical whatever order the state iterator walks the
    * vocabulary. The reference rides into the processor as plain
    * constructor data (vocabulary-sized, the K-centroids precedent —
    * bounded by vocab, never by corpus).
    */
  class DriftMonitor(reference: Map[String, Map[String, Long]])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, TermArrival, Drift] {
    @transient private var counts:
        org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TermArrival],
        timers: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Drift] = {
      rows.foreach { r =>
        val prev = if (counts.containsKey(r.term)) counts.getValue(r.term) else 0L
        counts.updateValue(r.term, prev + r.cnt)
      }
      val stream = counts.iterator().toIndexedSeq
      val ref = reference.getOrElse(key, Map.empty)
      val totS = stream.map(_._2).sum
      val totR = ref.valuesIterator.sum
      val vocab = (stream.map(_._1) ++ ref.keys).distinct
      val sMap = stream.toMap
      var js9 = 0L
      vocab.foreach { t =>
        val p = if (totS == 0) 0.0 else sMap.getOrElse(t, 0L).toDouble / totS
        val q = if (totR == 0) 0.0 else ref.getOrElse(t, 0L).toDouble / totR
        val m = (p + q) / 2
        val c = (if (p > 0) p * math.log(p / m) else 0.0) +
          (if (q > 0) q * math.log(q / m) else 0.0)
        js9 += math.round(c / 2 * 1e9)
      }
      Iterator.single(
        Drift(key, stream.size.toLong, totS, js9.toDouble / 1e9))
    }
  }

  /** docs (lang, text) + a static reference profile (lang, term, cnt)
    * -> per-language drift stream. The reference collect is
    * vocabulary-sized driver state (documented bound, the centroid
    * precedent), frozen for the life of the query.
    */
  def driftStream(docs: DataFrame, reference: DataFrame)
      : org.apache.spark.sql.Dataset[Drift] = {
    val s = docs.sparkSession
    graft.functions.TextOps.register(s)
    import s.implicits._
    val ref = reference.select(col("lang"), col("term"),
        col("cnt").cast("long"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap }
    docs
      .select(col("lang"),
        explode(expr("term_counts(text)")).as(Seq("term", "tfi")))
      .select(col("lang"), col("term"), col("tfi").cast("long").as("cnt"))
      .as[TermArrival]
      .groupByKey(_.lang)
      .transformWithState(new DriftMonitor(ref),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }
}
