package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Det._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between "raw crawl" and "training mix" — the steps AROUND the dedup
  * family (Dedup/Clusters) and quality scoring (TextAnalysis):
  *
  *  - xc1: deterministic uniform sampling + per-stratum capping (the
  *    "balance the mix" step: cap any one language/source's share).
  *  - xc2: repetition signals (the Gopher/C4-style "is this document
  *    mostly the same line over and over" quality gates).
  *  - xc3: benchmark decontamination (drop training docs that share
  *    n-grams with an evaluation set).
  *  - xc4: pattern redaction with an audit trail (PII-shaped scrubbing
  *    as a deterministic, auditable transform).
  *
  * All four are oracle-checked (DuckDB), which constrains every
  * pseudo-random choice to be an explicit deterministic function of the
  * data — which is exactly what a reproducible 100 TB pipeline wants
  * anyway: re-running the job on the same snapshot must sample the
  * same rows.
  */
object Curation {

  /** Multiplicative hash (Knuth 2^32 golden ratio) as a deterministic
    * per-row "random" draw both engines compute exactly in 64-bit
    * integer arithmetic. No rand(): a re-run, a retry of a failed
    * partition, or a different partitioning must all pick the same
    * rows.
    */
  private[queries] def drawOf(c: org.apache.spark.sql.Column) =
    pmod(c * lit(2654435761L), lit(4294967296L))

  /** xc1: 30% uniform sample, then cap each language's share at 20
    * docs, smallest draws first. Scale shape: the sample is a pure
    * per-row filter in the scan stage (pushdown-friendly, no shuffle,
    * no state); the cap is one ranking window partitioned by stratum —
    * a single shuffle on lang. Stratum skew at 100 TB: the window only
    * ever ranks rows that SURVIVED the sample filter, and a hot
    * stratum can pre-aggregate with a per-partition top-K (see
    * functions.TopK) before the global rank; at fixture scale the
    * plain window is the right plan.
    */
  val xc1 = GQuery(
    "xc1_stratified_sample",
    (s, d) => {
      val c = Ctx(s, d)
      val sampled = c.documents
        .select(col("doc_id"), col("lang"), drawOf(col("doc_id")).as("draw"))
        .filter(col("draw") % 100 < 30)
      val capped = sampled
        .withColumn("rk", row_number()
          .over(Window.partitionBy("lang").orderBy(col("draw"), col("doc_id")))
          .cast("long"))
        .filter(col("rk") <= 20)
      canon(capped.select(col("doc_id"), col("lang"), col("draw"), col("rk")))
    },
    Some(
      """WITH s AS (
        |  SELECT doc_id, lang, (doc_id * 2654435761) % 4294967296 AS draw
        |  FROM documents),
        |f AS (SELECT * FROM s WHERE draw % 100 < 30),
        |c AS (SELECT doc_id, lang, draw,
        |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY draw, doc_id) AS rk
        |      FROM f)
        |SELECT doc_id, lang, draw, rk FROM c WHERE rk <= 20""".stripMargin +
        orderAll("doc_id", "lang", "draw", "rk")))

  /** xc2: per-document bigram repetition signals — duplicate-bigram
    * fraction and most-frequent-bigram share, the C4/Gopher-style
    * gates that catch boilerplate and generated spam. The whole
    * computation is higher-order functions over each row's own token
    * array: one codegen stage over the scan, zero shuffles before the
    * canonical sort. (The per-doc top-count HOF is
    * O(|distinct| x |bigrams|) in the document's own length — for the
    * pathological single-doc outlier the explode+groupBy form is the
    * fallback, but it shuffles every bigram of every document and is
    * strictly worse for real length distributions.)
    */
  val xc2 = GQuery(
    "xc2_repetition",
    (s, d) => {
      val c = Ctx(s, d)
      val base = c.documents
        .select(col("doc_id"), col("lang"), Llm.tokens(s, col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .withColumn("bg", expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
      val stats = base.select(
        col("doc_id"), col("lang"),
        size(col("bg")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bg"))).cast("long").as("n_distinct"),
        expr("array_max(transform(array_distinct(bg), x -> size(filter(bg, y -> y = x))))")
          .cast("long").as("top_count"))
      canon(stats
        .withColumn("dup_frac", round(
          (col("n_bigrams") - col("n_distinct")).cast("double") / col("n_bigrams"), 4))
        .withColumn("top_frac", round(
          col("top_count").cast("double") / col("n_bigrams"), 4)))
    },
    Some(
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang,
        |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS bg
        |  FROM t WHERE len(toks) >= 2),
        |st AS (
        |  SELECT doc_id, lang,
        |    CAST(len(bg) AS BIGINT) AS n_bigrams,
        |    CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct,
        |    CAST(list_max(list_transform(list_distinct(bg),
        |      x -> len(list_filter(bg, y -> y = x)))) AS BIGINT) AS top_count
        |  FROM b)
        |SELECT doc_id, lang, n_bigrams, n_distinct, top_count,
        |  ROUND(CAST(n_bigrams - n_distinct AS DOUBLE) / n_bigrams, 4) AS dup_frac,
        |  ROUND(CAST(top_count AS DOUBLE) / n_bigrams, 4) AS top_frac
        |FROM st""".stripMargin +
        orderAll("doc_id", "lang", "n_bigrams", "n_distinct", "top_count",
          "dup_frac", "top_frac")))

  /** Distinct 3-shingles (as strings — the oracle must build the exact
    * same keys) per document.
    */
  private def shingles(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("doc_id"), Llm.tokens(docs.sparkSession, col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(toks) - 3), " +
          "i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])))")).as("shingle"))

  /** xc3: benchmark decontamination — flag every training document
    * sharing at least one 3-shingle with the held-out evaluation set
    * (here: the deterministic doc_id % 41 == 0 slice standing in for an
    * external benchmark table). Scale shape: the eval side is tiny by
    * construction (benchmarks are KBs against a 100 TB corpus), so its
    * distinct shingle dictionary broadcast-joins against the corpus
    * shingle stream — a map-side semi-join in the corpus scan stage,
    * never a corpus self-join; the only shuffle is the per-doc overlap
    * count. The gate falls back to a shuffled join if the dictionary
    * ever outgrows the broadcast threshold.
    */
  val xc3 = GQuery(
    "xc3_decontam",
    (s, d) => {
      val c = Ctx(s, d)
      val docs = c.documents
      val evalShingles = shingles(docs.filter(col("doc_id") % 41 === 0))
        .select(col("shingle")).distinct()
      val corpusShingles = shingles(docs.filter(col("doc_id") % 41 =!= 0))
      // corpus shingles are per-doc distinct, so count(*) after the
      // semi-shaped inner join IS the distinct overlap count
      canon(corpusShingles
        .join(Scale.maybeBroadcast(evalShingles), "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared")))
    },
    Some(
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, g.shingle FROM t,
        |    UNNEST(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g(shingle)
        |  WHERE len(toks) >= 3),
        |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 41 = 0),
        |corp AS (SELECT * FROM sh WHERE doc_id % 41 <> 0)
        |SELECT corp.doc_id AS doc_id, COUNT(*) AS n_shared
        |FROM corp JOIN ev ON corp.shingle = ev.shingle
        |GROUP BY corp.doc_id""".stripMargin +
        orderAll("doc_id", "n_shared")))

  /** xc4: pattern redaction with an audit report — scrub digit runs
    * from the raw payload column (the PII-redaction shape: the real
    * patterns are emails/phones/SSNs, the mechanics are identical) and
    * account for every replacement per event_type. One codegen pass
    * over the scan (regexp_count + regexp_replace are both native
    * expressions), then a partial-aggregated groupBy on a low-cardinality
    * key — at 100 TB the scan dominates and parallelizes per-split.
    */
  val xc4 = GQuery(
    "xc4_redaction",
    (s, d) => {
      val c = Ctx(s, d)
      val red = c.events
        .select(col("event_type"), col("props"))
        .withColumn("n_runs", regexp_count(col("props"), lit("[0-9]+")).cast("long"))
        .withColumn("redacted", regexp_replace(col("props"), "[0-9]+", "#"))
      canon(red.groupBy("event_type").agg(
        count(lit(1)).as("n_rows"),
        sum(col("n_runs")).as("n_digit_runs"),
        sum(length(col("redacted"))).cast("long").as("redacted_chars"),
        sum(length(col("props"))).cast("long").as("raw_chars")))
    },
    Some(
      """SELECT event_type,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_digit_runs,
        |  CAST(SUM(len(regexp_replace(props, '[0-9]+', '#', 'g'))) AS BIGINT) AS redacted_chars,
        |  CAST(SUM(len(props)) AS BIGINT) AS raw_chars
        |FROM events GROUP BY event_type""".stripMargin +
        orderAll("event_type", "n_rows", "n_digit_runs", "redacted_chars", "raw_chars")))

  /** xc5: sequence packing — lay the curated corpus out into
    * fixed-token-budget training sequences: docs are ordered by the
    * deterministic draw within each language shard, token counts
    * cumulative-summed, and each doc assigned the sequence its first
    * token lands in (seq_id = start DIV budget) plus its offset into
    * that sequence — the layout step between curation and the trainer's
    * data loader. All integer arithmetic over a deterministic total
    * order, so the packing is reproducible under any partitioning.
    *
    * Scale shape: one ranking/cumsum window per language shard — at
    * 100 TB the shard key becomes (lang, hash-range bucket) so no
    * single window partition exceeds a worker, exactly like xc1's cap;
    * seq_ids then offset by per-bucket totals (an exclusive prefix sum
    * over bucket subtotals — a tiny second pass).
    */
  val xc5 = GQuery(
    "xc5_sequence_pack",
    (s, d) => {
      val c = Ctx(s, d)
      val budget = 2048
      val t = c.documents.select(
        col("doc_id"), col("lang"), drawOf(col("doc_id")).as("draw"),
        size(Llm.tokens(s, col("text"))).cast("long").as("n_tokens"))
      val w = Window.partitionBy("lang").orderBy(col("draw"), col("doc_id"))
      canonBy(
        t.withColumn("cum", sum(col("n_tokens")).over(w))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            expr(s"(cum - n_tokens) DIV $budget").as("seq_id"),
            expr(s"(cum - n_tokens) % $budget").as("seq_off")),
        "doc_id")
    },
    Some(
      """WITH t AS (
        |  SELECT doc_id, lang, (doc_id * 2654435761) % 4294967296 AS draw,
        |    len(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY draw, doc_id) AS cum
        |  FROM t)
        |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_id,
        |  CAST((cum - n_tokens) % 2048 AS BIGINT) AS seq_off
        |FROM c""".stripMargin +
        orderAll("doc_id")))

  /** xc6: document chunking — fixed token windows (64) with stride 48
    * (16-token overlap), the standard split step before embedding /
    * context-window packing (xc5 consumes shapes like these). Pure
    * per-row generator work: the window starts are a sequence() the
    * scan-stage posexplode fans out, the chunk itself a slice() — zero
    * shuffles, parallelism = input splits, linear at any corpus size.
    * Deterministic chunk ids (ordinal of the start offset) make re-runs
    * and retried partitions emit identical chunks. Oracle-matched.
    */
  val xc6 = GQuery(
    "xc6_chunking",
    (s, d) => {
      val c = Ctx(s, d)
      val W = 64
      val S = 48
      canonBy(
        c.documents
          .select(col("doc_id"), Llm.tokens(s, col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            posexplode(expr(s"sequence(1, greatest(size(toks), 1), $S)"))
              .as(Seq("chunk_id", "start")))
          .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
            expr(s"slice(toks, start, $W)").as("chunk"))
          .select(col("doc_id"), col("chunk_id"),
            size(col("chunk")).cast("int").as("n_tokens"),
            concat_ws(" ", col("chunk")).as("chunk_text")),
        "doc_id", "chunk_id")
    },
    Some(
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, toks, u.start, CAST((u.start - 1) // 48 AS INT) AS chunk_id
        |  FROM t, UNNEST(range(1, greatest(len(toks), 1) + 1, 48)) AS u(start))
        |SELECT doc_id, chunk_id,
        |  CAST(len(list_slice(toks, start, start + 63)) AS INT) AS n_tokens,
        |  array_to_string(list_slice(toks, start, start + 63), ' ') AS chunk_text
        |FROM st""".stripMargin +
        orderAll("doc_id", "chunk_id")))

  /** xc7: temperature-based language rebalancing — the multilingual
    * training-mix step (XLM-R/mT5 style): sample languages
    * proportional to n_l^α instead of n_l so low-resource languages
    * are upweighted. α = 0.5 here because sqrt is IEEE-correctly-
    * rounded in BOTH engines (a general pow() can differ in the last
    * ulp cross-engine and flip a boundary draw); per-language sqrt
    * weights are 6-decimal-quantized and summed as exact DECIMAL so
    * the normalization is order-independent.
    *
    * Per doc: expected copies e_l = T · p_l / n_l for a T-doc target
    * budget; emit floor(e_l) guaranteed copies plus one more when the
    * doc's deterministic uniform draw falls under frac(e_l) —
    * stochastic rounding with an explicit hash draw, so the output is
    * exactly reproducible on re-run/retry AND its per-language
    * expectation is T · p_l.
    *
    * Scale shape: one tiny per-lang aggregate (broadcast back), then
    * a pure per-row projection — no shuffle touches the corpus. The
    * consumer explodes `sequence(1, n_copies)` to materialize the
    * epoch mix.
    */
  val xc7 = GQuery(
    "xc7_lang_resample",
    (s, d) => {
      val c = Ctx(s, d)
      val T = 1000.0
      val counts = c.documents.groupBy("lang")
        .agg(count(lit(1)).as("n"))
        .withColumn("w6", round(sqrt(col("n")), 6).cast("decimal(38,6)"))
      val sumw = counts.agg(sum(col("w6")).as("sumw"))
      val e = counts.crossJoin(Scale.maybeBroadcast(sumw))
        .select(col("lang"),
          round(
            lit(T) * (col("w6").cast("double") / col("sumw").cast("double"))
              / col("n"), 6).as("e"))
      canon(
        c.documents
          .join(Scale.maybeBroadcast(e), "lang")
          .select(col("doc_id"), col("lang"),
            (floor(col("e")) +
              when(drawOf(col("doc_id")) / lit(4294967296.0) <
                col("e") - floor(col("e")), 1L).otherwise(0L))
              .cast("long").as("n_copies")))
    },
    Some(
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, n, CAST(ROUND(SQRT(n), 6) AS DECIMAL(38,6)) AS w6 FROM c),
        |s AS (SELECT SUM(w6) AS sumw FROM w),
        |e AS (SELECT lang, ROUND(1000.0 * (CAST(w6 AS DOUBLE) / CAST(sumw AS DOUBLE)) / n, 6) AS e
        |      FROM w, s)
        |SELECT d.doc_id, lang,
        |  CAST(FLOOR(e) + CASE WHEN ((d.doc_id * 2654435761) % 4294967296) / 4294967296.0
        |                            < e - FLOOR(e) THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        |FROM documents d JOIN e USING (lang)""".stripMargin +
        orderAll("doc_id", "lang", "n_copies")))

  /** xc8: deterministic train/val/test assignment — the split every
    * training pipeline pins BEFORE any curation so no document ever
    * migrates between splits across reruns, refreshes, or engine
    * swaps (val/test contamination is unfixable after the fact). The
    * assignment is a pure function of doc_id via the same explicit
    * hash draw as xc1 (never rand(), never row position — both change
    * under retries/repartitioning): 90/5/5 by hash bucket. Scale
    * shape: a per-row projection in the scan stage — zero shuffles,
    * zero state; composes with any downstream filter while staying
    * stable. Oracle-matched: DuckDB computes the identical buckets.
    */
  val xc8 = GQuery(
    "xc8_split_assign",
    (s, d) => {
      val c = Ctx(s, d)
      val bucket = drawOf(col("doc_id")) % 100
      canonBy(
        c.documents.select(
          col("doc_id"), col("lang"),
          bucket.cast("long").as("bucket"),
          when(bucket < 90, "train")
            .when(bucket < 95, "val")
            .otherwise("test").as("split")),
        "doc_id")
    },
    Some(
      """SELECT doc_id, lang,
        |  CAST((doc_id * 2654435761) % 4294967296 % 100 AS BIGINT) AS bucket,
        |  CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'train'
        |       WHEN (doc_id * 2654435761) % 4294967296 % 100 < 95 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin +
        orderAll("doc_id")))

  /** xc9: length-distribution balancing — deterministic per-bucket
    * downsampling of over-represented length buckets to the smallest
    * bucket's size (the feature-flattening complement of xc7's
    * LANGUAGE temperature: same goal — stop a dominant slice of the
    * corpus from dominating training — different axis). Acceptance is
    * exact integer math on the xc1 draw: accept iff
    * draw % n_bucket < n_min, so E[kept per bucket] = n_min with zero
    * RNG state, reproducible across engines/retries/partitionings.
    * Report: per bucket, before/after counts + the realized rate.
    *
    * Scale shape: the bucket census is one tiny aggregate (buckets,
    * not rows); it broadcasts back into the scan-stage filter — the
    * corpus is never shuffled. At 100 TB this is a metadata-sized
    * broadcast and a per-row modulo.
    */
  val xc9 = GQuery(
    "xc9_balanced_sample",
    (s, d) => {
      val c = Ctx(s, d)
      val base = c.documents
        .select(col("doc_id"), col("n_chars"), drawOf(col("doc_id")).as("draw"))
        .withColumn("bucket", expr("n_chars DIV 200"))
      val counts = base.groupBy("bucket").agg(count(lit(1)).as("n_before"))
      val minN = counts.agg(min(col("n_before")).as("n_min"))
      val kept = base
        .join(broadcast(counts), "bucket")
        .crossJoin(broadcast(minN))
        .filter(col("draw") % col("n_before") < col("n_min"))
        .groupBy("bucket").agg(count(lit(1)).as("n_after"))
      canon(counts.join(kept, Seq("bucket"), "left")
        .crossJoin(broadcast(minN))
        .select(col("bucket"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"), col("n_min"),
          round(coalesce(col("n_after"), lit(0L)).cast("double") /
            col("n_before"), 4).as("kept_frac")))
    },
    Some(
      """WITH b AS (
        |  SELECT doc_id, n_chars // 200 AS bucket,
        |    (doc_id * 2654435761) % 4294967296 AS draw
        |  FROM documents),
        |c AS (SELECT bucket, COUNT(*) AS n_before FROM b GROUP BY 1),
        |m AS (SELECT MIN(n_before) AS n_min FROM c),
        |k AS (
        |  SELECT bucket, COUNT(*) AS n_after
        |  FROM b JOIN c USING (bucket) CROSS JOIN m
        |  WHERE draw % n_before < n_min GROUP BY bucket)
        |SELECT c.bucket, c.n_before, COALESCE(k.n_after, 0) AS n_after,
        |  m.n_min AS n_min,
        |  ROUND(COALESCE(k.n_after, 0) / CAST(c.n_before AS DOUBLE), 4) AS kept_frac
        |FROM c LEFT JOIN k USING (bucket) CROSS JOIN m""".stripMargin +
        orderAll("bucket", "n_before", "n_after", "n_min", "kept_frac")))

  /** xc10: deterministic stratified train/valid/test split — THE
    * fan-out every training corpus passes through once, and the one
    * place a nondeterministic split silently poisons evaluation
    * (today's valid doc in tomorrow's train set). Assignment is pure
    * per-row integer math on xc1's Knuth-hash draw (80/10/10 on
    * draw%100): no rand(), no state — a retry, a re-partition, or a
    * different engine assigns every document identically, which is
    * what the oracle match certifies. The report is the per-(lang,
    * split) census carrying a TableCheck membership checksum, so the
    * certificate pins EXACT membership cross-engine, not just counts.
    * Scale shape: the assignment is scan-stage projection; the census
    * is one (lang,split)-keyed aggregate — group space = langs × 3.
    */
  val xc10 = GQuery(
    "xc10_split",
    (s, d) => {
      val c = Ctx(s, d)
      val assigned = c.documents
        .select(col("doc_id"), col("lang"),
          (drawOf(col("doc_id")) % 100).as("slot"))
        .withColumn("split",
          when(col("slot") < 80, "train")
            .when(col("slot") < 90, "valid").otherwise("test"))
      canon(graft.operators.TableCheck.checksumBy(
        assigned, Seq("lang", "split"), Seq("doc_id")))
    },
    Some(
      """WITH a AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
        |         WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'valid'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT lang, split, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(CAST(('0x' || substring(md5(
        |        coalesce(length(CAST(doc_id AS VARCHAR)) || ':' || CAST(doc_id AS VARCHAR), 'N')), 1, 15)) AS BIGINT)
        |      AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT) AS checksum
        |FROM a GROUP BY lang, split""".stripMargin +
        orderAll("lang", "split", "n_rows", "checksum")))

  /** xc11: sequence packing — the concat-and-chunk step every
    * GPT-style pretraining corpus passes through LAST (Brown et al.
    * 2020 §2.2; T5's "packing"): all documents' token streams are
    * concatenated in one canonical order (doc_id) and cut into
    * fixed-length training sequences (L = 256 tokens here; thousands
    * in production — the arithmetic is identical). The per-document
    * output is its SPAN in packed-sequence space: global token start
    * offset, first/last sequence index, and how many sequence
    * boundaries cross the document — the map a data loader needs to
    * locate any document inside the packed shards, and the census
    * boundary-crossing studies (attention-mask contamination) start
    * from.
    *
    * Scale shape: a packed offset is a GLOBAL prefix sum, and the
    * naive form — one empty-PARTITION-BY window over the corpus — is
    * the exact single-task funnel RegistryPlanSpec bans. This runs
    * the classic distributed prefix sum instead: documents window-sum
    * WITHIN doc_id blocks (B = 1024; partitioned shuffle, parallel),
    * and block TOTALS recurse through [[exclusivePrefix]] — re-blocked
    * at B per level until <= B rows remain, so the ONLY empty-
    * PARTITION-BY window in the whole plan runs over a CONSTANT-
    * bounded (<= 1024-row) frame at ANY corpus size (two recursion
    * levels already cover 2^40 documents). The block offset joins
    * back size-gated broadcast. The oracle computes the same offsets
    * with DuckDB's plain global window, so the hash match certifies
    * the decomposition is EXACTLY the naive semantics. Token counts
    * use xt1's cross-engine tokenizer identity.
    */
  /** Exclusive prefix sum of `v` over rows ordered by the NON-NEGATIVE
    * integer column `key` (no duplicate keys), fully distributed at
    * any size: keys block at B per level (within-block windows are
    * partitioned and parallel), block totals recurse, and only a
    * frame already <= B rows gets the empty-PARTITION-BY window — a
    * constant-bounded single task, never a data-sized one. Depth is
    * ceil(log_B n): the per-level count() that picks the base case is
    * a distributed aggregate over a frame that shrinks 1024x per
    * level (callers persist the input, so counts don't recompute the
    * upstream scan). Keys need not be dense — DIV-blocking only needs
    * their order.
    */
  private[queries] def exclusivePrefix(
      df: org.apache.spark.sql.DataFrame, key: String, v: String,
      out: String, B: Long = 1024L, lvl: Int = 0)
      : org.apache.spark.sql.DataFrame = {
    if (df.count() <= B) {
      val w = Window.orderBy(col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn(out, coalesce(sum(col(v)).over(w), lit(0L)))
    } else {
      val sup = s"_sup$lvl"; val preIn = s"_prein$lvl"
      val preSup = s"_presup$lvl"; val bt = s"_bt$lvl"
      val blocked = df.withColumn(sup, expr(s"$key DIV $B"))
      val wIn = Window.partitionBy(sup).orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
      val withIn = blocked.withColumn(preIn,
        coalesce(sum(col(v)).over(wIn), lit(0L)))
      val supTotals = own(blocked.groupBy(sup).agg(sum(col(v)).as(bt))
        .persist())
      val supPre = exclusivePrefix(supTotals, sup, bt, preSup, B, lvl + 1)
        .select(col(sup), col(preSup))
      withIn.join(Scale.maybeBroadcast(supPre), sup)
        .withColumn(out, col(preSup) + col(preIn))
        .drop(sup, preIn, preSup)
    }
  }

  /** The packed-span frame shared by xc11 (per-doc report) and xc12
    * (per-sequence census): (doc_id, n_tokens, start_tok, start_seq,
    * end_seq) under L-token sequences via the recursive prefix sum
    * documented on xc11. Callers wrap in reap{} — the tokenized frame
    * and recursion levels persist via own().
    */
  private[queries] def packSpans(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val c = Ctx(s, d)
    val L = 256L
    val B = 1024L
    val toks = own(c.documents
      .select(col("doc_id"),
        size(Llm.tokens(s, col("text"))).cast("long").as("n_tokens"))
      .withColumn("blk", expr(s"doc_id DIV $B"))
      .persist())
    val wIn = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBlk = toks.withColumn("pre_in",
      coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
    val blkTotals = own(toks.groupBy("blk")
      .agg(sum(col("n_tokens")).as("bt")).persist())
    val blkPre = exclusivePrefix(blkTotals, "blk", "bt", "pre_blk", B)
      .select(col("blk"), col("pre_blk"))
    inBlk.join(Scale.maybeBroadcast(blkPre), "blk")
      .withColumn("start_tok", col("pre_blk") + col("pre_in"))
      .withColumn("start_seq", expr(s"start_tok DIV $L"))
      .withColumn("end_seq",
        when(col("n_tokens") === 0L, col("start_seq"))
          .otherwise(expr(s"(start_tok + n_tokens - 1) DIV $L")))
      .select(col("doc_id"), col("n_tokens"), col("start_tok"),
        col("start_seq"), col("end_seq"))
  }

  val xc11 = GQuery(
    "xc11_sequence_pack",
    (s, d) => reap {
      canonBy(packSpans(s, d)
        .select(col("doc_id"), col("n_tokens"), col("start_tok"),
          col("start_seq"), col("end_seq"),
          (col("end_seq") - col("start_seq")).as("n_splits")), "doc_id")
    },
    Some(
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM t)
        |SELECT doc_id, n_tokens, start_tok,
        |  start_tok // 256 AS start_seq,
        |  CASE WHEN n_tokens = 0 THEN start_tok // 256
        |       ELSE (start_tok + n_tokens - 1) // 256 END AS end_seq,
        |  (CASE WHEN n_tokens = 0 THEN start_tok // 256
        |        ELSE (start_tok + n_tokens - 1) // 256 END) - (start_tok // 256) AS n_splits
        |FROM c""".stripMargin +
        orderAll("doc_id")))

  /** xc12: packed-sequence census — xc11's inverse map: for every
    * L-token training sequence, which documents' tokens land in it.
    * This is the attention-contamination report packing forces you to
    * write (a sequence spanning many documents trains cross-document
    * attention unless the loader masks boundaries; Brown et al. 2020
    * mask at document ends): n_docs per sequence, the first/last
    * contributing doc, and whether the sequence is PURE (one document
    * — no masking needed). A sequence's members are CONTIGUOUS in the
    * canonical concatenation order by construction, so (first_doc,
    * last_doc, n_docs) pins the full membership list (ids are dense
    * in this corpus; with gapped ids the triple bounds the rank range).
    *
    * Scale shape: each document explodes into its span length
    * (n_splits + 1 rows), so the fan-out is Σ spans = n_seqs + the
    * boundary crossings — linear in corpus tokens / L, never
    * quadratic; the census is one groupBy(seq_id). Output is
    * sequence-space-sized — a data product written next to the packed
    * shards, exactly what the loader's mask builder consumes.
    *
    * Membership semantics: zero-token documents contribute no tokens
    * to any sequence, so they are NOT members — they're filtered
    * before the explode (round-12 advice: an empty doc's degenerate
    * [start_seq, start_seq] span would otherwise inflate n_docs /
    * flip `pure` for a sequence it contributes nothing to, and a
    * trailing empty doc landing exactly on an L boundary would emit a
    * phantom seq_id past the last real sequence).
    */
  val xc12 = GQuery(
    "xc12_pack_census",
    (s, d) => reap {
      canonBy(packSpans(s, d)
        .filter(col("n_tokens") > 0L)
        .select(col("doc_id"),
          explode(sequence(col("start_seq"), col("end_seq"))).as("seq_id"))
        .groupBy("seq_id")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .withColumn("pure", col("n_docs") === 1L), "seq_id")
    },
    Some(
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM t),
        |spans AS (
        |  SELECT doc_id, start_tok // 256 AS start_seq,
        |    (start_tok + n_tokens - 1) // 256 AS end_seq
        |  FROM c WHERE n_tokens > 0),
        |x AS (
        |  SELECT doc_id, UNNEST(generate_series(start_seq, end_seq)) AS seq_id
        |  FROM spans)
        |SELECT seq_id, COUNT(*) AS n_docs,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
        |  COUNT(*) = 1 AS pure
        |FROM x GROUP BY seq_id""".stripMargin +
        orderAll("seq_id")))

  def queries: Seq[GQuery] =
    Seq(xc1, xc2, xc3, xc4, xc5, xc6, xc7, xc8, xc9, xc10, xc11, xc12)
}
