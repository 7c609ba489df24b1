package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Det._

/** Sketch-based near-dup detection — the 100 TB scale paths behind the
  * exact QX1/QX2 contracts:
  *
  *  - MinHash + banded LSH: candidate pairs come from equality joins on
  *    band keys (shuffle on band hash — linear in corpus size), never
  *    from an all-pairs comparison.
  *  - SimHash: one 64-bit signature per token set; near-dups are pairs
  *    within small Hamming distance, found via 4x16-bit band blocking.
  *
  * Shared plan discipline (this is what kept the first version from
  * scaling): duplicate-heavy corpora put whole near-dup clusters into
  * the same LSH bucket, so banding *documents* makes bucket joins
  * quadratic in cluster size. Both sketches therefore run over DISTINCT
  * token-set groups: signatures are computed once per distinct set,
  * band joins emit narrow (gid_a, gid_b) pairs that are DISTINCT'ed
  * before verification, and member doc-ids are expanded only for the
  * final qualifying pairs (the output itself).
  *
  * Groups are keyed by the token set ITSELF (grouping on the sorted
  * array is exact at any vocabulary size), with a derived xxhash64 gid
  * as the narrow join/band key. Candidate verification compares the
  * actual token arrays (size-prefiltered array_intersect) — there is
  * deliberately NO bitmask anywhere in this file: Spark's shiftleft
  * wraps its shift amount mod 64, so a vocab-indexed `1 << idx` mask
  * silently aliases token #65 onto token #1. The mask form survives
  * only in Llm.qx2 as a fast path gated on a measured vocab <= 64.
  *
  * Deterministic throughout (xxhash64, fixed seeds) ⇒ stable across
  * runs and cluster sizes; ⊘ rows-only for the driver, recall-tested
  * against the exact variants in SketchRecallSpec and on a >64-token
  * corpus in GeneralVocabSpec.
  */
object Dedup {

  private[graft] val NumPerms = 64
  private[graft] val BandRows = 4 // 16 bands x 4 rows: P(cand | J=0.8) ~ 0.9998

  /** One row per distinct token SET over the given documents:
    * (gid, toks, htoks, sz, ids) — deterministic 64-bit group id, the
    * sorted set, its per-token xxhash64 longs (sorted), its size,
    * sorted member doc-ids. gid collisions (~n^2/2^64) could only
    * merge two groups' member lists, never corrupt a verified Jaccard,
    * because verification reads the real arrays. htoks is what the
    * downstream sketches and verify consume: hashing each token ONCE
    * here means signatures re-hash 8-byte longs instead of strings and
    * candidate verification intersects long arrays instead of string
    * arrays (an htoks-level collision inside one set — ~sz²/2^65 —
    * would merely shave one element off that set everywhere, still
    * consistently across every pair it joins).
    * persist(): four plan branches consume this (signatures, intra
    * pairs, both sides of the verify join) — without it the whole
    * tokenize+groupBy subplan re-executes per branch.
    *
    * Plan shape: the token SET is built per row in the scan projection
    * (array_distinct + sort_array over the tokenizer output — per-doc
    * work, stays in the scan stage), so the ONLY shuffle is the
    * group-by-set itself, keyed on narrow doc rows. The previous
    * explode → distinct → groupBy(doc) → groupBy(set) form shuffled
    * every token three times and was measured 7x slower cold at
    * sf0.1 for identical output. */
  private[graft] def setGroups(docs: DataFrame): DataFrame =
    own(docs
      .select(col("doc_id"),
        sort_array(array_distinct(Llm.tokens(docs.sparkSession, col("text")))).as("toks"))
      .groupBy("toks")
      .agg(sort_array(collect_list("doc_id")).as("ids"))
      .withColumn("gid", xxhash64(col("toks")))
      .withColumn("htoks",
        sort_array(expr("array_distinct(transform(toks, t -> xxhash64(t)))")))
      .withColumn("sz", size(col("htoks")))
      .persist())

  /** Expand qualifying group pairs to ordered doc-id pairs. */
  private def expandPairs(groupPairs: DataFrame, extra: String): DataFrame =
    groupPairs
      .select(explode(expr(
        "flatten(transform(ids_a, a -> transform(ids_b, b -> named_struct('a', a, 'b', b))))"))
        .as("p"), col(extra))
      .select(least(col("p.a"), col("p.b")).as("doc_a"),
        greatest(col("p.a"), col("p.b")).as("doc_b"), col(extra))

  /** Probe hook: xd2b's back half (expand + intra + canon sort). */
  private[graft] def xd2bPairsFor(groups: DataFrame, qualifying: DataFrame): DataFrame =
    canonBy(intraPairs(groups, lit(0), "hamming")
      .unionByName(expandPairs(qualifying, "hamming")), "doc_a", "doc_b")

  /** Intra-group pairs (identical token sets): all a<b member pairs. */
  private def intraPairs(groups: DataFrame, extraVal: org.apache.spark.sql.Column,
      extraName: String): DataFrame =
    groups.filter(size(col("ids")) >= 2)
      .select(explode(expr(
        """filter(flatten(transform(ids, a -> transform(ids, b -> named_struct('a', a, 'b', b)))),
          |       p -> p.a < p.b)""".stripMargin)).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"),
        extraVal.as(extraName))

  val xd1 = GQuery(
    "xd1_minhash_lsh",
    (s, d) => reap {
      val c = Ctx(s, d)
      minhashPairs(setGroups(c.documents), 0.8)
    },
    None)

  /** xd1b: the MinHash+LSH pipeline driver-hash-checked END-TO-END.
    * xd1's banding rides on xxhash64, which no other engine computes —
    * hence its ⊘ contract (recall certified separately by xr5). This
    * variant swaps ONLY the signature family for one both engines
    * evaluate bit-identically in exact BIGINT arithmetic:
    *
    *   h      = md5-60bit(token) mod p          (p = 2^31 − 1; md5 is
    *                                             the cross-engine hash,
    *                                             xv1's discipline)
    *   mh_i   = (a_i·h + b_i) mod p             (universal family;
    *             a_i = (i·1103515245 + 12345) mod p,
    *             b_i = (i·69069 + 1) mod p — plan-time-constant LCG
    *             mixes; every product < 2^62, no ANSI overflow)
    *   band b = 'b:mh_{4b},…,mh_{4b+3}' as a string key
    *
    * so the CANDIDATE SET — which pairs collide in ≥1 of the 16 bands —
    * is deterministic and identical across engines, and after exact
    * verification the qualifying pairs hash-match DuckDB computing the
    * same sketch in SQL. This certifies the LSH mechanics themselves
    * (banding, candidate join, verify) against an independent engine;
    * xd1 remains the production form (xxhash64 is cheaper and 64-bit).
    * Mod-p reduction costs hash width (31 bits), which only affects
    * candidate RECALL, never output correctness — verification reads
    * the real token arrays either way.
    */
  val xd1b = GQuery(
    "xd1b_minhash_md5",
    (s, d) => reap {
      val c = Ctx(s, d)
      graft.functions.Md5Hash60.register(s)
      val groups = setGroups(c.documents).filter(col("sz") > 0)
      val qualifying = verifyCandidates(groups, bandedMd5(groups), 0.8)
      val pairs = intraPairs(groups, lit(1.0), "jaccard")
        .unionByName(expandPairs(qualifying, "jaccard"))
      canonBy(pairs, "doc_a", "doc_b")
    },
    Some(s"""WITH tok AS (
      |  SELECT DISTINCT doc_id, t.token FROM documents,
      |    UNNEST(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS t(token)),
      |h AS (
      |  SELECT doc_id, CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) % 2147483647 AS h
      |  FROM tok),
      |mins AS (
      |  SELECT doc_id, i,
      |    MIN(((((i * 1103515245) + 12345) % 2147483647) * h + (((i * 69069) + 1) % 2147483647)) % 2147483647) AS mh
      |  FROM h CROSS JOIN range(${NumPerms}) AS r(i) GROUP BY doc_id, i),
      |bands AS (
      |  SELECT doc_id,
      |    CAST(band AS VARCHAR) || ':' || string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS band_key
      |  FROM (SELECT doc_id, i, mh, i // ${BandRows} AS band FROM mins) GROUP BY doc_id, band),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
      |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
      |inter AS (
      |  SELECT c.da, c.db, COUNT(*) AS inter
      |  FROM cand c JOIN tok a ON a.doc_id = c.da JOIN tok b ON b.doc_id = c.db AND b.token = a.token
      |  GROUP BY 1, 2)
      |SELECT da AS doc_a, db AS doc_b,
      |  ROUND(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
      |FROM inter JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
      |WHERE inter / (sa.sz + sb.sz - inter) >= 0.8""".stripMargin +
      orderAll("doc_a", "doc_b")))

  /** xd1b's banded (band_key, gid) rows under the cross-engine
    * md5/universal-LCG family documented on xd1b.
    */
  private def bandedMd5(groups: DataFrame): DataFrame = {
    val p = 2147483647L
    groups
      .withColumn("h31", expr(
        s"transform(toks, t -> md5_60(cast(t as binary)) % $p)"))
      .withColumn("sig", expr(
        s"""transform(sequence(0, ${NumPerms - 1}),
           |  i -> array_min(transform(h31,
           |    h -> ((((i * 1103515245L) + 12345L) % $p) * h + (((i * 69069L) + 1L) % $p)) % $p)))""".stripMargin))
      .select(col("gid"), explode(expr(
        s"""transform(sequence(0, ${NumPerms / BandRows - 1}),
           |  b -> concat(cast(b as string), ':',
           |    array_join(transform(slice(sig, b * $BandRows + 1, $BandRows),
           |      x -> cast(x as string)), ',')))""".stripMargin)).as("band_key"))
  }

  /** MinHash + banded LSH over distinct token-set groups, verified
    * EXACTLY against the real token arrays (so output pairs are true
    * J >= threshold pairs at any vocabulary; only recall depends on the
    * banding). Factored out so specs can run it on synthetic corpora.
    */
  private[queries] def minhashPairs(groups: DataFrame, threshold: Double): DataFrame =
    intraPairs(groups, lit(1.0), "jaccard")
      .unionByName(expandPairs(minhashQualifying(groups, threshold), "jaccard"))

  /** The qualifying (verified J >= t) GROUP pairs behind xd1, before
    * doc-pair expansion — (gid_a, gid_b, ids_a, ids_b, jaccard).
    * Factored so xr5's recall certification can count doc pairs as
    * edge weights (|ids_a|·|ids_b|) instead of materializing the
    * multi-million-row expanded pair set.
    */
  private[queries] def minhashQualifying(groups: DataFrame, threshold: Double): DataFrame = {
    // Permutation i's min-hash re-hashes each pre-hashed 8-byte long
    // (htoks), not the token string. The HOF runs once per DISTINCT
    // set over the persisted groups, already spread across partitions
    // by setGroups' ending shuffle. (A 64-column min-agg over exploded
    // tokens was tried and measured 4x SLOWER end-to-end: the wide
    // aggregate re-shuffles both band-join inputs. A universal-hash
    // family — h·aᵢ+bᵢ with plan-time constants — was also tried:
    // ANSI mode turns the intended mod-2⁶⁴ wrap into ARITHMETIC_
    // OVERFLOW, and a custom wrap expression isn't worth ~0.5 s on
    // this query; xxhash64 stays. xd1b runs the same pipeline under a
    // cross-engine md5/universal family instead — see bandedMd5.)
    val sigs = groups
      .withColumn("sig", expr(
        s"""transform(sequence(0, ${NumPerms - 1}),
           |  i -> array_min(transform(htoks, h -> xxhash64(i, h))))""".stripMargin))
      .select(col("gid"), col("sig"))
    // band keys over distinct sets; emit narrow (band_key, gid) rows
    val banded = sigs
      .select(col("gid"),
        explode(expr(
          s"transform(sequence(0, ${NumPerms / BandRows - 1}), " +
            s"b -> xxhash64(b, slice(sig, b * $BandRows + 1, $BandRows)))"))
          .as("band_key"))
    verifyCandidates(groups, banded, threshold)
  }

  /** LSH candidate generation + exact verification, shared by every
    * banding family: join banded (band_key, gid) rows with themselves,
    * then verify surviving group pairs against the real (hashed) token
    * arrays — output pairs are true J >= threshold pairs regardless of
    * which signature family proposed them.
    */
  private def verifyCandidates(groups: DataFrame, banded: DataFrame,
      threshold: Double): DataFrame = {
    graft.functions.ArrayOps.register(groups.sparkSession)
    // persist(): the narrow (gid_a, gid_b) pairs are materialized once,
    // keeping the band self-join + distinct out of the verify stage's
    // plan (on near-dup-dense corpora candidates ≫ groups, so
    // re-deriving them inside the wider verify join dominated runtime).
    val cand = own(banded.as("a").join(banded.as("b"), Seq("band_key"))
      .select(col("a.gid").as("gid_a"), col("b.gid").as("gid_b"))
      .filter(col("gid_a") < col("gid_b"))
      .distinct()
      .persist())
    // exact verify on the real (hashed) token arrays. Size prefilter
    // first: J <= min(sz)/max(sz), so pairs failing min >= t*max can't
    // qualify (epsilon keeps the float form conservative at exact-t
    // ratios); array_intersect runs only on survivors. The group table
    // is small relative to candidates — broadcast it when under the
    // session threshold, shuffle otherwise.
    val g1 = groups.select(col("gid").as("gid_a"), col("ids").as("ids_a"),
      col("htoks").as("h_a"), col("sz").as("sz_a"))
    val g2 = groups.select(col("gid").as("gid_b"), col("ids").as("ids_b"),
      col("htoks").as("h_b"), col("sz").as("sz_b"))
    val qualifying = cand.join(Scale.maybeBroadcast(g1), "gid_a")
      .join(Scale.maybeBroadcast(g2), "gid_b")
      .filter(least(col("sz_a"), col("sz_b")).cast("double")
        >= greatest(col("sz_a"), col("sz_b")) * (threshold - 1e-9))
      // htoks is sort_array(array_distinct(...)) by construction — the
      // codegen'd merge-walk kernel applies (no per-pair hash set or
      // intersection array like array_intersect builds)
      .withColumn("inter",
        expr("sorted_intersect_count(h_a, h_b)").cast("double"))
      .withColumn("uni", (col("sz_a") + col("sz_b")).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 4))
      .filter(col("inter") / col("uni") >= threshold)
    // no canonical sort here: xd1's ⊘ rows-only contract skips it
    // (ordering a ~3M-pair output would dominate the query's own
    // cost); oracle-matched callers (xd1b) sort after expansion.
    qualifying
  }

  /** SimHash over the token SET (unweighted variant — consistent with
    * the set-based Jaccard family above; term-weighted SimHash would
    * band per document and lose the distinct-set compression).
    */
  val xd2 = GQuery(
    "xd2_simhash",
    (s, d) => reap {
      val c = Ctx(s, d)
      simhashPairs(setGroups(c.documents))
    },
    None)

  /** SimHash@hamming<=3 qualifying GROUP pairs (gid_a, ids_a, gid_b,
    * ids_b, hamming) before doc-pair expansion — factored so xr6's
    * precision certification can weight edges by |ids_a|·|ids_b|
    * instead of materializing the expanded pair set; simhashPairs
    * below is xd2's doc-level form.
    */
  private[queries] def simhashQualifying(groups: DataFrame): DataFrame = {
      // The 64-bit SimHash signature is the sketch itself (bit j set iff
      // the per-token hash-bit majority at position j is positive). The
      // per-token hashes already exist as htoks, so the majority vote
      // reads their bits directly — no hashing at all in this pass, one
      // fused codegen kernel per distinct set (simhash_sig replaced the
      // nested aggregate HOF: 64 interpreted lambda walks per group
      // became one JVM pass, ~4x on the signature stage).
      graft.functions.SimHashSig.register(groups.sparkSession)
      // localCheckpoint BEFORE the band self-join: without it both
      // sides of banded⋈banded re-evaluate the signature kernel (the
      // expensive stage — one bit-vote per token per distinct set)
      // unless exchange reuse happens to fire. Materializing the
      // narrow (gid, sim) table once halves the kernel work; the
      // blocks are reclaimed by reap() when the query result is built.
      val sigs = own(groups
        .withColumn("sim", expr("simhash_sig(htoks, 64)"))
        .select(col("gid"), col("sim"))
        .localCheckpoint(eager = true))
      val banded = sigs.select(col("gid"), col("sim"),
        explode(expr(
          "transform(sequence(0, 3), b -> shiftright(sim, b * 16) % 65536 + b * 65536)"))
          .as("band_key"))
      // hamming BEFORE distinct: the ≤3 filter kills most multi-band
      // collisions while they are still join output — the distinct
      // then dedups only surviving (gid_a, gid_b, hamming) narrow rows
      // instead of every band collision at full width
      val cand = banded.as("a").join(banded.as("b"), Seq("band_key"))
        .filter(col("a.gid") < col("b.gid"))
        .select(col("a.gid").as("gid_a"), col("b.gid").as("gid_b"),
          bit_count(expr("a.sim ^ b.sim")).as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
      val g1 = groups.select(col("gid").as("gid_a"), col("ids").as("ids_a"))
      val g2 = groups.select(col("gid").as("gid_b"), col("ids").as("ids_b"))
      cand.join(Scale.maybeBroadcast(g1), "gid_a")
        .join(Scale.maybeBroadcast(g2), "gid_b")
  }

  private[queries] def simhashPairs(groups: DataFrame): DataFrame =
    intraPairs(groups, lit(0L), "hamming")
      .unionByName(expandPairs(simhashQualifying(groups), "hamming"))

  /** xd2b: the SimHash pipeline driver-hash-checked END-TO-END —
    * xd1b's discipline applied to the Hamming sketch. Per-token hash =
    * md5-60bit (xv1's cross-engine hash, full width — no mod-p here:
    * SimHash consumes BITS, not magnitudes); fingerprint bit j set iff
    * the ±1 majority over the set's token hashes at bit j is positive
    * (ties → 0, same strict > in both engines); banding = 4 × 15-bit
    * slices; pairs colliding in ≥1 band emit bit_count(sim_a ^ sim_b)
    * <= 3. Every step is exact integer arithmetic both engines share,
    * so fingerprints, band keys, candidates, and Hamming distances are
    * bit-identical and the output hash-matches DuckDB computing the
    * same sketch in SQL. xd2 stays the production form (xxhash64,
    * 64-bit sketch); precision vs true Jaccard is xr6's certificate —
    * this row certifies the sketch MECHANICS against an independent
    * engine.
    */
  val xd2b = GQuery(
    "xd2b_simhash_md5",
    (s, d) => reap {
      val c = Ctx(s, d)
      graft.functions.SimHashMd5Sig.register(s)
      val groups = setGroups(c.documents).filter(col("sz") > 0)
      // md5 + vote in ONE codegen kernel — no per-group hash array, no
      // interpreted per-element md5_60 dispatch inside transform().
      // localCheckpoint before the self-join: the md5-per-token kernel
      // is the dominant cost and would otherwise run on BOTH sides of
      // banded⋈banded (this was the board's only budget breach in r13).
      val sigs = own(groups
        .withColumn("sim", expr("simhash_md5_sig(toks, 60)"))
        .select(col("gid"), col("sim"))
        .localCheckpoint(eager = true))
      val banded = sigs.select(col("gid"), col("sim"),
        explode(expr(
          "transform(sequence(0, 3), b -> shiftright(sim, b * 15) % 32768 + b * 32768)"))
          .as("band_key"))
      // same hamming-before-distinct discipline as simhashQualifying
      val cand = banded.as("a").join(banded.as("b"), Seq("band_key"))
        .filter(col("a.gid") < col("b.gid"))
        .select(col("a.gid").as("gid_a"), col("b.gid").as("gid_b"),
          bit_count(expr("a.sim ^ b.sim")).as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
      val g1 = groups.select(col("gid").as("gid_a"), col("ids").as("ids_a"))
      val g2 = groups.select(col("gid").as("gid_b"), col("ids").as("ids_b"))
      val qualifying = cand.join(Scale.maybeBroadcast(g1), "gid_a")
        .join(Scale.maybeBroadcast(g2), "gid_b")
      val pairs = intraPairs(groups, lit(0), "hamming")
        .unionByName(expandPairs(qualifying, "hamming"))
      // canonBy materializes `pairs` before the range sort (preSort),
      // so the band-join + expansion pipeline executes exactly once
      canonBy(pairs, "doc_a", "doc_b")
    },
    Some("""WITH tok AS (
      |  SELECT DISTINCT doc_id, t.token FROM documents,
      |    UNNEST(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS t(token)),
      |h AS (
      |  SELECT doc_id, CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) AS h
      |  FROM tok),
      |bits AS (
      |  SELECT doc_id, j,
      |    CASE WHEN SUM(CASE WHEN (h >> j) % 2 != 0 THEN 1 ELSE -1 END) > 0
      |         THEN 1 ELSE 0 END AS bit
      |  FROM h CROSS JOIN range(60) AS r(j) GROUP BY doc_id, j),
      |sig AS (
      |  SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << j)) AS BIGINT) AS sim
      |  FROM bits GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, sim, ((sim >> (b * 15)) % 32768) + b * 32768 AS band_key
      |  FROM sig CROSS JOIN range(4) AS rb(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, a.sim AS sa, b.sim AS sb
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
      |SELECT da AS doc_a, db AS doc_b,
      |  CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
      |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin +
      orderAll("doc_a", "doc_b")))

  /** EXACT pairwise Jaccard >= threshold at ANY vocabulary size — the
    * general path behind Llm.qx2's gated <=64-vocab mask fast path.
    *
    * Same compression trick as the sketches (distinct token-set groups,
    * so duplicate-heavy corpora don't explode), but candidates come from
    * an exploded token-equality join BETWEEN GROUPS — the oracle's own
    * co-occurrence shape, shuffled on token, linear in sum-of-set-sizes
    * with per-token group frequency bounding the pair fan-out. No mask,
    * no vocab index, no driver-side anything.
    */
  /** Exact J >= threshold edges BETWEEN distinct-set groups via token
    * co-occurrence counting — (gid_a, gid_b, jaccard), gid_a < gid_b.
    * Works at any vocabulary; cost is Σ_token freq² where freq is the
    * per-token GROUP frequency.
    */
  private[queries] def groupEdgesGeneral(groups: DataFrame, threshold: Double): DataFrame = {
    // join on the pre-hashed longs: equality on 8-byte keys, not strings
    val gtok = groups.select(col("gid"), col("sz"), explode(col("htoks")).as("token"))
    gtok.as("a").join(gtok.as("b"),
        col("a.token") === col("b.token") && col("a.gid") < col("b.gid"))
      .groupBy(col("a.gid").as("gid_a"), col("a.sz").as("sa"),
        col("b.gid").as("gid_b"), col("b.sz").as("sb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .withColumn("jaccard", round(col("jaccard"), 4))
      .select("gid_a", "gid_b", "jaccard")
  }

  /** Group edges with the same vocabulary gate QX2 applies at doc
    * level: when a bounded probe proves |vocab| <= 64, each distinct
    * set is one 64-bit mask and the pairwise stage is popcount
    * arithmetic over a broadcast nested-loop join — |groups|²/2 cheap
    * register ops instead of the co-occurrence shuffle, which on
    * small-vocabulary corpora (where per-token group frequency ~
    * |groups|) is quadratic ANYWAY but with a join-shaped constant.
    * General vocabularies fall through to groupEdgesGeneral.
    */
  private[queries] def groupEdgesGated(groups: DataFrame, threshold: Double): DataFrame = {
    val s = groups.sparkSession
    import s.implicits._
    val tok = groups.select(explode(col("toks")).as("token")).distinct()
    val probe = tok.limit(65).as[String].collect()
    if (probe.length > 64) groupEdgesGeneral(groups, threshold)
    else {
      val vocab = broadcast(probe.sorted.zipWithIndex.toSeq.toDF("token", "idx"))
      val masks = groups.select(col("gid"), explode(col("toks")).as("token"))
        .join(vocab, "token")
        .groupBy("gid")
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), idx)")).as("mask"))
      val a = masks.select(col("gid").as("gid_a"), col("mask").as("ma"))
      val b = masks.select(col("gid").as("gid_b"), col("mask").as("mb"))
      a.join(broadcast(b), col("gid_a") < col("gid_b") &&
          bit_count(col("ma").bitwiseAND(col("mb"))).cast("double") /
            bit_count(col("ma").bitwiseOR(col("mb"))) >= threshold)
        .withColumn("jaccard",
          round(bit_count(col("ma").bitwiseAND(col("mb"))).cast("double") /
            bit_count(col("ma").bitwiseOR(col("mb"))), 4))
        .select("gid_a", "gid_b", "jaccard")
    }
  }

  private[queries] def exactJaccardPairs(groups: DataFrame, threshold: Double): DataFrame =
    expandEdges(groups, groupEdgesGeneral(groups, threshold))

  /** Same exact J >= t pair set, but through the vocabulary-gated
    * edge generator (mask popcount when vocab <= 64, co-occurrence
    * otherwise — GeneralVocabSpec proves the two agree). The xr5/xr6
    * certifications use this as their in-query exact baseline so the
    * shared setGroups frame is tokenized once per certification.
    */
  private[queries] def exactJaccardPairsGated(groups: DataFrame, threshold: Double): DataFrame =
    expandEdges(groups, groupEdgesGated(groups, threshold))

  /** Group edges -> ordered doc pairs, plus the intra-group J=1 pairs. */
  private def expandEdges(groups: DataFrame, edges: DataFrame): DataFrame = {
    val g1 = groups.select(col("gid").as("gid_a"), col("ids").as("ids_a"))
    val g2 = groups.select(col("gid").as("gid_b"), col("ids").as("ids_b"))
    val cross = edges.join(Scale.maybeBroadcast(g1), "gid_a")
      .join(Scale.maybeBroadcast(g2), "gid_b")
    intraPairs(groups, lit(1.0), "jaccard")
      .unionByName(expandPairs(cross, "jaccard"))
  }

  /** Cross-side exact J >= t edges between two DISJOINT group tables —
    * the bipartite form of groupEdgesGeneral, for incremental dedup
    * (new batch vs indexed corpus). ga: (gid_a, toks_a, h_a, sa);
    * gb: (gid_b, toks_b, h_b, sb). A gid present on both sides IS a
    * legal edge (identical token set across sides, J = 1).
    */
  private[graft] def crossEdgesGeneral(ga: DataFrame, gb: DataFrame,
      threshold: Double): DataFrame = {
    val ta = ga.select(col("gid_a"), col("sa"), explode(col("h_a")).as("token"))
    val tb = gb.select(col("gid_b"), col("sb"), explode(col("h_b")).as("token"))
    ta.join(tb, "token")
      .groupBy("gid_a", "sa", "gid_b", "sb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .withColumn("jaccard", round(col("jaccard"), 4))
      .select("gid_a", "gid_b", "jaccard")
  }

  /** crossEdgesGeneral behind the same measured vocabulary gate as
    * groupEdgesGated: when |vocab| <= 64 each side becomes one 64-bit
    * mask per group and the bipartite pairing is popcount arithmetic
    * over a broadcast nested-loop join — the BATCH side (gb) is the
    * broadcast, matching the incremental-dedup asymmetry (a daily batch
    * is orders of magnitude smaller than the indexed corpus it joins).
    * vocabSrc supplies the vocabulary probe (the full group table, so
    * both sides share one token index).
    */
  private[queries] def crossEdgesGated(vocabSrc: DataFrame, ga: DataFrame,
      gb: DataFrame, threshold: Double): DataFrame = {
    val s = vocabSrc.sparkSession
    import s.implicits._
    val tok = vocabSrc.select(explode(col("toks")).as("token")).distinct()
    val probe = tok.limit(65).as[String].collect()
    if (probe.length > 64) crossEdgesGeneral(ga, gb, threshold)
    else {
      val vocab = broadcast(probe.sorted.zipWithIndex.toSeq.toDF("token", "idx"))
      def masks(g: DataFrame, gid: String, toks: String, out: String) =
        g.select(col(gid), explode(col(toks)).as("token"))
          .join(vocab, "token")
          .groupBy(gid)
          .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), idx)")).as(out))
      val ma = masks(ga, "gid_a", "toks_a", "mask_a")
      val mb = masks(gb, "gid_b", "toks_b", "mask_b")
      ma.join(broadcast(mb),
          bit_count(col("mask_a").bitwiseAND(col("mask_b"))).cast("double") /
            bit_count(col("mask_a").bitwiseOR(col("mask_b"))) >= threshold)
        .withColumn("jaccard",
          round(bit_count(col("mask_a").bitwiseAND(col("mask_b"))).cast("double") /
            bit_count(col("mask_a").bitwiseOR(col("mask_b"))), 4))
        .select("gid_a", "gid_b", "jaccard")
    }
  }

  /** Static side of STREAMING incremental dedup (StreamingOps
    * .incrementalDedup): one row per distinct corpus token set with its
    * 64-bit vocabulary mask, true set size, and min member doc id,
    * plus the sorted vocabulary the masks index into. Materialized
    * eagerly (a streaming job probes it every micro-batch — it must be
    * built once, not per batch). None when the corpus vocabulary
    * exceeds 64 tokens: the mask form cannot represent it, and the
    * streaming caller should run the general crossEdgesGated per
    * micro-batch via foreachBatch instead.
    */
  private[graft] def maskIndex(docs: DataFrame)
      : Option[(DataFrame, Seq[String])] = {
    val s = docs.sparkSession
    import s.implicits._
    val groups = setGroups(docs)
    val probe = groups.select(explode(col("toks")).as("token")).distinct()
      .limit(65).as[String].collect()
    if (probe.length > 64) { groups.unpersist(); None }
    else {
      val vocab = probe.sorted.toSeq
      val vdf = broadcast(vocab.zipWithIndex.toDF("token", "idx"))
      val idx = own(groups
        .select(col("gid"), col("sz"), element_at(col("ids"), 1).as("min_id"),
          explode(col("toks")).as("token"))
        .join(vdf, "token")
        .groupBy("gid", "sz", "min_id")
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), idx)")).as("mask"))
        .persist())
      idx.count() // force: the index is the long-lived static side
      groups.unpersist()
      Some((idx, vocab))
    }
  }

  /** xd6: incremental dedup — match TODAY'S BATCH (doc_id % 5 == 0, the
    * stand-in for a new crawl increment) against the ALREADY-INDEXED
    * CORPUS (the rest), reporting each batch document's best corpus
    * match at J >= 0.8 (ties: lowest corpus doc_id). This is the shape
    * a production pipeline actually runs daily: the corpus side's
    * distinct-set groups are the persisted index, only cross-side pairs
    * are ever generated (never corpus x corpus), and the batch side is
    * the broadcast/small side throughout. Oracle-matched.
    */
  val xd6 = GQuery(
    "xd6_incremental_dedup",
    (s, d) => reap {
      val c = Ctx(s, d)
      val groups = setGroups(c.documents)
      // one tokenize+group pass serves both sides: a distinct set's
      // members are split by side, and a set spanning both sides is a
      // (corpus gid, batch gid) self-edge with J = 1
      val sides = groups.select(col("gid"), col("toks"), col("htoks"), col("sz"),
        expr("filter(ids, i -> i % 5 != 0)").as("ids_corpus"),
        expr("filter(ids, i -> i % 5 = 0)").as("ids_batch"))
      val ga = sides.filter(size(col("ids_corpus")) > 0)
        .select(col("gid").as("gid_a"), col("toks").as("toks_a"),
          col("htoks").as("h_a"), col("sz").as("sa"),
          element_at(col("ids_corpus"), 1).as("min_a")) // ids sorted: min member
      val gb = sides.filter(size(col("ids_batch")) > 0)
        .select(col("gid").as("gid_b"), col("toks").as("toks_b"),
          col("htoks").as("h_b"), col("sz").as("sb"), col("ids_batch"))
      val edges = crossEdgesGated(groups, ga, gb, 0.8)
      // best match per batch group: max rounded jaccard, then lowest
      // corpus doc id — lexicographic max over (jaccard, -min_a)
      val best = edges
        .join(Scale.maybeBroadcast(ga.select(col("gid_a"), col("min_a"))), "gid_a")
        .groupBy("gid_b")
        .agg(max(struct(col("jaccard"), (-col("min_a")).as("neg"))).as("best"))
        .select(col("gid_b"), col("best.jaccard").as("jaccard"),
          (-col("best.neg")).as("match_id"))
      canon(gb.select(col("gid_b"), explode(col("ids_batch")).as("doc_id"))
        .join(best, "gid_b")
        .select(col("doc_id"), col("match_id"), col("jaccard")))
    },
    Some(
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, t.token FROM documents,
        |    UNNEST(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS t(token)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
        |pr AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
        |  FROM tok a JOIN tok b ON a.token = b.token
        |  WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT db, da, ROUND(inter / (sa.sz + sb.sz - inter), 4) AS jac
        |  FROM pr JOIN sz sa ON pr.da = sa.doc_id JOIN sz sb ON pr.db = sb.doc_id
        |  WHERE inter / (sa.sz + sb.sz - inter) >= 0.8),
        |best AS (
        |  SELECT db AS doc_id, da AS match_id, jac AS jaccard,
        |    ROW_NUMBER() OVER (PARTITION BY db ORDER BY jac DESC, da ASC) AS rn
        |  FROM j)
        |SELECT doc_id, match_id, jaccard FROM best WHERE rn = 1""".stripMargin +
        orderAll("doc_id", "match_id", "jaccard")))

  /** n-gram (3-shingle) Jaccard: ORDER-SENSITIVE near-dup, unlike the
    * token-set Jaccard (QX2). Candidates come from an equality join on
    * shingles (docs sharing none can't have J>0), counted once per
    * pair; sizes ride the exploded rows as an explicit column.
    * Oracle-matched.
    */
  private[queries] def shinglePairs(docs: DataFrame, threshold: Double): DataFrame = {
    // The hashed-shingle arrays are the expensive projection
    // (interpreted HOF over every document) and both self-join sides
    // need them — persist() the narrow rows so the HOF runs once
    // (persist beats localCheckpoint here: no eager job, no disk
    // write). The equality self-join on the LONG shingle hashes feeds
    // the pair-count aggregation; the distinct-shingle count rides
    // along as its own column (an earlier packed doc_id*2^10+size long
    // silently corrupted docs with >=1024 distinct shingles — spec'd
    // against in GeneralVocabSpec). (At corpus sizes where the shingle
    // join outgrows memory the scale path is PPJoin prefix filtering —
    // join only each set's rarest n-ceil(t*n)+1 shingles under a
    // global rarity order, then verify survivors exactly; measured
    // slower here because its two ranking windows exceed the whole
    // join's cost at 5k docs.)
    // shingle ids come from the fused ShingleHash kernel (one pass,
    // identical longs to the declarative xxhash64-over-concat form —
    // TextOpsSpec) instead of an interpreted transform + array_distinct
    graft.functions.TextOps.register(docs.sparkSession)
    val base = own(docs
      .select(col("doc_id"), Llm.tokens(docs.sparkSession, col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        call_function("shingle_hash", col("toks"), lit(3)).as("sids"))
      .select(col("doc_id"), size(col("sids")).as("sz"), col("sids"))
      .persist())
    val sh = base.select(col("doc_id"), col("sz"), explode(col("sids")).as("sid"))
    val j = sh.as("a").join(sh.as("b"),
        col("a.sid") === col("b.sid") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("a.sz").as("sa"),
        col("b.doc_id").as("doc_b"), col("b.sz").as("sb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jaccard") >= threshold)
    canon(j.select(col("doc_a"), col("doc_b"),
      round(col("jaccard"), 4).as("jaccard")))
  }

  val xd3 = GQuery(
    "xd3_shingle_jaccard",
    (s, d) => reap(shinglePairs(Ctx(s, d).documents, 0.7)),
    Some(
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, t.shingle FROM (
        |    SELECT doc_id,
        |      list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
        |    FROM documents) d,
        |    UNNEST(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS t(shingle)
        |  WHERE len(toks) >= 3),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        |pr AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  ROUND(inter / (sa.sz + sb.sz - inter), 4) AS jaccard
        |FROM pr JOIN sz sa ON pr.doc_a = sa.doc_id JOIN sz sb ON pr.doc_b = sb.doc_id
        |WHERE inter / (sa.sz + sb.sz - inter) >= 0.7""".stripMargin +
        orderAll("doc_a", "doc_b", "jaccard")))

  /** Embedding-cosine near-dup pairs (threshold form of QX3): all
    * ordered pairs with cosine >= 0.45. Norms precomputed once per
    * vector, pairwise via the codegen'd vec_dot over a size-gated
    * broadcast nested-loop join — nothing collect()ed by this code;
    * if the reference side outgrows the broadcast threshold the gate
    * falls back to a shuffled plan. The join output is projected to
    * narrow (doc_a, doc_b, score) rows immediately, and the threshold
    * filter runs inside the same codegen stage, so only survivors are
    * ever materialized. Oracle-matched.
    */
  val xd4 = GQuery(
    "xd4_cosine_dup",
    (s, d) => {
      val c = Ctx(s, d)
      graft.functions.VectorOps.register(s)
      val e = c.embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
      val a = e.select(col("vec_id").as("doc_a"), col("v").as("va"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("doc_b"), col("v").as("vb"), col("nrm").as("nb"))
      val pairs = a.join(Scale.maybeBroadcast(b), col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          round4(expr("vec_dot(va, vb)") / (col("na") * col("nb"))).as("score"))
        .filter(col("score") >= 0.45)
      canon(pairs)
    },
    Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
        |  ROUND(list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS score
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE ROUND(list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.45""".stripMargin +
        orderAll("doc_a", "doc_b", "score")))

  /** xd9: character edit-distance near-dup — all pairs with Levenshtein
    * distance <= K. Completes the dedup family with the string-metric
    * axis (exact md5 / set Jaccard / shingle Jaccard / SimHash /
    * embedding cosine / edit distance).
    *
    * Candidate generation is a binned length-band join (q11b's shape):
    * edit distance >= |len_a - len_b|, so only pairs within a length
    * band of K can qualify. Lengths are bucketed into bins of width
    * K+1; the probe side explodes the <=3 bins overlapping
    * [len-K, len+K] and the build side carries its single own bin, so
    * every qualifying pair meets on an equi-key EXACTLY once —
    * candidates are O(n · docs-per-band), never the n² cross join, and
    * the join is a plain shuffle on the bin key that AQE skew-splits if
    * one length dominates. Verification uses the threshold-bounded
    * levenshtein (banded O(K·len) DP that early-exits and returns -1
    * past K) — never the full O(len²) table. At 100 TB the same plan
    * holds; if bands are still too dense, PassJoin segment blocking
    * (pigeonhole: one of K+1 contiguous segments must match exactly)
    * composes in front of the DP as a second equi-join stage.
    * Oracle-matched (DuckDB levenshtein behind the same sound band
    * prefilter).
    */
  private[queries] def editDistancePairs(docs: DataFrame, k: Int): DataFrame = {
    val w = k + 1
    val d0 = docs.select(col("doc_id"), col("text"),
      length(col("text")).as("len"))
    val probe = d0
      .withColumn("bin",
        explode(expr(s"sequence(greatest(len - $k, 0) DIV $w, (len + $k) DIV $w)")))
      .select(col("doc_id").as("doc_a"), col("text").as("ta"),
        col("len").as("la"), col("bin"))
    val build = d0
      .select(col("doc_id").as("doc_b"), col("text").as("tb"),
        col("len").as("lb"), expr(s"len DIV $w").as("bin"))
    val pairs = probe.join(build, Seq("bin"))
      .filter(col("doc_a") < col("doc_b") &&
        abs(col("la") - col("lb")) <= k)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb"), k).as("dist"))
      .filter(col("dist") >= 0)
    canonBy(pairs, "doc_a", "doc_b")
  }

  val xd9 = GQuery(
    "xd9_edit_distance",
    (s, d) => editDistancePairs(Ctx(s, d).documents, 10),
    Some(
      // levenshtein is computed ONCE per banded pair (subquery), not
      // re-evaluated in the WHERE clause — DuckDB runs the full
      // O(len²) DP with no threshold cutoff, so each evaluation is
      // ~100x Spark's banded-DP cost and doubling it matters
      """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |lv AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(levenshtein(a.text, b.text) AS INT) AS dist
        |  FROM d a JOIN d b
        |    ON a.doc_id < b.doc_id AND b.len BETWEEN a.len - 10 AND a.len + 10)
        |SELECT doc_a, doc_b, dist FROM lv WHERE dist <= 10""".stripMargin +
        orderAll("doc_a", "doc_b")))

  /** Containment (asymmetric Jaccard) near-dup: |A∩B| / |A| ≥ 0.9 —
    * catches PARTIAL duplication symmetric Jaccard misses: a short doc
    * quoted wholesale inside a longer one has containment ~1 but low
    * Jaccard (the union is dominated by the long doc). Directed
    * output (doc_in, doc_of, containment): doc_in's token set is
    * ~contained in doc_of's. Shape: ONE undirected group-level
    * co-occurrence join (the qx2 general-vocabulary path over
    * distinct token-set groups) emits BOTH directions per group pair;
    * identical-set groups contribute member pairs at containment 1.0
    * both ways. Same 100 TB posture as the Jaccard family: linear
    * shuffle on hashed tokens, pairs born at group (not doc)
    * granularity and kept NARROW until after the direction filter
    * (see expandContainment).
    */
  /** xd10's core over a setGroups table — directed (doc_in, doc_of,
    * containment) pairs at containment >= t. Factored out so specs can
    * run it on synthetic corpora (asymmetric direction, empty-set
    * docs) without a parquet fixture.
    */
  /** df cap separating HOT tokens (stop words, markup — the Σdf²
    * blow-up drivers of any token-equality join) from cold ones, as a
    * multiple of the mean token df. Hot tokens leave the co-occurrence
    * join entirely; exactness is restored by per-direction slack and a
    * hot-dominated secondary generator (see containmentPairs).
    */
  private val HotDfFactor = 8.0
  private val HotDfFloor = 64L

  /** Candidate (gid_a < gid_b) pairs for containment >= t with the
    * HOT-TOKEN GUARD: the equality join runs over COLD tokens only,
    * and sets so hot-dominated that a qualifying partner needn't share
    * any cold token are covered by a rarity-ordered prefix join.
    *
    * Exactness of the union (direction a→b, containment >= t means a
    * misses at most (1-t)·|a| of its own tokens from b):
    *  - if a and b share >= 1 COLD token, the cold join emits the
    *    pair;
    *  - otherwise every shared token is hot, so ALL of a's cold
    *    tokens are misses: #cold(a) <= (1-t)·|a| — a is
    *    HOT-DOMINATED. For those (few) sets, join a's first
    *    k = floor(|a|(1-t)) + 2 tokens under ascending-df order
    *    against the full token table: if all k were missing the miss
    *    budget is already blown, so a qualifying b shares one. The +2
    *    (tight bound is +1) absorbs double rounding at
    *    exact-threshold ratios — the 0.8-has-no-binary-form trap qx2
    *    documents.
    * Quadratic work therefore survives only INSIDE the hot-dominated
    * subpopulation — docs that are >=90% stop words, the degenerate
    * near-dups a curation pipeline drops anyway — while a universal
    * token on a normal corpus generates zero candidates.
    */
  private[queries] def containmentCandidates(groups: DataFrame,
      t: Double): DataFrame = {
    val (dfreq, hotCap, _) = hotStats(groups)
    containmentCandidates(groups, t, dfreq, hotCap)
  }

  private def containmentCandidates(groups: DataFrame, t: Double,
      dfreq: DataFrame, hotCap: Long): DataFrame = {
    val gtok = groups.select(col("gid"), col("sz"),
      explode(col("htoks")).as("token"))
    val tagged = gtok.join(Scale.maybeBroadcast(dfreq), "token")
    val coldPairs = {
      val gcold = tagged.filter(col("df") <= hotCap)
        .select(col("gid"), col("token"))
      gcold.as("a").join(gcold.as("b"),
          col("a.token") === col("b.token") && col("a.gid") < col("b.gid"))
        .select(col("a.gid").as("gid_a"), col("b.gid").as("gid_b"))
        .distinct()
    }
    val hotDomPrefix = tagged
      .groupBy(col("gid"), col("sz"))
      .agg(expr("transform(array_sort(collect_list(struct(df, token))), " +
        "p -> p.token)").as("rare"),
        sum(when(col("df") <= hotCap, 1L).otherwise(0L)).as("n_cold"))
      .filter(col("n_cold") <=
        expr(s"CAST(floor(sz * ${1.0 - t}) AS BIGINT) + 2"))
      .select(col("gid"), explode(expr(
        s"slice(rare, 1, CAST(floor(sz * ${1.0 - t}) AS INT) + 2)"))
        .as("token"))
    val hotDomPairs = hotDomPrefix.as("a").join(gtok.as("b"),
        col("a.token") === col("b.token") && col("a.gid") =!= col("b.gid"))
      .select(least(col("a.gid"), col("b.gid")).as("gid_a"),
        greatest(col("a.gid"), col("b.gid")).as("gid_b"))
      .distinct()
    coldPairs.unionByName(hotDomPairs).distinct()
  }

  /** Token df table (persisted — vocabulary-sized, bounded at any
    * corpus scale), the driver-bounded hot cap max(HotDfFloor,
    * HotDfFactor × mean df), and whether any token exceeds it — ONE
    * aggregate action over the cached df table serves all three, so
    * the corpus-token explode+count shuffle runs exactly once however
    * many consumers read df downstream.
    */
  private def hotStats(groups: DataFrame): (DataFrame, Long, Boolean) = {
    val dfreq = own(groups
      .select(explode(col("htoks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .persist())
    val r = dfreq.agg(avg(col("df")).as("a"), max(col("df")).as("m")).head
    val hotCap =
      math.max(HotDfFloor, math.ceil(r.getDouble(0) * HotDfFactor).toLong)
    (dfreq, hotCap, r.getLong(1) > hotCap)
  }

  private[queries] def containmentPairs(groups: DataFrame,
      t: Double): DataFrame = {
    val s = groups.sparkSession
    import s.implicits._
    // vocabulary probe (qx2's gate, one bounded 65-row action): at
    // <=64 tokens every set is a bitmask and the exact intersection is
    // one popcount — a G×G broadcast theta join with a threshold
    // prefilter (inter/min(sa,sb) qualifies in SOME direction), vs the
    // dense small-vocab corpus's co-occurrence join whose row count is
    // Σ_token df² (~100M at sf0.1, the query's former dominant cost).
    val vprobe = groups.select(explode(col("toks")).as("token"))
      .distinct().limit(65).as[String].collect()
    if (vprobe.length <= 64) {
      // per-group mask via the same inline-map aggregate qx2's scan
      // uses: no explode, no vocab join, no shuffle (tokens are [a-z]+
      // by the tokenizer's construction, safe to quote)
      val mapSql = vprobe.sorted.zipWithIndex
        .map { case (tk, i) => s"'$tk', $i" }.mkString("map(", ", ", ")")
      // kmin = smallest integer k with (double)k / (double)sz >= t,
      // precomputed once per group (G rows): by monotonicity of
      // k -> k/sz, `inter >= least(ka, kb)` is EXACTLY `inter/sa >= t
      // OR inter/sb >= t` — the same double-division boundary dirs
      // re-applies downstream — but the G×G inner loop pays ONE
      // popcount + ONE integer compare instead of a popcount and two
      // divides. sz = 0 is guarded FIRST (CASE WHEN short-circuits, so
      // the ANSI-throwing /0 never evaluates): kmin 1 > the only
      // possible intersection 0 — the same "an empty set never
      // qualifies in either direction" outcome as the division form.
      val k0 = ceil(col("sz") * lit(t)).cast("long")
      val withMask = groups.withColumn("mask", expr(
        s"""aggregate(toks, CAST(0 AS BIGINT),
           |  (m, tk) -> m | shiftleft(CAST(1 AS BIGINT), $mapSql[tk]))"""
          .stripMargin))
        .withColumn("kmin",
          when(col("sz") === 0, lit(1L))
            .when((k0 - 1).cast("double") / col("sz") >= t, k0 - 1)
            .when(k0.cast("double") / col("sz") >= t, k0)
            .otherwise(k0 + 1))
      val a = withMask.select(col("gid").as("gid_a"), col("sz").as("sa"),
        col("mask").as("ma"), col("kmin").as("ka"))
      val b = withMask.select(col("gid").as("gid_b"), col("sz").as("sb"),
        col("mask").as("mb"), col("kmin").as("kb"))
      val inter = bit_count(col("ma").bitwiseAND(col("mb"))).cast("long")
      val und = a.join(broadcast(b), col("gid_a") < col("gid_b") &&
          inter >= least(col("ka"), col("kb")))
        .select(col("gid_a"), col("sa"), col("gid_b"), col("sb"),
          inter.as("inter"))
      return expandContainment(groups, und, t)
    }
    val gtok = groups.select(col("gid"), col("sz"),
      explode(col("htoks")).as("token"))
    val (dfreq, hotCap, anyHot) = hotStats(groups)
    val und: DataFrame =
      if (!anyHot) {
        // no hot tokens: the co-occurrence join's row count IS the
        // exact intersection — count it in one partial-aggregated
        // pass, no candidate materialization, no array re-walk (the
        // fast shape for dense small-vocabulary corpora, where the
        // candidate set is ~all pairs by nature)
        gtok.as("a").join(gtok.as("b"),
            col("a.token") === col("b.token") && col("a.gid") < col("b.gid"))
          .groupBy(col("a.gid").as("gid_a"), col("a.sz").as("sa"),
            col("b.gid").as("gid_b"), col("b.sz").as("sb"))
          .agg(count(lit(1)).as("inter"))
      } else {
        // hot tokens present: guarded candidate generation, then the
        // exact intersection via the codegen'd sorted merge-walk on
        // the hashed arrays — only candidates pay it
        graft.functions.ArrayOps.register(groups.sparkSession)
        val g1 = groups.select(col("gid").as("gid_a"),
          col("htoks").as("h_a"), col("sz").as("sa"))
        val g2 = groups.select(col("gid").as("gid_b"),
          col("htoks").as("h_b"), col("sz").as("sb"))
        containmentCandidates(groups, t, dfreq, hotCap)
          .join(Scale.maybeBroadcast(g1), "gid_a")
          .join(Scale.maybeBroadcast(g2), "gid_b")
          .withColumn("inter",
            expr("sorted_intersect_count(h_a, h_b)").cast("long"))
          .filter(col("inter") > 0)
          .select(col("gid_a"), col("sa"), col("gid_b"), col("sb"),
            col("inter"))
      }
    expandContainment(groups, und, t)
  }

  /** Undirected qualifying group pairs -> the directed doc-level
    * containment report (both directions re-checked at the same
    * double-division threshold) plus the intra-group J=1 pairs.
    *
    * und must be NARROW — (gid_a, sa, gid_b, sb, inter), no member-id
    * arrays: both directions are emitted in ONE explode pass per pair
    * (no union, so und has a single consumer and needs no persist),
    * and the id arrays are attached only to the rows that SURVIVE the
    * direction filter, from a size-gated broadcast of the group
    * table. The r7 shape widened every candidate with both id arrays
    * before filtering and persisted that 2.5M-row stream to feed two
    * direction projections — measured ~2× this plan at sf0.1.
    */
  private def expandContainment(groups: DataFrame, und: DataFrame,
      t: Double): DataFrame = {
    val dirs = und.select(explode(array(
        struct(col("gid_a").as("gid_in"), col("sa").as("sz_in"),
          col("gid_b").as("gid_of"), col("inter")),
        struct(col("gid_b").as("gid_in"), col("sb").as("sz_in"),
          col("gid_a").as("gid_of"), col("inter")))).as("e"))
      .select(col("e.gid_in").as("gid_in"), col("e.sz_in").as("sz_in"),
        col("e.gid_of").as("gid_of"), col("e.inter").as("inter"))
      .withColumn("containment", col("inter").cast("double") / col("sz_in"))
      .filter(col("containment") >= t)
    val gIn = groups.select(col("gid").as("gid_in"), col("ids").as("ids_in"))
    val gOf = groups.select(col("gid").as("gid_of"), col("ids").as("ids_of"))
    val cross = dirs
      .join(Scale.maybeBroadcast(gIn), "gid_in")
      .join(Scale.maybeBroadcast(gOf), "gid_of")
      .select(explode(expr(
        "flatten(transform(ids_in, a -> transform(ids_of, b -> named_struct('a', a, 'b', b))))"))
        .as("p"), round(col("containment"), 4).as("containment"))
      .select(col("p.a").as("doc_in"), col("p.b").as("doc_of"),
        col("containment"))
    // sz > 0: token-less docs (empty set) have UNDEFINED containment
    // (0/0) — the oracle emits nothing for them, so the intra branch
    // must not claim containment 1.0
    val intra = groups.filter(size(col("ids")) >= 2 && col("sz") > 0)
      .select(explode(expr(
        """filter(flatten(transform(ids, a -> transform(ids, b -> named_struct('a', a, 'b', b)))),
          |       p -> p.a <> p.b)""".stripMargin)).as("p"))
      .select(col("p.a").as("doc_in"), col("p.b").as("doc_of"),
        lit(1.0).as("containment"))
    intra.unionByName(cross)
  }

  val xd10 = GQuery(
    "xd10_containment",
    (s, d) => reap {
      val c = Ctx(s, d)
      // (doc_in, doc_of) is unique by construction (groups partition
      // docs; each directed pair is emitted once) — sort the 8M-row
      // output on the two-long key prefix, not the double too.
      // canonBy's preSort localCheckpoint already materializes the
      // pair stream ONCE before the global orderBy's two passes
      // (range-boundary sampling, then the sort) — the r13 persist()
      // on top of it wrote the same 8M narrow rows into the block
      // store a second time for no extra reuse (measured: the two
      // copies were ~500 MB of block residue and ~3.5 s of GC inside
      // this query's window; guide §5 — unpersist what isn't reused).
      canonBy(containmentPairs(setGroups(c.documents), 0.9),
        "doc_in", "doc_of")
    },
    Some(
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, t.token FROM documents,
        |    UNNEST(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS t(token)),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM tok GROUP BY 1),
        |pr AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
        |  FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da AS doc_in, db AS doc_of, ROUND(inter / sa.sz, 4) AS containment
        |FROM pr JOIN sz sa ON pr.da = sa.doc_id
        |WHERE inter / sa.sz >= 0.9""".stripMargin +
        orderAll("doc_in", "doc_of")))

  /** Duplicated-SPAN coverage (exact-substring dedup signal, the
    * word-k-gram approximation of suffix-array training-data dedup):
    * for every document, the fraction of its tokens covered by some
    * 8-gram that also occurs in ANOTHER document. Doc-level dedup
    * (qx1/xd1) misses partial duplication — a boilerplate header or a
    * quoted paragraph inside otherwise-unique pages; span coverage is
    * the per-document gate ("drop or trim docs that are >X% duplicated
    * spans") used on real web corpora.
    *
    * Scale shape: positional k-grams are scan-stage projection; the
    * duplicated-gram set comes from one partial-aggregated count over
    * (gram, doc) pairs (map-side combine collapses a doc's internal
    * repeats); flagging is an equi-join of positions against that set;
    * and coverage is an interval-union in one per-doc window pass —
    * sorted flagged starts, each contributing min(next-start, k)
    * tokens, so overlapping spans are never double-counted. Every
    * exchange is corpus-linear; nothing driver-side. At 100 TB the
    * join/group key becomes the gram's 64-bit hash (xxhash64 at a
    * ~n²/2⁶⁴ false-flag rate) instead of the gram string — the
    * oracle-matched form keeps the exact string so the gate stays
    * collision-free.
    */
  val xd11 = GQuery(
    "xd11_dup_spans",
    (s, d) => {
      val K = 8
      val c = Ctx(s, d)
      val docs = c.documents
        .select(col("doc_id"), Llm.tokens(s, col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          size(col("toks")).cast("long").as("n_tokens"))
      // Gram key = rolling polynomial hash over PRE-HASHED tokens
      // (xt2's Rabin-Karp move), not the 8-token string: the (gram,
      // doc) distinct and the gram-frequency groupBy are the two
      // corpus-sized shuffles here, and 8-byte longs move ~30× less
      // than ~50-byte gram strings — the declared 100 TB shape. The
      // oracle keeps the string form: equality of results certifies
      // the hashed rewrite (64-bit collisions are ~n²/2^64 ≈ 1e-7 at
      // this gram count, and a collision would surface as a hash
      // mismatch at the correctness gate).
      val grams = docs.filter(col("n_tokens") >= K)
        .withColumn("htoks", expr("transform(toks, t -> xxhash64(t))"))
        .select(col("doc_id"), col("n_tokens"), posexplode(expr(
          // chained xxhash64 fold: position-sensitive, overflow-free
          // under ANSI mode (a raw polynomial multiply would throw)
          s"""transform(sequence(1, size(htoks) - ${K - 1}),
             |  i -> aggregate(slice(htoks, i, $K), 1125899906842597L,
             |         (h, x) -> xxhash64(h, x)))""".stripMargin))
          .as(Seq("pos", "kg")))
      val dup = grams.select(col("kg"), col("doc_id")).distinct()
        .groupBy("kg").agg(count(lit(1)).as("nd"))
        .filter(col("nd") > 1).select("kg")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val cov = grams.join(dup, "kg")
        .select(col("doc_id"), col("pos"))
        .withColumn("covered",
          least(coalesce(lead(col("pos"), 1).over(w) - col("pos"), lit(K)),
            lit(K)))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_dup_grams"),
          sum(col("covered")).cast("long").as("covered_tokens"))
      canon(docs.select(col("doc_id"), col("n_tokens"))
        .join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
          coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
          round(coalesce(col("covered_tokens"), lit(0L)).cast("double") /
            col("n_tokens"), 6).as("dup_frac")))
    },
    Some(
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
        |  FROM documents),
        |dd AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens FROM d),
        |g AS (
        |  SELECT doc_id, CAST(u.i AS INT) AS pos,
        |    array_to_string(toks[CAST(u.i AS INT): CAST(u.i AS INT) + 7], ' ') AS kg
        |  FROM dd, UNNEST(range(1, CAST(n_tokens AS INT) - 6)) AS u(i)
        |  WHERE n_tokens >= 8),
        |dup AS (SELECT kg FROM (
        |    SELECT kg, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY kg) WHERE nd > 1),
        |f AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (kg)),
        |cov AS (SELECT doc_id,
        |    LEAST(COALESCE(LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) - pos, 8), 8) AS covered
        |  FROM f),
        |agg AS (SELECT doc_id, COUNT(*) AS n_dup_grams,
        |    CAST(SUM(covered) AS BIGINT) AS covered_tokens FROM cov GROUP BY doc_id)
        |SELECT dd.doc_id, dd.n_tokens,
        |  COALESCE(a.n_dup_grams, 0) AS n_dup_grams,
        |  COALESCE(a.covered_tokens, 0) AS covered_tokens,
        |  ROUND(COALESCE(a.covered_tokens, 0) / CAST(dd.n_tokens AS DOUBLE), 6) AS dup_frac
        |FROM dd LEFT JOIN agg a USING (doc_id)""".stripMargin +
        orderAll("doc_id", "n_tokens", "n_dup_grams", "covered_tokens",
          "dup_frac")))

  /** xd12: eval-set contamination ATTRIBUTION — the pair-level
    * companion to xc3's decontamination flag. xc3 answers "which
    * training docs touch the benchmark at all" (any shared 3-shingle,
    * per-doc count); a removal/quarantine policy then needs WHICH
    * benchmark doc each hit matches and HOW MUCH of the training doc
    * is contaminated — this query's output: every (training doc,
    * benchmark doc) pair sharing >= 3 distinct 5-word shingles, with
    * the contaminated fraction of the TRAINING doc (GPT-3 app. C and
    * PaLM §8 both report and threshold exactly this pairwise overlap
    * statistic; 5 words is the fixture analog of their 8–13-gram
    * windows — docs here average ~50 tokens). The benchmark is the
    * deterministic doc_id%20=0 slice standing in for an external eval
    * table.
    *
    * Scale shape: both sides reduce to distinct shingle HASHES
    * (fused ShingleHash kernel — one scan-stage pass, longs not
    * strings) before anything joins. The benchmark side is tiny by
    * nature (eval suites are ~1e3–1e6 docs vs a 100 TB corpus), so it
    * size-gate-broadcasts into the corpus scan: the corpus is read
    * ONCE, never shuffled — hits leave the scan stage as narrow
    * (doc, bench, sz) rows and only those aggregate. With a >threshold
    * benchmark the same plan degrades to a shuffled join on the
    * shingle hash, still narrow. Counts are exact integers; one
    * rounded divide at the end (oracle-matched).
    */
  val xd12 = GQuery(
    "xd12_decontaminate",
    (s, d) => {
      val c = Ctx(s, d)
      graft.functions.TextOps.register(s)
      val base = c.documents
        .select(col("doc_id"), Llm.tokens(s, col("text")).as("toks"))
        .filter(size(col("toks")) >= 5)
        .select(col("doc_id"),
          call_function("shingle_hash", col("toks"), lit(5)).as("sids"))
      val bench = base.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("bench_id"), explode(col("sids")).as("sid"))
      val corpus = base.filter(col("doc_id") % 20 =!= 0)
        .select(col("doc_id"), size(col("sids")).as("sz"),
          explode(col("sids")).as("sid"))
      val hits = corpus.join(Scale.maybeBroadcast(bench), Seq("sid"))
        .groupBy(col("doc_id"), col("bench_id"), col("sz"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
      canon(hits.select(col("doc_id"), col("bench_id"),
        col("n_shared"),
        round(col("n_shared").cast("double") / col("sz"), 4)
          .as("contaminated_frac")))
    },
    Some(
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, t.shingle FROM (
        |    SELECT doc_id,
        |      list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '') AS toks
        |    FROM documents) d,
        |    UNNEST(list_transform(range(1, len(toks) - 3),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
        |           toks[i+3] || ' ' || toks[i+4])) AS t(shingle)
        |  WHERE len(toks) >= 5),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh WHERE doc_id % 20 <> 0 GROUP BY 1),
        |hits AS (
        |  SELECT c.doc_id, b.doc_id AS bench_id, COUNT(*) AS n_shared
        |  FROM sh c JOIN sh b ON c.shingle = b.shingle
        |  WHERE c.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
        |  GROUP BY 1, 2)
        |SELECT doc_id, h.bench_id, h.n_shared,
        |  ROUND(CAST(h.n_shared AS DOUBLE) / sz.sz, 4) AS contaminated_frac
        |FROM hits h JOIN sz USING (doc_id)
        |WHERE h.n_shared >= 3""".stripMargin +
        orderAll("doc_id", "bench_id", "n_shared", "contaminated_frac")))

  def queries: Seq[GQuery] =
    Seq(xd1, xd1b, xd2, xd2b, xd3, xd4, xd6, xd9, xd10, xd11, xd12)
}
