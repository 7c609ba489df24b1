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
  * token-set groups (mask-keyed): signatures are computed once per
  * distinct set, band joins emit narrow (mask_a, mask_b) pairs that are
  * DISTINCT'ed before verification, and member doc-ids are expanded
  * only for the final qualifying pairs (the output itself).
  *
  * Deterministic throughout (xxhash64, fixed seeds) ⇒ stable across
  * runs and cluster sizes; ⊘ rows-only for the driver, recall-tested
  * against the exact variants in SketchRecallSpec.
  */
object Dedup {

  private val NumPerms = 64
  private val BandRows = 4 // 16 bands x 4 rows: P(cand | J=0.8) ~ 0.9998

  /** (doc_id, toks, mask): distinct-token array + vocab bitmask per doc. */
  private[queries] def docMasks(c: Ctx): DataFrame = {
    val tok = c.documents
      .select(col("doc_id"), explode(Llm.tokens(col("text"))).as("token"))
      .distinct()
    val vocab = tok.select("token").distinct()
      .withColumn("idx", row_number().over(Window.orderBy("token")) - 1)
    tok.join(broadcast(vocab), "token")
      .groupBy("doc_id")
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), idx)")).as("mask"),
        sort_array(collect_list("token")).as("toks"))
  }

  /** One row per distinct token set: mask, member ids, the set.
    * persist(): four plan branches consume this (signatures, intra
    * pairs, both sides of the verify join) — without it the whole
    * tokenize+vocab+groupBy subplan re-executes per branch. */
  private def maskGroups(c: Ctx): DataFrame =
    docMasks(c).groupBy("mask")
      .agg(sort_array(collect_list("doc_id")).as("ids"),
        first(col("toks")).as("toks"))
      .persist()

  /** Expand qualifying group pairs to ordered doc-id pairs. */
  private def expandPairs(groupPairs: DataFrame, extra: String): DataFrame =
    groupPairs
      .select(explode(expr(
        "flatten(transform(ids_a, a -> transform(ids_b, b -> named_struct('a', a, 'b', b))))"))
        .as("p"), col(extra))
      .select(least(col("p.a"), col("p.b")).as("doc_a"),
        greatest(col("p.a"), col("p.b")).as("doc_b"), col(extra))

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
    (s, d) => {
      val c = Ctx(s, d)
      val groups = maskGroups(c)
      val sigs = groups
        .withColumn("sig", expr(
          s"""transform(sequence(0, ${NumPerms - 1}),
             |  i -> array_min(transform(toks, t -> xxhash64(i, t))))""".stripMargin))
      // band keys over distinct sets; emit narrow (band_key, mask) rows
      val banded = sigs
        .select(col("mask"),
          explode(expr(
            s"transform(sequence(0, ${NumPerms / BandRows - 1}), " +
              s"b -> xxhash64(b, slice(sig, b * $BandRows + 1, $BandRows)))"))
            .as("band_key"))
      val candMasks = banded.as("a").join(banded.as("b"), Seq("band_key"))
        .select(col("a.mask").as("mask_a"), col("b.mask").as("mask_b"))
        .filter(col("mask_a") < col("mask_b"))
        .distinct()
      // exact popcount verify, then expand member ids
      val g1 = groups.select(col("mask").as("mask_a"), col("ids").as("ids_a"))
      val g2 = groups.select(col("mask").as("mask_b"), col("ids").as("ids_b"))
      val qualifying = candMasks.join(g1, "mask_a").join(g2, "mask_b")
        .withColumn("inter", bit_count(col("mask_a").bitwiseAND(col("mask_b"))))
        .withColumn("uni", bit_count(col("mask_a").bitwiseOR(col("mask_b"))))
        .withColumn("jaccard",
          round(col("inter").cast("double") / col("uni"), 4))
        .filter(col("inter").cast("double") / col("uni") >= 0.8)
      // ⊘ rows-only contract: no canonical sort — ordering a ~3M-pair
      // output would dominate the query's own cost.
      intraPairs(groups, lit(1.0), "jaccard")
        .unionByName(expandPairs(qualifying, "jaccard"))
    },
    None)

  /** SimHash over the token SET (unweighted variant — consistent with
    * the set-based Jaccard family above; term-weighted SimHash would
    * band per document and lose the distinct-set compression).
    */
  val xd2 = GQuery(
    "xd2_simhash",
    (s, d) => {
      val c = Ctx(s, d)
      val groups = maskGroups(c)
      val sigs = groups.withColumn("sim", expr(
        """aggregate(sequence(0, 63), CAST(0 AS BIGINT),
          |  (acc, j) -> acc + shiftleft(CAST(
          |    aggregate(toks, 0,
          |      (s, t) -> s + CASE WHEN (shiftright(xxhash64(t), j) % 2) != 0
          |                         THEN 1 ELSE -1 END) > 0 AS BIGINT), j))""".stripMargin))
      val banded = sigs.select(col("mask"), col("sim"),
        explode(expr(
          "transform(sequence(0, 3), b -> shiftright(sim, b * 16) % 65536 + b * 65536)"))
          .as("band_key"))
      val candMasks = banded.as("a").join(banded.as("b"), Seq("band_key"))
        .select(col("a.mask").as("mask_a"), col("a.sim").as("sim_a"),
          col("b.mask").as("mask_b"), col("b.sim").as("sim_b"))
        .filter(col("mask_a") < col("mask_b"))
        .distinct()
        .withColumn("hamming", bit_count(expr("sim_a ^ sim_b")))
        .filter(col("hamming") <= 3)
      val g1 = groups.select(col("mask").as("mask_a"), col("ids").as("ids_a"))
      val g2 = groups.select(col("mask").as("mask_b"), col("ids").as("ids_b"))
      val cross = candMasks.join(g1, "mask_a").join(g2, "mask_b")
      intraPairs(groups, lit(0L), "hamming")
        .unionByName(expandPairs(cross, "hamming"))
    },
    None)

  /** n-gram (3-shingle) Jaccard: ORDER-SENSITIVE near-dup, unlike the
    * token-set Jaccard (QX2). Candidates come from an equality join on
    * shingles (docs sharing none can't have J>0), counted once per
    * pair; sizes via a per-doc distinct-shingle count. Oracle-matched.
    */
  val xd3 = GQuery(
    "xd3_shingle_jaccard",
    (s, d) => {
      val c = Ctx(s, d)
      // The hashed-shingle arrays are the expensive projection
      // (interpreted HOF over every document) and both self-join sides
      // need them — persist() the 5000 narrow rows so the HOF runs once
      // (persist beats localCheckpoint here: no eager job, no disk
      // write). The equality self-join on the LONG shingle hashes feeds
      // the pair-count aggregation; the packed (doc_id*2^10 + size)
      // long carries the set size through so no lookup join is needed.
      // (At corpus sizes where the shingle join outgrows memory the
      // scale path is PPJoin prefix filtering — join only each set's
      // rarest n-ceil(t*n)+1 shingles under a global rarity order, then
      // verify survivors exactly; measured slower here because its two
      // ranking windows exceed the whole join's cost at 5k docs.)
      val base = c.documents
        .select(col("doc_id"), Llm.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), expr(
          "array_distinct(transform(sequence(1, size(toks) - 2), i -> xxhash64(concat_ws(' ', slice(toks, i, 3)))))")
          .as("sids"))
        .select((col("doc_id") * 1024 + size(col("sids"))).as("packed"),
          col("sids"))
        .persist()
      val sh = base.select(col("packed"), explode(col("sids")).as("sid"))
      val j = sh.as("a").join(sh.as("b"),
          col("a.sid") === col("b.sid") && col("a.packed") < col("b.packed"))
        .groupBy(col("a.packed").as("pa"), col("b.packed").as("pb"))
        .agg(count(lit(1)).as("inter"))
        .withColumn("sa", col("pa") % 1024).withColumn("sb", col("pb") % 1024)
        .withColumn("jaccard",
          col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
        .filter(col("jaccard") >= 0.7)
      canon(j.select(expr("pa DIV 1024").as("doc_a"),
        expr("pb DIV 1024").as("doc_b"),
        round(col("jaccard"), 4).as("jaccard")))
    },
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
    * ordered pairs with cosine >= 0.45. Norms precomputed, pairwise via
    * codegen'd vec_dot, no window. Oracle-matched.
    */
  val xd4 = GQuery(
    "xd4_cosine_dup",
    (s, d) => {
      val c = Ctx(s, d)
      import s.implicits._
      // Block-broadcast pairwise pass (same shape as QX3's kNN): the
      // BNLJ form materializes n^2/2 rows each carrying two 512-byte
      // arrays; here each partition streams its vectors against the
      // broadcast matrix and emits only threshold survivors.
      def dot(a: Array[Double], b: Array[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < a.length && i < b.length) { acc += a(i) * b(i); i += 1 }
        acc
      }
      def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
      val e = c.embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .as[(Long, Array[Double])]
      val ref = e.collect().sortBy(_._1)
      val norms = ref.map { case (_, v) => math.sqrt(dot(v, v)) }
      val bc = s.sparkContext.broadcast((ref, norms))
      val pairs = e.mapPartitions { it =>
        val (refs, rn) = bc.value
        it.flatMap { case (id, v) =>
          val n = math.sqrt(dot(v, v))
          refs.iterator.zipWithIndex
            .filter { case ((nid, _), _) => nid > id }
            .map { case ((nid, w), j) => (id, nid, r4(dot(v, w) / (n * rn(j)))) }
            .filter(_._3 >= 0.45)
        }
      }.toDF("doc_a", "doc_b", "score")
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

  def queries: Seq[GQuery] = Seq(xd1, xd2, xd3, xd4)
}
