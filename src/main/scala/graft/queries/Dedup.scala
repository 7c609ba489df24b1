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

  /** One row per distinct token set: mask, member ids, the set. */
  private def maskGroups(c: Ctx): DataFrame =
    docMasks(c).groupBy("mask")
      .agg(sort_array(collect_list("doc_id")).as("ids"),
        first(col("toks")).as("toks"))

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

  def queries: Seq[GQuery] = Seq(xd1, xd2)
}
