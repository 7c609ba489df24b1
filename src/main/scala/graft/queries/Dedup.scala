package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Det._

/** Sketch-based near-dup detection — the 100 TB scale paths behind the
  * exact QX1/QX2 contracts:
  *
  *  - MinHash + banded LSH: candidate pairs come from equality joins on
  *    band keys (shuffle on band hash — linear in corpus size), never
  *    from an all-pairs comparison. Candidates are then verified with
  *    the exact Jaccard.
  *  - SimHash: one 64-bit signature per doc; near-dups are pairs within
  *    small Hamming distance, found via 4x16-bit band blocking.
  *
  * Both are deterministic (xxhash64 with fixed seeds), so results are
  * stable across runs/cluster sizes; they are ⊘ (no SQL oracle — the
  * driver records rows-only) and are recall-tested against the exact
  * variants in DedupSpec.
  */
object Dedup {

  private val NumPerms = 64
  private val BandRows = 4 // 16 bands x 4 rows: P(cand | J=0.8) ~ 0.9998

  val xd1 = GQuery(
    "xd1_minhash_lsh",
    (s, d) => {
      val c = Ctx(s, d)
      val docs = c.documents
        .select(col("doc_id"),
          array_distinct(Llm.tokens(col("text"))).as("toks"))
        .withColumn("sig", expr(
          s"""transform(sequence(0, ${NumPerms - 1}),
             |  i -> array_min(transform(toks, t -> xxhash64(i, t))))""".stripMargin))
      // band keys: hash of each 4-row slice of the signature
      val banded = docs
        .select(col("doc_id"), col("toks"),
          posexplode(expr(
            s"transform(sequence(0, ${NumPerms / BandRows - 1}), " +
              s"b -> xxhash64(b, slice(sig, b * $BandRows + 1, $BandRows)))")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      // candidates: docs sharing any band bucket (equality join — scales)
      val a = banded.select(col("band"), col("band_key"),
        col("doc_id").as("doc_a"), col("toks").as("toks_a"))
      val b = banded.select(col("band"), col("band_key"),
        col("doc_id").as("doc_b"), col("toks").as("toks_b"))
      val cand = a.join(b, Seq("band", "band_key"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b", "toks_a", "toks_b")
        .distinct()
      // exact verify on the candidate set only
      canon(cand
        .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
        .withColumn("uni", size(array_union(col("toks_a"), col("toks_b"))))
        .withColumn("jaccard",
          round(col("inter").cast("double") / col("uni"), 4))
        .filter(col("inter").cast("double") / col("uni") >= 0.8)
        .select("doc_a", "doc_b", "jaccard"))
    },
    None)

  /** SimHash: sign-sum of per-token hash bits, weighted by term count. */
  val xd2 = GQuery(
    "xd2_simhash",
    (s, d) => {
      val c = Ctx(s, d)
      val sigs = c.documents
        .select(col("doc_id"), Llm.tokens(col("text")).as("toks"))
        .withColumn("sim", expr(
          """aggregate(sequence(0, 63), CAST(0 AS BIGINT),
            |  (acc, j) -> acc + shiftleft(CAST(
            |    aggregate(toks, 0,
            |      (s, t) -> s + CASE WHEN (shiftright(xxhash64(t), j) % 2) != 0
            |                         THEN 1 ELSE -1 END) > 0 AS BIGINT), j))""".stripMargin))
      // block on 4x16-bit bands; verify by Hamming distance <= 3
      val banded = sigs.select(col("doc_id"), col("sim"),
        posexplode(expr(
          "transform(sequence(0, 3), b -> shiftright(sim, b * 16) % 65536)")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      val a = banded.select(col("band"), col("band_key"),
        col("doc_id").as("doc_a"), col("sim").as("sim_a"))
      val b = banded.select(col("band"), col("band_key"),
        col("doc_id").as("doc_b"), col("sim").as("sim_b"))
      canon(a.join(b, Seq("band", "band_key"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(expr("sim_a ^ sim_b")).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3))
    },
    None)

  def queries: Seq[GQuery] = Seq(xd1, xd2)
}
