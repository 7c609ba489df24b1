package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Det._
import graft.functions.VectorOps

/** Approximate nearest-neighbor search — the scale path behind QX3's
  * brute-force cosine top-k.
  *
  * Random-hyperplane LSH with L independent tables: in table l, a
  * vector's key is a B-bit signature (bit i = sign(v . r_{l,i})); two
  * vectors are candidates if they share a key in ANY table. Hyperplanes
  * are derived deterministically from xxhash64(plane*dim+j) — no RNG
  * state, every executor and every run derives identical planes.
  *
  * Plan shape for scale: the bucket equi-join emits bare id pairs,
  * which are DISTINCT'ed while still narrow (two longs) — only the
  * surviving pairs re-attach vectors and pay the codegen'd vec_dot.
  * The re-attach is size-gated (Scale.maybeBroadcast): broadcast while
  * the embedding table fits the session threshold, an ordinary
  * shuffled equi-join on vec_id beyond it — both paths are spec'd
  * equivalent (SketchRecallSpec). Never carry 64-double arrays through
  * a distinct.
  *
  * Tuning note: this corpus's nearest neighbors are weak (cos ~0.5, a
  * ~60° angle), so per-bit collision is only ~2/3 and recall needs many
  * short tables (L=16, B=6 => ~25% of the corpus scanned per query, 4x
  * under brute force). Production near-dup at cos >= 0.9 collides at
  * ~0.93/bit and reaches the same recall with far fewer/longer tables.
  */
object Similarity {

  private val Bits = 6
  private val Tables = 16
  private val Dim = 64

  val xs1 = GQuery(
    "xs1_ann_lsh",
    (s, d) => {
      val c = Ctx(s, d)
      VectorOps.register(s)
      val e = c.embeddings.select(
        col("vec_id"), col("embedding").cast("array<double>").as("v"))
      // plane p (p = l*Bits + i): r[p][j] in [-0.5, 0.5), deterministic
      // plane table: Tables*Bits deterministic hyperplanes, built once
      // and broadcast — NOT re-derived inside a per-vector lambda
      // (recomputing 96 plane arrays per row dominated the first cut).
      val planes = s.range(Tables.toLong * Bits)
        .select(col("id").cast("int").as("p"))
        .withColumn("r", expr(
          s"""transform(sequence(0, ${Dim - 1}), j ->
             |  CAST(pmod(xxhash64(p * $Dim + j), 1000000) AS DOUBLE) / 1000000.0 - 0.5)"""
            .stripMargin))
      // one codegen'd dot per (vector, plane); signature = bit-sum per table
      val bucketed = e.crossJoin(broadcast(planes))
        .select(col("vec_id"),
          (col("p") / Bits).cast("int").as("tbl"),
          (col("p") % Bits).as("bit"),
          (expr("vec_dot(v, r)") > 0).cast("int").as("b"))
        .groupBy("vec_id", "tbl")
        .agg(sum(expr("shiftleft(b, CAST(bit AS INT))")).as("sig"))
        .select(col("vec_id"),
          (col("tbl") * (1 << Bits) + col("sig")).as("bucket"))
      // narrow candidate pairs, deduped before any vector work
      val cand = bucketed.as("a")
        .join(bucketed.as("b"), Seq("bucket"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"))
        .filter(col("vec_id") =!= col("neighbor_id"))
        .distinct()
      val withNorm = e.withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
      val va = withNorm.select(col("vec_id"), col("v").as("va"), col("nrm").as("na"))
      val vb = withNorm.select(col("vec_id").as("neighbor_id"),
        col("v").as("vb"), col("nrm").as("nb"))
      val scored = cand
        .join(Scale.maybeBroadcast(va), "vec_id")
        .join(Scale.maybeBroadcast(vb), "neighbor_id")
        .withColumn("score",
          round(expr("vec_dot(va, vb)") / (col("na") * col("nb")), 4))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      canon(scored
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("vec_id", "neighbor_id", "score"))
    },
    None)

  def queries: Seq[GQuery] = Seq(xs1)
}
