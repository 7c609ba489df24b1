package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Det._

/** Approximate nearest-neighbor search — the scale path behind QX3's
  * brute-force cosine top-k.
  *
  * Random-hyperplane LSH with L independent tables: in table l, a
  * vector's key is a B-bit signature (bit i = sign(v . r_{l,i})); two
  * vectors are candidates if they share a key in ANY table. Hyperplanes
  * are derived deterministically from xxhash64(plane*dim+j) — no RNG
  * state, every executor and every run derives identical planes.
  * Candidates come from equality joins on (table, signature) — shuffle,
  * not all-pairs — then exact cosine ranks the survivors.
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
      val e = c.embeddings.select(
        col("vec_id"), col("embedding").cast("array<double>").as("v"))
      // plane p (p = l*Bits + i): r[p][j] in [-0.5, 0.5), deterministic
      val plane = (p: String) =>
        s"""transform(sequence(0, ${Dim - 1}), j ->
           |  CAST(pmod(xxhash64(($p) * $Dim + j), 1000000) AS DOUBLE) / 1000000.0 - 0.5)"""
          .stripMargin
      val signed = e
        .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))
        .withColumn("keys", expr(
          s"""transform(sequence(0, ${Tables - 1}), l ->
             |  aggregate(sequence(0, ${Bits - 1}), l * ${1 << Bits},
             |    (acc, i) -> acc + shiftleft(CAST(
             |      aggregate(zip_with(v, ${plane(s"l * $Bits + i")}, (x, y) -> x * y),
             |                CAST(0.0 AS DOUBLE), (a, x) -> a + x) > 0 AS INT), i)))"""
            .stripMargin))
      val bucketed = signed.select(col("vec_id"), col("v"), col("nrm"),
        explode(col("keys")).as("bucket"))
      val a = bucketed.select(col("bucket"), col("vec_id"), col("v"), col("nrm"))
      val b = bucketed.select(col("bucket"), col("vec_id").as("neighbor_id"),
        col("v").as("vb"), col("nrm").as("nb"))
      val pairs = a.join(b, Seq("bucket"))
        .filter(col("vec_id") =!= col("neighbor_id"))
        .select(col("vec_id"), col("neighbor_id"), col("v"), col("vb"),
          col("nrm"), col("nb"))
        .distinct()
        .withColumn("score", round(
          aggregate(zip_with(col("v"), col("vb"), (x, y) => x * y),
            lit(0.0), (acc, x) => acc + x) / (col("nrm") * col("nb")), 4))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      canon(pairs
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("vec_id", "neighbor_id", "score"))
    },
    None)

  def queries: Seq[GQuery] = Seq(xs1)
}
