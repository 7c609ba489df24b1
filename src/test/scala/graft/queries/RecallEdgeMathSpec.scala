package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** xr5/xr6's edge-weighted arithmetic must equal the doc-pair-set
  * definition EXACTLY — the identity the certifications ride on:
  * every doc maps to one distinct-set group, so expanded pair-set
  * sizes are Σ|ids_a|·|ids_b| and intersections distribute over the
  * expansion. Checked on deterministic dup-heavy corpora by materializing
  * the doc-pair sets in Scala and comparing recall/precision/subset
  * numbers bit-for-bit against the group-edge computation.
  */
class RecallEdgeMathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val words = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  /** Deterministic dup-heavy corpus: each base doc is 5 cyclically
    * consecutive words (distinct by construction); every i%4==1 doc is
    * an EXACT copy of its predecessor (intra-group pairs), every
    * i%4==3 doc adds a 6th word to its predecessor's set (J = 5/6 >=
    * 0.8 — a cross-group edge), and a noise word keeps some docs
    * isolated.
    */
  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    def base(i: Int): Seq[String] =
      (0 until 5).map(k => words((i * 3 + seed + k) % words.size))
    (0 until nDocs).map { i =>
      val t = (i % 4) match {
        case 1 => base(i - 1).mkString(" ")
        case 3 => (base(i - 1) :+ words((i * 3 + seed + 4) % words.size))
          .mkString(" ")
        case _ => base(i).mkString(" ")
      }
      (i.toLong, t)
    }
  }

  private def docPairs(edges: Array[(Long, Long)],
      members: Map[Long, Seq[Long]]): Set[(Long, Long)] =
    edges.iterator.flatMap { case (a, b) =>
      for (x <- members(a); y <- members(b))
        yield (math.min(x, y), math.max(x, y))
    }.toSet

  test("edge-weighted recall/precision equal the doc-pair-set definition") {
    for (seed <- Seq(3, 7, 21)) {
      val docs = corpus(seed, 30).toDF("doc_id", "text")
      val groups = Dedup.setGroups(docs)
      try {
        val members = groups.select(col("gid"), col("ids"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        val intraPairs = members.values.flatMap(ids =>
          for (i <- ids.indices; j <- (i + 1) until ids.size)
            yield (ids(i), ids(j))).toSet

        val exactE = Dedup.groupEdgesGated(groups, 0.8)
          .select("gid_a", "gid_b")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val approxE = Dedup.minhashQualifying(groups, 0.8)
          .select("gid_a", "gid_b")
          .collect().map(r => (r.getLong(0), r.getLong(1)))

        // ground truth on materialized doc-pair sets
        val exactSet = intraPairs ++ docPairs(exactE, members)
        val approxSet = intraPairs ++ docPairs(approxE, members)
        val truthRecall =
          if (exactSet.isEmpty) 1.0
          else (exactSet & approxSet).size.toDouble / exactSet.size
        val truthPrecision =
          if (approxSet.isEmpty) 1.0
          else (approxSet & exactSet).size.toDouble / approxSet.size
        val truthSubset = approxSet.subsetOf(exactSet)

        // xr5/xr6's arithmetic, replicated over the same edges
        def w(e: (Long, Long)) =
          members(e._1).size.toLong * members(e._2).size
        val intra = members.values.map(ids =>
          ids.size.toLong * (ids.size - 1) / 2).sum
        val exactKeys = exactE.toSet
        val approxKeys = approxE.toSet
        val nExact = intra + exactE.filter(e => true).map(w).sum
        val nInter = intra + exactE.filter(approxKeys).map(w).sum
        val nApprox = intra + approxE.map(w).sum
        val nHit = intra + approxE.filter(exactKeys).map(w).sum
        val edgeRecall = if (nExact == 0) 1.0 else nInter.toDouble / nExact
        val edgePrecision = if (nApprox == 0) 1.0 else nHit.toDouble / nApprox
        val edgeSubset = approxE.forall(exactKeys)

        assert(edgeRecall == truthRecall, s"seed $seed recall")
        assert(edgePrecision == truthPrecision, s"seed $seed precision")
        assert(edgeSubset == truthSubset, s"seed $seed subset")
        // the fixture must actually exercise dup structure
        assert(intraPairs.nonEmpty && exactE.nonEmpty, s"seed $seed trivial")
      } finally groups.unpersist()
    }
  }
}
