package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Det._

/** Driver-visible recall/precision certification for the sketch and
  * ANN scale paths (xs1-xs4, xd1, xd2, xd7) — the queries the
  * correctness gate otherwise has to take on the repo's own specs'
  * word (they are ⊘ no-oracle: LSH buckets and k-means cells are not
  * SQL-expressible).
  *
  * Shape: each xr query computes BOTH the sketch result and its exact
  * counterpart IN SPARK, reduces them to driver-bounded scalars
  * (set-intersection counts via semi/anti joins — never a collect of
  * the pair sets), and emits ONE assertion row whose `meets_floor` /
  * `no_false_pos` booleans certify the contract. The DuckDB oracle is
  * the matching CONSTANT row, so the driver's hash compare fails iff
  * a floor is breached — the recall floor becomes an externally
  * checked result instead of an in-repo test. Floors are set from
  * measurements at sf0.001/0.01/0.1 with margin (see each query's
  * note); they certify "the sketch still works", not a tuning target.
  *
  * Bench note: these run the sketch AND the exact baseline, so their
  * oracle (a constant row) is meaningless as a DuckDB time baseline —
  * they are SKIP'd in duckbench.py (the xd5 precedent) and appear
  * unbudgeted in RESULTS.md while staying fully hash-checked at the
  * correctness gate.
  */
object Recall {

  /** Project a result down to its key columns and persist — every
    * downstream count/semi/anti action re-executes its inputs' FULL
    * plans otherwise, so an xr query that takes recall AND subset
    * would run the sketch twice and the exact baseline three times.
    * own() scopes the cache to the enclosing reap.
    */
  private def keySet(df: DataFrame, cols: Seq[String]): DataFrame =
    own(df.select(cols.map(col): _*).persist())

  /** |exact ∩ approx| / |exact| over the given key columns, all
    * distributed (semi-join + counts); 1.0 on an empty exact set.
    * Callers pass keySet-persisted frames.
    */
  private def recallOf(approx: DataFrame, exact: DataFrame,
      cols: Seq[String]): Double = {
    val n = exact.count()
    if (n == 0) 1.0
    else exact.join(approx, cols, "left_semi").count().toDouble / n
  }

  /** approx ⊆ exact over the given key columns (precision 1.0).
    * Callers pass keySet-persisted frames.
    */
  private def subsetOf(approx: DataFrame, exact: DataFrame,
      cols: Seq[String]): Boolean =
    approx.join(exact, cols, "left_anti").count() == 0L

  private def report(s: SparkSession, sketch: String, metric: String,
      k: Option[Int], floor: Double, noFalsePos: Option[Boolean],
      meets: Boolean): DataFrame = {
    import s.implicits._
    Seq((sketch, metric, k, floor, noFalsePos, meets))
      .toDF("sketch", "metric", "k", "floor_val", "no_false_pos",
        "meets_floor")
  }

  private def reportSql(sketch: String, metric: String, k: Option[Int],
      floor: Double, noFalsePos: Option[Boolean]): String = {
    val kSql = k.map(_.toString).getOrElse("NULL")
    val nfp = noFalsePos match {
      case Some(b) => b.toString.toUpperCase
      case None => "CAST(NULL AS BOOLEAN)"
    }
    s"""SELECT '$sketch' AS sketch, '$metric' AS metric,
       |  CAST($kSql AS INTEGER) AS k, CAST($floor AS DOUBLE) AS floor_val,
       |  $nfp AS no_false_pos, TRUE AS meets_floor""".stripMargin +
      orderAll("sketch", "metric", "k", "floor_val", "no_false_pos",
        "meets_floor")
  }

  /** Exact top-k recall of an ANN query vs brute force, over a
    * DETERMINISTIC 1-in-5 query sample (vec_id % 5 == 0). The sketch
    * under certification runs in full — sampling only bounds the
    * exact baseline, whose brute-force cost is the n² term nobody
    * would pay corpus-wide at 100 TB; recall estimated over a fixed
    * 20% of queries is the honest production shape of this audit, and
    * the floors carry wide margins over the full-corpus measurements
    * (0.53+ vs 0.40, 0.63+ vs 0.55, ~1.0 vs 0.90). Scoring/tie rules
    * match qx3 exactly (round-4 score desc, neighbor_id asc).
    */
  private def topkRecall(name: String, sketch: GQuery, floor: Double) =
    GQuery(
      name,
      (s, d) => reap {
        graft.functions.VectorOps.register(s)
        val c = Ctx(s, d)
        val topk = udaf(new graft.functions.TopK(5),
          org.apache.spark.sql.Encoders.product[graft.functions.Scored])
        val e = own(c.embeddings
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
          .persist())
        val qs = e.filter(col("vec_id") % 5 === 0)
          .select(col("vec_id"), col("v").as("va"), col("nrm").as("na"))
        val ref = e.select(col("vec_id").as("neighbor_id"),
          col("v").as("vb"), col("nrm").as("nb"))
        val exact = qs.join(Scale.maybeBroadcast(ref),
            col("vec_id") =!= col("neighbor_id"))
          .select(col("vec_id"), col("neighbor_id"),
            round(expr("vec_dot(va, vb)") / (col("na") * col("nb")), 4)
              .as("score"))
          .groupBy("vec_id")
          .agg(topk(col("score"), col("neighbor_id")).as("top"))
          .select(col("vec_id"), explode(col("top")).as("t"))
          .select(col("vec_id"), col("t.id").as("neighbor_id"))
        val cols = Seq("vec_id", "neighbor_id")
        val exactK = keySet(exact, cols)
        val approx = keySet(
          sketch.fn(s, d).filter(col("vec_id") % 5 === 0), cols)
        val r = recallOf(approx, exactK, cols)
        canon(report(s, sketch.name, "topk_recall_vs_exact", Some(5),
          floor, None, r >= floor))
      },
      Some(reportSql(sketch.name, "topk_recall_vs_exact", Some(5), floor,
        None)))

  // Hyperplane LSH on this corpus's weak (~60°) neighbor structure:
  // measured 0.53 (sf0.001) / 0.56 (sf0.01) / 0.61 (sf0.1); floor 0.40.
  val xr1 = topkRecall("xr1_lsh_recall", Similarity.xs1, 0.40)
  // IVF NProbe/Cells = 25% scan fraction: measured 0.69/0.67/0.63
  // at sf0.001/0.01/0.1; floor 0.55.
  val xr2 = topkRecall("xr2_ivf_recall", Similarity.xs2, 0.55)
  // int8 quantize-then-rescore: rounding is the only approximation —
  // measured ~1.0 at all three SFs; floor 0.90.
  val xr3 = topkRecall("xr3_quant_recall", Similarity.xs3, 0.90)

  /** xs4 bipartite retrieval vs exact query-vs-corpus brute force. */
  val xr4 = GQuery(
    "xr4_query_recall",
    (s, d) => reap {
      graft.functions.VectorOps.register(s)
      val c = Ctx(s, d)
      val all = c.embeddings
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
      val corpus = all.filter(col("vec_id") % 20 =!= 0)
        .select(col("vec_id").as("neighbor_id"), col("v").as("vb"),
          col("nrm").as("nb"))
      val queries = all.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id"), col("v").as("va"), col("nrm").as("na"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("score").desc, col("neighbor_id").asc)
      val exact = queries.crossJoin(corpus)
        .select(col("vec_id"), col("neighbor_id"),
          round(expr("vec_dot(va, vb)") / (col("na") * col("nb")), 4).as("score"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      val kcols = Seq("vec_id", "neighbor_id")
      val exactK = keySet(exact, kcols)
      val approx = keySet(Similarity.xs4.fn(s, d), kcols)
      // measured ~0.66 at sf0.001 (SketchRecallSpec); floor 0.50
      val floor = 0.50
      val r = recallOf(approx, exactK, kcols)
      canon(report(s, "xs4_ann_query", "bipartite_recall_vs_exact",
        Some(5), floor, None, r >= floor))
    },
    Some(reportSql("xs4_ann_query", "bipartite_recall_vs_exact",
      Some(5), 0.50, None)))

  /** Doc-pair set comparisons computed at the GROUP-EDGE level.
    *
    * Every document belongs to exactly one distinct-token-set group
    * (doc → its token set → its gid), so a cross-group doc pair maps
    * to exactly ONE group edge, |expand(E)| = Σ_e |ids_a|·|ids_b|,
    * and expand(E1) ∩ expand(E2) = expand(E1 ∩ E2). Intra-group
    * pairs (Σ C(m,2)) sit in BOTH the exact set (identical sets have
    * J=1 ≥ t) and each sketch set (emitted by construction), so
    * doc-level recall/precision reduce exactly to weighted edge sums:
    *
    *   recall = (I + W(Eexact ∩ Eapprox)) / (I + W(Eexact))
    *
    * — identical numbers to expanding, without materializing the
    * multi-million-row doc-pair sets the r6-shaped certification
    * spent its whole runtime on (xr5: 8.5 s → ~3 s at sf0.1).
    */
  private def intraCount(groups: DataFrame): Long =
    groups.agg(coalesce(sum(
      expr("CAST(size(ids) AS BIGINT) * (size(ids) - 1) DIV 2")), lit(0L)))
      .head.getLong(0)

  /** Attach w = |ids_a|·|ids_b| (the expanded doc-pair count) to group
    * edges via broadcast size lookups.
    */
  private def weighted(edges: DataFrame, groups: DataFrame): DataFrame = {
    val sz = groups.select(col("gid"), size(col("ids")).cast("long").as("m"))
    edges.select("gid_a", "gid_b")
      .join(Scale.maybeBroadcast(
        sz.select(col("gid").as("gid_a"), col("m").as("ma"))), "gid_a")
      .join(Scale.maybeBroadcast(
        sz.select(col("gid").as("gid_b"), col("m").as("mb"))), "gid_b")
      .select(col("gid_a"), col("gid_b"), (col("ma") * col("mb")).as("w"))
  }

  /** MinHash-LSH pair recall vs exact J>=0.8 (qx2's pair set), plus
    * the no-false-positives guarantee (every emitted pair is
    * exact-verified by construction — this certifies the verify stage
    * stayed honest).
    */
  val xr5 = GQuery(
    "xr5_minhash_recall",
    (s, d) => reap {
      val cols = Seq("gid_a", "gid_b")
      // ONE setGroups pass feeds both sides: the exact baseline
      // (vocab-gated edge generator == qx2's pair set, GeneralVocabSpec)
      // and the MinHash band-join — tokenized and set-grouped once.
      val groups = Dedup.setGroups(Ctx(s, d).documents)
      val exactE = weighted(Dedup.groupEdgesGated(groups, 0.8), groups)
      val approxE = Dedup.minhashQualifying(groups, 0.8)
        .select(col("gid_a"), col("gid_b"), lit(1).as("ap"))
      // Each edge side is consumed exactly once, so the three scalars
      // (exact weight, intersection weight, false-positive count) come
      // out of ONE full-outer edge join + aggregate — one job instead
      // of the persist + semi + anti + two weight joins the first cut
      // paid (~7 s → ~4 s at sf0.1 on a 698k-edge graph).
      val stats = exactE.join(approxE, cols, "full_outer")
        .agg(coalesce(sum(col("w")), lit(0L)).as("w_exact"),
          coalesce(sum(when(col("ap").isNotNull, col("w"))), lit(0L))
            .as("w_inter"),
          count(when(col("w").isNull, 1)).as("n_fp"))
        .head
      val intra = intraCount(groups)
      val nExact = intra + stats.getLong(0)
      val nInter = intra + stats.getLong(1)
      val noFp = stats.getLong(2) == 0L
      val r = if (nExact == 0) 1.0 else nInter.toDouble / nExact
      // measured 0.9999+ at sf0.001/0.01/0.1 (dup-heavy fixture;
      // banding misses only isolated boundary pairs); floor 0.90
      val floor = 0.90
      canon(report(s, "xd1_minhash_lsh", "pair_recall_vs_exact", None,
        floor, Some(noFp), r >= floor))
    },
    Some(reportSql("xd1_minhash_lsh", "pair_recall_vs_exact", None, 0.90,
      Some(true))))

  /** SimHash@hamming<=3 precision vs exact J>=0.8 — simhash is a
    * TIGHTER filter than J (different metric), so the contract is
    * precision (its hits are true near-dups), not recall. Same
    * edge-weighted arithmetic as xr5; simhash's intra-group pairs
    * (hamming 0) are exact J=1 pairs, so they count as hits.
    */
  val xr6 = GQuery(
    "xr6_simhash_precision",
    (s, d) => reap {
      val cols = Seq("gid_a", "gid_b")
      // shared setGroups frame + one-job edge arithmetic, as in xr5;
      // here the APPROX side carries the weights (precision divides by
      // the sketch's own emissions).
      val groups = Dedup.setGroups(Ctx(s, d).documents)
      val approxE = Dedup.simhashQualifying(groups)
        .select(col("gid_a"), col("gid_b"),
          (size(col("ids_a")).cast("long") * size(col("ids_b"))).as("w"))
      val exactE = Dedup.groupEdgesGated(groups, 0.8)
        .select(col("gid_a"), col("gid_b"), lit(1).as("ex"))
      val stats = approxE.join(exactE, cols, "left_outer")
        .agg(coalesce(sum(col("w")), lit(0L)).as("w_approx"),
          coalesce(sum(when(col("ex").isNotNull, col("w"))), lit(0L))
            .as("w_hit"))
        .head
      val intra = intraCount(groups)
      val n = intra + stats.getLong(0)
      val hit = intra + stats.getLong(1)
      val p = if (n == 0) 1.0 else hit.toDouble / n
      // measured 0.97/0.98/0.98 at sf0.001/0.01/0.1; floor 0.90
      val floor = 0.90
      canon(report(s, "xd2_simhash", "pair_precision_vs_exact", None,
        floor, None, p >= floor))
    },
    Some(reportSql("xd2_simhash", "pair_precision_vs_exact", None, 0.90,
      None)))

  /** IVF-blocked semantic dedup vs exact xd4 pairs: subset + recall. */
  val xr7 = GQuery(
    "xr7_semdup_recall",
    (s, d) => reap {
      val cols = Seq("doc_a", "doc_b")
      val exact = keySet(Dedup.xd4.fn(s, d), cols)
      val approx = keySet(Similarity.xd7.fn(s, d), cols)
      // measured 1.0 at sf0.001/0.01/0.1 (threshold pairs co-probe
      // reliably); floor 0.90
      val floor = 0.90
      val r = recallOf(approx, exact, cols)
      canon(report(s, "xd7_semantic_dedup", "pair_recall_vs_exact", None,
        floor, Some(subsetOf(approx, exact, cols)), r >= floor))
    },
    Some(reportSql("xd7_semantic_dedup", "pair_recall_vs_exact", None, 0.90,
      Some(true))))

  def queries: Seq[GQuery] = Seq(xr1, xr2, xr3, xr4, xr5, xr6, xr7)
}
