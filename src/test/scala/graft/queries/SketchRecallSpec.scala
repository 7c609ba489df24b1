package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Recall of the sketch-based scale paths vs their exact counterparts
  * (SURVEY §5.2: Q04x tolerance, MinHash vs exact Jaccard, ANN vs
  * exact cosine top-k).
  */
class SketchRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("minhash-lsh recovers >=95% of exact Jaccard>=0.8 pairs, no false positives") {
    val exact = Llm.qx2.fn(spark, sf).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.xd1.fn(spark, sf).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.subsetOf(exact), "verified candidates must all be true pairs")
    val recall = approx.size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall below 0.95")
  }

  // This corpus's true neighbors are weak (cos ~0.35-0.5, near-60°
  // angles), where hyperplane-LSH per-bit collision is only ~2/3 —
  // measured recall ~0.53 at L=16/B=6 matches (1-(1-p^B)^L) theory.
  // The bar guards regressions; production near-dup corpora (cos>=0.9)
  // reach >0.95 recall with the same operator.
  test("ann-lsh top-5 recall >= 0.5 vs exact cosine top-5") {
    val exact = Llm.qx3.fn(spark, sf).select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.xs1.fn(spark, sf).select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall $recall below 0.5")
  }

  // IVF probes NProbe/Cells = 25% of the corpus; measured recall ~0.69
  // here beats hyperplane-LSH's ~0.53 at a similar scan fraction
  // because k-means cells adapt to the data where fixed hyperplanes
  // can't. Same weak-neighbor caveat as above.
  test("ann-ivf top-5 recall >= 0.6 vs exact cosine top-5, deterministic") {
    val exact = Llm.qx3.fn(spark, sf).select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def run() = Similarity.xs2.fn(spark, sf).select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = run()
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall below 0.6")
    // deterministic init + rounded centroid means: bit-stable reruns
    assert(run() == approx)
  }

  // int8 rounding is the ONLY approximation here (no bucketing), and
  // the 8x candidate cut absorbs ranking jitter — near-perfect recall.
  test("quantize-then-rescore top-5 recall >= 0.9 vs exact cosine top-5") {
    val exact = Llm.qx3.fn(spark, sf).select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.xs3.fn(spark, sf).select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall $recall below 0.9")
  }

  test("xs1 shuffled vector re-attach (broadcast gate off) equals broadcast path") {
    def rows() = Similarity.xs1.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBroadcast = rows()
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val viaShuffle = rows()
      assert(viaShuffle == viaBroadcast)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  // Candidates are pairs co-probing >=1 of their NProbe=8/32 cells and
  // every candidate is verified with the exact rounded cosine, so
  // precision is 1.0 by construction; the spec floors recall. Measured
  // 1.0 at sf0.001-0.1: threshold pairs (cos>=0.45) are the corpus's
  // STRONGEST alignments, which co-probe far more reliably than the
  // average ~60-degree pair that caps xs2's top-k recall at ~0.69.
  test("ivf-blocked semantic dedup: no false pairs, recall >= 0.9 vs exact xd4") {
    val exact = Dedup.xd4.fn(spark, sf).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.xd7.fn(spark, sf).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.subsetOf(exact), "every xd7 pair must be a true xd4 pair")
    val recall = if (exact.isEmpty) 1.0 else approx.size.toDouble / exact.size
    assert(recall >= 0.9, s"xd7 recall $recall below 0.9")
  }

  test("approx_count_distinct within 5% of exact (Q04x vs Q04)") {
    val exact = Aggregates.q04.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Aggregates.q04x.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((k, (p, s)) <- exact) {
      val (ap, as) = approx(k)
      assert(math.abs(ap - p).toDouble / p <= 0.05, s"$k part estimate off")
      assert(math.abs(as - s).toDouble / s <= 0.05, s"$k supp estimate off")
    }
  }

  test("bucket-merged HLL union within 5% of exact distinct (q04y vs q04)") {
    val exact = Aggregates.q04.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val merged = Aggregates.q04y.fn(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((k, (p, su)) <- exact) {
      val (ap, as) = merged(k)
      assert(math.abs(ap - p).toDouble / p <= 0.05, s"$k part estimate off")
      assert(math.abs(as - su).toDouble / su <= 0.05, s"$k supp estimate off")
    }
    // the merge must be DETERMINISTIC under the same bucketing (bit-
    // identical replay) and BUCKETING-STABLE under a different one
    // (within estimator noise). Deliberately NOT exact equality across
    // bucketings or vs single-pass: a lone sketch answers via the
    // order-dependent HIP estimator, unions via the composite
    // estimator, and per-bucket sketch-mode transitions shift union
    // estimates ~1% — measured at sf0.01; xr11 certifies the stability
    // band at the gate.
    import org.apache.spark.sql.functions._
    val c = Ctx(spark, sf)
    def rebucketed(bucket: org.apache.spark.sql.Column, n: Int) = c.lineitem
      .withColumn("bucket", pmod(bucket, lit(n)))
      .groupBy("l_returnflag", "bucket")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val replay = rebucketed(col("l_orderkey"), 8) // q04y's own bucketing
    for ((k, (ap, _)) <- merged) assert(replay(k) == ap,
      s"$k: identical bucketing must replay identically")
    val alt = rebucketed(col("l_partkey"), 13)
    for ((k, (ap, _)) <- merged)
      assert(math.abs(alt(k) - ap).toDouble / ap <= 0.02,
        s"$k: bucket-merged $ap vs re-bucketed ${alt(k)} drifted > 2%")
  }

  test("approx_percentile within 2% of the exact median (q03c vs q03b)") {
    val exact = Aggregates.q03b.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap // med_price
    val approx = Aggregates.q03c.fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap // apx_median
    for ((k, m) <- exact)
      assert(math.abs(approx(k) - m) / m <= 0.02, s"$k median estimate off")
  }

  test("simhash finds only true near-dups at hamming<=3 (spot precision)") {
    val pairs = Dedup.xd2.fn(spark, sf).collect()
    val exact = Llm.qx2.fn(spark, sf).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // simhash@3 is a tighter filter than J>=0.8; every hit should be a
    // genuine high-similarity pair
    val hits = pairs.map(r => (r.getLong(0), r.getLong(1)))
    val precision =
      if (hits.isEmpty) 1.0
      else hits.count(exact.contains).toDouble / hits.length
    assert(precision >= 0.9, s"simhash precision $precision")
  }

  test("xs4 query-vs-corpus retrieval: recall >= 0.6 vs exact bipartite top-5") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorOps.register(spark)
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
    val corpus = all.filter(col("vec_id") % 20 =!= 0)
      .select(col("vec_id").as("neighbor_id"), col("v").as("vb"), col("nrm").as("nb"))
    val queries = all.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("v").as("va"), col("nrm").as("na"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val exact = queries.crossJoin(corpus)
      .select(col("vec_id"), col("neighbor_id"),
        round(expr("vec_dot(va, vb)") / (col("na") * col("nb")), 4).as("score"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.xs4.fn(spark, sf).select("vec_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every result really comes from the corpus side
    assert(approx.forall(_._2 % 20 != 0))
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"bipartite recall $recall below 0.6")
  }

  test("xs5 incremental IVF: conservation + assignment equivalence vs same-centroid rebuild") {
    import org.apache.spark.sql.functions._
    // conservation: every embedding lands in exactly one cell
    val census = Similarity.xs5.fn(spark, sf)
    val total = census.agg(sum("n_total")).collect()(0).getLong(0)
    graft.functions.VectorOps.register(spark)
    val c = Ctx(spark, sf)
    val nVecs = c.embeddings.count()
    assert(total == nVecs, s"census covers $total of $nVecs vectors")

    // assignment equivalence: the incremental (assign-only) placement
    // of the batch equals what a full ranking of base∪batch against
    // the SAME frozen centroids assigns — fold-in loses nothing
    val all = c.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr("vec_dot(v, v)")))
    val base = all.filter(col("vec_id") % 10 =!= 0).persist()
    val batch = all.filter(col("vec_id") % 10 === 0)
    val cents = Similarity.trainCentroids(base)
    def assign(e: org.apache.spark.sql.DataFrame) =
      Similarity.rankAgainst(e, cents).filter(col("rn") === 1)
        .select("vec_id", "cid").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val incremental = assign(batch)
    val rebuilt = assign(all).filter { case (id, _) => id % 10 == 0 }
    assert(incremental == rebuilt,
      "incremental fold-in diverged from same-centroid rebuild")
  }

  test("xi2 histogram quantiles bracket the exact order statistics") {
    val res = Aggregates.xi2.fn(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getDouble(2), r.getDouble(3))) // q, lo, hi
    assert(res.length == 5)
    val prices = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0)).sorted
    res.foreach { case (q, lo, hi) =>
      val k = math.ceil(q * prices.length).toInt
      val x = prices(k - 1) // the order statistic the quantile names
      assert(x >= lo && x < hi, s"q=$q: exact $x outside bin [$lo,$hi)")
    }
  }
}
