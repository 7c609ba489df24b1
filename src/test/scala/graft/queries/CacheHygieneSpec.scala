package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Session cache hygiene: a registry query must not leave cached
  * blocks behind — every persist inside a query body is own()'d and
  * drained by the enclosing Det.reap after the result materializes,
  * so a long-lived session embedding these query fns never
  * accumulates cached plans. Covers every query whose plan persists
  * internally, directly or via the shared helpers (setGroups,
  * minhashPairs, shinglePairs, containmentPairs, ivfRanked, ivfPairs,
  * quantilesFromHist).
  *
  * The suite runs against the shared test session, so it clears the
  * cache first (other suites exercise the persisting helpers directly,
  * outside any reap — by design those behave like bare persists).
  */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val caching = Seq(
    "qx2_jaccard_pairs", "xd1_minhash_lsh", "xd2_simhash",
    "xd3_shingle_jaccard", "xd5_dedup_clusters", "xd6_incremental_dedup",
    "xd7_semantic_dedup", "xd8_semantic_clusters", "xd10_containment",
    "xs2_ann_ivf", "xs3_ann_quantized", "xs4_ann_query",
    "xs5_ann_incremental", "xp2_curation_full", "xe6_markov_rank",
    "xt3_lang_id", "xt5_tfidf", "xt6_lm_score", "xt11_bigram_lm",
    "xt14_vocab_drift", "xv3_version_diff",
    "xr1_lsh_recall", "xr5_minhash_recall", "xr6_simhash_precision",
    "q11b_binned_range_join", "xi2_incremental_quantiles")

  for (name <- caching) test(s"$name leaves no cached frames behind") {
    spark.catalog.clearCache()
    val out = Registry.byName(name).fn(spark, sf)
    assert(out.count() >= 0) // consume the (already-materialized) result
    assert(spark.sharedState.cacheManager.isEmpty,
      s"$name left cached plans registered after returning")
  }
}
