package graft.queries

import org.apache.spark.sql.functions._
import Det._

/** Composed corpus-curation pipeline — the flagship "what this engine
  * is for" query: the individual operators (quality features QX4/XT1,
  * exact dedup QX1) chained the way a training-data pipeline actually
  * runs them, end-to-end oracle-checked.
  *
  *   documents
  *     -> per-doc quality features (token count, vocabulary diversity)
  *     -> quality gate (n_tokens >= 20 AND distinct_ratio >= 0.4)
  *     -> exact dedup on md5(text), keeping the lowest doc_id
  *     -> per-language curation report
  *
  * Scale shape: the feature pass is one codegen stage over the scan;
  * the dedup is a groupBy on the 128-bit content hash with min_by
  * partial aggregation (never a window over the whole corpus); the
  * three per-lang summaries are tiny and broadcast-joined. The quality
  * gate uses integer cross-multiplication (n_distinct * 5 >= n_tokens
  * * 2) instead of a double threshold so both engines decide borderline
  * docs identically.
  */
object Pipeline {

  val xp1 = GQuery(
    "xp1_curation",
    (s, d) => {
      val c = Ctx(s, d)
      val feat = c.documents
        .withColumn("toks", Llm.tokens(col("text")))
        .select(
          col("doc_id"), col("lang"),
          md5(col("text").cast("binary")).as("h"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_distinct"))
      val raw = feat.groupBy("lang").agg(count(lit(1)).as("n_raw"))
      val q = feat.filter(col("n_tokens") >= 20 &&
        col("n_distinct") * 5 >= col("n_tokens") * 2)
      val qc = q.groupBy("lang").agg(count(lit(1)).as("n_quality"))
      val kept = q.groupBy("h").agg(
        min_by(col("lang"), col("doc_id")).as("lang"),
        min_by(col("n_tokens"), col("doc_id")).as("n_tokens"))
      val kc = kept.groupBy("lang").agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        round(avg(col("n_tokens")), 4).as("avg_tokens"))
      canon(raw
        .join(broadcast(qc), Seq("lang"), "left")
        .join(broadcast(kc), Seq("lang"), "left")
        .select(col("lang"), col("n_raw"),
          coalesce(col("n_quality"), lit(0L)).as("n_quality"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("total_tokens"), lit(0L)).as("total_tokens"),
          coalesce(col("avg_tokens"), lit(0.0)).as("avg_tokens")))
    },
    Some(
      """WITH feat AS (
        |  SELECT doc_id, lang, md5(text) AS h,
        |    len(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> '')) AS n_tokens,
        |    len(list_distinct(list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x <> ''))) AS n_distinct
        |  FROM documents),
        |raw AS (SELECT lang, COUNT(*) AS n_raw FROM feat GROUP BY lang),
        |q AS (SELECT * FROM feat WHERE n_tokens >= 20 AND n_distinct * 5 >= n_tokens * 2),
        |qc AS (SELECT lang, COUNT(*) AS n_quality FROM q GROUP BY lang),
        |kept AS (SELECT h, arg_min(lang, doc_id) AS lang, arg_min(n_tokens, doc_id) AS n_tokens
        |         FROM q GROUP BY h),
        |kc AS (SELECT lang, COUNT(*) AS n_kept,
        |         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |         ROUND(AVG(n_tokens), 4) AS avg_tokens
        |       FROM kept GROUP BY lang),
        |rpt AS (
        |  SELECT r.lang AS lang, r.n_raw AS n_raw,
        |    COALESCE(qc.n_quality, 0) AS n_quality,
        |    COALESCE(kc.n_kept, 0) AS n_kept,
        |    COALESCE(kc.total_tokens, 0) AS total_tokens,
        |    COALESCE(kc.avg_tokens, 0.0) AS avg_tokens
        |  FROM raw r
        |  LEFT JOIN qc ON r.lang = qc.lang
        |  LEFT JOIN kc ON r.lang = kc.lang)
        |SELECT * FROM rpt""".stripMargin +
        orderAll("lang", "n_raw", "n_quality", "n_kept", "total_tokens", "avg_tokens")),
    headline = true)

  def queries: Seq[GQuery] = Seq(xp1)
}
