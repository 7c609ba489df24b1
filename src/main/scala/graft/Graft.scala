package graft

import org.apache.spark.sql.SparkSession

/** Library front door — the one call a user adds to an existing Spark
  * application to get the whole graft surface:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *   .getOrCreate()
  * graft.Graft.init(spark)                    // SQL functions
  * spark.sql("SELECT tokenize(text) FROM docs")
  * graft.queries.Registry.byName("xt14_vocab_drift").fn(spark, dir)
  * }}}
  *
  * `init` registers every custom SQL function (idempotent, per
  * session): the codegen'd text kernels (`tokenize`, `term_counts`,
  * `bigram_counts`, `shingle_hash`), the vector kernels (`vec_dot`,
  * `vec_dot_i8`), the sorted-set kernel (`sorted_intersect_count`),
  * the hash helpers (`md5_60`), and the SimHash vote kernels
  * (`simhash_sig`, `simhash_md5_sig`). The optimizer rules
  * (RewriteDotProduct) install via the standard
  * `spark.sql.extensions` mechanism, which must be set BEFORE the
  * session is built — init cannot retrofit them, so it warns-by-doc
  * rather than silently half-installing.
  *
  * Everything else is plain API: `queries.Registry` (the full
  * declared query surface — DocSyncSpec pins the count), `etl.*`
  * (the pipeline layer and the Snapshot lake), `operators.*`
  * (TableCheck/TableDiff/ZOrder/BloomPrune/Salting and the
  * AnnIndex/Bm25Index/PqIndex serving layouts with their
  * IndexManifest atomic publish), `streaming.StreamingOps` (the
  * stateful streaming family).
  */
object Graft {

  /** Register all graft SQL functions on `spark`. Idempotent. */
  def init(spark: SparkSession): Unit = {
    functions.TextOps.register(spark)
    functions.VectorOps.register(spark)
    functions.ArrayOps.register(spark)
    functions.Md5Hash60.register(spark)
    functions.SimHashSig.register(spark)
    functions.SimHashMd5Sig.register(spark)
  }
}
