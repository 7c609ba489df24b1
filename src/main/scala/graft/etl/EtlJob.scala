package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One ETL cycle — the Spark-native re-expression of the reference's
  * _run() (main.py:197-220), as a single declarative plan per table:
  *
  *   scan(range) -> filter(contract events) -> enrich(ipfs) ->
  *   parse/flatten -> [explode products] -> enforce schema ->
  *   empty short-circuit -> partitioned append -> cursor advance
  *
  * Failure contract is the reference's: any exception leaves the cursor
  * unmoved, the whole range replays next cycle (at-least-once,
  * main.py:216-220), and consumers read through dedupView (P14).
  *
  * Scale posture: the sink is parquet partitioned by block bucket
  * (block_number - block_number % bucketSize), so (a) replays can be
  * made idempotent by dynamic partition overwrite, and (b) downstream
  * range scans prune partitions on block_number for free.
  */
object EtlJob {

  val MarketplaceAddr = "0x_origin_marketplace"
  val MarketplaceTopic = "ListingCreated"
  val DshopTopic = "DshopProductsUpdated"

  final case class Config(
      chainDir: String,
      sinkDir: String,
      cursorDir: String,
      startBlockEpoch: Long = 10014455L,   // main.py:29
      blockLag: Long = 4L,                 // main.py:32
      batchSize: Int = 1000,               // main.py:34-35
      idempotent: Boolean = false,         // overwrite-by-partition upgrade
      resolver: IpfsResolver = EmbeddedResolver,
      // None = atomic-rename file in cursorDir; Some = any CursorStore
      // (e.g. JdbcCursor against the warehouse DB, the reference shape)
      cursorStore: Option[CursorStore] = None)

  final case class CycleStats(
      ran: Boolean, startBlock: Long, endBlock: Long,
      marketplaceRows: Long, dshopRows: Long, rejectRows: Long)

  /** P2+P3: compute the cycle's block range; None = empty cycle. */
  def plannedRange(cfg: Config, latest: Long, cursor: Option[Long]): Option[(Long, Long)] = {
    val start = cursor.map(_ + 1).getOrElse(cfg.startBlockEpoch)
    val end = latest - cfg.blockLag                 // confirmation lag
    if (end < start) None else Some((start, end))
  }

  def runCycle(spark: SparkSession, cfg: Config): CycleStats = {
    val source = new ChainSource(spark, cfg.chainDir)
    val cursor: CursorStore = cfg.cursorStore.getOrElse(Cursor(cfg.cursorDir))
    plannedRange(cfg, source.latestBlock(), cursor.read()) match {
      case None =>
        CycleStats(ran = false, 0, 0, 0, 0, 0)     // P11 short-circuit
      case Some((start, end)) =>
        val logs = source.scan(start, end, cfg.batchSize)
        val resolved = Enrich(logs.filter(
          col("address") === MarketplaceAddr &&
            col("topic0").isin(MarketplaceTopic, DshopTopic)), cfg.resolver)

        // P7: marketplace — flatten listing JSON to the 12-col schema
        val marketplace = resolved
          .filter(col("topic0") === MarketplaceTopic)
          .withColumn("j", from_json(col("content"), Schemas.listingJson))
          .select(col("block_number") +: col("log_index") +:
            Schemas.listingJson.fieldNames.toIndexedSeq.map(n => col(s"j.$n")): _*)

        // P8: dshop — one output row per product in the catalog
        val dshop = resolved
          .filter(col("topic0") === DshopTopic)
          .withColumn("j", from_json(col("content"), Schemas.dshopCatalogJson))
          .select(col("block_number"), col("log_index"),
            col("j.listing_id").as("listing_id"), col("j.ipfs_path").as("ipfs_path"),
            explode(col("j.products")).as("p"))
          .select(col("block_number"), col("log_index"), col("listing_id"),
            col("p.product_id"), col("ipfs_path"), col("p.external_id"),
            col("p.parent_external_id"), col("p.title"), col("p.description"),
            col("p.price"), col("p.currency"), col("p.option1"), col("p.option2"),
            col("p.option3"), col("p.image"))

        val em = SchemaEnforce(marketplace.toDF(), Schemas.marketplace)
        val ed = SchemaEnforce(dshop, Schemas.dshop)

        val mRows = load(em.valid, s"${cfg.sinkDir}/marketplace", cfg)
        val dRows = load(ed.valid, s"${cfg.sinkDir}/dshop", cfg)
        val rejects = load(em.rejects, s"${cfg.sinkDir}/rejects/marketplace", cfg) +
          load(ed.rejects, s"${cfg.sinkDir}/rejects/dshop", cfg)

        // P13: cursor advances ONLY after both loads succeeded
        cursor.write(end)
        CycleStats(ran = true, start, end, mRows, dRows, rejects)
    }
  }

  /** P10-P12: partitioned append load (the BigQuery load-job stand-in).
    * Returns the row count, like _bigquery_load (main.py:160-185).
    */
  private def load(df: DataFrame, path: String, cfg: Config): Long = {
    val withBucket = df.withColumn(
      "block_bucket", col("block_number") - (col("block_number") % cfg.batchSize))
    // P11 empty short-circuit as a LocalLimit(1) probe, and the P12 row
    // count as an OBSERVED metric riding the write action itself — the
    // batch is scanned once, never cached. (The previous form ran a
    // full count() then the write over a persist()ed batch: two
    // materializations and a whole-batch cache, which at production
    // batch sizes is executor-memory pressure for nothing — observe()
    // is the P16 mapping SURVEY §2.A prescribes anyway.)
    if (withBucket.isEmpty) 0L
    else {
      val obs = org.apache.spark.sql.Observation()
      val observed = withBucket.observe(obs, count(lit(1)).as("n"))
      val mode = if (cfg.idempotent) SaveMode.Overwrite else SaveMode.Append
      if (cfg.idempotent)
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      observed.write.mode(mode).partitionBy("block_bucket").parquet(path)
      obs.get("n").asInstanceOf[Long]
    }
  }

  /** P14: consumer-side dedup view over an at-least-once sink.
    * Deterministic survivor: first by key ordered by all columns.
    */
  def dedupView(spark: SparkSession, path: String, key: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    val others = df.columns.filterNot(key.contains).toIndexedSeq.map(col)
    val w = Window.partitionBy(key.map(col): _*).orderBy(others: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
