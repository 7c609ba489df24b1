package graft.etl

import org.apache.spark.sql.types._

/** Compat output schemas — the reference's two BigQuery table schemas,
  * re-expressed as Spark StructTypes. Authoritative source is the
  * Python literals at /root/reference/main.py:51-81 (the JSON copies
  * under schema/ are stale documentation — SURVEY §1.4).
  *
  * nullable=false mirrors mode=REQUIRED; the enforcement (and the
  * reject channel for violations) is in SchemaEnforce.
  */
object Schemas {

  /** marketplace — 12 cols, main.py:51-64. */
  val marketplace: StructType = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    StructField("log_index", LongType, nullable = false),
    StructField("listing_id", StringType, nullable = false),
    StructField("ipfs_hash", StringType, nullable = false),
    StructField("listing_type", StringType, nullable = true),
    StructField("category", StringType, nullable = true),
    StructField("subcategory", StringType, nullable = true),
    StructField("language", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("currency", StringType, nullable = true)))

  /** dshop — 15 cols, main.py:65-81 (note: currency REQUIRED per the
    * code, not the drifted schema/product_schema.json).
    */
  val dshop: StructType = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    StructField("log_index", LongType, nullable = false),
    StructField("listing_id", StringType, nullable = false),
    StructField("product_id", StringType, nullable = false),
    StructField("ipfs_path", StringType, nullable = false),
    StructField("external_id", StringType, nullable = true),
    StructField("parent_external_id", StringType, nullable = true),
    StructField("title", StringType, nullable = false),
    StructField("description", StringType, nullable = false),
    StructField("price", LongType, nullable = false),
    StructField("currency", StringType, nullable = false),
    StructField("option1", StringType, nullable = true),
    StructField("option2", StringType, nullable = true),
    StructField("option3", StringType, nullable = true),
    StructField("image", StringType, nullable = true)))

  /** Raw chain event-log line (FIXTURES.md §3 blocks.ndjson). */
  val chainLog: StructType = StructType(Seq(
    StructField("block_number", LongType, nullable = false),
    StructField("log_index", LongType, nullable = false),
    StructField("address", StringType, nullable = false),
    StructField("topic0", StringType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  /** Marketplace listing JSON as returned by the (stubbed) IPFS lookup. */
  val listingJson: StructType = StructType(Seq(
    StructField("listing_id", StringType), StructField("ipfs_hash", StringType),
    StructField("listing_type", StringType), StructField("category", StringType),
    StructField("subcategory", StringType), StructField("language", StringType),
    StructField("title", StringType), StructField("description", StringType),
    StructField("price", DoubleType), StructField("currency", StringType)))

  /** Dshop catalog JSON: listing plus a products array (one output row
    * per product — reference P8's one-to-many expansion).
    */
  val dshopCatalogJson: StructType = StructType(Seq(
    StructField("listing_id", StringType),
    StructField("ipfs_path", StringType),
    StructField("products", ArrayType(StructType(Seq(
      StructField("product_id", StringType),
      StructField("external_id", StringType),
      StructField("parent_external_id", StringType),
      StructField("title", StringType),
      StructField("description", StringType),
      StructField("price", LongType),
      StructField("currency", StringType),
      StructField("option1", StringType),
      StructField("option2", StringType),
      StructField("option3", StringType),
      StructField("image", StringType)))))))

  /** Dedup keys for at-least-once delivery (reference P14). */
  val marketplaceKey: Seq[String] = Seq("block_number", "log_index")
  val dshopKey: Seq[String] = Seq("block_number", "log_index", "product_id")
}
