package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Per-row content enrichment — reference P6: for each event, fetch the
  * listing JSON from IPFS by hash (main.py:17,152).
  *
  * The Spark-correct shape is mapPartitions with ONE client per
  * partition (connection reuse, bounded concurrency = task slots), not
  * a per-row UDF opening its own connections. The resolver is pluggable:
  * the fixture resolver returns the payload already embedded in the log
  * line (no network in this environment); a production HttpIpfsResolver
  * would own an HTTP connection pool and retries.
  */
trait IpfsResolver extends Serializable {
  /** Resolve content for an event; `embedded` is the payload carried by
    * the fixture (None in production, where only the hash exists). */
  def resolve(ipfsRef: String, embedded: Option[String]): Option[String]
  /** Called once per partition before use (open pools etc.). */
  def open(): Unit = ()
  def close(): Unit = ()
}

/** Fixture resolver: content is embedded in the chain log itself. */
object EmbeddedResolver extends IpfsResolver {
  def resolve(ipfsRef: String, embedded: Option[String]): Option[String] = embedded
}

final case class ChainLog(
    block_number: Long, log_index: Long, address: String,
    topic0: String, payload: Option[String])

final case class ResolvedLog(
    block_number: Long, log_index: Long, address: String,
    topic0: String, content: Option[String])

object Enrich {
  /** P6: resolve each event's content partition-wise. */
  def apply(logs: DataFrame, resolver: IpfsResolver): Dataset[ResolvedLog] = {
    val spark: SparkSession = logs.sparkSession
    import spark.implicits._
    logs.as[ChainLog].mapPartitions { it =>
      resolver.open()
      // NOTE: iterator is consumed lazily by the task; close() after a
      // full drain via a wrapping iterator would be needed for pooled
      // resources — EmbeddedResolver holds none.
      it.map { l =>
        ResolvedLog(l.block_number, l.log_index, l.address, l.topic0,
          resolver.resolve(l.topic0 + ":" + l.block_number, l.payload))
      }
    }
  }
}
