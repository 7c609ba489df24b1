package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Second `private[sql]` doorway (see ColumnExpr for the posture): a
  * V1 streaming Source's getBatch must return a DataFrame whose
  * logical plan is FLAGGED as streaming, or the MicroBatchExecution
  * assertion rejects it. Spark's own file source and Delta's both mint
  * that frame via `internalCreateDataFrame(rdd, schema, isStreaming =
  * true)`; this bridge does exactly that for a batch-planned frame
  * (the change-scan of a snapshot version range).
  */
object StreamingFrame {
  def apply(df: DataFrame): DataFrame = {
    val cs = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
