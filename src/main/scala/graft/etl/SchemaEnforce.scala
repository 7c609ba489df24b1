package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema projection/enforcement — reference P9 (main.py:51-81,169-172):
  * cast every column to its declared type and split rows violating a
  * REQUIRED (non-nullable) mode into a reject channel, instead of
  * failing the load like BigQuery does.
  */
object SchemaEnforce {

  final case class Enforced(valid: DataFrame, rejects: DataFrame)

  def apply(df: DataFrame, target: StructType): Enforced = {
    val casted = df.select(target.fields.toIndexedSeq.map { f =>
      (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
       else lit(null).cast(f.dataType)).as(f.name)
    }: _*)
    val requiredCols = target.fields.filter(!_.nullable).map(_.name)
    val violation = requiredCols
      .map(c => col(c).isNull)
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    Enforced(valid = casted.filter(!violation), rejects = casted.filter(violation))
  }
}
