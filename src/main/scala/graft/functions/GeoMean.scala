package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean of positive doubles as a typed Aggregator UDAF
  * (SURVEY §2.B Q34; no Spark built-in exists).
  *
  * Buffer = (sum of ln(x), count): associative + commutative, so Spark
  * can partial-aggregate map-side and merge across partitions — the
  * same two-phase plan a built-in agg gets. Inputs <= 0 are ignored
  * (the caller should pre-filter; this is defense in depth).
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0.0) (b._1 + math.log(x), b._2 + 1L) else b

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0L) Double.NaN else math.exp(r._1 / r._2)

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
