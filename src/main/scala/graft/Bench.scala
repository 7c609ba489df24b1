package graft

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Benchmark main — BASELINE.md §2 protocol: per query, one discarded
  * warm-up then median of 3 timed runs. Execution is a noop-sink write,
  * which runs the full physical plan (all shuffles/aggregations) without
  * materializing rows to the driver. Emits ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      Registry.byName(name).fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // optional focus list for targeted tuning: SPARK_GRAFT_ONLY=q1,q2
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = Registry.all.filter(q => only.forall(_.contains(q.name)))
    val results = selected.map { q =>
      val t = try {
        once(q.name) // warm-up (codegen + page cache), discarded
        val runs = Seq(once(q.name), once(q.name), once(q.name)).sorted
        runs(1)
      } catch { case _: Throwable => -1.0 }
      q.name -> t
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
