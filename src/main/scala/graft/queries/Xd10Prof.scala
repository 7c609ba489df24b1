package graft.queries
import org.apache.spark.sql.functions._
object Xd10Prof {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = Ctx(spark, "/root/testdata/sf0.1")
    val groups = Dedup.setGroups(c.documents)
    println("[prof] groups=" + groups.count())
    val gtok = groups.select(col("gid"), explode(col("htoks")).as("token"))
    val dfreq = gtok.groupBy("token").agg(count(lit(1)).as("df"))
    println("[prof] vocab=" + dfreq.count())
    dfreq.agg(max("df").as("mx"), expr("percentile(df, 0.5)").as("p50"),
      expr("percentile(df, 0.9)").as("p90"), expr("percentile(df, 0.99)").as("p99"),
      sum(expr("df*df")).as("sumsq")).show()
    // token count per set stats
    groups.agg(min("sz"), expr("percentile(sz, 0.5)"), max("sz")).show()
    spark.stop()
  }
}
