package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time offline trainer run that produced Bpe.ShippedMerges256 —
  * kept for provenance/reproducibility (like a model training script):
  * `runMain graft.TrainBpe256 /root/testdata/sf0.01 256` prints the
  * Scala literal.
  *
  * The eval fixture's vocabulary is 31 distinct words, which SATURATES
  * plain training at 99 merges (every word becomes one token; no
  * adjacent pair remains). A production tokenizer is trained on a far
  * larger corpus than any batch it later encodes, so this script does
  * the same deterministically: the training corpus is the fixture text
  * PLUS each document's adjacent-word concatenations ("spark joins"
  * also contributes "sparkjoins") — a richer word distribution that
  * supports 256 merges whose first ranks coincide with the plain
  * corpus's most frequent pairs. Encoding the eval corpus under the
  * bigger table is exactly the production situation: most vocabulary
  * entries never fire on a given batch, but every rank still costs a
  * replace pass — which is what xt15b measures and oracle-replays.
  */
object TrainBpe256 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("train-bpe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    graft.functions.TextOps.register(spark)
    val joined = docs.select(concat_ws(" ", expr(
      """transform(sequence(1, greatest(size(tokenize(text)) - 1, 0)),
        |  i -> concat(tokenize(text)[i - 1], tokenize(text)[i]))""".stripMargin))
      .as("text"))
    val corpus = docs.select(col("text")).unionByName(joined)
    // own() is a no-op outside reap{}; the one-shot JVM exits right
    // after, so the per-rank checkpoints go down with the process
    val merges = graft.queries.Bpe.train(spark, corpus, k)
    println(s"// trained on $dir documents + adjacent-word concatenations, k=$k, got ${merges.size}")
    merges.grouped(5).foreach { g =>
      println("    " + g.map { case (a, b) => s"""("$a", "$b")""" }
        .mkString(", ") + ",")
    }
    spark.stop()
  }
}
