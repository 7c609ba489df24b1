package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming drift monitor must converge to the from-scratch JS
  * divergence between the full streamed corpus and the reference
  * profile — state accumulating across micro-batches, one snapshot
  * row per language per batch, fixed-point-quantized exactly like the
  * batch xt14 statistic.
  */
class DriftStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq

  /** Scala replay of the processor's quantized JS fold. */
  private def js(stream: Map[String, Long], ref: Map[String, Long]): Double = {
    val totS = stream.values.sum
    val totR = ref.values.sum
    val vocab = (stream.keySet ++ ref.keySet).toSeq
    var js9 = 0L
    vocab.foreach { t =>
      val p = if (totS == 0) 0.0 else stream.getOrElse(t, 0L).toDouble / totS
      val q = if (totR == 0) 0.0 else ref.getOrElse(t, 0L).toDouble / totR
      val m = (p + q) / 2
      val c = (if (p > 0) p * math.log(p / m) else 0.0) +
        (if (q > 0) q * math.log(q / m) else 0.0)
      js9 += math.round(c / 2 * 1e9)
    }
    js9.toDouble / 1e9
  }

  test("drift stream converges to the batch JS against the reference") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    graft.functions.TextOps.register(s)
    import s.implicits._

    // reference profile: an on-distribution snapshot
    val refDocs = Seq(
      ("en", "the cat sat on the mat"),
      ("en", "the dog ate the bone"),
      ("de", "der hund und die katze"))
    val refCounts = refDocs
      .flatMap { case (l, t) => tokens(t).map(l -> _) }
      .groupBy(identity).map { case ((l, t), g) => (l, t, g.size.toLong) }
      .toSeq
    val reference = refCounts.toDF("lang", "term", "cnt")

    // the stream drifts: batch 2 introduces off-profile vocabulary
    val batch1 = Seq(("en", "the cat sat on the mat"),
      ("de", "der hund und die katze"))
    val batch2 = Seq(("en", "crypto spam tokens moon lambo"),
      ("en", "the dog ate the bone"))

    val input = MemoryStream[(String, String)](s)
    val out = StreamingOps.driftStream(
      input.toDF().toDF("lang", "text"), reference)
    val q = out.toDF().writeStream
      .format("memory").queryName("drift").outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("drift-ckpt").toString)
      .start()

    input.addData(batch1: _*)
    q.processAllAvailable()
    val afterB1 = s.table("drift").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap

    input.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    // latest snapshot per lang
    val rows = s.table("drift").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val latest = rows.zipWithIndex
      .groupBy(_._1._1).map { case (l, g) => l -> g.maxBy(_._2)._1 }

    val refMap = refCounts.groupBy(_._1)
      .map { case (l, rs) => l -> rs.map(r => r._2 -> r._3).toMap }
    def streamCounts(docs: Seq[(String, String)], lang: String) =
      docs.filter(_._1 == lang).flatMap(d => tokens(d._2))
        .groupBy(identity).map { case (t, g) => t -> g.size.toLong }

    // en drifted in batch 2: JS grows and matches the replay exactly
    val enAll = streamCounts(batch1 ++ batch2, "en")
    assert(latest("en")._4 == js(enAll, refMap("en")))
    assert(latest("en")._4 > afterB1("en"),
      "off-profile vocabulary must increase drift")
    assert(latest("en")._2 == enAll.size.toLong)
    assert(latest("en")._3 == enAll.values.sum)

    // de matches its reference exactly: on-distribution, JS == 0
    assert(latest("de")._4 == 0.0)
  }
}
