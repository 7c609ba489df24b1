package graft.etl

import java.nio.file.Files

import graft.SparkTestSession
import graft.queries.{Ctx, Dedup}
import graft.operators.TableCheck
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end contamination quarantine — the composed production
  * procedure the pieces exist for: xd12 names the (training doc,
  * benchmark doc) contamination pairs, Snapshot.deleteWhere erases
  * the flagged training docs from the versioned corpus lake, vacuum
  * purges history, TableCheck certifies the result. Asserts the
  * operators COMPOSE: the post-quarantine lake holds exactly the
  * clean corpus, the pre-quarantine version stays auditable until
  * vacuum, and the erased bytes are gone afterward.
  */
class QuarantineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("xd12 findings drive a lake delete; checksum certifies the clean corpus") {
    // corpus lake: the training-side documents, snapshot-versioned
    val c = Ctx(spark, sf)
    val corpus = c.documents.filter(col("doc_id") % 20 =!= 0)
      .select("doc_id", "text", "lang")
    val path = Files.createTempDirectory("quarantine").toString + "/corpus"
    Snapshot.commitOverwrite(corpus, path)
    val v0 = Snapshot.currentVersion(path).get

    // attribution: training docs sharing >=3 distinct 5-shingles with
    // any benchmark doc (xd12's exact pair report)
    val contaminated = Dedup.xd12.fn(spark, sf)
      .select("doc_id").distinct().as[Long](spark.implicits.newLongEncoder)
      .collect().toSet
    assert(contaminated.nonEmpty, "fixture should produce contamination hits")

    // quarantine: erase the flagged docs from the lake
    val r = Snapshot.deleteWhere(spark, path,
      col("doc_id").isin(contaminated.toSeq: _*))
    assert(r.deletedRows == contaminated.size.toLong,
      s"deleted ${r.deletedRows} of ${contaminated.size} flagged docs")

    // certify: the lake now equals the clean corpus, checksum-exact
    val clean = corpus.filter(!col("doc_id").isin(contaminated.toSeq: _*))
    def fp(df: org.apache.spark.sql.DataFrame) =
      TableCheck.checksum(df, Seq("doc_id", "text", "lang")).collect()(0)
    assert(fp(Snapshot.read(spark, path)) == fp(clean))

    // audit trail: the pre-quarantine version remains readable...
    assert(Snapshot.read(spark, path, Some(v0)).count() == corpus.count())
    // ...until vacuum completes the legal erasure
    Snapshot.vacuum(path, keepVersions = 1)
    val survivors = Snapshot.read(spark, path)
    val remaining = spark.read.parquet(survivors.inputFiles: _*)
    assert(remaining.filter(col("doc_id").isin(contaminated.toSeq: _*)).count() == 0,
      "quarantined bytes must be physically gone after vacuum")
  }
}
