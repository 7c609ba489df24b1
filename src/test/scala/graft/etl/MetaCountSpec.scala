package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata-only counts over catalog snapshot tables
  * (GraftReadRule.metadataAggregate + GraftSnapshotTable
  * .metadataCounts): an ungrouped, unfiltered SQL `count(*)` /
  * `count(col)` is answered from the manifest's per-file row/null
  * stats as a LocalRelation — zero files planned — while every
  * non-provable shape (WHERE, GROUP BY, DISTINCT, deletion vectors)
  * falls back to the ordinary scan with the identical answer.
  */
class MetaCountSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graftmeta").toString

  private lazy val spark: SparkSession = {
    graft.SparkTestSession.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.graft.warehouse", wh)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    s
  }

  private def isMetadataAnswered(df: org.apache.spark.sql.DataFrame): Boolean = {
    val local = df.queryExecution.optimizedPlan.collect {
      case l: LocalRelation => l
    }.nonEmpty
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    local && scans.isEmpty
  }

  private def scansFiles(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case l: LocalRelation => l
    }.isEmpty

  test("count(*) and count(col) answer from the manifest with zero scans") {
    import spark.implicits._
    val path = s"$wh/db/mc"
    Snapshot.commitOverwrite(
      Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
        .toDF("id", "v"), path)
    Snapshot.commitAppend(
      Seq((4L, Some("d")), (5L, None)).toDF("id", "v"), path)

    val star = spark.sql("SELECT count(*) AS n FROM graft.db.mc")
    assert(isMetadataAnswered(star))
    assert(star.collect()(0).getLong(0) === 5L)

    // count(col) subtracts the stats-recorded null count per file
    val nn = spark.sql("SELECT count(v) AS n, count(*) AS m FROM graft.db.mc")
    assert(isMetadataAnswered(nn))
    val r = nn.collect()(0)
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === 5L)

    // time travel pins the metadata answer to the version's manifest
    val v1 = spark.sql(
      "SELECT count(*) AS n FROM graft.db.mc VERSION AS OF 1")
    assert(isMetadataAnswered(v1))
    assert(v1.collect()(0).getLong(0) === 3L)
  }

  test("non-provable shapes fall back to the scan, same answers") {
    val path = s"$wh/db/mc"

    val where = spark.sql(
      "SELECT count(*) AS n FROM graft.db.mc WHERE id > 2")
    assert(scansFiles(where))
    assert(where.collect()(0).getLong(0) === 3L)

    val grouped = spark.sql(
      "SELECT v, count(*) AS n FROM graft.db.mc GROUP BY v")
    assert(scansFiles(grouped))
    assert(grouped.collect().map(_.getLong(1)).sum === 5L)

    val distinct = spark.sql(
      "SELECT count(DISTINCT v) AS n FROM graft.db.mc")
    assert(scansFiles(distinct))
    assert(distinct.collect()(0).getLong(0) === 3L)

    // a merge-on-read delete leaves the manifest's per-file rows
    // overcounting — the rewrite must refuse and the scan must agree
    // with the DV-filtered truth
    Snapshot.deleteWhereMergeOnRead(spark, path, col("id") === lit(2L))
    val afterDv = spark.sql("SELECT count(*) AS n FROM graft.db.mc")
    assert(scansFiles(afterDv))
    assert(afterDv.collect()(0).getLong(0) === 4L)

    // the pre-delete version still answers from metadata
    val pinned = spark.sql(
      "SELECT count(*) AS n FROM graft.db.mc VERSION AS OF 2")
    assert(isMetadataAnswered(pinned))
    assert(pinned.collect()(0).getLong(0) === 5L)

    // a copy-on-write delete rewrites only the files its predicate
    // touches — untouched files CARRY their DVs, so the fallback must
    // hold (a rewrite keyed on "some delete happened" would be wrong)
    Snapshot.deleteWhere(spark, path, col("id") === lit(4L))
    val afterCow = spark.sql("SELECT count(*) AS n FROM graft.db.mc")
    assert(scansFiles(afterCow))
    assert(afterCow.collect()(0).getLong(0) === 3L)

    // OPTIMIZE republishes the DV-applied content as plain files with
    // fresh stats — the metadata path resumes, post-delete count
    Snapshot.optimize(spark, path, targetFiles = 1)
    val afterOpt = spark.sql("SELECT count(*) AS n FROM graft.db.mc")
    assert(isMetadataAnswered(afterOpt))
    assert(afterOpt.collect()(0).getLong(0) === 3L)
  }
}
