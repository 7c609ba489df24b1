package graft.etl

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** JdbcCursor against embedded Derby: the reference's transactional
  * etl_cursor table shape (schema parity, read-at-startup /
  * write-after-success contract, durability across connections, and a
  * full EtlJob cycle driving it).
  */
class JdbcCursorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // keep derby.log + db files out of the repo working dir
  System.setProperty("derby.system.home",
    Files.createTempDirectory("derby-home").toString)

  private def freshUrl(): String =
    s"jdbc:derby:memory:cur${System.nanoTime()};create=true"

  test("empty table reads None; write persists across connections") {
    val url = freshUrl()
    val c1 = new JdbcCursor(url)
    assert(c1.read().isEmpty)
    c1.write(10014999L)
    assert(c1.read().contains(10014999L))
    // a separate "process" (new instance, new connections) sees it
    val c2 = new JdbcCursor(url)
    assert(c2.read().contains(10014999L))
    c2.write(10015999L)
    assert(c1.read().contains(10015999L))
  }

  test("schema mirrors the reference migration (id/block_number/created_at/updated_at)") {
    val url = freshUrl()
    new JdbcCursor(url).write(5L)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement()
        .executeQuery("SELECT id, block_number, created_at, updated_at FROM etl_cursor")
      assert(rs.next())
      assert(rs.getInt(1) == 1 && rs.getLong(2) == 5L)
      assert(rs.getTimestamp(3) != null && rs.getTimestamp(4) != null)
      assert(!rs.next(), "cursor must stay a single row")
    } finally conn.close()
  }

  test("fresh database lands at schema version 1; reconnect is a no-op") {
    val url = freshUrl()
    val c1 = new JdbcCursor(url)
    assert(c1.schemaVersion() == 1)
    c1.write(7L)
    // reconnecting re-runs the (idempotent) upgrade path
    val c2 = new JdbcCursor(url)
    assert(c2.schemaVersion() == 1)
    assert(c2.read().contains(7L))
  }

  test("upgrade-from-v0: pre-versioning database adopts version tracking in place") {
    // simulate a deploy from before etl_schema_version existed: the
    // cursor table is already there WITH a live row, no version table
    val url = freshUrl()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """CREATE TABLE etl_cursor (
          |  id INT PRIMARY KEY,
          |  block_number BIGINT NOT NULL,
          |  created_at TIMESTAMP NOT NULL,
          |  updated_at TIMESTAMP NOT NULL)""".stripMargin)
      st.executeUpdate(
        """INSERT INTO etl_cursor VALUES
          |  (1, 42, CURRENT_TIMESTAMP, CURRENT_TIMESTAMP)""".stripMargin)
      st.close()
    } finally conn.close()
    val c = new JdbcCursor(url)
    // the idempotent migration must NOT recreate the table or lose the
    // row; the version row must land at the current high-water
    assert(c.schemaVersion() == 1)
    assert(c.read().contains(42L))
    c.write(43L)
    assert(c.read().contains(43L))
  }

  test("EtlJob cycle advances the JDBC cursor; failed cycle leaves it unmoved") {
    val root = Files.createTempDirectory("etl-jdbc")
    val chain = root.resolve("chain")
    ChainFixture.write(chain)
    val store = new JdbcCursor(freshUrl())
    val cfg = EtlJob.Config(
      chainDir = chain.toString,
      sinkDir = root.resolve("sink").toString,
      cursorDir = root.resolve("cursor").toString,
      cursorStore = Some(store))
    val stats = EtlJob.runCycle(spark, cfg)
    assert(stats.ran)
    assert(store.read().contains(stats.endBlock))
    // a failing cycle (unreadable chain dir) must not move the cursor
    val before = store.read()
    intercept[Exception] {
      EtlJob.runCycle(spark, cfg.copy(chainDir = root.resolve("nope").toString))
    }
    assert(store.read() == before)
    // and the file cursor was never touched (store override wins)
    assert(!Files.exists(root.resolve("cursor").resolve("etl_cursor.json")))
  }
}
