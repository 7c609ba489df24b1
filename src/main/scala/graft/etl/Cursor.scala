package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Instant

/** Contract shared by every cursor backend: read at startup, written
  * only after a fully successful cycle, so a failed cycle replays its
  * whole range (at-least-once, main.py:217-220).
  */
trait CursorStore {
  def read(): Option[Long]
  def write(blockNumber: Long): Unit
}

/** Durable single-row stream cursor — the Spark-native stand-in for the
  * reference's Postgres etl_cursor table (main.py:118-142, migration
  * 6278201ba186). Same fields, same contract: read at startup, written
  * only after a fully successful cycle (main.py:209-216), so a failed
  * cycle replays its whole range (at-least-once, main.py:217-220).
  *
  * Durability: write-to-temp + atomic rename, so a crash mid-write
  * leaves the previous cursor intact (the Postgres transaction analog).
  */
final class Cursor(path: Path) extends CursorStore {

  def read(): Option[Long] =
    if (!Files.exists(path)) None
    else {
      val s = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      """"block_number"\s*:\s*(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    }

  def write(blockNumber: Long): Unit = {
    val now = Instant.now().toString
    val createdAt = if (Files.exists(path)) {
      val s = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      """"created_at"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(s)
        .map(_.group(1)).getOrElse(now)
    } else now
    val json =
      s"""{"id": 1, "block_number": $blockNumber, "created_at": "$createdAt", "updated_at": "$now"}"""
    val tmp = Paths.get(path.toString + ".tmp")
    Files.createDirectories(path.toAbsolutePath.getParent)
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

object Cursor {
  def apply(dir: String): Cursor = new Cursor(Paths.get(dir, "etl_cursor.json"))
}

/** The reference's ACTUAL cursor shape: a one-row etl_cursor TABLE in a
  * relational store, updated transactionally after a successful cycle
  * (main.py:228-243 + migration 6278201ba186_create_the_etl_cursor_
  * table.py:19-27 — same columns: id, block_number, created_at,
  * updated_at). Any JDBC url works; tests use embedded Derby (ships on
  * Spark's classpath), production points the same class at Postgres.
  *
  * What the database adds over the atomic-rename file: the UPDATE
  * holds a row lock and commits atomically, so multiple driver
  * processes cannot interleave a read-modify-write — the multi-node
  * single-writer story the file cursor cannot give.
  */
final class JdbcCursor(url: String) extends CursorStore {
  import java.sql.{Connection, DriverManager}

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  // Versioned DDL (the Alembic-parity story, migration 6278201ba186 /
  // env.py upgrade): a one-row etl_schema_version high-water table +
  // an ordered migration list. On every connect, migrations above the
  // recorded version run IN ORDER and the version row advances — each
  // migration is itself idempotent (existence-checked DDL), so a
  // pre-versioning database (etl_cursor present, no version table)
  // upgrades in place without disturbing its cursor row, and a crash
  // between DDL and version-write just re-runs a no-op next connect.
  JdbcCursor.upgrade(this)

  private[etl] def schemaVersion(): Int = withConn { c =>
    val st = c.createStatement()
    try {
      val rs = st.executeQuery("SELECT version FROM etl_schema_version")
      try { if (rs.next()) rs.getInt(1) else 0 } finally rs.close()
    } finally st.close()
  }

  private[etl] def runUpgrade(): Unit = withConn { c =>
    if (!JdbcCursor.tableExists(c, "ETL_SCHEMA_VERSION")) {
      // existence-check-then-CREATE races with another instance
      // connecting to the same database: both can pass the check and
      // one CREATE throws. The duplicate-table SQLException IS the
      // "someone else created it" signal (dialect-agnostic, unlike
      // IF NOT EXISTS) — swallow it and fall through to the version
      // re-read; any other failure still propagates.
      try {
        val st = c.createStatement()
        try st.executeUpdate(
          "CREATE TABLE etl_schema_version (version INT NOT NULL)")
        finally st.close()
        val ins = c.createStatement()
        try ins.executeUpdate(
          "INSERT INTO etl_schema_version (version) VALUES (0)")
        finally ins.close()
      } catch {
        case e: java.sql.SQLException =>
          if (!JdbcCursor.tableExists(c, "ETL_SCHEMA_VERSION")) throw e
      }
    }
    val current = {
      val st = c.createStatement()
      try {
        val rs = st.executeQuery("SELECT version FROM etl_schema_version")
        try { if (rs.next()) rs.getInt(1) else 0 } finally rs.close()
      } finally st.close()
    }
    JdbcCursor.Migrations.filter(_._1 > current).foreach { case (v, _, ddl) =>
      ddl(c)
      val up = c.prepareStatement("UPDATE etl_schema_version SET version = ?")
      try { up.setInt(1, v); up.executeUpdate() } finally up.close()
    }
  }

  override def read(): Option[Long] = withConn { c =>
    val st = c.createStatement()
    try {
      val rs = st.executeQuery("SELECT block_number FROM etl_cursor WHERE id = 1")
      try { if (rs.next()) Some(rs.getLong(1)) else None } finally rs.close()
    } finally st.close()
  }

  override def write(blockNumber: Long): Unit = withConn { c =>
    c.setAutoCommit(false)
    try {
      val now = new java.sql.Timestamp(System.currentTimeMillis())
      val up = c.prepareStatement(
        "UPDATE etl_cursor SET block_number = ?, updated_at = ? WHERE id = 1")
      try {
        up.setLong(1, blockNumber)
        up.setTimestamp(2, now)
        if (up.executeUpdate() == 0) {
          val ins = c.prepareStatement(
            "INSERT INTO etl_cursor (id, block_number, created_at, updated_at) VALUES (1, ?, ?, ?)")
          try {
            ins.setLong(1, blockNumber)
            ins.setTimestamp(2, now)
            ins.setTimestamp(3, now)
            ins.executeUpdate()
          } finally ins.close()
        }
      } finally up.close()
      c.commit()
    } catch {
      case e: Throwable => c.rollback(); throw e
    }
  }
}

object JdbcCursor {
  import java.sql.Connection

  private def tableExists(c: Connection, name: String): Boolean = {
    val rs = c.getMetaData.getTables(null, null, name, null)
    try rs.next() finally rs.close()
  }

  /** Ordered migrations: (version, description, idempotent DDL).
    * Version 1 mirrors the reference's only migration
    * (6278201ba186_create_the_etl_cursor_table.py:19-27). New schema
    * changes append here with the next version number; existing
    * entries are immutable, Alembic-style.
    */
  private val Migrations: Seq[(Int, String, Connection => Unit)] = Seq(
    (1, "create the etl_cursor table", { c =>
      if (!tableExists(c, "ETL_CURSOR")) {
        val st = c.createStatement()
        try st.executeUpdate(
          """CREATE TABLE etl_cursor (
            |  id INT PRIMARY KEY,
            |  block_number BIGINT NOT NULL,
            |  created_at TIMESTAMP NOT NULL,
            |  updated_at TIMESTAMP NOT NULL)""".stripMargin)
        finally st.close()
      }
    }))

  private def upgrade(cur: JdbcCursor): Unit = cur.runUpgrade()
}
