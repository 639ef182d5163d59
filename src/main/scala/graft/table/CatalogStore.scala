package graft.table

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Pluggable persistence for the catalog REGISTRY (the name → kind
  * map with a CAS version chain). Two stores mirror the reference's
  * two catalog backends:
  *
  *  - [[FileCatalogStore]]: versioned JSON files committed via
  *    rename-without-replace (reference: iceberg-file-catalog);
  *  - [[JdbcCatalogStore]]: rows in an embedded SQL database with the
  *    version CAS done as a conditional UPDATE (reference:
  *    iceberg-sql-catalog/src/lib.rs:34 — sqlx AnyPool over
  *    iceberg_tables rows; real deployments overwhelmingly use a
  *    DB-backed catalog).
  *
  * The contract is a compare-and-swap: `commitAt(entries, base)`
  * publishes version base+1 iff the registry is still at `base` —
  * losing a race returns false and the caller retries on the winner's
  * state. Implementations must make the flip atomic; partially
  * visible versions are not allowed.
  */
trait CatalogStore {
  def currentVersion: Int
  def entriesAt(version: Int): Map[String, String]
  def entries: Map[String, String] = entriesAt(currentVersion)
  /** Publish `next` as version base+1 iff still at `base`. */
  def commitAt(next: Map[String, String], baseVersion: Int): Boolean
}

/** Versioned v{N}.json files under `<warehouse>/catalog`, committed by
  * rename-without-replace (two racing writers both write temp files;
  * exactly one rename to vN+1 wins). */
class FileCatalogStore(warehouse: String) extends CatalogStore {
  private val mapper = new ObjectMapper()
  private def catDir = TableIO.path(warehouse, "catalog")
  private val VersionRe = """v(\d+)\.json""".r

  override def currentVersion: Int =
    TableIO.listDir(catDir).map(_.getPath.getName).collect {
      case VersionRe(n) => n.toInt
    }.maxOption.getOrElse(0)

  override def entriesAt(v: Int): Map[String, String] =
    if (v == 0) Map.empty
    else {
      val n = mapper.readTree(TableIO.readString(
        new org.apache.hadoop.fs.Path(catDir, s"v$v.json")))
      n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }

  override def commitAt(next: Map[String, String], baseVersion: Int): Boolean = {
    TableIO.mkdirs(catDir)
    val n = mapper.createObjectNode()
    next.foreach { case (k, kind) => n.put(k, kind) }
    val tmp = new org.apache.hadoop.fs.Path(catDir,
      s".v${baseVersion + 1}-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    TableIO.writeString(tmp, mapper.writeValueAsString(n))
    TableIO.renameNoReplace(tmp,
      new org.apache.hadoop.fs.Path(catDir, s"v${baseVersion + 1}.json"))
  }
}

/** Registry rows in an embedded Derby database (the JDBC driver Spark
  * already ships for its Hive metastore — no new dependency, no
  * network). Layout mirrors the reference's SQL catalog:
  *
  *   graft_catalog_version(catalog_name PK, version)      -- CAS row
  *   graft_catalog_entries(catalog_name, version, name, kind)
  *
  * A commit INSERTs the next version's entry rows, then flips the
  * version row with `UPDATE ... WHERE version = base` — the
  * conditional update is the atomic CAS (0 rows updated = lost race,
  * like the reference's `update iceberg_tables ... where
  * metadata_location = previous`). Entry rows of a losing commit are
  * orphaned at a version number that can never become current
  * (versions only move through the CAS row) and are cleaned up lazily.
  */
class JdbcCatalogStore(url: String, catalogName: String = "graft")
    extends CatalogStore {
  import java.sql.{Connection, DriverManager}

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  // dialect-portable DDL (tested on Derby; H2/PostgreSQL accept the
  // same shape). "already exists" races between two handles bootstrapping
  // the same database are benign.
  withConn { c =>
    def ensure(ddl: String): Unit =
      try { c.createStatement().executeUpdate(ddl); () }
      catch { case e: java.sql.SQLException
        if e.getSQLState == "X0Y32" /* Derby: object exists */ => () }
    ensure("""CREATE TABLE graft_catalog_version (
      catalog_name VARCHAR(255) NOT NULL PRIMARY KEY,
      version INT NOT NULL)""")
    ensure("""CREATE TABLE graft_catalog_entries (
      catalog_name VARCHAR(255) NOT NULL,
      version INT NOT NULL,
      name VARCHAR(255) NOT NULL,
      kind VARCHAR(255) NOT NULL,
      PRIMARY KEY (catalog_name, version, name))""")
    val ins = c.prepareStatement(
      "INSERT INTO graft_catalog_version (catalog_name, version) VALUES (?, 0)")
    ins.setString(1, catalogName)
    try { ins.executeUpdate(); () }
    catch { case e: java.sql.SQLException
      if e.getSQLState == "23505" /* duplicate key */ => () }
  }

  override def currentVersion: Int = withConn { c =>
    val q = c.prepareStatement(
      "SELECT version FROM graft_catalog_version WHERE catalog_name = ?")
    q.setString(1, catalogName)
    val rs = q.executeQuery()
    if (rs.next()) rs.getInt(1) else 0
  }

  override def entriesAt(v: Int): Map[String, String] =
    if (v == 0) Map.empty
    else withConn { c =>
      val q = c.prepareStatement("SELECT name, kind FROM graft_catalog_entries " +
        "WHERE catalog_name = ? AND version = ?")
      q.setString(1, catalogName); q.setInt(2, v)
      val rs = q.executeQuery()
      val out = Map.newBuilder[String, String]
      while (rs.next()) out += rs.getString(1) -> rs.getString(2)
      out.result()
    }

  override def commitAt(next: Map[String, String], baseVersion: Int): Boolean =
    withConn { c =>
      c.setAutoCommit(false)
      try {
        val ins = c.prepareStatement("INSERT INTO graft_catalog_entries " +
          "(catalog_name, version, name, kind) VALUES (?, ?, ?, ?)")
        next.foreach { case (name, kind) =>
          ins.setString(1, catalogName); ins.setInt(2, baseVersion + 1)
          ins.setString(3, name); ins.setString(4, kind)
          ins.addBatch()
        }
        val staged =
          try { ins.executeBatch(); true }
          catch { case e: java.sql.SQLException
              if Iterator.iterate(e: java.sql.SQLException)(_.getNextException)
                .takeWhile(_ != null).take(8).exists(_.getSQLState == "23505") =>
            // rows at base+1 already exist: commits are transactional
            // (a lost CAS rolls its staged rows back), so a duplicate
            // key can only mean another committer WON at base+1 —
            // this commit lost the race
            false
          }
        // the CAS: exactly one racer's conditional update moves the row
        val won = staged && {
          val cas = c.prepareStatement("UPDATE graft_catalog_version " +
            "SET version = ? WHERE catalog_name = ? AND version = ?")
          cas.setInt(1, baseVersion + 1); cas.setString(2, catalogName)
          cas.setInt(3, baseVersion)
          cas.executeUpdate() == 1
        }
        if (won) c.commit() else c.rollback()
        won
      } catch { case t: Throwable => c.rollback(); throw t }
      finally c.setAutoCommit(true)
    }
}
