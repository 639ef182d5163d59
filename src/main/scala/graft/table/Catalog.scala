package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** File-backed catalog of GraftTables and views (reference:
  * iceberg-file-catalog + iceberg-sql-catalog crates, and the SQL
  * front-end in datafusion-iceberg-sql / datafusion_iceberg/src/
  * planner.rs: CREATE TABLE / CREATE VIEW DDL, INSERT INTO, SELECT).
  *
  * SQL statements are routed: DML/DDL verbs that Spark's session
  * catalog can't target (our tables live outside it) are parsed off
  * the front of the statement and executed as table operations; plain
  * SELECTs run on Catalyst with every catalog entry registered as a
  * temp view, so the full Spark SQL surface applies.
  */
class GraftCatalog(val spark: SparkSession, val warehouse: String,
    val store: CatalogStore) {

  def this(spark: SparkSession, warehouse: String) =
    this(spark, warehouse, new FileCatalogStore(warehouse))

  /** The registry is a versioned CAS chain, like the reference's SQL
    * catalog (iceberg-sql-catalog CAS on (name, version)): every
    * mutation rebuilds from the freshest version and commits vN+1 —
    * two catalog handles (or processes) registering concurrently both
    * land, the loser retrying on the winner's state instead of
    * overwriting it. The store decides HOW versions persist (files or
    * JDBC rows, see [[CatalogStore]]); the retry loop is shared. */
  private def entries: Map[String, String] = store.entries

  private def update(f: Map[String, String] => Map[String, String]): Unit = {
    var attempts = 0
    while (attempts < 50) {
      val v = store.currentVersion
      if (store.commitAt(f(store.entriesAt(v)), v)) return
      attempts += 1 // lost the race: retry on the winner's version
    }
    throw new IllegalStateException("catalog commit contention")
  }

  private def tableRoot(name: String) = s"$warehouse/$name"

  /** Catalog entries register as Spark temp views, which cannot contain
    * dots — enforce simple names up front (namespacing is the
    * warehouse directory's job). */
  private def validName(name: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"catalog names must be simple identifiers (no dots): $name")
    name
  }

  def createTable(name: String, schema: StructType,
      spec: Seq[Meta.PartitionField] = Seq.empty): GraftTable = {
    val t = GraftTable.create(spark, tableRoot(validName(name)), schema, spec)
    update(_ + (name -> "table"))
    t
  }

  def table(name: String): GraftTable = {
    require(entries.get(name).contains("table"), s"no table $name in catalog")
    GraftTable.load(spark, tableRoot(name))
  }

  def createView(name: String, viewSql: String): Unit = {
    val tableSources = entries.filter(_._2 == "table").keys
      .map(t => t -> tableRoot(t)).toMap
    Views.createView(tableRoot(validName(name)), name, viewSql, tableSources)
    update(_ + (name -> "view"))
  }

  def tableNames: Seq[String] = entries.filter(_._2 == "table").keys.toSeq.sorted
  def viewNames: Seq[String] = entries.filter(_._2 == "view").keys.toSeq.sorted

  /** Register every table and view as a temp view for Catalyst. */
  private def registerAll(): Unit = {
    tableNames.foreach(t => table(t).scan().createOrReplaceTempView(t))
    viewNames.foreach { v =>
      Views.queryView(spark, tableRoot(v)).createOrReplaceTempView(v)
    }
  }

  private val InsertInto = """(?is)\s*insert\s+into\s+([\w.]+)\s+(select\b.*)""".r
  private val CreateTableAs = """(?is)\s*create\s+table\s+([\w.]+)\s+as\s+(select\b.*)""".r
  private val CreateViewAs = """(?is)\s*create\s+view\s+([\w.]+)\s+as\s+(select\b.*)""".r
  private val DropTable = """(?is)\s*drop\s+(?:table|view)\s+([\w.]+)\s*;?\s*""".r
  private val DeleteFrom = """(?is)\s*delete\s+from\s+([\w.]+)\s+where\s+(.*)""".r
  private val Update = """(?is)\s*update\s+([\w.]+)\s+set\s+(.*?)\s+where\s+(.*)""".r

  /** Split SET clauses on top-level commas only — commas inside
    * function calls (round(x, 2)) or literals stay put. */
  private def splitAssignments(sets: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var quote: Option[Char] = None
    sets.foreach { c =>
      quote match {
        case Some(q) =>
          cur.append(c); if (c == q) quote = None
        case None => c match {
          case '\'' | '"' => quote = Some(c); cur.append(c)
          case '(' => depth += 1; cur.append(c)
          case ')' => depth -= 1; cur.append(c)
          case ',' if depth == 0 => out += cur.toString; cur.clear()
          case other => cur.append(other)
        }
      }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  /** Execute a SQL statement against the catalog. */
  def sql(stmt: String): DataFrame = stmt.stripSuffix(";") match {
    case InsertInto(name, select) =>
      registerAll()
      val df = spark.sql(select)
      table(name).append(df)
      spark.emptyDataFrame
    case CreateTableAs(name, select) =>
      registerAll()
      val df = spark.sql(select)
      createTable(name, df.schema).append(df)
      spark.emptyDataFrame
    case CreateViewAs(name, select) =>
      createView(name, select)
      spark.emptyDataFrame
    case DropTable(name) =>
      update(_ - name)
      spark.emptyDataFrame
    case DeleteFrom(name, cond) =>
      table(name).delete(org.apache.spark.sql.functions.expr(cond))
      spark.emptyDataFrame
    case Update(name, sets, cond) =>
      // merge-on-read UPDATE: position-delete the matched slots and
      // append the updated rows — write cost O(matches), not O(table)
      val t = table(name)
      val condition = org.apache.spark.sql.functions.expr(cond)
      val assignments = splitAssignments(sets).map { s =>
        val Array(colName, valueExpr) = s.split("=", 2).map(_.trim)
        colName -> org.apache.spark.sql.functions.expr(valueExpr)
      }
      t.updateWhereMoR(condition, assignments)
      spark.emptyDataFrame
    case select =>
      registerAll()
      spark.sql(select)
  }
}

object GraftCatalog {
  def apply(spark: SparkSession, warehouse: String): GraftCatalog =
    new GraftCatalog(spark, warehouse)

  /** Catalog whose registry lives in an embedded Derby database under
    * `<warehouse>/catalog-db` (reference: iceberg-sql-catalog — the
    * DB-backed registry real deployments use). Table data still lives
    * in the warehouse directory; only the name→kind registry and its
    * CAS version move into SQL rows. */
  def jdbc(spark: SparkSession, warehouse: String): GraftCatalog =
    new GraftCatalog(spark, warehouse,
      new JdbcCatalogStore(s"jdbc:derby:$warehouse/catalog-db;create=true"))
}
