package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.table.{Meta, Views}

/** Materialized-view lifecycle shared by the SQL DDL (CREATE/DROP/
  * REFRESH MATERIALIZED VIEW, intercepted by GraftSqlParser) and the
  * CALL procedures (create_mat_view / refresh_mat_view, kept for
  * compatibility). Reference: materialized views as catalog objects
  * with storage-table pointers and refresh lineage —
  * datafusion_iceberg/src/materialized_view.rs (full refresh) and the
  * reference catalog's create_materialized_view (catalog.rs:387).
  *
  * Both modes mirror tables: warehouse mode stores the view dir +
  * storage table at the conventional path; REST mode creates the MV
  * through the protocol and refreshes write data DIRECTLY to the
  * storage table on shared storage (like table data files, only the
  * definition lives behind the protocol). */
object GraftMatViews {

  /** Create: stores the view SQL + an empty storage table shaped like
    * the query output (schema from ANALYSIS only — the catalog never
    * runs the query). Returns the storage location. */
  def create(spark: SparkSession, warehouse: String,
      restBase: Option[String], parts: Seq[String], sql: String,
      srcNames: Seq[String], fold: Option[String],
      knownSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : String = {
    require(parts.length == 2,
      s"materialized view identifier must be ns.name; got ${parts.mkString(".")}")
    val sources = srcNames.map(tn =>
      tn -> sourceRoot(warehouse, restBase, tn)).toMap
    require(sources.nonEmpty, "at least one source table required")
    val schema = knownSchema.getOrElse(spark.sql(sql).schema)
    restBase match {
      case Some(base) =>
        graft.table.iceberg.IcebergRestClient.createMaterializedView(
          base, parts(0), parts(1), sql, sources, schema.json, fold)
        val (_, storage, _, _, _) = graft.table.iceberg
          .IcebergRestClient.loadMaterializedView(base, parts(0), parts(1))
        storage
      case None =>
        val root = (warehouse +: parts).mkString("/")
        require(!Views.viewExists(root) && !Meta.exists(root),
          s"view or table ${parts.mkString(".")} already exists")
        Views.createView(root, parts(1), sql, sources)
        fold.foreach(Views.writeFold(root, _))
        Views.createMaterializedStorage(root, schema)
        Views.mvStorageRoot(root)
    }
  }

  /** Resolve the MV's root directory on shared storage. */
  def mvRoot(warehouse: String, restBase: Option[String],
      parts: Seq[String]): String = {
    require(parts.length == 2,
      s"materialized view identifier must be ns.name; got ${parts.mkString(".")}")
    restBase match {
      case Some(base) =>
        val (_, storage, _, _, _) = graft.table.iceberg
          .IcebergRestClient.loadMaterializedView(base, parts(0), parts(1))
        storage.stripSuffix("/storage")
      case None => (warehouse +: parts).mkString("/")
    }
  }

  /** Refresh: 'full' recomputes and overwrites storage; 'auto' /
    * 'incremental' folds only appended source data when valid
    * (falling back to full). Returns (effective mode, row count).
    * The catalog context (warehouse/restBase) supplies the relation
    * resolver the delta substitution needs — dotted sources
    * substitute by exact STORAGE-ROOT equality, never by name
    * similarity. */
  def refresh(spark: SparkSession, warehouse: String,
      restBase: Option[String], root: String,
      mode: String): (String, Long) = {
    val mv = Views.loadMaterializedView(spark, root)
    val incremental = mode match {
      case "full" => mv.refresh(); false
      case "auto" | "incremental" =>
        mv.refreshIncremental(parts =>
          relationRoot(spark, warehouse, restBase, parts))
      case other => throw new IllegalArgumentException(
        s"unknown refresh mode '$other' (full | auto | incremental)")
    }
    (if (incremental) "incremental" else "full", mv.read.count())
  }

  /** Map a relation name from the stored view SQL to the storage root
    * it would resolve to — the identity test behind incremental delta
    * substitution. Explicit-catalog names resolve within THAT catalog
    * (so `cat2.db.t` can never alias `cat.db.t`'s delta even when the
    * ns.table parts coincide); catalog-less names resolve against the
    * MV's OWNING catalog context. 1-part names return None — their
    * resolution depends on session state the stored SQL doesn't
    * carry, and an unresolvable source falls back to full refresh
    * rather than guessing. */
  def relationRoot(spark: SparkSession, warehouse: String,
      restBase: Option[String], parts: Seq[String]): Option[String] = {
    def within(wh: String, rb: Option[String],
        rel: Seq[String]): Option[String] =
      if (rel.length < 2) None
      else rb match {
        case Some(base) =>
          graft.table.iceberg.IcebergRestClient.tableRootOf(base,
            rel.init.mkString("\u001F"), rel.last)
        case None => Option(wh).filter(_.nonEmpty)
          .map(w => (w +: rel).mkString("/"))
      }
    val cm = spark.sessionState.catalogManager
    if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
      cm.catalog(parts.head) match {
        case g: GraftTableCatalog =>
          within(g.warehouse, g.restBase, parts.tail)
        case _ => None
      }
    else within(warehouse, restBase, parts)
  }

  /** The graft-catalog tables a query reads, as 'ns.name' strings —
    * the refresh-lineage anchors the DDL derives instead of asking
    * the user to list them (the CALL surface still takes them
    * explicitly). Only relations served by the SAME catalog count:
    * lineage over a foreign catalog's snapshots is not trackable. */
  def sourcesOf(spark: SparkSession, cat: GraftTableCatalog,
      sql: String): Seq[String] = analyzeQuery(spark, cat, sql)._1

  /** One analysis pass serving BOTH needs of CREATE MATERIALIZED
    * VIEW: the same-catalog source tables (refresh-lineage anchors)
    * and the query's output schema (the storage-table shape). */
  def analyzeQuery(spark: SparkSession, cat: GraftTableCatalog,
      sql: String): (Seq[String], org.apache.spark.sql.types.StructType) = {
    val analyzed = spark.sessionState
      .executePlan(spark.sessionState.sqlParser.parseQuery(sql)).analyzed
    val names = analyzed.collectWithSubqueries {
      case r: DataSourceV2Relation
          if r.catalog.exists(_ eq cat) && r.identifier.isDefined =>
        (r.identifier.get.namespace() :+ r.identifier.get.name())
          .mkString(".")
    }
    (names.distinct, analyzed.schema)
  }

  private def sourceRoot(warehouse: String, restBase: Option[String],
      tableName: String): String = {
    // analyzeQuery emits (nsLevels :+ name).mkString("."): everything
    // before the last dot is the (possibly nested) namespace — the
    // same decomposition relationRoot applies
    val tp = tableName.split('.').toSeq
    require(tp.length >= 2, s"source table must be ns[.ns…].name; got $tableName")
    restBase match {
      case Some(base) =>
        graft.table.iceberg.IcebergRestClient
          .tableRootOf(base, tp.init.mkString("\u001F"), tp.last)
          .getOrElse(throw new IllegalArgumentException(
            s"no source table $tableName"))
      case None => (warehouse +: tp).mkString("/")
    }
  }
}
