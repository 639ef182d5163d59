package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.table.iceberg.{IcebergRestClient, IcebergRestServer}

/** Spark SQL views through the V2 catalog plugin — the reference's
  * catalog-served views (iceberg-rust/src/view, datafusion_iceberg/
  * src/table.rs:1147 test_datafusion_view_scan) on Spark's ViewCatalog
  * SPI, wired by GraftExtensions (Spark 4.1 ships the SPI with no
  * analyzer support). Warehouse mode + REST mode. */
class ViewCatalogSqlSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val whCat: (String, String) = {
    val wh = Files.createTempDirectory("graft-viewsql").toString
    val cat = s"vsql_${java.util.UUID.randomUUID().toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    val spark0 = spark
    import spark0.implicits._
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0), (4L, "b", 40.0))
      .toDF("id", "grp", "v").createOrReplaceTempView("view_src")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, grp STRING, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM view_src")
    (cat, wh)
  }
  private def cat: String = whCat._1
  private def wh: String = whCat._2

  test("CREATE VIEW / SELECT / SHOW / DROP through the plugin (warehouse)") {
    spark.sql(s"""CREATE VIEW $cat.db.v_agg AS
      SELECT grp, count(*) AS n, sum(v) AS total
      FROM $cat.db.t GROUP BY grp""")
    val got = spark.sql(s"SELECT * FROM $cat.db.v_agg ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("a", 2L, 30.0), ("b", 2L, 70.0)))
    // view rides fresh table state, not a materialization
    spark.sql(s"INSERT INTO $cat.db.t VALUES (5, 'b', 5.0)")
    assert(spark.sql(s"SELECT sum(n) FROM $cat.db.v_agg").collect()
      .head.getLong(0) === 5L)
    // SHOW VIEWS lists it; DROP removes it
    val shown = spark.sql(s"SHOW VIEWS IN $cat.db").collect()
      .map(_.getString(1))
    assert(shown.contains("v_agg"))
    spark.sql(s"DROP VIEW $cat.db.v_agg")
    assert(!spark.sql(s"SHOW VIEWS IN $cat.db").collect()
      .map(_.getString(1)).contains("v_agg"))
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.v_agg").collect())
    // IF EXISTS swallows, plain DROP throws
    spark.sql(s"DROP VIEW IF EXISTS $cat.db.v_agg")
    intercept[Exception](spark.sql(s"DROP VIEW $cat.db.v_agg"))
  }

  test("CREATE OR REPLACE and ALTER VIEW AS swap the definition") {
    spark.sql(s"CREATE VIEW $cat.db.v_r AS SELECT id FROM $cat.db.t")
    assert(spark.sql(s"SELECT * FROM $cat.db.v_r").columns.toSeq === Seq("id"))
    spark.sql(s"CREATE OR REPLACE VIEW $cat.db.v_r AS " +
      s"SELECT id, grp FROM $cat.db.t")
    assert(spark.sql(s"SELECT * FROM $cat.db.v_r").columns.toSeq ===
      Seq("id", "grp"))
    spark.sql(s"ALTER VIEW $cat.db.v_r AS SELECT grp FROM $cat.db.t")
    assert(spark.sql(s"SELECT * FROM $cat.db.v_r").columns.toSeq ===
      Seq("grp"))
    spark.sql(s"DROP VIEW $cat.db.v_r")
  }

  test("view column list renames outputs; properties round-trip") {
    spark.sql(s"""CREATE VIEW $cat.db.v_cols (k, total)
      TBLPROPERTIES ('owner'='graft-test')
      AS SELECT grp, sum(v) FROM $cat.db.t GROUP BY grp""")
    val df = spark.sql(s"SELECT * FROM $cat.db.v_cols ORDER BY k")
    assert(df.columns.toSeq === Seq("k", "total"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("a", "b"))
    // ALTER VIEW SET/UNSET TBLPROPERTIES ride the ViewCatalog SPI
    spark.sql(s"ALTER VIEW $cat.db.v_cols SET TBLPROPERTIES ('x'='1')")
    val c = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.spark.GraftTableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "v_cols")
    assert(c.loadView(ident).properties().get("x") === "1")
    assert(c.loadView(ident).properties().get("owner") === "graft-test")
    spark.sql(s"ALTER VIEW $cat.db.v_cols UNSET TBLPROPERTIES ('x')")
    assert(!c.loadView(ident).properties().containsKey("x"))
    // rename, then read under the new name
    spark.sql(s"ALTER VIEW $cat.db.v_cols RENAME TO $cat.db.v_cols2")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.v_cols2").collect()
      .head.getLong(0) === 2L)
    spark.sql(s"DROP VIEW $cat.db.v_cols2")
  }

  test("views nest: a view over a view inlines both") {
    spark.sql(s"CREATE VIEW $cat.db.v_base AS " +
      s"SELECT grp, v FROM $cat.db.t WHERE v > 15")
    spark.sql(s"CREATE VIEW $cat.db.v_top AS " +
      s"SELECT grp, sum(v) AS s FROM $cat.db.v_base GROUP BY grp")
    // t holds (10,20,30,40) + the 5.0 row test 1 appended; v>15 keeps
    // (20) for a and (30,40) for b
    val got = spark.sql(s"SELECT * FROM $cat.db.v_top ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq === Seq(("a", 20.0), ("b", 70.0)))
    spark.sql(s"DROP VIEW $cat.db.v_top")
    spark.sql(s"DROP VIEW $cat.db.v_base")
  }

  test("unqualified names in a view body resolve against the stored " +
      "creation context") {
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name()
    try {
      spark.sql(s"USE $cat.db")
      spark.sql("CREATE VIEW v_ctx AS SELECT grp, count(*) AS n " +
        "FROM t GROUP BY grp")
      spark.sql(s"USE spark_catalog")
      // read from OUTSIDE the creation context: the stored
      // current-catalog/namespace qualify the bare `t`
      val got = spark.sql(s"SELECT * FROM $cat.db.v_ctx ORDER BY grp")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.length === 2)
    } finally {
      spark.sql(s"USE $prevCat")
      spark.sql(s"DROP VIEW IF EXISTS $cat.db.v_ctx")
    }
  }

  test("DESCRIBE [EXTENDED] renders a catalog view's schema and text") {
    spark.sql(s"CREATE VIEW $cat.db.v_desc AS " +
      s"SELECT grp, count(*) AS n FROM $cat.db.t GROUP BY grp")
    val plain = spark.sql(s"DESCRIBE $cat.db.v_desc").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(plain.toSeq.take(2) === Seq(("grp", "string"), ("n", "bigint")))
    val ext = spark.sql(s"DESCRIBE EXTENDED $cat.db.v_desc").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(ext.getOrElse("Text", "").contains("GROUP BY grp"))
    assert(ext.contains("Default Catalog"))
    spark.sql(s"DROP VIEW $cat.db.v_desc")
  }

  test("a multi-part view name is absolute within the catalog, not " +
      "relative to the current namespace") {
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db2")
    try {
      spark.sql(s"USE $cat.db")
      // db2.v must land in db2 even while USE-ing db
      spark.sql(s"CREATE VIEW db2.v_abs AS SELECT 7 AS seven")
      assert(spark.sql(s"SHOW VIEWS IN $cat.db2").collect()
        .map(_.getString(1)).contains("v_abs"))
      assert(!spark.sql(s"SHOW VIEWS IN $cat.db").collect()
        .map(_.getString(1)).contains("v_abs"))
      assert(spark.sql(s"SELECT * FROM db2.v_abs").collect()
        .head.getInt(0) === 7)
      spark.sql("DROP VIEW db2.v_abs")
    } finally spark.sql(s"USE $prevCat")
  }

  test("a view cannot shadow a table; a table cannot shadow a view") {
    intercept[Exception](
      spark.sql(s"CREATE VIEW $cat.db.t AS SELECT 1 AS x"))
    spark.sql(s"CREATE VIEW $cat.db.v_shadow AS SELECT 1 AS x")
    intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.db.v_shadow (y BIGINT)"))
    spark.sql(s"DROP VIEW $cat.db.v_shadow")
  }

  test("temp views keep precedence over catalog views for unqualified " +
      "names and DROP") {
    val spark0 = spark
    import spark0.implicits._
    Seq(99L).toDF("only_temp").createOrReplaceTempView("v_prec")
    spark.sql(s"CREATE VIEW $cat.db.v_prec AS SELECT id FROM $cat.db.t")
    // DROP VIEW on the bare name must hit the TEMP view
    spark.sql("DROP VIEW v_prec")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.v_prec").collect()
      .head.getLong(0) === 5L)
    spark.sql(s"DROP VIEW $cat.db.v_prec")
  }

  test("materialized view: identifier serves the storage table and " +
      "refresh_state surfaces staleness") {
    val mvRoot = s"$wh/db/mv_daily"
    val mv = graft.table.Views.createMaterializedView(spark, mvRoot,
      "mv_daily",
      s"SELECT grp, count(*) AS n FROM $cat.db.t GROUP BY grp",
      Map(s"$cat.db.t" -> s"$wh/db/t"))
    mv.refresh()
    // SELECT from the MV identifier reads the MATERIALIZATION
    val got = spark.sql(s"SELECT * FROM $cat.db.mv_daily ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("a", 2L), ("b", 3L)))
    // staleness is visible as a metadata table
    val fresh = spark.sql(s"SELECT * FROM $cat.db.mv_daily.refresh_state")
      .collect()
    assert(fresh.forall(!_.getBoolean(3)), "just refreshed => not stale")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (6, 'c', 6.0)")
    val stale = spark.sql(s"SELECT * FROM $cat.db.mv_daily.refresh_state")
      .collect()
    assert(stale.exists(_.getBoolean(3)), "source moved => stale")
    // the MV read itself still serves the LAST materialization
    assert(spark.sql(s"SELECT sum(n) FROM $cat.db.mv_daily").collect()
      .head.getLong(0) === 5L)
    mv.refresh()
    assert(spark.sql(s"SELECT sum(n) FROM $cat.db.mv_daily").collect()
      .head.getLong(0) === 6L)
  }

  test("CALL create_mat_view / refresh_mat_view lifecycle (warehouse)") {
    spark.sql(s"CALL $cat.system.create_mat_view('db.mv_proc', " +
      s"'SELECT grp, sum(v) AS s FROM $cat.db.t GROUP BY grp', 'db.t')")
    val r1 = spark.sql(
      s"CALL $cat.system.refresh_mat_view('db.mv_proc', 'full')").collect()
    assert(r1.head.getString(0) === "full")
    val expected = spark.sql(
      s"SELECT grp, sum(v) AS s FROM $cat.db.t GROUP BY grp ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val got = spark.sql(s"SELECT * FROM $cat.db.mv_proc ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === expected)
    // fresh after refresh; stale after a source append
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.mv_proc.refresh_state " +
      "WHERE stale").collect().head.getLong(0) === 0L)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (100, 'z', 1.0)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.mv_proc.refresh_state " +
      "WHERE stale").collect().head.getLong(0) > 0L)
    spark.sql(s"CALL $cat.system.refresh_mat_view('db.mv_proc', 'full')")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.mv_proc").collect()
      .head.getLong(0) === expected.size + 1L)
  }

  // ---- REST mode ------------------------------------------------------

  private lazy val restEnv: (IcebergRestServer, String, String) = {
    val rwh = Files.createTempDirectory("graft-viewrest").toString
    val server = new IcebergRestServer(rwh).start()
    val rcat = s"vrest_${java.util.UUID.randomUUID().toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$rcat", "graft.spark.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$rcat.uri",
      s"http://127.0.0.1:${server.port}")
    spark.sql(s"CREATE NAMESPACE $rcat.db")
    spark.sql(s"CREATE TABLE $rcat.db.s (k BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $rcat.db.s VALUES (1, 1.5), (2, 2.5), (1, 3.0)")
    (server, rcat, rwh)
  }
  private def rcat: String = restEnv._2

  test("CREATE / SELECT / replace / SHOW / DROP VIEW over a live REST " +
      "server") {
    spark.sql(s"""CREATE VIEW $rcat.db.v AS
      SELECT k, sum(v) AS s FROM $rcat.db.s GROUP BY k""")
    // the definition lives on the SERVER
    assert(IcebergRestClient.listViews(
      s"http://127.0.0.1:${restEnv._1.port}", "db").contains("v"))
    val got = spark.sql(s"SELECT * FROM $rcat.db.v ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === Seq((1L, 4.5), (2L, 2.5)))
    spark.sql(s"CREATE OR REPLACE VIEW $rcat.db.v AS " +
      s"SELECT count(*) AS n FROM $rcat.db.s")
    assert(spark.sql(s"SELECT * FROM $rcat.db.v").collect()
      .head.getLong(0) === 3L)
    assert(spark.sql(s"SHOW VIEWS IN $rcat.db").collect()
      .map(_.getString(1)).contains("v"))
    spark.sql(s"DROP VIEW $rcat.db.v")
    assert(!IcebergRestClient.viewExists(
      s"http://127.0.0.1:${restEnv._1.port}", "db", "v"))
  }

  test("CALL create_mat_view / refresh_mat_view over a live REST server") {
    spark.sql(s"CALL $rcat.system.create_mat_view('db.mv_rest', " +
      s"'SELECT k, count(*) AS n FROM $rcat.db.s GROUP BY k', 'db.s')")
    // the view DEFINITION lives on the server, materialization flagged
    val base = s"http://127.0.0.1:${restEnv._1.port}"
    val (_, _, materialized) =
      IcebergRestClient.loadViewDef(base, "db", "mv_rest").get
    assert(materialized)
    spark.sql(s"CALL $rcat.system.refresh_mat_view('db.mv_rest', 'full')")
    val got = spark.sql(s"SELECT * FROM $rcat.db.mv_rest ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (2L, 1L)))
    // staleness over REST rides refresh_state too (REST sources are
    // real-format Iceberg tables — dialect-aware snapshot probe)
    assert(spark.sql(s"SELECT count(*) FROM $rcat.db.mv_rest.refresh_state" +
      " WHERE stale").collect().head.getLong(0) === 0L)
    spark.sql(s"INSERT INTO $rcat.db.s VALUES (3, 9.0)")
    assert(spark.sql(s"SELECT count(*) FROM $rcat.db.mv_rest.refresh_state" +
      " WHERE stale").collect().head.getLong(0) > 0L)
    spark.sql(s"CALL $rcat.system.refresh_mat_view('db.mv_rest', 'full')")
    assert(spark.sql(s"SELECT sum(n) FROM $rcat.db.mv_rest").collect()
      .head.getLong(0) === 4L)
  }

  test("MATERIALIZED VIEW DDL lifecycle (warehouse)") {
    // sources derived from the analyzed query — no explicit list
    spark.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_ddl AS
      SELECT grp, count(*) AS n FROM $cat.db.t GROUP BY grp""")
    // created but never refreshed: storage exists, empty
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.mv_ddl")
      .collect().head.getLong(0) === 0L)
    val r = spark.sql(s"REFRESH MATERIALIZED VIEW $cat.db.mv_ddl FULL")
      .collect()
    assert(r.head.getString(0) === "full" && r.head.getLong(1) > 0L)
    val expected = spark.sql(
      s"SELECT grp, count(*) AS n FROM $cat.db.t GROUP BY grp ORDER BY grp")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(spark.sql(s"SELECT * FROM $cat.db.mv_ddl ORDER BY grp")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq === expected)
    // refresh lineage anchored: a source append flags staleness
    spark.sql(s"INSERT INTO $cat.db.t VALUES (200, 'q', 2.0)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.mv_ddl.refresh_state " +
      "WHERE stale").collect().head.getLong(0) > 0L)
    // bare REFRESH defaults to auto
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.db.mv_ddl")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.mv_ddl.refresh_state " +
      "WHERE stale").collect().head.getLong(0) === 0L)
    // IF NOT EXISTS no-ops; a plain re-create throws
    spark.sql(s"CREATE MATERIALIZED VIEW IF NOT EXISTS $cat.db.mv_ddl " +
      s"AS SELECT grp FROM $cat.db.t")
    intercept[Exception](spark.sql(
      s"CREATE MATERIALIZED VIEW $cat.db.mv_ddl AS SELECT grp FROM $cat.db.t"))
    // DROP MATERIALIZED VIEW refuses a plain view
    spark.sql(s"CREATE VIEW $cat.db.v_notmv AS SELECT id FROM $cat.db.t")
    intercept[Exception](
      spark.sql(s"DROP MATERIALIZED VIEW $cat.db.v_notmv"))
    spark.sql(s"DROP VIEW $cat.db.v_notmv")
    spark.sql(s"DROP MATERIALIZED VIEW $cat.db.mv_ddl")
    assert(!spark.sql(s"SHOW VIEWS IN $cat.db").collect()
      .map(_.getString(1)).contains("mv_ddl"))
    intercept[Exception](
      spark.sql(s"DROP MATERIALIZED VIEW $cat.db.mv_ddl"))
    spark.sql(s"DROP MATERIALIZED VIEW IF EXISTS $cat.db.mv_ddl")
    // a query reading no catalog table cannot anchor lineage
    intercept[Exception](spark.sql(
      s"CREATE MATERIALIZED VIEW $cat.db.mv_nosrc AS SELECT 1 AS one"))
  }

  test("MATERIALIZED VIEW DDL with TBLPROPERTIES carries the fold SQL") {
    // the fold value contains parens, commas, quotes, and AS — the
    // balanced TBLPROPERTIES scan must deliver it intact
    spark.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_props
      TBLPROPERTIES('incremental_fold' =
        'SELECT grp, sum(n) AS n FROM mv_delta_union GROUP BY grp')
      AS SELECT grp, count(*) AS n FROM $cat.db.t GROUP BY grp""")
    val root = s"$wh/db/mv_props"
    graft.table.Views.loadView(root) // definition present
    // fold.sql written next to the definition
    val stored = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/fold.sql")), "UTF-8")
    assert(stored.contains("mv_delta_union") && stored.contains("sum(n)"))
    // first refresh has no lineage to fold onto — honest full; the
    // result row reports the effective mode
    assert(spark.sql(
        s"REFRESH MATERIALIZED VIEW $cat.db.mv_props INCREMENTAL")
      .collect().head.getString(0) === "full")
    val before = spark.sql(s"SELECT * FROM $cat.db.mv_props")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // append-only source move: the dotted (catalog-derived) source is
    // scoped to its delta by plan substitution, so the refresh is
    // really incremental — and the folded result matches a recompute
    spark.sql(s"INSERT INTO $cat.db.t VALUES (300, 'q', 7.0), (301, 'r', 8.0)")
    assert(spark.sql(
        s"REFRESH MATERIALIZED VIEW $cat.db.mv_props INCREMENTAL")
      .collect().head.getString(0) === "incremental")
    val got = spark.sql(s"SELECT * FROM $cat.db.mv_props")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = spark.sql(
      s"SELECT grp, count(*) AS n FROM $cat.db.t GROUP BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want, s"incremental fold diverged: $got vs $want")
    assert(got("q") === before.getOrElse("q", 0L) + 1)
    // a non-append source move (delete) falls back to full
    spark.sql(s"DELETE FROM $cat.db.t WHERE id = 300")
    assert(spark.sql(
        s"REFRESH MATERIALIZED VIEW $cat.db.mv_props INCREMENTAL")
      .collect().head.getString(0) === "full")
    spark.sql(s"DROP MATERIALIZED VIEW $cat.db.mv_props")
  }

  test("incremental MV: a source reached through a temp view falls back " +
    "to FULL instead of double-counting") {
    val spark0 = spark
    import spark0.implicits._
    spark.sql(s"CREATE TABLE $cat.db.tsrc (grp STRING)")
    spark.sql(s"INSERT INTO $cat.db.tsrc VALUES ('a'), ('a'), ('b')")
    // the stored SQL reaches the source ONLY through a temp view, so
    // at refresh time no relation resolves to the source's root — the
    // resolver cannot scope a delta and the refresh must be FULL
    spark.sql(s"CREATE TEMPORARY VIEW tsrc_wrap AS SELECT * FROM $cat.db.tsrc")
    spark.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_wrap
      TBLPROPERTIES('incremental_fold' =
        'SELECT grp, sum(n) AS n FROM mv_delta_union GROUP BY grp')
      AS SELECT grp, count(*) AS n FROM tsrc_wrap GROUP BY grp""")
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.db.mv_wrap FULL")
    spark.sql(s"INSERT INTO $cat.db.tsrc VALUES ('a'), ('c')")
    val eff = spark.sql(
      s"REFRESH MATERIALIZED VIEW $cat.db.mv_wrap INCREMENTAL")
      .collect().head.getString(0)
    assert(eff === "full",
      "an unscopeable source must fall back to full, never treat the " +
        "whole source as its own delta")
    val got = spark.sql(s"SELECT * FROM $cat.db.mv_wrap ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 3L), ("b", 1L), ("c", 1L)),
      s"double-counted: $got")
    spark.sql(s"DROP MATERIALIZED VIEW $cat.db.mv_wrap")
    spark.sql("DROP VIEW tsrc_wrap")
  }

  test("incremental MV over an ADOPTED real-format Iceberg source " +
    "through the DDL surface: delta fold, honest fallback on row changes") {
    val spark0 = spark
    import spark0.implicits._
    // the source is a REAL-format table a FOREIGN writer created inside
    // the warehouse — the catalog serves it like any adopted table
    val loc = s"$wh/db/icesrc"
    graft.table.iceberg.IcebergWrite.create(spark, loc,
      Seq("a", "a", "b").toDF("grp"))
    spark.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_ice
      TBLPROPERTIES('incremental_fold' =
        'SELECT grp, sum(n) AS n FROM mv_delta_union GROUP BY grp')
      AS SELECT grp, count(*) AS n FROM $cat.db.icesrc GROUP BY grp""")
    spark.sql(s"REFRESH MATERIALIZED VIEW $cat.db.mv_ice FULL")
    // a FOREIGN append (not through the catalog) moves the source
    graft.table.iceberg.IcebergWrite.append(spark, loc,
      Seq("a", "c").toDF("grp"))
    val eff = spark.sql(
      s"REFRESH MATERIALIZED VIEW $cat.db.mv_ice INCREMENTAL")
      .collect().head.getString(0)
    assert(eff === "incremental",
      "append-only real-format source must fold incrementally")
    val got = spark.sql(s"SELECT * FROM $cat.db.mv_ice ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 3L), ("b", 1L), ("c", 1L)), s"fold drifted: $got")
    // a row-changing MoR equality delete forces the honest full path
    graft.table.iceberg.IcebergWrite.deleteEquality(spark, loc,
      Seq("b").toDF("grp"), Seq("grp"))
    val eff2 = spark.sql(
      s"REFRESH MATERIALIZED VIEW $cat.db.mv_ice INCREMENTAL")
      .collect().head.getString(0)
    assert(eff2 === "full", "row-changing snapshot must force full")
    val got2 = spark.sql(s"SELECT * FROM $cat.db.mv_ice ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got2 === Seq(("a", 3L), ("c", 1L)),
      s"full refresh must read MoR-visible: $got2")
    spark.sql(s"DROP MATERIALIZED VIEW $cat.db.mv_ice")
  }

  test("incremental MV: a same-named table in ANOTHER catalog is never " +
    "mistaken for the source's delta") {
    val spark0 = spark
    import spark0.implicits._
    val whB = Files.createTempDirectory("graft-viewsql-b").toString
    val catB = s"vsqlb_${java.util.UUID.randomUUID().toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$catB", "graft.spark.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$catB.warehouse", whB)
    try {
      spark.sql(s"CREATE NAMESPACE $catB.db")
      // SAME ns.table name in both catalogs; catB's is a static dim
      spark.sql(s"CREATE TABLE $cat.db.xsrc (grp STRING)")
      spark.sql(s"INSERT INTO $cat.db.xsrc VALUES ('a'), ('b')")
      spark.sql(s"CREATE TABLE $catB.db.xsrc (grp STRING, w BIGINT)")
      spark.sql(s"INSERT INTO $catB.db.xsrc VALUES ('a', 10), ('b', 20), ('c', 30)")
      spark.sql(s"""CREATE MATERIALIZED VIEW $cat.db.mv_x
        TBLPROPERTIES('incremental_fold' =
          'SELECT grp, sum(n) AS n, sum(tw) AS tw FROM mv_delta_union GROUP BY grp')
        AS SELECT a.grp, count(*) AS n, sum(b.w) AS tw
           FROM $cat.db.xsrc a JOIN $catB.db.xsrc b ON a.grp = b.grp
           GROUP BY a.grp""")
      spark.sql(s"REFRESH MATERIALIZED VIEW $cat.db.mv_x FULL")
      // append-only move of the TRACKED source; the dim is static
      spark.sql(s"INSERT INTO $cat.db.xsrc VALUES ('a'), ('c')")
      val eff = spark.sql(
        s"REFRESH MATERIALIZED VIEW $cat.db.mv_x INCREMENTAL")
        .collect().head.getString(0)
      assert(eff === "incremental")
      // delta JOIN full-dim folds to exactly the recompute; the old
      // suffix matcher substituted catB.db.xsrc with catA's delta
      // (delta JOIN delta) and diverged
      val got = spark.sql(s"SELECT * FROM $cat.db.mv_x ORDER BY grp")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val want = spark.sql(
        s"""SELECT a.grp, count(*) AS n, sum(b.w) AS tw
            FROM $cat.db.xsrc a JOIN $catB.db.xsrc b ON a.grp = b.grp
            GROUP BY a.grp ORDER BY a.grp""")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === want, s"cross-catalog substitution corrupted: $got vs $want")
      spark.sql(s"DROP MATERIALIZED VIEW $cat.db.mv_x")
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$catB")
      spark.conf.unset(s"spark.sql.catalog.$catB.warehouse")
    }
  }

  test("MATERIALIZED VIEW DDL over a live REST server") {
    spark.sql(s"""CREATE MATERIALIZED VIEW $rcat.db.mv_rddl AS
      SELECT k, count(*) AS n FROM $rcat.db.s GROUP BY k""")
    val base = s"http://127.0.0.1:${restEnv._1.port}"
    val (_, _, materialized) =
      IcebergRestClient.loadViewDef(base, "db", "mv_rddl").get
    assert(materialized, "REST DDL create must register an MV")
    val r = spark.sql(s"REFRESH MATERIALIZED VIEW $rcat.db.mv_rddl FULL")
      .collect()
    assert(r.head.getString(0) === "full")
    assert(spark.sql(s"SELECT sum(n) FROM $rcat.db.mv_rddl").collect()
      .head.getLong(0) === spark.sql(s"SELECT count(*) FROM $rcat.db.s")
      .collect().head.getLong(0))
    spark.sql(s"DROP MATERIALIZED VIEW $rcat.db.mv_rddl")
    assert(IcebergRestClient.loadViewDef(base, "db", "mv_rddl").isEmpty)
  }

  test("concurrent view replace over REST: exactly one CAS winner") {
    val base = s"http://127.0.0.1:${restEnv._1.port}"
    spark.sql(s"CREATE VIEW $rcat.db.vrace AS SELECT 1 AS one")
    val (_, _, baseVersion) = IcebergRestClient.loadView(base, "db", "vrace")
    // two replacers race from the SAME base version: the server's
    // view CAS admits exactly one; the loser sees 409
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(2)
    val futs = (1 to 2).map { i =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        override def call(): Int = IcebergRestClient.replaceView(
          base, "db", "vrace", s"SELECT $i AS one", baseVersion)
      })
    }
    val codes = futs.map(_.get()).toList
    pool.shutdown()
    assert(codes.sorted === List(200, 409))
    spark.sql(s"DROP VIEW $rcat.db.vrace")
  }
}
