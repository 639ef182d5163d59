package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.table.GraftCatalog
import java.nio.file.Files

/** Catalog + SQL front-end operators (SURVEY.md §2.C): the reference's
  * end-to-end flows — CSV ingestion through INSERT INTO
  * (datafusion_iceberg/examples/insert_csv.rs), CTAS, catalog SQL
  * reads, and incremental MV refresh — as driver-checkable queries.
  */
object CatalogOps {
  type Q = (SparkSession, String) => DataFrame

  private def scratch(): String =
    Files.createTempDirectory("graft-cat").toString

  /** CSV → INSERT INTO → aggregate through the catalog SQL layer
    * (mirrors insert_csv.rs: load lineitem CSV, insert, group-by). */
  val tfInsertSelect: Q = (s, d) => {
    val wh = scratch()
    val cat = GraftCatalog(s, wh)
    // stage the lineitem sample as CSV — the source-format leg
    val csvDir = s"$wh/csv_in"
    val li = Tables.lineitem(s, d)
    li.write.option("header", "true").csv(csvDir)
    val csv = s.read.option("header", "true").schema(li.schema).csv(csvDir)
    csv.createOrReplaceTempView("lineitem_csv")

    cat.createTable("li", li.schema)
    cat.sql("insert into li select * from lineitem_csv")
    cat.sql("""select l_returnflag, sum(l_quantity) as sum_qty,
               count(*) as n from li group by l_returnflag
               order by l_returnflag""")
  }

  val tfInsertSelectSql: String =
    """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n
       FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""

  /** CTAS + catalog view + join through the SQL front-end. */
  val tfCtasView: Q = (s, d) => {
    val cat = GraftCatalog(s, scratch())
    Tables.orders(s, d).createOrReplaceTempView("orders_src")
    Tables.customer(s, d).createOrReplaceTempView("customer_src")
    cat.sql("create table ord as select * from orders_src")
    cat.sql("create table cust as select * from customer_src")
    cat.sql("""create view cust_orders as
               select c_mktsegment, count(*) as n,
                      round(sum(o_totalprice),2) as total
               from ord join cust on o_custkey = c_custkey
               group by c_mktsegment""")
    cat.sql("select * from cust_orders order by c_mktsegment")
  }

  val tfCtasViewSql: String =
    """SELECT c_mktsegment, count(*) AS n, round(sum(o_totalprice),2) AS total
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY 1 ORDER BY c_mktsegment"""

  /** Incremental MV refresh: base load → refresh → append delta →
    * incremental fold. Result must equal the full recompute (oracle);
    * the incremental path itself (delta-only IO) is asserted in
    * TableSpec. */
  val tfMvIncremental: Q = (s, d) => {
    val wh = scratch()
    val cat = GraftCatalog(s, wh)
    val ev = Tables.events(s, d)
    cat.createTable("ev", ev.schema)
    cat.table("ev").append(ev.filter(col("event_id") % 4 =!= 0))
    // sums stay unrounded in the materialization: rounding composes
    // wrongly across incremental folds (round(a)+round(b) != round(a+b))
    val mv = graft.table.Views.createMaterializedView(s, s"$wh/mv", "by_type",
      """SELECT event_type, count(*) AS n, sum(value) AS total
         FROM ev GROUP BY event_type""",
      Map("ev" -> s"$wh/ev"),
      incrementalFold = Some(
        """SELECT event_type, sum(n) AS n, sum(total) AS total
           FROM mv_delta_union GROUP BY event_type"""))
    mv.refresh()
    cat.table("ev").append(ev.filter(col("event_id") % 4 === 0))
    mv.refreshIncremental()
    mv.read.select(col("event_type"), col("n"), round(col("total"), 2).as("total"))
      .orderBy(col("event_type"))
  }

  val tfMvIncrementalSql: String =
    """SELECT event_type, count(*) AS n, round(sum(value),2) AS total
       FROM events GROUP BY 1 ORDER BY event_type"""

  /** DataSource V2 path: spark.read.format("graft") with predicate +
    * column pushdown (manifest pruning inside Spark's planner, then
    * the vectorized parquet reader). */
  val tfConnectorScan: Q = (s, d) => {
    val wh = scratch()
    val li = Tables.lineitem(s, d)
    graft.table.GraftTable
      .create(s, s"$wh/li", li.schema, sortOrder = Seq("l_shipdate"))
      .append(li)
    s.read.format("graft").load(s"$wh/li")
      .filter(col("l_shipdate") >= to_timestamp(lit("1998-01-01 00:00:00")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy(col("l_returnflag"))
  }

  val tfConnectorScanSql: String =
    """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),2) AS qty
       FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY 1 ORDER BY l_returnflag"""

  /** Spark SQL fronting a LIVE Iceberg REST catalog server — the
    * reference's standard multi-engine deployment (iceberg-rest-
    * catalog/src/catalog.rs:61 RestCatalog as a Catalog,
    * datafusion_iceberg/src/catalog/catalog.rs:34 exposing it to
    * SQL): CREATE/INSERT/DELETE/UPDATE all commit through the
    * update-table protocol (requirements + updates, server-side
    * CAS); data files write to shared storage directly. The result
    * materializes eagerly so the in-query server can stop. */
  val tfRestSql: Q = (s, d) => {
    val wh = scratch()
    val server = new graft.table.iceberg.IcebergRestServer(wh).start()
    val cat = s"restq_${java.util.UUID.randomUUID().toString.take(6)}"
    try {
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftTableCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.uri",
        s"http://127.0.0.1:${server.port}")
      s.sql(s"CREATE NAMESPACE $cat.db")
      Tables.supplier(s, d).createOrReplaceTempView("supp_rest_src")
      s.sql(s"CREATE TABLE $cat.db.supp " +
        "(s_suppkey BIGINT, s_nationkey BIGINT, s_acctbal DOUBLE)")
      s.sql(s"INSERT INTO $cat.db.supp SELECT s_suppkey, s_nationkey, " +
        "s_acctbal FROM supp_rest_src")
      s.sql(s"DELETE FROM $cat.db.supp WHERE s_acctbal < 0")
      s.sql(s"UPDATE $cat.db.supp SET s_acctbal = s_acctbal * 2 " +
        "WHERE s_nationkey = 3")
      val out = s.sql(s"SELECT s_nationkey, count(*) AS n, " +
        s"round(sum(s_acctbal), 2) AS bal FROM $cat.db.supp " +
        "GROUP BY s_nationkey ORDER BY s_nationkey")
      val rows = out.collect().toSeq
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        out.schema)
    } finally {
      // unset in finally: a throw mid-sequence must not leak a
      // catalog registration (and its commit routes) pointing at a
      // dead server for the rest of the session
      s.conf.unset(s"spark.sql.catalog.$cat")
      s.conf.unset(s"spark.sql.catalog.$cat.uri")
      graft.table.iceberg.IcebergRestCommit.deregisterBase(
        s"http://127.0.0.1:${server.port}")
      server.stop()
    }
  }

  val tfRestSqlSql: String =
    """SELECT s_nationkey, count(*) AS n, round(sum(s_acctbal), 2) AS bal
       FROM (SELECT s_nationkey,
                    CASE WHEN s_nationkey = 3 THEN s_acctbal * 2
                         ELSE s_acctbal END AS s_acctbal
             FROM supplier WHERE s_acctbal >= 0)
       GROUP BY s_nationkey ORDER BY s_nationkey"""

  /** `CREATE VIEW cat.db.v AS ...` through the Spark V2 catalog
    * plugin (the reference's catalog-served views — iceberg-rust/src/
    * view + datafusion_iceberg/src/table.rs:1147
    * test_datafusion_view_scan): warehouse-mode GraftTableCatalog,
    * ViewCatalog SPI wired by GraftExtensions. Exercises create,
    * replace with a column list, and a read that inlines the view
    * over the V2 table scan. Requires the session to carry
    * spark.sql.extensions=graft.functions.GraftExtensions (Verify /
    * Bench / tests all do). */
  val tfCatalogView: Q = (s, d) => {
    val wh = scratch()
    val cat = s"wview_${java.util.UUID.randomUUID().toString.take(6)}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftTableCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      s.sql(s"CREATE NAMESPACE $cat.db")
      Tables.orders(s, d).createOrReplaceTempView("ord_view_src")
      s.sql(s"CREATE TABLE $cat.db.ord (o_orderkey BIGINT, " +
        "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)")
      s.sql(s"INSERT INTO $cat.db.ord SELECT o_orderkey, o_custkey, " +
        "o_orderstatus, o_totalprice FROM ord_view_src")
      s.sql(s"CREATE VIEW $cat.db.big_orders AS SELECT o_orderstatus, " +
        s"o_totalprice FROM $cat.db.ord WHERE o_totalprice > 100000")
      // replace with a column list: the stored canonical SQL carries
      // the aliases, so the read below needs no rename logic
      s.sql(s"CREATE OR REPLACE VIEW $cat.db.big_orders (status, price) " +
        s"AS SELECT o_orderstatus, o_totalprice FROM $cat.db.ord " +
        "WHERE o_totalprice > 150000")
      // exact decimal summation: a double sum over ~1.5M prices
      // associates differently between engines at sf1 (last-cent
      // drift); both sides sum DECIMAL(18,2) and cast the final
      val out = s.sql(s"SELECT status, count(*) AS n, " +
        "CAST(round(sum(CAST(price AS DECIMAL(18,2))), 2) AS DOUBLE) " +
        s"AS total FROM $cat.db.big_orders " +
        "GROUP BY status ORDER BY status")
      // materialize before unregistering the scratch catalog
      val rows = out.collect().toSeq
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        out.schema)
    } finally {
      s.conf.unset(s"spark.sql.catalog.$cat")
      s.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  val tfCatalogViewSql: String =
    """SELECT o_orderstatus AS status, count(*) AS n,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                   AS DOUBLE) AS total
       FROM orders WHERE o_totalprice > 150000
       GROUP BY 1 ORDER BY status"""

  /** Materialized views as catalog objects through the plugin
    * (reference: datafusion_iceberg/src/materialized_view.rs full
    * refresh): CALL create_mat_view + refresh_mat_view on the
    * ProcedureCatalog, staleness via the <mv>.refresh_state metadata
    * table, reads through the MV identifier (storage table). */
  val tfCatalogMv: Q = (s, d) => {
    val wh = scratch()
    val cat = s"wmv_${java.util.UUID.randomUUID().toString.take(6)}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftTableCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      s.sql(s"CREATE NAMESPACE $cat.db")
      Tables.events(s, d).createOrReplaceTempView("ev_mv_src")
      s.sql(s"CREATE TABLE $cat.db.ev (event_id BIGINT, " +
        "event_type STRING, value DOUBLE)")
      s.sql(s"INSERT INTO $cat.db.ev SELECT event_id, event_type, value " +
        "FROM ev_mv_src WHERE event_id % 4 != 0")
      // first-class DDL (round 14): CREATE/REFRESH MATERIALIZED VIEW
      // intercepted at the parser, source lineage derived from the
      // analyzed query; the CALL surface stays for compatibility
      s.sql(s"CREATE MATERIALIZED VIEW $cat.db.by_type AS " +
        s"SELECT event_type, count(*) AS n, sum(value) AS total " +
        s"FROM $cat.db.ev GROUP BY event_type")
      s.sql(s"REFRESH MATERIALIZED VIEW $cat.db.by_type FULL")
      // source moves -> refresh_state flags staleness; the MV read
      // still serves the LAST materialization until the next refresh
      s.sql(s"INSERT INTO $cat.db.ev SELECT event_id, event_type, value " +
        "FROM ev_mv_src WHERE event_id % 4 = 0")
      val stale = s.sql(
        s"SELECT count(*) FROM $cat.db.by_type.refresh_state WHERE stale")
        .collect().head.getLong(0)
      require(stale > 0, "refresh_state must flag the moved source")
      // compat: the CALL spelling refreshes the same catalog object
      s.sql(s"CALL $cat.system.refresh_mat_view('db.by_type', 'full')")
      val out = s.sql(s"SELECT event_type, n, round(total, 2) AS total " +
        s"FROM $cat.db.by_type ORDER BY event_type")
      val rows = out.collect().toSeq
      s.sql(s"DROP MATERIALIZED VIEW $cat.db.by_type")
      require(s.sql(s"SHOW VIEWS IN $cat.db").collect()
        .forall(_.getString(1) != "by_type"), "DROP MV must remove it")
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        out.schema)
    } finally {
      s.conf.unset(s"spark.sql.catalog.$cat")
      s.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  val tfCatalogMvSql: String =
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
       FROM events GROUP BY 1 ORDER BY event_type"""

  /** Atomic CTAS + RTAS through the plugin (StagingTableCatalog; the
    * staged execs — reference: the REST protocol's stage-create flag,
    * iceberg-rust/src/catalog/create.rs:59): CREATE TABLE AS SELECT
    * publishes with one rename, CREATE OR REPLACE swaps schema +
    * partition spec + data in ONE metadata commit while the
    * pre-replace snapshot stays time-travelable. The in-query
    * requires lock the staged semantics (replace op recorded, old
    * schema still served by VERSION AS OF); the returned aggregate is
    * the oracle-checked read of the replaced table. */
  val tfRtas: Q = (s, d) => {
    val wh = scratch()
    val cat = s"wrtas_${java.util.UUID.randomUUID().toString.take(6)}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftTableCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      s.sql(s"CREATE NAMESPACE $cat.db")
      Tables.part(s, d).createOrReplaceTempView("part_rtas_src")
      s.sql(s"CREATE TABLE $cat.db.p AS SELECT p_partkey, p_brand, " +
        "p_retailprice FROM part_rtas_src WHERE p_size > 25")
      val pre = s.sql(s"SELECT snapshot_id FROM $cat.db.p.snapshots")
        .collect().map(_.getLong(0)).max
      val preCount = s.table(s"$cat.db.p").count()
      // the replace: new column set, new partition spec, new content —
      // atomically, keeping the table's identity and history
      s.sql(s"CREATE OR REPLACE TABLE $cat.db.p " +
        "PARTITIONED BY (bucket(8, p_partkey)) AS " +
        "SELECT p_partkey, p_brand, p_retailprice AS price " +
        "FROM part_rtas_src WHERE p_size <= 25")
      val m = graft.table.Meta.load(s"$wh/db/p")
      require(m.snapshots.exists(_.operation == "replace"),
        "RTAS must commit a 'replace' snapshot")
      require(m.spec.map(_.transform) == Seq("bucket[8]"),
        s"RTAS must install the new spec, got ${m.spec}")
      val old = s.sql(s"SELECT * FROM $cat.db.p VERSION AS OF $pre")
      require(old.columns.toSeq == Seq("p_partkey", "p_brand",
        "p_retailprice") && old.count() == preCount,
        "pre-replace snapshot must keep its schema and content")
      val out = s.sql(s"SELECT p_brand, count(*) AS n, " +
        "CAST(round(sum(CAST(price AS DECIMAL(18,2))), 2) AS DOUBLE) " +
        s"AS total FROM $cat.db.p GROUP BY p_brand ORDER BY p_brand")
      val rows = out.collect().toSeq
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        out.schema)
    } finally {
      s.conf.unset(s"spark.sql.catalog.$cat")
      s.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  val tfRtasSql: String =
    """SELECT p_brand, count(*) AS n,
              CAST(round(sum(CAST(p_retailprice AS DECIMAL(18,2))), 2)
                   AS DOUBLE) AS total
       FROM part WHERE p_size <= 25
       GROUP BY 1 ORDER BY p_brand"""

  /** The V2 overwrite modes through the plugin — the daily
    * re-materialization workhorse at 100 TB: static
    * `INSERT OVERWRITE ... PARTITION (k=v)` drops the replaced
    * partition's files METADATA-ONLY (stats prove every row matches;
    * commit IO proportional to the NEW data, verified in-query) and
    * dynamic partitionOverwriteMode replaces exactly the partitions
    * the incoming rows touch — each as ONE snapshot. */
  val tfOverwritePart: Q = (s, d) => {
    val wh = scratch()
    val cat = s"wow_${java.util.UUID.randomUUID().toString.take(6)}"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftTableCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      s.sql(s"CREATE NAMESPACE $cat.db")
      Tables.orders(s, d).createOrReplaceTempView("ord_ow_src")
      s.sql(s"CREATE TABLE $cat.db.o (o_orderkey BIGINT, " +
        "o_totalprice DOUBLE, o_orderstatus STRING) " +
        "PARTITIONED BY (identity(o_orderstatus))")
      s.sql(s"INSERT INTO $cat.db.o SELECT o_orderkey, o_totalprice, " +
        "o_orderstatus FROM ord_ow_src")
      // static: replace partition F with doubled prices (×2 is exact
      // in binary, no rounding seam)
      s.sql(s"INSERT OVERWRITE $cat.db.o PARTITION (o_orderstatus='F') " +
        "SELECT o_orderkey, o_totalprice * 2 FROM ord_ow_src " +
        "WHERE o_orderstatus = 'F'")
      val m = graft.table.Meta.load(s"$wh/db/o")
      require(m.snapshots.last.operation == "overwrite" &&
        m.snapshots.last.addedFiles.forall(
          _.partitionValues.get("_p_o_orderstatus").contains("F")),
        "static partition overwrite must add only the new partition's " +
          "files (whole-file metadata-only drop of the old ones)")
      // dynamic: only the O partition is touched, so only it replaces
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try s.sql(s"INSERT OVERWRITE $cat.db.o SELECT o_orderkey, " +
        "o_totalprice, o_orderstatus FROM ord_ow_src " +
        "WHERE o_orderstatus = 'O' AND o_orderkey % 3 = 0")
      finally s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      val out = s.sql(s"SELECT o_orderstatus AS status, count(*) AS n, " +
        "CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) " +
        s"AS DOUBLE) AS total FROM $cat.db.o " +
        "GROUP BY o_orderstatus ORDER BY status")
      val rows = out.collect().toSeq
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        out.schema)
    } finally {
      s.conf.unset(s"spark.sql.catalog.$cat")
      s.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  val tfOverwritePartSql: String =
    """SELECT status, count(*) AS n,
              CAST(round(sum(CAST(p AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
       FROM (
         SELECT o_orderstatus AS status, o_totalprice * 2 AS p
         FROM orders WHERE o_orderstatus = 'F'
         UNION ALL
         SELECT o_orderstatus, o_totalprice
         FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 3 = 0
         UNION ALL
         SELECT o_orderstatus, o_totalprice
         FROM orders WHERE o_orderstatus NOT IN ('F', 'O'))
       GROUP BY status ORDER BY status"""

  /** Multi-table atomic commit from SQL (reference:
    * catalog_api_api.rs:492 commit_transaction): two tables receive
    * their appends through ONE protocol commit — twice, to show
    * transactions accumulate — and the verification aggregate reads
    * both tables back. All-or-nothing is locked by RestCatalogSqlSpec
    * (racing-commit 409 leg); here the driver checks the published
    * state equals the two source slices exactly. */
  val tfCommitTxn: Q = (s, d) => {
    val wh = scratch()
    val server = new graft.table.iceberg.IcebergRestServer(wh).start()
    val cat = s"txnq_${java.util.UUID.randomUUID().toString.take(6)}"
    try {
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftTableCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.uri",
        s"http://127.0.0.1:${server.port}")
      s.sql(s"CREATE NAMESPACE $cat.db")
      s.sql(s"CREATE TABLE $cat.db.ord (o_orderkey BIGINT, " +
        "o_totalprice DOUBLE)")
      s.sql(s"CREATE TABLE $cat.db.cust (c_custkey BIGINT, " +
        "c_acctbal DOUBLE)")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val cust = Tables.customer(s, d)
        .filter(col("c_acctbal") > 0)
        .select(col("c_custkey"), col("c_acctbal"))
      // two transactions, each publishing BOTH tables' slice in one
      // protocol commit
      Seq(0, 1).foreach { half =>
        ord.filter(col("o_orderkey") % 2 === half)
          .createOrReplaceTempView("txn_ord_src")
        cust.filter(col("c_custkey") % 2 === half)
          .createOrReplaceTempView("txn_cust_src")
        val out = s.sql(s"CALL $cat.system.commit_transaction(" +
          "'db.ord=txn_ord_src,db.cust=txn_cust_src')").collect()
        require(out.length == 2 && out.forall(_.getLong(1) > 0),
          s"transaction must publish both snapshots, got ${out.toSeq}")
      }
      val out = s.sql(
        s"""SELECT tbl, n, total FROM (
              SELECT 'cust' AS tbl, count(*) AS n,
                     round(sum(c_acctbal), 2) AS total FROM $cat.db.cust
              UNION ALL
              SELECT 'ord', count(*), round(sum(o_totalprice), 2)
              FROM $cat.db.ord) ORDER BY tbl""")
      val rows = out.collect().toSeq
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        out.schema)
    } finally {
      s.conf.unset(s"spark.sql.catalog.$cat")
      s.conf.unset(s"spark.sql.catalog.$cat.uri")
      graft.table.iceberg.IcebergRestCommit.deregisterBase(
        s"http://127.0.0.1:${server.port}")
      server.stop()
    }
  }

  val tfCommitTxnSql: String =
    """SELECT tbl, n, total FROM (
         SELECT 'cust' AS tbl, count(*) AS n,
                round(sum(c_acctbal), 2) AS total
         FROM customer WHERE c_acctbal > 0
         UNION ALL
         SELECT 'ord', count(*), round(sum(o_totalprice), 2)
         FROM orders WHERE o_orderkey % 3 = 0)
       ORDER BY tbl"""

  /** Round 15: the transaction's ROW-LEVEL + SCHEMA surface end to
    * end (reference: the full single-table transaction vocabulary of
    * iceberg-rust/src/table/transaction/mod.rs lifted to the
    * multi-table protocol commit). One transaction carries the GDPR
    * erasure (an equality delete of the k%7 users from BOTH tables),
    * a MERGE-shape upsert of the k%5 summary rows, and a schema
    * evolution on facts — all-or-nothing over the in-query REST
    * server; abort() after commit is the try/finally no-op. The
    * driver checks the final state of both tables plus the evolved
    * column count. */
  val tfTxnDelta: Q = (s, d) => {
    val wh = scratch()
    val server = new graft.table.iceberg.IcebergRestServer(wh).start()
    val cat = s"txnd_${java.util.UUID.randomUUID().toString.take(6)}"
    try {
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftTableCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.uri",
        s"http://127.0.0.1:${server.port}")
      s.sql(s"CREATE NAMESPACE $cat.db")
      s.sql(s"CREATE TABLE $cat.db.facts (k BIGINT, price DOUBLE)")
      s.sql(s"CREATE TABLE $cat.db.summ (k BIGINT, cnt BIGINT)")
      val slice = Tables.orders(s, d)
        .filter(col("o_orderkey") % 2 === 0)
        .select(col("o_custkey").as("k"), col("o_totalprice").as("price"))
      val summ = slice.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      slice.createOrReplaceTempView("txd_facts_src")
      summ.createOrReplaceTempView("txd_summ_src")
      // seed both tables through one protocol transaction
      s.sql(s"CALL $cat.system.commit_transaction(" +
        "'db.facts=txd_facts_src,db.summ=txd_summ_src')")
      // the delta transaction: erase + upsert + evolve, one commit
      val tx = graft.table.iceberg.IcebergTransaction.forCatalog(s, cat)
      val erased = summ.filter(col("k") % 7 === 0).select("k")
      tx.deleteByKey("db", "facts", erased, Seq("k"))
      tx.deleteByKey("db", "summ", erased, Seq("k"))
      tx.upsertByKey("db", "summ",
        summ.filter(col("k") % 5 === 0 && col("k") % 7 =!= 0)
          .select(col("k"), (col("cnt") + 1000).as("cnt")), Seq("k"))
      tx.addColumns("db", "facts", org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("audit",
          org.apache.spark.sql.types.StringType))))
      tx.commit()
      tx.abort() // no-op after commit: the try/finally contract
      val nCols = s.table(s"$cat.db.facts").schema.size
      val out = s.sql(
        s"""SELECT part, n, total FROM (
              SELECT 'facts' AS part, count(*) AS n,
                     round(sum(price), 2) AS total FROM $cat.db.facts
              UNION ALL
              SELECT 'facts_cols', CAST($nCols AS BIGINT), CAST(0.0 AS DOUBLE)
              UNION ALL
              SELECT 'summary', count(*), CAST(sum(cnt) AS DOUBLE)
              FROM $cat.db.summ) ORDER BY part""")
      val rows = out.collect().toSeq
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        out.schema)
    } finally {
      s.conf.unset(s"spark.sql.catalog.$cat")
      s.conf.unset(s"spark.sql.catalog.$cat.uri")
      graft.table.iceberg.IcebergRestCommit.deregisterBase(
        s"http://127.0.0.1:${server.port}")
      server.stop()
    }
  }

  /** The delta transaction's model in pure SQL: erased users vanish
    * from both tables, upserted summary rows carry cnt+1000, the
    * facts schema gained one column. */
  val tfTxnDeltaSql: String =
    """WITH slice AS (
         SELECT o_custkey AS k, o_totalprice AS price
         FROM orders WHERE o_orderkey % 2 = 0),
       kept AS (SELECT * FROM slice WHERE k % 7 <> 0),
       summ AS (SELECT k, count(*) AS cnt FROM slice GROUP BY k),
       s2 AS (SELECT k,
                CASE WHEN k % 5 = 0 THEN cnt + 1000 ELSE cnt END AS cnt
              FROM summ WHERE k % 7 <> 0)
       SELECT part, n, total FROM (
         SELECT 'facts' AS part, count(*) AS n,
                CAST(round(sum(price), 2) AS DOUBLE) AS total FROM kept
         UNION ALL
         SELECT 'facts_cols', 3::BIGINT, 0.0::DOUBLE
         UNION ALL
         SELECT 'summary', count(*), CAST(sum(cnt) AS DOUBLE) FROM s2)
       ORDER BY part"""

  /** Multi-table WRITE-AUDIT-PUBLISH over the protocol (reference:
    * TableTransaction's target branch, transaction/mod.rs:33, +
    * set_snapshot_ref, mod.rs:135 — composed through the multi-table
    * commit): one transaction forks each shard's `audit` branch from
    * main and stages that shard's batch onto it (mains untouched —
    * the preaudit rows prove isolation); the audit reads the staged
    * batches through the branches; then ONE protocol commit
    * fast-forwards every shard's main to its audit head and drops the
    * branches — all shards publish together or none does. The output
    * encodes all three phases so the oracle checks the lifecycle, not
    * just the end state. */
  val tfTxnWap: Q = (s, d) => {
    val wh = scratch()
    val server = new graft.table.iceberg.IcebergRestServer(wh).start()
    val cat = s"txnw_${java.util.UUID.randomUUID().toString.take(6)}"
    try {
      s.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftTableCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.uri",
        s"http://127.0.0.1:${server.port}")
      s.sql(s"CREATE NAMESPACE $cat.db")
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      (0 until 3).foreach(i =>
        s.sql(s"CREATE TABLE $cat.db.shard$i (k BIGINT, price DOUBLE)"))
      val seed = graft.table.iceberg.IcebergTransaction.forCatalog(s, cat)
      (0 until 3).foreach(i =>
        seed.append("db", s"shard$i", o.filter(col("k") % 6 === i)))
      seed.commit()
      def meta(i: Int) =
        graft.table.iceberg.IcebergMetadata.load(s"$wh/db/shard$i")
      // WRITE: fork every shard's audit branch + stage its batch — one
      // atomic commit, no main moves
      val tx = graft.table.iceberg.IcebergTransaction.forCatalog(s, cat)
      (0 until 3).foreach { i =>
        tx.setSnapshotRef("db", s"shard$i", "audit",
          meta(i).currentSnapshotId.get)
        tx.append("db", s"shard$i",
          o.filter(col("k") % 6 === i + 3), toRef = "audit")
      }
      tx.commit()
      // AUDIT: mains still hold only the seed; branches hold the batch
      val pre = (0 until 3).map { i =>
        (s"shard${i}_main_preaudit",
          s.table(s"$cat.db.shard$i").count(), 0.0)
      }
      val br = (0 until 3).map { i =>
        // read the branch by NAME: puts the catalog's ref-name
        // resolution (VERSION AS OF 'audit') under the oracle, not
        // just numeric snapshot-id time travel
        (s"shard${i}_branch",
          s.sql(s"SELECT count(*) FROM $cat.db.shard$i VERSION AS OF 'audit'")
            .collect().head.getLong(0), 0.0)
      }
      // PUBLISH: every branch move + drop in ONE protocol commit
      val pub = graft.table.iceberg.IcebergTransaction.forCatalog(s, cat)
      (0 until 3).foreach { i =>
        pub.fastForward("db", s"shard$i", "main", fromRef = "audit")
        pub.dropSnapshotRef("db", s"shard$i", "audit")
      }
      pub.commit()
      val post = (0 until 3).map { i =>
        val r = s.sql("SELECT count(*) AS n, round(sum(price), 2) AS t " +
          s"FROM $cat.db.shard$i").collect().head
        (s"shard${i}_published", r.getLong(0), r.getDouble(1))
      }
      import s.implicits._
      (pre ++ br ++ post).toDF("part", "n", "total").orderBy("part")
    } finally {
      s.conf.unset(s"spark.sql.catalog.$cat")
      s.conf.unset(s"spark.sql.catalog.$cat.uri")
      graft.table.iceberg.IcebergRestCommit.deregisterBase(
        s"http://127.0.0.1:${server.port}")
      server.stop()
    }
  }

  /** The WAP lifecycle's model in pure SQL: preaudit mains = the
    * seeds, branches = seed+batch, published = seed+batch with the
    * value sum. */
  val tfTxnWapSql: String =
    """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders)
       SELECT part, n, total FROM (
         SELECT 'shard0_main_preaudit' AS part,
           (SELECT count(*) FROM o WHERE k % 6 = 0) AS n, 0.0::DOUBLE AS total
         UNION ALL SELECT 'shard1_main_preaudit',
           (SELECT count(*) FROM o WHERE k % 6 = 1), 0.0::DOUBLE
         UNION ALL SELECT 'shard2_main_preaudit',
           (SELECT count(*) FROM o WHERE k % 6 = 2), 0.0::DOUBLE
         UNION ALL SELECT 'shard0_branch',
           (SELECT count(*) FROM o WHERE k % 6 IN (0, 3)), 0.0::DOUBLE
         UNION ALL SELECT 'shard1_branch',
           (SELECT count(*) FROM o WHERE k % 6 IN (1, 4)), 0.0::DOUBLE
         UNION ALL SELECT 'shard2_branch',
           (SELECT count(*) FROM o WHERE k % 6 IN (2, 5)), 0.0::DOUBLE
         UNION ALL SELECT 'shard0_published',
           (SELECT count(*) FROM o WHERE k % 6 IN (0, 3)),
           (SELECT CAST(round(sum(price), 2) AS DOUBLE) FROM o
             WHERE k % 6 IN (0, 3))
         UNION ALL SELECT 'shard1_published',
           (SELECT count(*) FROM o WHERE k % 6 IN (1, 4)),
           (SELECT CAST(round(sum(price), 2) AS DOUBLE) FROM o
             WHERE k % 6 IN (1, 4))
         UNION ALL SELECT 'shard2_published',
           (SELECT count(*) FROM o WHERE k % 6 IN (2, 5)),
           (SELECT CAST(round(sum(price), 2) AS DOUBLE) FROM o
             WHERE k % 6 IN (2, 5))
       ) ORDER BY part"""

  val queries: Map[String, Q] = Map(
    "tf_commit_txn" -> tfCommitTxn,
    "tf_txn_delta" -> tfTxnDelta,
    "tf_txn_wap" -> tfTxnWap,
    "tf_rtas" -> tfRtas,
    "tf_overwrite_part" -> tfOverwritePart,
    "tf_insert_select" -> tfInsertSelect,
    "tf_ctas_view" -> tfCtasView,
    "tf_mv_incremental" -> tfMvIncremental,
    "tf_connector_scan" -> tfConnectorScan,
    "tf_rest_sql" -> tfRestSql,
    "tf_catalog_view" -> tfCatalogView,
    "tf_catalog_mv" -> tfCatalogMv)

  val oracles: Map[String, String] = Map(
    "tf_commit_txn" -> tfCommitTxnSql,
    "tf_txn_delta" -> tfTxnDeltaSql,
    "tf_txn_wap" -> tfTxnWapSql,
    "tf_rtas" -> tfRtasSql,
    "tf_overwrite_part" -> tfOverwritePartSql,
    "tf_insert_select" -> tfInsertSelectSql,
    "tf_ctas_view" -> tfCtasViewSql,
    "tf_mv_incremental" -> tfMvIncrementalSql,
    "tf_connector_scan" -> tfConnectorScanSql,
    "tf_rest_sql" -> tfRestSqlSql,
    "tf_catalog_view" -> tfCatalogViewSql,
    "tf_catalog_mv" -> tfCatalogMvSql)
}
