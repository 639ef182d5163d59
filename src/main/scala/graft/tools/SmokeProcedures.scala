package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the CALL procedure surface end-to-end through a real SQL
  * session (recipe-2 style): create, insert, rollback, branch/tag,
  * rewrite, expire, orphan GC — printing observed-vs-expected. */
object SmokeProcedures {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-procsmoke").toString
    val spark = SparkSession.builder()
      .appName("graft-proc-smoke").master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        "graft.hadoop.FastLocalFileSystem")
      .config("spark.sql.catalog.pwh", "graft.spark.GraftTableCatalog")
      .config("spark.sql.catalog.pwh.warehouse", wh)
      .getOrCreate()
    try {
      var i = 0
      def check(label: String, got: Any, want: Any): Unit = {
        println(f"[$i%d] $label: got=$got want=$want ok=${got == want}")
        i += 1
      }
      spark.sql("CREATE NAMESPACE pwh.sm")
      spark.sql("CREATE TABLE pwh.sm.t (k BIGINT, v DOUBLE)")
      (1 to 3).foreach(n => spark.sql(s"INSERT INTO pwh.sm.t VALUES ($n, $n.0)"))
      val t = graft.table.GraftTable.load(spark, s"$wh/sm/t")
      val snaps = t.meta.snapshots.map(_.snapshotId)

      check("procedures listed",
        spark.sessionState.catalogManager.catalog("pwh")
          .asInstanceOf[org.apache.spark.sql.connector.catalog.ProcedureCatalog]
          .listProcedures(Array("system")).length, 13)
      spark.sql(s"CALL pwh.system.create_tag('sm.t', 'pin', ${snaps(0)})")
      check("tag pinned", t.meta.refs.get("pin"), Some(snaps(0)))
      val rb = spark.sql(
        s"CALL pwh.system.rollback_to_snapshot('sm.t', ${snaps(1)})").collect()(0)
      check("rollback result", (rb.getLong(0), rb.getLong(1)), (snaps(2), snaps(1)))
      check("rolled-back count",
        spark.sql("SELECT count(*) FROM pwh.sm.t").collect()(0).getLong(0), 2L)
      val rw = spark.sql("CALL pwh.system.rewrite_data_files('sm.t')").collect()(0)
      check("rewrite (rewritten, added)", (rw.getInt(0), rw.getInt(1)), (2, 1))
      spark.sql("CALL pwh.system.expire_snapshots('sm.t', keep_last => 1)")
      val orphans = spark.sql(
        "CALL pwh.system.remove_orphan_files('sm.t', older_than_ms => 0)")
        .collect().map(_.getString(0))
      check("orphan GC removed the expired + pre-rewrite files",
        orphans.length >= 2, true)
      check("data intact after GC",
        spark.sql("SELECT sum(k) FROM pwh.sm.t").collect()(0).getLong(0), 3L)
      check("tag still readable",
        spark.read.format("graft").option("branch", "pin")
          .load(s"$wh/sm/t").count(), 1L)
      val an = spark.sql("CALL pwh.system.analyze_table('sm.t')")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      check("analyze_table NDV over live rows", an("k"), 2L)
      check("NDV persisted as table stats",
        graft.table.GraftTable.load(spark, s"$wh/sm/t")
          .meta.properties.get("stats.ndv.k"), Some("2"))
    } finally spark.stop()
  }
}
