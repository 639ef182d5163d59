package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.table.{GraftCatalog, Views}
import graft.streaming.EventStreams
import java.nio.file.Files

class CatalogSpec extends AnyFunSuite {
  import SparkTestSession._

  private def wh(): String = Files.createTempDirectory("graft-wh").toString

  test("catalog: create, insert into select, query, drop") {
    val cat = GraftCatalog(spark, wh())
    Tables.nation(spark, sf).createOrReplaceTempView("nation_src")
    cat.sql("create table nat as select * from nation_src")
    assert(cat.tableNames === Seq("nat"))
    cat.sql("insert into nat select * from nation_src")
    val n = cat.sql("select count(*) as n from nat").collect()(0).getLong(0)
    assert(n === 50) // 25 + 25
    cat.sql("drop table nat")
    assert(cat.tableNames.isEmpty)
  }

  test("catalog: concurrent registrations from independent handles both land") {
    val spark0 = spark
    import spark0.implicits._
    val w = wh()
    val cat1 = GraftCatalog(spark, w)
    val cat2 = GraftCatalog(spark, w)
    val df = Seq((1L, "x")).toDF("id", "v")
    // two handles racing on the registry: the version-CAS serializes
    // them; neither registration may overwrite the other's
    val th1 = new Thread(() => cat1.createTable("t_left", df.schema))
    val th2 = new Thread(() => cat2.createTable("t_right", df.schema))
    th1.start(); th2.start(); th1.join(60000); th2.join(60000)
    val cat3 = GraftCatalog(spark, w)
    assert(cat3.tableNames === Seq("t_left", "t_right"))
  }

  // ---- the registry CONTRACT, over both stores (file + jdbc) --------
  // (reference: iceberg-file-catalog vs iceberg-sql-catalog — same
  // Catalog behavior over different persistence)
  for ((storeKind, mkCat) <- Seq[(String, String => GraftCatalog)](
      "file" -> (w => GraftCatalog(spark, w)),
      "jdbc" -> (w => GraftCatalog.jdbc(spark, w)))) {

    test(s"catalog[$storeKind]: create, insert into select, ctas-view, drop") {
      val cat = mkCat(wh())
      Tables.nation(spark, sf).createOrReplaceTempView("nation_src2")
      cat.sql("create table natp as select * from nation_src2")
      cat.sql("insert into natp select * from nation_src2")
      assert(cat.sql("select count(*) as n from natp")
        .collect()(0).getLong(0) === 50)
      cat.sql("create view nat_small as select n_regionkey, count(*) as n " +
        "from natp group by n_regionkey")
      assert(cat.viewNames === Seq("nat_small"))
      assert(cat.sql("select sum(n) as s from nat_small")
        .collect()(0).getLong(0) === 50)
      cat.sql("drop table natp")
      cat.sql("drop view nat_small")
      assert(cat.tableNames.isEmpty && cat.viewNames.isEmpty)
    }

    test(s"catalog[$storeKind]: concurrent CAS — losers retry, nothing overwritten") {
      val spark0 = spark
      import spark0.implicits._
      val w = wh()
      val df = Seq((1L, "x")).toDF("id", "v")
      // 4 handles × 2 registrations racing on the registry version CAS
      val names = (1 to 8).map(i => s"t_$i")
      val threads = names.grouped(2).zipWithIndex.map { case (pair, _) =>
        val cat = mkCat(w)
        new Thread(() => pair.foreach(n => cat.createTable(n, df.schema)))
      }.toSeq
      threads.foreach(_.start()); threads.foreach(_.join(120000))
      assert(mkCat(w).tableNames === names.sorted,
        "every racing registration must land exactly once")
    }
  }

  test("jdbc store: lost CAS returns false and commits nothing") {
    val w = wh()
    val store = new graft.table.JdbcCatalogStore(
      s"jdbc:derby:$w/catalog-db;create=true")
    assert(store.currentVersion === 0)
    assert(store.commitAt(Map("a" -> "table"), 0))
    assert(store.currentVersion === 1)
    assert(store.entries === Map("a" -> "table"))
    // a committer holding a STALE base loses and mutates nothing
    assert(!store.commitAt(Map("b" -> "table"), 0))
    assert(store.currentVersion === 1)
    assert(store.entries === Map("a" -> "table"))
    // same-base re-commit after the flip also loses (duplicate staging)
    assert(!store.commitAt(Map("c" -> "table"), 0))
    assert(store.commitAt(Map("a" -> "table", "b" -> "view"), 1))
    assert(store.entriesAt(2) === Map("a" -> "table", "b" -> "view"))
    // a second handle over the same database sees the committed state
    val store2 = new graft.table.JdbcCatalogStore(
      s"jdbc:derby:$w/catalog-db;create=true")
    assert(store2.currentVersion === 2)
    assert(store2.entries === Map("a" -> "table", "b" -> "view"))
  }

  test("catalog: DELETE FROM and UPDATE route to table operations") {
    val cat = GraftCatalog(spark, wh())
    Tables.orders(spark, sf).createOrReplaceTempView("orders_dml")
    cat.sql("create table ord as select * from orders_dml")
    val before = cat.sql("select count(*) as n from ord").collect()(0).getLong(0)
    cat.sql("delete from ord where o_orderstatus = 'F'")
    val want = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") =!= "F").count()
    assert(cat.sql("select count(*) as n from ord").collect()(0).getLong(0) === want)
    assert(want < before)
    cat.sql("update ord set o_totalprice = o_totalprice * 2 where o_orderstatus = 'O'")
    val got = cat.sql(
      "select round(sum(o_totalprice),2) as s from ord").collect()(0).getDouble(0)
    val expect = Tables.orders(spark, sf).filter(col("o_orderstatus") =!= "F")
      .withColumn("o_totalprice",
        when(col("o_orderstatus") === "O", col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
      .agg(round(sum("o_totalprice"), 2)).collect()(0).getDouble(0)
    assert(math.abs(got - expect) < 0.02)
  }

  test("catalog: UPDATE with commas inside SET expressions parses correctly") {
    val spark0 = spark
    import spark0.implicits._
    val cat = GraftCatalog(spark, wh())
    Seq((1L, 1.234, "x"), (2L, 5.678, "y")).toDF("id", "v", "s")
      .createOrReplaceTempView("upd_src")
    cat.sql("create table u as select * from upd_src")
    cat.sql("update u set v = round(v, 1), s = concat(s, '!') where id = 2")
    val rows = cat.sql("select id, v, s from u order by id").collect()
    assert(rows(0).getDouble(1) === 1.234 && rows(0).getString(2) === "x")
    assert(rows(1).getDouble(1) === 5.7 && rows(1).getString(2) === "y!")
  }

  test("catalog: json ingestion leg") {
    val cat = GraftCatalog(spark, wh())
    val dir = wh() + "/json_in"
    Tables.region(spark, sf).write.json(dir)
    val json = spark.read.schema(Tables.region(spark, sf).schema).json(dir)
    json.createOrReplaceTempView("region_json")
    cat.createTable("reg", Tables.region(spark, sf).schema)
    cat.sql("insert into reg select * from region_json")
    assert(cat.sql("select * from reg").count() === 5)
  }

  test("incremental MV refresh reads only the delta and matches full recompute") {
    val w = wh()
    val cat = GraftCatalog(spark, w)
    val ev = Tables.events(spark, sf)
    cat.createTable("ev", ev.schema)
    cat.table("ev").append(ev.filter(col("event_id") % 2 === 0))
    val mv = Views.createMaterializedView(spark, s"$w/mv", "by_type",
      "SELECT event_type, count(*) AS n FROM ev GROUP BY event_type",
      Map("ev" -> s"$w/ev"),
      incrementalFold = Some(
        "SELECT event_type, sum(n) AS n FROM mv_delta_union GROUP BY event_type"))
    mv.refresh()
    cat.table("ev").append(ev.filter(col("event_id") % 2 === 1))
    val usedIncremental = mv.refreshIncremental()
    assert(usedIncremental, "should have taken the incremental path")
    assert(mv.isFresh)
    val got = mv.read.orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want))
  }

  test("incremental MV refresh over an ADOPTED real-format Iceberg " +
      "source: delta-only fold, honest fallback on row changes") {
    val w = wh()
    val ev = Tables.events(spark, sf)
    val loc = s"$w/ice_ev"
    // the source is a REAL-format table (the adopted/REST-served
    // shape), not a graft-dialect one
    graft.table.iceberg.IcebergWrite.create(spark, loc,
      ev.filter(col("event_id") % 2 === 0))
    val mv = Views.createMaterializedView(spark, s"$w/mv", "by_type",
      "SELECT event_type, count(*) AS n FROM ev GROUP BY event_type",
      Map("ev" -> loc),
      incrementalFold = Some(
        "SELECT event_type, sum(n) AS n FROM mv_delta_union GROUP BY event_type"))
    mv.refresh()
    val firstSnap = mv.recordedLineage("ev")
    val odd = ev.filter(col("event_id") % 2 === 1)
    graft.table.iceberg.IcebergWrite.append(spark, loc, odd)
    // refresh IO is DELTA-only: the interop incremental scan returns
    // exactly the appended rows, not the whole source
    assert(graft.table.iceberg.IcebergTable.load(spark, loc)
      .scanAppendedSince(Some(firstSnap)).count() === odd.count(),
      "append delta must hold only the second append's rows")
    val usedIncremental = mv.refreshIncremental()
    assert(usedIncremental,
      "append-only real-format source must take the incremental path")
    assert(mv.isFresh)
    val got = mv.read.orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(want), "incremental fold matches recompute")
    // a row-changing snapshot (MoR equality delete) on the real-format
    // source forces the honest full-refresh fallback — and the full
    // path reads the source MoR-visible
    val victim = ev.filter(col("event_type") === "error")
      .select(col("event_id")).limit(5)
    graft.table.iceberg.IcebergWrite.deleteEquality(spark, loc,
      victim, Seq("event_id"))
    assert(!mv.refreshIncremental(),
      "row-changing snapshot must force the full path")
    val total = mv.read.agg(sum(col("n"))).collect().head.getLong(0)
    assert(total === ev.count() - victim.count(),
      "full refresh reads the source with MoR deletes applied")
  }

  test("interop incremental refresh IO tracks the DELTA, not snapshot " +
      "depth: 100-append history, 1-append refresh opens ~1 manifest") {
    val w = wh()
    val loc = s"$w/deep"
    val spark0 = spark
    import spark0.implicits._
    import graft.table.iceberg.{IcebergAvro, IcebergWrite}
    IcebergWrite.create(spark, loc, Seq((0L, "g0")).toDF("k", "v"))
    (1 until 100).foreach(i => IcebergWrite.append(spark, loc,
      Seq((i.toLong, s"g${i % 7}")).toDF("k", "v")))
    val mv = Views.createMaterializedView(spark, s"$w/mvdeep", "cnt",
      "SELECT v, count(*) AS n FROM src GROUP BY v",
      Map("src" -> loc),
      incrementalFold = Some(
        "SELECT v, sum(n) AS n FROM mv_delta_union GROUP BY v"))
    mv.refresh()
    IcebergWrite.append(spark, loc, Seq((100L, "g3")).toDF("k", "v"))
    // the 1-append incremental refresh: one manifest-list read at the
    // head, and ONLY the delta's manifest opened — not the 100
    // carried ones (sequence-bounded list filter), and no delete
    // manifests (none can apply to strictly-newer-sequence files)
    val lists0 = IcebergAvro.manifestListReads.get()
    val mans0 = IcebergAvro.manifestReads.get()
    assert(mv.refreshIncremental(),
      "append-only history must take the incremental path")
    val listsUsed = IcebergAvro.manifestListReads.get() - lists0
    val mansUsed = IcebergAvro.manifestReads.get() - mans0
    assert(listsUsed <= 2,
      s"delta refresh read $listsUsed manifest lists; IO must not " +
        "track history depth")
    assert(mansUsed <= 3,
      s"delta refresh opened $mansUsed manifests for a 1-manifest " +
        "delta over a 101-snapshot history")
    // the counters are meaningful: a FULL refresh on this layout is
    // history-deep (one manifest per append commit)
    val mans1 = IcebergAvro.manifestReads.get()
    mv.refresh()
    assert(IcebergAvro.manifestReads.get() - mans1 >= 100,
      "full refresh should open every carried manifest on this layout")
    // and the incremental result was correct
    assert(mv.read.agg(sum(col("n"))).collect().head.getLong(0) === 101L)
  }

  test("incremental refresh falls back to full after non-append ops") {
    val w = wh()
    val cat = GraftCatalog(spark, w)
    val ev = Tables.events(spark, sf)
    cat.createTable("ev", ev.schema)
    cat.table("ev").append(ev)
    val mv = Views.createMaterializedView(spark, s"$w/mv", "by_type",
      "SELECT event_type, count(*) AS n FROM ev GROUP BY event_type",
      Map("ev" -> s"$w/ev"),
      incrementalFold = Some(
        "SELECT event_type, sum(n) AS n FROM mv_delta_union GROUP BY event_type"))
    mv.refresh()
    cat.table("ev").delete(col("event_type") === "error")
    val usedIncremental = mv.refreshIncremental()
    assert(!usedIncremental, "delete must force the full path")
    assert(mv.read.filter(col("event_type") === "error").count() === 0)
  }

  test("streaming writes land as REAL Iceberg snapshots (binary interop sink)") {
    val w = wh()
    val ev = Tables.events(spark, sf)
    val stageDir = s"$w/ice_stream_in"
    ev.limit(2000).write.parquet(stageDir)
    val staged = spark.read.parquet(stageDir).count()
    val loc = s"$w/ice_sink"
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir)
    val q = EventStreams.writeToIceberg(stream, loc, Trigger.AvailableNow())
    q.awaitTermination(120000)
    val t = graft.table.iceberg.IcebergTable.load(spark, loc)
    assert(t.scan().count() === staged)
    // the output is the standard format: metadata.json + avro manifests
    val m = t.meta
    assert(m.formatVersion === 2)
    assert(m.currentSnapshot.exists(_.manifestList.endsWith(".avro")))
  }

  test("streaming writes land as table snapshots") {
    val w = wh()
    val ev = Tables.events(spark, sf)
    val stageDir = s"$w/stream_in"
    ev.write.parquet(stageDir)
    val t = graft.table.GraftTable.create(spark, s"$w/ev_sink", ev.schema)
    val stream = spark.readStream.schema(ev.schema).parquet(stageDir)
    val q = EventStreams.writeToTable(stream, t, Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(t.scan().count() === ev.count())
    assert(t.meta.snapshots.nonEmpty)
    assert(t.meta.snapshots.forall(_.operation == "append"))
  }

  test("sink replay: a duplicate batchId is skipped, not double-appended") {
    val w = wh()
    val ev = Tables.events(spark, sf).limit(500)
    // GraftTable sink
    val t = graft.table.GraftTable.create(spark, s"$w/replay_sink", ev.schema)
    assert(EventStreams.appendBatchToTable(t, ev, batchId = 0L))
    val n1 = t.scan().count()
    // a restart replays the last uncommitted micro-batch with the SAME id
    assert(!EventStreams.appendBatchToTable(t, ev, batchId = 0L))
    assert(t.scan().count() === n1, "replayed batch must not double-append")
    assert(EventStreams.appendBatchToTable(t, ev, batchId = 1L))
    assert(t.scan().count() === 2 * n1)
    // the batch id rides in the snapshot summary (no side-channel state)
    assert(t.meta.snapshots.flatMap(_.summary.get(EventStreams.BatchIdKey))
      === Seq("0", "1"))

    // REAL-Iceberg sink: same contract, summary in metadata.json
    val loc = s"$w/replay_ice"
    assert(EventStreams.appendBatchToIceberg(loc, ev, batchId = 0L))
    val it = graft.table.iceberg.IcebergTable.load(spark, loc)
    val m1 = it.scan().count()
    assert(!EventStreams.appendBatchToIceberg(loc, ev, batchId = 0L))
    assert(it.scan().count() === m1)
    assert(EventStreams.appendBatchToIceberg(loc, ev, batchId = 1L))
    assert(it.scan().count() === 2 * m1)
    assert(it.meta.snapshots.flatMap(_.summary.get(EventStreams.BatchIdKey))
      === Seq("0", "1"))
  }
}
