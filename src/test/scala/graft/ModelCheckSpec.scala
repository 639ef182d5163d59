package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable

/** Model-based randomized check of the table layer: a seeded random
  * sequence of table operations runs against BOTH the real GraftTable
  * and a trivial in-memory model (a Map of live rows). After every op
  * the distributed scan must equal the model exactly, and a random
  * historical snapshot must time-travel to the model's recorded past
  * state. Catches snapshot-chain / delete-scoping / compaction
  * interactions no hand-written scenario enumerates. */
class ModelCheckSpec extends AnyFunSuite {
  import SparkTestSession._

  private def runSequence(seed: Long, nOps: Int): Unit = {
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(seed)
    val root = java.nio.file.Files
      .createTempDirectory(s"graft-model-$seed").toString + "/t"
    val schema = Seq((0L, 0L, "x")).toDF("k", "grp", "v").schema
    val t = GraftTable.create(spark, root, schema)

    var model = Map.empty[Long, (Long, String)] // k -> (grp, v)
    var nextK = 1L
    // snapshot id -> model state at that commit
    var history = List.empty[(Long, Map[Long, (Long, String)])]
    def record(): Unit =
      t.meta.currentSnapshotId.foreach(id => history ::= (id, model))

    def check(tag: String): Unit = {
      val got = t.scan().select("k", "grp", "v").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got === model, s"seed=$seed op=$tag diverged from model")
    }

    for (i <- 1 to nOps) {
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // append a small batch
          val rows = (1 to (1 + rnd.nextInt(20))).map { _ =>
            val k = nextK; nextK += 1
            (k, rnd.nextInt(5).toLong, s"v$k")
          }
          t.append(rows.toDF("k", "grp", "v").coalesce(1 + rnd.nextInt(2)))
          model ++= rows.map(r => r._1 -> (r._2, r._3))
          record()
        case 4 => // copy-on-write delete of one group
          val g = rnd.nextInt(5).toLong
          t.delete(col("grp") === g)
          model = model.filterNot(_._2._1 == g)
          record()
        case 5 if model.nonEmpty => // MoR equality delete of sampled keys
          val ks = model.keys.toSeq.sorted
            .filter(_ => rnd.nextInt(4) == 0).take(10)
          if (ks.nonEmpty) {
            t.deleteWhereMoR(col("k").isin(ks: _*), Seq("k"))
            model --= ks
            record()
          }
        case 6 => // compaction: row-preserving
          t.compact(targetFileBytes = 1L << 20)
        case 7 if model.nonEmpty => // MoR positional update of one key
          val k = model.keys.toSeq.sorted.apply(rnd.nextInt(model.size))
          t.updateWhereMoR(col("k") === k, Seq("v" -> lit(s"u$i")))
          model += k -> (model(k)._1, s"u$i")
          record()
        case 8 if history.size > 3 => // rollback to a random past commit
          val (sid, past) = history(rnd.nextInt(history.size))
          t.rollbackTo(sid)
          model = past
          // rolled-back history: drop states newer than the target
          history = history.dropWhile(_._1 != sid)
          record()
        case _ => // expire old snapshots (keep refs sound), GC files
          t.expireSnapshots(keepLast = 3)
          t.vacuum(0L)
          // expired ids can no longer be time-travel targets
          val live = t.meta.snapshots.map(_.snapshotId).toSet
          history = history.filter(h => live.contains(h._1))
      }
      check(s"#$i")
      // spot-check time travel against a recorded past state
      if (history.size > 2 && rnd.nextInt(3) == 0) {
        val (sid, past) = history(rnd.nextInt(history.size))
        val got = t.timeTravel(sid).select("k", "grp", "v").collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
        assert(got === past, s"seed=$seed time-travel to $sid diverged")
      }
    }
  }

  /** Same idea over the REAL-format interop writer/reader: random
    * create/append/overwrite/equality-delete/positional-delete/
    * rewrite/rollback/expire+vacuum sequences, scan checked against
    * the model after every commit, random snapshots time-traveled
    * against recorded past states, and the CHANGELOG replayed from
    * random recorded states (base + inserts - deletes must rebuild
    * the current model exactly). */
  private def runForeignSequence(seed: Long, nOps: Int): Unit = {
    import graft.table.iceberg.{IcebergMaintenance, IcebergTable, IcebergWrite}
    val spark0 = spark
    import spark0.implicits._
    val rnd = new scala.util.Random(seed)
    val loc = java.nio.file.Files
      .createTempDirectory(s"graft-fmodel-$seed").toString + "/t"
    var model = Map.empty[Long, String]
    var nextK = 1L
    var history = List.empty[(Long, Map[Long, String])]
    def batch(n: Int): Seq[(Long, String)] =
      (1 to n).map { _ => val k = nextK; nextK += 1; (k, s"v$k") }
    val first = batch(5)
    IcebergWrite.create(spark, loc,
      first.toDF("k", "v").coalesce(1))
    model ++= first
    def t = IcebergTable.load(spark, loc)
    def record(): Unit =
      t.meta.currentSnapshotId.foreach(id => history ::= (id, model))
    record()
    // catalog SQL front-end over the same table, for the row-level ops
    // (unique catalog name: instances are session-cached by name)
    val catName = s"fmc_${seed}_${java.util.UUID.randomUUID().toString.take(6)}"
    spark.conf.set(s"spark.sql.catalog.$catName", "graft.spark.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$catName.warehouse",
      java.nio.file.Files.createTempDirectory(s"graft-fmwh-$seed").toString)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $catName.m")
    spark.sql(s"CALL $catName.system.register_table(table => 'm.t', " +
      s"location => '$loc')")
    val sqlT = s"$catName.m.t"

    for (i <- 1 to nOps) {
      rnd.nextInt(15) match {
        case 0 | 1 | 2 | 3 =>
          val rows = batch(1 + rnd.nextInt(15))
          IcebergWrite.append(spark, loc,
            rows.toDF("k", "v").coalesce(1 + rnd.nextInt(2)))
          model ++= rows
          record()
        case 4 if model.nonEmpty => // equality delete of sampled keys
          val ks = model.keys.toSeq.sorted.filter(_ => rnd.nextInt(3) == 0).take(8)
          if (ks.nonEmpty) {
            IcebergWrite.deleteEquality(spark, loc, ks.toDF("k"), Seq("k"))
            model --= ks
            record()
          }
        case 5 => // overwrite with a fresh batch
          val rows = batch(3 + rnd.nextInt(5))
          IcebergWrite.overwrite(spark, loc, rows.toDF("k", "v").coalesce(1))
          model = rows.toMap
          record()
        case 6 if model.nonEmpty => // positional delete of one live row
          val table = t
          val physAll = spark.read.parquet(table.plannedFiles()
              .map(f => table.resolvePath(f._1.filePath).toString): _*)
            .withColumn("fp", col("_metadata.file_path"))
            .withColumn("pos", col("_metadata.row_index"))
            .select("k", "fp", "pos").collect()
            .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
            .filter(r => model.contains(r._1))
          // SQL-updated keys leave their OLD version physically present
          // (hidden by a position delete) until a rewrite folds it —
          // only keys with exactly ONE physical row are unambiguous
          // positional-delete targets
          val phys = physAll.groupBy(_._1).collect {
            case (_, rs) if rs.length == 1 => rs.head
          }.toSeq.sortBy(_._1)
          if (phys.nonEmpty) {
            val (k, fp, pos) = phys(rnd.nextInt(phys.size))
            IcebergWrite.deletePositional(spark, loc,
              Seq((fp, pos)).toDF("file_path", "pos"))
            model -= k
            record()
          }
        case 7 if history.size > 3 => // rollback to a random past commit
          val (sid, past) = history(rnd.nextInt(history.size))
          IcebergMaintenance.rollbackTo(loc, sid)
          model = past
          history = history.dropWhile(_._1 != sid)
        case 8 => // expire + GC: retained history must stay readable
          IcebergMaintenance.expireSnapshots(loc, keepLast = 3)
          IcebergMaintenance.vacuum(spark, loc, 0L)
          val live = t.meta.snapshots.map(_.snapshotId).toSet
          history = history.filter(h => live.contains(h._1))
        case 9 => // manifest consolidation: metadata-only, model
          // unchanged; the 'replace' commit must be invisible to
          // scans, time travel, and changelog replay alike
          IcebergWrite.rewriteManifests(loc)
          record()
        case 10 | 11 => // compaction: row-preserving, folds deletes
          IcebergWrite.rewrite(spark, loc, targetFileSizeBytes = 1L << 20)
        case 12 if model.nonEmpty => // SQL metadata-only equality DELETE
          val ks = model.keys.toSeq.sorted
            .filter(_ => rnd.nextInt(4) == 0).take(6)
          if (ks.nonEmpty) {
            spark.sql(s"DELETE FROM $sqlT WHERE k IN (${ks.mkString(",")})")
            model --= ks
            record()
          }
        case 13 if model.nonEmpty => // SQL delta UPDATE of one row (MoR)
          val k = model.keys.toSeq.sorted.apply(rnd.nextInt(model.size))
          spark.sql(s"UPDATE $sqlT SET v = 'u$i' WHERE k = $k")
          model += k -> s"u$i"
          record()
        case _ if model.nonEmpty => // SQL delta DELETE (untranslatable
          // condition forces the row-level position-delete path)
          val r = rnd.nextInt(5)
          spark.sql(s"DELETE FROM $sqlT WHERE k % 5 = $r AND length(v) >= 1")
          model = model.filter { case (k, v) =>
            !(k % 5 == r && v.length >= 1) }
          record()
        case _ => ()
      }
      val got = t.scan().select("k", "v").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got === model, s"seed=$seed foreign op#$i diverged")
      if (history.size > 2 && rnd.nextInt(3) == 0) {
        val (sid, past) = history(rnd.nextInt(history.size))
        val tt = t.timeTravel(sid).select("k", "v").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(tt === past, s"seed=$seed foreign time-travel to $sid diverged")
      }
      // changelog replay from a random recorded state: base + inserts
      // - deletes must rebuild the CURRENT model (rows are unique, so
      // set equality is exact); expire keeps tip ancestry contiguous,
      // so any live history entry is a valid range start
      if (history.size > 2 && rnd.nextInt(3) == 0) {
        val (sid, base) = history(rnd.nextInt(history.size))
        val ch = t.changesBetween(Some(sid)).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        val ins = ch.filter(_._3 == "insert").map(x => (x._1, x._2))
        val del = ch.filter(_._3 == "delete").map(x => (x._1, x._2))
        val replayed = (base.toSeq ++ ins).diff(del)
        assert(replayed.size === replayed.toMap.size,
          s"seed=$seed changelog replay from $sid emitted duplicates")
        assert(replayed.toMap === model,
          s"seed=$seed changelog replay from $sid diverged")
      }
    }
  }

  /** Model check of the REST view-commit protocol: a seeded random
    * sequence of legacy replace_view calls, spec CommitViewRequests
    * (version adds, property set/remove), and DELIBERATE failures
    * (stale base, wrong uuid, malformed update) runs against a live
    * server; after every op the loaded view — sql, representations,
    * properties, uuid, version — must equal an in-memory model, and
    * every rejected commit must leave the model state untouched. */
  private def runViewSequence(seed: Long, nOps: Int): Unit = {
    import graft.table.iceberg.{IcebergRestServer, IcebergRestClient => C}
    val rnd = new scala.util.Random(seed)
    val wh = java.nio.file.Files
      .createTempDirectory(s"graft-view-model-$seed").toString
    val server = new IcebergRestServer(wh).start()
    try {
      val base = s"http://127.0.0.1:${server.port}"
      C.createNamespace(base, "db")
      C.createView(base, "db", "v", "SELECT 0 AS c")
      val uuid = C.loadViewUuid(base, "db", "v")

      var mSql = "SELECT 0 AS c"
      var mReps = Map("spark" -> "SELECT 0 AS c")
      var mProps = Map.empty[String, String]
      var mVersion = 1

      def check(tag: String): Unit = {
        val (sql, _, ver) = C.loadView(base, "db", "v")
        assert(sql === mSql, s"seed=$seed op=$tag sql diverged")
        assert(ver === mVersion, s"seed=$seed op=$tag version diverged")
        assert(C.loadViewRepresentations(base, "db", "v").toMap === mReps,
          s"seed=$seed op=$tag representations diverged")
        assert(C.loadViewProperties(base, "db", "v") === mProps,
          s"seed=$seed op=$tag properties diverged")
        assert(C.loadViewUuid(base, "db", "v") === uuid,
          s"seed=$seed op=$tag uuid changed")
      }

      for (i <- 1 to nOps) {
        rnd.nextInt(8) match {
          case 0 | 1 => // legacy replace with the current base
            val sql = s"SELECT $i AS c"
            assert(C.replaceView(base, "db", "v", sql,
              baseVersion = mVersion) === 200)
            mSql = sql; mReps = Map("spark" -> sql); mVersion += 1
          case 2 => // spec commit: new version with 1-2 dialects
            val sql = s"SELECT $i AS c /* spec */"
            val reps = Seq("spark" -> sql) ++
              (if (rnd.nextBoolean()) Seq("duckdb" -> s"$sql -- duckdb")
               else Seq.empty)
            assert(C.commitView(base, "db", "v",
              assertUuid = Some(uuid), representations = reps) === 200)
            mSql = sql; mReps = reps.toMap; mVersion += 1
          case 3 => // spec commit: set a property
            val k = s"p${rnd.nextInt(4)}"
            assert(C.commitView(base, "db", "v",
              setProperties = Map(k -> s"val$i")) === 200)
            mProps += k -> s"val$i"; mVersion += 1
          case 4 => // spec commit: remove a (maybe absent) property
            val k = s"p${rnd.nextInt(5)}"
            assert(C.commitView(base, "db", "v",
              removeProperties = Seq(k)) === 200)
            mProps -= k; mVersion += 1
          case 5 if mVersion > 1 => // stale legacy base -> 409, no change
            assert(C.replaceView(base, "db", "v", "SELECT -1",
              baseVersion = mVersion - 1) === 409)
          case 6 => // wrong uuid assert -> 409, no change
            assert(C.commitView(base, "db", "v",
              assertUuid = Some("00000000-0000-0000-0000-000000000001"),
              representations = Seq("spark" -> "SELECT -2")) === 409)
          case _ => // malformed: set-current to a NEVER-registered id
            // -> 400 (small ids may legitimately exist in the version
            // registry after a few adds, so probe far outside it)
            val m = new com.fasterxml.jackson.databind.ObjectMapper()
            val bad = m.createObjectNode()
            bad.put("action", "set-current-view-version")
            bad.put("view-version-id", 99999)
            assert(C.commitView(base, "db", "v",
              extraUpdates = Seq(bad)) === 400)
        }
        check(s"#$i")
      }
    } finally server.stop()
  }

  /** Model check of the REST TABLE commit protocol's metadata plane:
    * random property updates, branch/tag ref CAS moves and removals,
    * sort-order evolution, and deliberate failures (stale ref CAS,
    * wrong-uuid transaction) against a real-format table served over
    * HTTP; after every op the table's metadata must equal the model,
    * and every rejected commit must leave it untouched. */
  private def runTableRestSequence(seed: Long, nOps: Int): Unit = {
    val spark0 = spark
    import spark0.implicits._
    import graft.table.iceberg.{IcebergMetadata, IcebergRestServer,
      IcebergRestClient => C, IcebergWrite}
    val rnd = new scala.util.Random(seed)
    val wh = java.nio.file.Files
      .createTempDirectory(s"graft-trest-model-$seed").toString
    val server = new IcebergRestServer(wh).start()
    try {
      val base = s"http://127.0.0.1:${server.port}"
      C.createNamespace(base, "db")
      val loc = s"$wh/db/t"
      IcebergWrite.create(spark, loc,
        (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"))
      IcebergWrite.append(spark, loc,
        (11L to 20L).map(i => (i, s"w$i")).toDF("k", "v"))
      val snaps = IcebergMetadata.load(loc).snapshots.map(_.snapshotId)
      assert(snaps.size === 2)

      var mProps = Map.empty[String, String]
      var mRefs = Map.empty[String, Long]
      var mDefaultOrder =
        IcebergMetadata.load(loc).defaultSortOrderId
      var nextOrderId = IcebergMetadata.load(loc).sortOrders
        .map(_.orderId).maxOption.getOrElse(0) + 1
      val propKeys = (0 until 4).map(i => s"p$i")
      val refNames = (0 until 3).map(i => s"br$i")

      def check(tag: String): Unit = {
        val m = IcebergMetadata.load(loc)
        assert(m.properties.filter(kv => propKeys.contains(kv._1)) === mProps,
          s"seed=$seed op=$tag properties diverged")
        assert(m.refs.filter(kv => refNames.contains(kv._1)) === mRefs,
          s"seed=$seed op=$tag refs diverged")
        assert(m.defaultSortOrderId === mDefaultOrder,
          s"seed=$seed op=$tag default sort order diverged")
      }

      for (i <- 1 to nOps) {
        rnd.nextInt(8) match {
          case 0 => // set a property
            val k = propKeys(rnd.nextInt(propKeys.size))
            C.updateProperties(base, "db", "t", Map(k -> s"val$i"))
            mProps += k -> s"val$i"
          case 1 => // remove a (maybe absent) property
            val k = propKeys(rnd.nextInt(propKeys.size))
            C.updateProperties(base, "db", "t", Map.empty, Seq(k))
            mProps -= k
          case 2 => // create or CAS-repoint a ref
            val name = refNames(rnd.nextInt(refNames.size))
            val target = snaps(rnd.nextInt(snaps.size))
            val cas = mRefs.get(name)
            if (cas.contains(target)) () // no-op move: skip
            else {
              assert(C.setSnapshotRef(base, "db", "t", name, target,
                cas) === 200, s"seed=$seed op#$i ref move refused")
              mRefs += name -> target
            }
          case 3 if mRefs.nonEmpty => // stale ref CAS -> 409, no change
            val (name, cur) = mRefs.toSeq.sorted.apply(rnd.nextInt(mRefs.size))
            val wrongCas = snaps.find(_ != cur)
            assert(C.setSnapshotRef(base, "db", "t", name,
              snaps(rnd.nextInt(snaps.size)), wrongCas) === 409)
          case 4 if mRefs.nonEmpty => // remove a ref with correct CAS
            val (name, cur) = mRefs.toSeq.sorted.apply(rnd.nextInt(mRefs.size))
            assert(C.removeSnapshotRef(base, "db", "t", name,
              Some(cur)) === 200)
            mRefs -= name
          case 5 if mRefs.nonEmpty => // stale remove -> 409, no change
            val (name, cur) = mRefs.toSeq.sorted.apply(rnd.nextInt(mRefs.size))
            val wrongCas = snaps.find(_ != cur)
            assert(C.removeSnapshotRef(base, "db", "t", name,
              wrongCas) === 409)
          case 6 => // sort-order evolution: a fresh order becomes default
            val dir = if (rnd.nextBoolean()) "asc" else "desc"
            C.updateSortOrder(base, "db", "t", Seq("k" -> dir))
            mDefaultOrder = nextOrderId
            nextOrderId += 1
          case _ => // wrong-uuid transaction -> 409, rolled back
            assert(C.commitTransaction(base, Seq(C.TableChange("db", "t",
              Seq(C.requireUuid("00000000-0000-0000-0000-00000000beef")),
              Seq(C.setPropertiesUpdate(Map("p0" -> "never")))))) === 409)
        }
        check(s"#$i")
      }
    } finally server.stop()
  }

  test("table REST-protocol random sequences agree with the model (seed 3)") {
    runTableRestSequence(3L, 25)
  }
  test("table REST-protocol random sequences agree with the model (seed 88)") {
    runTableRestSequence(88L, 25)
  }

  test("view-protocol random sequences agree with the model (seed 5)") {
    runViewSequence(5L, 25)
  }
  test("view-protocol random sequences agree with the model (seed 77)") {
    runViewSequence(77L, 25)
  }

  test("random op sequences agree with the in-memory model (seed 11)") {
    runSequence(11L, 30)
  }
  test("random op sequences agree with the in-memory model (seed 42)") {
    runSequence(42L, 30)
  }
  test("random op sequences agree with the in-memory model (seed 1337)") {
    runSequence(1337L, 30)
  }
  test("foreign-format random op sequences agree with the model (seed 7)") {
    runForeignSequence(7L, 20)
  }
  test("foreign-format random op sequences agree with the model (seed 99)") {
    runForeignSequence(99L, 20)
  }
  test("foreign-format random op sequences agree with the model (seed 2024, deep)") {
    runForeignSequence(2024L, 35)
  }
}
