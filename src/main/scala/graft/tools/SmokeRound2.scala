package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-2 surface smoke: drives the table-layer fixes end-to-end
  * through the public API (GraftTable + format("graft")), printing
  * observed vs expected. Run:
  *   sbt "runMain graft.tools.SmokeRound2"
  */
object SmokeRound2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("smoke-r2")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.table.{GraftTable, Meta}

    def tmp() = java.nio.file.Files.createTempDirectory("smoke-r2").toString + "/t"

    // 1. MoR sequence scoping: append after delete must be visible
    {
      val root = tmp()
      val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      val t = GraftTable.create(spark, root, df.schema)
      t.append(df)
      t.deleteWhereMoR(col("id") === 2L, Seq("id"))
      t.append(Seq((2L, "b2")).toDF("id", "v"))
      val direct = t.scan().orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val conn = spark.read.format("graft").load(root)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      println(s"[1] MoR seq scoping  scan=$direct connector=$conn " +
        s"expect 3 rows incl (2,b2): " +
        (direct.size == 3 && direct(1) == (2L, "b2") && conn == direct))
    }

    // 2. CoW DELETE three-valued logic: NULL-predicate rows survive
    {
      val root = tmp()
      val df = Seq((1L, Some(10.0)), (2L, None), (3L, Some(3.0))).toDF("id", "x")
      val t = GraftTable.create(spark, root, df.schema)
      t.append(df)
      t.delete(col("x") > 5.0)
      val ids = t.scan().select("id").as[Long].collect().sorted.toSeq
      println(s"[2] CoW delete nulls  ids=$ids expect List(2, 3): " + (ids == Seq(2L, 3L)))
    }

    // 3. vacuum retention: fresh orphans survive default vacuum, die at 0ms
    {
      val root = tmp()
      val df = Seq((1L, "a")).toDF("id", "v")
      val t = GraftTable.create(spark, root, df.schema)
      t.append(df); t.overwrite(df)
      t.expireSnapshots(keepLast = 1) // orphan the overwritten file
      val kept = t.vacuum() // default 1h retention: fresh orphans stay
      val gone = t.vacuum(0L)
      println(s"[3] vacuum retention  default-removed=${kept.size} at0-removed=${gone.size} " +
        s"expect 0 then >0: " + (kept.isEmpty && gone.nonEmpty) +
        s"  scan-after=${t.scan().count()} expect 1")
    }

    // 4. timestamp-literal pruning soundness: file whose max EQUALS the
    // pushed literal must NOT be pruned (the '.0' toString bug)
    {
      val root = tmp()
      val ts = java.sql.Timestamp.valueOf("2024-03-01 00:00:10") // whole second
      val df = Seq((1L, ts)).toDF("id", "ts")
      val t = GraftTable.create(spark, root, df.schema)
      t.append(df)
      val n = spark.read.format("graft").load(root)
        .filter(col("ts") >= lit(ts)).count()
      val n2 = spark.read.format("graft").load(root)
        .filter(col("ts") === lit(ts)).count()
      println(s"[4] ts-literal pruning  >=: $n ==: $n2 expect 1 and 1: " + (n == 1 && n2 == 1))
    }

    // 6. bucket SPJ through the SQL catalog: no shuffle below the join
    {
      val wh = java.nio.file.Files.createTempDirectory("smoke-spj").toString
      spark.conf.set("spark.sql.catalog.smoke_wh", "graft.spark.GraftTableCatalog")
      spark.conf.set("spark.sql.catalog.smoke_wh.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS smoke_wh.db")
      spark.sql("CREATE TABLE smoke_wh.db.f (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(4, k))")
      spark.sql("CREATE TABLE smoke_wh.db.d (k BIGINT, s STRING) PARTITIONED BY (bucket(4, k))")
      (1L to 500L).map(i => (i, i * 2.0)).toDF("k", "v").createOrReplaceTempView("fs")
      (1L to 500L).map(i => (i, s"s$i")).toDF("k", "s").createOrReplaceTempView("ds")
      spark.sql("INSERT INTO smoke_wh.db.f SELECT * FROM fs")
      spark.sql("INSERT INTO smoke_wh.db.d SELECT * FROM ds")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = spark.sql(
        "SELECT f.k, f.v, d.s FROM smoke_wh.db.f f JOIN smoke_wh.db.d d ON f.k = d.k")
      val plan = j.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("SortMergeJoin")
      val noShuffleBelow = joinIdx >= 0 && !plan.substring(joinIdx).contains("Exchange")
      println(s"[6] bucket SPJ  rows=${j.count()} expect 500; " +
        s"no shuffle below join: $noShuffleBelow")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }

    // 5. hash-parity spot check: q14 rounds in decimal space, then both
    // sides cast back to double (the final fix that made the oracle
    // hash-match) — the output type must be DoubleType on our side too
    {
      val d = graft.SparkEntry.queries("q14_conditional_agg")(spark, "/root/testdata/sf0.001")
      val tpe = d.schema("big_total").dataType
      println(s"[5] q14 big_total type=$tpe expect DoubleType: " +
        (tpe == org.apache.spark.sql.types.DoubleType))
    }

    spark.stop()
  }
}
