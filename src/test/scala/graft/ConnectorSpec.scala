package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.GraftTable
import java.nio.file.Files

/** DataSource V2 connector: format("graft") reads with manifest
  * pruning and vectorized parquet. */
class ConnectorSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(): String =
    Files.createTempDirectory("graft-conn").toString + "/t"

  test("format(graft) round-trips rows and schema") {
    val li = Tables.lineitem(spark, sf)
    val root = tmp()
    GraftTable.create(spark, root, li.schema).append(li)
    val df = spark.read.format("graft").load(root)
    assert(df.schema === li.schema)
    assert(df.count() === li.count())
    val a = df.agg(round(sum("l_extendedprice"), 2)).collect()(0).getDouble(0)
    val b = li.agg(round(sum("l_extendedprice"), 2)).collect()(0).getDouble(0)
    assert(a === b)
  }

  test("filters prune files at planning time and prune columns") {
    val li = Tables.lineitem(spark, sf)
    val root = tmp()
    val t = GraftTable.create(spark, root, li.schema, sortOrder = Seq("l_orderkey"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try t.append(li)
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(t.filesDF.count() > 1)

    val maxKey = li.agg(max("l_orderkey")).collect()(0).getLong(0)
    val df = spark.read.format("graft").load(root)
      .filter(col("l_orderkey") > maxKey - 5)
      .select(col("l_orderkey"), col("l_quantity"))
    // correctness under pruning
    val want = li.filter(col("l_orderkey") > maxKey - 5).count()
    assert(df.count() === want)
    // the scan plans fewer tasks than a full read would
    val full = spark.read.format("graft").load(root)
      .queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputRDD.getNumPartitions
    val pruned = df.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputRDD.getNumPartitions
    assert(pruned <= full)
    assert(df.queryExecution.executedPlan.toString.contains("GraftScan"))
  }

  test("df.write.format(graft) appends and overwrites as snapshots") {
    val li = Tables.lineitem(spark, sf)
    val root = tmp()
    li.limit(100).write.format("graft").mode("append").save(root)
    li.limit(50).write.format("graft").mode("append").save(root)
    assert(spark.read.format("graft").load(root).count() === 150)
    li.limit(20).write.format("graft").mode("overwrite").save(root)
    assert(spark.read.format("graft").load(root).count() === 20)
    val t = GraftTable.load(spark, root)
    assert(t.meta.snapshots.map(_.operation) === Seq("append", "append", "overwrite"))
  }

  test("V2 batch write: append to an existing table goes through executors") {
    val li = Tables.lineitem(spark, sf)
    val root = tmp()
    GraftTable.create(spark, root, li.schema).append(li.limit(10))
    // table exists → BATCH_WRITE capability → V2 path
    li.limit(90).write.format("graft").mode("append").save(root)
    assert(spark.read.format("graft").load(root).count() === 100)
    li.limit(40).write.format("graft").mode("overwrite").save(root)
    assert(spark.read.format("graft").load(root).count() === 40)
    val sum1 = spark.read.format("graft").load(root)
      .agg(round(sum("l_extendedprice"), 2)).collect()(0).getDouble(0)
    val sum2 = li.limit(40).agg(round(sum("l_extendedprice"), 2)).collect()(0).getDouble(0)
    assert(sum1 === sum2)
  }

  test("connector applies merge-on-read deletes at scan") {
    val o = Tables.orders(spark, sf)
    val root = tmp()
    val t = GraftTable.create(spark, root, o.schema)
    t.append(o)
    t.deleteWhereMoR(col("o_orderstatus") === "F", Seq("o_orderkey"))
    val want = o.filter(col("o_orderstatus") =!= "F").count()
    val df = spark.read.format("graft").load(root)
    assert(df.count() === want)
    // even when the key column is pruned away, deletes still apply
    assert(df.select("o_totalprice").count() === want)
    assert(df.filter(col("o_orderstatus") === "F").count() === 0)
  }

  test("snapshot and branch options select table versions") {
    val li = Tables.lineitem(spark, sf)
    val root = tmp()
    val t = GraftTable.create(spark, root, li.schema)
    t.append(li.limit(100))
    val s1 = t.meta.currentSnapshotId.get
    t.setRef("dev", s1)
    t.append(li.limit(50), branch = "dev")
    t.append(li.limit(200))
    assert(spark.read.format("graft").load(root).count() === 300)
    assert(spark.read.format("graft").option("snapshot", s1.toString)
      .load(root).count() === 100)
    assert(spark.read.format("graft").option("branch", "dev")
      .load(root).count() === 150)
  }
}
