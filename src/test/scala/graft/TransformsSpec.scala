package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{IcebergHash, IcebergTransforms}

class TransformsSpec extends AnyFunSuite {
  import SparkTestSession._

  // Public Iceberg spec (Appendix B) hash test vectors.
  test("murmur3 matches Iceberg spec vectors") {
    assert(IcebergHash.hashLong(34L) === 2017239379)
    assert(IcebergHash.hashBytes("iceberg".getBytes("UTF-8")) === 1210000089)
    // date 2017-11-16 = 17486 days from epoch, hashed as a long
    assert(IcebergHash.hashLong(17486L) === -653330422)
    // timestamp 2017-11-16T22:31:08 in micros
    assert(IcebergHash.hashLong(1510871468000000L) === -2047944441)
    assert(IcebergHash.hashBytes(Array[Byte](0, 1, 2, 3)) === -188683207)
  }

  test("bucket is non-negative, in range, stable, and codegen'd") {
    // spark.range keeps the plan physical (a local Seq would be
    // constant-folded to a LocalTableScan with no codegen span)
    val df = spark.range(-100, 100, 7).toDF("v")
      .select(IcebergTransforms.bucket(col("v"), 16).as("b"), col("v"))
    val rows = df.collect()
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 16))
    // interpreted path agrees with the codegen path
    val interp = rows.map(r => IcebergHash.bucketLong(r.getLong(1), 16))
    assert(rows.map(_.getInt(0)).sameElements(interp))
    // whole-stage codegen survived the custom expression: the project
    // node keeps the "*(n)" codegen-stage marker
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.startsWith("*("), plan.take(400))
  }

  test("bucket handles strings and nulls") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq(Some("iceberg"), None).toDF("s")
      .select(IcebergTransforms.bucket(col("s"), 8).as("b"))
    val rows = df.collect()
    assert(rows(0).getInt(0) === (1210000089 & Int.MaxValue) % 8)
    assert(rows(1).isNullAt(0))
  }

  test("truncate transform is sign-correct") {
    val spark0 = spark
    import spark0.implicits._
    val got = Seq(17, -3, 0, 10, -10).toDF("v")
      .select(IcebergTransforms.truncateInt(col("v"), 10).as("t"))
      .collect().map(_.getInt(0))
    assert(got.sameElements(Array(10, -10, 0, 10, -10)))
  }

  test("datetime transforms: 2017-11-16 lands in the spec units") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq("2017-11-16 22:31:08").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
      .select(
        IcebergTransforms.yearsFromEpoch(col("ts")).as("y"),
        IcebergTransforms.monthsFromEpoch(col("ts")).as("m"),
        IcebergTransforms.daysFromEpoch(col("ts")).as("d"),
        IcebergTransforms.hoursFromEpoch(col("ts")).as("h"))
    val r = df.collect()(0)
    assert(r.getInt(0) === 47)
    assert(r.getInt(1) === 47 * 12 + 10)
    assert(r.getInt(2) === 17486)
    assert(r.getInt(3) === 17486 * 24 + 22)
  }

  test("transform queries run at sf0.001") {
    ops.Transforms.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, name)
    }
  }
}
