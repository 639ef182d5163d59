package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.FastLocalFileSystem")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every relational query runs and returns rows at sf0.001") {
    ops.Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q01 aggregates over all flag/status groups") {
    val rows = ops.Relational.q01PricingSummary(spark, sf).collect()
    assert(rows.length >= 3)
    val flags = rows.map(_.getString(0)).toSet
    assert(flags.subsetOf(Set("A", "N", "R")))
  }

  test("q03 is a descending top-10 by revenue") {
    val rev = ops.Relational.q03JoinAggTopn(spark, sf)
      .collect().map(_.getDouble(2))
    assert(rev.length <= 10)
    assert(rev.sameElements(rev.sorted(Ordering[Double].reverse)))
  }

  test("q09 emits at most 3 rows per customer, ranked") {
    val rows = ops.Relational.q09WindowTopn(spark, sf).collect()
    val perCust = rows.groupBy(_.getLong(0))
    assert(perCust.values.forall(_.length <= 3))
    perCust.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
  }

  test("every oracle key has a matching query key") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle-only keys: ${os.diff(qs)}")
  }

  test("q04 plan broadcasts the part dim") {
    val plan = ops.Relational.q04BroadcastJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }
}
