package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AdvancedSpec extends AnyFunSuite {
  import SparkTestSession._

  test("weighted avg aggregator equals the closed form") {
    val got = ops.Advanced.q21WeightedAvg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(round(sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")), 4).as("w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === want)
  }

  test("asof join matches only at-or-before clicks") {
    val rows = ops.Advanced.q22AsofJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) >= 0), "click must precede purchase")
  }

  test("salted join returns the same result as the plain join") {
    val salted = ops.Advanced.q24SaltedJoin(spark, sf).collect().map(_.toString)
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy(col("o_orderpriority")).collect().map(_.toString)
    assert(salted.sameElements(plain))
  }
}
