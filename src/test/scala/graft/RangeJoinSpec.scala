package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The automatic range-join rewrite (graft.plans.RangeJoinRewrite):
  * pure interval-overlap joins must leave the nested-loop plan class
  * and match the naive join's results exactly — including duplicate
  * row multiplicity and null-interval drops. */
class RangeJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  private def withRule[A](f: => A): A = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ graft.plans.RangeJoinRewrite(spark)
    try f finally spark.experimental.extraOptimizations = prev
  }

  private def fixtures = {
    val spark0 = spark
    import spark0.implicits._
    // sessions across three days, including a DUPLICATE row (id 2) and
    // a null interval (id 5) — multiplicity and null semantics must
    // survive the rewrite
    val a = Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      (2L, "2024-01-01 23:30:00", "2024-01-02 00:30:00"),
      (2L, "2024-01-01 23:30:00", "2024-01-02 00:30:00"),
      (3L, "2024-01-03 05:00:00", "2024-01-03 06:00:00"),
      (4L, "2024-01-02 12:00:00", "2024-01-02 12:10:00"),
      (5L, null, null))
      .toDF("a_id", "s", "e")
      .select(col("a_id"), col("s").cast("timestamp").as("a_start"),
        col("e").cast("timestamp").as("a_end"))
    val b = Seq(
      (10L, "2024-01-01 10:30:00", "2024-01-01 12:00:00"),
      (11L, "2024-01-01 22:00:00", "2024-01-02 01:00:00"),
      (12L, "2024-01-02 11:00:00", "2024-01-02 13:00:00"),
      (13L, "2024-01-04 00:00:00", "2024-01-04 01:00:00"))
      .toDF("b_id", "s", "e")
      .select(col("b_id"), col("s").cast("timestamp").as("b_start"),
        col("e").cast("timestamp").as("b_end"))
    (a, b)
  }

  test("overlap joins rewrite to bucket equi-joins with identical results") {
    val (a, b) = fixtures
    val cond = col("a_start") <= col("b_end") && col("b_start") <= col("a_end")
    val naive = a.join(b, cond).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val (rewritten, plan) = withRule {
      val df = a.join(b, cond).select("a_id", "b_id")
      (df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted,
        df.queryExecution.executedPlan.toString)
    }
    assert(naive.nonEmpty)
    assert(rewritten.toSeq === naive.toSeq,
      "rewritten range join diverged from the naive join")
    // duplicate left row must appear twice in both
    assert(rewritten.count(_._1 == 2L) === naive.count(_._1 == 2L))
    // the scale property: capped rows flow through a HASH join on the
    // bucket key, and any nested-loop residual branch sits behind the
    // selective span filter (> maxDaysPerRow), so it sees only
    // sentinel-scale input — never the bulk
    assert(plan.contains("Generate") && plan.contains("__graft_rj_bl"),
      s"expected bucket explode + equi-join in the rewritten plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("> 3700"),
      s"nested-loop branch without a span filter:\n$plan")
  }

  test("strict and flipped comparisons rewrite too, results exact") {
    val (a, b) = fixtures
    // b_end > a_start AND a_end >= b_start — flipped operand order and
    // one strict bound
    val cond = col("b_end") > col("a_start") && col("a_end") >= col("b_start")
    val naive = a.join(b, cond).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val (rewritten, plan) = withRule {
      val df = a.join(b, cond).select("a_id", "b_id")
      (df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted,
        df.queryExecution.executedPlan.toString)
    }
    assert(rewritten.toSeq === naive.toSeq)
    assert(plan.contains("Generate") && plan.contains("__graft_rj_bl"),
      s"strict/flipped overlap did not rewrite:\n$plan")
  }

  test("joins with an equality conjunct are left alone") {
    val (a, b) = fixtures
    val cond = col("a_id") === col("b_id") &&
      col("a_start") <= col("b_end") && col("b_start") <= col("a_end")
    val plan = withRule {
      a.join(b, cond).queryExecution.executedPlan.toString
    }
    assert(!plan.contains("Generate"),
      s"equality join must not bucket-explode:\n$plan")
  }

  test("over-cap spans route through the residual branch, never explode") {
    val spark0 = spark
    import spark0.implicits._
    // an SCD-2 shape: two sentinel validity windows (open-ended rows
    // whose day span is far beyond the cap) mixed with normal rows —
    // plus a DUPLICATE sentinel, so residual-branch multiplicity shows
    val wide = Seq(
      (1L, "2000-01-01 00:00:00", "9999-12-31 00:00:00"),
      (1L, "2000-01-01 00:00:00", "9999-12-31 00:00:00"),
      (2L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      (3L, "2024-03-01 00:00:00", "2024-03-02 00:00:00"))
      .toDF("a_id", "s", "e")
      .select(col("a_id"), col("s").cast("timestamp").as("a_start"),
        col("e").cast("timestamp").as("a_end"))
    val (_, b) = fixtures
    val cond = col("a_start") <= col("b_end") && col("b_start") <= col("a_end")
    val naive = wide.join(b, cond).select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val (rewritten, plan) = withRule {
      val df = wide.join(b, cond).select("a_id", "b_id")
      (df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted,
        df.queryExecution.executedPlan.toString)
    }
    assert(rewritten.toSeq === naive.toSeq,
      "residual-branch union diverged from the naive join")
    // the sentinel rows must appear with multiplicity 2 per campaign
    assert(rewritten.count(_._1 == 1L) === 2 * b.count())
    // the capped rows still go through the bucket equi-join branch
    assert(plan.contains("Generate"),
      s"expected the bucket branch in the union plan:\n$plan")
    assert(plan.contains("Union"),
      s"expected the residual union:\n$plan")
  }

  test("overflow=error restores the loud span-cap failure") {
    val spark0 = spark
    import spark0.implicits._
    val wide = Seq((1L, "2000-01-01 00:00:00", "2024-02-01 00:00:00"))
      .toDF("a_id", "s", "e")
      .select(col("a_id"), col("s").cast("timestamp").as("a_start"),
        col("e").cast("timestamp").as("a_end"))
    val (_, b) = fixtures
    val cond = col("a_start") <= col("b_end") && col("b_start") <= col("a_end")
    spark.conf.set("spark.graft.rangeJoin.overflow", "error")
    try {
      val err = intercept[Exception] {
        withRule { wide.join(b, cond).collect() }
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("maxDaysPerRow")),
        s"expected the span-cap error, got: $err")
      // raising the cap lets the same join through
      spark.conf.set("spark.graft.rangeJoin.maxDaysPerRow", "20000")
      try {
        val n = withRule { wide.join(b, cond).count() }
        assert(n === b.count(), "every campaign overlaps the 24-year window")
      } finally spark.conf.unset("spark.graft.rangeJoin.maxDaysPerRow")
    } finally spark.conf.unset("spark.graft.rangeJoin.overflow")
  }

  test("the rewrite converges inside the production fixed-point batch") {
    // Production registration (GraftExtensions.injectOptimizerRule)
    // places the rule in the SAME fixed-point batch as
    // PushDownPredicates / ConstantFolding / BooleanSimplification.
    // A marker those rules can strip un-marks the residual joins and
    // the rewrite re-fires every iteration, growing the plan until
    // the driver dies — so run exactly that mixed batch to a fixed
    // point and require quick convergence with the markers intact.
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.catalyst.optimizer.{BooleanSimplification, ConstantFolding, PushDownPredicates}
    import org.apache.spark.sql.catalyst.rules.RuleExecutor
    val (a, b) = fixtures
    val cond = col("a_start") <= col("b_end") && col("b_start") <= col("a_end")
    val analyzed = a.join(b, cond).select("a_id", "b_id")
      .queryExecution.analyzed
    object MixedBatch extends RuleExecutor[LogicalPlan] {
      override val batches = Batch("production-mix", FixedPoint(100),
        PushDownPredicates, ConstantFolding, BooleanSimplification,
        graft.plans.RangeJoinRewrite(spark)) :: Nil
    }
    val optimized = MixedBatch.execute(analyzed) // diverged pre-fix
    val markers = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.exists(
            _.isInstanceOf[graft.plans.RangeJoinNoRewrite])) => j
    }
    assert(markers.size === 2,
      s"expected the two residual joins to keep their markers:\n$optimized")
    // and the union shape survived (one bucket join + two residuals)
    val joins = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size === 3, s"expected 3 joins after one rewrite:\n$optimized")
  }

  test("the conf flag disables the rewrite") {
    val (a, b) = fixtures
    val cond = col("a_start") <= col("b_end") && col("b_start") <= col("a_end")
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    try {
      val plan = withRule {
        a.join(b, cond).queryExecution.executedPlan.toString
      }
      assert(!plan.contains("Generate"), "disabled rule still fired")
    } finally spark.conf.unset("spark.graft.rangeJoin.enabled")
  }

  test("property fuzz: random intervals match the naive join exactly") {
    // the residual-branch union partitions the pair space as
    // (okL x okR) + (bigL x allR) + (okL x bigR); a randomized
    // bag-equality check against the un-rewritten join keeps that
    // partition argument honest across nulls, zero-length intervals,
    // reversed bounds, duplicates, and sentinel spans straddling the
    // cap (maxDaysPerRow pinned LOW so every branch fires)
    val spark0 = spark
    import spark0.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def mkSide(rnd: scala.util.Random, n: Int, idBase: Long) = {
      val rows = scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, java.sql.Timestamp)]()
      var id = idBase
      while (rows.size < n) {
        id += 1
        val startOff = rnd.nextInt(20 * 86400).toLong * 1000L
        val span = rnd.nextInt(10) match {
          case 0 => 0L                                  // zero-length
          case 1 | 2 => rnd.nextInt(86400).toLong * 1000L // intra-day
          case 3 | 4 | 5 => rnd.nextInt(4 * 86400).toLong * 1000L // under cap
          case 6 | 7 => (5 + rnd.nextInt(10)).toLong * 86400000L  // straddles cap=5
          case _ => (30 + rnd.nextInt(300)).toLong * 86400000L    // sentinel
        }
        val s = new java.sql.Timestamp(base + startOff)
        val e = new java.sql.Timestamp(base + startOff + span)
        val row = rnd.nextInt(20) match {
          case 0 => (id, null.asInstanceOf[java.sql.Timestamp], e) // null start
          case 1 => (id, s, null.asInstanceOf[java.sql.Timestamp]) // null end
          case 2 => (id, e, s)                                     // reversed
          case _ => (id, s, e)
        }
        rows += row
        if (rnd.nextInt(7) == 0) rows += row // duplicate, multiplicity
      }
      rows.toSeq
    }
    for (seed <- 0 until 5) {
      val rnd = new scala.util.Random(seed)
      val a = mkSide(rnd, 60, 0L).toDF("a_id", "a_start", "a_end")
      val b = mkSide(rnd, 50, 1000L).toDF("b_id", "b_start", "b_end")
      val cond = col("a_start") <= col("b_end") && col("b_start") <= col("a_end")
      val naive = a.join(b, cond).select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      spark.conf.set("spark.graft.rangeJoin.maxDaysPerRow", "5")
      val rewritten = try withRule {
        a.join(b, cond).select("a_id", "b_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      } finally spark.conf.unset("spark.graft.rangeJoin.maxDaysPerRow")
      assert(rewritten.toSeq === naive.toSeq,
        s"seed $seed: rewrite diverged from the naive join " +
          s"(naive ${naive.length} pairs, rewritten ${rewritten.length})")
      assert(naive.nonEmpty, s"seed $seed generated a vacuous case")
    }
  }

}
