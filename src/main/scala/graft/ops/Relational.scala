package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational query surface (SURVEY.md §2.A) — the DataFusion-equivalent
  * capability of the reference (datafusion_iceberg/examples runs
  * filter/projection/group-by/join/insert-select through its catalog),
  * re-expressed as declarative Catalyst plans.
  *
  * Conventions shared with the DuckDB oracles:
  *  - every computed column aliased identically on both sides;
  *  - money/float aggregates rounded (double association differs);
  *  - deterministic total ORDER BY on both sides;
  *  - nulls-first ordering made explicit (Spark default asc = nulls
  *    first, DuckDB default = nulls last).
  */
object Relational {

  private def ts(s: String): Column = to_timestamp(lit(s))

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 family: multi-aggregate scan. One shuffle (partial aggs
    * map-side); filter + 7-column pruning pushed to the parquet scan. */
  val q01PricingSummary: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity),2) AS sum_qty,
       round(sum(l_extendedprice),2) AS sum_base_price,
       round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
       round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
       round(avg(l_quantity),4) AS avg_qty,
       round(avg(l_extendedprice),4) AS avg_price,
       round(avg(l_discount),4) AS avg_disc,
       count(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

  /** Predicate + column pruning: the physical scan must show
    * PushedFilters on l_shipdate/l_discount/l_quantity and a 5-column
    * ReadSchema. TPC-H Q6 family but row-level output. */
  val q02FilterProject: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        round(col("l_extendedprice") * col("l_discount"), 4).as("disc_revenue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity,
       round(l_extendedprice*l_discount,4) AS disc_revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
       ORDER BY l_orderkey, l_linenumber"""

  /** TPC-H Q3 family: dim-filtered 3-way join → agg → top 10. customer
    * broadcasts; orders⋈lineitem shuffles once on the order key. */
  val q03JoinAggTopn: Q = (s, d) => {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1997-01-01 00:00:00"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT l_orderkey, o_orderdate,
       round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY l_orderkey, o_orderdate
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** Explicit broadcast-hash join on a small dim: no shuffle of the fact
    * side for the join, one shuffle for the agg. */
  val q04BroadcastJoin: Q = (s, d) => {
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  val q04Sql: String =
    """SELECT p_brand, round(sum(l_quantity),2) AS sum_qty, count(*) AS n_items
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand ORDER BY p_brand"""

  /** TPC-H Q5 family: 6-table star join, all dims broadcast, facts
    * shuffle only for the final agg. */
  val q05MultiJoin: Q = (s, d) => {
    val dims = broadcast(Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey")))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(
        col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
          col("o_orderdate") < ts("1998-01-01 00:00:00")),
        col("l_orderkey") === col("o_orderkey"))
      .join(dims, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  val q05Sql: String =
    """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name ORDER BY n_name"""

  /** Left-semi join (EXISTS): customers having at least one urgent
    * open order. Builds the semi side small → broadcast. */
  val q06SemiJoin: Q = (s, d) => {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val q06Sql: String =
    """SELECT c_custkey, c_name FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
       ORDER BY c_custkey"""

  /** Left-anti join (NOT EXISTS): customers with no urgent order. */
  val q07AntiJoin: Q = (s, d) => {
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  val q07Sql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
         AND o_orderpriority = '1-URGENT')
       ORDER BY c_custkey"""

  /** Left-outer join with null-aware aggregation: count(col) skips the
    * nulls produced for orderless customers, coalesce fills totals. */
  val q08OuterJoin: Q = (s, d) => {
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  val q08Sql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
       round(coalesce(sum(o_totalprice),0),2) AS total_spent
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey ORDER BY c_custkey"""

  /** Partitioned top-N: row_number window, deterministic tie-break on
    * the unique order key. One shuffle on the partition key. */
  val q09WindowTopn: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q09Sql: String =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn"""

  /** Window suite: running sum / lag / rank over a deterministic
    * per-supplier order. */
  val q10WindowRunning: Q = (s, d) => {
    val ord = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        round(sum(col("l_quantity")).over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_qty"),
        round(coalesce(lag(col("l_extendedprice"), 1).over(ord), lit(0.0)), 2).as("prev_price"),
        rank().over(Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))).as("qty_rank"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val q10Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_quantity) OVER (PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty,
       round(coalesce(lag(l_extendedprice,1) OVER (PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber),0),2) AS prev_price,
       rank() OVER (PARTITION BY l_suppkey
         ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS qty_rank
       FROM lineitem WHERE l_suppkey <= 5
       ORDER BY l_suppkey, l_orderkey, l_linenumber"""

  /** Distinct aggregation: two countDistinct + plain count in one pass
    * (Spark expands to a single multi-distinct aggregate). */
  val q11DistinctAgg: Q = (s, d) => {
    Tables.lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      count(lit(1)).as("n_rows"))
  }

  val q11Sql: String =
    """SELECT count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
       FROM lineitem"""

  /** Set operations with SQL semantics: UNION dedups, INTERSECT /
    * EXCEPT are distinct set ops. */
  val q12SetOps: Q = (s, d) => {
    val custNations = Tables.customer(s, d)
      .select(col("c_nationkey").cast("int").as("nationkey"))
    val suppNations = Tables.supplier(s, d)
      .select(col("s_nationkey").cast("int").as("nationkey"))
    val both = custNations.intersect(suppNations)
      .withColumn("src", lit("both"))
    val custOnly = custNations.except(suppNations)
      .withColumn("src", lit("cust_only"))
    both.union(custOnly).orderBy(col("src"), col("nationkey"))
  }

  val q12Sql: String =
    """SELECT * FROM (
         SELECT nationkey, 'both' AS src FROM
           (SELECT c_nationkey AS nationkey FROM customer
            INTERSECT SELECT s_nationkey FROM supplier)
         UNION ALL
         SELECT nationkey, 'cust_only' AS src FROM
           (SELECT c_nationkey AS nationkey FROM customer
            EXCEPT SELECT s_nationkey FROM supplier))
       ORDER BY src, nationkey"""

  /** Scalar subquery in the filter: quantity above the global average.
    * Spark plans the subquery as a one-row broadcast. */
  val q13ScalarSubquery: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val avgQty = li.agg(avg(col("l_quantity")).as("a"))
    li.join(broadcast(avgQty))
      .filter(col("l_quantity") > col("a") * 1.5)
      .agg(count(lit(1)).as("n_big"),
        round(sum(col("l_extendedprice")), 2).as("big_price"))
  }

  val q13Sql: String =
    """SELECT count(*) AS n_big, round(sum(l_extendedprice),2) AS big_price
       FROM lineitem
       WHERE l_quantity > (SELECT avg(l_quantity)*1.5 FROM lineitem)"""

  /** Conditional aggregation (CASE WHEN inside agg) — TPC-H Q14 shape. */
  val q14ConditionalAgg: Q = (s, d) => {
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("n_high"),
        sum(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0)).as("n_low"),
        round(sum(when(col("o_totalprice") > 100000, col("o_totalprice")).otherwise(0.0))
          .cast("decimal(38,10)"), 2)
          .cast("double").as("big_total"))
      .orderBy(col("o_orderstatus"))
  }

  val q14Sql: String =
    """SELECT o_orderstatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS n_high,
       sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)::BIGINT AS n_low,
       round(sum(CASE WHEN o_totalprice > 100000 THEN o_totalprice ELSE 0 END)::DECIMAL(38,10),2)::DOUBLE AS big_total
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  /** Global sort + limit: Spark plans TakeOrderedAndProject — no full
    * sort materialization. */
  val q15SortLimit: Q = (s, d) => {
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
  }

  val q15Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20"""

  /** Statistical aggregates: sample stddev/variance, min/max, median
    * (both engines interpolate the even-count median). */
  val q16StatsAgg: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        round(expr("median(l_extendedprice)"), 4).as("med_price"))
      .orderBy(col("l_returnflag"))
  }

  val q16Sql: String =
    """SELECT l_returnflag,
       round(stddev_samp(l_extendedprice),4) AS sd_price,
       round(var_samp(l_quantity),4) AS var_qty,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price,
       round(median(l_extendedprice),4) AS med_price
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Group filter (HAVING): parts ordered in volume. */
  val q17Having: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .filter(col("n") >= 20)
      .orderBy(col("l_partkey"))
  }

  val q17Sql: String =
    """SELECT l_partkey, count(*) AS n, round(sum(l_quantity),2) AS qty
       FROM lineitem GROUP BY l_partkey HAVING count(*) >= 20
       ORDER BY l_partkey"""

  /** ROLLUP grouping sets; explicit NULLS FIRST so both engines order
    * the subtotal rows identically. */
  val q18Rollup: Q = (s, d) => {
    Tables.orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
  }

  val q18Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice),2) AS total
       FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""

  /** Date/time function suite: extract + truncate semantics shared by
    * Spark and DuckDB. */
  val q19DateFunctions: Q = (s, d) => {
    Tables.orders(s, d)
      .select(
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        col("o_totalprice"))
      .groupBy(col("y"), col("q"), col("m"), col("dom"), col("month_start"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("y"), col("q"), col("m"), col("dom"))
  }

  val q19Sql: String =
    """SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
       month(o_orderdate) AS m, day(o_orderdate) AS dom,
       date_trunc('month', o_orderdate) AS month_start,
       count(*) AS n, round(sum(o_totalprice),2) AS total
       FROM orders GROUP BY 1,2,3,4,5 ORDER BY y, q, m, dom"""

  /** String function suite: case, substring, concat, LIKE, replace,
    * length — all codegen'd builtins. */
  val q20StringFunctions: Q = (s, d) => {
    Tables.customer(s, d)
      .filter(col("c_name").like("%1%"))
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        concat(col("c_mktsegment"), lit("#"), col("c_custkey").cast("string")).as("seg_key"),
        length(col("c_name")).as("name_len"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("name_masked"))
      .orderBy(col("c_custkey"))
  }

  val q20Sql: String =
    """SELECT c_custkey, upper(c_name) AS name_upper,
       substring(c_name,1,8) AS name_prefix,
       c_mktsegment || '#' || CAST(c_custkey AS VARCHAR) AS seg_key,
       length(c_name) AS name_len,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked
       FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey"""

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> q01PricingSummary,
    "q02_filter_project" -> q02FilterProject,
    "q03_join_agg_topn" -> q03JoinAggTopn,
    "q04_broadcast_join" -> q04BroadcastJoin,
    "q05_multi_join" -> q05MultiJoin,
    "q06_semi_join" -> q06SemiJoin,
    "q07_anti_join" -> q07AntiJoin,
    "q08_outer_join" -> q08OuterJoin,
    "q09_window_topn" -> q09WindowTopn,
    "q10_window_running" -> q10WindowRunning,
    "q11_distinct_agg" -> q11DistinctAgg,
    "q12_set_ops" -> q12SetOps,
    "q13_scalar_subquery" -> q13ScalarSubquery,
    "q14_conditional_agg" -> q14ConditionalAgg,
    "q15_sort_limit" -> q15SortLimit,
    "q16_stats_agg" -> q16StatsAgg,
    "q17_having" -> q17Having,
    "q18_rollup" -> q18Rollup,
    "q19_date_functions" -> q19DateFunctions,
    "q20_string_functions" -> q20StringFunctions)

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_join_agg_topn" -> q03Sql,
    "q04_broadcast_join" -> q04Sql,
    "q05_multi_join" -> q05Sql,
    "q06_semi_join" -> q06Sql,
    "q07_anti_join" -> q07Sql,
    "q08_outer_join" -> q08Sql,
    "q09_window_topn" -> q09Sql,
    "q10_window_running" -> q10Sql,
    "q11_distinct_agg" -> q11Sql,
    "q12_set_ops" -> q12Sql,
    "q13_scalar_subquery" -> q13Sql,
    "q14_conditional_agg" -> q14Sql,
    "q15_sort_limit" -> q15Sql,
    "q16_stats_agg" -> q16Sql,
    "q17_having" -> q17Sql,
    "q18_rollup" -> q18Sql,
    "q19_date_functions" -> q19Sql,
    "q20_string_functions" -> q20Sql)
}
