package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Advanced relational operators (SURVEY.md §2.A/E extensions):
  * custom typed aggregation, as-of (temporal) join, correlated
  * aggregate subqueries, and the salted-join skew pattern.
  */
object Advanced {
  type Q = (SparkSession, String) => DataFrame

  /** Weighted average via the custom Aggregator: discount-weighted
    * price per return flag. Partial aggregation applies (map-side
    * combine), exactly like a builtin. */
  val q21WeightedAvg: Q = (s, d) => {
    val wavg = udaf(graft.functions.WeightedAvg)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4)
        .as("qty_weighted_price"))
      .orderBy(col("l_returnflag"))
  }

  val q21Sql: String =
    """SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
         AS qty_weighted_price
       FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""

  /** As-of join: each purchase matched to the user's most recent
    * click at-or-before it. Spark-first: tag + union + one window over
    * (user, ts) — a single shuffle on the key, no per-row probing;
    * the same plan shape scales to any key cardinality. Deterministic
    * tie-break on event_id. */
  val q22AsofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("side"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("side"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click_id",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_click_ts",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("last_click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("last_click_id").as("click_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("last_click_ts"))).as("gap_s"))
      .orderBy(col("purchase_id"))
  }

  val q22Sql: String =
    """WITH tagged AS (
         SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'click'
         UNION ALL
         SELECT user_id, ts, event_id, 1 FROM events WHERE event_type = 'purchase'),
       marked AS (
         SELECT user_id, ts, event_id, side,
           last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id,
           last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
         FROM tagged)
       SELECT event_id AS purchase_id, user_id, last_click_id AS click_id,
         date_diff('second', last_click_ts, ts) AS gap_s
       FROM marked WHERE side = 1 AND last_click_id IS NOT NULL
       ORDER BY purchase_id"""

  /** Correlated aggregate subquery (TPC-H Q17 family): items far below
    * their part's average order size. Planned as one extra aggregation
    * + a broadcastable join, not a per-row subquery. */
  val q23CorrelatedAgg: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val partAvg = li.groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    li.join(partAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg(count(lit(1)).as("n_small"),
        round(sum(col("l_extendedprice")), 2).as("small_price"))
  }

  val q23Sql: String =
    """SELECT count(*) AS n_small, round(sum(l_extendedprice),2) AS small_price
       FROM lineitem l
       WHERE l_quantity < (SELECT avg(l_quantity) * 0.5 FROM lineitem
                           WHERE l_partkey = l.l_partkey)"""

  /** Salted join: the skew pattern for hot keys — explode the build
    * side by the salt fan-out, salt the probe side randomly but
    * DETERMINISTICALLY (hash of row identity, not rand()), join on
    * (key, salt). Verified against the unsalted join by the oracle. */
  val q24SaltedJoin: Q = (s, d) => {
    // Scale-safe salting: detect the HOT probe keys first (one cheap
    // partial-agg pass + a tiny collect of outliers), salt only rows
    // with those keys, and union with the plain join for the cold
    // side. Salting everything would explode the build side ×salts —
    // correct, but a needless 8× at 100 TB when skew is concentrated
    // in a handful of keys. (AQE skew-join is the zero-code variant;
    // this is the explicit form.)
    val salts = 8
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    // hot = keys with above-structural-max fanout (TPC-H orders have
    // <=7 lines; anything past the bulk is "skewed" for the pattern).
    // The hot set is a DataFrame, broadcast into semi/anti joins — no
    // driver collect, no giant IN-list.
    val hotDf = broadcast(
      li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 6).select(col("l_orderkey")))
    val liHot = li.join(hotDf, Seq("l_orderkey"), "left_semi")
      .withColumn("salt",
        pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(salts)))
    val liCold = li.join(hotDf, Seq("l_orderkey"), "left_anti")
    val ordHot = ord.join(hotDf.withColumnRenamed("l_orderkey", "o_orderkey"),
        Seq("o_orderkey"), "left_semi")
      .withColumn("salt", explode(array((0 until salts).map(lit(_)): _*)))
    val ordCold = ord.join(hotDf.withColumnRenamed("l_orderkey", "o_orderkey"),
      Seq("o_orderkey"), "left_anti")
    liHot.join(ordHot,
        col("l_orderkey") === col("o_orderkey") && liHot("salt") === ordHot("salt"))
      .drop("salt")
      .unionByName(liCold.join(ordCold, col("l_orderkey") === col("o_orderkey")))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
      .orderBy(col("o_orderpriority"))
  }

  val q24Sql: String =
    """SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity),2) AS qty
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY 1 ORDER BY o_orderpriority"""

  val queries: Map[String, Q] = Map(
    "q21_weighted_avg" -> q21WeightedAvg,
    "q22_asof_join" -> q22AsofJoin,
    "q23_correlated_agg" -> q23CorrelatedAgg,
    "q24_salted_join" -> q24SaltedJoin)

  val oracles: Map[String, String] = Map(
    "q21_weighted_avg" -> q21Sql,
    "q22_asof_join" -> q22Sql,
    "q23_correlated_agg" -> q23Sql,
    "q24_salted_join" -> q24Sql)
}
