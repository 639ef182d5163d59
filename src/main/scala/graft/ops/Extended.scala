package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Extended surface (SURVEY.md §2.A/D/E): semi-structured JSON columns,
  * pivot, array explode/unnest aggregation, exact quantiles, grouped
  * argmax, edit distance, and a composite cleaning pipeline — the
  * long-tail operations lake users reach for daily.
  */
object Extended {
  type Q = (SparkSession, String) => DataFrame

  /** JSON column extraction (events.props is a JSON string). */
  val q25Json: Q = (s, d) => {
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .orderBy(col("k_mod"))
  }

  val q25Sql: String =
    """SELECT json_extract(props,'$.k')::int % 10 AS k_mod,
       count(*) AS n, round(sum(value),2) AS total
       FROM events GROUP BY 1 ORDER BY k_mod"""

  /** Pivot: daily × event-type counts as columns. */
  val q26Pivot: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .orderBy(col("day"))
  }

  val q26Sql: String =
    """SELECT date_trunc('day', ts) AS day,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS error
       FROM events GROUP BY 1 ORDER BY day"""

  /** Array explode/unnest aggregation over the embedding vectors. */
  val q27ExplodeAgg: Q = (s, d) => {
    Tables.embeddings(s, d)
      .select(col("label"), explode(col("embedding").cast("array<double>")).as("x"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_elems"), round(avg(col("x")), 4).as("mean_x"))
      .orderBy(col("label"))
  }

  val q27Sql: String =
    """SELECT label, count(*) AS n_elems, round(avg(x),4) AS mean_x
       FROM (SELECT label, unnest(embedding::DOUBLE[]) AS x FROM embeddings) t
       GROUP BY 1 ORDER BY label"""

  /** Exact interpolated quantiles per event type. */
  val q28Quantiles: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 4).as("p25"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"))
      .orderBy(col("event_type"))
  }

  val q28Sql: String =
    """SELECT event_type,
       round(quantile_cont(value, 0.25),4) AS p25,
       round(quantile_cont(value, 0.5),4) AS p50,
       round(quantile_cont(value, 0.9),4) AS p90
       FROM events GROUP BY 1 ORDER BY event_type"""

  /** Grouped argmax: the single highest-value event per user via
    * max_by — one aggregation, no window shuffle. */
  val q29GroupTopk: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max_by(col("event_id"), struct(col("value"), col("event_id"))).as("top_event"),
        round(max(col("value")), 4).as("top_value"))
      .orderBy(col("user_id"))
  }

  // DuckDB's max_by can't take a composite ordering key; the oracle
  // expresses the same deterministic argmax (max event_id among
  // max-value ties) with a window.
  val q29Sql: String =
    """SELECT user_id, max(event_id) AS top_event,
       round(any_value(mv),4) AS top_value
       FROM (SELECT user_id, event_id, value,
               max(value) OVER (PARTITION BY user_id) AS mv
             FROM events) t
       WHERE value = mv GROUP BY 1 ORDER BY user_id"""

  /** Edit distance between canopy-keyed near-dup candidates (prefix
    * join keeps it bounded; levenshtein runs only on candidates). */
  val q30EditDistance: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), substring(col("text"), 1, 40).as("pfx"))
    val a = docs.select(col("doc_id").as("doc_a"), col("text").as("ta"), col("pfx"))
    val b = docs.select(col("doc_id").as("doc_b"), col("text").as("tb"), col("pfx"))
    a.join(b, Seq("pfx"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(substring(col("ta"), 1, 80), substring(col("tb"), 1, 80)).as("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q30Sql: String =
    """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(substring(a.text,1,80), substring(b.text,1,80)) AS dist
       FROM documents a JOIN documents b
         ON substring(a.text,1,40) = substring(b.text,1,40)
        AND a.doc_id < b.doc_id
       ORDER BY doc_a, doc_b"""

  /** Composite cleaning pipeline: quality filter → canopy dedup →
    * per-language corpus stats — the end-to-end shape of a
    * training-data preparation job, one declarative plan. */
  val pipelineClean: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val quality = docs.filter(
      length(col("text")).between(150, 5000) &&
        (length(regexp_replace(col("text"), "[^A-Za-z]", "")) /
          length(col("text")).cast("double")) > 0.6)
    val deduped = quality
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY substring(text,1,40) ORDER BY doc_id)"))
      .filter(col("rn") === 1)
    deduped
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+"))).as("n_tokens"),
        round(avg(length(col("text"))).cast("decimal(38,10)"), 4)
          .cast("double").as("avg_chars"))
      .orderBy(col("lang"))
  }

  val pipelineCleanSql: String =
    """SELECT lang, count(*) AS n_docs,
       sum(len(regexp_split_to_array(trim(text),'\s+')))::BIGINT AS n_tokens,
       round(avg(length(text))::DECIMAL(38,10),4)::DOUBLE AS avg_chars
       FROM (
         SELECT lang, text,
           row_number() OVER (PARTITION BY substring(text,1,40)
                              ORDER BY doc_id) AS rn
         FROM documents
         WHERE length(text) BETWEEN 150 AND 5000
           AND length(regexp_replace(text,'[^A-Za-z]','','g')) / length(text)::double > 0.6) t
       WHERE rn = 1 GROUP BY 1 ORDER BY lang"""

  /** Range-frame window: rolling 7-day spend per customer — a RANGE
    * frame over event-time (epoch seconds), not a row count. */
  val q31RangeFrame: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-6L * 86400, 0)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("weekly"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q31Sql: String =
    """SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
         ORDER BY epoch(o_orderdate)::bigint
         RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW),2) AS weekly
       FROM orders ORDER BY o_custkey, o_orderkey"""

  /** Correlated LATERAL subquery (top-2 orders per customer) — Spark
    * plans it as a rewritten join; the per-customer limit semantics
    * are what make it LATERAL rather than a plain join. */
  val q32Lateral: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("customer_lat")
    Tables.orders(s, d).createOrReplaceTempView("orders_lat")
    s.sql(
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
         FROM customer_lat,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat
                  WHERE o_custkey = c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         ORDER BY c_custkey, t.o_orderkey""")
  }

  val q32Sql: String =
    """SELECT c_custkey, t.o_orderkey, t.o_totalprice
       FROM customer,
       LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                WHERE o_custkey = c_custkey
                ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
       ORDER BY c_custkey, t.o_orderkey"""

  /** Null-semantics suite: null-safe equality, NULLIF, COALESCE,
    * null-counting — SQL's three-valued logic corners. */
  val q33NullSemantics: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .withColumn("maybe_price",
        when(col("o_orderstatus") === "P", lit(null).cast("double"))
          .otherwise(col("o_totalprice")))
    o.groupBy(col("o_orderstatus"))
      .agg(
        sum(when(col("maybe_price").isNull, 1).otherwise(0)).as("n_null"),
        count(col("maybe_price")).as("n_nonnull"),
        round(coalesce(avg(col("maybe_price")).cast("decimal(38,10)"),
            lit(0).cast("decimal(38,10)")), 2)
          .cast("double").as("avg_price"),
        sum(when(col("maybe_price") <=> lit(null).cast("double"), 1).otherwise(0)).as("n_nullsafe"))
      .orderBy(col("o_orderstatus"))
  }

  val q33Sql: String =
    """SELECT o_orderstatus,
       sum(CASE WHEN maybe_price IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
       count(maybe_price) AS n_nonnull,
       round(coalesce(avg(maybe_price)::DECIMAL(38,10), 0), 2)::DOUBLE AS avg_price,
       sum(CASE WHEN maybe_price IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)::BIGINT AS n_nullsafe
       FROM (SELECT o_orderstatus,
               CASE WHEN o_orderstatus = 'P' THEN NULL
                    ELSE o_totalprice END AS maybe_price
             FROM orders) t
       GROUP BY 1 ORDER BY o_orderstatus"""

  /** Ordered string aggregation per group (deterministic order). */
  val q34StringAgg: Q = (s, d) => {
    Tables.customer(s, d)
      .filter(col("c_custkey") < 50)
      .groupBy(col("c_nationkey"))
      .agg(concat_ws(",",
        sort_array(collect_list(concat(col("c_mktsegment"), lit("#"),
          lpad(col("c_custkey").cast("string"), 6, "0"))))).as("members"))
      .orderBy(col("c_nationkey"))
  }

  val q34Sql: String =
    """SELECT c_nationkey,
       string_agg(c_mktsegment || '#' || lpad(c_custkey::varchar, 6, '0'), ','
         ORDER BY c_mktsegment || '#' || lpad(c_custkey::varchar, 6, '0')) AS members
       FROM customer WHERE c_custkey < 50
       GROUP BY 1 ORDER BY c_nationkey"""

  /** Explicit GROUPING SETS with grouping() indicator columns (beyond
    * q18's ROLLUP): disjoint grouping combinations in one pass. */
  val q35GroupingSets: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
         grouping(o_orderstatus) AS g_status,
         grouping(o_orderpriority) AS g_prio,
         count(*) AS n, round(sum(o_totalprice),2) AS total
         FROM orders_gs
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
  }

  val q35Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_prio,
       count(*) AS n, round(sum(o_totalprice),2) AS total
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""

  val queries: Map[String, Q] = Map(
    "q31_range_frame" -> q31RangeFrame,
    "q35_grouping_sets" -> q35GroupingSets,
    "q32_lateral" -> q32Lateral,
    "q33_null_semantics" -> q33NullSemantics,
    "q34_string_agg" -> q34StringAgg,
    "q25_json" -> q25Json,
    "q26_pivot" -> q26Pivot,
    "q27_explode_agg" -> q27ExplodeAgg,
    "q28_quantiles" -> q28Quantiles,
    "q29_group_topk" -> q29GroupTopk,
    "q30_edit_distance" -> q30EditDistance,
    "pipeline_clean" -> pipelineClean)

  val oracles: Map[String, String] = Map(
    "q31_range_frame" -> q31Sql,
    "q35_grouping_sets" -> q35Sql,
    "q32_lateral" -> q32Sql,
    "q33_null_semantics" -> q33Sql,
    "q34_string_agg" -> q34Sql,
    "q25_json" -> q25Sql,
    "q26_pivot" -> q26Sql,
    "q27_explode_agg" -> q27Sql,
    "q28_quantiles" -> q28Sql,
    "q29_group_topk" -> q29Sql,
    "q30_edit_distance" -> q30Sql,
    "pipeline_clean" -> pipelineCleanSql)
}
