package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream operators (SURVEY.md §2.E), batch form. The streaming
  * twins (watermark + windowed agg, flatMapGroupsWithState sessions)
  * live in graft.streaming and are exercised by StreamingSpec — same
  * logic, incremental execution.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  /** Tumbling-window aggregation: hourly counts and value sums per
    * event type. One shuffle on (hour, type). */
  val evWindowAgg: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  val evWindowAggSql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value),2) AS total_value
       FROM events GROUP BY 1,2 ORDER BY hour, event_type"""

  /** Sessionization by inactivity gap (30 min): gap detection with lag,
    * session ids via running sum of boundaries, then per-session
    * rollup. Two window passes + one agg, all partitioned by user —
    * shuffles once on user_id and stays partitioned. */
  val evSessionize: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(byUser)))
      .withColumn("is_new",
        when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")).cast("decimal(38,10)"), 2)
          .cast("double").as("session_value"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("duration_s"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val evSessionizeSql: String =
    """SELECT user_id, session_id::BIGINT AS session_id, count(*) AS n_events,
       round(sum(value)::DECIMAL(38,10),2)::DOUBLE AS session_value,
       date_diff('second', min(ts), max(ts)) AS duration_s
       FROM (
         SELECT user_id, ts, value,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM (
           SELECT user_id, event_id, ts, value,
             CASE WHEN date_diff('second',
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
               IS NULL THEN 1
             WHEN date_diff('second',
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
               > 1800 THEN 1 ELSE 0 END AS is_new
           FROM events) g) s
       GROUP BY user_id, session_id ORDER BY user_id, session_id"""

  /** Interval-overlap join — the range-join operator analytics engines
    * special-case (DuckDB's IEJoin, Spark's storage for it is a
    * BroadcastNestedLoop/cartesian unless rewritten): user sessions
    * [s_start, s_end] joined to deterministic campaign windows
    * [c_start, c_end] on temporal overlap, rolled up per campaign.
    *
    * Scale design: a raw `a.start <= b.end AND b.start <= a.end` join
    * plans as a nested-loop cartesian — a scale-killer. Instead both
    * interval sets are decomposed into the DAY BUCKETS they touch
    * (bounded fan-out: sessions are minutes-to-hours, campaigns 24 h,
    * so <= 2-3 buckets each), equi-joined on the bucket key — ONE
    * hash shuffle, candidate pairs only — deduped, then the exact
    * overlap predicate filters residual false bucket-mates. This is
    * the standard distributed range-join rewrite; the bucket width
    * tunes fan-out vs selectivity. PlanShapeSpec locks the no-
    * cartesian property. */
  val evIntervalJoin: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sessions = Tables.events(s, d)
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(byUser)))
      .withColumn("is_new",
        when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    // campaign bounds anchor on EPOCH SECONDS (2024-01-01T00:00:00Z =
    // 1704067200), not a timestamp literal: Spark parses naked
    // timestamp literals in the session timezone, so the boundaries
    // would shift under any non-UTC session while the oracle compares
    // naive micros — epoch arithmetic is timezone-independent
    val campaigns = s.range(0, 20).toDF("campaign_id")
      .select(col("campaign_id"),
        timestamp_seconds(lit(1704067200L) + col("campaign_id") * 129600L)
          .as("c_start"))
      .withColumn("c_end",
        timestamp_seconds(
          lit(1704067200L) + col("campaign_id") * 129600L + 86400L))
    def dayBuckets(a: Column, b: Column): Column =
      explode(sequence(a.cast("date"), b.cast("date"), expr("interval '1' day")))
    val sb = sessions.withColumn("bucket",
      dayBuckets(col("s_start"), col("s_end")))
    val cb = campaigns.withColumn("bucket",
      dayBuckets(col("c_start"), col("c_end")))
    sb.join(cb, Seq("bucket"))
      .dropDuplicates("user_id", "session_id", "campaign_id")
      .filter(col("s_start") <= col("c_end") && col("c_start") <= col("s_end"))
      .groupBy(col("campaign_id"))
      .agg(count(lit(1)).as("n_sessions"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("campaign_id"))
  }

  /** Oracle: the same sessions, campaigns from range arithmetic, and a
    * DIRECT inequality overlap join (DuckDB's IEJoin machinery) — an
    * independent join strategy validating the bucket rewrite end to
    * end. */
  val evIntervalJoinSql: String =
    """WITH sess AS (
         SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end
         FROM (
           SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM (
             SELECT user_id, event_id, ts,
               CASE WHEN date_diff('second',
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
                 IS NULL THEN 1
               WHEN date_diff('second',
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
                 > 1800 THEN 1 ELSE 0 END AS is_new
             FROM events) g) s
         GROUP BY user_id, session_id),
       camp AS (
         SELECT c AS campaign_id,
           TIMESTAMP '2024-01-01 00:00:00' + to_hours(36*c) AS c_start,
           TIMESTAMP '2024-01-01 00:00:00' + to_hours(36*c + 24) AS c_end
         FROM range(0, 20) t(c))
       SELECT campaign_id, count(*) AS n_sessions,
         count(DISTINCT user_id) AS n_users
       FROM sess JOIN camp
         ON s_start <= c_end AND c_start <= s_end
       GROUP BY campaign_id ORDER BY campaign_id"""

  /** Latest-event-per-key dedup: keep the newest event per
    * (user, type) — the mutable-state "upsert view" of a stream. */
  val evDedupLatest: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val evDedupLatestSql: String =
    """SELECT user_id, event_type, event_id, value FROM (
         SELECT user_id, event_type, event_id, value,
           row_number() OVER (PARTITION BY user_id, event_type
             ORDER BY ts DESC, event_id DESC) AS rn
         FROM events) t WHERE rn = 1 ORDER BY user_id, event_type"""

  /** Funnel analysis: signup → click → purchase conversion, ordered by
    * each user's first event of each stage. One shuffle (per-user
    * conditional-min agg), then a single-row rollup. */
  val evFunnel: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("t_signup")).as("n_signup"),
        sum(when(col("t_click") > col("t_signup"), 1).otherwise(0)).as("n_click_after"),
        sum(when(col("t_purchase") > col("t_click") &&
          col("t_click") > col("t_signup"), 1).otherwise(0)).as("n_full"))
  }

  val evFunnelSql: String =
    """WITH stages AS (
         SELECT user_id,
           min(CASE WHEN event_type='signup' THEN ts END) AS t_signup,
           min(CASE WHEN event_type='click' THEN ts END) AS t_click,
           min(CASE WHEN event_type='purchase' THEN ts END) AS t_purchase
         FROM events GROUP BY user_id)
       SELECT count(*) AS n_users, count(t_signup) AS n_signup,
         sum(CASE WHEN t_click > t_signup THEN 1 ELSE 0 END)::BIGINT AS n_click_after,
         sum(CASE WHEN t_purchase > t_click AND t_click > t_signup
             THEN 1 ELSE 0 END)::BIGINT AS n_full
       FROM stages"""

  /** Cohort retention: users bucketed by their FIRST event day, then
    * the distinct-user count still active exactly 0/1/3/7 days later —
    * the standard activation/retention curve. Two shuffles (first-day
    * agg keyed by user, final cohort agg); the active-day set is
    * deduped before the join so the wire carries user-days, not raw
    * events. */
  val evRetention: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firstDay = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    ev.distinct()
      .join(firstDay, Seq("user_id"))
      .withColumn("offset_days", datediff(col("day"), col("cohort_day")))
      .filter(col("offset_days").isin(0, 1, 3, 7))
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("offset_days"))
  }

  val evRetentionSql: String =
    """WITH ev AS (SELECT user_id, ts::DATE AS day FROM events),
       fd AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
       act AS (SELECT DISTINCT user_id, day FROM ev)
       SELECT f.cohort_day, (a.day - f.cohort_day) AS offset_days,
         count(DISTINCT a.user_id)::BIGINT AS n_users
       FROM act a JOIN fd f USING (user_id)
       WHERE (a.day - f.cohort_day) IN (0, 1, 3, 7)
       GROUP BY 1, 2 ORDER BY cohort_day, offset_days"""

  /** Approximate daily uniques via the KMV distinct sketch
    * (functions.KmvDistinct): bounded 64-value state per group, exact
    * below 64 distinct hashes, (k-1)·2³²/h_k above — reported next to
    * the exact count so the error is visible. The sketch is the scale
    * path: a 100 TB daily-uniques rollup ships 512 bytes per
    * (partition, day) through partial aggregation instead of the
    * distinct user sets countDistinct shuffles. Deterministic murmur3
    * hashing makes the estimate itself oracle-checkable — the SQL twin
    * rebuilds the k-th smallest hash and the same estimator. */
  val evKmvUniques: Q = (s, d) => {
    val kmv = udaf(graft.functions.KmvDistinct)
    Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("exact_uniques"),
        round(kmv(col("user_id")), 4).as("kmv_uniques"))
      .orderBy(col("day"))
  }

  /** Pure-SQL twin: murmur3 of the 8-byte user_id (same replica as the
    * pt_bucket / pipeline_mix oracles), distinct hashes per day, k-th
    * smallest, same estimator arithmetic. */
  val evKmvUniquesSql: String =
    s"""WITH uu AS (SELECT DISTINCT ts::DATE AS day, user_id FROM events),
    key_hash AS (
      SELECT day, user_id,
        ${OracleSql.murmurLongCols("user_id")}
      FROM uu),
    ranked AS (
      SELECT day, hu,
        row_number() OVER (PARTITION BY day ORDER BY hu) AS rn,
        count(*) OVER (PARTITION BY day) AS nd
      FROM (SELECT DISTINCT day, hu FROM key_hash) t),
    sk AS (
      SELECT day, max(nd) AS nd, max(CASE WHEN rn = 64 THEN hu END) AS h64
      FROM ranked GROUP BY day),
    ex AS (
      SELECT ts::DATE AS day, count(DISTINCT user_id) AS exact_uniques
      FROM events GROUP BY 1)
    SELECT ex.day, ex.exact_uniques,
      round(CASE WHEN sk.nd < 64 THEN sk.nd::DOUBLE
            ELSE 63 * 4294967296.0 / sk.h64 END, 4) AS kmv_uniques
    FROM ex JOIN sk USING (day)
    ORDER BY day"""

  /** Count-Min-sketch heavy hitters: estimate per-user event counts
    * through a 4x4096 CMS and report every user the SKETCH calls heavy
    * (estimate >= 1.15x the mean per-user count — an all-integer,
    * scale-free threshold), with the exact count alongside so the
    * overestimate is visible. The sketch rows are universal-hash
    * cells over the codegen'd murmur3 of the key — cell = ((a*h + b)
    * mod 2^31-1) mod 4096 — so the whole structure is deterministic and
    * the DuckDB twin rebuilds it bit-for-bit. The build is the scale
    * path: counting (row, cell) pairs partial-aggregates each partition
    * down to <= 16384 cells before anything shuffles, so a 100 TB stream
    * ships a few KB per partition — no per-key shuffle, and sketches
    * merge by cell-wise addition (the partial agg IS the merge).
    * Estimates probe the broadcast sketch; the relative threshold keeps
    * the definition scale-free. Exact counts are computed here only to
    * exhibit the error bound. */
  /** The CMS hash structure, shared with the streaming twin
    * (StreamingSpec): an array of (row, cell) structs — four
    * universal-hash cells over the codegen'd murmur3 of the key. */
  private[graft] def cmsCells(key: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    val p = 2147483647L
    val w = 4096L
    val hu = graft.functions.IcebergTransforms
      .bucket(key, 2147483647).cast("long")
    Seq((1103515245L, 12345L), (214013L, 2531011L),
      (48271L, 0L), (16807L, 12820163L)).zipWithIndex.map {
      case ((a, b), i) =>
        struct(lit(i.toLong).as("r"),
          (((lit(a) * hu + lit(b)) % lit(p)) % lit(w)).as("cell"))
    }
  }

  /** The sketch build alone (streaming-twin surface): (row, cell)
    * counts, partial-aggregated map-side. */
  private[graft] def cmsSketch(ev: DataFrame): DataFrame = ev
    .select(explode(array(cmsCells(col("user_id")): _*)).as("rc"))
    .groupBy(col("rc.r").as("r"), col("rc.cell").as("cell"))
    .agg(count(lit(1)).as("cnt"))

  val evCmsHeavy: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("user_id"))
    val cellCols = cmsCells(col("user_id"))
    val sketch = cmsSketch(ev)
    val users = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_n"))
    val total = Tables.events(s, d).agg(
      count(lit(1)).as("total"),
      countDistinct(col("user_id")).as("n_users"))
    users
      .select(col("user_id"), col("exact_n"),
        explode(array(cellCols: _*)).as("rc"))
      .select(col("user_id"), col("exact_n"),
        col("rc.r").as("r"), col("rc.cell").as("cell"))
      .join(broadcast(sketch), Seq("r", "cell"))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("cnt")).as("cms_n"))
      .crossJoin(broadcast(total))
      .filter(col("cms_n") * col("n_users") * 100 >= col("total") * 115)
      .select(col("user_id"), col("exact_n"), col("cms_n"))
      .orderBy(col("user_id"))
  }

  /** Pure-SQL twin: per-user counts, the murmur3 key-hash replica (the
    * ev_kmv pattern), the same four affine cell maps, sketch cells as
    * sums of colliding users' counts, min-over-rows estimate, same
    * relative threshold. */
  val evCmsHeavySql: String =
    s"""WITH uc AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY 1),
    key_hash AS (
      SELECT user_id, exact_n,
        ${OracleSql.murmurLongCols("user_id")}
      FROM uc),
    hh AS (SELECT user_id, exact_n,
        ((hu & 2147483647) % 2147483647) AS h31 FROM key_hash),
    cells AS (
      SELECT user_id, exact_n, t.r,
        ((t.a * h31 + t.b) % 2147483647) % 4096 AS cell
      FROM hh CROSS JOIN (VALUES
        (0, 1103515245, 12345), (1, 214013, 2531011),
        (2, 48271, 0), (3, 16807, 12820163)) t(r, a, b)),
    sketch AS (
      SELECT r, cell, sum(exact_n)::BIGINT AS cnt FROM cells GROUP BY 1, 2),
    est AS (
      SELECT c.user_id, c.exact_n, min(s.cnt)::BIGINT AS cms_n
      FROM cells c JOIN sketch s USING (r, cell) GROUP BY 1, 2),
    tot AS (SELECT count(*) AS total,
        count(DISTINCT user_id) AS n_users FROM events)
    SELECT user_id, exact_n, cms_n
    FROM est CROSS JOIN tot
    WHERE cms_n * n_users * 100 >= total * 115
    ORDER BY user_id"""

  val queries: Map[String, Q] = Map(
    "ev_cms_heavy" -> evCmsHeavy,
    "ev_retention" -> evRetention,
    "ev_kmv_uniques" -> evKmvUniques,
    "ev_funnel" -> evFunnel,
    "ev_window_agg" -> evWindowAgg,
    "ev_sessionize" -> evSessionize,
    "ev_interval_join" -> evIntervalJoin,
    "ev_dedup_latest" -> evDedupLatest)

  val oracles: Map[String, String] = Map(
    "ev_cms_heavy" -> evCmsHeavySql,
    "ev_retention" -> evRetentionSql,
    "ev_kmv_uniques" -> evKmvUniquesSql,
    "ev_funnel" -> evFunnelSql,
    "ev_window_agg" -> evWindowAggSql,
    "ev_sessionize" -> evSessionizeSql,
    "ev_interval_join" -> evIntervalJoinSql,
    "ev_dedup_latest" -> evDedupLatestSql)
}
