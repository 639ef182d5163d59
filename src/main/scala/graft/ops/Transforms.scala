package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.IcebergTransforms
import graft.functions.IcebergTransforms.{truncateInt, truncateString, yearsFromEpoch, monthsFromEpoch, daysFromEpoch, hoursFromEpoch}

/** Partition-transform queries (SURVEY.md §2.B): the Iceberg transforms
  * (reference: iceberg-rust-spec/src/spec/partition.rs:27) applied as
  * grouping keys, the way a partitioned write or partition-pruned scan
  * would use them.
  */
object Transforms {
  type Q = (SparkSession, String) => DataFrame

  /** truncate(W) on int + string, identity alongside. */
  val ptTruncate: Q = (s, d) => {
    Tables.part(s, d)
      .select(
        truncateInt(col("p_size"), 10).as("size_bucket"),
        truncateString(col("p_brand"), 6).as("brand_prefix"))
      .groupBy(col("size_bucket"), col("brand_prefix"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("size_bucket"), col("brand_prefix"))
  }

  val ptTruncateSql: String =
    """SELECT p_size - (((p_size % 10) + 10) % 10) AS size_bucket,
       substring(p_brand,1,6) AS brand_prefix, count(*) AS n
       FROM part GROUP BY 1,2 ORDER BY size_bucket, brand_prefix"""

  /** year/month/day/hour transforms: units since the 1970 epoch, per the
    * Iceberg spec (not calendar extracts). */
  val ptDatetime: Q = (s, d) => {
    Tables.orders(s, d)
      .select(
        yearsFromEpoch(col("o_orderdate")).as("y_1970"),
        monthsFromEpoch(col("o_orderdate")).as("m_1970"),
        daysFromEpoch(col("o_orderdate")).as("d_1970"),
        hoursFromEpoch(col("o_orderdate")).as("h_1970"))
      .groupBy(col("y_1970"), col("m_1970"), col("d_1970"), col("h_1970"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("y_1970"), col("m_1970"), col("d_1970"), col("h_1970"))
  }

  val ptDatetimeSql: String =
    """SELECT (year(o_orderdate)-1970)::int AS y_1970,
       ((year(o_orderdate)-1970)*12 + month(o_orderdate)-1)::int AS m_1970,
       date_diff('day', DATE '1970-01-01', o_orderdate::date)::int AS d_1970,
       date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)::int AS h_1970,
       count(*) AS n
       FROM orders GROUP BY 1,2,3,4 ORDER BY y_1970, m_1970, d_1970, h_1970"""

  /** bucket(N): Iceberg murmur3 hash transform over long + string keys.
    * Not expressible in DuckDB (rows-only check); hash conformance is
    * unit-tested against the public Iceberg spec vectors. */
  val ptBucket: Q = (s, d) => {
    Tables.orders(s, d)
      .select(
        IcebergTransforms.bucket(col("o_orderkey"), 16).as("key_bucket"),
        IcebergTransforms.bucket(col("o_orderpriority"), 4).as("prio_bucket"))
      .groupBy(col("key_bucket"), col("prio_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("key_bucket"), col("prio_bucket"))
  }

  val queries: Map[String, Q] = Map(
    "pt_truncate" -> ptTruncate,
    "pt_datetime" -> ptDatetime,
    "pt_bucket" -> ptBucket)

  val oracles: Map[String, String] = Map(
    "pt_truncate" -> ptTruncateSql,
    "pt_datetime" -> ptDatetimeSql)
}
