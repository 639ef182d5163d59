package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Advanced.queries ++ ops.Extended.queries ++
      ops.Transforms.queries ++
      ops.Events.queries ++ ops.TextAnalysis.queries ++
      ops.Dedup.queries ++ ops.Similarity.queries ++
      ops.Multimodal.queries ++ ops.TableOps.queries ++
      ops.CatalogOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Advanced.oracles ++ ops.Extended.oracles ++
      ops.Transforms.oracles ++
      ops.Events.oracles ++ ops.TextAnalysis.oracles ++
      ops.Dedup.oracles ++ ops.Similarity.oracles ++
      ops.Multimodal.oracles ++
      ops.TableOps.oracles ++ ops.CatalogOps.oracles
}
