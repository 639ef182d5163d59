package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints physical plans for the audit-critical queries: verifies
  * filter/column pushdown reaches the parquet scans, dims broadcast,
  * and codegen stages span the hot expressions. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val targets = Seq(
      "q02_filter_project", "q01_pricing_summary", "q03_join_agg_topn",
      "q05_multi_join", "q09_window_topn", "dd_minhash_pairs",
      "dd_embed_neardup", "ev_sessionize",
      "dd_containment", "ev_interval_join", "ann_sq_topk",
      "ta_dsir_weight", "mm_image_phash", "ta_ppl_bucket")
    targets.foreach { name =>
      println(s"\n========== $name ==========")
      val df = graft.SparkEntry.queries(name)(spark, d)
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
