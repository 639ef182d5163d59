package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-5 scratch profiler: times the two bench hot spots at a given
  * SF dir with coarse phase breakdowns. Not part of the shipped API. */
object ProfR5 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "both"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("prof-r5")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.FastLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    if (which == "both" || which == "ice") {
      time("tf_iceberg_partitioned total") {
        graft.ops.TableOps.queries("tf_iceberg_partitioned")(spark, sf).collect()
      }
    }
    if (which == "icephases") for (rnd <- 1 to 2) {
      import org.apache.spark.sql.functions._
      val o = time("read orders")(graft.Tables.orders(spark, sf).cache())
      o.count()
      val loc = "file:///tmp/prof_ice_" + System.nanoTime()
      val t = time("createWithSpec (write)") {
        graft.table.iceberg.IcebergWrite.createWithSpec(
          spark, loc, o, Seq("o_orderdate" -> "month", "o_custkey" -> "bucket[8]"))
      }
      val t2 = time("load")(graft.table.iceberg.IcebergTable.load(spark, loc))
      val df = time("scan plan") {
        t2.scan(None, Seq(("o_orderdate", ">=", "1995-06-01 00:00:00")))
      }
      time("scan+agg collect") {
        df.filter(col("o_orderdate") >= to_timestamp(lit("1995-06-01 00:00:00")))
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("month")).collect()
      }
    }
    if (which == "writecal") {
      import org.apache.spark.sql.functions._
      val o = graft.Tables.orders(spark, sf).cache()
      o.count()
      def dest() = "/tmp/prof_wc_" + System.nanoTime()
      time("warmup write")(o.write.parquet(dest()))
      time("unpartitioned")(o.write.parquet(dest()))
      val withM = o.withColumn("_m", date_trunc("month", col("o_orderdate")))
      time("month only (~80 files)")(
        withM.repartition(col("_m")).write.partitionBy("_m").parquet(dest()))
      val withMB = withM.withColumn("_b", pmod(hash(col("o_custkey")), lit(8)))
      time("month x bucket (~640 files)")(
        withMB.repartition(col("_m"), col("_b"))
          .write.partitionBy("_m", "_b").parquet(dest()))
      time("month x bucket again")(
        withMB.repartition(col("_m"), col("_b"))
          .write.partitionBy("_m", "_b").parquet(dest()))
      time("mxb maxRecordsPerFile no-repart")(
        withMB.write.partitionBy("_m", "_b").parquet(dest()))
    }
    if (which == "ann") for (rnd <- 1 to 3) {
      time(s"ann_lsh_topk run$rnd") {
        graft.ops.Similarity.queries("ann_lsh_topk")(spark, sf).collect()
      }
      time(s"ann_ivf_topk run$rnd") {
        graft.ops.Similarity.queries("ann_ivf_topk")(spark, sf).collect()
      }
    }
    if (which == "both" || which == "cc") {
      time("dd_minhash_cluster total") {
        graft.ops.Dedup.queries("dd_minhash_cluster")(spark, sf).collect()
      }
    }
    spark.stop()
  }
}
