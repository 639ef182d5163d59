package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the minhash pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val docs = graft.Tables.documents(spark, d)
    time("docs.count")(docs.count())

    val w = split(trim(lower(col("text"))), "\\s+")
    val sh = when(size(w) >= 3,
      transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", slice(w, i + 1, lit(3)))))
      .otherwise(array(lower(col("text"))))
    val shingled = docs.select(col("doc_id"), array_distinct(sh).as("sh_arr"))
    time("shingling")(shingled.count())
    time("shingling.again")(shingled.agg(sum(size(col("sh_arr")))).count())

    val banded = shingled.select(col("doc_id"),
      posexplode(graft.functions.ArrayKernels.minhashBandKeys(col("sh_arr"), 64, 16))
        .as(Seq("band", "bh")))
    time("banded")(banded.count())

    val l = banded.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
    val r = banded.select(col("doc_id").as("doc_b"), col("band"), col("bh"))
    val pairs = l.join(r, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    time("pairs")(pairs.count())
    time("pairs.again")(pairs.count())

    spark.stop()
  }
}
