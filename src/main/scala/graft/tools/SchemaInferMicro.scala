package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-17 scratch: per-call cost of parquet schema inference vs an
  * explicit schema on the bench's base-table reads. Not shipped. */
object SchemaInferMicro {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.FastLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = s"$sf/orders.parquet"
    val schema = spark.read.parquet(path).schema
    // warm both paths
    (1 to 5).foreach { _ =>
      spark.read.parquet(path).count()
      spark.read.schema(schema).parquet(path).count()
    }
    val n = 30
    var t0 = System.nanoTime()
    (1 to n).foreach(_ => spark.read.parquet(path).count())
    val inferMs = (System.nanoTime() - t0) / 1e6 / n
    t0 = System.nanoTime()
    (1 to n).foreach(_ => spark.read.schema(schema).parquet(path).count())
    val explicitMs = (System.nanoTime() - t0) / 1e6 / n
    println(f"[schema-micro] inferred $inferMs%.1f ms/count, explicit $explicitMs%.1f ms/count, delta ${inferMs - explicitMs}%.1f ms")
    spark.stop()
  }
}
