package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. At
  * cluster scale these would be directories of many files (or GraftTable
  * roots); nothing below assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema cache, keyed per (session, path): a bare
    * spark.read.parquet re-INFERS the schema on every call (a driver
    * footer read plus a mergeSchemasInParallel job — visible in every
    * key's profile), but these tables' schemas are static metadata a
    * production deployment would carry in its catalog/manifests, not
    * re-derive per query. No DATA is cached — only the StructType; the
    * scan itself recomputes from parquet on every invocation. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String),
      org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = (System.identityHashCode(spark), path)
    val schema = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** Some testdata generations store events.ts as TIMESTAMP(NANOS),
    * which Spark's vectorized reader rejects; with nanosAsLong those
    * read as long, and we floor-convert to micros (integer `div` — a
    * double division would lose precision above 2^53), matching
    * DuckDB's truncating NANOS→micros read. Other generations store
    * plain micros, which need no conversion — branch on the read type. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // session tz is pinned UTC, so NTZ→LTZ keeps wall-clock values;
        // LTZ is what watermarks/windows require (and what the NANOS
        // path above always produced)
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Spread a few-partition local read across the executor cores
    * before CPU-bound per-row work (hashing, cosine kernels). A no-op
    * when input splits already provide parallelism — so at cluster
    * scale, where a 100 TB corpus arrives as thousands of splits, NO
    * full-table shuffle is added; locally, where a table is one small
    * file, the tiny shuffle is the equalizer. */
  def spread(s: SparkSession, df: DataFrame): DataFrame = {
    val want = s.sparkContext.defaultParallelism
    val threshold = math.max(2, want / 2)
    val files = df.inputFiles
    if (files.length >= threshold) return df
    // few files can still split into many input partitions: estimate
    // splits from bytes (metadata-scale — at most `threshold` status
    // calls). This deliberately avoids the old `df.rdd` probe, which
    // forced an eager physical plan -> RDD conversion per call and
    // read the pre-AQE partitioning.
    val maxBytes = math.max(1L, s.sessionState.conf.filesMaxPartitionBytes)
    val splits = files.iterator.map { f =>
      val len =
        try graft.table.TableIO.size(new org.apache.hadoop.fs.Path(f))
        catch { case _: Exception => 0L }
      math.max(1L, (len + maxBytes - 1) / maxBytes)
    }.sum
    if (splits >= threshold) df else df.repartition(want)
  }
}
