package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe data generator: replicates the sf0.1 tables N× with
  * shifted keys into a target dir, so the bench battery can run at
  * sf≈1 and expose super-linear scalers the sf0.1 bench structurally
  * cannot see (driver-side loops, candidate-pair blowups, metadata
  * walks). Dims (region/nation) stay fixed, as in TPC-H. Document
  * texts get a per-copy salt so near-dup structure stays realistic
  * instead of every doc gaining N exact clones.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <destDir> [copies]
  */
object ScaleUp {
  /** Key shift between copies: a round constant safely above every
    * source key (copy i's keys live in [i*Shift, (i+1)*Shift)). */
  val Shift = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("/tmp/sfscale/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val only = args.lift(3).map(_.split(',').map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.FastLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dest, copies, only)
    spark.stop()
  }

  /** The generator proper, reusable from a live session (the sf1
    * invariant suite builds its fixture through this). */
  def run(spark: SparkSession, src: String, dest: String,
      copies: Int, only: Option[Set[String]] = None): Unit = {
    val S = Shift

    def wanted(name: String): Boolean = only.forall(_.contains(name))

    def replicate(name: String, keyCols: Seq[String],
        salt: Option[String] = None): Unit = if (wanted(name)) {
      val df = spark.read.parquet(s"$src/$name.parquet")
      val parts = (0 until copies).map { i =>
        val shifted = keyCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(S * i)))
        salt match {
          case Some(c) if i > 0 =>
            shifted.withColumn(c, concat(col(c), lit(s" #$i")))
          case _ => shifted
        }
      }
      parts.reduce(_ unionAll _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"scaled $name x$copies")
    }

    def copy(name: String): Unit = if (wanted(name)) {
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"copied $name")
    }

    copy("region"); copy("nation")
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"), salt = Some("text"))
    replicate("embeddings", Seq("vec_id"))
  }
}
