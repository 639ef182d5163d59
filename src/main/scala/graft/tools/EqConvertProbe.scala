package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stress probe for equality→position delete conversion at realistic
  * delete-file counts — the long-lived-deletes scenario the feature
  * exists for (a streaming upsert writer leaving ~100 equality delete
  * files across schema eras). Measures:
  *   1. scan cost BEFORE conversion (every scan pays the per-era
  *      key-set anti-joins),
  *   2. the conversion itself (slot derivation cost vs delete count),
  *   3. scan cost AFTER (position slots only),
  * and checks the motivating claim: the converted table's scan cost
  * drops, visible rows identical, eq entries zero.
  *
  * Usage: sbt "runMain graft.tools.EqConvertProbe [nDeleteFiles]"
  * Prints one JSON line for the BENCH_SF1-style record. */
object EqConvertProbe {
  def main(args: Array[String]): Unit = {
    val nDeletes = args.headOption.map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-eqconvert-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.FastLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.table.iceberg.{IcebergMetadata, IcebergTable, IcebergWrite}

    val loc = java.nio.file.Files
      .createTempDirectory("graft-eqprobe").toString + "/t"
    // 1M rows in 20 files — enough that scan cost is measurable
    val n = 1000000L
    IcebergWrite.create(spark, loc,
      spark.range(n).select(col("id").as("k"),
        concat(lit("u"), (col("id") % 50000).cast("string")).as("v"),
        (col("id") * 3).as("w")).repartition(20))

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // nDeletes equality-delete files, each hiding ~20 rows, committed
    // across THREE schema eras (renames of an untouched column) so
    // conversion must resolve keys against historical eras too
    val (_, buildSec) = timed {
      var label = "w"
      for (i <- 0 until nDeletes) {
        if (i == nDeletes / 3 || i == 2 * nDeletes / 3) {
          val next = s"w$i"
          IcebergWrite.renameColumn(loc, label, next)
          label = next
        }
        IcebergWrite.deleteEquality(spark, loc,
          (0 until 20).map(j => s"u${(i * 20 + j) % 50000}").toDF("v"),
          Seq("v"))
      }
    }
    val mBefore = IcebergMetadata.load(loc)
    val eqBefore = IcebergTable.load(spark, loc)
      .deleteEntries().count(_._1.content == 2)

    def scanCount(): Long =
      IcebergTable.load(spark, loc).scan().filter(col("k") % 7 === 0).count()
    scanCount() // warm
    val (visBefore, scanBeforeSec) = timed(scanCount())

    val ((conv, created), convertSec) =
      timed(IcebergWrite.convertEqualityDeletes(spark, loc))

    val mAfter = IcebergMetadata.load(loc)
    val eqAfter = IcebergTable.load(spark, loc)
      .deleteEntries().count(_._1.content == 2)
    scanCount() // warm
    val (visAfter, scanAfterSec) = timed(scanCount())

    assert(eqBefore == nDeletes, s"expected $nDeletes eq files, $eqBefore")
    assert(conv == nDeletes && eqAfter == 0,
      s"conversion incomplete: conv=$conv eqAfter=$eqAfter")
    assert(visAfter == visBefore,
      s"visible rows CHANGED: $visBefore -> $visAfter")
    // one conversion snapshot, not one per delete file
    assert(mAfter.snapshots.size == mBefore.snapshots.size + 1,
      "conversion must land exactly one snapshot")

    println(s"""{"probe":"eq_convert","n_delete_files":$nDeletes,""" +
      s""""rows":$n,"build_sec":${f"$buildSec%.2f"},""" +
      s""""scan_before_sec":${f"$scanBeforeSec%.3f"},""" +
      s""""convert_sec":${f"$convertSec%.2f"},""" +
      s""""scan_after_sec":${f"$scanAfterSec%.3f"},""" +
      s""""pos_files_created":$created,""" +
      s""""visible_rows":$visAfter,""" +
      s""""scan_speedup":${f"${scanBeforeSec / scanAfterSec}%.2f"}}""")
    spark.stop()
  }
}
