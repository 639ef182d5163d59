package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.table.{GraftTable, Meta}

/** Round-14 probe for the tf_partition_scan sf1 scaler (BENCH_SF1
  * flagged 6.2x for 10x data): splits the key's in-query fixture into
  * its two phases — the partitioned WRITE (create + append of all of
  * orders through the month spec) and the PRUNED READ (stat-filtered
  * scan + aggregate) — at each given SF dir, 2 reps each, so the
  * growth attributes to a phase instead of a single key total.
  * Usage: runMain graft.tools.PartScanProbe <sfDir> [<sfDir> ...] */
object PartScanProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sfscale/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("part-scan-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.FastLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    dirs.foreach { d =>
      (1 to 2).foreach { rep =>
        val o = graft.Tables.orders(spark, d)
        val loc = java.nio.file.Files
          .createTempDirectory("probe-pscan").toString
        val (t, wSec) = time {
          val t = GraftTable.create(spark, loc, o.schema,
            spec = Seq(Meta.PartitionField("o_orderdate", "month", "_p_month")))
          t.append(o)
          t
        }
        val m = t.meta
        val files = m.liveFiles(None)
        val (_, rSec) = time {
          t.scan(Seq(t.StatFilter("_p_month", ">=", "312"),
              t.StatFilter("_p_month", "<=", "323")))
            .filter(year(col("o_orderdate")) === 1996)
            .groupBy(graft.functions.IcebergTransforms
              .monthsFromEpoch(col("o_orderdate")).as("m_1970"))
            .agg(count(lit(1)).as("n"))
            .orderBy(col("m_1970"))
            .collect()
        }
        println(f"[pscan] dir=$d rep=$rep write=$wSec%.2f s " +
          f"read=$rSec%.2f s files=${files.size} " +
          f"partitions=${files.map(_.partitionValues).distinct.size} " +
          f"rows=${files.map(_.recordCount).sum}")
        graft.table.TableIO.delete(
          graft.table.TableIO.path(loc), recursive = true)
      }
    }
    spark.stop()
  }
}
