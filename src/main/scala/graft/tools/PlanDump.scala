package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-17 deliverable helper: writes `.explain("formatted")` output
  * for the named keys to <outDir>/<key>_<tag>.txt (the committed
  * plans/r17 evidence). Keys whose returned frame is a collected
  * local relation (protocol fixtures) show that; the scan-shaped keys
  * show the Exchange/scan structure the optimization notes reference.
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> key1,key2,...
  * Not part of the shipped API. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val keys = args(2).split(",").toSeq
    val sf = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.FastLocalFileSystem")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    keys.foreach { key =>
      val df = graft.SparkEntry.queries(key)(spark, sf)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/${key}_$tag.txt")
      try w.println(txt) finally w.close()
      println(s"[plandump] wrote $outDir/${key}_$tag.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
