package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Round-17 optimization profiler: runs named SparkEntry keys once warm
  * + once timed under a SparkListener that records every Spark job's
  * wall time and call site, then prints the per-job breakdown plus the
  * driver-side gap (time not covered by any job — metadata IO, REST
  * round trips, planning). Usage:
  *   sbt "runMain graft.tools.KeyJobProfile key1,key2 [sfDir]"
  * Not part of the shipped API.
  */
object KeyJobProfile {
  def main(args: Array[String]): Unit = {
    val keys = args.headOption.getOrElse("tf_txn_wap").split(",").toSeq
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("key-job-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.FastLocalFileSystem")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // session warmup, same as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Tables.lineitem(spark, sf).limit(1000).collect()

    case class Job(id: Int, start: Long, var end: Long = 0L,
        var site: String = "", var nTasks: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val n = js.stageInfos.map(_.numTasks).sum
        jobs.synchronized {
          jobs(js.jobId) = Job(js.jobId, System.nanoTime(), site = site, nTasks = n)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(je.jobId).foreach(_.end = System.nanoTime())
        }
    }

    keys.foreach { key =>
      val fn = graft.SparkEntry.queries(key)
      fn(spark, sf).count() // warmup (JIT, codegen), untimed
      jobs.synchronized(jobs.clear())
      spark.sparkContext.addSparkListener(listener)
      // driver-stack sampler: every 10 ms grab the main thread's stack
      // and count the deepest graft/spark frame — tells us where the
      // driver gap (time outside any Spark job) actually goes
      val mainThread = Thread.currentThread()
      val samples = mutable.HashMap[String, Int]().withDefaultValue(0)
      @volatile var sampling = true
      val sampler = new Thread(() => {
        while (sampling) {
          val st = mainThread.getStackTrace
          val frame = st.find { e =>
            val c = e.getClassName
            (c.startsWith("graft.") && !c.contains("KeyJobProfile")) ||
              c.startsWith("org.apache.spark.sql.catalyst") ||
              c.startsWith("org.apache.spark.sql.execution") ||
              c.startsWith("org.apache.avro") ||
              c.startsWith("org.apache.parquet") ||
              c.startsWith("java.net") || c.startsWith("sun.net")
          }.orElse(st.drop(2).headOption)
            .map(e => s"${e.getClassName}.${e.getMethodName}").getOrElse("?")
          samples.synchronized { samples(frame) += 1 }
          Thread.sleep(10)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      val rc0 = graft.table.iceberg.IcebergRestClient.requestCount.get()
      val rn0 = graft.table.iceberg.IcebergRestClient.requestNanos.get()
      val t0 = System.nanoTime()
      fn(spark, sf).count()
      val total = (System.nanoTime() - t0) / 1e9
      sampling = false
      sampler.join(200)
      val rc = graft.table.iceberg.IcebergRestClient.requestCount.get() - rc0
      val rn = (graft.table.iceberg.IcebergRestClient.requestNanos.get() - rn0) / 1e9
      if (rc > 0)
        println(f"  [rest] $rc requests, $rn%.3f s total, ${rn * 1000 / rc}%.2f ms/req")
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let late job-end events drain
      val snap = jobs.synchronized(jobs.values.toSeq)
      println(s"== $key total ${f"$total%.3f"} s, ${snap.size} spark jobs ==")
      val jobSum = snap.map(j =>
        if (j.end > 0) (j.end - j.start) / 1e9 else 0.0).sum
      snap.sortBy(j => -(j.end - j.start)).take(25).foreach { j =>
        val dur = if (j.end > 0) (j.end - j.start) / 1e9 else -1.0
        println(f"  job ${j.id}%4d ${dur}%7.3f s  tasks=${j.nTasks}%4d  ${j.site}")
      }
      println(f"  [sum-of-jobs] $jobSum%.3f s; [driver gap] ${total - jobSum}%.3f s (overlap makes this approximate)")
      val top = samples.synchronized(samples.toSeq).sortBy(-_._2).take(20)
      val nSamp = samples.synchronized(samples.values.sum)
      println(s"  driver-stack samples ($nSamp @ 10ms):")
      top.foreach { case (f, n) =>
        println(f"    ${n * 100.0 / nSamp}%5.1f%% ($n%4d)  $f")
      }
    }
    spark.stop()
  }
}
