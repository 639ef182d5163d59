package graft.tools
import org.apache.spark.sql.SparkSession
object Profile2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.ddMinhashDedup(spark, d).count()
      println(f"[p] dedup run$i ${(System.nanoTime()-t0)/1e9}%6.2f s ($n)")
      val t1 = System.nanoTime()
      val m = graft.ops.Dedup.ddMinhashPairs(spark, d).count()
      println(f"[p] pairs run$i ${(System.nanoTime()-t1)/1e9}%6.2f s ($m)")
    }
    spark.stop()
  }
}
