package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Empirical probe: Spark 4.1 parquet reader behavior for widened
  * reads (int32->long, float->double, decimal precision growth) under
  * field-id resolution — the capability the interop type-promotion
  * path depends on. Not part of the library surface. */
object WidenProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled","true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled","true")
    def meta(id: Long) = new MetadataBuilder().putLong("parquet.field.id", id).build()
    val df = Seq((1, 1.5f, BigDecimal("123.45")), (2, 2.5f, BigDecimal("67.89")))
      .toDF("a","b","c")
      .select($"a".cast("int").as("a", meta(1)), $"b".as("b", meta(2)),
        $"c".cast(DecimalType(5,2)).as("c", meta(3)))
    df.write.mode("overwrite").parquet("/tmp/widen/t")
    val rs = StructType(Seq(
      StructField("a2", LongType, true, meta(1)),
      StructField("b2", DoubleType, true, meta(2)),
      StructField("c2", DecimalType(10,2), true, meta(3))))
    try {
      val r = spark.read.schema(rs).parquet("/tmp/widen/t")
      println("ROWS: " + r.collect().mkString(","))
      println("SUM: " + r.agg(org.apache.spark.sql.functions.sum($"a2")).collect()(0))
    } catch { case e: Throwable => println("ID FAILED: " + e) }
    val rs2 = StructType(Seq(StructField("a", LongType),
      StructField("b", DoubleType), StructField("c", DecimalType(10,2))))
    try {
      println("NAME-BASED: " + spark.read.schema(rs2).parquet("/tmp/widen/t").collect().mkString(","))
    } catch { case e: Throwable => println("NAME FAILED: " + e) }
    spark.stop()
  }
}
