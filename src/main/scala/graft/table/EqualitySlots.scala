package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The slot-derivation core both dialects' equality→position delete
  * conversion shares (GraftTable.convertEqualityDeletes and
  * IcebergWrite.convertEqualityDeletes): every row an equality delete
  * hides is a key match in a data file with a STRICTLY SMALLER
  * sequence, so one join per key-column group — null-safe equality (a
  * null delete key hides null-keyed rows, the executor probe's
  * semantics) plus per-row sequence scoping — materializes exactly the
  * hidden (file_path, pos) slots. Callers differ only in how they list
  * files and type the key schema (graft metadata vs Iceberg manifests,
  * name- vs id-attached fields), which is exactly what the `groups`
  * parameter carries. */
object EqualitySlots {

  private def normC(c: Column): Column = regexp_replace(c, "^[a-z]+:/+", "/")

  /** One conversion group: the key schema its delete files share, the
    * delete files as (qualified path, sequence), and the candidate
    * data files as (qualified path, sequence). */
  case class Group(keySchema: StructType,
      keyFiles: Seq[(String, Long)], dataFiles: Seq[(String, Long)])

  /** The distinct (file_path, pos) slots hidden across all groups;
    * None when no group has an applicable data era. */
  def derive(spark: SparkSession, groups: Seq[Group]): Option[DataFrame] = {
    import spark.implicits._
    val slotDfs = groups.flatMap { g =>
      val maxSeq = g.keyFiles.map(_._2).max
      val appl = g.dataFiles.filter(_._2 < maxSeq)
      if (appl.isEmpty) None
      else {
        val eqCols = g.keySchema.fieldNames.toSeq
        val seqDf = appl.toDF("__qual", "__seq")
        val data = spark.read.schema(g.keySchema)
          .parquet(appl.map(_._1): _*)
          .withColumn("__file", col("_metadata.file_path"))
          .withColumn("__pos", col("_metadata.row_index"))
          .join(broadcast(seqDf), normC(col("__file")) === normC(col("__qual")))
        val keys = g.keyFiles.map { case (p, seqE) =>
          spark.read.schema(g.keySchema).parquet(p)
            .withColumn("__seqE", lit(seqE))
        }.reduce(_ unionByName _)
        val cond = eqCols.map(c => data(c) <=> keys(c)).reduce(_ && _) &&
          data("__seq") < keys("__seqE")
        Some(data.join(keys, cond, "left_semi")
          .select(col("__file").as("file_path"), col("__pos").as("pos")))
      }
    }
    if (slotDfs.isEmpty) None
    else Some(slotDfs.reduce(_ unionByName _).distinct())
  }
}
