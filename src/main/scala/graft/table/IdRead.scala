package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
import org.apache.spark.sql.execution.datasources.parquet.GraftParquetFileFormat

/** Driver-path parquet reads under an id-carrying requested schema.
  *
  * Scalar-only schemas use the stock parquet source (no pruning
  * hazard, maximal scan reuse). Schemas with NESTED types route
  * through GraftParquetFileFormat, which re-stamps `parquet.field.id`
  * onto the schema SchemaPruning rebuilds — so a leaf select under a
  * renamed struct column still resolves by id AND still reads a
  * pruned schema (the former PruneBarrier approach kept ids by
  * disabling nested pruning entirely; this keeps both). */
object IdRead {

  private def isNested(t: DataType): Boolean = t match {
    case _: StructType | _: ArrayType | _: MapType => true
    case _ => false
  }

  def hasNested(schema: StructType): Boolean =
    schema.fields.exists(f => isNested(f.dataType))

  /** Read `paths` under `schema` (id-stamped), id-safe through
    * nested-schema pruning. Id-resolution correctness rests on the
    * SESSION flag spark.sql.parquet.fieldId.read.enabled, stamped at
    * table load (GraftTable / IcebergTable) — a per-read option
    * cannot carry it because ParquetFileFormat rebuilds that
    * hadoopConf key from the session conf at execution time, and the
    * read is lazy (execution may happen long after this call). */
  def parquet(spark: SparkSession, schema: StructType,
      paths: Seq[String]): DataFrame = {
    val r = spark.read
    if (!hasNested(schema)) r.schema(schema).parquet(paths: _*)
    else r.format(GraftParquetFileFormat.Format)
      .option(GraftParquetFileFormat.IdSchemaOption, schema.json)
      .schema(schema).load(paths: _*)
  }

  /** Same read over files whose SIZES the manifest already carries:
    * skips the InMemoryFileIndex re-listing (and its bulkListLeafFiles
    * Spark job past 32 files) — the manifest IS the file index. Same
    * relation type and pushdown/pruning/`_metadata` behavior as
    * `parquet` above. */
  def parquetKnown(spark: SparkSession, schema: StructType,
      files: Seq[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.execution.datasources.GraftConnectorShim
    if (!hasNested(schema))
      GraftConnectorShim.parquetFromKnownFiles(spark, schema, files)
    else GraftConnectorShim.parquetFromKnownFiles(spark, schema, files,
      new GraftParquetFileFormat,
      Map(GraftParquetFileFormat.IdSchemaOption -> schema.json))
  }
}
