package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.GraftConnectorShim
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.table.{GraftTable, Meta}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 connector: GraftTables as first-class Spark sources —
  *
  *   spark.read.format("graft").load(root)
  *   spark.read.format("graft").option("snapshot", "3").load(root)
  *   spark.read.format("graft").option("branch", "dev").load(root)
  *
  * The ScanBuilder pushes filters and required columns: comparison
  * predicates prune data files against the manifest min/max stats
  * BEFORE planning (reference: pruning_statistics.rs — the same
  * metadata-first skip), then ride into Spark's vectorized parquet
  * reader for row-group pruning. File tasks are bin-packed toward
  * maxPartitionBytes so task count tracks data size, not file count.
  */
class GraftDataSource extends TableProvider with DataSourceRegister
    with CreatableRelationProvider {
  override def shortName(): String = "graft"

  private def root(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft source requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    // a write to a not-yet-created table resolves the provider before
    // createRelation runs — report an empty schema instead of failing
    if (Meta.exists(root(options))) Meta.load(root(options)).schema
    else StructType(Nil)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftSparkTable(properties.get("path"))

  /** Write path (V1 provider — Spark prefers it for `df.write` when
    * both interfaces are present): append/overwrite become table
    * snapshots; the table is created on first write. */
  override def createRelation(
      ctx: org.apache.spark.sql.SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): org.apache.spark.sql.sources.BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft sink requires a path"))
    val spark = data.sparkSession
    val t =
      if (Meta.exists(path)) GraftTable.load(spark, path)
      else GraftTable.create(spark, path, data.schema)
    mode match {
      case org.apache.spark.sql.SaveMode.Append => t.append(data)
      case org.apache.spark.sql.SaveMode.Overwrite => t.overwrite(data)
      case org.apache.spark.sql.SaveMode.ErrorIfExists =>
        if (t.meta.currentSnapshotId.isDefined)
          throw new IllegalStateException(s"graft table $path is not empty")
        t.append(data)
      case org.apache.spark.sql.SaveMode.Ignore =>
        if (t.meta.currentSnapshotId.isEmpty) t.append(data)
    }
    new org.apache.spark.sql.sources.BaseRelation {
      override def sqlContext: org.apache.spark.sql.SQLContext = ctx
      override def schema: StructType = t.meta.schema
    }
  }
}

class GraftSparkTable(root: String) extends Table with SupportsRead {
  private lazy val meta = Meta.load(root)

  override def name(): String = s"graft.`$root`"
  override def schema(): StructType =
    if (Meta.exists(root)) meta.schema else StructType(Nil)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root,
      Option(options.get("snapshot")).map(_.toLong),
      Option(options.get("branch")))
}

class GraftScanBuilder(root: String, snapshotId: Option[Long],
    branch: Option[String])
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private val table = Meta.load(root)
  private var pushed: Array[Filter] = Array.empty
  private var requiredSchema: StructType = table.schema

  /** Translate the pushable comparisons into manifest StatFilters;
    * everything is also returned as residual (pruning is a skip
    * optimization, never an exactness guarantee). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => toStatFilter(f).isDefined || parquetPushable(f))
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit = {
    // retain table-schema field order and types
    val names = required.fieldNames.toSet
    requiredSchema = StructType(table.schema.fields.filter(f => names.contains(f.name)))
  }

  private def parquetPushable(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
        _: LessThanOrEqual | _: In | _: IsNull | _: IsNotNull => true
    case And(l, r) => parquetPushable(l) && parquetPushable(r)
    case _ => false
  }

  private[spark] def toStatFilter(f: Filter): Option[(String, String, String)] = f match {
    case EqualTo(c, v: Any) => Some((c, "=", v.toString))
    case GreaterThan(c, v: Any) => Some((c, ">", v.toString))
    case GreaterThanOrEqual(c, v: Any) => Some((c, ">=", v.toString))
    case LessThan(c, v: Any) => Some((c, "<", v.toString))
    case LessThanOrEqual(c, v: Any) => Some((c, "<=", v.toString))
    case _ => None
  }

  override def build(): Scan =
    new GraftScan(root, table, snapshotId, branch, requiredSchema,
      pushed, pushed.flatMap(toStatFilter))
}

class GraftScan(root: String, table: Meta.TableMetadata,
    snapshotId: Option[Long], branch: Option[String],
    requiredSchema: StructType, pushedFilters: Array[Filter],
    statFilters: Array[(String, String, String)])
  extends Scan with Batch {

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan(root=$root, prunedBy=${statFilters.length} stat filters)"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val t = GraftTable.load(spark, root)
    val files = t.plannedFiles(
      statFilters.toSeq.map(s => t.StatFilter(s._1, s._2, s._3)),
      snapshotId, branch)
    val dataDir = java.nio.file.Paths.get(root, "data")
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    // bin-pack files into tasks toward maxPartitionBytes
    val bins = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Meta.DataFile]]()
    var cur = scala.collection.mutable.ArrayBuffer[Meta.DataFile]()
    var curBytes = 0L
    files.sortBy(-_.fileSizeBytes).foreach { f =>
      if (curBytes + f.fileSizeBytes > maxBytes && cur.nonEmpty) {
        bins += cur; cur = scala.collection.mutable.ArrayBuffer(); curBytes = 0L
      }
      cur += f; curBytes += f.fileSizeBytes
    }
    if (cur.nonEmpty) bins += cur
    bins.zipWithIndex.map { case (bin, i) =>
      GraftConnectorShim.filePartition(i, bin.toSeq.map { f =>
        val p = dataDir.resolve(f.path)
        GraftConnectorShim.partitionedFile(
          "file://" + p.toString, f.fileSizeBytes,
          java.nio.file.Files.getLastModifiedTime(p).toMillis)
      }): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftConnectorShim.parquetReaderFactory(
      SparkSession.active, table.schema, requiredSchema, pushedFilters)
}
