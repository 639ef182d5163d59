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

  // graft and real Iceberg share the metadata/vN.metadata.json +
  // version-hint convention, so `Meta.exists` is true for BOTH; the
  // dialect is sniffed STRUCTURALLY (snake_case vs the spec's
  // kebab-case keys) — a graft table with corrupt metadata throws its
  // real parse error instead of silently rerouting to the binary
  // real-format reader. Same routing as GraftTableCatalog.loadTable.
  private def isGraftTable(r: String): Boolean =
    Meta.exists(r) && Meta.isGraftDialect(r)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val r = root(options)
    // a write to a not-yet-created table resolves the provider before
    // createRelation runs — report an empty schema instead of failing
    if (isGraftTable(r)) Meta.load(r).schema
    // a path holding REAL Iceberg metadata serves as an interop table
    // (batch + incremental streaming), same routing as the catalog
    else if (graft.table.iceberg.IcebergTable.exists(r))
      graft.table.iceberg.IcebergMetadata.load(r).schema.toSpark
    else StructType(Nil)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val p = properties.get("path")
    if (!isGraftTable(p) && graft.table.iceberg.IcebergTable.exists(p))
      new IcebergSparkTable(p)
    else new GraftSparkTable(p)
  }

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
      if (isGraftTable(path)) GraftTable.load(spark, path)
      else if (graft.table.iceberg.IcebergTable.exists(path))
        throw new IllegalStateException(
          s"$path holds a real-format Iceberg table; the graft writer " +
            "cannot commit to it — use IcebergWrite for foreign tables")
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

class GraftSparkTable(root: String,
    pinnedSnapshot: Option[Long] = None) extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  /** SQL UPDATE / MERGE INTO (and DELETEs SupportsDelete can't take).
    * Default: group-based copy-on-write — the operation's scan records
    * the candidate files it planned; the replacement write commits new
    * files and removes exactly those in one snapshot. Rows are never
    * filtered inside the scan (the condition lives in the replacement
    * projection), so non-matching rows of candidate files are copied
    * forward intact.
    *
    * With `write.update.mode` / `write.merge.mode` /
    * `write.delete.mode` = merge-on-read (Iceberg's table properties)
    * the operation runs as a DELTA write instead (SupportsDelta):
    * matched rows position-delete their old slots and only changed
    * rows are written — write cost O(changed rows), no candidate-file
    * rewrite, which is the right default for point updates at 100 TB. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    () => {
      import org.apache.spark.sql.connector.write.RowLevelOperation.Command
      val key = info.command() match {
        case Command.DELETE => "write.delete.mode"
        case Command.UPDATE => "write.update.mode"
        case _ => "write.merge.mode"
      }
      val props = if (Meta.exists(root)) Meta.load(root).properties
        else Map.empty[String, String]
      if (props.get(key).contains("merge-on-read"))
        new GraftDeltaOperation(root, info.command())
      else new GraftRowLevelOperation(root, info.command())
    }

  /** Row-address metadata columns, the delta row id (Iceberg exposes
    * the same pair as _file/_pos). Emitted by the scan on request via
    * single-file partitions + raw stream-index counting. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(GraftSparkTable.FileMetaCol, GraftSparkTable.PosMetaCol)
  private lazy val meta = Meta.load(root)

  /** SQL `DELETE FROM <catalog table> WHERE ...`: the analyzer pushes
    * the condition as data-source filters; every translatable filter
    * routes to GraftTable's copy-on-write delete (which keeps
    * NULL-predicate rows per three-valued SQL semantics and prunes
    * rewrite candidates by manifest stats). Untranslatable conditions
    * make canDeleteWhere return false and the statement fails fast —
    * better than a silent wrong delete. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftSparkTable.filterColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    import org.apache.spark.sql.functions.lit
    val spark = SparkSession.active
    val cond = filters.flatMap(GraftSparkTable.filterColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    val touched = filters.flatMap(statFilterOf).toSeq
    val t = GraftTable.load(spark, root)
    // write.delete.mode=merge-on-read (Iceberg's table property):
    // point deletes commit a position-delete FILE instead of
    // rewriting every candidate data file — at 100 TB, CoW rewrite is
    // the wrong default for small deletes, and this is how a user
    // opts out per table (reference: table properties driving
    // operation.rs delete modes)
    if (t.meta.properties.get("write.delete.mode").contains("merge-on-read"))
      t.deleteWhereMoRPositional(cond)
    else t.delete(cond, touched.map(f =>
      t.StatFilter(f._1, f._2, f._3)))
  }

  private def statFilterOf(f: Filter): Option[(String, String, String)] =
    GraftSparkTable.statFilterOf(f)

  override def name(): String = s"graft.`$root`"
  override def schema(): StructType =
    if (!Meta.exists(root)) StructType(Nil)
    else pinnedSnapshot.flatMap(meta.snapshot)
      // a time-travel pin reads with the SNAPSHOT's schema: after
      // DROP COLUMN the old snapshot must still show the column
      .flatMap(sn => meta.schemas.get(sn.schemaId))
      .getOrElse(meta.schema)

  /** BATCH_WRITE only once the table exists — creation-on-first-write
    * goes through the V1 provider, which knows the incoming schema. */
  override def capabilities(): java.util.Set[TableCapability] =
    if (Meta.exists(root))
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.OVERWRITE_BY_FILTER,
        TableCapability.OVERWRITE_DYNAMIC,
        TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)
    else java.util.EnumSet.of(TableCapability.BATCH_READ)

  /** The table's partition transforms, in V2 terms (analyzer metadata;
    * the scan's KeyGroupedPartitioning is what actually drives SPJ). */
  override def partitioning(): Array[Transform] =
    if (!Meta.exists(root)) Array.empty
    else meta.spec.map(RowTransform.toV2).toArray

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    import scala.jdk.CollectionConverters._
    // incremental batch read: only rows appended in
    // (start-snapshot-id, end-snapshot-id ?? current] — IO scales
    // with the delta, not the table (appends-only ranges enforced)
    val endSnapshot = Option(options.get("end-snapshot-id")).map(_.toLong)
    new GraftScanBuilder(root,
      pinnedSnapshot.orElse(Option(options.get("snapshot")).map(_.toLong))
        .orElse(endSnapshot),
      Option(options.get("branch")),
      streamOptions = options.asCaseSensitiveMap().asScala.toMap,
      startSnapshot = Option(options.get("start-snapshot-id")).map(_.toLong))
  }

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftWriteBuilder(root, info.schema(), info.queryId(),
      Option(info.options.get("branch")).getOrElse("main"))
}

object GraftSparkTable {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}

  val FileColName = "_file"
  val PosColName = "_pos"

  // literals rendered through the SAME canonical form the manifest
  // stats use — naive toString on temporal values would make the
  // rewrite-candidate pruning unsound (matching rows silently kept)
  private[spark] def statFilterOf(f: Filter): Option[(String, String, String)] = {
    import GraftScanBuilder.canonicalLiteral
    f match {
      case EqualTo(a, v) => canonicalLiteral(v).map((a, "=", _))
      // <=> with a non-null literal selects exactly = v (the shape a
      // static `PARTITION (col='x')` overwrite arrives in)
      case org.apache.spark.sql.sources.EqualNullSafe(a, v) if v != null =>
        canonicalLiteral(v).map((a, "=", _))
      case GreaterThan(a, v) => canonicalLiteral(v).map((a, ">", _))
      case GreaterThanOrEqual(a, v) => canonicalLiteral(v).map((a, ">=", _))
      case LessThan(a, v) => canonicalLiteral(v).map((a, "<", _))
      case LessThanOrEqual(a, v) => canonicalLiteral(v).map((a, "<=", _))
      case _ => None
    }
  }

  val FileMetaCol: org.apache.spark.sql.connector.catalog.MetadataColumn =
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = FileColName
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = false
      override def comment(): String = "qualified URI of the row's data file"
    }

  val PosMetaCol: org.apache.spark.sql.connector.catalog.MetadataColumn =
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = PosColName
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType
      override def isNullable: Boolean = false
      override def comment(): String = "row position within the data file"
    }

  /** sources.Filter -> Column, for the V2 SupportsDelete path. Only
    * filters with exact Column equivalents translate; anything else
    * returns None and the DELETE is rejected up front. */
  private[spark] def filterColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) =>
      for { x <- filterColumn(l); y <- filterColumn(r) } yield x && y
    case Or(l, r) =>
      for { x <- filterColumn(l); y <- filterColumn(r) } yield x || y
    case Not(c) => filterColumn(c).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

/** One SQL row-level statement: scan side records the replaced group,
  * write side swaps it atomically (copy-on-write ReplaceData). */
class GraftRowLevelOperation(root: String,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
  extends org.apache.spark.sql.connector.write.RowLevelOperation {

  /** Union across (re)plannings: the op's scans DECLINE runtime
    * filtering (filterAttributes), so every planning — supportsColumnar,
    * AQE, the group-filter subquery's own scan — sees the same
    * statically-pruned candidate set, and the union equals exactly the
    * files whose rows feed the replacement write. */
  private[spark] val scanned =
    new java.util.concurrent.atomic.AtomicReference[Set[String]](Set.empty)

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, None, None, Some(this))

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new GraftReplaceWrite(root, info.schema(), () => scanned.get().toSeq)
    }
}

/** Delta row-level operation (SupportsDelta): merge-on-read UPDATE /
  * MERGE / DELETE. The scan emits the row address (_file, _pos) per
  * candidate row; the write position-deletes matched slots and
  * appends only the changed rows — one snapshot, no candidate-file
  * rewrite (reference: operation.rs delete-file commits; Iceberg's
  * Spark delta writes use the same row-id pair). */
class GraftDeltaOperation(root: String,
    cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
  extends org.apache.spark.sql.connector.write.RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd

  override def rowId(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(
      org.apache.spark.sql.connector.expressions.Expressions.column(
        GraftSparkTable.FileColName),
      org.apache.spark.sql.connector.expressions.Expressions.column(
        GraftSparkTable.PosColName))

  // the writer implements update() natively (delete old slot + write
  // the new row in the same task)
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  // no capture: nothing is replaced wholesale, so runtime filtering
  // may freely narrow the candidate FILES (positions are file-local)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, None, None, None)

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        new org.apache.spark.sql.connector.write.DeltaWrite {
          override def toBatch(): org.apache.spark.sql.connector.write.DeltaBatchWrite =
            new GraftDeltaBatchWrite(root, info.schema())
        }
    }
}

/** Executors stage new data files (partition-routed like every graft
  * write) and position-delete files; the driver commit lands both in
  * one snapshot via commitStagedDelta. */
class GraftDeltaBatchWrite(root: String, rowSchema: StructType)
  extends org.apache.spark.sql.connector.write.DeltaBatchWrite {

  private val suffix = java.util.UUID.randomUUID().toString.take(8)
  private val stagingData = graft.table.TableIO.path(root, s"stage-delta-$suffix")
  private val stagingDel = graft.table.TableIO.path(root, s"stage-deltadel-$suffix")

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory = {
    graft.table.TableIO.mkdirs(stagingData)
    graft.table.TableIO.mkdirs(stagingDel)
    val spark = SparkSession.active
    val spec = if (Meta.exists(root)) Meta.load(root).spec else Seq.empty
    GraftDeltaWriterFactory(
      stagingData.toString, stagingDel.toString,
      GraftConnectorShim.prepareParquetWriteConf(spark,
        GraftWriteSchemas.withTableFieldIds(root, rowSchema),
        GraftWriteSchemas.bloomOptions(root)),
      GraftConnectorShim.prepareParquetWriteConf(spark,
        GraftDeltaWriterFactory.DeleteSchema),
      // a delete-only delta (SQL DELETE) carries an EMPTY row schema —
      // no rows are written, so no transforms must compile against it
      if (rowSchema.isEmpty) Seq.empty
      else RowTransform.forSpec(spec, rowSchema))
  }

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    GraftTable.load(SparkSession.active, root)
      .commitStagedDelta(stagingData, stagingDel)

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    graft.table.TableIO.delete(stagingData, recursive = true)
    graft.table.TableIO.delete(stagingDel, recursive = true)
  }
}

object GraftDeltaWriterFactory {
  /** Iceberg's position-delete file schema, with the spec's RESERVED
    * field ids in the metadata so the footers carry them
    * (2147483546 / 2147483545 — id-based readers resolve delete
    * files without a name mapping). */
  val DeleteSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("file_path",
      org.apache.spark.sql.types.StringType, nullable = false,
      metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", 2147483546L).build()),
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.LongType, nullable = false,
      metadata = new org.apache.spark.sql.types.MetadataBuilder()
        .putLong("parquet.field.id", 2147483545L).build())))
}

case class GraftDeltaWriterFactory(
    dataStaging: String, delStaging: String,
    dataConf: org.apache.spark.util.SerializableConfiguration,
    delConf: org.apache.spark.util.SerializableConfiguration,
    transforms: Seq[RowTransform])
  extends org.apache.spark.sql.connector.write.DeltaWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[org.apache.spark.sql.catalyst.InternalRow] =
    new org.apache.spark.sql.connector.write.DeltaWriter[org.apache.spark.sql.catalyst.InternalRow] {
      // both writers open lazily: a delete-only task writes no data
      // parquet, an insert-only task writes no delete parquet
      private var insertWriter
          : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] = _
      private var delWriter
          : org.apache.spark.sql.execution.datasources.OutputWriter = _
      private val delRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)

      override def insert(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
        if (insertWriter == null)
          insertWriter = GraftWriterFactory(dataStaging, dataConf, transforms)
            .createWriter(partitionId, taskId)
        insertWriter.write(row)
      }

      override def delete(meta: org.apache.spark.sql.catalyst.InternalRow,
          id: org.apache.spark.sql.catalyst.InternalRow): Unit = {
        if (delWriter == null)
          delWriter = GraftConnectorShim.newParquetTaskWriter(
            s"$delStaging/del-$partitionId-$taskId.parquet",
            delConf.value, partitionId, taskId)
        // id fields follow rowId() order: (_file, _pos)
        delRow.update(0, id.getUTF8String(0))
        delRow.update(1, id.getLong(1))
        delWriter.write(delRow)
      }

      override def update(meta: org.apache.spark.sql.catalyst.InternalRow,
          id: org.apache.spark.sql.catalyst.InternalRow,
          row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
        delete(meta, id)
        insert(row)
      }

      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
        if (delWriter != null) delWriter.close()
        if (insertWriter != null) insertWriter.commit()
        else GraftCommitMessage("delta: deletes only", 0L)
      }

      override def abort(): Unit = {
        if (delWriter != null) delWriter.close()
        if (insertWriter != null) insertWriter.abort()
      }

      override def close(): Unit = ()
    }
}

/** ReplaceData write: same executor-side partition routing as the
  * plain V2 write, but the commit removes the scanned group. */
class GraftReplaceWrite(root: String, schema: StructType,
    replaced: () => Seq[String])
  extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    GraftWriteLayout.distribution(root)

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    GraftWriteLayout.ordering(root)

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new GraftReplaceBatchWrite(root, schema, replaced,
      GraftWriteLayout.presorted(root))
}

class GraftReplaceBatchWrite(root: String, schema: StructType,
    replaced: () => Seq[String], presorted: Boolean = false)
  extends org.apache.spark.sql.connector.write.BatchWrite {
  private val staging = graft.table.TableIO.path(
    root, s"stage-rlo-${java.util.UUID.randomUUID().toString.take(8)}")

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    graft.table.TableIO.mkdirs(staging)
    val spec = if (Meta.exists(root)) Meta.load(root).spec else Seq.empty
    ReplaceRowAdapterFactory(
      GraftWriterFactory(staging.toString,
        GraftConnectorShim.prepareParquetWriteConf(SparkSession.active,
          GraftWriteSchemas.withTableFieldIds(root, schema),
          GraftWriteSchemas.bloomOptions(root)),
        RowTransform.forSpec(spec, schema)),
      schema)
  }

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    GraftTable.load(SparkSession.active, root)
      .commitStagedReplace(staging, replaced(), presorted = presorted)

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    graft.table.TableIO.delete(staging, recursive = true)
}

/** ReplaceData feeds writers `__row_operation +: dataColumns` when the
  * operation declares no metadata attributes (Spark applies a
  * projection only on the metadata path) — this adapter strips the
  * leading operation column so the parquet writers see exactly the
  * table schema. */
case class ReplaceRowAdapterFactory(
    inner: org.apache.spark.sql.connector.write.DataWriterFactory,
    dataSchema: StructType)
  extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
      private val w = inner.createWriter(partitionId, taskId)
      private lazy val proj = new org.apache.spark.sql.catalyst.ProjectingInternalRow(
        dataSchema, (1 to dataSchema.length).toIndexedSeq)
      override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit =
        if (row.numFields == dataSchema.length) w.write(row)
        else { proj.project(row); w.write(proj) }
      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage =
        w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
}

object GraftWriteSchemas {
  /** The query's output schema usually arrives WITHOUT the table's
    * field-id metadata — graft parquet footers must carry the ids or
    * id-matched reads break, so re-attach them by name before the
    * write conf is prepared. */
  def withTableFieldIds(root: String, schema: StructType): StructType = {
    if (!Meta.exists(root)) return schema
    val t = Meta.load(root).schema
    if (!Meta.hasFieldIds(t)) return schema
    StructType(schema.fields.map(f =>
      t.fields.find(_.name == f.name)
        .map(tf => f.copy(metadata = tf.metadata)).getOrElse(f)))
  }

  /** Bloom-filter write options for the V2 task writers, from the
    * table's properties (no-op before the table exists). */
  def bloomOptions(root: String): Map[String, String] =
    if (!Meta.exists(root)) Map.empty
    else GraftTable.bloomWriteOptions(Meta.load(root))
}

object GraftScanBuilder {
  /** Render a filter literal in the SAME canonical string form
    * FooterStats writes into the manifest — naive toString is unsound
    * for temporal values (java.sql.Timestamp appends '.0', Instant
    * uses 'T...Z'), and a lexicographic mismatch silently drops files
    * whose stat boundary equals the literal. Types with no canonical
    * form return None: the filter still runs, it just can't prune. */
  private[spark] def canonicalLiteral(v: Any): Option[String] = {
    def micros(i: java.time.Instant): Long =
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    v match {
      case null => None
      case _: java.math.BigDecimal | _: BigDecimal => None // stats skip decimals
      case n: Number => Some(n.toString)
      case s: String => Some(s)
      case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
      case d: java.sql.Date => Some(d.toLocalDate.toString)
      case d: java.time.LocalDate => Some(d.toString)
      case t: java.sql.Timestamp =>
        Some(graft.table.FooterStats.canonicalTimestampMicros(micros(t.toInstant)))
      case i: java.time.Instant =>
        Some(graft.table.FooterStats.canonicalTimestampMicros(micros(i)))
      case _ => None
    }
  }
}

class GraftScanBuilder(root: String, snapshotId: Option[Long],
    branch: Option[String],
    capture: Option[GraftRowLevelOperation] = None,
    streamOptions: Map[String, String] = Map.empty,
    startSnapshot: Option[Long] = None)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {

  // connector reads resolve columns by field id. The vectorized path
  // takes the flag from GraftConnectorShim's per-relation hadoop conf,
  // but the non-vectorized binding (nested types) consults SQLConf.get
  // — the session conf — so the READ flag must be on session-wide (see
  // the GraftTable constructor note; the WRITE flag stays scoped).
  SparkSession.active.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

  private val table = Meta.load(root)
  private var pushed: Array[Filter] = Array.empty
  private def snapshotSchema: StructType =
    snapshotId.orElse(branch.flatMap(table.refs.get))
      .flatMap(table.snapshot)
      .flatMap(sn => table.schemas.get(sn.schemaId))
      .getOrElse(table.schema)
  private var requiredSchema: StructType = snapshotSchema
  private var pushedAgg: Option[MetadataAggSpec] = None

  /** Ungrouped, unfiltered COUNT(*)/MIN/MAX answer straight from the
    * manifest — zero data IO (the metadata-only query path the
    * reference gets from manifest stats). Declined when filters,
    * grouping, merge-on-read deletes, or missing stats make the
    * manifest answer unsound. */
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.NamedReference
    val snapId = branch.flatMap(table.refs.get).orElse(snapshotId)
    // an incremental range answers over the delta, not the live set —
    // the manifest totals would be wrong
    if (startSnapshot.isDefined) return false
    if (pushed.nonEmpty || agg.groupByExpressions().nonEmpty) return false
    if (table.liveDeleteFiles(snapId).nonEmpty) return false
    val files = table.liveFiles(snapId)
    if (files.isEmpty) return false

    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames().length == 1 =>
          Some(r.fieldNames()(0))
        case _ => None
      }
    val resolved = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(MetadataAgg("count", ""))
      case m: Min => colOf(m.column()).filter(statsComplete(files, _))
        .map(MetadataAgg("min", _))
      case m: Max => colOf(m.column()).filter(statsComplete(files, _))
        .map(MetadataAgg("max", _))
      case _ => None
    }
    if (resolved.exists(_.isEmpty)) return false
    pushedAgg = Some(MetadataAggSpec(resolved.flatten, snapId))
    true
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    pushAggregation(agg)

  private def statsComplete(files: Seq[Meta.DataFile], c: String): Boolean = {
    import org.apache.spark.sql.types._
    if (table.statsUnprunable.contains(c)) return false
    val simpleTyped = table.schema.fields.find(_.name == c).exists(_.dataType match {
      case IntegerType | LongType | ShortType | DoubleType | FloatType |
          StringType => true
      case _ => false
    })
    simpleTyped && files.forall(f => f.stats.get(c).exists(s =>
      s.min.nonEmpty && s.max.nonEmpty && s.nullCount == 0))
  }

  /** Translate the pushable comparisons into manifest StatFilters;
    * everything is also returned as residual (pruning is a skip
    * optimization, never an exactness guarantee). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f => toStatFilter(f).isDefined || parquetPushable(f))
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit = {
    // retain field order and types of the SNAPSHOT schema, not the
    // current one — a time-travel/branch scan may select a column the
    // live schema has since dropped
    val names = required.fieldNames.toSet
    requiredSchema = StructType(snapshotSchema.fields.filter(f => names.contains(f.name)))
    // _file/_pos metadata columns (the delta row id) are not data
    // columns: the reader APPENDS them per row, so track them apart
    rowIdCols = required.fields.filter(f =>
      f.name == GraftSparkTable.FileColName ||
        f.name == GraftSparkTable.PosColName).toSeq
  }

  private var rowIdCols: Seq[org.apache.spark.sql.types.StructField] = Seq.empty

  private def parquetPushable(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
        _: LessThanOrEqual | _: In | _: IsNull | _: IsNotNull => true
    case And(l, r) => parquetPushable(l) && parquetPushable(r)
    case _ => false
  }

  private[spark] def toStatFilter(f: Filter): Option[(String, String, String)] = f match {
    case EqualTo(c, v: Any) => canonicalLiteral(v).map((c, "=", _))
    case GreaterThan(c, v: Any) => canonicalLiteral(v).map((c, ">", _))
    case GreaterThanOrEqual(c, v: Any) => canonicalLiteral(v).map((c, ">=", _))
    case LessThan(c, v: Any) => canonicalLiteral(v).map((c, "<", _))
    case LessThanOrEqual(c, v: Any) => canonicalLiteral(v).map((c, "<=", _))
    case _ => None
  }

  private def canonicalLiteral(v: Any): Option[String] =
    GraftScanBuilder.canonicalLiteral(v)

  override def build(): Scan = {
    pushedAgg match {
      case Some(spec) => return MetadataAggScan.build(table, spec)
      case None =>
    }
    // merge-on-read: if equality-delete files are live, their key
    // columns must be read even when pruned away (Spark projects the
    // extra columns back out above the scan)
    val deletes = table.liveDeleteFiles(
      branch.flatMap(table.refs.get).orElse(snapshotId))
    val eqCols = deletes.flatMap(_.equalityColumns).distinct
    val withKeys =
      if (eqCols.forall(requiredSchema.fieldNames.contains)) requiredSchema
      else StructType(snapshotSchema.fields.filter(f =>
        requiredSchema.fieldNames.contains(f.name) || eqCols.contains(f.name)))
    new GraftScan(root, table, snapshotId, branch, withKeys,
      pushed, pushed.flatMap(toStatFilter), capture, streamOptions,
      rowIdCols, startSnapshot)
  }
}

class GraftScan(root: String, table: Meta.TableMetadata,
    snapshotId: Option[Long], branch: Option[String],
    requiredSchema: StructType, pushedFilters: Array[Filter],
    statFilters: Array[(String, String, String)],
    capture: Option[GraftRowLevelOperation] = None,
    streamOptions: Map[String, String] = Map.empty,
    rowIdCols: Seq[org.apache.spark.sql.types.StructField] = Seq.empty,
    startSnapshot: Option[Long] = None)
  extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  // ---- scan planning metrics (Spark UI SQL tab) ----------------------
  // At 100 TB the question "did pruning work" must be answerable from
  // the UI, not a debugger: how many live files the snapshot had, how
  // many survived stat/partition pruning, the bytes actually planned,
  // and how many delete files the scan applies.
  import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}

  override def supportedCustomMetrics(): Array[CustomMetric] =
    GraftScanMetrics.all

  @volatile private var planningMetrics: Array[CustomTaskMetric] =
    Array.empty

  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    planningMetrics

  private def recordPlanningMetrics(planned: Seq[Meta.DataFile]): Unit = {
    val live = table.liveFiles(snapId).size
    planningMetrics = Array(
      GraftScanMetrics.task("liveDataFiles", live),
      GraftScanMetrics.task("plannedDataFiles", planned.size),
      GraftScanMetrics.task("prunedDataFiles",
        math.max(0, live - planned.size)),
      GraftScanMetrics.task("plannedBytes",
        planned.map(_.fileSizeBytes).sum),
      GraftScanMetrics.task("deleteFilesApplied", deletesWithSeq.size))
  }

  /** Manifest-derived statistics (reference:
    * datafusion_iceberg/src/statistics.rs reports the same totals to
    * its planner): sizeInBytes/rowCount from the PRUNED file list, so
    * Spark sizes joins from what will actually be read — a graft
    * relation under the broadcast threshold gets broadcast instead of
    * shuffled, which is the difference that matters at 100 TB. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val files = plannedDataFiles(SparkSession.active)
    val bytes = files.map(_.fileSizeBytes).sum
    val rows = files.map(_.recordCount).filter(_ >= 0).sum
    // analyze()-persisted NDV (plus per-file null counts when every
    // planned file carries the column's stats) as V2 column stats —
    // the CBO's join-reorder inputs. NDV is table-level: after
    // pruning it's an upper bound, which is the safe direction.
    val colStats = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    requiredSchema.fieldNames.foreach { c =>
      val ndv = table.properties.get(s"${GraftTable.NdvProp}$c").map(_.toLong)
      val nulls =
        if (files.nonEmpty && files.forall(_.stats.contains(c)))
          Some(files.map(_.stats(c).nullCount).sum)
        else None
      if (ndv.isDefined || nulls.isDefined)
        colStats.put(
          org.apache.spark.sql.connector.expressions.Expressions.column(c),
          new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
            override def distinctCount(): java.util.OptionalLong =
              ndv.map(java.util.OptionalLong.of)
                .getOrElse(java.util.OptionalLong.empty())
            override def nullCount(): java.util.OptionalLong =
              nulls.map(java.util.OptionalLong.of)
                .getOrElse(java.util.OptionalLong.empty())
          })
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
      override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colStats
    }
  }

  /** Identity partition columns whose source survives into the scan
    * output — the storage-partitioned-join clustering. */
  private def identityPartCols: Seq[String] =
    table.spec.filter(_.transform == "identity").map(_.sourceColumn)
      .filter(requiredSchema.fieldNames.contains)

  private def snapId: Option[Long] =
    branch.flatMap(table.refs.get).orElse(snapshotId)

  /** Live equality deletes with sequence numbers: a delete applies
    * only to data files with a SMALLER data sequence (Iceberg v2). */
  private lazy val deletesWithSeq: Seq[(Meta.DataFile, Long)] =
    table.liveDeleteFilesWithSeq(snapId)

  private lazy val seqByPath: Map[String, Long] =
    table.liveFilesWithSeq(snapId).map { case (f, q) => f.path -> q }.toMap

  /** The applicable-delete signature of a data file: (equality delete
    * paths, position delete paths) that scope to it. Partition bins
    * never mix signatures, so the reader applies one uniform delete
    * set per task; files under position deletes get single-file bins
    * (the reader tracks row indexes per file). */
  private def deleteSig(f: Meta.DataFile): (Seq[String], Seq[String]) = {
    // incremental files rewritten away later in range aren't in the
    // live map; their carried dataSequence keeps delete scoping sound
    val seq = seqByPath.getOrElse(f.path,
      f.dataSequence.getOrElse(Long.MinValue))
    (deletesWithSeq.filter { case (d, ds) =>
      d.content == 2 && ds > seq && eqDeleteMayApply(d, f) }
      .map(_._1.path).sorted,
      deletesWithSeq.filter { case (d, ds) => d.content == 1 && ds >= seq }
        .map(_._1.path).sorted)
  }

  /** Delete-manifest pruning (Iceberg's delete-file bounds check): an
    * equality delete whose recorded key range is DISJOINT from the
    * data file's range on any equality column cannot delete a row in
    * that file — the file's task never ships or reads that delete. A
    * delete carrying null keys always applies (nulls live outside the
    * min/max); missing stats on either side apply conservatively. */
  private def eqDeleteMayApply(d: Meta.DataFile, f: Meta.DataFile): Boolean =
    d.equalityColumns.forall { c =>
      (d.stats.get(c), f.stats.get(c),
          table.schema.fields.find(_.name == c)) match {
        case (Some(ds), Some(fs), Some(field)) if ds.nullCount == 0 &&
            ds.min.nonEmpty && ds.max.nonEmpty &&
            fs.min.nonEmpty && fs.max.nonEmpty =>
          val cmp = Meta.comparator(field.dataType)
          cmp(ds.min, fs.max) <= 0 && cmp(fs.min, ds.max) <= 0
        case _ => true
      }
    }

  /** After partition-spec evolution, files from older eras don't carry
    * the default spec's values — key-grouped claims would be unsound
    * until a rewrite migrates them, so SPJ requires a uniform spec. */
  private lazy val uniformSpec: Boolean =
    table.liveFiles(snapId).forall(_.specId == table.defaultSpecId)

  // SPJ is declined while equality deletes are outstanding: the keyed
  // single-partition-per-value layout cannot also honor per-file
  // delete scoping bins
  /** Any live imported (name-mapped) file forces the plain planning
    * path: keyed SPJ/bucket partitions assume one uniform reader
    * factory, and mapped files need their own renamed-schema one.
    * Metadata-only: commit() stamps `added-files-imported` on every
    * snapshot whose files carry a name mapping (incl. expire-squashed
    * bases), so the chain summaries answer this without resolving any
    * (possibly spilled) manifest. Conservative if imports were later
    * compacted away — that only declines SPJ, never corrupts it. */
  private lazy val anyMapped: Boolean =
    table.chainSnapshots(snapId)
      .exists(_.summary.contains("added-files-imported"))

  private def spjEligible: Boolean =
    table.spec.nonEmpty && table.spec.forall(_.transform == "identity") &&
      identityPartCols.size == table.spec.size && deletesWithSeq.isEmpty &&
      uniformSpec && !anyMapped

  /** Single bucket[n] partition spec whose source column survives into
    * the output — the bucket-SPJ clustering (needs the catalog's
    * FunctionCatalog to resolve `bucket` on both join sides). */
  private def bucketSpec: Option[(Meta.PartitionField, Int)] = table.spec match {
    case Seq(pf) if pf.transform.startsWith("bucket[") &&
        requiredSchema.fieldNames.contains(pf.sourceColumn) &&
        deletesWithSeq.isEmpty && uniformSpec && !anyMapped =>
      Some((pf, pf.transform.stripPrefix("bucket[").stripSuffix("]").toInt))
    case _ => None
  }

  /** Report key-grouped partitioning over identity partition columns:
    * two tables partitioned the same way then join WITHOUT a shuffle
    * (storage-partitioned join; needs
    * spark.sql.sources.v2.bucketing.enabled). */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    if (spjEligible) {
      val parts = planInputPartitions()
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        identityPartCols.map(c =>
          org.apache.spark.sql.connector.expressions.Expressions.identity(c)
            .asInstanceOf[org.apache.spark.sql.connector.expressions.Expression]).toArray,
        parts.length)
    } else bucketSpec match {
      case Some((pf, n)) =>
        val parts = planInputPartitions()
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .bucket(n, pf.sourceColumn)
            .asInstanceOf[org.apache.spark.sql.connector.expressions.Expression]),
          parts.length)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }
  }

  override def readSchema(): StructType =
    StructType(requiredSchema.fields ++ rowIdCols)
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan(root=$root, prunedBy=${statFilters.length} stat filters)"

  // ---- runtime filtering (dynamic file pruning from join keys) -------

  /** Columns a runtime filter (e.g. the build side of a join) may
    * arrive on — restricted to the scan's own output, which is what
    * Spark resolves the references against. */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // a row-level operation's replaced group must equal EXACTLY the
    // files every one of its scans planned; Spark also routes the
    // runtime group-filter subquery through the operation's builder,
    // so runtime narrowing of just the main scan would desynchronize
    // the sets (files removed whose rows were never rewritten). The
    // op's scans therefore decline runtime filtering: every scan
    // plans the same statically-pruned set.
    if (capture.isDefined) Array.empty
    else requiredSchema.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  @volatile private var runtimeStatFilters: Seq[(String, String, String)] = Seq.empty

  /** Runtime IN-filters become min/max envelopes over the manifest:
    * files outside [min(values), max(values)] are dropped before any
    * task launches — dynamic partition/file pruning. Only numeric and
    * string keys translate: other types (e.g. timestamps) render
    * differently from the canonical stat strings, and pruning must
    * stay sound, so they are ignored rather than risked. */
  override def filter(filters: Array[Filter]): Unit = {
    if (capture.isDefined) return // see filterAttributes
    def safe(v: Any): Boolean = v.isInstanceOf[Number] || v.isInstanceOf[String]
    runtimeStatFilters = filters.toSeq.flatMap {
      case In(c, values) if values.nonEmpty &&
          values.forall(v => v != null && safe(v)) =>
        val strs = values.map(_.toString)
        val cmp: (String, String) => Int =
          if (values.head.isInstanceOf[Number])
            (a, b) => java.lang.Double.compare(a.toDouble, b.toDouble)
          else (a, b) => a.compareTo(b)
        Seq((c, ">=", strs.min(Ordering.fromLessThan[String](cmp(_, _) < 0))),
          (c, "<=", strs.max(Ordering.fromLessThan[String](cmp(_, _) < 0))))
      case EqualTo(c, v) if v != null && safe(v) =>
        Seq((c, "=", v.toString))
      case _ => Seq.empty
    }
  }

  private def plannedDataFiles(spark: org.apache.spark.sql.SparkSession): Seq[Meta.DataFile] = {
    val t = GraftTable.load(spark, root)
    val filters = (statFilters.toSeq ++ runtimeStatFilters)
      .map(s => t.StatFilter(s._1, s._2, s._3))
    startSnapshot match {
      case Some(s) => t.plannedAppendedFiles(filters, Some(s), snapId)
      case None => t.plannedFiles(filters, snapshotId, branch)
    }
  }

  private def toFilePartition(idx: Int, bin: Seq[Meta.DataFile])
      : org.apache.spark.sql.execution.datasources.FilePartition = {
    val dataDir = graft.table.TableIO.path(root, "data")
    GraftConnectorShim.filePartition(idx, bin.map { f =>
      val p = new org.apache.hadoop.fs.Path(dataDir, f.path)
      GraftConnectorShim.partitionedFile(
        graft.table.TableIO.qualified(p), f.fileSizeBytes, 0L)
    })
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(root, requiredSchema, streamOptions)

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val files = plannedDataFiles(spark)
    recordPlanningMetrics(files)
    // group-based row-level ops replace exactly the files this scan
    // planned (runtime filtering is declined under capture, so every
    // planning sees the same statically-pruned set)
    capture.foreach(_.scanned.updateAndGet(_ ++ files.map(_.path)))
    if (rowIdCols.nonEmpty) {
      // row-id scans (delta row-level ops): one file per partition so
      // the reader's raw stream index IS the row position, the same
      // trick the position-delete read path uses. Keyed (SPJ/bucket)
      // partitioning is skipped — a delta op's scan feeds a write,
      // not a join.
      val dataDir = graft.table.TableIO.path(root, "data")
      val specsOut = scala.collection.mutable.Map[String, Seq[DeleteFilesSpec]]()
      val posOut = scala.collection.mutable.Map[String, (PosDeleteSpec, String)]()
      val fileOut = scala.collection.mutable.Map[String, String]()
      val mapOut = scala.collection.mutable.Map[String, ImportedGroup]()
      val out = scala.collection.mutable.ArrayBuffer[InputPartition]()
      files.groupBy(planSig).toSeq.sortBy { case (k, _) => sigKey(k) }
        .foreach { case ((eqSig, posSig, mapping, mSpecId, mPvs), group) =>
          val specs =
            if (eqSig.isEmpty) Seq.empty else buildDeleteSpecs(spark, eqSig)
          val posSpec =
            if (posSig.isEmpty) None else Some(buildPosSpec(spark, posSig))
          group.foreach { f =>
            out += toFilePartition(out.length, Seq(f))
            val uri = graft.table.TableIO.qualified(
              new org.apache.hadoop.fs.Path(dataDir, f.path))
            val bind = PartitionBindKey.ofPath(uri)
            if (specs.nonEmpty) specsOut(bind) = specs
            mapping.foreach(mp =>
              mapOut(bind) = ImportedGroup(mp, mSpecId, mPvs))
            fileOut(bind) = uri
            posSpec.foreach(spec => posOut(bind) = (spec, bind))
          }
        }
      deleteSpecsByPartition = specsOut.toMap
      posSpecsByPartition = posOut.toMap
      rowIdFileByPartition = fileOut.toMap
      mappingByPartition = mapOut.toMap
      out.toArray
    } else if (spjEligible) {
      // one partition per partition-value tuple, keyed for SPJ
      val specNames = table.spec.map(_.name)
      val types = identityPartCols.map(c =>
        table.schema.fields.find(_.name == c).get.dataType)
      files.groupBy(f => specNames.map(f.partitionValues.getOrElse(_, "")))
        .toSeq.sortBy(_._1.mkString("/"))
        .zipWithIndex.map { case ((key, bin), i) =>
          val keyVals = key.zip(types).map { case (v, t) =>
            org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToCatalyst(t match {
              case org.apache.spark.sql.types.IntegerType => v.toInt
              case org.apache.spark.sql.types.LongType => v.toLong
              case org.apache.spark.sql.types.ShortType => v.toShort
              case _ => v
            })
          }
          KeyedFilePartition(
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              keyVals.toArray[Any]),
            toFilePartition(i, bin)): InputPartition
        }.toArray
    } else if (bucketSpec.isDefined) {
      // one partition per bucket value, keyed by the bucket int
      val (pf, _) = bucketSpec.get
      files.groupBy(_.partitionValues.getOrElse(pf.name, "0"))
        .toSeq.sortBy(_._1.toInt)
        .zipWithIndex.map { case ((bucket, bin), i) =>
          KeyedFilePartition(
            new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
              Array[Any](bucket.toInt)),
            toFilePartition(i, bin)): InputPartition
        }.toArray
    } else {
      val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
      val out = scala.collection.mutable.ArrayBuffer[InputPartition]()
      val specsOut = scala.collection.mutable.Map[String, Seq[DeleteFilesSpec]]()
      val posOut = scala.collection.mutable.Map[String, (PosDeleteSpec, String)]()
      val mapOut = scala.collection.mutable.Map[String, ImportedGroup]()
      def bindOf(f: Meta.DataFile): String = PartitionBindKey.ofPath(
        graft.table.TableIO.qualified(new org.apache.hadoop.fs.Path(
          graft.table.TableIO.path(root, "data"), f.path)))
      // bins never mix delete signatures OR name mappings (imported
      // bins are also partition-value-uniform, so identity constants
      // the hive layout stripped fill per bin): one task, one delete
      // set, one schema shape
      files.groupBy(planSig).toSeq.sortBy { case (k, _) => sigKey(k) }
        .foreach { case ((eqSig, posSig, mapping, mSpecId, mPvs), group) =>
          val specs =
            if (eqSig.isEmpty) Seq.empty else buildDeleteSpecs(spark, eqSig)
          val posSpec =
            if (posSig.isEmpty) None else Some(buildPosSpec(spark, posSig))
          if (posSig.nonEmpty) {
            // single-file bins: the reader counts row indexes per file
            group.foreach { f =>
              out += toFilePartition(out.length, Seq(f))
              val bind = bindOf(f)
              if (specs.nonEmpty) specsOut(bind) = specs
              mapping.foreach(mp =>
                mapOut(bind) = ImportedGroup(mp, mSpecId, mPvs))
              posOut(bind) = (posSpec.get, bind)
            }
          } else {
            // bin-pack files into tasks toward maxPartitionBytes
            val bins = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Meta.DataFile]]()
            var cur = scala.collection.mutable.ArrayBuffer[Meta.DataFile]()
            var curBytes = 0L
            group.sortBy(-_.fileSizeBytes).foreach { f =>
              if (curBytes + f.fileSizeBytes > maxBytes && cur.nonEmpty) {
                bins += cur; cur = scala.collection.mutable.ArrayBuffer(); curBytes = 0L
              }
              cur += f; curBytes += f.fileSizeBytes
            }
            if (cur.nonEmpty) bins += cur
            bins.foreach { bin =>
              out += toFilePartition(out.length, bin.toSeq)
              val bind = bindOf(bin.head)
              if (specs.nonEmpty) specsOut(bind) = specs
              mapping.foreach(mp =>
                mapOut(bind) = ImportedGroup(mp, mSpecId, mPvs))
            }
          }
        }
      deleteSpecsByPartition = specsOut.toMap
      posSpecsByPartition = posOut.toMap
      mappingByPartition = mapOut.toMap
      out.toArray
    }
  }

  /** partition index → applicable delete groups, bound at planning
    * time (partition bins are delete-signature-uniform). */
  @volatile private var deleteSpecsByPartition: Map[String, Seq[DeleteFilesSpec]] = Map.empty

  /** partition index → import-group info, for partitions of
    * add_files-imported (id-less) parquet — routed to a
    * renamed-schema reader factory plus identity-constant fill. */
  @volatile private var mappingByPartition: Map[String, ImportedGroup] = Map.empty

  /** bin-uniformity key: delete signature plus (for imported files)
    * the name mapping, spec id and partition values — so every task
    * reads one schema shape and fills one constant set. */
  private def planSig(f: Meta.DataFile): (Seq[String], Seq[String],
      Option[Map[String, String]], Int, Map[String, String]) = {
    val (eq, pos) = deleteSig(f)
    if (f.nameMapping.isDefined)
      (eq, pos, f.nameMapping, f.specId, f.partitionValues)
    else (eq, pos, None, 0, Map.empty)
  }

  /** deterministic ordering for planSig groups (Map.toString isn't). */
  private def sigKey(k: (Seq[String], Seq[String],
      Option[Map[String, String]], Int, Map[String, String])): String =
    (k._1 ++ k._2).mkString(";") + "|" +
      k._3.map(_.toSeq.sorted.mkString(",")).getOrElse("") + "|" +
      k._4 + "|" + k._5.toSeq.sorted.mkString(",")

  /** partition index → (position-delete spec, this partition's data
    * file path) for single-file partitions under position deletes. */
  @volatile private var posSpecsByPartition: Map[String, (PosDeleteSpec, String)] = Map.empty

  /** partition index → qualified data-file URI, for row-id scans
    * (single-file partitions; the reader appends _file/_pos). */
  @volatile private var rowIdFileByPartition: Map[String, String] = Map.empty

  /** Position-delete files become an executor-readable spec like the
    * equality ones: schema (file_path string, pos long). */
  private def buildPosSpec(spark: SparkSession, sig: Seq[String]): PosDeleteSpec = {
    val dataDir = graft.table.TableIO.path(root, "data")
    val byPath = deletesWithSeq.map(_._1).map(f => f.path -> f).toMap
    val schema = StructType(Seq(
      org.apache.spark.sql.types.StructField("file_path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.LongType)))
    val part = GraftConnectorShim.filePartition(0, sig.map(byPath).map { f =>
      val p = new org.apache.hadoop.fs.Path(dataDir, f.path)
      GraftConnectorShim.partitionedFile(
        graft.table.TableIO.qualified(p), f.fileSizeBytes, 0L)
    })
    PosDeleteSpec(
      factory = GraftConnectorShim.parquetReaderFactory(
        spark, schema, schema, Array.empty),
      part = part,
      cacheKey = "pos:" + sig.sorted.mkString(";"))
  }

  /** Build the executor-readable delete specs for one signature: the
    * delete keys are NEVER collected on the driver — each executor
    * reads the (small) delete parquets itself and caches the key set
    * per JVM, so task closures stay O(file list), not O(deleted keys). */
  private def buildDeleteSpecs(spark: SparkSession,
      sig: Seq[String]): Seq[DeleteFilesSpec] = {
    val dataDir = graft.table.TableIO.path(root, "data")
    val byPath = deletesWithSeq.map(_._1).map(f => f.path -> f).toMap
    sig.map(byPath).groupBy(_.equalityColumns).toSeq.map { case (eqCols, dfiles) =>
      val keySchema = StructType(
        table.schema.fields.filter(f => eqCols.contains(f.name)))
      val part = GraftConnectorShim.filePartition(0, dfiles.map { f =>
        val p = new org.apache.hadoop.fs.Path(dataDir, f.path)
        GraftConnectorShim.partitionedFile(
          graft.table.TableIO.qualified(p), f.fileSizeBytes, 0L)
      })
      DeleteFilesSpec(
        keyIndexes = keySchema.fields.map(f => requiredSchema.fieldIndex(f.name)),
        keyTypes = keySchema.fields.map(_.dataType),
        factory = GraftConnectorShim.parquetReaderFactory(
          spark, keySchema, keySchema, Array.empty),
        part = part,
        cacheKey = dfiles.map(_.path).sorted.mkString(";"))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    // position deletes are applied by STREAM index, which is only the
    // file row index if the parquet reader skips nothing — so row-group
    // predicate pushdown must be off while any position delete is live
    // (filters still run above the scan: pushFilters keeps them all as
    // residual)
    // ...and a row-level operation's scan must read candidate files
    // WHOLE: the pushed group-filter condition may only prune files,
    // never rows — non-matching rows are copied forward by the
    // replacement projection, so dropping them here would lose data
    // ...and a row-id scan counts RAW stream indexes as positions, so
    // the parquet reader must not skip row groups either
    val pushForDelegate =
      if (capture.isDefined || rowIdCols.nonEmpty) Array.empty[Filter]
      else pushedFilters
    // partitions of imported (name-mapped) files read through a
    // factory built over their pinned import-time schema — same
    // positions and types, different names, no parquet-level filter
    // pushdown (filters name live columns; all filters stay residual
    // above the scan, so dropping the pushdown is only a perf choice).
    // Identity sources the hive layout stripped from the pages fill
    // back in as per-bin constants (an UnsafeProjection per task).
    val mappedFactories: Map[Map[String, String], PartitionReaderFactory] =
      mappingByPartition.values.map(_.mapping).toSet.map {
        (mp: Map[String, String]) =>
          mp -> (UnwrapKeyedFactory(GraftConnectorShim.parquetReaderFactory(
            spark, Meta.importReadSchema(table.schema, mp),
            Meta.importReadSchema(requiredSchema, mp),
            Array.empty)): PartitionReaderFactory)
      }.toMap
    val routeByPartition: Map[String, (PartitionReaderFactory, Seq[(Int, Any)])] =
      mappingByPartition.map { case (i, g) =>
        i -> (mappedFactories(g.mapping),
          ImportedGroup.overrides(table, requiredSchema, g))
      }
    def routed(f: PartitionReaderFactory): PartitionReaderFactory =
      if (routeByPartition.isEmpty) f
      else NameMapRoutingFactory(f, routeByPartition, requiredSchema)
    val parquetFactory: PartitionReaderFactory = routed(UnwrapKeyedFactory(
      GraftConnectorShim.parquetReaderFactory(
        spark, table.schema, requiredSchema, pushForDelegate)))
    // ONLY the partitions bound to a position delete read raw (their
    // stream index must equal the file row index, so the reader may
    // skip nothing); eq-only and delete-free partitions keep the
    // pushed filters — equality filtering matches row CONTENT, so
    // row-group skipping stays sound for them
    val rawFactory: PartitionReaderFactory =
      if (pushForDelegate.nonEmpty && posSpecsByPartition.nonEmpty)
        routed(UnwrapKeyedFactory(GraftConnectorShim.parquetReaderFactory(
          spark, table.schema, requiredSchema, Array.empty)))
      else parquetFactory
    // _file/_pos append BELOW the MoR filter: positions must count
    // every raw row of the file, including rows a live delete hides
    val delegate =
      if (rowIdCols.isEmpty) parquetFactory
      else RowIdAppendFactory(parquetFactory, rowIdFileByPartition,
        rowIdCols.map(_.name))
    if (deletesWithSeq.isEmpty) delegate
    else MorReaderFactory(delegate, deleteSpecsByPartition, posSpecsByPartition,
      rawDelegate = if (rowIdCols.isEmpty) Some(rawFactory) else None)
  }
}

/** Stable per-partition binding key: the FIRST file's normalized URI
  * path. Partition INDEXES are not stable — Spark may plan a scan
  * once for supportsColumnar/outputPartitioning and AGAIN after
  * runtime filtering re-indexes the surviving subset, while the
  * reader factory keeps the first planning's bindings — so delete
  * specs, name-mapping routes, and row-id files bind by FILE
  * identity instead. Sound because every file lands in exactly one
  * partition per planning (single-file and bin-packed alike). */
object PartitionBindKey {
  def ofPath(path: String): String =
    new org.apache.hadoop.fs.Path(path).toUri.getPath
  def of(p: InputPartition): String = p match {
    case f: org.apache.spark.sql.execution.datasources.FilePartition
        if f.files.nonEmpty =>
      f.files.head.filePath.toPath.toUri.getPath
    case k: KeyedFilePartition => of(k.inner)
    case _ => ""
  }
}

/** Appends the row-address metadata columns (_file, _pos) to each row
  * of a SINGLE-FILE partition: the raw stream index is the row's
  * position within the file. Wraps BELOW any MoR filtering so hidden
  * rows still advance the position counter. */
case class RowIdAppendFactory(
    delegate: PartitionReaderFactory,
    fileByPartition: Map[String, String],
    colOrder: Seq[String])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val inner = delegate.createReader(partition)
    val file = fileByPartition.getOrElse(PartitionBindKey.of(partition),
      throw new IllegalStateException(
        s"row-id scan partition ${PartitionBindKey.of(partition)} " +
          "has no file binding"))
    new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
      private val fileUtf8 =
        org.apache.spark.unsafe.types.UTF8String.fromString(file)
      private val meta =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          colOrder.length)
      private val joined =
        new org.apache.spark.sql.catalyst.expressions.JoinedRow()
      private var pos = -1L
      override def next(): Boolean = {
        val has = inner.next()
        if (has) pos += 1
        has
      }
      override def get(): org.apache.spark.sql.catalyst.InternalRow = {
        // column order follows the REQUESTED schema tail
        colOrder.zipWithIndex.foreach { case (name, i) =>
          meta.update(i,
            if (name == GraftSparkTable.FileColName) fileUtf8 else pos)
        }
        joined(inner.get(), meta)
      }
      override def close(): Unit = inner.close()
    }
  }

  override def supportColumnarReads(p: InputPartition): Boolean = false
}

/** Key-grouped input partition for storage-partitioned joins: wraps a
  * FilePartition with its partition-value key. */
case class KeyedFilePartition(
    key: org.apache.spark.sql.catalyst.InternalRow,
    inner: org.apache.spark.sql.execution.datasources.FilePartition)
  extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): org.apache.spark.sql.catalyst.InternalRow = key
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** Unwraps KeyedFilePartition before the parquet factory (which casts
  * its input to FilePartition). */
case class UnwrapKeyedFactory(delegate: PartitionReaderFactory)
  extends PartitionReaderFactory {
  private def unwrap(p: InputPartition): InputPartition = p match {
    case k: KeyedFilePartition => k.inner
    case other => other
  }
  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    delegate.createReader(unwrap(p))
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    delegate.createColumnarReader(unwrap(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(unwrap(p))
}

/** DSv2 custom metrics the scan reports at planning time — pruning
  * effectiveness and MoR overhead, surfaced in the Spark UI per scan
  * node. All are driver metrics (planning facts), aggregated as sums. */
object GraftScanMetrics {
  import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}

  val all: Array[CustomMetric] = Array(
    new LiveDataFilesMetric, new PlannedDataFilesMetric,
    new PrunedDataFilesMetric, new PlannedBytesMetric,
    new DeleteFilesAppliedMetric)

  def task(metricName: String, v: Long): CustomTaskMetric =
    new CustomTaskMetric {
      override def name(): String = metricName
      override def value(): Long = v
    }

  /** Write-side counterparts, reported per task by the V2 writers. */
  val writeMetrics: Array[CustomMetric] = Array(
    new RowsWrittenMetric, new FilesWrittenMetric)
}

// Spark re-instantiates CustomMetric classes REFLECTIVELY on the
// driver when aggregating task metrics, so each must be a top-level
// class with a zero-arg constructor — a parameterized shared class
// throws SparkException at aggregation time and the UI metric is lost.
private[spark] class LiveDataFilesMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "liveDataFiles"
  override def description(): String = "live data files in the scanned snapshot"
}
private[spark] class PlannedDataFilesMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "plannedDataFiles"
  override def description(): String = "data files planned after pruning"
}
private[spark] class PrunedDataFilesMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "prunedDataFiles"
  override def description(): String = "data files skipped by stats/partition pruning"
}
private[spark] class PlannedBytesMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "plannedBytes"
  override def description(): String = "bytes planned for read"
}
private[spark] class DeleteFilesAppliedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "deleteFilesApplied"
  override def description(): String = "merge-on-read delete files applied"
}
private[spark] class RowsWrittenMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "rowsWritten"
  override def description(): String = "rows written by this write"
}
private[spark] class FilesWrittenMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "filesWritten"
  override def description(): String = "data files written by this write"
}

/** One bin of add_files-imported files: the pinned name mapping plus
  * the (bin-uniform) spec id and partition values its identity
  * constants derive from. */
case class ImportedGroup(mapping: Map[String, String], specId: Int,
    partitionValues: Map[String, String])

object ImportedGroup {
  /** ordinal (in readSchema) → catalyst constant, for identity
    * sources the imported files' pages don't carry (hive layout
    * strips them into the directory names). */
  def overrides(table: Meta.TableMetadata, readSchema: StructType,
      g: ImportedGroup): Seq[(Int, Any)] =
    readSchema.fields.zipWithIndex.toSeq.flatMap { case (f, i) =>
      if (!Meta.fieldId(f).exists(id => !g.mapping.contains(id.toString)))
        None
      else table.specs.getOrElse(g.specId, Seq.empty)
        .find(pf => pf.transform == "identity" && pf.sourceColumn == f.name)
        .flatMap(pf => g.partitionValues.get(pf.name))
        .map(v => i -> castValue(v, f.dataType))
    }

  def castValue(v: String, dt: org.apache.spark.sql.types.DataType): Any =
    org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(v),
        org.apache.spark.sql.types.StringType), dt, Some("UTC")).eval(null)
}

/** Routes partitions of add_files-imported (name-mapped) files to the
  * reader factory built over their pinned import-time schema, with
  * per-bin identity-constant fill; everything else takes the default.
  * The mapped output layout (positions, types) is identical to the
  * default's, so consumers above can't tell the difference. Forces
  * row-based reads for the WHOLE scan: Spark requires partition
  * uniformity, and the fill projection is row-based. */
case class NameMapRoutingFactory(default: PartitionReaderFactory,
    byPartition: Map[String, (PartitionReaderFactory, Seq[(Int, Any)])],
    readSchema: StructType)
  extends PartitionReaderFactory {
  private def pick(p: InputPartition)
      : Option[(PartitionReaderFactory, Seq[(Int, Any)])] =
    byPartition.get(PartitionBindKey.of(p))
  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    pick(p) match {
      case None => default.createReader(p)
      case Some((f, Seq())) => f.createReader(p)
      case Some((f, ovs)) =>
        val inner = f.createReader(p)
        val exprs = readSchema.fields.zipWithIndex.map { case (fd, i) =>
          ovs.find(_._1 == i)
            .map(o => org.apache.spark.sql.catalyst.expressions.Literal(
              o._2, fd.dataType): org.apache.spark.sql.catalyst.expressions.Expression)
            .getOrElse(org.apache.spark.sql.catalyst.expressions.BoundReference(
              i, fd.dataType, nullable = true))
        }.toIndexedSeq
        val proj = org.apache.spark.sql.catalyst.expressions
          .UnsafeProjection.create(exprs)
        new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
          override def next(): Boolean = inner.next()
          override def get(): org.apache.spark.sql.catalyst.InternalRow =
            proj(inner.get())
          override def close(): Unit = inner.close()
        }
    }
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    pick(p).map(_._1).getOrElse(default).createColumnarReader(p)
  override def supportColumnarReads(p: InputPartition): Boolean = false
}

/** Appends one per-partition string constant as a trailing column —
  * the position_deletes metadata table uses it to stamp each row with
  * the delete file it came from. Row-based by construction. */
case class AppendConstStringFactory(delegate: PartitionReaderFactory,
    byPartition: Map[Int, String], innerSchema: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions._
    val idx = p match {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        fp.index
      case _ => -1
    }
    val const = byPartition.getOrElse(idx, "")
    val inner = delegate.createReader(p)
    val exprs = innerSchema.fields.zipWithIndex.map { case (f, i) =>
      BoundReference(i, f.dataType, nullable = true): Expression
    }.toIndexedSeq :+ (Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(const),
      org.apache.spark.sql.types.StringType): Expression)
    val proj = UnsafeProjection.create(exprs)
    new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
      override def next(): Boolean = inner.next()
      override def get(): org.apache.spark.sql.catalyst.InternalRow =
        proj(inner.get())
      override def close(): Unit = inner.close()
    }
  }
  override def supportColumnarReads(p: InputPartition): Boolean = false
}

/** One equality-delete group, executor-readable: where the key columns
  * sit in the read schema, plus the parquet reader factory + file
  * partition an executor uses to load the delete keys ITSELF. Keys
  * never pass through the driver or task closures (at 100 TB a delete
  * set can be millions of keys — driver collection would OOM and
  * bloat every closure; this mirrors how Iceberg readers handle v2
  * delete files). */
case class DeleteFilesSpec(
    keyIndexes: Array[Int],
    keyTypes: Array[org.apache.spark.sql.types.DataType],
    factory: PartitionReaderFactory,
    part: org.apache.spark.sql.execution.datasources.FilePartition,
    cacheKey: String)

/** One position-delete group, executor-readable: the parquet reader
  * factory + file partition over (file_path, pos) delete rows. */
case class PosDeleteSpec(
    factory: PartitionReaderFactory,
    part: org.apache.spark.sql.execution.datasources.FilePartition,
    cacheKey: String)

/** Per-JVM cache of delete-key sets: each executor reads a delete file
  * group once, no matter how many tasks apply it. */
object DeleteKeyCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[Vector[Any]]]()
  private val posCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Set[Long]]]()

  def get(spec: DeleteFilesSpec): Set[Vector[Any]] =
    cache.computeIfAbsent(spec.cacheKey, _ => load(spec))

  /** Deleted row positions grouped by data-file URI path. */
  def getPositions(spec: PosDeleteSpec): Map[String, Set[Long]] =
    posCache.computeIfAbsent(spec.cacheKey, _ => loadPositions(spec))

  private def loadPositions(spec: PosDeleteSpec): Map[String, Set[Long]] = {
    val reader = spec.factory.createReader(spec.part)
    val b = scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]()
    try {
      while (reader.next()) {
        val r = reader.get()
        // normalize URI forms (file:/ vs file:///) to the path part
        val key = new org.apache.hadoop.fs.Path(
          r.getUTF8String(0).toString).toUri.getPath
        b.getOrElseUpdate(key, scala.collection.mutable.Set[Long]()) += r.getLong(1)
      }
    } finally reader.close()
    b.map { case (k, v) => k -> v.toSet }.toMap
  }

  // reader rows reuse buffers; key values must be defensively copied
  private def copyVal(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.copy()
    case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
    case r: org.apache.spark.sql.catalyst.InternalRow => r.copy()
    case other => other
  }

  private def load(spec: DeleteFilesSpec): Set[Vector[Any]] = {
    val reader = spec.factory.createReader(spec.part)
    val b = Set.newBuilder[Vector[Any]]
    try {
      while (reader.next()) {
        val r = reader.get()
        b += spec.keyTypes.indices
          .map(i => copyVal(r.get(i, spec.keyTypes(i)))).toVector
      }
    } finally reader.close()
    b.result()
  }
}

/** Wraps the parquet reader factory to drop rows whose equality key is
  * deleted. Partitions were bound to their applicable delete groups at
  * planning time (sequence-scoped: files appended AFTER a delete are
  * not filtered by it). */
case class MorReaderFactory(
    delegate: PartitionReaderFactory,
    specsByPartition: Map[String, Seq[DeleteFilesSpec]],
    posByPartition: Map[String, (PosDeleteSpec, String)] = Map.empty,
    rawDelegate: Option[PartitionReaderFactory] = None)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] = {
    val bind = PartitionBindKey.of(partition)
    val specs = specsByPartition.getOrElse(bind, Seq.empty)
    val pos = posByPartition.get(bind)
    // position-deleted partitions must count every raw row — use the
    // unpushed reader for them when one was built
    val inner = (if (pos.isDefined) rawDelegate.getOrElse(delegate)
      else delegate).createReader(partition)
    if (specs.isEmpty && pos.isEmpty) inner
    else new PartitionReader[org.apache.spark.sql.catalyst.InternalRow] {
      private val groups = specs.map(s => (s, DeleteKeyCache.get(s)))
      // positional deletes: this partition is a single whole file, so
      // the stream index IS the row index within the file
      private val deadPositions: Set[Long] = pos match {
        case Some((spec, filePath)) =>
          DeleteKeyCache.getPositions(spec).getOrElse(filePath, Set.empty)
        case None => Set.empty
      }
      private var rowIdx = -1L
      private var current: org.apache.spark.sql.catalyst.InternalRow = _
      private def deleted(row: org.apache.spark.sql.catalyst.InternalRow): Boolean =
        deadPositions.contains(rowIdx) ||
          groups.exists { case (s, keys) =>
            val key = (0 until s.keyIndexes.length).map(i =>
              row.get(s.keyIndexes(i), s.keyTypes(i))).toVector
            keys.contains(key)
          }
      override def next(): Boolean = {
        while (inner.next()) {
          rowIdx += 1
          val r = inner.get()
          if (!deleted(r)) { current = r; return true }
        }
        false
      }
      override def get(): org.apache.spark.sql.catalyst.InternalRow = current
      override def close(): Unit = inner.close()
    }
  }

  // all partitions must agree on columnar vs row (Spark checks the
  // whole scan), so a scan with any live deletes reads row-based
  override def supportColumnarReads(p: InputPartition): Boolean = false
}

// ---- V2 write path ---------------------------------------------------

/** How a V2 batch write lands: plain append, whole-table truncate,
  * OverwriteByExpression (static `INSERT OVERWRITE ... PARTITION` /
  * `REPLACE WHERE`), or dynamic partition overwrite. */
private[spark] sealed trait GraftWriteMode
private[spark] object GraftWriteMode {
  case object Append extends GraftWriteMode
  case object Truncate extends GraftWriteMode
  final case class ByFilter(filters: Seq[Filter]) extends GraftWriteMode
  case object DynamicPartitions extends GraftWriteMode
}

/** BatchWrite: executors stream InternalRows into per-task parquet
  * files under a staging dir; the driver commit ingests them (footer
  * stats job) and snapshots — append, truncate+overwrite, overwrite
  * by filter (one snapshot: candidates rewritten minus matching rows
  * + new data), or dynamic partition overwrite (touched partitions
  * dropped whole). */
class GraftWriteBuilder(root: String, schema: StructType,
    queryId: String = "", branch: String = "main")
  extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsOverwrite
    with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
  private var mode: GraftWriteMode = GraftWriteMode.Append
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    mode = GraftWriteMode.Truncate; this
  }
  /** Untranslatable conditions fail the statement fast (Spark falls
    * back to an error, never to a silent whole-table truncate) —
    * same contract as canDeleteWhere. */
  override def canOverwrite(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftSparkTable.filterColumn(f).isDefined)
  override def overwrite(filters: Array[Filter])
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    mode =
      // AlwaysTrue (or no filter at all) IS a truncate
      if (filters.isEmpty ||
          filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
        GraftWriteMode.Truncate
      else GraftWriteMode.ByFilter(filters.toSeq)
    this
  }
  override def overwriteDynamicPartitions()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    mode = GraftWriteMode.DynamicPartitions; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new GraftWrite(root, schema, mode, queryId, branch)
}

/** Shared write-layout derivation: the table's partition spec and
  * plain-column sort order expressed as a V2 distribution + ordering,
  * so EVERY V2 write path (append/overwrite, replace, streaming)
  * clusters rows on the executors and the commit ingests staged files
  * in place — no driver-side re-read/re-write of the batch. */
private[spark] object GraftWriteLayout {
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  type V2Expr = org.apache.spark.sql.connector.expressions.Expression
  type V2Sort = org.apache.spark.sql.connector.expressions.SortOrder

  def spec(root: String): Seq[Meta.PartitionField] =
    if (Meta.exists(root)) Meta.load(root).spec else Seq.empty

  /** Plain-column sort-order entries, or empty when any entry is an
    * expression (zorder) the V2 ordering can't express — those fall
    * back to the driver-side re-cluster at commit. */
  def sortRefs(root: String): Seq[String] = {
    val so = if (Meta.exists(root)) Meta.load(root).sortOrder else Seq.empty
    if (so.nonEmpty && so.forall(e => !e.contains("(") && !e.contains(" ")))
      so
    else Seq.empty
  }

  // truncate has no catalog function to resolve against; cluster by
  // the (finer) source column instead — still a valid routing
  private def partExpr(pf: Meta.PartitionField): V2Expr =
    if (pf.transform.startsWith("truncate["))
      Expressions.identity(pf.sourceColumn)
    else RowTransform.toV2(pf)

  private def sortExprs(refs: Seq[String]): Seq[V2Sort] =
    refs.map(c => Expressions.sort(
      Expressions.identity(c): V2Expr, SortDirection.ASCENDING))

  /** Partitioned: cluster on the transforms so each task writes few
    * files per partition value. Sorted, unpartitioned: RANGE exchange
    * on the sort key gives each task a disjoint slice. The
    * `write.distribution-mode` table property overrides (Iceberg's
    * none | hash | range): `none` skips the exchange entirely — tasks
    * still sort locally, for pre-clustered ingest where a shuffle
    * would only move already-placed rows. */
  def distribution(root: String): Distribution = {
    val mode =
      if (Meta.exists(root))
        Meta.load(root).properties.getOrElse("write.distribution-mode", "")
      else ""
    val sp = spec(root)
    mode match {
      case "none" => Distributions.unspecified()
      case "hash" if sp.nonEmpty =>
        Distributions.clustered(sp.map(partExpr).toArray)
      case "range" if sortRefs(root).nonEmpty =>
        Distributions.ordered(sortExprs(sortRefs(root)).toArray)
      case _ =>
        if (sp.nonEmpty) Distributions.clustered(sp.map(partExpr).toArray)
        else {
          val so = sortRefs(root)
          if (so.nonEmpty) Distributions.ordered(sortExprs(so).toArray)
          else Distributions.unspecified()
        }
    }
  }

  /** In-task ordering: partition transforms first (keeps one file
    * open per partition value in a routed writer), then the sort
    * columns for tight per-file bounds. */
  def ordering(root: String): Array[V2Sort] = {
    val so = sortRefs(root)
    if (so.isEmpty) Array.empty
    else (spec(root).map(pf =>
      Expressions.sort(partExpr(pf), SortDirection.ASCENDING)) ++
      sortExprs(so)).toArray
  }

  /** The executors applied the table's whole sort order, so the
    * commit may ingest staged files as-is. */
  def presorted(root: String): Boolean = sortRefs(root).nonEmpty
}

class GraftWrite(root: String, schema: StructType, mode: GraftWriteMode,
    queryId: String = "", branch: String = "main")
  extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    GraftWriteLayout.distribution(root)

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    GraftWriteLayout.ordering(root)

  private[spark] def presorted: Boolean = GraftWriteLayout.presorted(root)

  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    GraftScanMetrics.writeMetrics

  override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
    new GraftBatchWrite(root, schema, mode, presorted, branch)

  override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
    new GraftStreamingWrite(root, schema,
      mode == GraftWriteMode.Truncate, queryId, branch)
}

/** Structured Streaming sink (`df.writeStream.format("graft")`):
  * each micro-batch stages per-epoch parquet on the executors and
  * the driver commits ONE snapshot per epoch, stamped with the
  * stable streaming query id + epoch id. Exactly-once across query
  * restarts comes from the stamp: Spark replays the last epoch after
  * recovery, and a replayed commit whose (query-id, epoch-id) is
  * already in the snapshot history is dropped (Iceberg's streaming
  * writer dedups the same way). Complete mode (truncate) overwrites
  * the table per epoch. Crashed epochs leave only a `stage-stream-*`
  * dir that remove_orphan_files sweeps. */
class GraftStreamingWrite(root: String, schema: StructType,
    truncate: Boolean, queryId: String, branch: String = "main")
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import graft.table.TableIO

  // per-RUN staging root: a crashed run's half-staged epoch can never
  // leak into a later run's ingest (it becomes an orphan dir instead)
  private val staging = TableIO.path(root,
    s"stage-stream-${java.util.UUID.randomUUID().toString.take(8)}")

  private def epochDir(epochId: Long) =
    new org.apache.hadoop.fs.Path(staging, s"epoch-$epochId")

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    val spec = if (Meta.exists(root)) Meta.load(root).spec else Seq.empty
    GraftStreamingWriterFactory(staging.toString,
      GraftConnectorShim.prepareParquetWriteConf(SparkSession.active,
        GraftWriteSchemas.withTableFieldIds(root, schema),
        GraftWriteSchemas.bloomOptions(root)),
      RowTransform.forSpec(spec, schema))
  }

  override def commit(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val t = GraftTable.load(SparkSession.active, root)
    // dedup anchors: the snapshot stamp AND a high-water table
    // property that survives expireSnapshots dropping the stamped
    // snapshots — a delayed recovery replay after an expire still
    // commits nothing. The SAME predicate is re-evaluated inside the
    // commit's conflict-retry loop (skipIf below): a zombie run that
    // loses the CAS race to a concurrent run of the same query must
    // observe the winner's epoch and back off, not double-commit and
    // regress the high-water on retry.
    val hwKey = s"graft.streaming.epoch.$queryId"
    // unparseable stamps (a hand-edited or corrupted property) read as
    // ABSENT — the snapshot-stamp anchor still dedups — rather than
    // permanently failing every commit of this query with an NFE
    def stampedAtLeast(v: String): Boolean =
      scala.util.Try(v.toLong).toOption.exists(_ >= epochId)
    def replayedIn(m: graft.table.Meta.TableMetadata): Boolean =
      m.properties.get(hwKey).exists(stampedAtLeast) ||
        m.snapshots.exists(s =>
          s.summary.get("streaming-query-id").contains(queryId) &&
            s.summary.get("streaming-epoch-id").exists(stampedAtLeast))
    val replayed = replayedIn(t.meta)
    val dir = epochDir(epochId)
    val rows = messages.collect { case GraftCommitMessage(_, n) => n }.sum
    // recovery replay of an already-committed epoch, or a rowless
    // append batch (watermark-only tick): nothing to commit — but an
    // EMPTY complete-mode result must still truncate
    if (replayed || !TableIO.exists(dir) || (rows == 0 && !truncate)) {
      TableIO.delete(staging, recursive = true)
      return
    }
    t.commitStagedWrite(dir, truncate, summaryExtra = Map(
      "streaming-query-id" -> queryId,
      "streaming-epoch-id" -> epochId.toString),
      // micro-batch planning honors RequiresDistributionAndOrdering,
      // so sorted-table epochs arrive range-clustered like batch writes
      presorted = GraftWriteLayout.presorted(root), branch = branch,
      propsExtra = Map(hwKey -> epochId.toString),
      skipIf = replayedIn)
    // the ingest consumed the epoch dir; an empty run root is just
    // residue — drop it (the next epoch's writers re-mkdir on demand)
    if (TableIO.exists(staging) && TableIO.listDir(staging).isEmpty)
      TableIO.delete(staging, recursive = true)
    ()
  }

  override def abort(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    TableIO.delete(epochDir(epochId), recursive = true)
}

/** Executor side of the streaming sink: same writers as the batch
  * path, rooted in the epoch's staging dir (partition-spec'd tables
  * row-route exactly like batch writes). */
case class GraftStreamingWriterFactory(staging: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    transforms: Seq[RowTransform] = Seq.empty)
  extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] = {
    val dir = s"$staging/epoch-$epochId"
    val hp = new org.apache.hadoop.fs.Path(dir)
    hp.getFileSystem(conf.value).mkdirs(hp)
    if (transforms.isEmpty)
      new GraftDataWriter(
        s"$dir/part-$partitionId-$taskId-${GraftWriterFactory.fileTag()}.parquet",
        conf.value, partitionId, taskId)
    else
      new PartitionedGraftDataWriter(dir, conf.value, partitionId, taskId, transforms)
  }
}

class GraftBatchWrite(root: String, schema: StructType, mode: GraftWriteMode,
    presorted: Boolean = false, branch: String = "main")
  extends org.apache.spark.sql.connector.write.BatchWrite {
  private val staging =
    graft.table.TableIO.path(root, s"stage-v2-${java.util.UUID.randomUUID().toString.take(8)}")

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory = {
    graft.table.TableIO.mkdirs(staging)
    val spec = if (Meta.exists(root)) Meta.load(root).spec else Seq.empty
    GraftWriterFactory(staging.toString,
      GraftConnectorShim.prepareParquetWriteConf(SparkSession.active,
        GraftWriteSchemas.withTableFieldIds(root, schema),
        GraftWriteSchemas.bloomOptions(root)),
      RowTransform.forSpec(spec, schema))
  }

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    import org.apache.spark.sql.functions.lit
    val t = GraftTable.load(SparkSession.active, root)
    mode match {
      case GraftWriteMode.Append =>
        t.commitStagedWrite(staging, overwrite = false,
          presorted = presorted, branch = branch)
      case GraftWriteMode.Truncate =>
        t.commitStagedWrite(staging, overwrite = true,
          presorted = presorted, branch = branch)
      case GraftWriteMode.ByFilter(filters) =>
        val cond = filters.flatMap(GraftSparkTable.filterColumn)
          .reduceOption(_ && _).getOrElse(lit(true))
        val triples = filters.flatMap(GraftSparkTable.statFilterOf)
        val touched = triples.map(f => t.StatFilter(f._1, f._2, f._3))
        // whole-file drops are provable only when EVERY conjunct is a
        // stat-expressible equality — else stats can't cover the
        // residual and every candidate rewrites
        val eqProofs =
          if (filters.forall(f => f.isInstanceOf[EqualTo] ||
                f.isInstanceOf[org.apache.spark.sql.sources.EqualNullSafe]) &&
              triples.size == filters.size &&
              triples.forall(_._2 == "="))
            triples.map(f => (f._1, f._3))
          else Seq.empty
        t.commitStagedOverwrite(staging, cond, touched,
          eqProofs = eqProofs, presorted = presorted)
      case GraftWriteMode.DynamicPartitions =>
        t.commitStagedDynamicOverwrite(staging, presorted = presorted)
    }
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit =
    graft.table.TableIO.delete(staging, recursive = true)
}

case class GraftCommitMessage(path: String, rows: Long)
  extends org.apache.spark.sql.connector.write.WriterCommitMessage

object GraftWriterFactory {
  /** Per-file random tag baked into every staged file name.
    * `part-<partitionId>-<taskId>` alone is NOT collision-proof:
    * task ids restart from 0 in a new JVM, so a streaming recovery
    * replay (zombie run vs winner racing the same epoch) stages
    * files whose names collide with ones the winner already
    * ingested — and the loser's ingest rename would silently
    * overwrite the winner's committed data file before the skipIf
    * reclaim deleted it. A random tag makes every staged file's
    * ingest destination unique, so no commit can ever rename over
    * (or reclaim) another commit's file. */
  def fileTag(): String =
    java.util.UUID.randomUUID().toString.take(8)
}

case class GraftWriterFactory(staging: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    transforms: Seq[RowTransform] = Seq.empty)
  extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] =
    if (transforms.isEmpty)
      new GraftDataWriter(
        s"$staging/part-$partitionId-$taskId-${GraftWriterFactory.fileTag()}.parquet",
        conf.value, partitionId, taskId)
    else
      new PartitionedGraftDataWriter(staging, conf.value, partitionId, taskId, transforms)
}

/** Partition-routing writer: evaluates the spec transforms per row
  * (executor-side, same values as the Catalyst transform columns) and
  * streams rows into one open parquet file per partition value. The
  * requested clustered distribution keeps the set of open files per
  * task small. */
class PartitionedGraftDataWriter(staging: String,
    conf: org.apache.hadoop.conf.Configuration, partitionId: Int, taskId: Long,
    transforms: Seq[RowTransform])
  extends org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] {

  private val writers = scala.collection.mutable.Map[
    String, (org.apache.spark.sql.execution.datasources.OutputWriter, String)]()
  private var rows = 0L

  override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
    val dir = transforms.map(t => s"${t.name}=${t.eval(row)}").mkString("/")
    val w = writers.getOrElseUpdate(dir, {
      val path =
        s"$staging/$dir/part-$partitionId-$taskId-${GraftWriterFactory.fileTag()}.parquet"
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(conf).mkdirs(hp.getParent)
      (GraftConnectorShim.newParquetTaskWriter(path, conf, partitionId, taskId),
        path)
    })._1
    w.write(row); rows += 1
  }

  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(GraftScanMetrics.task("rowsWritten", rows),
      GraftScanMetrics.task("filesWritten", writers.size.toLong))

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    writers.values.foreach(_._1.close())
    GraftCommitMessage(s"$staging ${writers.size} files", rows)
  }

  override def abort(): Unit = writers.values.foreach { case (w, path) =>
    w.close()
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).delete(p, false)
  }

  override def close(): Unit = ()
}

class GraftDataWriter(path: String,
    conf: org.apache.hadoop.conf.Configuration, partitionId: Int, taskId: Long)
  extends org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
  private val writer =
    GraftConnectorShim.newParquetTaskWriter(path, conf, partitionId, taskId)
  private var rows = 0L

  override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
    writer.write(row); rows += 1
  }
  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(GraftScanMetrics.task("rowsWritten", rows),
      GraftScanMetrics.task("filesWritten", if (rows > 0) 1L else 0L))
  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    writer.close(); GraftCommitMessage(path, rows)
  }
  override def abort(): Unit = {
    writer.close()
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).delete(p, false)
  }
  override def close(): Unit = ()
}

// ---- metadata-only aggregate pushdown --------------------------------

case class MetadataAgg(kind: String, column: String)
case class MetadataAggSpec(aggs: Seq[MetadataAgg], snapshotId: Option[Long])

/** LocalScan answering ungrouped COUNT/MIN/MAX from manifest stats —
  * the query never touches a data file. */
object MetadataAggScan {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  def build(table: Meta.TableMetadata, spec: MetadataAggSpec)
      : org.apache.spark.sql.connector.read.LocalScan = {
    val files = table.liveFiles(spec.snapshotId)

    def typed(c: String): DataType =
      table.schema.fields.find(_.name == c).get.dataType

    def toCatalyst(v: String, t: DataType): Any = t match {
      case IntegerType => v.toInt
      case LongType => v.toLong
      case ShortType => v.toShort
      case DoubleType => v.toDouble
      case FloatType => v.toFloat
      case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(v)
      case other => throw new IllegalStateException(s"unexpected agg type $other")
    }

    def ordering(t: DataType): Ordering[Any] = (t match {
      case IntegerType => Ordering.Int.on[Any](_.asInstanceOf[Int])
      case LongType => Ordering.Long.on[Any](_.asInstanceOf[Long])
      case ShortType => Ordering.Short.on[Any](_.asInstanceOf[Short])
      case DoubleType => Ordering.Double.TotalOrdering.on[Any](_.asInstanceOf[Double])
      case FloatType => Ordering.Float.TotalOrdering.on[Any](_.asInstanceOf[Float])
      case StringType => Ordering.by[Any, String](_.toString)
      case other => throw new IllegalStateException(s"unexpected agg type $other")
    })

    val (values, fields) = spec.aggs.zipWithIndex.map { case (a, i) =>
      a.kind match {
        case "count" =>
          (files.map(_.recordCount).sum: Any,
            StructField(s"f$i", LongType, nullable = false))
        case "min" =>
          val t = typed(a.column)
          val v = files.map(f => toCatalyst(f.stats(a.column).min, t)).min(ordering(t))
          (v, StructField(s"f$i", t))
        case "max" =>
          val t = typed(a.column)
          val v = files.map(f => toCatalyst(f.stats(a.column).max, t)).max(ordering(t))
          (v, StructField(s"f$i", t))
      }
    }.unzip

    val schema = StructType(fields)
    val row = new GenericInternalRow(values.toArray)
    new org.apache.spark.sql.connector.read.LocalScan {
      override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] = Array(row)
      override def readSchema(): StructType = schema
      override def description(): String =
        s"GraftMetadataAggScan(${spec.aggs.mkString(",")})"
    }
  }
}
