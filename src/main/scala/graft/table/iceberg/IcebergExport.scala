package graft.table.iceberg

import org.apache.avro.generic.GenericData
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.table.{Meta, TableIO}
import java.util.UUID

/** Export a graft-format table as a REAL Iceberg v2 table any engine
  * can read: fresh metadata.json + avro manifests at `dest`, with the
  * graft table's existing data parquet files referenced IN PLACE by
  * absolute URI — metadata-only, no data copy (the reference's
  * register_table flow likewise publishes existing files under new
  * metadata, catalog_api_api.rs:848).
  *
  * Fidelity carried over:
  *  - partition spec (same transform vocabulary) + typed partition
  *    values per file,
  *  - per-file column bounds re-encoded from graft's canonical stat
  *    strings into Iceberg single-value binaries,
  *  - merge-on-read deletes with their data-sequence scoping:
  *    equality-delete parquets are referenced as-is (content=2 +
  *    equality_ids); POSITIONAL delete parquets are the one rewrite —
  *    the Iceberg spec matches their file_path column against the
  *    manifest's data-file URI strings exactly, so they are re-written
  *    under dest with translated paths.
  */
object IcebergExport {

  /** Property recording the graft metadata version an export mirrors —
    * re-export is needed iff the source version moved. */
  val SourceVersionProp = "graft.source-version"

  def export(spark: SparkSession, graftRoot: String, dest: String): Unit = {
    val m = Meta.load(graftRoot)
    val sparkSchema = m.schema
    // nested inner ids allocate above the max id across EVERY schema
    // version — an id retired by a dropped column (old footers still
    // hold its bytes) must never be reassigned to an inner field
    val ice = IcebergMetadata.schemaFromSpark(sparkSchema,
      nestedIdsFrom = Some(Meta.maxFieldId(m.schemas.values) + 1))
    // the full spec LIST exports, with partition field ids unique
    // across specs and shared when two specs carry the same field
    // (iceberg-rust-spec table_metadata.rs partition_specs)
    var nextPartFieldId = 1000
    val fieldIdByKey =
      scala.collection.mutable.Map[(String, String, String), Int]()
    val specsById: Map[Int, Seq[IcebergMetadata.IcePartitionField]] =
      m.specs.toSeq.sortBy(_._1).map { case (sid, fields) =>
        sid -> fields.map { pf =>
          val fid = fieldIdByKey.getOrElseUpdate(
            (pf.sourceColumn, pf.transform, pf.name),
            { val v = nextPartFieldId; nextPartFieldId += 1; v })
          IcebergMetadata.IcePartitionField(
            ice.fieldId(pf.sourceColumn).getOrElse(throw new IllegalArgumentException(
              s"partition source ${pf.sourceColumn} not in schema")),
            fid, pf.name, pf.transform)
        }
      }.toMap
    val specFields = specsById(m.defaultSpecId)
    val dataDir = TableIO.path(graftRoot, "data")
    val files = m.liveFilesWithSeq(None)
    val deletes = m.liveDeleteFilesWithSeq(None)
    val maxSeq = (files ++ deletes).map(_._2).maxOption.getOrElse(1L)

    val metaDir = TableIO.path(dest, "metadata")
    TableIO.mkdirs(metaDir)

    def dataFileUri(rel: String): String =
      TableIO.qualified(new HPath(dataDir, rel))

    // positional deletes: rewrite with file_path translated to the
    // URIs the exported manifests carry (must match byte-for-byte)
    val posDeletes = deletes.filter(_._1.content == 1)
    val translatedPos: Map[String, (String, Long, Long)] =
      if (posDeletes.isEmpty) Map.empty
      else {
        val destData = TableIO.path(dest, "data")
        TableIO.mkdirs(destData)
        import spark.implicits._
        val uriByRel = files.map { case (f, _) => f.path -> dataFileUri(f.path) }
        val uriDf = uriByRel.toDF("rel", "uri")
        // recorded file_path values are reader-local URIs of the same
        // physical files: strip the dataDir PREFIX (scheme-insensitive,
        // via the URI path) to recover the dataDir-relative join key —
        // a substring match on '/data/' would misfire for any
        // warehouse rooted under a path containing that segment
        val dataDirPath = dataDir.toUri.getPath.stripSuffix("/") + "/"
        posDeletes.map { case (d, seq) =>
          val src = spark.read.parquet(new HPath(dataDir, d.path).toString)
          val translated = src
            .withColumn("rel", regexp_replace(
              regexp_replace(col("file_path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:(//)?", ""),
              "^" + java.util.regex.Pattern.quote(dataDirPath), ""))
            .join(broadcast(uriDf), Seq("rel"))
            .select(col("uri").as("file_path"), col("pos"))
          val staging = new HPath(dest, s"stage-${UUID.randomUUID().toString.take(8)}")
          translated.coalesce(1).write.parquet(staging.toString)
          val out = TableIO.listFilesRecursive(staging)
            .filter(_._1.getName.endsWith(".parquet")).head
          val destFile = new HPath(destData,
            s"pos-delete-${UUID.randomUUID().toString.take(8)}.parquet")
          TableIO.rename(out._1, destFile)
          TableIO.delete(staging, recursive = true)
          d.path -> (TableIO.qualified(destFile), out._2, seq)
        }.toMap
      }

    val schemaJson = IcebergWrite.icebergSchemaJson(ice)
    val snapshotId = 1L

    // Avro manifest schemas parse once PER SPEC, not per file — an
    // export of thousands of files re-parsing the schema per entry
    // would dominate the metadata-only publish
    val manifestSchemaBySpec =
      scala.collection.mutable.Map[Int, org.apache.avro.Schema]()
    def manifestSchemaFor(sid: Int,
        specFields: Seq[IcebergMetadata.IcePartitionField]): org.apache.avro.Schema =
      manifestSchemaBySpec.getOrElseUpdate(sid, IcebergAvro.manifestSchema(
        IcebergWrite.partitionRecordJson(specFields, ice)))

    def entry(uri: String, f: Meta.DataFile, seq: Long, sizeBytes: Long,
        content: Int, sid: Int,
        specFields: Seq[IcebergMetadata.IcePartitionField])
        : org.apache.avro.generic.GenericRecord = {
      val e = IcebergAvro.record(manifestSchemaFor(sid, specFields))
      e.put("status", 1)
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      val dfSchema = e.getSchema.getField("data_file").schema()
      val d = new GenericData.Record(dfSchema)
      d.put("content", content)
      d.put("file_path", uri)
      d.put("file_format", "PARQUET")
      val partRec = new GenericData.Record(dfSchema.getField("partition").schema())
      specFields.foreach { pf =>
        val srcT = sparkSchema.fields(
          ice.fields.indexWhere(_.id == pf.sourceId)).dataType
        f.partitionValues.get(pf.name).foreach { v =>
          partRec.put(pf.name, IcebergWrite.typedPartitionValue(
            Transforms.resultType(pf.transform, srcT), v))
        }
      }
      d.put("partition", partRec)
      d.put("record_count", f.recordCount)
      d.put("file_size_in_bytes", sizeBytes)
      val (lower, upper, nulls) = encodeStats(f, ice, sparkSchema)
      d.put("null_value_counts",
        IcebergWrite.keyedLongs(dfSchema, "null_value_counts", nulls))
      d.put("lower_bounds", IcebergWrite.keyedBytes(dfSchema, "lower_bounds", lower))
      d.put("upper_bounds", IcebergWrite.keyedBytes(dfSchema, "upper_bounds", upper))
      if (content == 2 && f.equalityColumns.nonEmpty) {
        val eqIds = f.equalityColumns.flatMap(ice.fieldId)
        val arrSchema = dfSchema.getField("equality_ids").schema().getTypes.get(1)
        val arr = new GenericData.Array[Any](eqIds.size, arrSchema)
        eqIds.foreach(id => arr.add(id))
        d.put("equality_ids", arr)
      } else d.put("equality_ids", null)
      e.put("data_file", d)
      e
    }

    // one data manifest PER SPEC the live files were written under —
    // each manifest's partition record matches its own spec, and the
    // manifest-list entry carries the spec id readers resolve against
    val manifests = scala.collection.mutable.ArrayBuffer[
      (String, Long, Int, Int, Long, Long, Int, Long)]()
    files.groupBy(_._1.specId).toSeq.sortBy(_._1).foreach { case (sid, group) =>
      val sf = specsById.getOrElse(sid, Seq.empty)
      val entries = group.map { case (f, seq) =>
        entry(dataFileUri(f.path), f, seq, fileSize(dataDir, f), 0, sid, sf)
      }
      val p = new HPath(metaDir, s"manifest-exp-${UUID.randomUUID().toString.take(8)}.avro")
      val len = IcebergAvro.writeManifest(p,
        IcebergWrite.partitionRecordJson(sf, ice), entries,
        schemaJson, IcebergWrite.partitionSpecJson(sf, sid))
      manifests += ((TableIO.qualified(p), len, sid, 0,
        group.map(_._2).max, group.map(_._2).min,
        group.size, group.map(_._1.recordCount).sum))
    }
    if (deletes.nonEmpty) {
      // delete files are table-scoped (no partition values) — written
      // under the default spec with null partition fields
      val deleteEntries = deletes.map {
        case (d, seq) if d.content == 1 =>
          val (uri, size, s) = translatedPos(d.path)
          entry(uri, d, s, size, 1, m.defaultSpecId, specFields)
        case (d, seq) =>
          entry(dataFileUri(d.path), d, seq, fileSize(dataDir, d), 2, m.defaultSpecId, specFields)
      }
      val p = new HPath(metaDir, s"manifest-exp-del-${UUID.randomUUID().toString.take(8)}.avro")
      val len = IcebergAvro.writeManifest(p,
        IcebergWrite.partitionRecordJson(specFields, ice), deleteEntries,
        schemaJson, IcebergWrite.partitionSpecJson(specFields, m.defaultSpecId),
        content = "deletes")
      manifests += ((TableIO.qualified(p), len, m.defaultSpecId, 1,
        deletes.map(_._2).max, deletes.map(_._2).min, deletes.size, 0L))
    }

    val mlSchema = IcebergAvro.manifestListSchema
    val mlRecords = manifests.map { case (path, len, sid, content, seq, minSeq, n, rows) =>
      val r = IcebergAvro.record(mlSchema)
      r.put("manifest_path", path); r.put("manifest_length", len)
      r.put("partition_spec_id", sid); r.put("content", content)
      r.put("sequence_number", seq); r.put("min_sequence_number", minSeq)
      r.put("added_snapshot_id", snapshotId)
      r.put("added_files_count", n)
      r.put("existing_files_count", 0); r.put("deleted_files_count", 0)
      r.put("added_rows_count", rows)
      r.put("existing_rows_count", 0L); r.put("deleted_rows_count", 0L)
      r: org.apache.avro.generic.GenericRecord
    }.toSeq
    val mlPath = new HPath(metaDir, s"snap-exp-${UUID.randomUUID().toString.take(8)}.avro")
    IcebergAvro.writeManifestList(mlPath, mlRecords, snapshotId, maxSeq)

    val snap = IcebergMetadata.IceSnapshot(
      snapshotId = snapshotId, parentId = None,
      sequenceNumber = maxSeq, timestampMs = System.currentTimeMillis(),
      manifestList = TableIO.qualified(mlPath),
      operation = "append", schemaId = 0,
      summary = Map("exported-from" -> graftRoot))
    val iceMeta = IcebergMetadata.IceMetadata(
      formatVersion = 2,
      tableUuid = UUID.randomUUID().toString,
      location = dest,
      lastSequenceNumber = maxSeq,
      lastColumnId = ice.maxId,
      currentSchemaId = 0,
      schemas = Seq(ice),
      defaultSpecId = m.defaultSpecId,
      specs = specsById.toSeq.sortBy(_._1)
        .map { case (sid, sf) => IcebergMetadata.IceSpec(sid, sf) },
      lastPartitionId = math.max(999, nextPartFieldId - 1),
      properties = Map(
        "write.format.default" -> "parquet",
        "schema.name-mapping.default" -> IcebergMetadata.nameMapping(ice),
        SourceVersionProp -> m.lastVersion.toString) ++
        // a legacy id-less source's parquet footers carry no field ids:
        // mark the export so interop readers resolve columns by NAME
        // (and refuse RENAME COLUMN) instead of failing id resolution
        (if (Meta.hasFieldIds(m.schema)) Map.empty
         else Map(IcebergMetadata.NameBasedFilesProp -> "true")),
      currentSnapshotId = Some(snapshotId),
      snapshots = Seq(snap),
      refs = Map("main" -> snapshotId))
    // carry the table's sort order when it's expressible in the spec
    // (plain column entries; z-order interleaving has no spec form)
    val exportedOrder = {
      val plain = m.sortOrder.filter(e => !e.contains("(") && !e.contains(" "))
      if (plain.isEmpty || plain.size != m.sortOrder.size) None
      else Some(IcebergMetadata.IceSortOrder(1, plain.flatMap(n =>
        ice.fields.find(_.name == n).map(f => IcebergMetadata.IceSortField(
          f.id, "identity", "asc", "nulls-first")))))
    }
    val withOrder = exportedOrder match {
      case Some(o) if o.fields.nonEmpty =>
        iceMeta.copy(sortOrders = Seq(o), defaultSortOrderId = 1)
      case _ => iceMeta
    }
    IcebergMetadata.write(dest, 1, withOrder)
  }

  /** Re-export only when the graft table has committed a newer
    * metadata version than the mirror records. Returns dest. */
  def exportIfStale(spark: SparkSession, graftRoot: String,
      dest: String): String = {
    val srcVersion = Meta.load(graftRoot).lastVersion
    val current = scala.util.Try(IcebergMetadata.load(dest))
      .toOption.flatMap(_.properties.get(SourceVersionProp))
      .flatMap(_.toIntOption)
    if (!current.contains(srcVersion)) {
      if (TableIO.exists(TableIO.path(dest)))
        TableIO.delete(TableIO.path(dest), recursive = true)
      export(spark, graftRoot, dest)
    }
    dest
  }

  private def fileSize(dataDir: HPath, f: Meta.DataFile): Long =
    if (f.fileSizeBytes > 0) f.fileSizeBytes
    else TableIO.size(new HPath(dataDir, f.path))

  /** graft canonical stat strings → Iceberg single-value binaries. */
  private def encodeStats(f: Meta.DataFile, ice: IcebergMetadata.IceSchema,
      schema: StructType)
      : (Map[Int, Array[Byte]], Map[Int, Array[Byte]], Map[Int, Long]) = {
    val lower = scala.collection.mutable.Map[Int, Array[Byte]]()
    val upper = scala.collection.mutable.Map[Int, Array[Byte]]()
    val nulls = scala.collection.mutable.Map[Int, Long]()
    f.stats.foreach { case (colName, st) =>
      for {
        id <- ice.fieldId(colName)
        field <- schema.fields.find(_.name == colName)
      } {
        nulls(id) = st.nullCount
        if (st.min.nonEmpty && st.max.nonEmpty) for {
          mn <- statValue(field.dataType, st.min)
          mx <- statValue(field.dataType, st.max)
        } {
          lower(id) = IcebergTypes.encode(field.dataType, mn)
          upper(id) = IcebergTypes.encode(field.dataType, mx)
        }
      }
    }
    (lower.toMap, upper.toMap, nulls.toMap)
  }

  /** Parse a canonical stat string back to the value IcebergTypes.encode
    * expects (inverse of IcebergTypes.decodeToCanonical). */
  private def statValue(t: DataType, s: String): Option[Any] = t match {
    case IntegerType | ShortType => s.toIntOption
    case LongType => s.toLongOption
    case FloatType => s.toFloatOption
    case DoubleType => s.toDoubleOption
    case StringType => Some(s)
    case DateType =>
      scala.util.Try(java.time.LocalDate.parse(s).toEpochDay.toInt).toOption
    case TimestampType | TimestampNTZType => scala.util.Try {
      // canonical form is UTC 'yyyy-MM-dd HH:mm:ss[.frac]'
      val ldt = java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    }.toOption
    case _: DecimalType => scala.util.Try(new java.math.BigDecimal(s)).toOption
    case _ => None
  }
}
