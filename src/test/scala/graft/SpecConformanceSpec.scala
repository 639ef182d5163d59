package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.table.iceberg.{IcebergTable, IcebergWrite}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DatumReader
import org.apache.hadoop.fs.{Path => HPath}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Bytes-level conformance of graft-WRITTEN real-format tables against
  * the PUBLISHED Iceberg v2 spec — the strongest in-sandbox stand-in
  * for a third-party reader (no independent Iceberg implementation is
  * installable here): the walk below never touches graft's own
  * metadata/manifest readers. It parses metadata.json with raw
  * Jackson, opens manifests and manifest lists with plain Avro
  * GenericDatumReader (embedded writer schema only), reads parquet
  * footers with parquet-mr directly, and asserts names, REQUIRED
  * fields, avro field-id attributes, file metadata keys, and
  * cross-file consistency against constants hand-copied from the
  * spec's manifest / manifest-list / single-value-serialization
  * tables. Anything a strict spec-driven reader resolves by — field
  * ids, partition-spec-id metadata, sequence numbers, record counts,
  * reserved delete-column ids — is checked from the bytes. */
class SpecConformanceSpec extends AnyFunSuite {
  import SparkTestSession._

  private val om = new ObjectMapper()

  private def tmp(): String =
    Files.createTempDirectory("graft-conf").toString + "/t"

  // spec: manifest_file schema field ids (manifest list entries)
  private val ManifestListIds = Map(
    "manifest_path" -> 500, "manifest_length" -> 501,
    "partition_spec_id" -> 502, "content" -> 517,
    "sequence_number" -> 515, "min_sequence_number" -> 516,
    "added_snapshot_id" -> 503, "added_files_count" -> 504,
    "existing_files_count" -> 505, "deleted_files_count" -> 506,
    "added_rows_count" -> 512, "existing_rows_count" -> 513,
    "deleted_rows_count" -> 514, "partitions" -> 507)

  // spec: manifest_entry schema field ids
  private val EntryIds = Map(
    "status" -> 0, "snapshot_id" -> 1, "sequence_number" -> 3,
    "file_sequence_number" -> 4, "data_file" -> 2)

  // spec: data_file struct field ids (required subset every writer
  // must emit; optional stat maps checked when present)
  private val DataFileIds = Map(
    "content" -> 134, "file_path" -> 100, "file_format" -> 101,
    "partition" -> 102, "record_count" -> 103,
    "file_size_in_bytes" -> 104)
  private val DataFileOptionalIds = Map(
    "column_sizes" -> 108, "value_counts" -> 109,
    "null_value_counts" -> 110, "nan_value_counts" -> 137,
    "lower_bounds" -> 125, "upper_bounds" -> 128,
    "key_metadata" -> 131, "split_offsets" -> 132,
    "equality_ids" -> 135, "sort_order_id" -> 140)

  // spec: reserved field ids of position-delete file columns
  private val PosDeletePathId = 2147483546L
  private val PosDeletePosId = 2147483545L

  private def fieldId(f: org.apache.avro.Schema.Field): Option[Int] =
    Option(f.getObjectProp("field-id")).map(_.toString.toInt)

  private def openAvro(path: String): (org.apache.avro.Schema,
      Map[String, String], Seq[GenericRecord]) = {
    val in = new org.apache.avro.file.SeekableFileInput(
      new java.io.File(new java.net.URI(path).getPath match {
        case "" => path
        case p => p
      }))
    val dr: DatumReader[GenericRecord] = new GenericDatumReader[GenericRecord]()
    val r = new DataFileReader[GenericRecord](in, dr)
    try {
      val meta = r.getMetaKeys.asScala.filterNot(_.startsWith("avro."))
        .map(k => k -> r.getMetaString(k)).toMap
      (r.getSchema, meta, r.iterator().asScala.toList)
    } finally r.close()
  }

  private def localPath(uri: String): String = {
    val u = new java.net.URI(uri)
    if (u.getScheme == null) uri else u.getPath
  }

  private def parquetFooter(path: String)
      : (Long, Map[String, Option[Int]]) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new HPath(localPath(path)), conf))
    try {
      val md = rd.getFooter.getFileMetaData.getSchema
      val rows = rd.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      val ids = md.getFields.asScala.map(f =>
        f.getName -> Option(f.getId).map(_.intValue())).toMap
      (rows, ids)
    } finally rd.close()
  }

  /** The independent walk: validate one table's full metadata tree
    * from the bytes, returning (live data rows by manifest counts,
    * live data file count). */
  private def walkAndValidate(loc: String): (Long, Int) = {
    // --- metadata.json: resolved via version-hint, parsed raw -------
    val hint = Files.readString(
      Paths.get(loc, "metadata", "version-hint.text")).trim.toInt
    val mj = om.readTree(Files.readString(
      Paths.get(loc, "metadata", s"v$hint.metadata.json")))
    for (k <- Seq("format-version", "table-uuid", "location",
        "last-sequence-number", "last-column-id", "current-schema-id",
        "schemas", "default-spec-id", "partition-specs",
        "last-partition-id", "snapshots", "refs"))
      assert(mj.has(k), s"metadata.json missing required key $k")
    assert(mj.get("format-version").asInt === 2)
    val schemas = mj.get("schemas").elements().asScala.toList
    val curSchemaId = mj.get("current-schema-id").asInt
    val curSchema = schemas.find(_.get("schema-id").asInt == curSchemaId)
      .getOrElse(fail("current-schema-id not in schemas"))
    assert(curSchema.get("type").asText === "struct")
    val idsInSchema: Map[Int, JsonNode] = curSchema.get("fields")
      .elements().asScala.map(f => f.get("id").asInt -> f).toMap
    idsInSchema.values.foreach { f =>
      for (k <- Seq("id", "name", "required", "type"))
        assert(f.has(k), s"schema field missing $k")
    }
    assert(mj.get("last-column-id").asInt >=
      schemas.flatMap(_.get("fields").elements().asScala)
        .map(_.get("id").asInt).max)
    val specsById = mj.get("partition-specs").elements().asScala
      .map(s => s.get("spec-id").asInt -> s).toMap
    assert(specsById.contains(mj.get("default-spec-id").asInt))
    specsById.values.flatMap(_.get("fields").elements().asScala).foreach {
      pf =>
        for (k <- Seq("source-id", "field-id", "name", "transform"))
          assert(pf.has(k), s"partition field missing $k")
        assert(pf.get("field-id").asInt >= 1000,
          "partition field ids live in the 1000+ range")
    }
    val snaps = mj.get("snapshots").elements().asScala.toList
    val curSnapId = mj.get("current-snapshot-id").asLong
    val curSnap = snaps.find(_.get("snapshot-id").asLong == curSnapId)
      .getOrElse(fail("current-snapshot-id not in snapshots"))
    assert(mj.get("refs").get("main").get("snapshot-id").asLong === curSnapId)
    // every ref (branches from WAP transactions, tags) must be a
    // spec-shaped SnapshotReference resolving to a known snapshot
    val refEntries = mj.get("refs").properties().asScala.toList
    refEntries.foreach { e =>
      val r = e.getValue
      assert(r.has("snapshot-id"), s"ref ${e.getKey} missing snapshot-id")
      assert(r.has("type"), s"ref ${e.getKey} missing type")
      assert(Set("branch", "tag").contains(r.get("type").asText),
        s"ref ${e.getKey} type '${r.get("type").asText}' not branch|tag")
      assert(snaps.exists(_.get("snapshot-id").asLong ==
        r.get("snapshot-id").asLong),
        s"ref ${e.getKey} points at a snapshot not in the metadata")
      // SnapshotRetention fields: positive when present, and a tag
      // carries ONLY max-ref-age-ms (snapshot.rs SnapshotRetention)
      Seq("min-snapshots-to-keep", "max-snapshot-age-ms",
          "max-ref-age-ms").foreach { f =>
        Option(r.get(f)).foreach(v => assert(v.asLong > 0,
          s"ref ${e.getKey} $f must be positive"))
      }
      if (r.get("type").asText == "tag")
        Seq("min-snapshots-to-keep", "max-snapshot-age-ms").foreach(f =>
          assert(!r.has(f),
            s"tag ${e.getKey} carries branch-only retention field $f"))
    }
    // snapshot-log: every entry resolves to a retained snapshot,
    // timestamps never regress, and the tail IS the current snapshot
    // (timestamp-based time travel resolves against this record)
    val slog = Option(mj.get("snapshot-log")).toSeq
      .flatMap(_.elements().asScala)
    slog.foreach(e => assert(snaps.exists(_.get("snapshot-id").asLong ==
      e.get("snapshot-id").asLong),
      "snapshot-log entry references an expired/unknown snapshot"))
    assert(slog.map(_.get("timestamp-ms").asLong) ===
      slog.map(_.get("timestamp-ms").asLong).sorted,
      "snapshot-log timestamps must be non-decreasing")
    if (slog.nonEmpty)
      assert(slog.last.get("snapshot-id").asLong === curSnapId,
        "snapshot-log tail must be the current snapshot")
    // metadata-log: prior version files, resolvable on disk, ordered
    val mlog = Option(mj.get("metadata-log")).toSeq
      .flatMap(_.elements().asScala)
    mlog.foreach { e =>
      val p = e.get("metadata-file").asText
      assert(p.endsWith(".metadata.json"),
        s"metadata-log entry is not a metadata file: $p")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
        new java.net.URI(p).getPath)),
        s"metadata-log names a missing file: $p")
    }
    assert(mlog.map(_.get("timestamp-ms").asLong) ===
      mlog.map(_.get("timestamp-ms").asLong).sorted,
      "metadata-log timestamps must be non-decreasing")
    snaps.foreach { s =>
      for (k <- Seq("snapshot-id", "timestamp-ms", "manifest-list",
          "summary", "sequence-number"))
        assert(s.has(k), s"snapshot missing $k")
      assert(s.get("summary").has("operation"))
    }
    assert(mj.get("last-sequence-number").asLong >=
      snaps.map(_.get("sequence-number").asLong).max)

    // --- manifest list: plain avro, spec field ids ------------------
    // one walk per snapshot tree: the current snapshot's AND every
    // other ref head's (a WAP audit branch, a tag) — a strict reader
    // resolves `VERSION AS OF 'branch'` through exactly this tree
    def walkSnapshot(snap: JsonNode)
        : (Long, Int, Seq[GenericRecord]) = {
    val (mlSchema, _, mlRecs) =
      openAvro(snap.get("manifest-list").asText)
    ManifestListIds.foreach { case (name, id) =>
      val f = mlSchema.getField(name)
      assert(f != null, s"manifest list schema missing $name")
      assert(fieldId(f).contains(id),
        s"manifest list $name carries field-id ${fieldId(f)}, spec says $id")
    }
    var liveRows = 0L
    var liveFiles = 0
    mlRecs.foreach { mf =>
      val mPath = mf.get("manifest_path").toString
      val mLen = mf.get("manifest_length").asInstanceOf[Long]
      assert(Files.size(Paths.get(localPath(mPath))) === mLen,
        "manifest_length must equal the actual file size")
      val content = mf.get("content").asInstanceOf[Int]
      assert(content == 0 || content == 1)
      val specId = mf.get("partition_spec_id").asInstanceOf[Int]
      assert(specsById.contains(specId),
        s"manifest references unknown spec $specId")
      assert(mf.get("sequence_number").asInstanceOf[Long] <=
        mj.get("last-sequence-number").asLong)
      assert(mf.get("min_sequence_number").asInstanceOf[Long] <=
        mf.get("sequence_number").asInstanceOf[Long])

      // --- each manifest: entry schema ids + required file metadata
      val (mSchema, mMeta, mEntries) = openAvro(mPath)
      for (k <- Seq("schema", "partition-spec", "partition-spec-id",
          "format-version", "content"))
        assert(mMeta.contains(k),
          s"manifest avro metadata missing required key $k")
      assert(mMeta("format-version") === "2")
      assert(mMeta("content") === (if (content == 0) "data" else "deletes"))
      assert(mMeta("partition-spec-id").toInt === specId,
        "partition-spec-id metadata must match the list entry's spec")
      val embSpec = om.readTree(mMeta("partition-spec"))
      assert(embSpec.get("spec-id").asInt === specId)
      assert(om.readTree(mMeta("schema")).get("type").asText === "struct")
      EntryIds.foreach { case (name, id) =>
        val f = mSchema.getField(name)
        assert(f != null, s"manifest entry schema missing $name")
        assert(fieldId(f).contains(id),
          s"entry $name carries ${fieldId(f)}, spec says $id")
      }
      val dfSchema = {
        val s = mSchema.getField("data_file").schema()
        if (s.getType == org.apache.avro.Schema.Type.UNION)
          s.getTypes.asScala.find(
            _.getType != org.apache.avro.Schema.Type.NULL).get
        else s
      }
      (DataFileIds ++ DataFileOptionalIds.filter { case (n, _) =>
        dfSchema.getField(n) != null }).foreach { case (name, id) =>
        val f = dfSchema.getField(name)
        assert(f != null, s"data_file schema missing required $name")
        assert(fieldId(f).contains(id),
          s"data_file $name carries ${fieldId(f)}, spec says $id")
      }

      mEntries.foreach { e =>
        val status = e.get("status").asInstanceOf[Int]
        assert(Set(0, 1, 2).contains(status))
        val d = e.get("data_file").asInstanceOf[GenericRecord]
        val fPath = d.get("file_path").toString
        assert(d.get("file_format").toString.equalsIgnoreCase("parquet"))
        val rc = d.get("record_count").asInstanceOf[Long]
        val fsz = d.get("file_size_in_bytes").asInstanceOf[Long]
        if (status != 2) {
          assert(Files.size(Paths.get(localPath(fPath))) === fsz,
            "file_size_in_bytes must equal the actual file size")
          // parquet footers open independently, row counts agree, and
          // TOP-LEVEL field ids match the table schema (reserved ids
          // for position-delete columns)
          val (rows, colIds) = parquetFooter(fPath)
          assert(rows === rc,
            s"record_count $rc != parquet footer rows $rows for $fPath")
          val fc = d.get("content").asInstanceOf[Int]
          if (content == 0) {
            assert(fc === 0)
            liveRows += rc; liveFiles += 1
            colIds.foreach { case (cn, cid) =>
              cid.foreach(i => assert(idsInSchema.contains(i) ||
                schemas.exists(_.get("fields").elements().asScala
                  .exists(_.get("id").asInt == i)),
                s"data column $cn carries unknown field id $i"))
            }
          } else {
            assert(fc === 1 || fc === 2)
            if (fc == 1) {
              assert(colIds.get("file_path").flatten
                .contains(PosDeletePathId.toInt),
                "position-delete file_path must carry reserved id 2147483546")
              assert(colIds.get("pos").flatten
                .contains(PosDeletePosId.toInt),
                "position-delete pos must carry reserved id 2147483545")
            } else {
              val eqIds = Option(d.get("equality_ids"))
                .map(_.asInstanceOf[java.util.Collection[Any]].asScala
                  .map(_.toString.toInt).toSet)
                .getOrElse(Set.empty)
              assert(eqIds.nonEmpty,
                "equality delete entries must carry equality_ids")
              eqIds.foreach(i => assert(idsInSchema.contains(i),
                s"equality id $i not in current schema"))
            }
          }
        }
      }
    }
    (liveRows, liveFiles, mlRecs)
    }

    val (liveRows, liveFiles, mlRecs) = walkSnapshot(curSnap)
    refEntries.map(_.getValue.get("snapshot-id").asLong).distinct
      .filterNot(_ == curSnapId).foreach { id =>
        walkSnapshot(snaps.find(_.get("snapshot-id").asLong == id).get)
      }
    // position-delete ROW contents: every (file_path, pos) slot must
    // name a live data file and a position inside its row count —
    // dangling or out-of-range slots would silently change fold
    // results in strict readers
    val dataRows: Map[String, Long] = mlRecs.filter(
      _.get("content").asInstanceOf[Int] == 0).flatMap { mf =>
        openAvro(mf.get("manifest_path").toString)._3
          .filter(_.get("status").asInstanceOf[Int] != 2)
          .map { e =>
            val d = e.get("data_file").asInstanceOf[GenericRecord]
            localPath(d.get("file_path").toString) ->
              d.get("record_count").asInstanceOf[Long]
          }
      }.toMap
    mlRecs.filter(_.get("content").asInstanceOf[Int] == 1).foreach { mf =>
      openAvro(mf.get("manifest_path").toString)._3
        .filter(e => e.get("status").asInstanceOf[Int] != 2)
        .map(_.get("data_file").asInstanceOf[GenericRecord])
        .filter(_.get("content").asInstanceOf[Int] == 1)
        .foreach { d =>
          val rows = SparkTestSession.spark.read
            .parquet(localPath(d.get("file_path").toString))
            .select("file_path", "pos").collect()
          rows.foreach { r =>
            val ref = localPath(r.getString(0))
            assert(dataRows.contains(ref),
              s"position delete references unknown data file $ref")
            assert(r.getLong(1) >= 0 && r.getLong(1) < dataRows(ref),
              s"position ${r.getLong(1)} out of range for $ref " +
                s"(rows ${dataRows(ref)})")
          }
        }
    }
    (liveRows, liveFiles)
  }

  test("direct-written table with transform partitions + deletes conforms") {
    val spark0 = spark
    import spark0.implicits._
    val o = Tables.orders(spark, sf)
    val loc = tmp()
    IcebergWrite.createWithSpec(spark, loc, o,
      Seq("o_orderdate" -> "month", "o_custkey" -> "bucket[4]"))
    IcebergWrite.append(spark, loc, o.limit(500))
    IcebergWrite.deleteEquality(spark, loc,
      Seq("1-URGENT").toDF("o_orderpriority"), Seq("o_orderpriority"))
    val t = IcebergTable.load(spark, loc)
    val posTarget = t.plannedFiles().head._1.filePath
    IcebergWrite.deletePositional(spark, loc,
      Seq((posTarget, 0L), (posTarget, 2L)).toDF("file_path", "pos"))

    val (liveRows, liveFiles) = walkAndValidate(loc)
    assert(liveFiles > 0)
    // the byte-level walk's row accounting matches a raw count of the
    // live data parquet (deletes are logical, data files untouched)
    assert(liveRows === o.count() + 500)
    // ... and graft's own MoR scan agrees with the spec'd delete
    // semantics the walk validated structurally: hidden = urgent rows
    // (eq delete) UNION slots {0,2} of the targeted file (pos delete)
    // — a slot that is ALSO urgent must not be double-counted
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").count() +
      o.limit(500).filter(col("o_orderpriority") === "1-URGENT").count()
    val overlap = spark.read.parquet(localPath(posTarget))
      .withColumn("__i", col("_metadata.row_index"))
      .filter(col("__i").isin(0L, 2L) &&
        col("o_orderpriority") === "1-URGENT").count()
    assert(t.scan().count() === liveRows - urgent - 2 + overlap)
  }

  test("catalog SQL DML (delta write path) produces conformant bytes") {
    val spark0 = spark
    import spark0.implicits._
    val loc = tmp()
    IcebergWrite.create(spark, loc,
      (1 to 300).map(i => (i, s"v$i", i * 2.0)).toDF("k", "v", "w")
        .repartition(3))
    val cat = s"conf_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      Files.createTempDirectory("graft-confwh").toString)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.m")
    spark.sql(s"CALL $cat.system.register_table(table => 'm.t', " +
      s"location => '$loc')")
    spark.sql(s"INSERT INTO $cat.m.t VALUES (301, 'x', 1.5)")
    spark.sql(s"DELETE FROM $cat.m.t WHERE k % 7 = 0 AND length(v) >= 1")
    spark.sql(s"UPDATE $cat.m.t SET w = w + 1 WHERE k % 11 = 0")
    spark.sql(s"DELETE FROM $cat.m.t WHERE k IN (5, 6)") // equality
    // schema evolution must keep the tree conformant
    spark.sql(s"ALTER TABLE $cat.m.t RENAME COLUMN v TO label")
    spark.sql(s"ALTER TABLE $cat.m.t ALTER COLUMN k TYPE BIGINT")

    val (liveRows, _) = walkAndValidate(loc)
    // physical rows = 300 created + 1 inserted + the delta UPDATE's
    // appended row versions (old slots position-deleted, not rewritten)
    val updated = (1L to 300L).count(k => k % 11 == 0 && k % 7 != 0)
    assert(liveRows === 301L + updated)
    val expected = (1L to 301L)
      .filterNot(_ % 7 == 0).filterNot(Set(5L, 6L))
    assert(spark.sql(s"SELECT count(*) FROM $cat.m.t")
      .collect()(0).getLong(0) === expected.size.toLong)
  }

  test("transaction WAP branches, staged-rewrite lineage, added spec, " +
      "and tags produce conformant bytes (round-16 write shapes)") {
    val spark0 = spark
    import spark0.implicits._
    val wh = Files.createTempDirectory("graft-confwap").toString
    val server = new graft.table.iceberg.IcebergRestServer(wh).start()
    try {
      val base = s"http://127.0.0.1:${server.port}"
      val cat = s"confw_${java.util.UUID.randomUUID().toString.take(6)}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.spark.GraftTableCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.uri", base)
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.w")
      spark.sql(s"CREATE TABLE $cat.w.t (k BIGINT, v STRING)")
      spark.sql(s"INSERT INTO $cat.w.t VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
      val loc = s"$wh/w/t"
      def raw(): JsonNode = {
        val hint = Files.readString(
          Paths.get(loc, "metadata", "version-hint.text")).trim.toInt
        om.readTree(Files.readString(
          Paths.get(loc, "metadata", s"v$hint.metadata.json")))
      }

      // (a) WAP write step: audit branch forked + staged by a
      // transaction — the refs object must serialize spec-shaped
      // SnapshotReference entries, and the audit head must be a fully
      // walkable tree (main untouched)
      val mainHead = raw().get("current-snapshot-id").asLong
      val tx = new graft.table.iceberg.IcebergTransaction(spark, base)
      tx.setSnapshotRef("w", "t", "audit", mainHead)
      tx.append("w", "t", Seq((10L, "x"), (11L, "y")).toDF("k", "v"),
        toRef = "audit")
      tx.commit()
      var mj = raw()
      assert(mj.get("refs").get("audit").get("type").asText === "branch")
      assert(mj.get("current-snapshot-id").asLong === mainHead,
        "main must not move on the WAP write step")
      walkAndValidate(loc) // walks main AND the audit head's tree

      // publish: every branch move in one protocol commit
      val tx2 = new graft.table.iceberg.IcebergTransaction(spark, base)
      tx2.fastForward("w", "t", "main", fromRef = "audit")
      tx2.dropSnapshotRef("w", "t", "audit")
      tx2.commit()
      mj = raw()
      assert(!mj.get("refs").has("audit"), "dropped ref must leave refs JSON")
      val (rows1, _) = walkAndValidate(loc)
      assert(rows1 === 6L)

      // (b) transaction-staged rewrite: operation='replace' with the
      // lineage stamped as additional summary keys
      val tx3 = new graft.table.iceberg.IcebergTransaction(spark, base)
      tx3.rewrite("w", "t", lineage = Map(
        "pipeline.run-id" -> "r17", "source.orders.snapshot" -> "42"))
      tx3.commit()
      mj = raw()
      val rw = mj.get("snapshots").elements().asScala.toList
        .find(_.get("summary").get("operation").asText == "replace")
        .getOrElse(fail("no replace snapshot after transaction rewrite"))
      assert(rw.get("summary").get("pipeline.run-id").asText === "r17")
      assert(rw.get("summary").get("source.orders.snapshot").asText === "42")
      val (rows2, files2) = walkAndValidate(loc)
      assert(rows2 === 6L)
      assert(files2 >= 1)

      // (c) addPartitionSpec-minted spec JSON: field-id allocation in
      // the 1000+ range above every prior spec, unique spec ids,
      // last-partition-id covering the allocation; a post-spec append
      // walks with manifests referencing the NEW spec id
      val tx4 = new graft.table.iceberg.IcebergTransaction(spark, base)
      tx4.addPartitionSpec("w", "t", Seq("k" -> "bucket[4]"))
      tx4.commit()
      val tx5 = new graft.table.iceberg.IcebergTransaction(spark, base)
      tx5.append("w", "t", Seq((20L, "z")).toDF("k", "v"))
      tx5.commit()
      mj = raw()
      val specs = mj.get("partition-specs").elements().asScala.toList
      assert(specs.size >= 2, "added spec must join partition-specs")
      assert(specs.map(_.get("spec-id").asInt).distinct.size === specs.size,
        "spec ids must be unique")
      val defSpec = specs.find(
        _.get("spec-id").asInt == mj.get("default-spec-id").asInt).get
      val fids = defSpec.get("fields").elements().asScala
        .map(_.get("field-id").asInt).toList
      assert(fids.nonEmpty && fids.forall(_ >= 1000))
      assert(mj.get("last-partition-id").asInt >= fids.max,
        "last-partition-id must cover the minted allocation")
      val (rows3, _) = walkAndValidate(loc)
      assert(rows3 === 7L)

      // (d) a tag must serialize as SnapshotReference type 'tag' — a
      // strict reader applies tag retention semantics, not branch
      spark.sql(s"CALL $cat.system.create_tag(table => 'w.t', " +
        "tag => 'v1', max_ref_age_ms => 604800000)")
      spark.sql(s"CALL $cat.system.create_branch(table => 'w.t', " +
        "branch => 'hist', min_snapshots_to_keep => 3, " +
        "max_snapshot_age_ms => 86400000)")
      mj = raw()
      assert(mj.get("refs").get("v1").get("type").asText === "tag",
        "a tag serialized as 'branch' would change retention semantics " +
          "in strict readers")
      assert(mj.get("refs").get("v1").get("max-ref-age-ms").asLong ===
        604800000L)
      assert(mj.get("refs").get("hist").get("min-snapshots-to-keep")
        .asInt === 3)
      assert(mj.get("refs").get("hist").get("max-snapshot-age-ms")
        .asLong === 86400000L)
      walkAndValidate(loc) // retention fields ride the refs validation
    } finally server.stop()
  }

  test("heavily evolved table (adds, drops, converts) stays conformant") {
    val spark0 = spark
    import spark0.implicits._
    val loc = tmp()
    IcebergWrite.create(spark, loc,
      (1 to 300).map(i => (i, s"v$i", s"g$i")).toDF("k", "v", "gone")
        .repartition(2))
    val cat = s"confe_${java.util.UUID.randomUUID().toString.take(8)}"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.spark.GraftTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse",
      Files.createTempDirectory("graft-confewh").toString)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.m")
    spark.sql(s"CALL $cat.system.register_table(table => 'm.t', " +
      s"location => '$loc')")
    // equality delete committed under the ORIGINAL key name, THEN the
    // key renamed: the delete file's column label goes stale but its
    // equality id stays current — exactly what the walk's
    // eq-id-in-current-schema assert must still accept
    spark.sql(s"DELETE FROM $cat.m.t WHERE k IN (1, 2, 3)")
    spark.sql(s"ALTER TABLE $cat.m.t RENAME COLUMN k TO id")
    walkAndValidate(loc)
    // widen the schema and write under BOTH eras
    spark.sql(s"ALTER TABLE $cat.m.t ADD COLUMN score BIGINT")
    spark.sql(s"INSERT INTO $cat.m.t VALUES (301, 'x', 'gx', 9)")
    spark.sql(s"UPDATE $cat.m.t SET score = 5 WHERE id = 10")
    // eq->pos conversion drops the (stale-labeled) equality file;
    // the replacement slots must still pass the walk's
    // position-in-range and live-file-reference row checks
    spark.sql(s"CALL $cat.system.rewrite_delete_files(" +
      s"table => 'm.t', mode => 'convert')")
    // retire a column and promote the renamed key: three schemas of
    // three eras now coexist in one metadata tree
    spark.sql(s"ALTER TABLE $cat.m.t DROP COLUMN gone")
    spark.sql(s"ALTER TABLE $cat.m.t ALTER COLUMN id TYPE BIGINT")

    val (liveRows, _) = walkAndValidate(loc)
    // 300 created + 1 inserted + 1 delta-update row version
    assert(liveRows === 302L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.m.t")
      .collect()(0).getLong(0) === 298L) // 300 - 3 deleted + 1 insert
    assert(spark.sql(
      s"SELECT sum(score) FROM $cat.m.t").collect()(0).getLong(0) === 14L)
  }
}
