package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.GraftConnectorShim
import org.apache.spark.sql.types.StructType
import graft.table.TableIO
import graft.table.iceberg.{IcebergAvro, IcebergMetadata, IcebergTable}

/** Streaming SOURCE over a FOREIGN (real-format) Iceberg table: each
  * micro-batch reads the data files ADDED by the snapshots committed
  * since the last batch — the incremental append scan over another
  * engine's output, i.e. the CDC-ingest shape (reference:
  * datafusion_iceberg streams new snapshots the same way; Iceberg
  * calls this the incremental append read).
  *
  * Iceberg snapshot ids are arbitrary longs (not monotonic), so
  * ordering follows the CURRENT snapshot's parent-chain ancestry, not
  * id comparison: the chain from the table's first snapshot to the
  * head is the stream's timeline, and a checkpointed snapshot that is
  * no longer in that ancestry (expired, or rolled back past) fails
  * the stream loudly instead of replaying the wrong range.
  *
  * Per-snapshot added files resolve from the snapshot's OWN manifests
  * only (manifest-list entries with added_snapshot_id = snapshot,
  * entries with status ADDED) — IO per poll scales with the delta,
  * not the table. Operations: `append` emits; `replace` (compaction —
  * rows preserved) is skipped; `overwrite` / `delete`, and any
  * snapshot that ADDS delete manifests, fail loudly — an append-only
  * stream cannot represent removed or replaced rows.
  *
  * ADMISSION CONTROL mirrors GraftMicroBatchStream: maxFilesPerTrigger
  * / maxBytesPerTrigger clamp each micro-batch at FILE granularity
  * with (snapshotId, filePos, listHash) offsets, so one giant foreign
  * append drains in bounded, checkpoint-resumable batches. Snapshots
  * whose whole delta fits the remaining budget are admitted from the
  * snapshot summary / manifest-list counts alone where possible; the
  * per-snapshot file lists are memoized for the query's lifetime, so
  * steady-state polls do not re-read manifests. */
class IcebergMicroBatchStream(location: String, requiredSchema: StructType,
    options: Map[String, String] = Map.empty)
  extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private case class IceOffset(id: Long, filePos: Int, listHash: Long)
      extends Offset {
    // boundary offsets serialize as the bare snapshot id, partial
    // offsets as id:pos:hash — same wire format as the graft source
    override def json(): String =
      if (filePos < 0) id.toString else s"$id:$filePos:$listHash"
  }

  private def complete(id: Long) = IceOffset(id, -1, 0L)

  private def opt(name: String): Option[String] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }

  private def loadMeta(): IcebergMetadata.IceMetadata =
    IcebergMetadata.load(location)

  /** Stream head: a pinned branch ref, else the current snapshot. */
  private def headId(m: IcebergMetadata.IceMetadata): Long =
    opt("branch") match {
      case Some(b) => m.refs.getOrElse(b, throw new IllegalArgumentException(
        s"branch '$b' not found in Iceberg table $location"))
      case None => m.currentSnapshotId.getOrElse(0L)
    }

  /** Ancestry chain oldest→newest ending at `head` (main timeline —
    * snapshots of other branches / rolled-back orphans are excluded). */
  private def chain(m: IcebergMetadata.IceMetadata,
      head: Long): Vector[IcebergMetadata.IceSnapshot] = {
    val byId = m.snapshots.map(s => s.snapshotId -> s).toMap
    var acc = List.empty[IcebergMetadata.IceSnapshot]
    var cur = byId.get(head)
    while (cur.isDefined) {
      acc = cur.get :: acc
      cur = cur.get.parentId.flatMap(byId.get)
    }
    acc.toVector
  }

  /** (added data-file entries, addsDeleteManifests) for one snapshot,
    * memoized for the stream's lifetime (snapshot content is
    * immutable). The manifest walk touches only manifests this
    * snapshot ADDED. */
  private val addedCache = new java.util.concurrent.ConcurrentHashMap[
    Long, (Seq[IcebergAvro.DataFileEntry], Boolean)]()

  private def added(m: IcebergMetadata.IceMetadata,
      sn: IcebergMetadata.IceSnapshot)
      : (Seq[IcebergAvro.DataFileEntry], Boolean) =
    addedCache.computeIfAbsent(sn.snapshotId, _ => {
      val t = IcebergTable.fromMetadataAt(SparkSession.active, location, m)
      val mine = IcebergAvro.readManifestList(t.resolvePath(sn.manifestList))
        .filter(_.addedSnapshotId == sn.snapshotId)
      val files = mine.filter(_.content == 0)
        .flatMap(mf => IcebergAvro.readManifest(t.resolvePath(mf.path)))
        .filter(e => e.status == 1 && e.content == 0)
      (files, mine.exists(_.content == 1))
    })

  /** Whole-snapshot (files, bytes) without resolving entries, when the
    * metadata can say: snapshot summary first (foreign writers stamp
    * added-data-files / added-files-size), manifest-list counts for
    * the file side otherwise. None -> caller resolves the file list. */
  private def deltaCounts(m: IcebergMetadata.IceMetadata,
      sn: IcebergMetadata.IceSnapshot, needBytes: Boolean)
      : Option[(Long, Long)] = {
    val sumFiles = sn.summary.get("added-data-files").flatMap(_.toLongOption)
    val sumBytes = sn.summary.get("added-files-size").flatMap(_.toLongOption)
    (sumFiles, sumBytes) match {
      case (Some(f), Some(b)) => Some((f, b))
      case (Some(f), None) if !needBytes => Some((f, 0L))
      case _ if !needBytes =>
        val t = IcebergTable.fromMetadataAt(SparkSession.active, location, m)
        val mine = IcebergAvro.readManifestList(t.resolvePath(sn.manifestList))
          .filter(mf => mf.addedSnapshotId == sn.snapshotId && mf.content == 0)
        val counts = mine.map(_.addedFilesCount)
        if (counts.forall(_.isDefined)) Some((counts.flatten.map(_.toLong).sum, 0L))
        else None
      case _ => None
    }
  }

  private def filesHash(files: Seq[IcebergAvro.DataFileEntry]): Long =
    scala.util.hashing.MurmurHash3.orderedHash(files.map(_.filePath)).toLong

  /** Fresh streams start from the beginning of the ancestry chain
    * unless `startingSnapshotId` pins a later start (changes AFTER
    * that snapshot only — Iceberg's stream-from-snapshot option). */
  override def initialOffset(): Offset =
    complete(opt("startingSnapshotId").map(_.toLong).getOrElse(0L))

  override def getDefaultReadLimit: ReadLimit = {
    val limits = Seq(
      opt("maxFilesPerTrigger").map(n => ReadLimit.maxFiles(n.toInt)),
      opt("maxBytesPerTrigger").map(n => ReadLimit.maxBytes(n.toLong))).flatten
    limits match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** Trigger.AvailableNow: pin the drain target at query start. */
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(headId(loadMeta()))

  private def caps(limit: ReadLimit): (Long, Long) = limit match {
    case f: ReadMaxFiles => (f.maxFiles().toLong, Long.MaxValue)
    case b: ReadMaxBytes => (Long.MaxValue, b.maxBytes())
    case c: CompositeReadLimit =>
      c.getReadLimits.map(caps).reduce((a, b) =>
        (math.min(a._1, b._1), math.min(a._2, b._2)))
    case _ => (Long.MaxValue, Long.MaxValue)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[IceOffset]
    val m = loadMeta()
    val ch = chain(m, headId(m))
    if (ch.isEmpty) return complete(s.id)
    val startIdx =
      if (s.id == 0L) -1
      else {
        val i = ch.indexWhere(_.snapshotId == s.id)
        if (i < 0) throw new IllegalStateException(
          s"checkpointed snapshot ${s.id} is no longer in the ancestry of " +
            s"Iceberg table $location (expired or rolled back past); the " +
            "stream cannot resume exactly — re-read the table as a batch " +
            "source and start a fresh stream")
        i
      }
    // AvailableNow cap: pending stops at the pinned head
    val capIdx = availableNowCap match {
      case Some(cap) =>
        val i = ch.indexWhere(_.snapshotId == cap)
        if (i < 0) startIdx else i
      case None => ch.size - 1
    }
    val startPartial = if (s.filePos >= 0) Some(ch(startIdx)) else None
    val pending = ch.slice(startIdx + 1, capIdx + 1)
    if (startPartial.isEmpty && pending.isEmpty) return complete(s.id)

    val (maxFiles, maxBytes) = caps(limit)
    var files = 0L; var bytes = 0L
    var admittedAny = false
    var end: IceOffset = s

    // admit one snapshot's added files from index `from`; admits at
    // least one file overall so the stream always progresses. Returns
    // false when the budget ran out mid-snapshot.
    def admitFiles(sn: IcebergMetadata.IceSnapshot, from: Int): Boolean = {
      val fs = added(m, sn)._1
      var i = from
      while (i < fs.size) {
        val f = fs(i)
        if (admittedAny &&
            (files + 1 > maxFiles || bytes + f.fileSizeBytes > maxBytes)) {
          end = IceOffset(sn.snapshotId, i, filesHash(fs))
          return false
        }
        files += 1; bytes += f.fileSizeBytes; admittedAny = true
        i += 1
      }
      end = complete(sn.snapshotId)
      true
    }

    startPartial.foreach { sn =>
      if (!admitFiles(sn, s.filePos)) return end
    }
    val needBytes = maxBytes != Long.MaxValue
    val it = pending.iterator
    var stop = false
    while (it.hasNext && !stop) {
      val sn = it.next()
      if (sn.operation != "append") end = complete(sn.snapshotId)
        // replace skips silently at plan time; overwrite/delete fail
        // loudly there — either way the offset advances past it
      else deltaCounts(m, sn, needBytes) match {
        case Some((f, b)) if files + f <= maxFiles && bytes + b <= maxBytes =>
          files += f; bytes += b
          admittedAny |= f > 0
          end = complete(sn.snapshotId)
        case _ => stop = !admitFiles(sn, 0)
      }
    }
    end
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def reportLatestOffset(): Offset = complete(headId(loadMeta()))

  override def deserializeOffset(json: String): Offset = json.split(":") match {
    case Array(id) => complete(id.toLong)
    case Array(id, p, h) => IceOffset(id.toLong, p.toInt, h.toLong)
    case _ => throw new IllegalArgumentException(s"bad stream offset: $json")
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[IceOffset]
    val e = end.asInstanceOf[IceOffset]
    if (s.id == e.id && (e.filePos < 0 && s.filePos < 0 || e.filePos == s.filePos))
      return Array.empty
    val m = loadMeta()
    val ch = chain(m, headId(m))
    val idxOf = ch.iterator.map(_.snapshotId).zipWithIndex.toMap
    val sIdx =
      if (s.id == 0L) -1
      else idxOf.getOrElse(s.id, throw new IllegalStateException(
        s"checkpointed snapshot ${s.id} is no longer in the ancestry of " +
          s"Iceberg table $location (expired or rolled back past); the " +
          "stream cannot resume exactly — re-read the table as a batch " +
          "source and start a fresh stream"))
    val eIdx = idxOf.getOrElse(e.id, throw new IllegalStateException(
      s"batch end snapshot ${e.id} is no longer in the ancestry of " +
        s"Iceberg table $location; the stream cannot resume exactly"))
    // partial checkpoint: verify the file list still means what the
    // checkpoint indexed (a rewritten list must not replay wrong files)
    if (s.filePos >= 0) {
      val sn = ch(sIdx)
      if (filesHash(added(m, sn)._1) != s.listHash)
        throw new IllegalStateException(
          s"snapshot ${s.id}'s added-file list changed since the " +
            "checkpoint; the stream cannot resume exactly — re-read the " +
            "table as a batch source and start a fresh stream")
    }
    val inRange = ch.slice(sIdx + 1, eIdx + 1)
    // ops an append-only stream cannot represent fail loudly; a
    // snapshot that ADDS delete manifests does too, whatever its label
    inRange.find(sn => sn.operation != "append" && sn.operation != "replace")
      .foreach(sn => throw new IllegalStateException(
        s"streaming read reached ${sn.operation} snapshot ${sn.snapshotId} " +
          s"of Iceberg table $location; append-only streams cannot " +
          "represent replaced/deleted rows — re-read the table as a batch " +
          "source"))
    inRange.filter(_.operation == "append").find(sn => added(m, sn)._2)
      .foreach(sn => throw new IllegalStateException(
        s"snapshot ${sn.snapshotId} of Iceberg table $location adds delete " +
          "files; append-only streams cannot represent deleted rows — " +
          "re-read the table as a batch source"))
    def emits(sn: IcebergMetadata.IceSnapshot): Boolean =
      sn.operation == "append"
    val startTail: Seq[IcebergAvro.DataFileEntry] =
      if (s.filePos < 0) Seq.empty
      else {
        val fs = added(m, ch(sIdx))._1
        val upto =
          if (e.id != s.id || e.filePos < 0) fs.size else e.filePos
        fs.slice(s.filePos, upto)
      }
    val mids = inRange.filter(_.snapshotId != e.id).filter(emits)
      .flatMap(sn => added(m, sn)._1)
    val endFiles: Seq[IcebergAvro.DataFileEntry] =
      if (e.id == s.id) Seq.empty
      else inRange.find(_.snapshotId == e.id).filter(emits).toSeq.flatMap { sn =>
        val fs = added(m, sn)._1
        if (e.filePos < 0) fs else fs.take(e.filePos)
      }
    val addedFiles = startTail ++ mids ++ endFiles
    if (addedFiles.isEmpty) return Array.empty
    val t = IcebergTable.fromMetadataAt(SparkSession.active, location, m)
    val targetBytes = 128L * 1024 * 1024
    val bins = scala.collection.mutable.ArrayBuffer[Seq[IcebergAvro.DataFileEntry]]()
    var cur = scala.collection.mutable.ArrayBuffer[IcebergAvro.DataFileEntry]()
    var curBytes = 0L
    addedFiles.foreach { f =>
      if (curBytes + f.fileSizeBytes > targetBytes && cur.nonEmpty) {
        bins += cur.toSeq
        cur = scala.collection.mutable.ArrayBuffer(); curBytes = 0L
      }
      cur += f; curBytes += f.fileSizeBytes
    }
    if (cur.nonEmpty) bins += cur.toSeq
    bins.zipWithIndex.map { case (bin, i) =>
      GraftConnectorShim.filePartition(i, bin.map { f =>
        GraftConnectorShim.partitionedFile(
          TableIO.qualified(t.resolvePath(f.filePath)), f.fileSizeBytes, 0L)
      }): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val ice = loadMeta()
    // field-id resolution, same as the batch scan: a stream replaying
    // from an early snapshot reads files written BEFORE a rename, and
    // name-based resolution would silently null-fill their columns
    def withIds(s: StructType): StructType =
      if (!IcebergTable.load(spark, location).fileIdResolution) s
      else StructType(s.fields.map(f => ice.schema.fieldId(f.name) match {
        case Some(id) => f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putLong(graft.table.Meta.FieldIdKey, id.toLong).build())
        case None => f
      }))
    UnwrapKeyedFactory(GraftConnectorShim.parquetReaderFactory(
      spark, withIds(ice.schema.toSpark), withIds(requiredSchema),
      Array.empty))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
