package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxBytes, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.GraftConnectorShim
import org.apache.spark.sql.types.StructType
import graft.table.Meta

/** Streaming SOURCE over a graft table: each micro-batch reads the
  * data files ADDED by the snapshots committed since the last batch —
  * the incremental append scan (reference: DataFusion's Iceberg tables
  * stream new snapshots the same way; Iceberg calls this the
  * incremental read).
  *
  * OFFSETS are (snapshotId, filePos): filePos < 0 means the snapshot
  * is fully consumed (serialized as the plain snapshot id, so legacy
  * checkpoints resume unchanged); filePos >= 0 means the first
  * filePos files of that snapshot's stable file list are consumed. A
  * partial offset also carries a hash of the snapshot's file-path
  * list: on resume the hash is re-checked, so a file list rewritten
  * under the checkpoint (expire squash) fails loudly instead of
  * replaying the wrong prefix.
  *
  * Only `append` snapshots contribute rows: `rewrite` (pure bin-pack
  * compaction) re-expresses EXISTING rows in new files and is skipped;
  * `rewrite-fold` / `overwrite` / `delete` / `replace` remove or
  * replace rows, which an append-only stream cannot represent — every
  * such snapshot fails the stream loudly, matching the reference's
  * append-level incremental semantics. A fresh stream starts from
  * snapshot 0 (everything); a restarted stream starts from its
  * checkpoint.
  *
  * ADMISSION CONTROL (SupportsAdmissionControl): `maxFilesPerTrigger`
  * / `maxBytesPerTrigger` read options clamp each micro-batch at FILE
  * granularity — one giant append snapshot (10k files) drains in
  * bounded, checkpoint-resumable batches instead of an all-or-nothing
  * job (at 100 TB an unbounded catch-up batch is an OOM-or-nothing
  * job). Snapshots whose summary fits the remaining budget are
  * admitted wholesale from the summary alone (no manifest read on the
  * poll path); only the snapshot the budget lands IN has its file
  * list resolved. Trigger.AvailableNow is supported natively: the
  * target offset pins at query start and the bounded batches run
  * until they reach it. */
class GraftMicroBatchStream(root: String, requiredSchema: StructType,
    options: Map[String, String] = Map.empty)
  extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private case class StreamOffset(id: Long, filePos: Int, listHash: Long)
      extends Offset {
    // boundary offsets serialize as the bare snapshot id — the legacy
    // format, so pre-existing checkpoints deserialize and resume
    override def json(): String =
      if (filePos < 0) id.toString else s"$id:$filePos:$listHash"
  }

  private def complete(id: Long) = StreamOffset(id, -1, 0L)

  /** Total order over offsets: a complete snapshot sorts after every
    * partial position inside it. */
  private def pos(o: StreamOffset): (Long, Long) =
    (o.id, if (o.filePos < 0) Long.MaxValue else o.filePos.toLong)

  private def filesHash(files: Seq[Meta.DataFile]): Long =
    scala.util.hashing.MurmurHash3.orderedHash(files.map(_.path)).toLong

  private def opt(name: String): Option[String] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }

  /** Fresh streams start from snapshot 0 (full history) unless
    * `startingSnapshotId` pins a later starting point — the stream
    * then emits only changes committed AFTER that snapshot (Iceberg's
    * stream-from-snapshot option). Checkpointed streams ignore this
    * (Spark restores the offset from the checkpoint). */
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

  /** Trigger.AvailableNow: pin the drain target at query start — data
    * committed after this point belongs to the next run. */
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(Meta.load(root).currentSnapshotId.getOrElse(0L))

  /** (maxFiles, maxBytes) a ReadLimit allows per batch. */
  private def caps(limit: ReadLimit): (Long, Long) = limit match {
    case f: ReadMaxFiles => (f.maxFiles().toLong, Long.MaxValue)
    case b: ReadMaxBytes => (Long.MaxValue, b.maxBytes())
    case c: CompositeReadLimit =>
      c.getReadLimits.map(caps).reduce((a, b) =>
        (math.min(a._1, b._1), math.min(a._2, b._2)))
    case _ => (Long.MaxValue, Long.MaxValue)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[StreamOffset]
    val m = Meta.load(root)
    val tip = availableNowCap.getOrElse(m.currentSnapshotId.getOrElse(0L))
    val chain = m.chainSnapshots(None)
    val startPartial =
      if (s.filePos >= 0) chain.find(_.snapshotId == s.id) else None
    val pending = chain
      .filter(sn => sn.snapshotId > s.id && sn.snapshotId <= tip)
    if (startPartial.isEmpty && pending.isEmpty)
      return complete(math.max(s.id, tip))

    val (maxFiles, maxBytes) = caps(limit)
    var files = 0L; var bytes = 0L
    var admittedAny = false
    var end: StreamOffset = s

    // admit a snapshot's files from index `from`; always admits at
    // least one file overall so the stream progresses even when one
    // file exceeds the byte cap. Returns false when it stopped
    // mid-snapshot (budget exhausted).
    def admitFiles(sn: Meta.Snapshot, from: Int): Boolean = {
      val fs = sn.files
      var i = from
      while (i < fs.size) {
        val f = fs(i)
        if (admittedAny &&
            (files + 1 > maxFiles || bytes + f.fileSizeBytes > maxBytes)) {
          end = StreamOffset(sn.snapshotId, i, filesHash(fs))
          return false
        }
        files += 1; bytes += f.fileSizeBytes; admittedAny = true
        i += 1
      }
      end = complete(sn.snapshotId)
      true
    }

    // first drain the partially-consumed start snapshot
    startPartial.foreach { sn =>
      if (!admitFiles(sn, s.filePos)) return end
    }
    val it = pending.iterator
    var stop = false
    while (it.hasNext && !stop) {
      val sn = it.next()
      val carries = sn.operation == "append" || sn.parentId.isEmpty
      if (!carries) end = complete(sn.snapshotId) // plan skips / fails loudly
      else {
        // wholesale admit from the SUMMARY when the whole snapshot
        // fits — no manifest resolution on the common poll path
        val snFiles = sn.summary.get("added-files").flatMap(_.toLongOption)
          .getOrElse(sn.files.size.toLong)
        val snBytes = sn.summary.get("added-bytes").flatMap(_.toLongOption)
          .getOrElse(sn.files.map(_.fileSizeBytes).sum)
        if (files + snFiles <= maxFiles && bytes + snBytes <= maxBytes) {
          files += snFiles; bytes += snBytes
          admittedAny |= snFiles > 0
          end = complete(sn.snapshotId)
        } else stop = !admitFiles(sn, 0)
      }
    }
    end
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def reportLatestOffset(): Offset =
    complete(Meta.load(root).currentSnapshotId.getOrElse(0L))

  override def deserializeOffset(json: String): Offset = json.split(":") match {
    case Array(id) => complete(id.toLong)
    case Array(id, p, h) => StreamOffset(id.toLong, p.toInt, h.toLong)
    case _ => throw new IllegalArgumentException(s"bad stream offset: $json")
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[StreamOffset]
    val e = end.asInstanceOf[StreamOffset]
    if (pos(e)._1 < pos(s)._1 ||
        (pos(e)._1 == pos(s)._1 && pos(e)._2 <= pos(s)._2))
      return Array.empty
    val m = Meta.load(root)
    // a checkpointed snapshot that expireSnapshots squashed away can't
    // anchor an exact resume: the surviving base folds the expired
    // prefix into one file set, so replaying from here would duplicate
    // already-emitted rows — fail loudly instead
    if (s.id > 0 && m.snapshot(s.id).isEmpty) throw new IllegalStateException(
      s"checkpointed snapshot ${s.id} was expired (snapshot squash); the " +
        "stream cannot resume exactly — re-read the table as a batch " +
        "source and start a fresh stream")
    // a PARTIAL checkpoint indexes into the snapshot's file list: if
    // the list was rewritten underneath (expire squash folds the chain
    // into the base), the consumed prefix no longer means the same
    // files — fail loudly rather than replay the wrong ones
    if (s.filePos >= 0) {
      val sn = m.snapshot(s.id).getOrElse(throw new IllegalStateException(
        s"checkpointed snapshot ${s.id} was expired; cannot resume"))
      if (filesHash(sn.files) != s.listHash) throw new IllegalStateException(
        s"snapshot ${s.id}'s file list changed since the checkpoint " +
          "(expire squash rewrote it); the stream cannot resume exactly " +
          "— re-read the table as a batch source and start a fresh stream")
    }
    // main-chain lineage only: branch commits and rollback orphans
    // share the snapshots list but must not leak into the stream
    val chain = m.chainSnapshots(None)
    val inRange = chain.filter(sn => sn.snapshotId > s.id && sn.snapshotId <= e.id)
    // "rewrite" is reserved for pure bin-pack compaction (rows
    // preserved exactly) -> skip; delete-folding rewrites commit as
    // "rewrite-fold" and fail loudly, like every other op that mutates
    // visible content in a way an append-only stream cannot represent.
    // A PARENT-LESS snapshot is the live set itself (a table's first
    // snapshot, or an expire-squashed base). For a FRESH stream
    // emitting it is exactly right whatever op label it carries. For a
    // RESUMED stream it means expire squashed the chain ABOVE the
    // checkpoint (the checkpoint itself can survive via another ref's
    // retention ancestry) and the base folds already-emitted rows into
    // one file set — emitting it would duplicate them, so fail loudly
    // like the expired-checkpoint case. (A partial offset INTO a
    // parent-less base is fine — the hash check above proved the list
    // is still the one the checkpoint indexed.)
    if (s.id > 0) inRange.find(sn => sn.parentId.isEmpty ||
        sn.summary.get("squashed").contains("true"))
      .foreach(sn => throw new IllegalStateException(
        s"snapshot ${sn.snapshotId} above checkpoint ${s.id} is an " +
          "expire-squashed base carrying the full live set; the stream " +
          "cannot resume exactly — re-read the table as a batch source " +
          "and start a fresh stream"))
    inRange.find(sn => sn.parentId.isDefined &&
        sn.operation != "append" && sn.operation != "rewrite")
      .foreach(sn => throw new IllegalStateException(
        s"streaming read reached ${sn.operation} snapshot ${sn.snapshotId}; " +
          "append-only streams cannot represent replaced/deleted rows — " +
          "re-read the table as a batch source"))
    def carries(sn: Meta.Snapshot): Boolean =
      sn.operation == "append" || sn.parentId.isEmpty
    // the batch covers (start, end]: the start snapshot's remaining
    // files, whole snapshots strictly between, and the end snapshot's
    // admitted prefix
    val startTail: Seq[Meta.DataFile] =
      if (s.filePos < 0) Seq.empty
      else {
        val fs = m.snapshot(s.id).map(_.files).getOrElse(Seq.empty)
        val upto =
          if (e.id != s.id) fs.size
          else if (e.filePos < 0) fs.size
          else e.filePos
        fs.slice(s.filePos, upto)
      }
    val mids = inRange.filter(_.snapshotId < e.id)
      .filter(carries).flatMap(_.files)
    val endFiles: Seq[Meta.DataFile] =
      if (e.id == s.id) Seq.empty
      else inRange.find(_.snapshotId == e.id).filter(carries).toSeq.flatMap { sn =>
        if (e.filePos < 0) sn.files else sn.files.take(e.filePos)
      }
    val added = startTail ++ mids ++ endFiles
    if (added.isEmpty) return Array.empty
    val dataDir = graft.table.TableIO.path(root, "data")
    val targetBytes = 128L * 1024 * 1024
    // bins never mix name mappings or (for imports) partition values:
    // imported (id-less) files read through a renamed-schema factory
    // with identity-constant fill, routed per partition
    val bins = scala.collection.mutable.ArrayBuffer[
      (Seq[Meta.DataFile], Option[ImportedGroup])]()
    added.groupBy(f => f.nameMapping.map(mp =>
        ImportedGroup(mp, f.specId, f.partitionValues))).toSeq
      .sortBy(_._1.map(g => g.mapping.toSeq.sorted.mkString(",") + "|" +
        g.specId + "|" + g.partitionValues.toSeq.sorted.mkString(","))
        .getOrElse(""))
      .foreach { case (group0, group) =>
        var cur = scala.collection.mutable.ArrayBuffer[Meta.DataFile]()
        var curBytes = 0L
        group.foreach { f =>
          if (curBytes + f.fileSizeBytes > targetBytes && cur.nonEmpty) {
            bins += ((cur.toSeq, group0))
            cur = scala.collection.mutable.ArrayBuffer(); curBytes = 0L
          }
          cur += f; curBytes += f.fileSizeBytes
        }
        if (cur.nonEmpty) bins += ((cur.toSeq, group0))
      }
    mappingByPartition = bins.zipWithIndex.collect {
      case ((bin, Some(g)), _) if bin.nonEmpty =>
        PartitionBindKey.ofPath(new org.apache.hadoop.fs.Path(
          dataDir, bin.head.path).toString) -> g
    }.toMap
    bins.zipWithIndex.map { case ((bin, _), i) =>
      GraftConnectorShim.filePartition(i, bin.map { f =>
        val p = new org.apache.hadoop.fs.Path(dataDir, f.path)
        GraftConnectorShim.partitionedFile(p.toString, f.fileSizeBytes, 0L)
      }): InputPartition
    }.toArray
  }

  /** first-file binding key → import-group info for the CURRENT batch
    * (same stable file-identity binding the batch scan uses). */
  @volatile private var mappingByPartition: Map[String, ImportedGroup] =
    Map.empty

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val m = Meta.load(root)
    val default = UnwrapKeyedFactory(GraftConnectorShim.parquetReaderFactory(
      spark, m.schema, requiredSchema, Array.empty))
    if (mappingByPartition.isEmpty) default
    else {
      val mapped = mappingByPartition.values.map(_.mapping).toSet.map {
        (mp: Map[String, String]) =>
          mp -> (UnwrapKeyedFactory(GraftConnectorShim.parquetReaderFactory(
            spark, Meta.importReadSchema(m.schema, mp),
            Meta.importReadSchema(requiredSchema, mp),
            Array.empty)): PartitionReaderFactory)
      }.toMap
      NameMapRoutingFactory(default,
        mappingByPartition.map { case (i, g) =>
          i -> (mapped(g.mapping),
            ImportedGroup.overrides(m, requiredSchema, g))
        }, requiredSchema)
    }
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
