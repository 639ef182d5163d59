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
  * incremental read). Offsets are snapshot ids (monotonic, max+1 at
  * commit), so restart resumes exactly from the checkpointed snapshot.
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
  * / `maxBytesPerTrigger` read options clamp each micro-batch at
  * snapshot granularity — a stream resuming after a long gap drains
  * the backlog in bounded batches instead of planning one batch over
  * everything (at 100 TB an unbounded catch-up batch is an
  * OOM-or-nothing job). Trigger.AvailableNow is supported natively:
  * the target offset pins at query start and the bounded batches run
  * until they reach it. */
class GraftMicroBatchStream(root: String, requiredSchema: StructType,
    options: Map[String, String] = Map.empty)
  extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private case class SnapshotOffset(id: Long) extends Offset {
    override def json(): String = id.toString
  }

  private def opt(name: String): Option[String] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }

  /** Fresh streams start from snapshot 0 (full history) unless
    * `startingSnapshotId` pins a later starting point — the stream
    * then emits only changes committed AFTER that snapshot (Iceberg's
    * stream-from-snapshot option). Checkpointed streams ignore this
    * (Spark restores the offset from the checkpoint). */
  override def initialOffset(): Offset =
    SnapshotOffset(opt("startingSnapshotId").map(_.toLong).getOrElse(0L))

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
    val s = start.asInstanceOf[SnapshotOffset].id
    val m = Meta.load(root)
    val tip = availableNowCap.getOrElse(m.currentSnapshotId.getOrElse(0L))
    val pending = m.chainSnapshots(None)
      .filter(sn => sn.snapshotId > s && sn.snapshotId <= tip)
    if (pending.isEmpty) return SnapshotOffset(math.max(s, tip))
    val (maxFiles, maxBytes) = caps(limit)
    // admit whole snapshots in order until the NEXT one would exceed
    // the cap; always admit at least one so the stream progresses even
    // when a single snapshot is larger than the cap. Non-append
    // snapshots count no files (the plan phase handles them: skip for
    // pure rewrites, loud failure otherwise).
    var files = 0L; var bytes = 0L
    var end = s
    var admitted = 0
    val it = pending.iterator
    var stop = false
    while (it.hasNext && !stop) {
      val sn = it.next()
      // budget from the snapshot SUMMARY when present — resolving
      // sn.files would re-read a spilled manifest on every poll.
      // Parent-less snapshots carry content for a fresh stream (see
      // planInputPartitions), so they count toward the budget too.
      val carries = sn.operation == "append" || sn.parentId.isEmpty
      val snFiles =
        if (!carries) 0L
        else sn.summary.get("added-files").flatMap(_.toLongOption)
          .getOrElse(sn.files.size.toLong)
      val snBytes =
        if (!carries) 0L
        else sn.summary.get("added-bytes").flatMap(_.toLongOption)
          .getOrElse(sn.files.map(_.fileSizeBytes).sum)
      if (admitted > 0 && (files + snFiles > maxFiles || bytes + snBytes > maxBytes))
        stop = true
      else {
        files += snFiles; bytes += snBytes
        end = sn.snapshotId; admitted += 1
      }
    }
    SnapshotOffset(end)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def reportLatestOffset(): Offset =
    SnapshotOffset(Meta.load(root).currentSnapshotId.getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    SnapshotOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotOffset].id
    val e = end.asInstanceOf[SnapshotOffset].id
    if (e <= s) return Array.empty
    val m = Meta.load(root)
    // a checkpointed snapshot that expireSnapshots squashed away can't
    // anchor an exact resume: the surviving base folds the expired
    // prefix into one file set, so replaying from here would duplicate
    // already-emitted rows — fail loudly instead
    if (s > 0 && m.snapshot(s).isEmpty) throw new IllegalStateException(
      s"checkpointed snapshot $s was expired (snapshot squash); the " +
        "stream cannot resume exactly — re-read the table as a batch " +
        "source and start a fresh stream")
    // main-chain lineage only: branch commits and rollback orphans
    // share the snapshots list but must not leak into the stream
    val inRange = m.chainSnapshots(None)
      .filter(sn => sn.snapshotId > s && sn.snapshotId <= e)
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
    // like the expired-checkpoint case.
    if (s > 0) inRange.find(sn => sn.parentId.isEmpty ||
        sn.summary.get("squashed").contains("true"))
      .foreach(sn => throw new IllegalStateException(
        s"snapshot ${sn.snapshotId} above checkpoint $s is an " +
          "expire-squashed base carrying the full live set; the stream " +
          "cannot resume exactly — re-read the table as a batch source " +
          "and start a fresh stream"))
    inRange.find(sn => sn.parentId.isDefined &&
        sn.operation != "append" && sn.operation != "rewrite")
      .foreach(sn => throw new IllegalStateException(
        s"streaming read reached ${sn.operation} snapshot ${sn.snapshotId}; " +
          "append-only streams cannot represent replaced/deleted rows — " +
          "re-read the table as a batch source"))
    val added = inRange
      .filter(sn => sn.operation == "append" || sn.parentId.isEmpty)
      .flatMap(_.files)
    if (added.isEmpty) return Array.empty
    val dataDir = graft.table.TableIO.path(root, "data")
    val targetBytes = 128L * 1024 * 1024
    val bins = scala.collection.mutable.ArrayBuffer[Seq[Meta.DataFile]]()
    var cur = scala.collection.mutable.ArrayBuffer[Meta.DataFile]()
    var curBytes = 0L
    added.foreach { f =>
      if (curBytes + f.fileSizeBytes > targetBytes && cur.nonEmpty) {
        bins += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer(); curBytes = 0L
      }
      cur += f; curBytes += f.fileSizeBytes
    }
    if (cur.nonEmpty) bins += cur.toSeq
    bins.zipWithIndex.map { case (bin, i) =>
      GraftConnectorShim.filePartition(i, bin.map { f =>
        val p = new org.apache.hadoop.fs.Path(dataDir, f.path)
        GraftConnectorShim.partitionedFile(p.toString, f.fileSizeBytes, 0L)
      }): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    UnwrapKeyedFactory(GraftConnectorShim.parquetReaderFactory(
      SparkSession.active, Meta.load(root).schema, requiredSchema,
      Array.empty))

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
