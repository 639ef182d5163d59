package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
  * Only `append` snapshots contribute rows: `rewrite` (compaction)
  * re-expresses EXISTING rows in new files and `overwrite`/`delete`
  * retract rows, which an append-only stream cannot represent —
  * compaction is skipped (row-preserving), every other non-append
  * snapshot fails the stream loudly, matching the reference's
  * append-level incremental semantics. A fresh stream starts from snapshot 0
  * (everything); a restarted stream starts from its checkpoint.
  */
class GraftMicroBatchStream(root: String, requiredSchema: StructType)
  extends MicroBatchStream {

  private case class SnapshotOffset(id: Long) extends Offset {
    override def json(): String = id.toString
  }

  override def initialOffset(): Offset = SnapshotOffset(0L)

  override def latestOffset(): Offset =
    SnapshotOffset(Meta.load(root).currentSnapshotId.getOrElse(0L))

  override def deserializeOffset(json: String): Offset =
    SnapshotOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SnapshotOffset].id
    val e = end.asInstanceOf[SnapshotOffset].id
    if (e <= s) return Array.empty
    val m = Meta.load(root)
    // main-chain lineage only: branch commits and rollback orphans
    // share the snapshots list but must not leak into the stream
    val inRange = m.chainSnapshots(None)
      .filter(sn => sn.snapshotId > s && sn.snapshotId <= e)
    // "rewrite" is reserved for pure bin-pack compaction (rows
    // preserved exactly) -> skip; delete-folding rewrites commit as
    // "rewrite-fold" and fall through to the loud failure below, like
    // every other op that mutates visible content in a way an
    // append-only stream cannot represent
    inRange.find(sn => sn.operation != "append" && sn.operation != "rewrite")
      .foreach(sn => throw new IllegalStateException(
        s"streaming read reached ${sn.operation} snapshot ${sn.snapshotId}; " +
          "append-only streams cannot represent replaced/deleted rows — " +
          "re-read the table as a batch source"))
    val added = inRange.filter(_.operation == "append").flatMap(_.files)
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
