package graft.spark

import graft.table.TableIO
import graft.table.iceberg.{IcebergAvro, IcebergMetadata}

/** Metadata-table rows for ADOPTED real-format Iceberg tables —
  * `cat.ns.t.files / .snapshots / .history / ...` over foreign
  * metadata, same schemas as the graft versions
  * (GraftMetadataSparkTable.schemaOf), so SQL written against one
  * dialect reads the other unchanged. Everything here is
  * metadata-scale: manifest lists and manifests parse on the driver,
  * data files are never opened. */
object IcebergMetadataRows {

  private def partString(p: Map[String, Any]): String =
    p.toSeq.sortBy(_._1).map(kv => s"${kv._1}=${String.valueOf(kv._2)}")
      .mkString("/")

  /** One manifest pass per snapshot, memoized: (manifest, its entries)
    * for every manifest in the snapshot's list. */
  private final class Pass(m: IcebergMetadata.IceMetadata) {
    private val cache = scala.collection.mutable.Map[
      Long, Seq[(IcebergAvro.ManifestFile, Seq[IcebergAvro.DataFileEntry])]]()
    def manifestsOf(s: IcebergMetadata.IceSnapshot)
        : Seq[(IcebergAvro.ManifestFile, Seq[IcebergAvro.DataFileEntry])] =
      cache.getOrElseUpdate(s.snapshotId,
        IcebergAvro.readManifestList(TableIO.path(s.manifestList)).map(mf =>
          mf -> IcebergAvro.readManifest(TableIO.path(mf.path))))
    /** Live (status != 2) entries with their manifest, at a snapshot. */
    def live(s: IcebergMetadata.IceSnapshot)
        : Seq[(IcebergAvro.ManifestFile, IcebergAvro.DataFileEntry)] =
      manifestsOf(s).flatMap { case (mf, es) =>
        es.filter(_.status != 2).map(mf -> _)
      }
    def livePaths(s: IcebergMetadata.IceSnapshot): Set[String] =
      live(s).map(_._2.filePath).toSet
    /** The manifests THIS snapshot added (its own commit's content). */
    def own(s: IcebergMetadata.IceSnapshot)
        : Seq[(IcebergAvro.ManifestFile, Seq[IcebergAvro.DataFileEntry])] =
      manifestsOf(s).filter(_._1.addedSnapshotId == s.snapshotId)
  }

  def rowsOf(root: String, kind: String): Seq[Seq[Any]] = {
    val m = IcebergMetadata.load(root)
    val pass = new Pass(m)
    def current = m.currentSnapshot
    def eqCols(ids: Seq[Int]): String =
      ids.flatMap(id => m.schema.fields.find(_.id == id).map(_.name))
        .mkString(",")
    kind match {
      case "files" =>
        current.toSeq.flatMap(pass.live).map { case (mf, e) => Seq(
          e.filePath, partString(e.partition), mf.specId, e.content,
          e.recordCount, e.fileSizeBytes)
        }
      case "snapshots" =>
        m.snapshots.map { s =>
          val added = pass.own(s).map(_._2.count(_.status == 1)).sum
          val removed = s.parentId.flatMap(m.snapshot) match {
            case Some(p) => (pass.livePaths(p) -- pass.livePaths(s)).size
            case None => 0
          }
          Seq(s.snapshotId, s.parentId.getOrElse(-1L), s.sequenceNumber,
            new java.sql.Timestamp(s.timestampMs), s.operation,
            added, removed)
        }
      case "history" =>
        val onChain = {
          val ids = scala.collection.mutable.Set[Long]()
          var cur = m.currentSnapshot
          while (cur.isDefined) {
            ids += cur.get.snapshotId
            cur = cur.get.parentId.flatMap(m.snapshot)
          }
          ids.toSet
        }
        m.snapshots.map(s => Seq(
          new java.sql.Timestamp(s.timestampMs), s.snapshotId,
          s.parentId.getOrElse(-1L), onChain.contains(s.snapshotId)))
      case "partitions" =>
        current.toSeq.flatMap(pass.live)
          .filter(_._2.content == 0)
          .groupBy { case (mf, e) => (mf.specId, partString(e.partition)) }
          .toSeq.sortBy(_._1._2)
          .map { case ((specId, part), es) => Seq(
            part, specId, es.size.toLong,
            es.map(_._2.recordCount).sum, es.map(_._2.fileSizeBytes).sum)
          }
      case "refs" =>
        m.refs.toSeq.sortBy(_._1).map { case (name, snapId) =>
          val ret = m.refRetention.get(name)
          Seq(name, m.refTypes.getOrElse(name, "branch"), snapId,
            ret.flatMap(_.maxRefAgeMs).map(Long.box).orNull,
            ret.flatMap(_.minSnapshotsToKeep).map(Int.box).orNull,
            ret.flatMap(_.maxSnapshotAgeMs).map(Long.box).orNull)
        }
      case "manifests" =>
        m.snapshots.flatMap(s => pass.own(s).map { case (mf, _) =>
          Seq(s.snapshotId, mf.path, "avro",
            mf.partitions.map(_.size).getOrElse(0))
        })
      case "entries" =>
        lazy val byPath: Map[String, IcebergAvro.DataFileEntry] =
          m.snapshots.flatMap(s => pass.own(s).flatMap(_._2))
            .map(e => e.filePath -> e).toMap
        m.snapshots.flatMap { s =>
          val added = pass.own(s).flatMap { case (mf, es) =>
            es.filter(_.status == 1).map(e => Seq(
              1, s.snapshotId,
              e.sequenceNumber.getOrElse(mf.sequenceNumber),
              e.content, e.filePath, partString(e.partition),
              e.recordCount, e.fileSizeBytes))
          }
          val removed = s.parentId.flatMap(m.snapshot).toSeq.flatMap { p =>
            (pass.livePaths(p) -- pass.livePaths(s)).toSeq.sorted.map { path =>
              val f = byPath.get(path)
              Seq(2, s.snapshotId, s.sequenceNumber,
                f.map(_.content).getOrElse(0), path,
                f.map(e => partString(e.partition)).getOrElse(""),
                f.map(_.recordCount).getOrElse(-1L),
                f.map(_.fileSizeBytes).getOrElse(-1L))
            }
          }
          added ++ removed
        }
      case "delete_files" =>
        current.toSeq.flatMap(pass.live)
          .filter(_._2.content != 0)
          .map { case (mf, e) => Seq(
            e.filePath, partString(e.partition), mf.specId, e.content,
            e.recordCount, e.fileSizeBytes, eqCols(e.equalityIds),
            e.sequenceNumber.getOrElse(mf.sequenceNumber))
          }
      case "all_files" =>
        val live = current.map(pass.livePaths).getOrElse(Set.empty)
        m.snapshots.flatMap(s => pass.own(s).flatMap { case (mf, es) =>
          es.map(e => (e, mf.specId))
        })
          .groupBy(_._1.filePath).toSeq.sortBy(_._1)
          .map { case (p, es) =>
            val (e, specId) = es.head
            Seq(p, partString(e.partition), specId, e.content,
              e.recordCount, e.fileSizeBytes, live.contains(p))
          }
      case "metadata_log_entries" =>
        val VersionFile = """v(\d+)\.metadata\.json""".r
        val dir = TableIO.path(root, "metadata")
        TableIO.listFilesRecursive(dir).flatMap {
          case (p, _, mtime) => p.getName match {
            case VersionFile(n) => Some((n.toInt, p, mtime))
            case _ => None
          }
        }.sortBy(_._1).map { case (v, p, mtime) =>
          val snap = scala.util.Try(IcebergMetadata.fromJson(
            TableIO.readString(p)).currentSnapshotId).toOption.flatten
          Seq(new java.sql.Timestamp(mtime), p.toString, v,
            snap.map(Long.box).orNull)
        }
    }
  }
}
