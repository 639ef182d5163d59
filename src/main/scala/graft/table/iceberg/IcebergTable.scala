package graft.table.iceberg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.table.{Meta, TableIO}
import org.apache.hadoop.fs.{Path => HPath}
import scala.jdk.CollectionConverters._

/** Read path over REAL Iceberg v2 tables: metadata.json + avro
  * manifest lists + avro manifests, any engine's output (reference
  * flow: iceberg-rust/src/table/manifest.rs:368
  * avro_value_to_manifest_entry; datafusion_iceberg's scans do the
  * same walk).
  *
  * Scan = metadata walk (driver, metadata-size IO) -> pruned parquet
  * file list -> Spark's vectorized parquet reader. Manifest bounds
  * decode into the engine's canonical stat strings, so the SAME
  * pruning semantics apply to foreign tables as to graft's own.
  */
class IcebergTable private (val location: String, val spark: SparkSession) {

  def meta: IcebergMetadata.IceMetadata = IcebergMetadata.load(location)

  def schema: StructType = meta.schema.toSpark

  /** Resolve a path stored in metadata (absolute URI or
    * location-relative). */
  private def resolve(p: String): HPath = {
    val u = new java.net.URI(p)
    if (u.getScheme != null || p.startsWith("/")) new HPath(p)
    else new HPath(location, p)
  }

  /** Live data-file entries at a snapshot, with decoded stats. */
  def plannedFiles(snapshotId: Option[Long] = None,
      filters: Seq[(String, String, String)] = Seq.empty)
      : Seq[(IcebergAvro.DataFileEntry, Map[String, Meta.ColStats])] = {
    val m = meta
    val snap = snapshotId.flatMap(m.snapshot).orElse(m.currentSnapshot)
      .getOrElse(return Seq.empty)
    val schemaById = m.schemas.find(_.schemaId == snap.schemaId)
      .getOrElse(m.schema)
    val manifests = IcebergAvro.readManifestList(resolve(snap.manifestList))
    val deleteManifests = manifests.filter(_.content != 0)
    require(deleteManifests.isEmpty,
      "Iceberg tables with delete files are not supported by this reader yet")
    val entries = manifests.flatMap(mf =>
      IcebergAvro.readManifest(resolve(mf.path)))
      .filter(e => e.status != 2 && e.content == 0)
    val nameById = schemaById.fields.map(f => f.id -> f).toMap
    val withStats = entries.map { e =>
      val stats = schemaById.fields.flatMap { f =>
        val lower = e.lowerBounds.get(f.id)
          .flatMap(b => IcebergTypes.decodeToCanonical(
            IcebergTypes.toSpark(f.tpe), b))
        val upper = e.upperBounds.get(f.id)
          .flatMap(b => IcebergTypes.decodeToCanonical(
            IcebergTypes.toSpark(f.tpe), b))
        (lower, upper) match {
          case (Some(lo), Some(hi)) =>
            Some(f.name -> Meta.ColStats(lo, hi,
              e.nullCounts.getOrElse(f.id, 0L)))
          case _ => None
        }
      }.toMap
      (e, stats)
    }
    withStats.filter { case (_, stats) =>
      filters.forall { case (c, op, value) =>
        (stats.get(c), schemaById.fields.find(_.name == c)) match {
          case (Some(st), Some(f)) =>
            val cmp = comparator(IcebergTypes.toSpark(f.tpe))
            op match {
              case "=" => cmp(st.min, value) <= 0 && cmp(st.max, value) >= 0
              case ">" => cmp(st.max, value) > 0
              case ">=" => cmp(st.max, value) >= 0
              case "<" => cmp(st.min, value) < 0
              case "<=" => cmp(st.min, value) <= 0
              case _ => true
            }
          case _ => true // no stats -> keep (pruning must stay sound)
        }
      }
    }
  }

  private def comparator(t: DataType): (String, String) => Int = t match {
    case _: IntegerType | _: LongType | _: ShortType =>
      (a, b) => java.lang.Long.compare(a.toLong, b.toLong)
    case _: DoubleType | _: FloatType =>
      (a, b) => java.lang.Double.compare(a.toDouble, b.toDouble)
    case _ => (a, b) => a.compareTo(b)
  }

  def scan(snapshotId: Option[Long] = None,
      filters: Seq[(String, String, String)] = Seq.empty): DataFrame = {
    val m = meta
    val snap = snapshotId.flatMap(m.snapshot).orElse(m.currentSnapshot)
    val schemaOf = snap.map(s => m.schemas.find(_.schemaId == s.schemaId)
      .getOrElse(m.schema)).getOrElse(m.schema).toSpark
    val files = plannedFiles(snapshotId, filters)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf)
    else spark.read.schema(schemaOf)
      .parquet(files.map(f => resolve(f._1.filePath).toString): _*)
  }

  def timeTravel(snapshotId: Long): DataFrame = scan(Some(snapshotId))
}

object IcebergTable {
  def load(spark: SparkSession, location: String): IcebergTable =
    new IcebergTable(location, spark)

  def exists(location: String): Boolean =
    TableIO.exists(TableIO.path(location, "metadata"))
}
