package graft.table.iceberg

import org.apache.spark.sql.Column
import org.apache.spark.sql.types._
import graft.functions.IcebergTransforms

/** Iceberg partition transforms for the interop layer: Catalyst
  * column form (write path computes partition values per row), result
  * types (manifest partition structs are typed by the transform
  * output, not the source), and driver-side literal evaluation (scan
  * pruning maps a predicate literal through the transform to match it
  * against manifest partition values). Mirrors the semantics of
  * iceberg-rust/src/arrow/transform.rs and spec/partition.rs:27 —
  * the row kernels themselves are the codegen'd Catalyst expressions
  * in graft.functions.IcebergTransforms.
  */
object Transforms {

  private val Bucket = """bucket\[(\d+)\]""".r
  private val Truncate = """truncate\[(\d+)\]""".r

  /** Iceberg's conventional partition-field name for a transform. */
  def fieldName(sourceCol: String, transform: String): String = transform match {
    case "identity" => sourceCol
    case Bucket(_) => s"${sourceCol}_bucket"
    case Truncate(_) => s"${sourceCol}_trunc"
    case t => s"${sourceCol}_$t"
  }

  /** The transform as a Catalyst column over the source column. */
  def column(transform: String, c: Column, srcType: DataType): Column =
    transform match {
      case "identity" => c
      case Bucket(n) => IcebergTransforms.bucket(c, n.toInt)
      case Truncate(w) => srcType match {
        case StringType => IcebergTransforms.truncateString(c, w.toInt)
        case _ => IcebergTransforms.truncateInt(c, w.toInt)
      }
      case "year" => IcebergTransforms.yearsFromEpoch(c)
      case "month" => IcebergTransforms.monthsFromEpoch(c)
      case "day" => IcebergTransforms.daysFromEpoch(c)
      case "hour" => IcebergTransforms.hoursFromEpoch(c)
      case "void" => IcebergTransforms.voidTransform(c)
      case other => throw new IllegalArgumentException(s"unknown transform $other")
    }

  /** Result type of the transform (what the partition struct stores). */
  def resultType(transform: String, srcType: DataType): DataType = transform match {
    case "identity" => srcType
    case Truncate(_) => srcType
    case _ => IntegerType // bucket / year / month / day / hour / void
  }

  /** Evaluate the transform on a canonical literal string (the stat /
    * filter form: numbers plain, dates yyyy-MM-dd, timestamps
    * 'yyyy-MM-dd HH:mm:ss[.S]'). None = literal not evaluable here,
    * caller must not prune. */
  def applyLiteral(transform: String, srcType: DataType, v: String): Option[Any] = {
    def epochSeconds: Option[Long] = srcType match {
      case DateType => scala.util.Try(
        java.time.LocalDate.parse(v).toEpochDay * 86400L).toOption
      case TimestampType | TimestampNTZType => scala.util.Try {
        val t = java.sql.Timestamp.valueOf(v)
        Math.floorDiv(t.getTime, 1000L)
      }.toOption
      case _ => None
    }
    transform match {
      case "identity" => srcType match {
        // manifests store date as epoch days, timestamp as micros
        case DateType => scala.util.Try(
          java.time.LocalDate.parse(v).toEpochDay.toInt).toOption
        case TimestampType | TimestampNTZType => scala.util.Try {
          val t = java.sql.Timestamp.valueOf(v)
          Math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000L) % 1000000L
        }.toOption
        case _ => Some(v)
      }
      case Bucket(n) => srcType match {
        case LongType | IntegerType | ShortType => scala.util.Try(
          graft.functions.IcebergHash.bucketLong(v.toLong, n.toInt)).toOption
        case StringType => Some(
          graft.functions.IcebergHash.bucketBytes(v.getBytes("UTF-8"), n.toInt))
        case _ => None
      }
      case Truncate(w) => srcType match {
        case LongType | IntegerType | ShortType => scala.util.Try {
          val x = v.toLong; val ww = w.toInt
          x - (((x % ww) + ww) % ww)
        }.toOption
        case StringType => Some(v.take(w.toInt))
        case _ => None
      }
      case "year" => epochSeconds.map(s =>
        java.time.Instant.ofEpochSecond(s).atZone(java.time.ZoneOffset.UTC)
          .getYear - 1970)
      case "month" => epochSeconds.map { s =>
        val zd = java.time.Instant.ofEpochSecond(s).atZone(java.time.ZoneOffset.UTC)
        (zd.getYear - 1970) * 12 + zd.getMonthValue - 1
      }
      case "day" => epochSeconds.map(s => Math.floorDiv(s, 86400L).toInt)
      case "hour" => epochSeconds.map(s => Math.floorDiv(s, 3600L).toInt)
      case _ => None
    }
  }

  /** Is the transform order-preserving on its source (so range
    * predicates map through it)? bucket is not; void is not. */
  def monotonic(transform: String): Boolean = transform match {
    case "identity" | "year" | "month" | "day" | "hour" => true
    case Truncate(_) => true
    case _ => false
  }
}
