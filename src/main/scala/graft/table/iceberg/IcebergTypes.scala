package graft.table.iceberg

import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Iceberg <-> Spark type mapping and the spec's single-value binary
  * serialization (Appendix D of the public Iceberg spec; reference
  * shapes: iceberg-rust-spec/src/spec/values.rs).
  *
  * Bounds in manifests (`lower_bounds`/`upper_bounds`) are maps of
  * field-id -> these binary forms; decoding them into the engine's
  * canonical stat strings is what makes manifest pruning work on
  * tables other engines wrote.
  */
object IcebergTypes {

  /** Iceberg primitive type name for a Spark type. */
  def toIceberg(t: DataType): String = t match {
    case BooleanType => "boolean"
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case StringType => "string"
    case DateType => "date"
    case TimestampType => "timestamptz"
    case TimestampNTZType => "timestamp"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case other =>
      throw new IllegalArgumentException(s"unsupported Iceberg type for $other")
  }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  /** Spark type for an Iceberg primitive type name. */
  def toSpark(t: String): DataType = t match {
    case "boolean" => BooleanType
    case "int" => IntegerType
    case "long" => LongType
    case "float" => FloatType
    case "double" => DoubleType
    case "string" | "uuid" => StringType
    case "date" => DateType
    case "timestamptz" => TimestampType
    case "timestamp" => TimestampNTZType
    case "binary" => BinaryType
    case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
    case other =>
      throw new IllegalArgumentException(s"unsupported Iceberg type $other")
  }

  // ---- single-value binary serialization -----------------------------

  private def le(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** Encode a JVM value as the Iceberg single-value binary form. */
  def encode(t: DataType, v: Any): Array[Byte] = (t, v) match {
    case (BooleanType, b: Boolean) => Array(if (b) 1.toByte else 0.toByte)
    case (IntegerType, i: Int) => le(4).putInt(i).array()
    case (LongType, l: Long) => le(8).putLong(l).array()
    case (FloatType, f: Float) => le(4).putFloat(f).array()
    case (DoubleType, d: Double) => le(8).putDouble(d).array()
    case (StringType, s: String) => s.getBytes(StandardCharsets.UTF_8)
    case (DateType, d: java.sql.Date) =>
      le(4).putInt(d.toLocalDate.toEpochDay.toInt).array()
    case (DateType, i: Int) => le(4).putInt(i).array()
    case (TimestampType, micros: Long) => le(8).putLong(micros).array()
    case (TimestampNTZType, micros: Long) => le(8).putLong(micros).array()
    case (TimestampType, ts: java.sql.Timestamp) =>
      val i = ts.toInstant
      le(8).putLong(i.getEpochSecond * 1000000L + i.getNano / 1000L).array()
    case _ =>
      throw new IllegalArgumentException(s"cannot encode $v as $t")
  }

  /** Decode an Iceberg single-value binary into the engine's canonical
    * stat string (same forms FooterStats writes, so pruning compares
    * consistently). Returns None for types without a canonical form. */
  def decodeToCanonical(t: DataType, bytes: Array[Byte]): Option[String] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    t match {
      case IntegerType => Some(b.getInt.toString)
      case LongType => Some(b.getLong.toString)
      case FloatType => Some(b.getFloat.toString)
      case DoubleType => Some(b.getDouble.toString)
      case StringType => Some(new String(bytes, StandardCharsets.UTF_8))
      case DateType =>
        Some(java.time.LocalDate.ofEpochDay(b.getInt.toLong).toString)
      case TimestampType | TimestampNTZType =>
        Some(graft.table.FooterStats.canonicalTimestampMicros(b.getLong))
      case _ => None
    }
  }
}
