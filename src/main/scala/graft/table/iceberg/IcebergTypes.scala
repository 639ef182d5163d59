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

  private val typeMapper = new com.fasterxml.jackson.databind.ObjectMapper()

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
    case nested @ (_: StructType | _: ArrayType | _: MapType) =>
      throw new IllegalArgumentException(
        s"nested type $nested needs toIcebergNested (field-id allocation)")
    case other =>
      throw new IllegalArgumentException(s"unsupported Iceberg type for $other")
  }

  /** Iceberg type STRING for any Spark type: primitives render as the
    * bare name, struct/list/map as the spec's JSON object form (the
    * same mixed representation IceField.tpe holds on read). Nested
    * field ids (struct fields, element-id, key-id/value-id) draw from
    * `alloc` — the spec requires ids unique across the whole schema
    * (iceberg-rust-spec types.rs). */
  def toIcebergNested(t: DataType, alloc: () => Int): String = t match {
    case s: StructType =>
      val n = typeMapper.createObjectNode()
      n.put("type", "struct")
      val fs = n.putArray("fields")
      s.fields.foreach { f =>
        val id = alloc() // parent ids precede child ids (depth-first)
        val fn = fs.addObject()
        fn.put("id", id); fn.put("name", f.name)
        fn.put("required", !f.nullable)
        setType(fn, "type", toIcebergNested(f.dataType, alloc))
      }
      n.toString
    case a: ArrayType =>
      val n = typeMapper.createObjectNode()
      n.put("type", "list")
      n.put("element-id", alloc())
      n.put("element-required", !a.containsNull)
      setType(n, "element", toIcebergNested(a.elementType, alloc))
      n.toString
    case m: MapType =>
      val n = typeMapper.createObjectNode()
      n.put("type", "map")
      n.put("key-id", alloc())
      setType(n, "key", toIcebergNested(m.keyType, alloc))
      n.put("value-id", alloc())
      n.put("value-required", !m.valueContainsNull)
      setType(n, "value", toIcebergNested(m.valueType, alloc))
      n.toString
    case p => toIceberg(p)
  }

  private def setType(n: com.fasterxml.jackson.databind.node.ObjectNode,
      key: String, tpe: String): Unit =
    if (tpe.startsWith("{")) n.set(key, typeMapper.readTree(tpe))
    else n.put(key, tpe)

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  /** Spark type for an Iceberg type string — a primitive name or the
    * JSON object form for struct/list/map. */
  def toSpark(t: String): DataType =
    if (t.startsWith("{")) toSparkNested(typeMapper.readTree(t))
    else t match {
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

  private def toSparkNested(
      n: com.fasterxml.jackson.databind.JsonNode): DataType = {
    import scala.jdk.CollectionConverters._
    def typeOf(f: com.fasterxml.jackson.databind.JsonNode): DataType =
      if (f.isTextual) toSpark(f.asText()) else toSparkNested(f)
    n.get("type").asText() match {
      case "struct" => StructType(
        n.get("fields").elements().asScala.map(f => StructField(
          f.get("name").asText(), typeOf(f.get("type")),
          nullable = !f.get("required").asBoolean())).toSeq)
      case "list" => ArrayType(typeOf(n.get("element")),
        containsNull = !Option(n.get("element-required"))
          .exists(_.asBoolean()))
      case "map" => MapType(typeOf(n.get("key")), typeOf(n.get("value")),
        valueContainsNull = !Option(n.get("value-required"))
          .exists(_.asBoolean()))
      case other =>
        throw new IllegalArgumentException(s"unsupported nested type $other")
    }
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
    // decimal: big-endian two's-complement UNSCALED integer in the
    // minimum number of bytes (spec Appendix D single-value form)
    case (d: DecimalType, bd: java.math.BigDecimal) =>
      bd.setScale(d.scale).unscaledValue().toByteArray
    case (d: DecimalType, bd: BigDecimal) =>
      bd.underlying().setScale(d.scale).unscaledValue().toByteArray
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
      // 4-byte bounds under a LONG (or 4-byte under DOUBLE) column:
      // the manifest predates an int->long / float->double promotion.
      // Widening the raw bits is EXACT (unlike re-parsing a rendered
      // string), so pruning under the widened comparator stays sound —
      // the same buffer-length dispatch Iceberg's own Conversions does
      // for promoted types.
      case LongType if bytes.length == 4 => Some(b.getInt.toLong.toString)
      case LongType => Some(b.getLong.toString)
      case FloatType => Some(b.getFloat.toString)
      case DoubleType if bytes.length == 4 =>
        Some(b.getFloat.toDouble.toString)
      case DoubleType => Some(b.getDouble.toString)
      case StringType => Some(new String(bytes, StandardCharsets.UTF_8))
      case DateType =>
        Some(java.time.LocalDate.ofEpochDay(b.getInt.toLong).toString)
      case TimestampType | TimestampNTZType =>
        Some(graft.table.FooterStats.canonicalTimestampMicros(b.getLong))
      case d: DecimalType => Some(new java.math.BigDecimal(
        new java.math.BigInteger(bytes), d.scale).toPlainString)
      case _ => None
    }
  }
}
