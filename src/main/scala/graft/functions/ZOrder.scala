package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleaving for write clustering: sorting by the
  * interleaved key gives every data file a narrow range in BOTH
  * dimensions, so manifest min/max pruning bites on predicates over
  * either column — the multi-dimensional upgrade of a single-column
  * sort order. Order-preserving per dimension via the unsigned
  * sign-flip. */
object ZOrderKeys {

  /** Spread the low 32 bits of v so bit i lands at bit 2i (standard
    * Morton bit-twiddling, public domain). */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 62-bit z-value of two signed dimensions: sign-flip to unsigned,
    * drop the LSB (31 bits each) so the interleaved key never sets the
    * long's sign bit — signed comparisons then match unsigned z order
    * (adjacent-integer ties are harmless for a clustering key). */
  def zOrder2(a: Int, b: Int): Long = {
    val ua = ((a ^ Int.MinValue).toLong & 0xffffffffL) >>> 1
    val ub = ((b ^ Int.MinValue).toLong & 0xffffffffL) >>> 1
    spread(ua) | (spread(ub) << 1)
  }

  def zorder(a: Column, b: Column): Column =
    GraftShim.column(ZOrder2(GraftShim.expression(a), GraftShim.expression(b)))

  // ---- full-width N-dimensional z-key ---------------------------------
  //
  // The Long-valued zOrder2 truncates each dimension to 31 bits, which
  // silently destroys clustering for keys outside the int range (top
  // bits all differ) AND for keys inside a narrow band (top bits all
  // equal). The binary z-key keeps every dimension at its full 64-bit
  // order-preserving normalization and interleaves bit-by-bit into an
  // 8*n-byte array — BinaryType sorts unsigned-lexicographically, so
  // sorting by the key walks the Morton curve exactly.

  /** Order-preserving map of a signed long onto unsigned-comparable
    * space (flip the sign bit). */
  def normSignedLong(v: Long): Long = v ^ Long.MinValue

  /** IEEE-754 total order as unsigned: positive floats map above the
    * sign-flip midpoint, negatives reverse their magnitude order
    * (the classic sortable-bits trick; NaNs land at the top). */
  def normDouble(v: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(v)
    if (bits < 0) ~bits else bits ^ Long.MinValue
  }

  /** First 8 bytes of the UTF-8 encoding, big-endian, zero-padded —
    * unsigned-comparable and prefix-order-preserving. */
  def normPrefix(bytes: Array[Byte]): Long = {
    var out = 0L
    var i = 0
    val n = math.min(8, bytes.length)
    while (i < n) { out |= (bytes(i) & 0xffL) << ((7 - i) * 8); i += 1 }
    out
  }

  /** Interleave n unsigned-comparable longs bit-by-bit (MSB first)
    * into an 8*n-byte Morton key. */
  def interleave(vals: Array[Long]): Array[Byte] = {
    val n = vals.length
    val out = new Array[Byte](8 * n)
    var bit = 0 // output bit cursor
    var i = 0
    while (i < 64) {
      var j = 0
      while (j < n) {
        if (((vals(j) >>> (63 - i)) & 1L) != 0L)
          out(bit >> 3) = (out(bit >> 3) | (0x80 >> (bit & 7))).toByte
        bit += 1
        j += 1
      }
      i += 1
    }
    out
  }

  def zorderBytes(cols: Column*): Column =
    GraftShim.column(ZOrderBytes(cols.map(GraftShim.expression)))
}

/** N-dimensional full-width Morton key over any orderable scalar
  * columns. NULL in any dimension clusters first (normalizes to 0). */
case class ZOrderBytes(children: Seq[Expression])
    extends Expression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.size < 2 || children.size > 8)
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"zorder takes 2..8 columns, got ${children.size}")
    val bad = children.map(_.dataType).collectFirst {
      case t if !ZOrderBytes.supported(t) => t
    }
    bad match {
      case Some(t) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"zorder cannot cluster on $t")
      case None =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val c = children(i)
      val v = c.eval(input)
      vals(i) = if (v == null) 0L else ZOrderBytes.norm(c.dataType, v)
      i += 1
    }
    ZOrderKeys.interleave(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val vals = ctx.freshName("zvals")
    val assigns = children.map(_.genCode(ctx)).zip(children).zipWithIndex.map {
      case ((e, c), i) =>
        val norm = ZOrderBytes.genNorm(c.dataType, e.value.toString)
        code"""
           |${e.code}
           |$vals[$i] = ${e.isNull} ? 0L : $norm;""".stripMargin
    }.reduce(_ + _)
    ev.copy(
      code = code"""
         |long[] $vals = new long[${children.size}];
         |$assigns
         |byte[] ${ev.value} =
         |  graft.functions.ZOrderKeys$$.MODULE$$.interleave($vals);""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderBytes =
    copy(children = newChildren)
  override def prettyName: String = "zorder"
}

object ZOrderBytes {
  def supported(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType | FloatType | DoubleType |
        StringType => true
    case _: DecimalType => true
    case _ => false
  }

  def norm(t: DataType, v: Any): Long = t match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType =>
      ZOrderKeys.normSignedLong(v.asInstanceOf[Number].longValue())
    case FloatType =>
      ZOrderKeys.normDouble(v.asInstanceOf[Float].toDouble)
    case DoubleType => ZOrderKeys.normDouble(v.asInstanceOf[Double])
    case StringType =>
      ZOrderKeys.normPrefix(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    case _: DecimalType =>
      ZOrderKeys.normDouble(
        v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
    case other => throw new IllegalStateException(s"zorder: $other")
  }

  /** Java source for the same normalization, over a primitive/term. */
  def genNorm(t: DataType, term: String): String = t match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType =>
      s"graft.functions.ZOrderKeys$$.MODULE$$.normSignedLong((long)$term)"
    case FloatType | DoubleType =>
      s"graft.functions.ZOrderKeys$$.MODULE$$.normDouble((double)$term)"
    case StringType =>
      s"graft.functions.ZOrderKeys$$.MODULE$$.normPrefix($term.getBytes())"
    case _: DecimalType =>
      s"graft.functions.ZOrderKeys$$.MODULE$$.normDouble($term.toDouble())"
    case other => throw new IllegalStateException(s"zorder: $other")
  }
}

case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case IntegerType | ShortType | ByteType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"zorder2 needs 32-bit-or-narrower integer inputs, got " +
        s"${left.dataType}/${right.dataType} (cast wider types down or bucket them first)")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKeys.zOrder2(a.asInstanceOf[Number].intValue(), b.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderKeys$$.MODULE$$.zOrder2((int)$a, (int)$b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(left = l, right = r)
  override def prettyName: String = "zorder2"
}
