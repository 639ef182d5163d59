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
