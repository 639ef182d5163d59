package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucketing as ONE compact Catalyst expression.
  *
  * The declarative formulation (32 plane-literal arrays × 64 doubles,
  * folded with zip_with/aggregate per table) produced a plan whose
  * whole-stage codegen alone took ~6 s to compile — per query, every
  * cold run. This expression keeps the planes in a static array and
  * emits a single static call, so the generated code is one line and
  * the kernel is a tight primitive loop. Bit-for-bit the same buckets:
  * identical plane derivation (murmur3 of the flat index over
  * Int.MaxValue) and identical left-to-right dot-product order.
  */
object LshKernel {
  val Dim = 64
  val Tables = 8
  val PlanesPerTable = 4

  /** Indexed [table * PlanesPerTable + plane][dim]; reference plane
    * derivation shared with the pure-SQL oracle. */
  lazy val planes: Array[Array[Double]] =
    Array.tabulate(Tables * PlanesPerTable, Dim) { (p, i) =>
      IcebergHash.hashLong((p * Dim + i).toLong).toDouble / Int.MaxValue
    }

  /** (table, sign-bit bucket) pairs for one embedding. */
  def bucketKeys(emb: ArrayData): ArrayData = {
    val v = emb.toDoubleArray()
    val n = math.min(v.length, Dim)
    val out = new Array[Any](Tables)
    var t = 0
    while (t < Tables) {
      var b = 0
      var p = 0
      while (p < PlanesPerTable) {
        val plane = planes(t * PlanesPerTable + p)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += v(i) * plane(i); i += 1 }
        if (dot >= 0) b |= (1 << p)
        p += 1
      }
      out(t) = InternalRow(t, b)
      t += 1
    }
    new GenericArrayData(out)
  }

  def bucketKeysCol(c: Column): Column =
    GraftShim.column(LshBucketKeys(GraftShim.expression(c)))
}

case class LshBucketKeys(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("t", IntegerType, nullable = false),
    StructField("b", IntegerType, nullable = false))), containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bucket_keys needs array<double>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    LshKernel.bucketKeys(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshKernel$$.MODULE$$.bucketKeys($c)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketKeys =
    copy(child = newChild)
  override def prettyName: String = "lsh_bucket_keys"
}
