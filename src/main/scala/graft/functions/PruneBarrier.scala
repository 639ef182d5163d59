package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Runtime no-op that blocks nested-schema pruning from reaching an
  * id-resolved parquet scan.
  *
  * Spark's SchemaPruning rebuilds the file read schema for a pruned
  * nested access WITHOUT the `parquet.field.id` metadata (observed on
  * Spark 4.1: reading a file whose struct column was since RENAMED,
  * `select(s)` resolves by field id but `select(s.leaf)` null-fills
  * — with ids stamped on every level of the requested schema). The
  * catalog V2 path is immune because the scan re-stamps ids on the
  * pruned schema it hands the reader factory; the driver-path
  * `spark.read.schema(ids).parquet(...)` readers have no such hook,
  * so they wrap nested-typed columns in this barrier instead: pruning
  * pattern-matches ExtractValue chains over plain attributes, and the
  * barrier breaks the match, forcing the struct to be read whole —
  * which the id resolution handles correctly. Codegen passes the
  * child straight through, so the runtime cost is zero; the read cost
  * is the unpruned nested column, paid only on id-resolved tables
  * with nested types (see PruneBarrier.protectNested).
  */
case class PruneBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): PruneBarrier =
    copy(child = newChild)
}

object PruneBarrier {
  import org.apache.spark.sql.{DataFrame, GraftShim}
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.types._

  private def isNested(t: DataType): Boolean = t match {
    case _: StructType | _: ArrayType | _: MapType => true
    case _ => false
  }

  def hasNested(schema: StructType): Boolean =
    schema.fields.exists(f => isNested(f.dataType))

  /** Wrap every nested-typed column of `df` in a barrier (scalar
    * columns pass through untouched, so their filters still push
    * down). No-op when the schema has no nested types. */
  def protectNested(df: DataFrame): DataFrame =
    if (!hasNested(df.schema)) df
    else df.select(df.schema.fields.map { f =>
      if (isNested(f.dataType))
        GraftShim.column(PruneBarrier(
          GraftShim.expression(col(f.name)))).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
}
