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

  /** The explicit recall dial. Random-hyperplane theory: a pair at
    * cosine c agrees on one plane with p = 1 - acos(c)/π, matches a
    * table with p^planes, and is a candidate with
    * recall = 1 - (1 - p^planes)^tables. Candidate mass per query is
    * ~ tables · N / 2^planes (uniform buckets), so fewer planes per
    * table trades candidates for recall:
    *
    *   preset        recall@cos0.45  @cos0.5  @cos0.8   candidate mass
    *   8x4 (default)      0.79         0.83    >0.999    8·N/16  (1×)
    *   16x3 (wide)        0.994        0.996   >0.9999  16·N/8   (4×)
    *
    * The default is the documented operating point for near-dup
    * dedup (recall >0.99 at the cos≥0.8 pairs that matter there);
    * `wide` serves a user targeting the weak cos≈0.5 band. Selected
    * per session via spark.conf `graft.ann.lshPreset`; oracles pin
    * the DEFAULT derivation bit-for-bit. */
  val Presets: Map[String, (Int, Int)] = Map(
    "8x4" -> (Tables, PlanesPerTable),
    "16x3" -> (16, 3))

  /** Indexed [table * planesPerTable + plane][dim]; reference plane
    * derivation shared with the pure-SQL oracle (murmur3 of the flat
    * index over Int.MaxValue) — the default preset's planes are
    * bit-for-bit the pre-dial ones. */
  private val planeCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int), Array[Array[Double]]]()
  def planesFor(tables: Int, planesPerTable: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((tables, planesPerTable), { _ =>
      Array.tabulate(tables * planesPerTable, Dim) { (p, i) =>
        IcebergHash.hashLong((p * Dim + i).toLong).toDouble / Int.MaxValue
      }
    })

  lazy val planes: Array[Array[Double]] = planesFor(Tables, PlanesPerTable)

  /** (table, sign-bit bucket) pairs for one embedding. */
  def bucketKeys(emb: ArrayData): ArrayData =
    bucketKeys(emb, Tables, PlanesPerTable)

  def bucketKeys(emb: ArrayData, tables: Int, planesPerTable: Int)
      : ArrayData = {
    val ps = planesFor(tables, planesPerTable)
    val v = emb.toDoubleArray()
    val n = math.min(v.length, Dim)
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var b = 0
      var p = 0
      while (p < planesPerTable) {
        val plane = ps(t * planesPerTable + p)
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

  def bucketKeysCol(c: Column, tables: Int = Tables,
      planesPerTable: Int = PlanesPerTable): Column =
    GraftShim.column(LshBucketKeys(GraftShim.expression(c),
      tables, planesPerTable))

  /** The session dial's validated NAME — what persisted bucket-key
    * tables are stamped with (Similarity.persistBucketKeys) and what
    * loads assert against. */
  def presetNameOf(s: org.apache.spark.sql.SparkSession): String = {
    val name = s.conf.get("graft.ann.lshPreset", "8x4")
    if (!Presets.contains(name)) throw new IllegalArgumentException(
      s"unknown graft.ann.lshPreset '$name' " +
        s"(known: ${Presets.keys.toSeq.sorted.mkString(", ")})")
    name
  }

  /** The preset a session selected (spark conf graft.ann.lshPreset;
    * unknown names fail loudly with the known dial positions). */
  def presetOf(s: org.apache.spark.sql.SparkSession): (Int, Int) =
    Presets(presetNameOf(s))
}

case class LshBucketKeys(child: Expression,
    tables: Int = LshKernel.Tables,
    planesPerTable: Int = LshKernel.PlanesPerTable)
  extends UnaryExpression {
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
    LshKernel.bucketKeys(v.asInstanceOf[ArrayData], tables, planesPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshKernel$$.MODULE$$.bucketKeys($c, " +
        s"$tables, $planesPerTable)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketKeys =
    copy(child = newChild)
  override def prettyName: String = "lsh_bucket_keys"
}
