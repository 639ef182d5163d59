package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Array kernels for the similarity/dedup operators (SURVEY.md §2.D).
  *
  * The DataFrame-API equivalents (zip_with + aggregate lambdas, or a
  * 64-column min() aggregation for MinHash) evaluate interpreted
  * per-element; these expressions run one fused loop per row inside
  * whole-stage codegen. Numerics match the declarative forms exactly:
  * sequential left-to-right double accumulation (DuckDB-oracle parity).
  */
object ArrayKernels {

  /** cosine(a, b) = dot/(|a||b|), sequential fold over double arrays. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** MinHash band keys: k min-hashes from the murmur3 family
    * (seed = hash index), folded into `bands` keys of k/bands rows
    * each (band contents hashed together with the band index mixed
    * in). One pass over the shingle array. */
  def minhashBands(shingles: ArrayData, k: Int, bands: Int): ArrayData = {
    val mins = new Array[Int](k)
    java.util.Arrays.fill(mins, Int.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val bytes = shingles.getUTF8String(i).getBytes
      var j = 0
      while (j < k) {
        val h = IcebergHash.murmur3(bytes, j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    val rows = k / bands
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var acc = b // mix the band index so identical row-slices differ
      var r = 0
      while (r < rows) {
        acc = acc * 0x01000193 ^ mins(b * rows + r)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out.map(Int.box))
  }

  /** Exact Jaccard over two string arrays (set semantics). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val setB = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < b.numElements()) { setB.add(b.getUTF8String(i)); i += 1 }
    var inter = 0
    val it = setA.iterator()
    while (it.hasNext) if (setB.contains(it.next())) inter += 1
    val union = setA.size + setB.size - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  /** Overlap coefficient |A∩B| / min(|A|,|B|) of two SORTED long
    * arrays by linear merge — no per-element boxing, no hash set;
    * the verify kernel of the containment set-similarity join. */
  def sortedOverlap(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val mn = if (n < m) n else m
    if (mn == 0) 1.0 else inter.toDouble / mn
  }

  def cosineSim(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a), GraftShim.expression(b)))

  def sortedOverlapCol(a: Column, b: Column): Column =
    GraftShim.column(SortedOverlap(GraftShim.expression(a), GraftShim.expression(b)))

  def minhashBandKeys(shingles: Column, k: Int, bands: Int): Column =
    GraftShim.column(MinHashBands(GraftShim.expression(shingles), k, bands))

  def jaccardSim(a: Column, b: Column): Column =
    GraftShim.column(JaccardSim(GraftShim.expression(a), GraftShim.expression(b)))
}

case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayKernels$$.MODULE$$.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

case class MinHashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ArrayKernels.minhashBands(v.asInstanceOf[ArrayData], k, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ArrayKernels$$.MODULE$$.minhashBands($c, $k, $bands)")
  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
  override def prettyName: String = "minhash_bands"
}

case class SortedOverlap(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.sortedOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayKernels$$.MODULE$$.sortedOverlap($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedOverlap =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_overlap"
}

case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayKernels$$.MODULE$$.jaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sim"
}
