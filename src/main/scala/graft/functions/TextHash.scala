package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text hashing kernels (SURVEY.md §2.D): SimHash and a
  * winnowed rolling-hash fingerprint. Both are per-document scalar
  * computations — implemented as static kernels plus thin Catalyst
  * expressions with `doGenCode`, so the whole dedup pipeline stays
  * inside whole-stage codegen (no UDF serialization, no explode).
  */
object TextHash {

  /** 64-bit SimHash over whitespace word unigrams. Each word is hashed
    * twice with murmur3 (two seeds → 64 independent bits); bit j of the
    * result is the sign of the ±1 vote sum for that bit. */
  def simhash64(s: UTF8String): Long = {
    val text = s.toString
    val votes = new Array[Int](64)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) {
        val wb = text.substring(start, i).getBytes("UTF-8")
        val h1 = IcebergHash.murmur3(wb, 0)
        val h2 = IcebergHash.murmur3(wb, 0x9747b28c)
        var j = 0
        while (j < 32) {
          if (((h1 >>> j) & 1) == 1) votes(j) += 1 else votes(j) -= 1
          if (((h2 >>> j) & 1) == 1) votes(32 + j) += 1 else votes(32 + j) -= 1
          j += 1
        }
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Winnowed rolling fingerprint: murmur3 of the whole byte string in
    * the high 32 bits, the minimum murmur3 over sliding 8-byte windows
    * (shift-tolerant, content-defined) in the low 32. */
  def fingerprint(s: UTF8String): Long = {
    val bytes = s.getBytes
    val full = IcebergHash.murmur3(bytes, 0)
    var minH = Int.MaxValue
    var i = 0
    val window = new Array[Byte](8)
    while (i + 8 <= bytes.length) {
      System.arraycopy(bytes, i, window, 0, 8)
      val h = IcebergHash.murmur3(window, 0)
      if (h < minH) minH = h
      i += 1
    }
    (full.toLong << 32) | (minH.toLong & 0xffffffffL)
  }

  /** Unicode NFC canonical composition — the pre-tokenization
    * normalization every text pipeline runs so visually-identical
    * strings (e + combining acute vs precomposed é) hash and dedup
    * identically. Static so codegen can call it directly. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan; ASCII and
    // already-composed text never allocates
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer
      .normalize(str, java.text.Normalizer.Form.NFC))
  }

  def simhash(c: Column): Column = GraftShim.column(SimHash64(GraftShim.expression(c)))
  def docFingerprint(c: Column): Column = GraftShim.column(DocFingerprint(GraftShim.expression(c)))
  def nfcNormalize(c: Column): Column = GraftShim.column(NfcNormalize(GraftShim.expression(c)))
}

/** NFC normalization as a codegen'd Catalyst expression: stays inside
  * whole-stage codegen (one static call per row, no UDF serialization
  * seam), so the cleanup pass fuses with the rest of the projection. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize needs a string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    TextHash.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash$$.MODULE$$.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 needs a string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    TextHash.simhash64(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash$$.MODULE$$.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

case class DocFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"doc_fingerprint needs a string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    TextHash.fingerprint(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash$$.MODULE$$.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
  override def prettyName: String = "doc_fingerprint"
}
