package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg partition-transform semantics (reference:
  * iceberg-rust-spec/src/spec/partition.rs:27 — Identity, Bucket(N),
  * Truncate(W), Year, Month, Day, Hour, Void) re-expressed Spark-first.
  *
  * Everything except bucket composes from codegen'd builtins. Bucket
  * requires the Iceberg-spec hash — murmur3_x86_32(seed=0) over the
  * single-value binary serialization (ints widened to 8-byte
  * little-endian longs, strings as UTF-8) — which differs from Spark's
  * own Murmur3Hash (seed 42, different layout), so it's a custom
  * Catalyst Expression with real `doGenCode`.
  */
object IcebergHash {

  /** murmur3_x86_32 over bytes, per the public algorithm (Austin
    * Appleby, public domain) with the final length-XOR finalizer. */
  def murmur3(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nBlocks = data.length / 4
    var i = 0
    while (i < nBlocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nBlocks * 4
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((data.length & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= (h1 >>> 16)
    h1 *= 0x85ebca6b
    h1 ^= (h1 >>> 13)
    h1 *= 0xc2b2ae35
    h1 ^= (h1 >>> 16)
    h1
  }

  /** Iceberg serializes int/long/date/timestamp inputs as 8-byte
    * little-endian longs before hashing (spec Appendix B). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b, 0)
  }

  def hashBytes(b: Array[Byte]): Int = murmur3(b, 0)

  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n
  def bucketBytes(b: Array[Byte], n: Int): Int = (hashBytes(b) & Int.MaxValue) % n
  def bucketUtf8(s: UTF8String, n: Int): Int = bucketBytes(s.getBytes, n)
}

/** `bucket(N)` as a native expression: hash partition transform from
  * the Iceberg spec, usable in select/groupBy/repartition. Stays inside
  * whole-stage codegen via `doGenCode`. */
case class IcebergBucket(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case IntegerType | LongType | DateType | TimestampType | StringType |
          BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"iceberg_bucket does not support type $other")
    }
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case IntegerType => IcebergHash.bucketLong(v.asInstanceOf[Int].toLong, numBuckets)
    case LongType => IcebergHash.bucketLong(v.asInstanceOf[Long], numBuckets)
    case DateType => IcebergHash.bucketLong(v.asInstanceOf[Int].toLong, numBuckets)
    case TimestampType => IcebergHash.bucketLong(v.asInstanceOf[Long], numBuckets)
    case StringType => IcebergHash.bucketUtf8(v.asInstanceOf[UTF8String], numBuckets)
    case BinaryType => IcebergHash.bucketBytes(v.asInstanceOf[Array[Byte]], numBuckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hash = "graft.functions.IcebergHash$.MODULE$"
    child.dataType match {
      case IntegerType | DateType =>
        defineCodeGen(ctx, ev, c => s"$hash.bucketLong((long)$c, $numBuckets)")
      case LongType | TimestampType =>
        defineCodeGen(ctx, ev, c => s"$hash.bucketLong($c, $numBuckets)")
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$hash.bucketUtf8($c, $numBuckets)")
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"$hash.bucketBytes($c, $numBuckets)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)

  override def prettyName: String = "iceberg_bucket"
}

object IcebergTransforms {

  /** bucket(N): murmur3-based hash partition number. */
  def bucket(c: Column, n: Int): Column =
    GraftShim.column(IcebergBucket(GraftShim.expression(c), n))

  /** truncate(W) for integral columns: floor-to-width (sign-correct for
    * negatives, per spec: `v - (((v % W) + W) % W)`). */
  def truncateInt(c: Column, w: Int): Column =
    c - (((c % w) + w) % w)

  /** truncate(W) for strings: first W characters. */
  def truncateString(c: Column, w: Int): Column = substring(c, 1, w)

  /** years from 1970. */
  def yearsFromEpoch(c: Column): Column = (year(c) - 1970).cast("int")

  /** months from 1970-01. */
  def monthsFromEpoch(c: Column): Column =
    ((year(c) - 1970) * 12 + month(c) - 1).cast("int")

  /** days from 1970-01-01. */
  def daysFromEpoch(c: Column): Column =
    datediff(c.cast("date"), to_date(lit("1970-01-01"))).cast("int")

  /** hours from 1970-01-01T00. */
  def hoursFromEpoch(c: Column): Column =
    floor(unix_timestamp(c) / 3600).cast("int")

  /** void: always null (keeps the column's slot in a partition spec). */
  def voidTransform(c: Column): Column = lit(null).cast("int")
}
