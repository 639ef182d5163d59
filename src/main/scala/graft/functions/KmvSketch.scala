package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct sketch as a typed Aggregator.
  *
  * The classic bounded-state approximate COUNT DISTINCT (Bar-Yossef et
  * al. 2002; the estimator family behind theta sketches): keep the k
  * smallest DISTINCT 32-bit hash values seen; if fewer than k distinct
  * hashes were observed the count is exact, otherwise estimate
  * (k-1) * 2^32 / h_k where h_k is the k-th smallest hash.
  *
  * Scale design: state is a sorted array capped at k longs (k=64 →
  * 512 bytes) regardless of input cardinality, reduce is a binary
  * search + bounded insert, and merge is a sorted-merge-truncate — so
  * partial (map-side) aggregation applies like any builtin and a
  * 100 TB groupBy ships k values per group per partition, never the
  * key sets. The hash is the deterministic Iceberg bucket murmur3
  * (IcebergHash.hashLong), so the DuckDB oracle rebuilds the sketch
  * bit-for-bit with the same pure-SQL murmur replica the pt_bucket
  * oracle uses — the estimate is reproducible, not just close.
  */
object KmvDistinct extends Aggregator[Long, Array[Long], Double] {
  val K = 64

  override def zero: Array[Long] = Array.empty[Long]

  /** Insert the unsigned hash into the sorted bounded state. */
  private def insert(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) return b // duplicate hash — KMV state is a set
    val ins = -pos - 1
    if (b.length < K) {
      val out = new Array[Long](b.length + 1)
      System.arraycopy(b, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(b, ins, out, ins + 1, b.length - ins)
      out
    } else if (ins < K) {
      // displaces the current maximum
      val out = new Array[Long](K)
      System.arraycopy(b, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(b, ins, out, ins + 1, K - ins - 1)
      out
    } else b
  }

  override def reduce(b: Array[Long], key: Long): Array[Long] =
    insert(b, IcebergHash.hashLong(key).toLong & 0xffffffffL)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted merge, dedup, truncate at K
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0; var j = 0; var n = 0
    var last = -1L
    while (n < K && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (v != last) { out(n) = v; n += 1; last = v }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Long]): Double =
    if (b.length < K) b.length.toDouble
    else (K - 1).toDouble * 4294967296.0 / b(K - 1)

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
