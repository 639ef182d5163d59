package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.IcebergTransforms
import graft.functions.IcebergTransforms.{truncateInt, truncateString, yearsFromEpoch, monthsFromEpoch, daysFromEpoch, hoursFromEpoch}

/** Partition-transform queries (SURVEY.md §2.B): the Iceberg transforms
  * (reference: iceberg-rust-spec/src/spec/partition.rs:27) applied as
  * grouping keys, the way a partitioned write or partition-pruned scan
  * would use them.
  */
object Transforms {
  type Q = (SparkSession, String) => DataFrame

  /** truncate(W) on int + string, identity alongside. */
  val ptTruncate: Q = (s, d) => {
    Tables.part(s, d)
      .select(
        truncateInt(col("p_size"), 10).as("size_bucket"),
        truncateString(col("p_brand"), 6).as("brand_prefix"))
      .groupBy(col("size_bucket"), col("brand_prefix"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("size_bucket"), col("brand_prefix"))
  }

  val ptTruncateSql: String =
    """SELECT p_size - (((p_size % 10) + 10) % 10) AS size_bucket,
       substring(p_brand,1,6) AS brand_prefix, count(*) AS n
       FROM part GROUP BY 1,2 ORDER BY size_bucket, brand_prefix"""

  /** year/month/day/hour transforms: units since the 1970 epoch, per the
    * Iceberg spec (not calendar extracts). */
  val ptDatetime: Q = (s, d) => {
    Tables.orders(s, d)
      .select(
        yearsFromEpoch(col("o_orderdate")).as("y_1970"),
        monthsFromEpoch(col("o_orderdate")).as("m_1970"),
        daysFromEpoch(col("o_orderdate")).as("d_1970"),
        hoursFromEpoch(col("o_orderdate")).as("h_1970"))
      .groupBy(col("y_1970"), col("m_1970"), col("d_1970"), col("h_1970"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("y_1970"), col("m_1970"), col("d_1970"), col("h_1970"))
  }

  val ptDatetimeSql: String =
    """SELECT (year(o_orderdate)-1970)::int AS y_1970,
       ((year(o_orderdate)-1970)*12 + month(o_orderdate)-1)::int AS m_1970,
       date_diff('day', DATE '1970-01-01', o_orderdate::date)::int AS d_1970,
       date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)::int AS h_1970,
       count(*) AS n
       FROM orders GROUP BY 1,2,3,4 ORDER BY y_1970, m_1970, d_1970, h_1970"""

  /** bucket(N): Iceberg murmur3 hash transform over long + string keys.
    * Not expressible in DuckDB (rows-only check); hash conformance is
    * unit-tested against the public Iceberg spec vectors. */
  val ptBucket: Q = (s, d) => {
    Tables.orders(s, d)
      .select(
        IcebergTransforms.bucket(col("o_orderkey"), 16).as("key_bucket"),
        IcebergTransforms.bucket(col("o_orderpriority"), 4).as("prio_bucket"))
      .groupBy(col("key_bucket"), col("prio_bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("key_bucket"), col("prio_bucket"))
  }


  /** Independent DuckDB implementation of murmur3_x86_32 in PURE SQL
    * (recursive CTE over 4-byte blocks for strings, unrolled two-block
    * form for the 8-byte-LE long serialization) — validated against
    * the public Iceberg spec vectors (hash(34L)=2017239379,
    * hash("iceberg")=1210000089). This makes the bucket transform
    * oracle-checked rather than rows-only: two unrelated
    * implementations must agree on every bucket count. */
  val ptBucketSql: String =
    """WITH RECURSIVE prio AS (SELECT DISTINCT o_orderpriority AS s FROM orders),
blk AS (
  SELECT s, 0::BIGINT AS i, 0::BIGINT AS h, length(s)//4 AS nb FROM prio
  UNION ALL
  SELECT s, i+1,
    ((((((xor(h, (((((((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | (((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT)) << 13) | ((xor(h, (((((((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | (((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT)) >> 19)) & 4294967295) * 5 + 3864292196) % 4294967296),
    nb
  FROM blk WHERE i < nb),
done AS (SELECT s, h, nb FROM blk WHERE i = nb),
tail AS (
  SELECT s, h, length(s) AS len,
    CASE length(s) % 4
      WHEN 0 THEN 0 WHEN 1 THEN ord(substr(s, 4*nb+1, 1))
      WHEN 2 THEN ord(substr(s, 4*nb+1, 1)) + ord(substr(s, 4*nb+2, 1))*256
      ELSE ord(substr(s, 4*nb+1, 1)) + ord(substr(s, 4*nb+2, 1))*256 + ord(substr(s, 4*nb+3, 1))*65536
    END AS tk
  FROM done),
mixed AS (
  SELECT s, len, CASE WHEN len % 4 = 0 THEN h
    ELSE xor(h, ((((((((tk)::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | ((((tk)::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT) END AS hm
  FROM tail),
fin AS (
  SELECT s, xor(hm, len) AS f0, xor(f0, f0 >> 16) AS f1,
    ((f1)::HUGEINT * 2246822507 % 4294967296)::BIGINT AS f2, xor(f2, f2 >> 13) AS f3,
    ((f3)::HUGEINT * 3266489909 % 4294967296)::BIGINT AS f4, xor(f4, f4 >> 16) AS hu
  FROM mixed),
prio_buckets AS (
  SELECT s, ((hu & 2147483647) % 4)::INT AS prio_bucket FROM fin),
key_hash AS (
  SELECT o_orderkey, o_orderpriority,
    (o_orderkey & 4294967295) AS w0, ((o_orderkey >> 32) & 4294967295) AS w1,
    ((w0)::HUGEINT * 3432918353 % 4294967296)::BIGINT AS p0a,
    ((((((p0a) << 15) | ((p0a) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT AS p0b,
    xor(0::BIGINT, p0b) AS h0a,
    ((((((h0a) << 13) | ((h0a) >> 19)) & 4294967295) * 5 + 3864292196) % 4294967296) AS h0,
    ((w1)::HUGEINT * 3432918353 % 4294967296)::BIGINT AS p1a,
    ((((((p1a) << 15) | ((p1a) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT AS p1b,
    xor(h0, p1b) AS h1a,
    ((((((h1a) << 13) | ((h1a) >> 19)) & 4294967295) * 5 + 3864292196) % 4294967296) AS h1b,
    xor(h1b, 8) AS f0, xor(f0, f0 >> 16) AS f1,
    ((f1)::HUGEINT * 2246822507 % 4294967296)::BIGINT AS f2, xor(f2, f2 >> 13) AS f3,
    ((f3)::HUGEINT * 3266489909 % 4294967296)::BIGINT AS f4, xor(f4, f4 >> 16) AS hu
  FROM orders)
SELECT ((k.hu & 2147483647) % 16)::INT AS key_bucket, pb.prio_bucket, count(*) AS n
FROM key_hash k JOIN prio_buckets pb ON k.o_orderpriority = pb.s
GROUP BY 1, 2 ORDER BY key_bucket, prio_bucket"""

  /** Z-order (Morton) clustering key — the multi-dimensional sort
    * order the table layer clusters by (ZOrderKeys.zOrder2, a codegen'd
    * bit-twiddling kernel): each signed dimension sign-flips to
    * unsigned space, drops its LSB, and interleaves bit-by-bit so
    * sorting by z walks the Morton curve — every data file then holds
    * a narrow range in BOTH dimensions and min/max pruning bites on
    * either predicate. The key's VALUE is oracled here bit-for-bit:
    * DuckDB rebuilds the interleave from first principles (a per-bit
    * sum, not the twiddling masks — an independent formulation), plus
    * a locality aggregate per coarse z-prefix showing both-dimension
    * ranges narrow together. */
  val ptZorder: Q = (s, d) => {
    val z = graft.functions.ZOrderKeys.zorder(
      col("p_partkey").cast("int"), col("p_size").cast("int"))
    val zz = Tables.part(s, d)
      .select(col("p_partkey"), col("p_size"), z.as("z"))
    // 16 span-relative buckets (all-integer arithmetic): contiguous
    // z ranges — each must show a narrow range in BOTH dimensions
    val span = zz.agg(min(col("z")).as("mn"), max(col("z")).as("mx"))
    zz.crossJoin(broadcast(span))
      .groupBy(((col("z") - col("mn")) * 16 / (col("mx") - col("mn") + 1))
        .cast("long").as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("p_partkey")).as("min_key"), max(col("p_partkey")).as("max_key"),
        min(col("p_size")).as("min_size"), max(col("p_size")).as("max_size"),
        min(col("z")).as("min_z"))
      .orderBy(col("zbucket"))
  }

  /** Independent replica: per-bit interleave sum over 31 bits of the
    * sign-flipped, LSB-dropped dimensions. */
  val ptZorderSql: String =
    """WITH u AS (
        SELECT p_partkey, p_size,
          ((p_partkey + 2147483648) % 4294967296) // 2 AS ua,
          ((p_size + 2147483648) % 4294967296) // 2 AS ub
        FROM part),
      zz AS (
        SELECT p_partkey, p_size,
          list_sum(list_transform(range(0, 31), i ->
            (((ua >> i) & 1) << (2*i)) + (((ub >> i) & 1) << (2*i+1))
          ))::BIGINT AS z
        FROM u)
      SELECT ((z - mn) * 16 // (mx - mn + 1))::BIGINT AS zbucket,
        count(*) AS n,
        min(p_partkey) AS min_key, max(p_partkey) AS max_key,
        min(p_size) AS min_size, max(p_size) AS max_size,
        min(z) AS min_z
      FROM zz CROSS JOIN (SELECT min(z) AS mn, max(z) AS mx FROM zz) s
      GROUP BY 1 ORDER BY zbucket"""

  val queries: Map[String, Q] = Map(
    "pt_truncate" -> ptTruncate,
    "pt_datetime" -> ptDatetime,
    "pt_zorder" -> ptZorder,
    "pt_bucket" -> ptBucket)

  val oracles: Map[String, String] = Map(
    "pt_truncate" -> ptTruncateSql,
    "pt_datetime" -> ptDatetimeSql,
    "pt_zorder" -> ptZorderSql,
    "pt_bucket" -> ptBucketSql)
}
