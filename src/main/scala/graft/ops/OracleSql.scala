package graft.ops

/** Shared DuckDB oracle fragments: SQL replicas of graft's codegen'd
  * kernels that several oracles must rebuild identically. One source
  * of truth — a constant typo in a drifted copy would silently break
  * only that oracle's parity.
  */
private[ops] object OracleSql {

  /** murmur3_x86_32 of an 8-byte little-endian long `key` (the
    * Iceberg bucket key-hash, seed 0), as SELECT column expressions:
    * the two 4-byte blocks mixed per the public murmur3 spec, ending
    * in `hu` — the final unsigned 32-bit hash carried in a BIGINT.
    * Callers embed it as `SELECT <carry cols>, ${murmurLongCols(k)}
    * FROM ...` and read `hu` downstream. */
  def murmurLongCols(key: String): String =
    s"""($key & 4294967295) AS w0, (($key >> 32) & 4294967295) AS w1,
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
        ((f3)::HUGEINT * 3266489909 % 4294967296)::BIGINT AS f4, xor(f4, f4 >> 16) AS hu"""
}
