package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextHash

/** Deduplication operators for training-data pipelines (SURVEY.md §2.D).
  *
  * Scale design: nothing here is all-pairs. Exact dedup is one
  * hash-groupBy; MinHash/SimHash near-dup detection shuffles on LSH
  * band keys (candidate pairs, not N², cross the wire); Jaccard
  * verification touches only candidates.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  // ---- shared shingling ----------------------------------------------

  /** Lowercased word 3-gram shingles of `text`; whole text if shorter
    * than 3 words. */
  private def shingles(text: Column): Column = {
    val w = split(trim(lower(text)), "\\s+")
    when(size(w) >= 3,
      transform(sequence(lit(0), size(w) - 3),
        i => concat_ws(" ", slice(w, i + 1, lit(3)))))
      .otherwise(array(lower(text)))
  }

  /** (doc_id, shingle) pairs, distinct per doc. */
  private def shingleTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(array_distinct(shingles(col("text")))).as("sh"))

  private val NumHashes = 64
  private val NumBands = 16
  private val RowsPerBand = NumHashes / NumBands

  /** MinHash signatures: k=64 min-hashes from the murmur3 family
    * (shingle hashed with the hash-function index mixed in), banded
    * into 16 keys of 4 rows for LSH. One shuffle (the groupBy). */
  private def bandedSignatures(s: SparkSession, d: String): DataFrame = {
    val sigCols = (0 until NumHashes).map(i =>
      min(hash(col("sh"), lit(i))).as(s"sig_$i"))
    val sigs = shingleTable(s, d)
      .groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
    val bands = (0 until NumBands).map { b =>
      val slice = (0 until RowsPerBand).map(r => col(s"sig_${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), hash(slice: _*).as("bh"))
    }
    sigs.select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** LSH candidate pairs: docs agreeing on at least one full band.
    * Equi-join on (band, band-hash) — the shuffle key is the bucket,
    * so cost tracks candidate count, never N². */
  private def minhashPairs(s: SparkSession, d: String): DataFrame = {
    val b = bandedSignatures(s, d)
    val left = b.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
    val right = b.select(col("doc_id").as("doc_b"), col("band"), col("bh"))
    left.join(right, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  // ---- operators ------------------------------------------------------

  /** Exact dedup: hash-groupBy on the canopy key (md5 of the 40-char
    * prefix), keep the smallest doc_id of each group. */
  val ddExact: Q = (s, d) => {
    Tables.documents(s, d)
      .groupBy(md5(substring(col("text"), 1, 40).cast("binary")).as("k"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  val ddExactSql: String =
    """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
       FROM documents GROUP BY md5(substring(text,1,40))
       ORDER BY doc_id"""

  /** MinHash+LSH candidate pairs (rows-only; Jaccard quality asserted
    * in DedupSpec). */
  val ddMinhashPairs: Q = (s, d) =>
    minhashPairs(s, d).orderBy(col("doc_a"), col("doc_b"))

  /** LSH dedup: keep-min-neighbor policy — a doc survives unless some
    * candidate pair links it to a smaller doc_id. Single anti-join
    * (one-pass approximation of connected components; iterate for
    * full transitive closure). */
  val ddMinhashDedup: Q = (s, d) => {
    val dead = minhashPairs(s, d).select(col("doc_b").as("doc_id")).distinct()
    Tables.documents(s, d)
      .join(dead, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dups: 64-bit fingerprints via the codegen'd SimHash64
    * expression, candidate generation by 16-bit chunk agreement
    * (pigeonhole: hamming <= 3 over 4 chunks guarantees a shared
    * chunk), exact hamming filter after the equi-join. */
  val ddSimhash: Q = (s, d) => {
    val fp = Tables.documents(s, d)
      .select(col("doc_id"), TextHash.simhash(col("text")).as("sh"))
    val keyed = fp.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("c"),
          shiftrightunsigned(col("sh"), c * 16).bitwiseAND(lit(0xffffL)).as("v"))
      }: _*)).as("x"))
      .select(col("doc_id"), col("sh"), col("x.c").as("c"), col("x.v").as("v"))
    val l = keyed.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("c"), col("v"))
    val r = keyed.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("c"), col("v"))
    l.join(r, Seq("c", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact n-gram Jaccard verification of the LSH candidates: join the
    * shingle sets only for candidate pairs, never all-pairs. */
  val ddNgramJaccard: Q = (s, d) => {
    val pairs = minhashPairs(s, d)
    val sh = shingleTable(s, d)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val queries: Map[String, Q] = Map(
    "dd_exact" -> ddExact,
    "dd_minhash_pairs" -> ddMinhashPairs,
    "dd_minhash_dedup" -> ddMinhashDedup,
    "dd_simhash" -> ddSimhash,
    "dd_ngram_jaccard" -> ddNgramJaccard)

  val oracles: Map[String, String] = Map(
    "dd_exact" -> ddExactSql)
}
