package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** sf≈1 invariants for the five dedup/similarity keys whose DuckDB
  * oracles are infeasible at 10× scale (all-pairs joins / full minhash
  * rebuilds in SQL take hours at 50k docs): dd_minhash_pairs,
  * dd_minhash_dedup, dd_minhash_cluster, dd_ngram_jaccard,
  * dd_embed_neardup. Structural invariants stand in for the oracle:
  * hash stability (re-run determinism), planted-clone recall (the
  * ScaleUp fixture embeds known near-identical variants and EXACT
  * embedding clones), recall against a brute-force-verified sample,
  * partition/consistency properties across operators, and
  * subset-of-candidates containment.
  *
  * SLOW SUITE — runs only with GRAFT_SF1=1 (builds /tmp/graft-sf1
  * from sf0.1 on first use, several minutes of compute):
  *
  *   GRAFT_SF1=1 sbt "testOnly graft.Sf1InvariantSpec"
  *
  * Without the flag every test reports as canceled, keeping `sbt
  * test` fast and green.
  */
class Sf1InvariantSpec extends AnyFunSuite {
  private val enabled = sys.env.contains("GRAFT_SF1")
  private def guard(): Unit =
    assume(enabled, "set GRAFT_SF1=1 to run the sf1 slow suite")

  private val S = graft.tools.ScaleUp.Shift
  private val Copies = 10

  private lazy val spark = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("graft-sf1")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.FastLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private lazy val sf1: String = {
    val dest = "/tmp/graft-sf1"
    if (!new java.io.File(s"$dest/embeddings.parquet").exists())
      graft.tools.ScaleUp.run(spark, "/root/testdata/sf0.1", dest, Copies)
    dest
  }

  test("minhash pairs: stable, clone-variant recall, sampled brute-force recall") {
    guard()
    val pairs = ops.Dedup.ddMinhashPairs(spark, sf1).cache()
    val n1 = pairs.count()
    assert(n1 > 0)
    // hash stability: an independent second plan reproduces the set
    assert(ops.Dedup.ddMinhashPairs(spark, sf1).count() === n1)

    // planted variants: each original doc's copies differ only by a
    // per-copy " #i" salt — near-identical texts, so (copy0, copy1)
    // pairs must be found for ≳90% of a sample (LSH is probabilistic,
    // but at J≈0.95+ a 16-band miss is vanishingly rare)
    val sample = Tables.documents(spark, sf1)
      .filter(col("doc_id") < S).select("doc_id")
      .orderBy("doc_id").limit(50).collect().map(_.getLong(0))
    val hits = pairs
      .filter(col("doc_b") === col("doc_a") + lit(S))
      .filter(col("doc_a").isInCollection(sample))
      .count()
    assert(hits >= 45, s"clone-variant recall: $hits of 50 sampled")

    // recall vs a brute-force-verified subset: ~120 original docs ×
    // 10 copies, ALL pairs jaccard-verified with the same kernel the
    // oracle family uses; LSH candidates must cover ≥90%
    val sh = ops.Dedup.docShingles(spark, sf1)
      .filter(pmod(col("doc_id"), lit(S)) < 120).cache()
    val truth = sh.select(col("doc_id").as("doc_a"), col("sh_arr").as("aa"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh_arr").as("bb")),
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.ArrayKernels.jaccardSim(col("aa"), col("bb")).as("j"))
      .filter(col("j") >= 0.5)
      .select("doc_a", "doc_b").cache()
    val nTruth = truth.count()
    assert(nTruth > 0, "the brute-force sample found no true pairs")
    val covered = truth.join(pairs, Seq("doc_a", "doc_b"), "left_semi").count()
    assert(covered >= (0.9 * nTruth).toLong,
      s"LSH recall $covered/$nTruth on the brute-forced sample")
  }

  test("minhash dedup and cluster are consistent with the pair graph") {
    guard()
    val pairs = ops.Dedup.ddMinhashPairs(spark, sf1).cache()
    val total = Tables.documents(spark, sf1).count()
    // dedup ≡ its definition, recomputed through an independent plan
    val dead = pairs.select(col("doc_b").as("doc_id")).distinct().count()
    assert(ops.Dedup.ddMinhashDedup(spark, sf1).count() === total - dead)
    // cluster output is a PARTITION of the corpus
    val cl = ops.Dedup.ddMinhashCluster(spark, sf1).cache()
    assert(cl.agg(sum("cluster_size")).collect()(0).getLong(0) === total)
    assert(cl.select("doc_id").distinct().count() === cl.count())
    // every candidate edge stays within one component
    val comp = ops.Dedup.connectedComponents(pairs).cache()
    val ca = comp.select(col("doc_id").as("doc_a"), col("cluster").as("ca"))
    val cb = comp.select(col("doc_id").as("doc_b"), col("cluster").as("cb"))
    assert(pairs.join(ca, Seq("doc_a")).join(cb, Seq("doc_b"))
      .filter(col("ca") =!= col("cb")).count() === 0,
      "a candidate edge crosses two clusters")
  }

  test("ngram jaccard: a verified subset of the LSH candidates") {
    guard()
    val jac = ops.Dedup.ddNgramJaccard(spark, sf1).cache()
    assert(jac.count() > 0)
    assert(jac.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0)
      .count() === 0)
    assert(jac.join(ops.Dedup.ddMinhashPairs(spark, sf1),
      Seq("doc_a", "doc_b"), "left_anti").count() === 0,
      "a verified pair was never an LSH candidate")
  }

  test("embed neardup: exact clones always found; LSH path ⊆ exact path") {
    guard()
    // ScaleUp replicates embeddings bit-identically with shifted ids:
    // every original vector has `Copies` exact clones, so ALL
    // 45 clone pairs per sampled id must surface with cos == 1
    val exact = ops.Similarity.ddEmbedNeardup(spark, sf1).cache()
    val ids = Tables.embeddings(spark, sf1)
      .filter(col("vec_id") < S).select("vec_id")
      .orderBy("vec_id").limit(25).collect().map(_.getLong(0))
    val wanted = for {
      v <- ids.toSeq; i <- 0 until Copies; j <- (i + 1) until Copies
    } yield (v + i * S, v + j * S)
    val spark0 = spark
    import spark0.implicits._
    val wantedDf = wanted.toDF("ia", "ib")
    val found = exact.join(wantedDf, Seq("ia", "ib"), "left_semi")
    assert(found.count() === wanted.size.toLong,
      s"missing exact-clone pairs: ${found.count()} of ${wanted.size}")
    assert(exact.join(wantedDf, Seq("ia", "ib"), "left_semi")
      .filter(col("cos") =!= 1.0).count() === 0)

    // force the LSH-bucketed scale path on the same corpus: clone
    // recall is GUARANTEED (identical vectors share every bucket) and
    // every emitted pair passes the same cosine verify, so the result
    // must be a subset of the exact path's
    val lsh = ops.Similarity.embedNeardupPairs(spark, sf1,
      maxExact = 1000L).cache()
    assert(lsh.join(wantedDf, Seq("ia", "ib"), "left_semi")
      .count() === wanted.size.toLong)
    assert(lsh.join(exact, Seq("ia", "ib"), "left_anti").count() === 0,
      "the LSH path emitted a pair the exact path did not")

    // the recall dial at scale: the wide preset (16x3) carries ~4x the
    // default's candidate mass — at 60k vectors the full join's
    // shuffle spill exceeds this box's disk, so the probe restricts
    // the PROBE side to copy-0 (buckets still computed over all 60k
    // vectors; exactly the "which pairs anchored here survive"
    // question, disk-bounded). Same restriction on the default for an
    // apples-to-apples recall ordering.
    val copy0 = Some(col("vec_id") < S)
    val lshBase0 = ops.Similarity.embedNeardupPairs(spark, sf1,
      maxExact = 1000L, restrictA = copy0).cache()
    spark.conf.set("graft.ann.lshPreset", "16x3")
    val lshWide0 =
      try ops.Similarity.embedNeardupPairs(spark, sf1,
        maxExact = 1000L, restrictA = copy0).cache()
      finally spark.conf.unset("graft.ann.lshPreset")
    // clone pairs anchored at copy-0 are guaranteed at every dial
    // position (identical vectors share every bucket)
    val wanted0Df = wanted.filter(_._1 < S).toDF("ia", "ib")
    val nWanted0 = wanted.count(_._1 < S).toLong
    assert(lshWide0.join(wanted0Df, Seq("ia", "ib"), "left_semi")
      .count() === nWanted0,
      "wide preset missed guaranteed clone pairs")
    assert(lshWide0.join(exact, Seq("ia", "ib"), "left_anti").count() === 0,
      "wide preset emitted a pair the exact path did not")
    assert(lshWide0.count() >= lshBase0.count(),
      "wide preset recalled fewer pairs than the default")
  }

  test("incremental minhash: verified matches only; planted cross-boundary clones found") {
    guard()
    val out = ops.Dedup.ddMinhashIncr(spark, sf1).cache()
    assert(out.count() > 0)
    // every reported match is Jaccard-verified by construction; spot
    // re-verify a sample with the same kernel on (new, dup_of)
    val sh = ops.Dedup.docShingles(spark, sf1)
    val sample = out.limit(200)
      .join(sh.select(col("doc_id").as("new_id"), col("sh_arr").as("an")),
        Seq("new_id"))
      .join(sh.select(col("doc_id").as("dup_of"), col("sh_arr").as("ao")),
        Seq("dup_of"))
      .select(graft.functions.ArrayKernels.jaccardSim(col("an"), col("ao"))
        .as("j"))
    assert(sample.filter(col("j") < 0.5).count() === 0,
      "a reported incremental match fails exact verification")
    // exact agreement with the batch pipeline: the same banding
    // drives dd_ngram_jaccard, so the incremental output must equal
    // the verified >=0.5 pairs that STRADDLE the old/new boundary,
    // grouped by their new-side doc
    val docs = Tables.documents(spark, sf1)
      .withColumn("grp", substring(col("source"), 4, 9).cast("int"))
      .select(col("doc_id"), col("grp"))
    val verified = ops.Dedup.ddNgramJaccard(spark, sf1)
      .join(docs.select(col("doc_id").as("doc_a"), col("grp").as("ga")),
        Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("grp").as("gb")),
        Seq("doc_b"))
    val cross = verified
      .select(
        when(col("ga") >= 10, col("doc_a")).otherwise(col("doc_b"))
          .as("new_id"),
        when(col("ga") >= 10, col("doc_b")).otherwise(col("doc_a"))
          .as("old_id"),
        col("ga"), col("gb"))
      .filter((col("ga") >= 10) =!= (col("gb") >= 10))
      .groupBy(col("new_id"))
      .agg(min(col("old_id")).as("dup_of"), count(lit(1)).as("n_matches"))
    val mism = out.select("new_id", "dup_of", "n_matches")
      .exceptAll(cross.select("new_id", "dup_of", "n_matches"))
      .unionAll(cross.select("new_id", "dup_of", "n_matches")
        .exceptAll(out.select("new_id", "dup_of", "n_matches")))
      .count()
    assert(mism === 0,
      "incremental minhash diverged from the boundary slice of the " +
        "batch-verified pair set")
  }
}
