package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 sf10 candidate-growth checkpoint (VERDICT r13 item 7):
  * grow the ScaleUp fixture one more decade FOR THE SUPERLINEAR
  * FAMILY ONLY (documents + embeddings ×100 from sf0.1) and confirm
  * that each key's cost tracks its candidate mass — i.e. the
  * superlinear growth is the answer getting bigger, not the plan
  * degrading — and that dd_embed_neardup's LSH tier (which only runs
  * above the 100k-vector gate, so sf1 never exercised it hot) holds
  * its recall at scale.
  *
  * Usage: runMain graft.tools.Sf10Probe <sf1Dir> <sf10Dir> <leg,...>
  * Legs: cand (minhash candidate counts + times), jaccard, contain,
  * phash, embed (LSH tier + recall vs the sf0.1 exact slice),
  * tfwrite (r15 write-heavy phase splits), protocol (r16: table-COUNT
  * decade through one REST server + one multi-table transaction —
  * per-phase splits proving commit cost is O(metadata) per table and
  * the server's CAS/rollback loop doesn't degrade with table count),
  * txrewrite (r16: transaction-staged rewrite at sf1 — distributed
  * re-bin paid once at staging, metadata-only commit, rival append
  * carried through the rebase). */
object Sf10Probe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sfscale/sf1")
    val sf10 = args.lift(1).getOrElse("/tmp/sfscale/sf10")
    val legs = args.lift(2).map(_.split(',').toSet)
      .getOrElse(Set("cand", "jaccard", "contain", "phash", "embed"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("sf10-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.hadoop.fs.file.impl", "graft.hadoop.FastLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def probe(leg: String, key: String, d: String,
        df: => org.apache.spark.sql.DataFrame): Unit = {
      val ((n, t), label) = (time(df.count()), s"$key@$d")
      println(f"[sf10probe] leg=$leg key=$key dir=$d rows=$n t=$t%.2f s")
    }

    Seq(sf1, sf10).foreach { d =>
      if (legs("cand"))
        probe("cand", "minhash_candidates", d,
          graft.ops.Dedup.minhashPairs(spark, d))
      if (legs("jaccard"))
        probe("jaccard", "dd_ngram_jaccard", d,
          graft.ops.Dedup.ddNgramJaccard(spark, d))
      if (legs("contain"))
        probe("contain", "dd_containment", d,
          graft.ops.Dedup.ddContainment(spark, d))
      if (legs("phash"))
        probe("phash", "mm_image_phash", d,
          graft.ops.Multimodal.queries("mm_image_phash")(spark, d))
    }

    if (legs("embed")) {
      // sf10 = 600k vectors > the 100k exact gate: the LSH-bucketed
      // tier runs (sf1's 60k stayed on the oracle-parity exact tier).
      // Recall check: copy 0 of the ×100 fixture IS the sf0.1 corpus
      // (ids unshifted), so the exact-tier pairs at sf0.1 must all
      // reappear in the LSH tier's output restricted to copy-0 ids.
      val S = ScaleUp.Shift
      val (expected, tExact) = time {
        graft.ops.Similarity.embedNeardupPairs(spark, "/root/testdata/sf0.1")
          .select(col("ia"), col("ib"), col("cos")).collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      }
      val (lshAll, tLsh) = time {
        graft.ops.Similarity.embedNeardupPairs(spark, sf10)
          .filter(col("ia") < S && col("ib") < S)
          .select(col("ia"), col("ib")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val hit = expected.keySet.intersect(lshAll).size
      println(f"[sf10probe] leg=embed expected=${expected.size} " +
        f"lsh_copy0=${lshAll.size} recall=${hit.toDouble / expected.size}%.4f " +
        f"t_exact_sf01=$tExact%.2f s t_lsh_sf10=$tLsh%.2f s")
      // stratified: LSH collision probability rises steeply with cos,
      // so recall in the true near-dup band is the number that matters
      Seq((0.45, 0.6), (0.6, 0.75), (0.75, 0.9), (0.9, 1.01)).foreach {
        case (lo, hi) =>
          val band = expected.filter { case (_, c) => c >= lo && c < hi }
          val bandHit = band.keySet.intersect(lshAll).size
          val r = if (band.isEmpty) 1.0 else bandHit.toDouble / band.size
          println(f"[sf10probe] leg=embed cos=[$lo,$hi) expected=${band.size} " +
            f"recall=$r%.4f")
      }
      // the strong band at scale: the ×100 fixture replicates every
      // vector unchanged, so each base id owes C(copies,2) cos=1.0
      // clone pairs (ia ≡ ib mod Shift) — identical vectors share all
      // bucket keys, so the LSH tier must find every one
      val n0 = spark.read
        .parquet("/root/testdata/sf0.1/embeddings.parquet").count()
      val copies = spark.read.parquet(s"$sf10/embeddings.parquet")
        .count() / n0
      val expectedClones = n0 * copies * (copies - 1) / 2
      val (foundClones, tClone) = time {
        graft.ops.Similarity.embedNeardupPairs(spark, sf10)
          .filter((col("ib") - col("ia")) % S === 0 && col("cos") >= 0.999)
          .count()
      }
      println(f"[sf10probe] leg=embed clone_pairs expected=$expectedClones " +
        f"found=$foundClones recall=${foundClones.toDouble / expectedClones}%.4f " +
        f"t=$tClone%.2f s")
    }

    if (legs("embedwide")) {
      // the 16x3 recall dial measured AT 600k vectors: probe side
      // restricted to copy-0 (disk-bounded — the wide preset carries
      // ~4x the default's candidate mass; buckets still computed over
      // the full corpus), recall against the sf0.1 exact-tier truth,
      // stratified by cosine band like the default-preset embed leg.
      val S = ScaleUp.Shift
      val (expected, tExact) = time {
        graft.ops.Similarity.embedNeardupPairs(spark, "/root/testdata/sf0.1")
          .select(col("ia"), col("ib"), col("cos")).collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      }
      spark.conf.set("graft.ann.lshPreset", "16x3")
      val (wide, tWide) = try time {
        graft.ops.Similarity.embedNeardupPairs(spark, sf10,
            restrictA = Some(col("vec_id") < S))
          .filter(col("ib") < S)
          .select(col("ia"), col("ib")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally spark.conf.unset("graft.ann.lshPreset")
      val hit = expected.keySet.intersect(wide).size
      println(f"[sf10probe] leg=embedwide preset=16x3 " +
        f"expected=${expected.size} recall=${hit.toDouble / expected.size}%.4f " +
        f"t_exact_sf01=$tExact%.2f s t_wide_sf10=$tWide%.2f s")
      Seq((0.45, 0.6), (0.6, 0.75), (0.75, 0.9), (0.9, 1.01)).foreach {
        case (lo, hi) =>
          val band = expected.filter { case (_, c) => c >= lo && c < hi }
          val bandHit = band.keySet.intersect(wide).size
          val r = if (band.isEmpty) 1.0 else bandHit.toDouble / band.size
          println(f"[sf10probe] leg=embedwide cos=[$lo,$hi) " +
            f"expected=${band.size} recall=$r%.4f")
      }
    }

    if (legs("contain0")) {
      // ×100 planted-pair SURVIVAL without the answer-quadratic
      // all-copies join (whose output alone is ~30M pairs and whose
      // shuffle spill exceeds this box's disk): the df counts and the
      // scale-relative band come from the FULL 600k-doc corpus —
      // exactly the inflation that used to push rare tokens out of
      // the absolute band — while candidate generation and verify are
      // restricted to copy-0 (the original sf0.1 documents). Planted
      // pairs survive iff the sf0.1 output reappears.
      val S = ScaleUp.Shift
      val (exp, tE) = time {
        graft.ops.Dedup.ddContainment(spark, "/root/testdata/sf0.1")
          .select(col("doc_a"), col("doc_b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val (got, tG) = time {
        graft.ops.Dedup.containmentPairs(spark, sf10,
            Some(col("doc_id") < S))
          .select(col("doc_a"), col("doc_b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val hit = exp.intersect(got).size
      println(f"[sf10probe] leg=contain0 planted=${exp.size} " +
        f"survived=$hit extra=${got.diff(exp).size} " +
        f"survival=${hit.toDouble / exp.size}%.4f " +
        f"t_sf01=$tE%.2f s t_sf10_copy0=$tG%.2f s")
    }

    if (legs("tfwrite")) {
      // round-15 write-heavy checkpoint: the slowest sf1 tf_ keys are
      // write-bound fixtures (tf_metadata_tables 13 s, tf_compaction
      // 9.6 s at sf1). One decade up, split each into its phases and
      // confirm the growth sits in the DATA write/rewrite (linear in
      // rows by design) while the commit machinery — footer stats,
      // manifest assembly, metadata-table walks — stays
      // metadata-scale.
      Seq(sf1, sf10).foreach { d =>
        val li = graft.Tables.lineitem(spark, d)
        val rows = li.count()
        // tf_metadata_tables shape: two coalesce(1) appends (the
        // oracle pins n_files=2, so each append is ONE task's parquet
        // write — single-thread data throughput, by contract)
        val r1 = java.nio.file.Files
          .createTempDirectory("sf10-tfmeta").toString
        val t1 = graft.table.GraftTable.create(spark, s"$r1/t", li.schema)
        val (_, tApp1) = time(
          t1.append(li.filter(col("l_linenumber") <= 3).coalesce(1)))
        val (_, tApp2) = time(
          t1.append(li.filter(col("l_linenumber") > 3).coalesce(1)))
        val (_, tWalk) = time {
          t1.filesDF.count(); t1.snapshotsDF.count(); t1.scan().count()
        }
        println(f"[sf10probe] leg=tfwrite key=tf_metadata_tables dir=$d " +
          f"rows=$rows append1=$tApp1%.2f s append2=$tApp2%.2f s " +
          f"metadata_walk=$tWalk%.2f s")
        // tf_compaction shape: 40-file append, then bin-pack rewrite
        val r2 = java.nio.file.Files
          .createTempDirectory("sf10-tfcomp").toString
        val t2 = graft.table.GraftTable.create(spark, s"$r2/t", li.schema)
        val (_, tApp) = time(t2.append(li.repartition(40)))
        val nBefore = t2.filesDF.count()
        val (_, tComp) = time(t2.compact(targetFileBytes = 512L * 1024 * 1024))
        val nAfter = t2.filesDF.count()
        println(f"[sf10probe] leg=tfwrite key=tf_compaction dir=$d " +
          f"rows=$rows append40=$tApp%.2f s compact=$tComp%.2f s " +
          f"files=$nBefore->$nAfter")
        Seq(r1, r2).foreach(r => org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(r)))
      }
    }

    if (legs("txrewrite")) {
      // round-16 staged-rewrite checkpoint: compaction as a
      // transaction op at DATA scale (sf1 lineitem, ~6M rows, 40
      // files) through a live REST server. Phases: stage (the
      // MoR-folded re-bin — data-bound, the dominant cost by design),
      // commit (ONE protocol POST — metadata-bound), and a rival
      // append landing between staging and commit (the rebase carries
      // it; only manifest assembly re-runs, no data rewrite).
      val wh = java.nio.file.Files
        .createTempDirectory("sf10-txrw").toString
      val server = new graft.table.iceberg.IcebergRestServer(wh).start()
      val cat = s"trw_${java.util.UUID.randomUUID().toString.take(4)}"
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.spark.GraftTableCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.uri",
        s"http://127.0.0.1:${server.port}")
      try {
        spark.sql(s"CREATE NAMESPACE $cat.db")
        val li = graft.Tables.lineitem(spark, sf1)
        li.repartition(40).createOrReplaceTempView("txrw_src")
        spark.sql(s"CREATE TABLE $cat.db.big (" +
          li.schema.fields.map(f =>
            s"${f.name} ${f.dataType.sql}").mkString(", ") + ")")
        val (_, tSeed) = time(
          spark.sql(s"INSERT INTO $cat.db.big SELECT /*+ REPARTITION(40) */ * FROM txrw_src"))
        val loc = s"$wh/db/big"
        def files(): Int =
          graft.table.iceberg.IcebergTable.load(spark, loc)
            .plannedFiles().size
        val nBefore = files()
        val rows = li.count()
        val tx = graft.table.iceberg.IcebergTransaction
          .forCatalog(spark, cat)
        val (_, tStage) = time(tx.rewrite("db", "big",
          lineage = Map("compaction.run" -> "sf10probe")))
        // rival append AFTER staging: the commit rebases and carries it
        val (_, tRival) = time(
          spark.sql(s"INSERT INTO $cat.db.big (l_orderkey) VALUES (-1)"))
        val (_, tCommit) = time(tx.commit(maxAttempts = 5))
        val nAfter = files()
        val total = spark.sql(s"SELECT count(*) FROM $cat.db.big")
          .collect().head.getLong(0)
        require(total == rows + 1,
          s"staged rewrite lost rows: $total vs ${rows + 1}")
        println(f"[sf10probe] leg=txrewrite rows=$rows files=$nBefore" +
          f"->$nAfter seed=$tSeed%.2f s stage=$tStage%.2f s " +
          f"rival=$tRival%.2f s commit=$tCommit%.2f s " +
          "(stage is data-bound by design; commit is metadata-bound " +
          "and absorbs the rival by manifest-only rebase)")
      } finally {
        spark.conf.unset(s"spark.sql.catalog.$cat")
        spark.conf.unset(s"spark.sql.catalog.$cat.uri")
        graft.table.iceberg.IcebergRestCommit.deregisterBase(
          s"http://127.0.0.1:${server.port}")
        server.stop()
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(wh))
      }
    }

    if (legs("protocol")) {
      // round-16 protocol checkpoint: the slowest remaining bench keys
      // are protocol FIXTURES (tf_txn_delta / tf_commit_txn /
      // tf_rest_sql — in-query REST server + transactions). Scale the
      // dimension those fixtures stress — TABLE COUNT through one
      // server and ONE multi-table transaction — a decade (4 -> 40
      // tables, identical per-table data), split into phases:
      // create (server DDL), stage (N distributed appends), commit
      // (ONE POST, server CAS loop over N tables), read (N loads), and
      // commit_rival (a rival moves the LAST table after staging, so
      // attempt 1 CAS-commits up to N-1 tables then compensating-rolls
      // them ALL back, rebases, and lands on attempt 2 — the worst
      // rollback shape). Flat per-table times across the decade =
      // commit cost O(metadata) per table, no CAS-loop degradation.
      Seq(4, 40).foreach { n =>
        val wh = java.nio.file.Files
          .createTempDirectory("sf10-proto").toString
        val server = new graft.table.iceberg.IcebergRestServer(wh).start()
        val cat = s"p${n}_${java.util.UUID.randomUUID().toString.take(4)}"
        spark.conf.set(s"spark.sql.catalog.$cat",
          "graft.spark.GraftTableCatalog")
        spark.conf.set(s"spark.sql.catalog.$cat.uri",
          s"http://127.0.0.1:${server.port}")
        try {
          spark.sql(s"CREATE NAMESPACE $cat.db")
          val (_, tCreate) = time((0 until n).foreach(i =>
            spark.sql(s"CREATE TABLE $cat.db.t$i (k BIGINT, v DOUBLE)")))
          val slice = graft.Tables.lineitem(spark, sf1)
            .select(col("l_orderkey").as("k"),
              col("l_extendedprice").as("v"))
            .limit(500).cache()
          slice.count()
          val tx = graft.table.iceberg.IcebergTransaction
            .forCatalog(spark, cat)
          val (_, tStage) = time(
            (0 until n).foreach(i => tx.append("db", s"t$i", slice)))
          val (_, tCommit) = time(tx.commit())
          val (_, tRead) = time((0 until n).foreach { i =>
            require(spark.table(s"$cat.db.t$i").count() == 500L,
              s"t$i read mismatch")
          })
          val tx2 = graft.table.iceberg.IcebergTransaction
            .forCatalog(spark, cat)
          (0 until n).foreach(i => tx2.append("db", s"t$i", slice))
          spark.sql(s"INSERT INTO $cat.db.t${n - 1} VALUES (1, 1.0)")
          val (_, tRival) = time(tx2.commit(maxAttempts = 3))
          require(spark.table(s"$cat.db.t0").count() == 1000L,
            "rival-rebased transaction must land everywhere")
          slice.unpersist()
          println(f"[sf10probe] leg=protocol tables=$n " +
            f"create=$tCreate%.2f s stage=$tStage%.2f s " +
            f"commit=$tCommit%.2f s commit_per_table=${tCommit / n}%.4f s " +
            f"read=$tRead%.2f s commit_rival=$tRival%.2f s " +
            f"rival_per_table=${tRival / n}%.4f s")
        } finally {
          spark.conf.unset(s"spark.sql.catalog.$cat")
          spark.conf.unset(s"spark.sql.catalog.$cat.uri")
          graft.table.iceberg.IcebergRestCommit.deregisterBase(
            s"http://127.0.0.1:${server.port}")
          server.stop()
          org.apache.commons.io.FileUtils
            .deleteDirectory(new java.io.File(wh))
        }
      }
    }
    spark.stop()
  }
}
