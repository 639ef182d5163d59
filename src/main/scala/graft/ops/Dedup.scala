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
      .otherwise(array(trim(lower(text)))) // trimmed, like the oracle
  }

  /** (doc_id, shingle-set array) — stays un-exploded; the kernels
    * consume whole arrays. Repartitioned first: the corpus arrives as
    * few large files, and per-row hashing is CPU-bound — `spread`
    * equalizes locally and is a no-op once input splits already
    * parallelize (no added shuffle at cluster scale). */
  private[graft] def docShingles(s: SparkSession, d: String): DataFrame =
    Tables.spread(s, Tables.documents(s, d))
      .select(col("doc_id"), array_distinct(shingles(col("text"))).as("sh_arr"))

  private val NumHashes = 64
  private val NumBands = 16

  /** Hard cap on the join tier's bucket size. A non-discriminative
    * bucket (empty/boilerplate texts sharing a band hash, or a corpus
    * where the dd_exact pre-pass wasn't run) costs O(B²) in the
    * self-join: past ~10^5 docs ONE bucket means >10^10 comparisons —
    * a hung job, not a slow one. Buckets past the cap are dropped
    * from pair generation, and the drop is OBSERVABLE, never silent:
    * an `observe` metric (dropped_buckets / dropped_docs) lands on
    * Spark's SQL metrics bus and logs at WARN on completion.
    * Tunable per session via `graft.dedup.maxBucketSize`. */
  private def bucketCap(s: SparkSession): Int =
    s.conf.getOption("graft.dedup.maxBucketSize").map(_.toInt)
      .getOrElse(100000)

  private val obsId = new java.util.concurrent.atomic.AtomicLong()
  private val dropLoggerOn = new java.util.concurrent.atomic.AtomicBoolean(false)
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Attach the drop meter to a bucketed frame and register the
    * one-time WARN logger for non-zero drops. */
  private def meterDrops(s: SparkSession, buckets: DataFrame,
      sizeCol: Column, cap: Int): DataFrame = {
    if (dropLoggerOn.compareAndSet(false, true))
      s.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith("dd_drops_") && !row.isNullAt(0) &&
                  row.getLong(0) > 0)
                log.warn(s"dedup bucket cap: dropped ${row.getLong(0)} " +
                  s"oversized LSH buckets (${row.getLong(1)} docs) past " +
                  "graft.dedup.maxBucketSize — recall degraded observably")
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    buckets.observe(s"dd_drops_${obsId.incrementAndGet()}",
      sum(when(sizeCol > cap, 1L).otherwise(0L)).as("dropped_buckets"),
      sum(when(sizeCol > cap, sizeCol.cast("long")).otherwise(0L))
        .as("dropped_docs"))
  }

  /** MinHash LSH keys: the codegen'd MinHashBands kernel computes all
    * 64 min-hashes and folds them into 16 band keys in one pass per
    * document — no explode, no 64-column aggregation, no shuffle. */
  private def bandedSignatures(s: SparkSession, d: String): DataFrame =
    bandedSignaturesFrom(docShingles(s, d))

  private def bandedSignaturesFrom(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"),
      posexplode(graft.functions.ArrayKernels
        .minhashBandKeys(col("sh_arr"), NumHashes, NumBands))
        .as(Seq("band", "bh")))

  /** LSH candidate pairs: docs agreeing on at least one full band.
    * One shuffle on the bucket key, then pairs generated within each
    * bucket. Size-routed like ddSimhash: small buckets pair in-memory
    * (collect_list explode); oversized buckets — mass-duplication
    * clusters, where the candidate count is genuinely quadratic
    * because the near-dup structure is — pair through a distributed
    * equi-self-join rather than being dropped. (A drop here silently
    * loses recall exactly in the web-crawl case LSH dedup exists for;
    * cost stays bounded by candidate count, never N².) */
  private[graft] def minhashPairs(s: SparkSession, d: String): DataFrame =
    minhashPairsFrom(s, bandedSignatures(s, d))

  /** The pair pipeline over a prepared signatures frame, so callers
    * that also need the SHINGLE ARRAYS themselves (dd_ngram_jaccard's
    * verify joins) can shingle once and share the frame. */
  private def minhashPairsFrom(s: SparkSession,
      signatures: DataFrame): DataFrame = {
    // ONE shuffle + hash agg over the signatures (the expensive
    // signature compute lives in the map stage, written once to the
    // shuffle files and reused by both routes below); routing happens
    // AFTER aggregation on the collected size. Small buckets pair
    // in-memory; oversized buckets — mass near-dup clusters, rare but
    // genuinely quadratic in the ANSWER — re-explode to rows and pair
    // through an equi-self-join instead of being dropped (the old
    // skew cap silently lost recall exactly in the web-crawl case).
    // The per-bucket array is bounded by the near-dup cluster size;
    // exact copies are removed by the dd_exact pre-pass in a real
    // pipeline, which keeps that bound to genuine VARIANT counts.
    val cap = bucketCap(s)
    val buckets = meterDrops(s, signatures
      .groupBy(col("band"), col("bh"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")) >= 2), size(col("ids")), cap)
    val small = buckets.filter(size(col("ids")) <= 64)
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
    val bigRows = buckets
      .filter(size(col("ids")) > 64 && size(col("ids")) <= cap)
      .select(col("band"), col("bh"), explode(col("ids")).as("doc_id"))
    val big = bigRows
      .select(col("band"), col("bh"), col("doc_id").as("doc_a"))
      .join(bigRows.select(col("band"), col("bh"), col("doc_id").as("doc_b")),
        Seq("band", "bh"))
      .select(col("doc_a"), col("doc_b"))
    small.select(col("doc_a"), col("doc_b")).unionAll(big)
      .filter(col("doc_a") < col("doc_b"))
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

  /** Connected components over the candidate-pair graph.
    *
    * Size-gated two-tier strategy (the same shape as the
    * dd_embed_neardup gate): LSH candidate graphs are SPARSE — edge
    * count is orders of magnitude below row count — so up to
    * `localThreshold` edges (default 1M ≈ 16 MB) the edge list is
    * collected once and resolved EXACTLY by union-find on the driver:
    * one pass, no iterative shuffle rounds, always converged. Above
    * the gate, iterative min-label propagation runs distributed: each
    * round every node adopts the smallest label in its neighborhood
    * (one shuffle per round, cached between rounds); converges in
    * O(diameter) rounds — near-dup clusters are shallow, so few.
    *
    * Scale hardening (distributed tier): every 5th round the label
    * frame is `localCheckpoint`ed, truncating the otherwise linearly
    * growing plan lineage (at 100 TB a deep chain would re-plan an
    * iter-deep DAG each round). Non-convergence at `maxIter` is never
    * silent: it logs a warning and, with `requireConvergence`, throws
    * — split clusters must not masquerade as exact components. */
  /** Exact union-find over a collected edge list; roots are kept at
    * the component minimum, so the emitted `cluster` label equals the
    * smallest member id — identical to what min-label propagation
    * converges to. Id type is carried through generically (Long or
    * String doc ids both order naturally). */
  private def localUnionFind(spark: org.apache.spark.sql.SparkSession,
      edgeRows: Array[org.apache.spark.sql.Row],
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    def lt(a: Any, b: Any): Boolean = a match {
      case c: java.lang.Comparable[_] =>
        c.asInstanceOf[java.lang.Comparable[Any]].compareTo(b) < 0
      case _ => a.toString < b.toString
    }
    edgeRows.foreach { r =>
      val (a, b) = (r.get(0), r.get(1))
      parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
    parent.keySet().forEach(id =>
      out.add(org.apache.spark.sql.Row(id, find(id))))
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc_id", idType), StructField("cluster", idType))))
  }

  private[graft] def connectedComponents(pairs: DataFrame, maxIter: Int = 10,
      requireConvergence: Boolean = false,
      localThreshold: Long = 1000000L): DataFrame = {
    val deduped = pairs.select(col("doc_a"), col("doc_b")).cache()
    val nEdges = deduped.count()
    if (nEdges <= localThreshold) {
      val rows = deduped.collect()
      deduped.unpersist()
      return localUnionFind(pairs.sparkSession, rows,
        pairs.schema("doc_a").dataType)
    }
    val edges = deduped.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(deduped.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id2"))
        .agg(min(col("label")).as("nlabel"))
      val joined = labels
        .join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      val updated =
        if ((i + 1) % 5 == 0) joined.localCheckpoint() else joined.cache()
      val changed = updated.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    deduped.unpersist()
    if (!converged) {
      val msg = s"connectedComponents did not converge within $maxIter iterations; " +
        "labels may name split clusters (raise maxIter for deep chains)"
      if (requireConvergence) throw new IllegalStateException(msg)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster"))
  }

  /** MinHash dedup with exact clusters: keep the minimum doc_id of
    * every connected component (rows-only; cluster correctness
    * asserted on a synthetic chain graph in PipelineSpec). */
  val ddMinhashCluster: Q = (s, d) => {
    val comp = connectedComponents(minhashPairs(s, d))
    val survivorsInClusters = comp.groupBy(col("cluster"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("cluster_size"))
    Tables.documents(s, d)
      .join(comp.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(1L).as("cluster_size"))
      .unionByName(survivorsInClusters.select(col("doc_id"), col("cluster_size")))
      .orderBy(col("doc_id"))
  }

  /** Quality-aware representative selection: within each near-dup
    * cluster keep the BEST document — longest text, ties to the
    * smallest id — instead of the smallest id. This is the policy
    * refinement real pipelines run (drop the truncated mirror, keep
    * the full article): same cluster machinery as dd_minhash_cluster,
    * then one argmax per cluster via max_by over a (n_chars, -id)
    * struct — no window shuffle, partial-aggregated like any agg.
    * Ties are deterministic on both sides (the oracle's row_number
    * orders n_chars DESC, doc_id ASC — exactly the struct ordering). */
  val ddMinhashKeepbest: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val comp = connectedComponents(minhashPairs(s, d))
    val best = comp
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy(col("cluster"))
      .agg(
        max_by(col("doc_id"),
          struct(col("n_chars"), (-col("doc_id")).as("neg"))).as("keep_id"),
        count(lit(1)).as("cluster_size"),
        max(col("n_chars")).as("keep_chars"))
    docs.join(comp.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("keep_id"), lit(1L).as("cluster_size"),
        col("n_chars").as("keep_chars"))
      .unionByName(best.select(col("keep_id"), col("cluster_size"),
        col("keep_chars")))
      .orderBy(col("keep_id"))
  }

  /** SimHash near-dups: 64-bit fingerprints via the codegen'd SimHash64
    * expression, candidate generation by 16-bit chunk agreement
    * (pigeonhole: hamming <= 3 over 4 chunks guarantees a shared
    * chunk), exact hamming filter after the equi-join. */
  val ddSimhash: Q = (s, d) => {
    val fp = Tables.spread(s, Tables.documents(s, d))
      .select(col("doc_id"), TextHash.simhash(col("text")).as("sh"))
    val keyed = fp.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("c"),
          shiftrightunsigned(col("sh"), c * 16).bitwiseAND(lit(0xffffL)).as("v"))
      }: _*)).as("x"))
      .select(col("doc_id"), col("sh"), col("x.c").as("c"), col("x.v").as("v"))
    // bucket-grouped pair generation, size-routed: hamming<=3 implies
    // >=1 of the 4 chunks collides (pigeonhole), so chunk bucketing is
    // LOSSLESS — and pair generation must not silently change that.
    // Small buckets pair in-memory (collect_list explode, one shuffle);
    // oversized buckets — mass near-dup clusters, where the pair count
    // is genuinely quadratic because the ANSWER is — pair through a
    // distributed equi-self-join instead of being dropped (the old
    // skew cap traded recall for memory; the join path needs neither)
    val cap = bucketCap(s)
    val buckets = meterDrops(s, keyed.groupBy(col("c"), col("v"))
      .agg(collect_list(struct(col("doc_id"), col("sh"))).as("ds"))
      .filter(size(col("ds")) >= 2), size(col("ds")), cap)
    val small = buckets.filter(size(col("ds")) <= 64)
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
    val bigSide = buckets
      .filter(size(col("ds")) > 64 && size(col("ds")) <= cap)
      .select(col("c"), col("v"), explode(col("ds")).as("x"))
      .select(col("c"), col("v"),
        col("x.doc_id").as("doc_id"), col("x.sh").as("sh"))
    val big = bigSide
      .select(col("c"), col("v"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .join(bigSide.select(col("c"), col("v"),
        col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("c", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
    small.unionAll(big)
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact n-gram Jaccard verification of the LSH candidates: join the
    * candidates back to the (broadcastable) per-doc shingle arrays and
    * run the set kernel per pair — never all-pairs, no explode. */
  val ddNgramJaccard: Q = (s, d) => {
    // shingle ONCE and share the arrays across the signature pass and
    // both verify joins (the dd_containment / dd_minhash_incr build-
    // side pattern): the regex shingling is the key's dominant map cost
    val sh = docShingles(s, d).localCheckpoint()
    val pairs = minhashPairsFrom(s, bandedSignaturesFrom(sh))
    // no broadcast hint: the shingle side is corpus-sized — AQE picks
    // broadcast at small SF, shuffle join at scale
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh_arr").as("arr_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh_arr").as("arr_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.ArrayKernels.jaccardSim(col("arr_a"), col("arr_b")).as("j_raw"))
      .filter(col("j_raw") >= 0.5) // threshold the RAW ratio (like the oracle)
      .select(col("doc_a"), col("doc_b"), round(col("j_raw"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** URL canonicalization + dedup — the web-crawl half of exact dedup.
    * Four deterministic raw-URL variants per canonical page (scheme /
    * host case noise, `www.`, default `:443`/`:80` port, tail `utm_*`
    * params, `#fragment`, trailing slash) are canonicalized with
    * narrow string expressions, then hash-grouped with a keep-min-doc
    * policy. Canonicalize-then-groupBy is ONE shuffle on the canonical
    * key — the shape that holds at crawl scale; the oracle replays
    * every normalization step bit-for-bit. */
  val ddUrlDedup: Q = (s, d) => {
    val g = floor(col("doc_id") / 4).cast("long")
    val v = col("doc_id") % 4
    val gs = g.cast("string")
    val site = (g % 50).cast("string")
    val raw =
      when(v === 0, concat(lit("https://site"), site,
        lit(".example.com/page/"), gs))
      .when(v === 1, concat(lit("HTTP://WWW.SITE"), site,
        lit(".EXAMPLE.com/page/"), gs, lit("/")))
      .when(v === 2, concat(lit("https://site"), site,
        lit(".example.com:443/page/"), gs,
        lit("?utm_source=x&utm_campaign=y")))
      .otherwise(concat(lit("http://site"), site,
        lit(".example.com/page/"), gs, lit("#sec-1")))
    // strip fragment -> strip tail utm params -> strip scheme
    val rest = regexp_replace(regexp_replace(regexp_replace(raw,
      "#.*", ""), "[?&]utm_[^&#]*", ""), "^[A-Za-z]+://", "")
    val host = regexp_replace(regexp_replace(
      lower(regexp_extract(rest, "^[^/]+", 0)),
      "^www\\.", ""), ":(443|80)$", "")
    val path = regexp_replace(regexp_replace(rest, "^[^/]+", ""), "/+$", "")
    Tables.documents(s, d)
      .select(col("doc_id"), concat(host, path).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("keep_doc"))
      .orderBy(col("canon_url"))
  }

  val ddUrlDedupSql: String =
    """WITH gen AS (
      SELECT doc_id, doc_id // 4 AS g, doc_id % 4 AS v FROM documents),
    raw AS (
      SELECT doc_id, CASE v
        WHEN 0 THEN 'https://site' || (g % 50) || '.example.com/page/' || g
        WHEN 1 THEN 'HTTP://WWW.SITE' || (g % 50) || '.EXAMPLE.com/page/' || g || '/'
        WHEN 2 THEN 'https://site' || (g % 50) || '.example.com:443/page/' || g || '?utm_source=x&utm_campaign=y'
        ELSE 'http://site' || (g % 50) || '.example.com/page/' || g || '#sec-1'
      END AS u FROM gen),
    stripped AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(u,
          '#.*', ''), '[?&]utm_[^&#]*', '', 'g'), '^[A-Za-z]+://', '') AS rest
      FROM raw),
    parts AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(lower(regexp_extract(rest, '^[^/]+')),
          '^www\.', ''), ':(443|80)$', '') AS host,
        regexp_replace(regexp_replace(rest, '^[^/]+', ''), '/+$', '') AS path
      FROM stripped)
    SELECT host || path AS canon_url, count(*) AS n_variants,
      min(doc_id) AS keep_doc
    FROM parts GROUP BY 1 ORDER BY canon_url"""

  // ---- exact substring-window dedup ----------------------------------

  private val SubW = 64 // window length (chars)
  private val SubS = 32 // stride

  /** Exact substring dedup — the "same 64-char span appears in more
    * than one document" check (the distributed analog of suffix-array
    * substring dedup on training corpora; overlapping stride-32
    * windows guarantee any shared run of >= 96 chars shares at least
    * one aligned window). Per doc: windows at stride S, de-duplicated
    * per doc, grouped corpus-wide; a window held by >= 2 distinct docs
    * is a duplicated span. Output: per affected doc, how many of its
    * windows are duplicated elsewhere and whether a keep-first policy
    * would drop it (some shared window's first holder is an earlier
    * doc).
    *
    * Scale: one shuffle on the window key. Windows are 64 bytes; at
    * crawl scale you'd map each window through the 8-byte rolling
    * hash (TextHash) before the shuffle and carry hash keys — the
    * grouping shape is identical, so the string-keyed form is the
    * oracle-checkable contract. Per-doc window count is len/S (a few
    * hundred for web docs), so the exploded frame is ~2x the corpus
    * in bytes, partitioned evenly by the hash shuffle. */
  val ddSubstring: Q = (s, d) => {
    val wins = Tables.spread(s, Tables.documents(s, d))
      .filter(length(col("text")) >= SubW)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0),
            ((length(col("text")) - SubW) / SubS).cast("int")),
          i => col("text").substr(i * SubS + 1, lit(SubW))))).as("w"))
    val shared = wins.groupBy(col("w"))
      .agg(count_distinct(col("doc_id")).as("nd"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("nd") >= 2)
      .select(col("w"), col("first_doc"))
    wins.join(shared, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"),
        max(when(col("first_doc") < col("doc_id"), 1).otherwise(0))
          .as("drop_first_policy"))
      .orderBy(col("doc_id"))
  }

  /** Bit-exact replica: same windows (list_transform + substr), same
    * per-doc distinct, same >=2-distinct-docs shared set. */
  val ddSubstringSql: String =
    """WITH docs AS (
        SELECT doc_id, text FROM documents WHERE len(text) >= 64),
      wins AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(0, ((len(text) - 64) // 32) + 1),
          i -> substr(text, (i*32 + 1)::INT, 64)))) AS w
        FROM docs),
      shared AS (
        SELECT w, min(doc_id) AS first_doc
        FROM wins GROUP BY w HAVING count(DISTINCT doc_id) >= 2)
      SELECT doc_id, count(*) AS n_dup_windows,
        max(CASE WHEN first_doc < doc_id THEN 1 ELSE 0 END) AS drop_first_policy
      FROM wins JOIN shared USING (w)
      GROUP BY doc_id ORDER BY doc_id"""

  /** Overlap-coefficient (containment) set-similarity join — the
    * asymmetric dedup Jaccard misses: a short document wholly embedded
    * in a longer one (quoted article, excerpt page) has low Jaccard
    * but overlap |A∩B| / min(|A|,|B|) near 1. Candidate generation is
    * rare-token prefix filtering (the PPJoin-family technique): only
    * pairs sharing a shingle with document frequency in [2, 10] are
    * compared — Σ df² over rare shingles bounds the join, and common
    * boilerplate shingles can never explode it. The candidate rule is
    * part of the operator's CONTRACT (the oracle replays it exactly),
    * which is how production set-similarity joins are actually
    * specified. One shuffle on the shingle key, one on the pair. */
  val ddContainment: Q = (s, d) => containmentPairs(s, d, None)

  /** The containment join with an optional doc restriction applied to
    * BOTH candidate sides AFTER the corpus-wide df/band computation —
    * the scale-probe shape ("do the original docs' planted pairs stay
    * candidates under the full corpus's df inflation") without the
    * answer-quadratic all-copies join. `restrict = None` is the
    * operator itself. */
  private[graft] def containmentPairs(s: SparkSession, d: String,
      restrict: Option[org.apache.spark.sql.Column]): DataFrame = {
    // Every shingle maps through the 60-bit md5-prefix hash ONCE, up
    // front — the inverted index, df counts, candidate join AND the
    // verify arrays all carry 8-byte keys instead of 25-byte strings
    // (the verify join ships an array per candidate pair, so element
    // width is the dominant wire cost); the hash is part of the
    // contract and the oracle replays it. The frame feeds four plan
    // branches (both candidate-join sides, both verify joins), so
    // localCheckpoint materializes the corpus-wide regex + hash work
    // once — the cached build side every set-similarity join engine
    // keeps.
    val sh = docShingles(s, d)
      .select(col("doc_id"), array_sort(array_distinct(
        transform(col("sh_arr"), w =>
          conv(substring(md5(w), 1, 15), 16, 10).cast("long")))).as("ha"))
      .localCheckpoint()
    val ex = sh.select(col("doc_id"), explode(col("ha")).as("h"))
    // the candidate band scales with corpus size: df ∈ [2, max(10,
    // N/divisor)]. An ABSOLUTE upper cap shrinks output under mass
    // replication (the sf10 finding: tokens rare at N become df>10 at
    // 100N and planted containment pairs stop being candidates). The
    // default divisor 500 is sized for the WORST growth case —
    // verbatim ×k replication multiplies every df by k, so survival
    // needs cap(N·k) ≥ k·df₀, i.e. divisor ≤ N₀/df₀; 500 keeps every
    // pair-generating token with df₀ ≤ N₀/500 in band at ANY
    // replication factor, while Σ df² over the band still bounds the
    // join and corpus-wide boilerplate (df ~ N) stays excluded. The
    // band stays part of the operator CONTRACT at ANY dial setting —
    // the oracle replays the session's divisor (containmentBandOf).
    val divisor = containmentBandOf(s)
    val hiDf = sh.agg(greatest(lit(10L),
      floor(count(lit(1)) / divisor.toDouble).cast("long")).as("hi_df"))
    val rare = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .crossJoin(broadcast(hiDf))
      .filter(col("df") <= col("hi_df"))
      .select(col("h"))
    val keyed0 = ex.join(rare, Seq("h"))
    val keyed = restrict.fold(keyed0)(p => keyed0.filter(p))
    val cands = keyed.select(col("h"), col("doc_id").as("doc_a"))
      .join(keyed.select(col("h"), col("doc_id").as("doc_b")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("ha").as("arr_a")),
        Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("ha").as("arr_b")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        graft.functions.ArrayKernels
          .sortedOverlapCol(col("arr_a"), col("arr_b")).as("ov_raw"))
      .filter(col("ov_raw") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("ov_raw"), 4).as("overlap"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The containment candidate band's scale divisor — the session
    * dial `graft.dedup.containmentBand` (default 500; band =
    * df ∈ [2, max(10, N/divisor)]). Smaller divisor = wider band
    * (more candidates, more recall against high-df corpora, more join
    * cost); larger divisor tightens toward the absolute floor of 10.
    * Unknown values refuse loudly, exactly like graft.ann.lshPreset.
    * The oracle replays the SESSION's divisor (ddContainmentSql is
    * rebuilt per access), so the dial is part of the operator
    * contract at any setting. */
  private[graft] def containmentBandOf(s: SparkSession): Int = {
    val raw = s.conf.get("graft.dedup.containmentBand", "500")
    val v = scala.util.Try(raw.trim.toInt).getOrElse(
      throw new IllegalArgumentException(
        "graft.dedup.containmentBand must be a positive integer " +
          s"divisor (default 500), got '$raw'"))
    require(v >= 1,
      s"graft.dedup.containmentBand must be >= 1, got $v")
    v
  }

  /** Exact replica: same shingles, same scale-relative
    * [2, max(10, N/divisor)]-df rare-token candidate rule (the
    * SESSION's graft.dedup.containmentBand divisor inlined — default
    * 500 when no session is active), same overlap coefficient and
    * threshold. */
  def ddContainmentSql: String = {
    val divisor = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(containmentBandOf).getOrElse(500)
    // plain literal + token substitution: an s-interpolated
    // triple-quote would re-process the regex escapes in the SQL
    """WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(ws) >= 3
            THEN list_distinct(list_transform(range(1, len(ws)-1),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
            ELSE [trim(lower(text))] END AS sh_arr
        FROM (SELECT doc_id, text,
          regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents)),
      shh AS (SELECT doc_id, list_sort(list_distinct(list_transform(sh_arr,
          w -> ('0x' || substr(md5(w), 1, 15))::BIGINT))) AS ha
        FROM sh),
      ex AS (SELECT doc_id, unnest(ha) AS h FROM shh),
      rare AS (SELECT h FROM ex GROUP BY h
        HAVING count(*) >= 2 AND count(*) <= greatest(10,
          CAST(floor((SELECT count(*) FROM shh) / __BAND__.0) AS BIGINT))),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM ex a JOIN rare r ON r.h = a.h
        JOIN ex b ON b.h = a.h AND a.doc_id < b.doc_id),
      scored AS (
        SELECT c.doc_a, c.doc_b,
          len(list_intersect(sa.ha, sb.ha))::DOUBLE
            / least(len(sa.ha), len(sb.ha)) AS ov
        FROM cand c
        JOIN shh sa ON sa.doc_id = c.doc_a
        JOIN shh sb ON sb.doc_id = c.doc_b)
      SELECT doc_a, doc_b, round(ov, 4) AS overlap
      FROM scored WHERE ov >= 0.8 ORDER BY doc_a, doc_b"""
      .replace("__BAND__", divisor.toString)
  }

  private val ParaW = 12 // words per paragraph unit

  /** Duplicate-paragraph REMOVAL — the Dolma/CCNet rewrite pass that
    * complements whole-document dedup: boilerplate paragraphs repeated
    * across the corpus (nav bars, license blocks, quoted headers) are
    * dropped from every document except the first one holding them,
    * and the document survives with its unique content. Paragraph
    * units here are fixed 12-word segments (the corpus has no newline
    * structure; a crawl pipeline splits on '\n\n' — the dedup shape is
    * identical). An instance (doc, pos) is kept iff it is the
    * lexicographically-first instance of its paragraph text corpus-wide
    * (earlier doc, or same doc earlier position). Output per doc:
    * paragraph counts and the md5 of the rewritten text, so the gate
    * checks the actual REWRITE, not just the verdicts.
    *
    * Scale: explode to ~1x corpus bytes, ONE shuffle on the paragraph
    * key for the global keep-first argmin (partial-aggregated min
    * struct), one groupBy(doc) to reassemble — no windows, no N².
    * At crawl scale the paragraph text maps through a 128-bit hash
    * before the shuffle (the dd_substring note applies verbatim). */
  val ddParagraph: Q = (s, d) => {
    val ws = split(trim(lower(col("text"))), "\\s+")
    val paras = Tables.spread(s, Tables.documents(s, d))
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), ((size(col("ws")) - 1) / ParaW).cast("int")),
          j => concat_ws(" ", slice(col("ws"), j * ParaW + 1, lit(ParaW)))))
          .as(Seq("pos", "para")))
    val first = paras.groupBy(col("para"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    paras.join(first, Seq("para"))
      .select(col("doc_id"), col("pos"), col("para"),
        (col("first.doc_id") === col("doc_id") &&
          col("first.pos") === col("pos")).as("keep"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        count(when(col("keep"), 1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("pos"), col("para"))))),
            p => p.getField("para"))).cast("binary")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** Bit-exact replica: same 12-word segments, keep-first by
    * (doc_id, pos) rank, same space-joined rewrite md5 (empty string
    * when every paragraph was a duplicate). */
  val ddParagraphSql: String =
    """WITH docs AS (
        SELECT doc_id,
          regexp_split_to_array(trim(lower(text)), '\s+') AS ws
        FROM documents),
      paras AS (
        SELECT doc_id, j AS pos,
          array_to_string(ws[j*12+1 : j*12+12], ' ') AS para
        FROM docs, unnest(range(0, ((len(ws)-1) // 12) + 1)) t(j)),
      marked AS (
        SELECT doc_id, pos, para,
          row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) = 1 AS keep
        FROM paras)
      SELECT doc_id, count(*) AS n_paras,
        count(*) FILTER (WHERE keep) AS n_kept,
        md5(coalesce(
          string_agg(para, ' ' ORDER BY pos) FILTER (WHERE keep), '')) AS clean_md5
      FROM marked GROUP BY doc_id ORDER BY doc_id"""

  /** Incremental Bloom-filter dedup — the approximate-membership
    * primitive an INGESTION pipeline needs: flag new documents that
    * share a 64-char window with the EXISTING corpus without ever
    * joining the corpus itself. The historical side collapses to a
    * Bloom filter over its window hashes (here the bit set is the
    * bounded distinct-position table, broadcast to the probes; a
    * production build packs the same positions into Long bitmaps —
    * identical semantics, fewer bytes); at 100 TB the new day's docs
    * probe a megabyte-scale filter instead of shuffling against
    * history. Positions are the CMS universal-hash family over a
    * 60-bit md5 prefix, so the whole filter is deterministic and the
    * oracle rebuilds it bit-for-bit; the `true_hit` column (exact
    * window sharing) is emitted alongside so false positives are
    * visible, and Bloom's one-sided guarantee (bloom_hit >= true_hit)
    * is oracle-checked per doc. */
  private val BloomP = 2147483647L
  private val BloomM = 16777216L
  private val BloomAb = Seq((1103515245L, 12345L), (214013L, 2531011L),
    (48271L, 0L), (16807L, 12820163L))

  /** Distinct 64-char stride-32 windows per doc (the dd_substring
    * window family). */
  private[graft] def bloomWins(df: DataFrame): DataFrame = df
    .filter(length(col("text")) >= SubW)
    .select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(0),
          ((length(col("text")) - SubW) / SubS).cast("int")),
        i => col("text").substr(i * SubS + 1, lit(SubW))))).as("w"))

  private def bloomPositions(df: DataFrame): DataFrame = {
    val h31 = conv(substring(md5(col("w")), 1, 15), 16, 10)
      .cast("long") % lit(BloomP)
    df.select(col("doc_id") +: col("w") +:
      BloomAb.zipWithIndex.map { case ((a, b), i) =>
        (((lit(a) * h31 + lit(b)) % lit(BloomP)) % lit(BloomM)).as(s"p$i")
      }: _*)
  }

  /** The history side collapsed to its set Bloom positions. */
  private[graft] def bloomBits(oldDocs: DataFrame): DataFrame =
    bloomPositions(bloomWins(oldDocs))
      .select(explode(array((0 until 4).map(i => col(s"p$i")): _*)).as("pos"))
      .distinct()

  /** Docs (from `newDocs`) the broadcast filter flags: some window has
    * all four positions set. This is the per-arrival probe an
    * ingestion stream runs — `bits` stays fixed while batches flow. */
  private[graft] def bloomProbe(newDocs: DataFrame,
      bits: DataFrame): DataFrame =
    bloomPositions(bloomWins(newDocs))
      .select(col("doc_id"), col("w"),
        posexplode(array((0 until 4).map(i => col(s"p$i")): _*)))
      .toDF("doc_id", "w", "i", "pos")
      .join(broadcast(bits), Seq("pos"))
      .groupBy(col("doc_id"), col("w"))
      .agg(countDistinct(col("i")).as("nhit"))
      .filter(col("nhit") === 4)
      .select(col("doc_id")).distinct()
      .withColumn("bloom_hit", lit(1))

  val ddBloomIncr: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("grp", substring(col("source"), 4, 9).cast("int"))
    val oldDocs = docs.filter(col("grp") < 10)
    val newWins = bloomWins(docs.filter(col("grp") >= 10))
    val oldWins = bloomWins(oldDocs)
    val bits = bloomBits(oldDocs)
    val bloomDocs = bloomProbe(docs.filter(col("grp") >= 10), bits)
    val trueDocs = newWins
      .join(oldWins.select(col("w")).distinct(), Seq("w"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("true_hit", lit(1))
    newWins.select(col("doc_id")).distinct()
      .join(bloomDocs, Seq("doc_id"), "left")
      .join(trueDocs, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("bloom_hit"), lit(0)).as("bloom_hit"),
        coalesce(col("true_hit"), lit(0)).as("true_hit"))
      .orderBy(col("doc_id"))
  }

  /** Bit-exact replica: same windows, same md5-prefix hash, same four
    * affine position maps, membership = all four positions set. */
  val ddBloomIncrSql: String =
    """WITH docs AS (
      SELECT doc_id, substr(source, 4)::INT AS grp, text
      FROM documents WHERE len(text) >= 64),
    wins AS (
      SELECT doc_id, grp, unnest(list_distinct(list_transform(
        range(0, ((len(text) - 64) // 32) + 1),
        i -> substr(text, (i*32 + 1)::INT, 64)))) AS w
      FROM docs),
    hashed AS (
      SELECT doc_id, grp, w,
        (('0x' || substr(md5(w), 1, 15))::BIGINT % 2147483647) AS h31
      FROM wins),
    pos AS (
      SELECT doc_id, grp, w, t.i,
        ((t.a * h31 + t.b) % 2147483647) % 16777216 AS pos
      FROM hashed CROSS JOIN (VALUES
        (0, 1103515245, 12345), (1, 214013, 2531011),
        (2, 48271, 0), (3, 16807, 12820163)) t(i, a, b)),
    bits AS (SELECT DISTINCT pos FROM pos WHERE grp < 10),
    bloom AS (
      SELECT doc_id FROM (
        SELECT p.doc_id, p.w, count(DISTINCT p.i) AS nhit
        FROM pos p JOIN bits USING (pos)
        WHERE p.grp >= 10
        GROUP BY p.doc_id, p.w) x
      WHERE nhit = 4 GROUP BY doc_id),
    truth AS (
      SELECT DISTINCT n.doc_id
      FROM wins n
      WHERE n.grp >= 10 AND n.w IN (SELECT w FROM wins WHERE grp < 10))
    SELECT d.doc_id,
      CASE WHEN b.doc_id IS NULL THEN 0 ELSE 1 END AS bloom_hit,
      CASE WHEN t.doc_id IS NULL THEN 0 ELSE 1 END AS true_hit
    FROM (SELECT DISTINCT doc_id FROM wins WHERE grp >= 10) d
    LEFT JOIN bloom b USING (doc_id)
    LEFT JOIN truth t USING (doc_id)
    ORDER BY doc_id"""

  /** Incremental MinHash-LSH dedup — the NEAR-dup complement to
    * dd_bloom_incr's exact-window ingestion check: the existing
    * corpus's band signatures form a precomputed LSH INDEX (at 100 TB
    * it lives as a table, built once and appended to); each arriving
    * batch computes its own signatures, equi-joins the index on
    * (band, hash) — the shuffle carries only the NEW docs' bands —
    * and exact-Jaccard-verifies the candidates. Output per new doc:
    * its earliest near-duplicate in the corpus, how many corpus docs
    * match, and the best similarity. The oracle recomputes TRUE
    * word-3-gram Jaccard between every new/old pair exhaustively, so
    * LSH recall across the index boundary is itself gated (the
    * dd_minhash_pairs argument: at gate scale candidates == true
    * pairs). */
  val ddMinhashIncr: Q = (s, d) => {
    // shingle once, share across the four plan branches (index side,
    // probe side, both verify joins) — the dd_containment pattern
    val sh = Tables.spread(s, Tables.documents(s, d))
      .withColumn("grp", substring(col("source"), 4, 9).cast("int"))
      .select(col("doc_id"), col("grp"),
        array_distinct(shingles(col("text"))).as("sh_arr"))
      .localCheckpoint()
    def bands(df: DataFrame) = df.select(col("doc_id"),
      posexplode(graft.functions.ArrayKernels
        .minhashBandKeys(col("sh_arr"), NumHashes, NumBands))
        .as(Seq("band", "bh")))
    val oldSh = sh.filter(col("grp") < 10)
    val newSh = sh.filter(col("grp") >= 10)
    val index = bands(oldSh)
      .select(col("band"), col("bh"), col("doc_id").as("old_id"))
    val cands = bands(newSh)
      .select(col("band"), col("bh"), col("doc_id").as("new_id"))
      .join(index, Seq("band", "bh"))
      .select(col("new_id"), col("old_id")).distinct()
    cands
      .join(newSh.select(col("doc_id").as("new_id"),
        col("sh_arr").as("arr_n")), Seq("new_id"))
      .join(oldSh.select(col("doc_id").as("old_id"),
        col("sh_arr").as("arr_o")), Seq("old_id"))
      .select(col("new_id"), col("old_id"),
        graft.functions.ArrayKernels.jaccardSim(col("arr_n"), col("arr_o"))
          .as("j_raw"))
      .filter(col("j_raw") >= 0.5)
      .groupBy(col("new_id"))
      .agg(min(col("old_id")).as("dup_of"),
        count(lit(1)).as("n_matches"),
        max(round(col("j_raw"), 4)).as("best_j"))
      .orderBy(col("new_id"))
  }

  /** Exhaustive replica: true Jaccard for EVERY new/old pair. */
  val ddMinhashIncrSql: String =
    """WITH sh AS (
        SELECT doc_id, substr(source, 4)::INT AS grp,
          CASE WHEN len(ws) >= 3
            THEN list_distinct(list_transform(range(1, len(ws)-1),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
            ELSE [trim(lower(text))] END AS sh_arr
        FROM (SELECT doc_id, source, text,
          regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents)),
      pairs AS (
        SELECT n.doc_id AS new_id, o.doc_id AS old_id,
          len(list_intersect(n.sh_arr, o.sh_arr))::DOUBLE
            / len(list_distinct(list_concat(n.sh_arr, o.sh_arr))) AS j
        FROM sh n JOIN sh o ON n.grp >= 10 AND o.grp < 10)
      SELECT new_id, min(old_id) AS dup_of, count(*) AS n_matches,
        max(round(j, 4)) AS best_j
      FROM pairs WHERE j >= 0.5
      GROUP BY new_id ORDER BY new_id"""

  val queries: Map[String, Q] = Map(
    "dd_minhash_incr" -> ddMinhashIncr,
    "dd_bloom_incr" -> ddBloomIncr,
    "dd_url_dedup" -> ddUrlDedup,
    "dd_substring" -> ddSubstring,
    "dd_paragraph" -> ddParagraph,
    "dd_containment" -> ddContainment,
    "dd_exact" -> ddExact,
    "dd_minhash_pairs" -> ddMinhashPairs,
    "dd_minhash_dedup" -> ddMinhashDedup,
    "dd_minhash_cluster" -> ddMinhashCluster,
    "dd_minhash_keepbest" -> ddMinhashKeepbest,
    "dd_simhash" -> ddSimhash,
    "dd_ngram_jaccard" -> ddNgramJaccard)

  /** Exhaustive all-pairs oracle for the LSH-candidates + exact-verify
    * pipeline: DuckDB recomputes word-3-gram shingle sets for every
    * doc and checks EVERY pair — if the LSH candidate generation ever
    * drops a true >=0.5 pair, the gate fails. (All-pairs is fine for
    * the oracle at sf0.01; the engine side never goes quadratic.) */
  val ddNgramJaccardSql: String =
    """WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(ws) >= 3
            THEN list_distinct(list_transform(range(1, len(ws)-1),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
            ELSE [trim(lower(text))] END AS sh_arr
        FROM (SELECT doc_id, text,
          regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents))
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        round(len(list_intersect(a.sh_arr, b.sh_arr))::DOUBLE
          / len(list_distinct(list_concat(a.sh_arr, b.sh_arr))), 4) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh_arr, b.sh_arr))::DOUBLE
          / len(list_distinct(list_concat(a.sh_arr, b.sh_arr))) >= 0.5
      ORDER BY doc_a, doc_b"""

  /** Exhaustive oracle for the LSH candidate generation itself: DuckDB
    * recomputes TRUE word-3-gram Jaccard for every pair and keeps those
    * >= 0.5. At gate scale the LSH band collision probability below the
    * threshold is low enough that candidates == true pairs, so this
    * checks recall (no true pair missed by banding) and precision (no
    * sub-threshold band collision) of the MinHash pipeline at once,
    * against an implementation sharing no code with the engine's. */
  val ddMinhashPairsSql: String =
    """WITH sh AS (
        SELECT doc_id,
          CASE WHEN len(ws) >= 3
            THEN list_distinct(list_transform(range(1, len(ws)-1),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
            ELSE [trim(lower(text))] END AS sh_arr
        FROM (SELECT doc_id, text,
          regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents))
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh_arr, b.sh_arr))::DOUBLE
          / len(list_distinct(list_concat(a.sh_arr, b.sh_arr))) >= 0.5
      ORDER BY doc_a, doc_b"""

  /** Independent DuckDB twin of the full SimHash pipeline in PURE SQL:
    * per-word murmur3_x86_32 under both seeds (recursive CTE over
    * 4-byte blocks — same validated mixer as the pt_bucket oracle,
    * seed-parameterized), occurrence-weighted ±1 votes per bit, sign →
    * two 32-bit fingerprint halves, then an EXHAUSTIVE all-pairs
    * hamming<=3 scan. If the engine's pigeonhole chunk bucketing ever
    * drops a true near-dup pair (or admits a wrong one), the gate
    * fails. 2538058380 = unsigned 0x9747b28c, the second simhash seed. */
  val ddSimhashSql: String =
    """WITH RECURSIVE
wordcnt AS (
  SELECT doc_id, w, count(*)::BIGINT AS cnt
  FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS w FROM documents)
  WHERE w <> '' GROUP BY doc_id, w),
words AS (SELECT DISTINCT w AS s FROM wordcnt),
seeds AS (SELECT unnest([0::BIGINT, 2538058380::BIGINT]) AS seed),
blk AS (
  SELECT s, seed, 0::BIGINT AS i, seed AS h, length(s)//4 AS nb FROM words, seeds
  UNION ALL
  SELECT s, seed, i+1, (((((xor(h, ((((((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | (((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295)::HUGEINT * 461845907 % 4294967296)::BIGINT)) << 13) | ((xor(h, ((((((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | (((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295)::HUGEINT * 461845907 % 4294967296)::BIGINT)) >> 19)) & 4294967295) * 5 + 3864292196) % 4294967296, nb FROM blk WHERE i < nb),
done AS (SELECT s, seed, h, nb FROM blk WHERE i = nb),
tail AS (SELECT s, seed, h, length(s) AS len, CASE length(s) % 4
      WHEN 0 THEN 0 WHEN 1 THEN ord(substr(s, 4*nb+1, 1))
      WHEN 2 THEN ord(substr(s, 4*nb+1, 1)) + ord(substr(s, 4*nb+2, 1))*256
      ELSE ord(substr(s, 4*nb+1, 1)) + ord(substr(s, 4*nb+2, 1))*256 + ord(substr(s, 4*nb+3, 1))*65536
    END AS tk FROM done),
mixed AS (
  SELECT s, seed, len, CASE WHEN len % 4 = 0 THEN h
    ELSE xor(h, ((((((((tk)::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | ((((tk)::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT) END AS hm
  FROM tail),
fin AS (
  SELECT s, seed, xor(hm, len) AS f0, xor(f0, f0 >> 16) AS f1,
    ((f1)::HUGEINT * 2246822507 % 4294967296)::BIGINT AS f2, xor(f2, f2 >> 13) AS f3,
    ((f3)::HUGEINT * 3266489909 % 4294967296)::BIGINT AS f4, xor(f4, f4 >> 16) AS hu
  FROM mixed),
votes AS (
  SELECT wc.doc_id, b.j,
    sum(CASE WHEN ((h1.hu >> b.j) & 1) = 1 THEN wc.cnt ELSE -wc.cnt END) AS v1,
    sum(CASE WHEN ((h2.hu >> b.j) & 1) = 1 THEN wc.cnt ELSE -wc.cnt END) AS v2
  FROM wordcnt wc
  JOIN (SELECT s, hu FROM fin WHERE seed = 0) h1 ON wc.w = h1.s
  JOIN (SELECT s, hu FROM fin WHERE seed = 2538058380) h2 ON wc.w = h2.s,
  range(0,32) b(j)
  GROUP BY 1,2),
fp AS (
  SELECT doc_id,
    sum(CASE WHEN v1 > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS lo,
    sum(CASE WHEN v2 > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS hi
  FROM votes GROUP BY 1)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::INT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
ORDER BY doc_a, doc_b"""

  /** Shared oracle fragment: true word-3-gram Jaccard >= 0.5 pairs,
    * recomputed exhaustively (all pairs) in DuckDB. At gate scale the
    * LSH candidates equal exactly this set (asserted independently by
    * the dd_minhash_pairs oracle), so downstream keys built on the
    * candidate set can be oracled against the true-pair set. */
  private val truePairsCte: String =
    """sh AS (
        SELECT doc_id,
          CASE WHEN len(ws) >= 3
            THEN list_distinct(list_transform(range(1, len(ws)-1),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
            ELSE [trim(lower(text))] END AS sh_arr
        FROM (SELECT doc_id, text,
          regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents)),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh_arr, b.sh_arr))::DOUBLE
            / len(list_distinct(list_concat(a.sh_arr, b.sh_arr))) >= 0.5)"""

  /** Oracle for the keep-min-neighbor dedup: a doc dies iff it is the
    * larger id of some true near-dup pair. */
  val ddMinhashDedupSql: String =
    s"""WITH $truePairsCte
      SELECT doc_id, lang, n_chars FROM documents
      WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
      ORDER BY doc_id"""

  /** Oracle for the exact-cluster dedup: DuckDB recomputes connected
    * components by recursive transitive closure (every node's cluster
    * = the minimum doc_id it can reach) — an independent formulation
    * of the engine's iterative min-label propagation. */
  val ddMinhashClusterSql: String =
    s"""WITH RECURSIVE $truePairsCte,
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach AS (
        SELECT a AS id, a AS r FROM edges
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      comp AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
      surv AS (SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS cluster_size
               FROM comp GROUP BY cluster)
      SELECT doc_id, 1::BIGINT AS cluster_size FROM documents
      WHERE doc_id NOT IN (SELECT doc_id FROM comp)
      UNION ALL
      SELECT doc_id, cluster_size FROM surv
      ORDER BY doc_id"""

  /** Oracle for keep-best: same recursive closure, then the
    * best-by-(n_chars DESC, doc_id ASC) row per cluster. */
  val ddMinhashKeepbestSql: String =
    s"""WITH RECURSIVE $truePairsCte,
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach AS (
        SELECT a AS id, a AS r FROM edges
        UNION
        SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      comp AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
      clustered AS (
        SELECT c.doc_id, c.cluster, d.n_chars
        FROM comp c JOIN documents d USING (doc_id)),
      ranked AS (
        SELECT cluster, doc_id, n_chars,
          count(*) OVER (PARTITION BY cluster) AS cluster_size,
          row_number() OVER (PARTITION BY cluster
            ORDER BY n_chars DESC, doc_id) AS rn
        FROM clustered)
      SELECT doc_id AS keep_id, 1::BIGINT AS cluster_size,
        n_chars AS keep_chars
      FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM comp)
      UNION ALL
      SELECT doc_id AS keep_id, cluster_size::BIGINT AS cluster_size,
        n_chars AS keep_chars
      FROM ranked WHERE rn = 1
      ORDER BY keep_id"""

  // def, not val: ddContainmentSql inlines the session's
  // graft.dedup.containmentBand divisor at access time
  def oracles: Map[String, String] = Map(
    "dd_minhash_incr" -> ddMinhashIncrSql,
    "dd_url_dedup" -> ddUrlDedupSql,
    "dd_substring" -> ddSubstringSql,
    "dd_paragraph" -> ddParagraphSql,
    "dd_containment" -> ddContainmentSql,
    "dd_bloom_incr" -> ddBloomIncrSql,
    "dd_exact" -> ddExactSql,
    "dd_minhash_pairs" -> ddMinhashPairsSql,
    "dd_minhash_dedup" -> ddMinhashDedupSql,
    "dd_minhash_cluster" -> ddMinhashClusterSql,
    "dd_minhash_keepbest" -> ddMinhashKeepbestSql,
    "dd_simhash" -> ddSimhashSql,
    "dd_ngram_jaccard" -> ddNgramJaccardSql)
}
