package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.IcebergHash

/** Text-analysis operators for training-data pipelines (SURVEY.md §2.D):
  * token counting, quality scoring, language ID, fingerprinting — all
  * per-document narrow transforms (no shuffle except final ordering),
  * so they scale linearly with input splits.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "on")

  private def words(c: Column): Column = split(trim(c), "\\s+")

  /** Token counting: whitespace tokens + BPE-ish regex pieces (letter
    * runs, single digits, single punctuation marks). */
  val taTokens: Q = (s, d) => {
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(words(col("text"))).as("n_ws"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpe"),
        length(col("text")).as("n_char"))
      .orderBy(col("doc_id"))
  }

  val taTokensSql: String =
    """SELECT doc_id,
       len(regexp_split_to_array(trim(text),'\s+')) AS n_ws,
       len(regexp_extract_all(text,'[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe,
       length(text) AS n_char
       FROM documents ORDER BY doc_id"""

  /** Quality scoring: structural ratios a filtering pipeline thresholds
    * on. All arithmetic stays in one codegen'd projection. */
  val taQuality: Q = (s, d) => {
    val w = words(col("text"))
    val nWords = size(w).cast("double")
    val nStop = size(filter(transform(w, x => lower(x)),
      x => x.isin(stopwords.map(lit(_)): _*))).cast("double")
    val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).cast("double")
    val len = length(col("text")).cast("double")
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        round(alpha / len, 4).as("alpha_ratio"),
        round(punct / len, 4).as("punct_ratio"),
        round(nStop / nWords, 4).as("stop_ratio"),
        round(len / nWords, 4).as("chars_per_word"),
        round(
          (alpha / len) * 0.4 +
            (nStop / nWords) * 0.3 +
            when(len >= 200 && len <= 5000, 0.3).otherwise(0.0), 4).as("quality"))
      .orderBy(col("doc_id"))
  }

  val taQualitySql: String = {
    val stops = stopwords.map(w => s"'$w'").mkString(",")
    s"""SELECT doc_id,
       round(length(regexp_replace(text,'[^A-Za-z]','','g')) / length(text)::double, 4) AS alpha_ratio,
       round(length(regexp_replace(text,'[A-Za-z0-9\\s]','','g')) / length(text)::double, 4) AS punct_ratio,
       round(len(list_filter(regexp_split_to_array(lower(trim(text)),'\\s+'),
         w -> w IN ($stops))) / len(regexp_split_to_array(trim(text),'\\s+'))::double, 4) AS stop_ratio,
       round(length(text)::double / len(regexp_split_to_array(trim(text),'\\s+')), 4) AS chars_per_word,
       round(
         (length(regexp_replace(text,'[^A-Za-z]','','g')) / length(text)::double) * 0.4 +
         (len(list_filter(regexp_split_to_array(lower(trim(text)),'\\s+'),
            w -> w IN ($stops))) / len(regexp_split_to_array(trim(text),'\\s+'))::double) * 0.3 +
         (CASE WHEN length(text) BETWEEN 200 AND 5000 THEN 0.3 ELSE 0.0 END), 4) AS quality
       FROM documents ORDER BY doc_id"""
  }

  /** n-gram/heuristic language ID. Scores each candidate language by
    * marker-word hits and character-class evidence, then argmax with a
    * deterministic tie-break (alphabetical). Rows-only: the heuristic
    * itself is the operator under test (see TextAnalysisSpec). */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "de" -> Seq("der", "und", "die", "ist", "das"),
    "fr" -> Seq("le", "et", "la", "est", "les"),
    "es" -> Seq("el", "y", "la", "es", "los"),
    "zh" -> Seq())

  val taLangid: Q = (s, d) => {
    val w = transform(words(col("text")), x => lower(x))
    def score(lang: String): Column =
      if (lang == "zh")
        // CJK presence is decisive evidence
        when(col("text").rlike("[\\u4e00-\\u9fff]"), lit(1000.0)).otherwise(lit(0.0))
      else
        size(filter(w, x => x.isin(markers(lang).map(lit(_)): _*)))
          .cast("double") / size(w)

    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("lang").as("lang_true"),
        array(markers.keys.toSeq.sorted.map(l =>
          struct(score(l).as("s"), lit(l).as("l"))): _*).as("scores"))
    scored
      .select(col("doc_id"), col("lang_true"),
        sort_array(col("scores"), asc = false).getItem(0).getField("l").as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin of taLangid: same marker ratios, same CJK override,
    * same (score DESC, lang DESC) tie-break. */
  val taLangidSql: String = {
    def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ",", "]")
    val ratioLangs = markers.toSeq.filter(_._2.nonEmpty).sortBy(_._1).map {
      case (l, ws) =>
        s"""SELECT doc_id, lang, '$l' AS l,
            len(list_filter(ws, x -> list_contains(${inList(ws)}, x)))::DOUBLE
              / len(ws) AS score FROM w"""
    }
    val zh =
      s"""SELECT doc_id, lang, 'zh' AS l,
          CASE WHEN regexp_matches(text, '[一-鿿]')
               THEN 1000.0 ELSE 0.0 END AS score FROM w"""
    s"""WITH w AS (
          SELECT doc_id, lang, text,
            list_transform(regexp_split_to_array(trim(text), '\\s+'),
              x -> lower(x)) AS ws
          FROM documents),
        s AS (${(ratioLangs :+ zh).mkString("\n UNION ALL ")}),
        p AS (SELECT doc_id, lang, l,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, l DESC) AS rn FROM s)
        SELECT doc_id, lang AS lang_true, l AS lang_pred
        FROM p WHERE rn = 1 ORDER BY doc_id"""
  }

  /** Rolling-hash document fingerprint: full-text murmur3 plus a
    * winnowed min-hash over sliding 8-byte windows — content-defined,
    * shift-tolerant. A codegen'd Catalyst expression (functions.
    * DocFingerprint), not a UDF. Rows-only (spec asserts stability and
    * shift tolerance). */
  val taFingerprint: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.TextHash.docFingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-statistics quality score: mean unigram log-probability per
    * document under the corpus's own unigram model — the classic
    * cheap fluency proxy. Two distributed phases: build the frequency
    * table (one groupBy), then score docs (join words→freq, one agg).
    * The vocabulary is bounded, so the freq side broadcasts at scale. */
  val taUnigramLogprob: Q = (s, d) => {
    val words = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
    val freq = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = words.agg(count(lit(1)).as("t"))
    words
      .join(freq, Seq("w"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("c").cast("double") / col("t"))), 6).as("logprob"))
      .orderBy(col("doc_id"))
  }

  val taUnigramLogprobSql: String =
    """WITH words AS (
         SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)),'\s+')) AS w
         FROM documents),
       freq AS (SELECT w, count(*) AS c FROM words GROUP BY w),
       tot AS (SELECT count(*) AS t FROM words)
       SELECT doc_id, round(avg(ln(c::double / t)), 6) AS logprob
       FROM words JOIN freq USING (w) CROSS JOIN tot
       GROUP BY doc_id ORDER BY doc_id"""

  /** CCNet-style perplexity bucketing: split the corpus into
    * head / middle / tail thirds by language-model score — here the
    * same corpus-unigram mean log-prob ta_unigram_logprob computes
    * (higher = more fluent = head). The classic recipe keeps "head"
    * for training and samples the rest.
    *
    * Scale design: the cutoffs are the N/3 and 2N/3 order statistics.
    * Computing them never materializes N scores anywhere: scores are
    * already rounded to a 1e-6 grid, so they collapse to a
    * VALUE-HISTOGRAM (groupBy score → count) and the weighted exact
    * `percentile(score, frac, cnt)` runs over distinct values, not
    * rows. The percentile fractions (k-1)/(N-1) land exactly on data
    * points, so no interpolation happens and the cutoff equals the
    * k-th smallest grid value bit-for-bit — the DuckDB oracle computes
    * the same order statistic by explicit rank. Bucket assignment is
    * then a broadcast of two scalars — no global sort, no window. */
  val taPplBucket: Q = (s, d) => {
    val words = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
    val freq = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = words.agg(count(lit(1)).as("t"))
    val scored = words
      .join(freq, Seq("w"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("c").cast("double") / col("t"))), 6).as("logprob"))
    // parquet row-count read, no data pass (the embedNeardup gate shape)
    val n = Tables.documents(s, d).count()
    require(n >= 3,
      s"ta_ppl_bucket needs >= 3 documents to cut thirds, got $n")
    val k1 = n / 3
    val k2 = 2 * n / 3
    val f1 = (k1 - 1).toDouble / (n - 1)
    val f2 = (k2 - 1).toDouble / (n - 1)
    val hist = scored.groupBy(col("logprob")).agg(count(lit(1)).as("cnt"))
    val cuts = hist.agg(
      round(expr(s"percentile(logprob, ${f1}d, cnt)"), 6).as("c1"),
      round(expr(s"percentile(logprob, ${f2}d, cnt)"), 6).as("c2"))
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("logprob"),
        when(col("logprob") >= col("c2"), lit("head"))
          .when(col("logprob") >= col("c1"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
      .orderBy(col("doc_id"))
  }

  /** Exact replica: same unigram scores, cutoffs as the explicit
    * N/3-th and 2N/3-th smallest scores by rank (the interpolation-free
    * order statistic the engine's exact-landing percentile computes). */
  val taPplBucketSql: String =
    """WITH words AS (
         SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)),'\s+')) AS w
         FROM documents),
       freq AS (SELECT w, count(*) AS c FROM words GROUP BY w),
       tot AS (SELECT count(*) AS t FROM words),
       scored AS (
         SELECT doc_id, round(avg(ln(c::double / t)), 6) AS logprob
         FROM words JOIN freq USING (w) CROSS JOIN tot
         GROUP BY doc_id),
       ranked AS (
         SELECT logprob, row_number() OVER (ORDER BY logprob) AS rn,
           count(*) OVER () AS n
         FROM scored),
       cuts AS (
         SELECT max(CASE WHEN rn = n // 3 THEN logprob END) AS c1,
                max(CASE WHEN rn = (2 * n) // 3 THEN logprob END) AS c2
         FROM ranked)
       SELECT doc_id, logprob,
         CASE WHEN logprob >= c2 THEN 'head'
              WHEN logprob >= c1 THEN 'middle'
              ELSE 'tail' END AS bucket
       FROM scored CROSS JOIN cuts
       ORDER BY doc_id"""

  /** Classifier-based quality filtering — the GPT-3/LLaMA-style
    * complement to rule-based ta_quality: a (fixed, deterministic)
    * logistic model over cheap text features scores every document
    * and the pipeline keeps those the classifier accepts. The
    * features reuse the exact arithmetic forms of the rule operators
    * (ratios of integer counts — bit-identical across engines), the
    * linear combination is evaluated in one fixed association order,
    * and the KEEP verdict compares z >= 0 directly — the sigmoid is
    * only display, so the exp() float seam can never flip a verdict.
    * One narrow projection per doc, fully inside codegen, no shuffle. */
  val pipelineClassifier: Q = (s, d) => {
    val w = words(col("text"))
    val len = length(col("text")).cast("double")
    val alpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
      .cast("double") / len
    val nWords = size(w).cast("double")
    val stopR = size(filter(transform(w, x => lower(x)),
      x => x.isin(stopwords.map(lit(_)): _*))).cast("double") / nWords
    val dup = (size(w) - size(array_distinct(transform(w, x => lower(x)))))
      .cast("double") / nWords
    val inRange = when(length(col("text")) >= 200 &&
      length(col("text")) <= 5000, 1.0).otherwise(0.0)
    val z = lit(-2.0) + alpha * 3.0 + stopR * 4.0 + inRange - dup * 2.0
    Tables.documents(s, d)
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("score"),
        (z >= 0).as("kept"))
      .orderBy(col("doc_id"))
  }

  val pipelineClassifierSql: String = {
    val stops = stopwords.map(w => s"'$w'").mkString(",")
    s"""WITH f AS (
        SELECT doc_id,
          length(regexp_replace(text,'[^A-Za-z]','','g'))
            / length(text)::double AS alpha,
          len(list_filter(list_transform(ws, w -> lower(w)),
            w -> w IN ($stops)))::double / len(ws) AS stopr,
          (len(ws) - len(list_distinct(list_transform(ws, w -> lower(w)))))::double
            / len(ws) AS dup,
          CASE WHEN length(text) BETWEEN 200 AND 5000
            THEN 1.0 ELSE 0.0 END AS inrange
        FROM (SELECT doc_id, text,
          regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents)),
      scored AS (
        SELECT doc_id,
          -2.0 + alpha * 3.0 + stopr * 4.0 + inrange - dup * 2.0 AS z
        FROM f)
      SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS score,
        z >= 0 AS kept
      FROM scored ORDER BY doc_id"""
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how target-domain-like it is under hashed-bigram
    * unigram models of the TARGET domain (here: the non-English slice)
    * vs the RAW corpus — log w(d) = Σ over d's bigram instances of
    * ln(p_target(f)/p_raw(f)) with Laplace smoothing over the 8192
    * hash buckets. Real pipelines then resample by these weights; the
    * weight computation is the distributed part.
    *
    * Scale design: feature counting is one conditional-agg groupBy
    * over hashed features (8192 buckets, bounded); the bucket ratio
    * table collapses to a SINGLE broadcast row holding a dense
    * array<double>, and per-doc scoring is a narrow projection — the
    * bigram fold runs INSIDE the row (left-to-right, deterministic),
    * so no per-doc float sum ever crosses a shuffle and the only
    * cross-engine seam is ln() on bit-identical ratios (each ratio is
    * one division of exact integer products). md5-prefix feature
    * hashing is the dd_bloom_incr primitive — replayed exactly in
    * SQL. */
  val taDsirWeight: Q = (s, d) => {
    val ws = split(trim(lower(col("text"))), "\\s+")
    val B = 8192
    // spread + localCheckpoint: the bigram arrays feed three branches
    // (stats, tots, per-doc scoring) — split/zip work materializes once
    val docs = Tables.spread(s, Tables.documents(s, d))
      .select(col("doc_id"), col("lang"),
        when(size(ws) >= 2,
          zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>")).as("bigrams"))
      .localCheckpoint()
    val feat = (b: Column) =>
      conv(substring(md5(b), 1, 15), 16, 10).cast("long") % B
    val feats = docs
      .select(explode(col("bigrams")).as("b"), col("lang"))
      .select(feat(col("b")).as("f"), col("lang"))
    val stats = feats.groupBy(col("f"))
      .agg(count(lit(1)).as("cr"),
        count(when(col("lang") =!= "en", 1)).as("ct"))
    val tots = feats.agg(count(lit(1)).as("tr"),
      count(when(col("lang") =!= "en", 1)).as("tt"))
    // dense per-bucket ratio array on ONE row:
    // p_t/p_r = (ct+1)(tr+B) / ((cr+1)(tt+B)) — one exact division
    val dense = s.range(0, B).toDF("f")
      .join(stats, Seq("f"), "left")
      .crossJoin(broadcast(tots))
      .select(col("f"),
        (((coalesce(col("ct"), lit(0L)) + 1) * (col("tr") + B)).cast("double") /
          ((coalesce(col("cr"), lit(0L)) + 1) * (col("tt") + B))).as("ratio"))
      .agg(array_sort(collect_list(struct(col("f"), col("ratio")))).as("pr"))
      .select(transform(col("pr"), p => p.getField("ratio")).as("ratios"))
    docs.crossJoin(broadcast(dense))
      .select(col("doc_id"), size(col("bigrams")).as("n_bigrams"),
        round(aggregate(transform(col("bigrams"), b =>
          log(element_at(col("ratios"),
            (feat(b) + 1).cast("int")))),
          lit(0.0), (acc, x) => acc + x), 6).as("logweight"))
      .orderBy(col("doc_id"))
  }

  /** Exact replica: same bigrams, same md5-prefix bucket hash, dense
    * ratio list built by rank order, same in-row left-to-right fold. */
  val taDsirWeightSql: String =
    """WITH docs AS (
        SELECT doc_id, lang,
          CASE WHEN len(ws) >= 2
            THEN list_transform(range(1, len(ws)),
              i -> ws[i] || ' ' || ws[i+1])
            ELSE []::VARCHAR[] END AS bigrams
        FROM (SELECT doc_id, lang,
          regexp_split_to_array(trim(lower(text)), '\s+') AS ws
          FROM documents)),
      feats AS (
        SELECT (('0x' || substr(md5(b), 1, 15))::BIGINT % 8192) AS f, lang
        FROM (SELECT unnest(bigrams) AS b, lang FROM docs)),
      stats AS (
        SELECT f, count(*) AS cr,
          count(*) FILTER (WHERE lang <> 'en') AS ct
        FROM feats GROUP BY f),
      tots AS (
        SELECT count(*) AS tr,
          count(*) FILTER (WHERE lang <> 'en') AS tt
        FROM feats),
      dense AS (
        SELECT list(((coalesce(ct, 0) + 1) * (tr + 8192))::DOUBLE
            / ((coalesce(cr, 0) + 1) * (tt + 8192)) ORDER BY fr.f) AS ratios
        FROM range(0, 8192) fr(f)
        LEFT JOIN stats ON stats.f = fr.f
        CROSS JOIN tots)
      SELECT doc_id, len(bigrams)::INT AS n_bigrams,
        round(coalesce(list_sum(list_transform(bigrams, b ->
          ln(ratios[((('0x' || substr(md5(b), 1, 15))::BIGINT % 8192) + 1)::INT])
        )), 0.0), 6) AS logweight
      FROM docs CROSS JOIN dense
      ORDER BY doc_id"""

  /** Deterministic hash-based stratified sampling (data mixing): each
    * language keeps the documents whose murmur3(doc_id) bucket over
    * 100 slots falls under its quota — the dominant source (en) is
    * downsampled to 25%, the rest kept at 75%. This is THE
    * reproducible 100-TB sampling/mixing primitive: no RNG state, no
    * shuffle, membership decidable per row inside codegen (the same
    * codegen'd murmur3 the Iceberg bucket transform uses), and the
    * sample is stable across reruns, retries, and cluster sizes. */
  val pipelineMix: Q = (s, d) => {
    val slot = graft.functions.IcebergTransforms.bucket(col("doc_id"), 100)
    Tables.documents(s, d)
      .withColumn("slot", slot)
      .filter(col("slot") <
        when(col("lang") === "en", lit(25)).otherwise(lit(75)))
      .select(col("doc_id"), col("lang"), col("slot"))
      .orderBy(col("doc_id"))
  }

  /** Pure-SQL murmur3 of the 8-byte doc_id (the pt_bucket key-hash
    * pattern) -> bucket over 100 -> per-language quota filter. */
  val pipelineMixSql: String =
    s"""WITH key_hash AS (
      SELECT doc_id, lang,
        ${OracleSql.murmurLongCols("doc_id")}
      FROM documents)
    SELECT doc_id, lang, ((hu & 2147483647) % 100)::INT AS slot
    FROM key_hash
    WHERE ((hu & 2147483647) % 100) < CASE WHEN lang = 'en' THEN 25 ELSE 75 END
    ORDER BY doc_id"""

  /** Word-repetition quality rule (the Gopher/C4-style duplicate-word
    * filter): per-document duplicate-word fraction in exact integer
    * permyriad — (n_words - n_distinct) * 10000 / n_words with integer
    * division, so the oracle comparison is bit-exact with no floating
    * rounding seam. One narrow projection, no shuffle, all inside
    * codegen. */
  val taRepetition: Q = (s, d) => {
    val ws = split(trim(lower(col("text"))), "\\s+")
    Tables.documents(s, d)
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n_words"),
        size(array_distinct(col("ws"))).as("n_distinct"))
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        ((col("n_words") - col("n_distinct")) * lit(10000) / col("n_words"))
          .cast("int").as("dup_permyriad"))
      .orderBy(col("doc_id"))
  }

  val taRepetitionSql: String =
    """SELECT doc_id, len(ws)::INT AS n_words,
         len(list_distinct(ws))::INT AS n_distinct,
         ((len(ws) - len(list_distinct(ws))) * 10000 // len(ws))::INT AS dup_permyriad
       FROM (SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\s+') AS ws
         FROM documents)
       ORDER BY doc_id"""

  /** Test-set decontamination: flag corpus documents sharing ANY word
    * 5-gram with the eval set (here: doc_id < 20 plays the benchmark)
    * — the standard leakage check before training. The eval gram set
    * is tiny by construction and broadcast; the corpus side explodes
    * per-doc DISTINCT grams, so the join carries corpus grams once
    * each and no N² pair ever forms. */
  val pipelineDecontaminate: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 5)
    def grams = transform(
      sequence(lit(0), size(col("ws")) - 5),
      i => concat_ws(" ", (1 to 5).map(k => element_at(col("ws"), i + k)): _*))
    val evalGrams = docs.filter(col("doc_id") < 20)
      .select(explode(grams).as("gram")).distinct()
    docs.filter(col("doc_id") >= 20)
      .select(col("doc_id"), explode(array_distinct(grams)).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  val pipelineDecontaminateSql: String =
    """WITH g AS (SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents),
       eg AS (SELECT DISTINCT unnest(list_transform(range(1, len(ws)-3),
           i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4])) AS gram
         FROM g WHERE doc_id < 20 AND len(ws) >= 5),
       cg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws)-3),
           i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]))) AS gram
         FROM g WHERE doc_id >= 20 AND len(ws) >= 5)
       SELECT c.doc_id, count(DISTINCT c.gram)::BIGINT AS n_hits
       FROM cg c JOIN eg e USING (gram)
       GROUP BY 1 ORDER BY doc_id"""

  /** Sequence packing (training-batch assembly): greedy next-fit
    * packing of documents into fixed-token-budget training sequences.
    * Documents route to one of 16 independent packing streams by
    * murmur3(doc_id); each stream packs with a running token cursor
    * (window cumsum) and a document lands in the sequence where its
    * cumulative START falls. Per-stream windows parallelize across
    * the cluster — at 100 TB raise the stream count so each window
    * partition stays executor-sized; packing quality is per-stream
    * and unaffected by the count. */
  val pipelinePack: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val budget = 2048
    val docs = Tables.documents(s, d).select(
      col("doc_id"),
      size(words(col("text"))).cast("long").as("tokens"),
      graft.functions.IcebergTransforms.bucket(col("doc_id"), 16)
        .as("stream"))
    val w = Window.partitionBy(col("stream")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("seq",
        ((col("cum") - col("tokens")) / lit(budget)).cast("long"))
      .groupBy(col("stream"), col("seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("sum_tokens"))
      .orderBy(col("stream"), col("seq"))
  }

  /** Same murmur3 key-hash CTE as pipeline_mix, then per-stream
    * window cumsum packing — greedy next-fit, bit-exact. */
  val pipelinePackSql: String =
    s"""WITH key_hash AS (
      SELECT doc_id, text,
        ${OracleSql.murmurLongCols("doc_id")}
      FROM documents),
    toks AS (
      SELECT doc_id, ((hu & 2147483647) % 16)::INT AS stream,
        len(regexp_split_to_array(trim(text),'\\s+'))::BIGINT AS tokens
      FROM key_hash),
    packed AS (
      SELECT stream, doc_id, tokens,
        sum(tokens) OVER (PARTITION BY stream ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM toks)
    SELECT stream, ((cum - tokens) // 2048)::BIGINT AS seq,
      count(*) AS n_docs, sum(tokens)::BIGINT AS sum_tokens
    FROM packed GROUP BY 1, 2 ORDER BY stream, seq"""

  /** PII scrubbing (the C4/Dolma-style redaction pass): emails, US
    * phone numbers, and IPv4 addresses replaced by typed placeholders,
    * with per-document match counts for audit. The corpus text is
    * clean word-soup, so the PII is synthesized deterministically
    * from doc_id — the regex machinery does real work and the oracle
    * replays the whole pass bit-for-bit (md5 of the scrubbed text).
    * One narrow codegen'd projection per row: no shuffle, scales
    * linearly with input splits at crawl size. */
  val taPiiScrub: Q = (s, d) => {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val dirty = concat(
      col("text"),
      lit(" contact u"), col("doc_id").cast("string"),
      lit("@ex"), (col("doc_id") % 7).cast("string"), lit(".com"),
      when(col("doc_id") % 3 === 0, lit(" cc admin@corp.example.org"))
        .otherwise(lit("")),
      lit(" call 415-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (col("doc_id") % 256).cast("string"),
      lit(".0."), ((col("doc_id") * 7) % 256).cast("string"))
    Tables.documents(s, d)
      .select(col("doc_id"), dirty.as("dirty"))
      .select(col("doc_id"),
        regexp_count(col("dirty"), lit(email)).as("n_email"),
        regexp_count(col("dirty"), lit(phone)).as("n_phone"),
        regexp_count(col("dirty"), lit(ip)).as("n_ip"),
        regexp_replace(regexp_replace(regexp_replace(col("dirty"),
          email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>").as("clean"))
      .select(col("doc_id"), col("n_email"), col("n_phone"), col("n_ip"),
        length(col("clean")).as("clean_len"),
        md5(col("clean")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val taPiiScrubSql: String =
    """WITH dirty AS (
      SELECT doc_id,
        text || ' contact u' || doc_id || '@ex' || (doc_id % 7) || '.com' ||
        CASE WHEN doc_id % 3 = 0 THEN ' cc admin@corp.example.org' ELSE '' END ||
        ' call 415-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
        ' from 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256) AS s
      FROM documents),
    scrub AS (
      SELECT doc_id,
        len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        len(regexp_extract_all(s, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
        len(regexp_extract_all(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        regexp_replace(regexp_replace(regexp_replace(s,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS clean
      FROM dirty)
    SELECT doc_id, n_email, n_phone, n_ip,
      length(clean) AS clean_len, md5(clean) AS clean_md5
    FROM scrub ORDER BY doc_id"""

  /** BM25 ranked retrieval: score every document against a fixed
    * query-term set and return the global top 20. The per-doc side is
    * ONE narrow projection — term frequencies come from
    * `size(filter(ws, _ === term))` inside codegen, so no explode and
    * nothing document-sized ever shuffles. Corpus statistics (N, avgdl,
    * per-term document frequencies) reduce to a SINGLE row via partial
    * aggregation and broadcast back with a crossJoin — at 100 TB the
    * wire carries one stats row plus the top-k heap, not postings.
    * avgdl stays bit-exact across engines (integer-valued doubles sum
    * exactly), so the only cross-engine float seam is ln(), absorbed by
    * 6-decimal rounding (the ann_pq precedent). Ties break on doc_id
    * so the LIMIT boundary is deterministic. */
  val bm25Terms: Seq[String] = Seq("table", "hash", "merge", "window")

  val taBm25: Q = (s, d) => {
    // Constants appear as the same decimal literals the oracle parses
    // (2.2 = k1+1, 0.25 = 1-b): computing k1+1.0 here can land one ulp
    // away from the SQL literal and leak through the 6-decimal round.
    val withTf = Tables.documents(s, d)
      .select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("ws"))
      .select(
        (col("doc_id") +: size(col("ws")).cast("double").as("dl") +:
          bm25Terms.zipWithIndex.map { case (t, i) =>
            size(filter(col("ws"), w => w === lit(t)))
              .cast("double").as(s"tf$i")
          }): _*)
    val statCols = count(lit(1)).cast("double").as("n") +:
      avg(col("dl")).as("avgdl") +:
      bm25Terms.indices.map { i =>
        sum(when(col(s"tf$i") > 0, 1).otherwise(0))
          .cast("double").as(s"df$i")
      }
    val stats = withTf.agg(statCols.head, statCols.tail: _*)
    val score = bm25Terms.indices.map { i =>
      val idf = log(lit(1.0) + (col("n") - col(s"df$i") + lit(0.5)) /
        (col(s"df$i") + lit(0.5)))
      idf * (col(s"tf$i") * lit(2.2)) /
        (col(s"tf$i") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    val nHit = bm25Terms.indices
      .map(i => when(col(s"tf$i") > 0, 1).otherwise(0))
      .reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .select(col("doc_id"), nHit.as("n_hit"), round(score, 6).as("bm25"))
      .filter(col("n_hit") > 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  val taBm25Sql: String = {
    val tfCols = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(ws, w -> w = '$t'))::DOUBLE AS tf$i"
    }.mkString(",\n        ")
    val dfCols = bm25Terms.indices.map { i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)::DOUBLE AS df$i"
    }.mkString(",\n        ")
    val score = bm25Terms.indices.map { i =>
      s"ln(1.0 + (n - df$i + 0.5) / (df$i + 0.5)) * (tf$i * 2.2) / " +
        s"(tf$i + 1.2 * (0.25 + 0.75 * dl / avgdl))"
    }.mkString(" + ")
    val nHit = bm25Terms.indices
      .map(i => s"CASE WHEN tf$i > 0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH dw AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
        FROM documents),
      tf AS (
        SELECT doc_id, len(ws)::DOUBLE AS dl,
        $tfCols
        FROM dw),
      st AS (
        SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl,
        $dfCols
        FROM tf)
      SELECT doc_id, ($nHit)::INT AS n_hit,
        round($score, 6) AS bm25
      FROM tf CROSS JOIN st
      WHERE $nHit > 0
      ORDER BY bm25 DESC, doc_id LIMIT 20"""
  }

  /** Text normalization — the pre-tokenization cleanup every pipeline
    * runs so visually-identical strings hash and dedup identically:
    * Unicode NFC composition (the codegen'd NfcNormalize expression —
    * no UDF seam), control-char strip, whitespace collapse, trim.
    * The ASCII corpus is dirtied deterministically per doc (combining
    * marks that NFC must compose, a control char, ragged whitespace —
    * the ta_pii_scrub recipe) so the normalizer does real work, and
    * `composed` counts the compositions so the oracle catches a no-op
    * NFC. One codegen'd projection, no shuffle; DuckDB's utf8proc NFC
    * replays it md5-bit-exact. */
  val taNormalize: Q = (s, d) => {
    val dirty = concat(
      col("text"),
      lit(" naïve éclair"),
      when(col("doc_id") % 2 === 0, lit("")).otherwise(lit("")),
      lit("\t  fin"),
      when(col("doc_id") % 3 === 0, lit(" ô")).otherwise(lit("")))
    Tables.documents(s, d)
      .select(col("doc_id"), dirty.as("dirty"))
      .select(col("doc_id"), length(col("dirty")).as("dirty_len"),
        graft.functions.TextHash.nfcNormalize(col("dirty")).as("nfc"))
      .select(col("doc_id"),
        (col("dirty_len") - length(col("nfc"))).as("composed"),
        trim(regexp_replace(regexp_replace(col("nfc"),
          "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""),
          "\\s+", " ")).as("clean"))
      .select(col("doc_id"), col("composed"),
        length(col("clean")).as("clean_len"),
        md5(col("clean")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB twin: same dirty synthesis via chr(), utf8proc
    * nfc_normalize, same control-class strip and collapse. */
  val taNormalizeSql: String =
    """WITH dirty AS (
      SELECT doc_id,
        text || ' nai' || chr(776) || 've e' || chr(769) || 'clair' ||
        CASE WHEN doc_id % 2 = 0 THEN chr(7) ELSE '' END ||
        chr(9) || '  fin' ||
        CASE WHEN doc_id % 3 = 0 THEN ' o' || chr(770) ELSE '' END AS s
      FROM documents),
    n AS (SELECT doc_id, length(s) AS dirty_len,
        nfc_normalize(s) AS nfc FROM dirty),
    c AS (SELECT doc_id, (dirty_len - length(nfc)) AS composed,
      trim(regexp_replace(regexp_replace(nfc,
        '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
        '\s+', ' ', 'g')) AS clean FROM n)
    SELECT doc_id, composed, length(clean) AS clean_len,
      md5(clean) AS clean_md5
    FROM c ORDER BY doc_id"""

  /** The Gopher-style rule battery (beyond the duplicate-word rule
    * ta_repetition already carries): word-count bounds, mean word
    * length bounds, symbol ratio, single-word dominance, and
    * alpha-word fraction, composed into one pass/fail flag — the
    * document-format filters a pretraining pipeline runs before any
    * model-based scoring. All ratios are exact integer permyriads
    * (x*10000 with integer division), so the oracle comparison is
    * bit-exact with no floating seam. Pure projection: no shuffle,
    * embarrassingly parallel at 100 TB. */
  val taGopher: Q = (s, d) => {
    val w = words(col("text"))
    val lw = transform(w, x => lower(x))
    val n = size(w)
    val sumLen = aggregate(w, lit(0L), (acc, x) => acc + length(x))
    val meanLenPm = (sumLen * 10000L / n).cast("long")
    val symbols = length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", ""))
    val symbolPm = (symbols.cast("long") * 10000L / length(col("text")))
      .cast("long")
    val topCount = array_max(transform(array_distinct(lw),
      x => size(filter(lw, y => y === x))))
    val topPm = (topCount.cast("long") * 10000L / n).cast("long")
    val alphaWords = size(filter(w, x => x.rlike("[A-Za-z]")))
    val alphaPm = (alphaWords.cast("long") * 10000L / n).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), n.as("n_words"), meanLenPm.as("mean_len_pm"),
        symbolPm.as("symbol_pm"), topPm.as("top_word_pm"),
        alphaPm.as("alpha_word_pm"))
      .withColumn("passes",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mean_len_pm") >= 30000 && col("mean_len_pm") <= 100000 &&
          col("symbol_pm") <= 1000 && col("top_word_pm") <= 2000 &&
          col("alpha_word_pm") >= 8000)
      .orderBy(col("doc_id"))
  }

  val taGopherSql: String =
    """WITH t AS (
      SELECT doc_id, text,
        regexp_split_to_array(trim(text), '\s+') AS w,
        regexp_split_to_array(lower(trim(text)), '\s+') AS lw
      FROM documents),
    m AS (
      SELECT doc_id,
        len(w)::BIGINT AS n_words,
        (list_sum(list_transform(w, x -> length(x)))::BIGINT * 10000)
          // len(w) AS mean_len_pm,
        (length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))::BIGINT
          * 10000) // length(text) AS symbol_pm,
        (list_max(list_transform(list_distinct(lw),
           x -> len(list_filter(lw, y -> y = x))))::BIGINT * 10000)
          // len(w) AS top_word_pm,
        (len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
          * 10000) // len(w) AS alpha_word_pm
      FROM t)
    SELECT doc_id, n_words, mean_len_pm, symbol_pm, top_word_pm,
      alpha_word_pm,
      (n_words >= 50 AND n_words <= 100000 AND
       mean_len_pm >= 30000 AND mean_len_pm <= 100000 AND
       symbol_pm <= 1000 AND top_word_pm <= 2000 AND
       alpha_word_pm >= 8000) AS passes
    FROM m ORDER BY doc_id"""

  /** Deterministic domain re-weighting (the training-mix epoch
    * multiplier): each source's weight (2+3m)/4 for m = source
    * number mod 4 — i.e. 0.5x, 1.25x, 2x, 2.75x — materializes as
    * floor(w) full copies plus one extra copy for the doc_ids whose
    * murmur3 bucket falls under the fractional part. Down-weighted
    * rows (reps=0) drop. Same codegen'd murmur3 as pipeline_mix, so
    * the replication is stable across reruns, retries, and cluster
    * sizes, and no shuffle happens at all — explode is map-side. */
  val pipelineUpsample: Q = (s, d) => {
    val m = regexp_extract(col("source"), "([0-9]+)", 1).cast("int") % 4
    val w4 = lit(2) + m * lit(3) // weight*4, exact integer
    val whole = floor(w4 / lit(4)).cast("int")
    val frac100 = (w4 * lit(25)) % 100
    val slot = graft.functions.IcebergTransforms.bucket(col("doc_id"), 100)
    Tables.documents(s, d)
      .withColumn("slot", slot)
      .withColumn("reps",
        whole + when(col("slot") < frac100, lit(1)).otherwise(lit(0)))
      .filter(col("reps") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("reps"))).as("copy"))
      .select(col("doc_id"), col("source"), col("copy").cast("int").as("copy"))
      .orderBy(col("doc_id"), col("copy"))
  }

  val pipelineUpsampleSql: String =
    s"""WITH key_hash AS (
      SELECT doc_id, source,
        ${OracleSql.murmurLongCols("doc_id")}
      FROM documents),
    r AS (
      SELECT doc_id, source,
        ((hu & 2147483647) % 100)::INT AS slot,
        (2 + (CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) % 4) * 3)
          AS w4
      FROM key_hash),
    reps AS (
      SELECT doc_id, source,
        (w4 // 4) + (CASE WHEN slot < (w4 * 25) % 100 THEN 1 ELSE 0 END)
          AS n
      FROM r)
    SELECT doc_id, source, unnest(range(1, n + 1))::INT AS copy
    FROM reps
    WHERE n > 0 ORDER BY doc_id, copy"""

  /** Deterministic train/valid/test splitting by a stable content-key
    * hash (90/5/5): the split a document lands in depends only on its
    * key — never on partitioning, row order, or cluster size — so
    * reruns and incremental ingests route the same doc to the same
    * split and nothing leaks from test into a retrained model. Pure
    * projection (the same murmur bucket the partition transforms
    * use), zero shuffle, whole-stage codegen. */
  val pipelineSplit: Q = (s, d) => {
    val slot = graft.functions.IcebergTransforms.bucket(col("doc_id"), 20)
    Tables.documents(s, d)
      .withColumn("slot", slot)
      .withColumn("split",
        when(col("slot") < 18, lit("train"))
          .when(col("slot") === 18, lit("valid"))
          .otherwise(lit("test")))
      .select(col("doc_id"), col("slot"), col("split"))
      .orderBy(col("doc_id"))
  }

  val pipelineSplitSql: String =
    s"""WITH key_hash AS (
      SELECT doc_id, ${OracleSql.murmurLongCols("doc_id")}
      FROM documents)
    SELECT doc_id, ((hu & 2147483647) % 20)::INT AS slot,
      CASE WHEN (hu & 2147483647) % 20 < 18 THEN 'train'
           WHEN (hu & 2147483647) % 20 = 18 THEN 'valid'
           ELSE 'test' END AS split
    FROM key_hash ORDER BY doc_id"""

  /** Interpolated bigram language-model score (the KenLM/CCNet-style
    * fluency filter one order up from ta_unigram_logprob): per
    * document, the mean over word positions i>=2 of
    * ln(0.75 * P(w_i | w_{i-1}) + 0.25 * P(w_i)), with both model
    * terms estimated from the corpus itself. λ = 0.75 is an exact
    * binary fraction, so the engines' doubles agree bit-for-bit.
    *
    * Scale design: bigrams come from two array slices zipped inside
    * codegen (no self-join on position); the unigram and bigram count
    * tables are vocabulary-bounded (they broadcast when small, hash-
    * shuffle otherwise), and scoring is one join per table + one
    * partial agg — the same two-phase shape as ta_unigram_logprob. */
  val taBigramLm: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("ws"))
      .filter(size(col("ws")) >= 2)
    val words = docs.select(col("doc_id"), explode(col("ws")).as("w"))
    val bigrams = docs.select(col("doc_id"),
      explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
    val uniFreq = words.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val biFreq = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val tot = words.agg(count(lit(1)).as("t"))
    bigrams
      .join(biFreq, Seq("bg"))
      .join(uniFreq.withColumnRenamed("w", "w1")
        .withColumnRenamed("cu", "c_prev"), Seq("w1"))
      .join(uniFreq.withColumnRenamed("w", "w2")
        .withColumnRenamed("cu", "c_w"), Seq("w2"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(
        lit(0.75) * col("cb").cast("double") / col("c_prev") +
          lit(0.25) * col("c_w").cast("double") / col("t"))), 6)
        .as("bigram_logprob"))
      .orderBy(col("doc_id"))
  }

  val taBigramLmSql: String =
    """WITH docs AS (
         SELECT doc_id,
                regexp_split_to_array(lower(trim(text)), '\s+') AS ws
         FROM documents
         WHERE len(regexp_split_to_array(lower(trim(text)), '\s+')) >= 2),
       words AS (SELECT doc_id, unnest(ws) AS w FROM docs),
       bigrams AS (
         SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2,
                ws[i] || ' ' || ws[i+1] AS bg
         FROM docs, unnest(range(1, len(ws))) AS t(i)),
       uni AS (SELECT w, count(*) AS cu FROM words GROUP BY w),
       bi AS (SELECT bg, count(*) AS cb FROM bigrams GROUP BY bg),
       tot AS (SELECT count(*) AS t FROM words)
       SELECT doc_id,
              round(avg(ln(0.75 * cb::DOUBLE / u1.cu +
                           0.25 * u2.cu::DOUBLE / t)), 6)
                AS bigram_logprob
       FROM bigrams b
       JOIN bi USING (bg)
       JOIN uni u1 ON u1.w = b.w1
       JOIN uni u2 ON u2.w = b.w2
       CROSS JOIN tot
       GROUP BY doc_id ORDER BY doc_id"""

  val queries: Map[String, Q] = Map(
    "pipeline_split" -> pipelineSplit,
    "ta_bigram_lm" -> taBigramLm,
    "ta_normalize" -> taNormalize,
    "ta_bm25" -> taBm25,
    "ta_gopher" -> taGopher,
    "pipeline_upsample" -> pipelineUpsample,
    "pipeline_decontaminate" -> pipelineDecontaminate,
    "pipeline_pack" -> pipelinePack,
    "ta_repetition" -> taRepetition,
    "ta_pii_scrub" -> taPiiScrub,
    "pipeline_mix" -> pipelineMix,
    "ta_ppl_bucket" -> taPplBucket,
    "ta_dsir_weight" -> taDsirWeight,
    "pipeline_classifier" -> pipelineClassifier,
    "ta_unigram_logprob" -> taUnigramLogprob,
    "ta_tokens" -> taTokens,
    "ta_quality" -> taQuality,
    "ta_langid" -> taLangid,
    "ta_fingerprint" -> taFingerprint)

  /** Pure-SQL replica of TextHash.fingerprint for the DuckDB oracle:
    * murmur3_x86_32 of the full (ASCII) text via the same recursive
    * block mix used by the pt_bucket oracle, plus the minimum signed
    * murmur3 over sliding 8-byte windows (two fixed blocks, len-8
    * finalize), combined as (full << 32) | (min & 0xffffffff). */
  val taFingerprintSql: String =
    """WITH RECURSIVE d AS (SELECT doc_id, text AS s FROM documents),
blk AS (
  SELECT doc_id, s, 0::BIGINT AS i, 0::BIGINT AS h, length(s)//4 AS nb FROM d
  UNION ALL
  SELECT doc_id, s, i+1,
    ((((((xor(h, (((((((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | (((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT)) << 13) | ((xor(h, (((((((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | (((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT)) >> 19)) & 4294967295) * 5 + 3864292196) % 4294967296),
    nb
  FROM blk WHERE i < nb),
done AS (SELECT doc_id, s, h, nb FROM blk WHERE i = nb),
tail AS (
  SELECT doc_id, s, h, length(s) AS len,
    CASE length(s) % 4
      WHEN 0 THEN 0 WHEN 1 THEN ord(substr(s, 4*nb+1, 1))
      WHEN 2 THEN ord(substr(s, 4*nb+1, 1)) + ord(substr(s, 4*nb+2, 1))*256
      ELSE ord(substr(s, 4*nb+1, 1)) + ord(substr(s, 4*nb+2, 1))*256 + ord(substr(s, 4*nb+3, 1))*65536
    END AS tk
  FROM done),
mixed AS (
  SELECT doc_id, len, CASE WHEN len % 4 = 0 THEN h
    ELSE xor(h, ((((((((tk)::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | ((((tk)::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT) END AS hm
  FROM tail),
fin AS (
  SELECT doc_id, xor(hm, len) AS f0, xor(f0, f0 >> 16) AS f1,
    ((f1)::HUGEINT * 2246822507 % 4294967296)::BIGINT AS f2, xor(f2, f2 >> 13) AS f3,
    ((f3)::HUGEINT * 3266489909 % 4294967296)::BIGINT AS f4, xor(f4, f4 >> 16) AS hu
  FROM mixed),
full_h AS (
  SELECT doc_id, CASE WHEN hu >= 2147483648 THEN hu - 4294967296 ELSE hu END AS fs
  FROM fin),
win AS (
  SELECT doc_id, text AS s, unnest(range(1, length(text)-6)) AS i
  FROM documents WHERE length(text) >= 8),
wh AS (
  SELECT doc_id,
    (ord(substr(s,i,1)) + ord(substr(s,i+1,1))*256 + ord(substr(s,i+2,1))*65536 + ord(substr(s,i+3,1))*16777216) AS w0,
    (ord(substr(s,i+4,1)) + ord(substr(s,i+5,1))*256 + ord(substr(s,i+6,1))*65536 + ord(substr(s,i+7,1))*16777216) AS w1
  FROM win),
wmix AS (
  SELECT doc_id,
    ((w0)::HUGEINT * 3432918353 % 4294967296)::BIGINT AS p0a,
    ((((((p0a) << 15) | ((p0a) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT AS p0b,
    xor(0::BIGINT, p0b) AS h0a,
    ((((((h0a) << 13) | ((h0a) >> 19)) & 4294967295) * 5 + 3864292196) % 4294967296) AS h0,
    ((w1)::HUGEINT * 3432918353 % 4294967296)::BIGINT AS p1a,
    ((((((p1a) << 15) | ((p1a) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT AS p1b,
    xor(h0, p1b) AS h1a,
    ((((((h1a) << 13) | ((h1a) >> 19)) & 4294967295) * 5 + 3864292196) % 4294967296) AS h1b,
    xor(h1b, 8) AS g0, xor(g0, g0 >> 16) AS g1,
    ((g1)::HUGEINT * 2246822507 % 4294967296)::BIGINT AS g2, xor(g2, g2 >> 13) AS g3,
    ((g3)::HUGEINT * 3266489909 % 4294967296)::BIGINT AS g4, xor(g4, g4 >> 16) AS whu
  FROM wh),
minh AS (
  SELECT doc_id,
    min(CASE WHEN whu >= 2147483648 THEN whu - 4294967296 ELSE whu END) AS m
  FROM wmix GROUP BY doc_id)
SELECT f.doc_id,
  f.fs * 4294967296 +
    (CASE WHEN coalesce(m.m, 2147483647) < 0
      THEN coalesce(m.m, 2147483647) + 4294967296
      ELSE coalesce(m.m, 2147483647) END) AS fingerprint
FROM full_h f LEFT JOIN minh m ON f.doc_id = m.doc_id
ORDER BY f.doc_id"""

  val oracles: Map[String, String] = Map(
    "pipeline_split" -> pipelineSplitSql,
    "ta_bigram_lm" -> taBigramLmSql,
    "ta_normalize" -> taNormalizeSql,
    "ta_bm25" -> taBm25Sql,
    "ta_gopher" -> taGopherSql,
    "pipeline_upsample" -> pipelineUpsampleSql,
    "pipeline_decontaminate" -> pipelineDecontaminateSql,
    "pipeline_pack" -> pipelinePackSql,
    "ta_repetition" -> taRepetitionSql,
    "ta_pii_scrub" -> taPiiScrubSql,
    "pipeline_mix" -> pipelineMixSql,
    "ta_ppl_bucket" -> taPplBucketSql,
    "ta_dsir_weight" -> taDsirWeightSql,
    "pipeline_classifier" -> pipelineClassifierSql,
    "ta_fingerprint" -> taFingerprintSql,
    "ta_unigram_logprob" -> taUnigramLogprobSql,
    "ta_tokens" -> taTokensSql,
    "ta_quality" -> taQualitySql,
    "ta_langid" -> taLangidSql)
}
