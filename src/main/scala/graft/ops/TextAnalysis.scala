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

  val queries: Map[String, Q] = Map(
    "ta_unigram_logprob" -> taUnigramLogprob,
    "ta_tokens" -> taTokens,
    "ta_quality" -> taQuality,
    "ta_langid" -> taLangid,
    "ta_fingerprint" -> taFingerprint)

  val oracles: Map[String, String] = Map(
    "ta_unigram_logprob" -> taUnigramLogprobSql,
    "ta_tokens" -> taTokensSql,
    "ta_quality" -> taQualitySql,
    "ta_langid" -> taLangidSql)
}
