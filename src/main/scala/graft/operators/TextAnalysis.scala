package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`
  * (doc_id, text, lang, source, n_chars) — SURVEY §7.5 / builder-prompt
  * extensions: token counting, quality scoring, language ID, document
  * fingerprinting.
  *
  * Everything here is per-row narrow work (no shuffle at all except the
  * final presentation ORDER BY, which only the verification harness needs)
  * — at 100 TB these run at scan speed inside whole-stage codegen; all
  * expressions are built-in higher-order functions, no Scala UDFs.
  */
object TextAnalysis {

  /** Whitespace tokens. The fixture corpus is single-space separated;
    * `split(_, " ")` matches DuckDB `string_split` empty-token semantics
    * exactly (both yield "" for runs of spaces). */
  def tokens(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    split(c, " ")

  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

  /** Quoted stopword list for SQL interpolation — public so every
    * consumer (quality gates, pipeline stages, oracle builders) reads
    * ONE definition. */
  val stopwordSqlList: String = stopwords.map(w => s"'$w'").mkString(", ")

  /** The quality gate's thresholds — defined once; [[qualityScore]],
    * [[graft.operators.Corpus.cleanCorpus]],
    * [[graft.operators.CorpusPipeline.qualityStage]] and their oracle
    * SQL all interpolate these (a tweak here moves every consumer AND
    * every oracle together). */
  val qMinChars = 40
  val qMaxChars = 20000
  val qMinTokens = 8
  val qStopwordDensity = 20 // pass iff n_stopwords * density >= n_tokens

  /** The gate as one SQL boolean over (n_chars, n_tokens, n_stopwords) —
    * valid in both Spark SQL and DuckDB. */
  val qualityGateSql: String =
    s"n_chars >= $qMinChars AND n_chars <= $qMaxChars AND n_tokens >= $qMinTokens" +
      s" AND n_stopwords * $qStopwordDensity >= n_tokens"

  /** BPE-ish pre-tokenization pattern: letter runs, digit runs, and single
    * other non-space chars — the GPT-2-style split shape, kept to a
    * dialect-neutral subset so Java regex and DuckDB RE2 agree. */
  val subwordPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  /** Token/char counts per document: whitespace tokens, a regex subword
    * count ([[subwordPattern]]), and the rough ceil(chars/4)
    * tokens-per-byte estimate. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_tokens"),
      length(col("text")).as("n_chars"),
      length(regexp_replace(col("text"), " ", "")).as("n_alpha"),
      size(expr(s"regexp_extract_all(text, '$subwordPattern', 0)")).as("n_subwords"),
      ceil(length(col("text")) / lit(4.0)).cast("int").as("n_bpe_est"))
      .orderBy("doc_id")

  /** Quality scoring: integer metrics + a deterministic boolean gate
    * (length window, enough tokens, stopword density via cross-multiplied
    * integer arithmetic — no float ratios, so the oracle hash-matches). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_tokens"),
      expr(s"size(filter(split(text, ' '), w -> w IN ($stopwordSqlList)))").as("n_stopwords"),
      length(col("text")).as("n_chars"))
      .withColumn("quality_pass", expr(qualityGateSql))
      .orderBy("doc_id")

  /** Language ID via stopword-profile scoring: count hits against a
    * per-language function-word set, argmax wins (ties break by language
    * code). A real system would use character n-gram profiles; the
    * *operator shape* — a handful of set-membership counts + argmax, all
    * codegen'd per row — is identical. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "is", "in", "that", "it", "for"),
    "fr" -> Seq("le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "y", "de", "un", "una", "es", "que", "por", "para"),
    "de" -> Seq("der", "die", "das", "und", "ein", "ist", "nicht", "mit", "von", "zu"))

  def languageId(spark: SparkSession, dir: String): DataFrame = {
    val scored = langProfiles.toSeq.sortBy(_._1).foldLeft(
      Tables.documents(spark, dir).select(col("doc_id"), col("text"), col("lang").as("labeled_lang"))) {
      case (df, (code, words)) =>
        val list = words.map(w => s"'$w'").mkString(", ")
        df.withColumn(s"score_$code",
          expr(s"size(filter(split(text, ' '), w -> w IN ($list)))"))
    }
    val codes = langProfiles.keys.toSeq.sorted
    val best = codes.map(c => struct(col(s"score_$c").as("score"), lit(c).as("code")))
    scored
      .withColumn("detected", greatest(best: _*))
      .select(
        col("doc_id"), col("labeled_lang"),
        when(col("detected.score") > 0, col("detected.code")).otherwise(lit("und")).as("detected_lang"),
        col("detected.score").as("lang_score"))
      .orderBy("doc_id")
  }

  /** Corpus term statistics — the exact integer core of TF-IDF (tf and df
    * per term; the float idf weighting is a consumer-side multiply so the
    * statistics stay engine-portable). explode + two-level aggregation:
    * the shuffle carries (term, partial counts), never documents. */
  def termStats(spark: SparkSession, dir: String, minDocFreq: Int = 5): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(countDistinct(col("doc_id")).as("doc_freq"), count(lit(1)).as("total_tf"))
      .filter(col("doc_freq") >= minDocFreq)
      .orderBy("term")

  /** Vocabulary size for [[tokenizeIds]]. */
  val vocabSize = 64

  /** Top-`n` terms by (document frequency desc, term asc) — a
    * deterministic corpus-derived vocabulary. Collected to the driver as
    * INDEX METADATA (same contract as the IVF centroids): the encode step
    * needs the whole vocab per row. */
  private def vocab(spark: SparkSession, dir: String, n: Int = vocabSize): Seq[(String, Int)] =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      .orderBy(desc("df"), asc("term"))
      .limit(n)
      .collect().zipWithIndex
      .map { case (r, i) => r.getString(0) -> (i + 1) } // ids 1..V; 0 = UNK

  /** Tokenize-to-ids — the encode step between corpus assembly and
    * training batches: map each whitespace token to its vocabulary id
    * (0 = unknown), report the unknown count and a positional polynomial
    * fingerprint of the id sequence (so the oracle hash-checks the FULL
    * encoded sequence without dumping arrays). Per-row narrow codegen
    * work; the vocabulary is a broadcast-free literal map. */
  def tokenizeIds(spark: SparkSession, dir: String): DataFrame = {
    val entries = vocab(spark, dir).flatMap { case (t, i) => Seq(lit(t), lit(i)) }
    val vocabMap = map(entries: _*)
    encodeWith(spark, dir,
      tk => transform(tk, w => coalesce(element_at(vocabMap, w), lit(0))))
  }

  /** [[tokenizeIds]] at REALISTIC vocab sizes: the same encode, but the
    * vocabulary rides as ONE reference object inside the codegen'd
    * [[graft.functions.VocabLookup]] expression instead of a literal map
    * column — a 50k-entry literal map is 100k expression nodes (analysis
    * blow-up + JVM codegen constant budget), while the reference map is
    * one O(1) hash probe per token and travels to executors once per
    * stage with the serialized plan. Output-identical to [[tokenizeIds]]
    * at equal vocab size (TextAnalysisSpec) and oracle-checked at
    * V=50000 (`tokenize_ids_50k`). */
  def tokenizeIdsBroadcast(spark: SparkSession, dir: String,
      n: Int = vocabSize): DataFrame = {
    // the registry name must identify THIS vocabulary, not just its size:
    // a name keyed only by n would let a second corpus with the same n
    // re-bind the function another in-flight encode is about to resolve
    val fn = s"vocab_lookup_${n}_" +
      org.apache.commons.codec.digest.DigestUtils.md5Hex(dir).take(8)
    graft.functions.VocabExprs.registerVocab(spark, fn, vocab(spark, dir, n).toMap)
    encodeWith(spark, dir, tk => transform(tk, w => call_function(fn, w)))
  }

  private def encodeWith(spark: SparkSession, dir: String,
      encode: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("ids", encode(col("tk")))
      .select(
        col("doc_id"),
        size(col("ids")).as("n_tokens"),
        size(filter(col("ids"), _ === 0)).as("n_unk"),
        expr("""aggregate(ids, CAST(7 AS BIGINT),
               |  (acc, v) -> (acc * 131 + v) % 1000000007)""".stripMargin).as("ids_fp"))
      .orderBy("doc_id")

  def tokenizeIdsOracleSql: String = tokenizeIdsOracleSqlAt(vocabSize)

  def tokenizeIdsOracleSqlAt(n: Int): String =
    s"""WITH df AS (
       |  SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
       |  GROUP BY term),
       | vocab AS (
       |  SELECT term, CAST(row_number() OVER (ORDER BY df DESC, term) AS INTEGER) AS id
       |  FROM df ORDER BY df DESC, term LIMIT $n),
       | toks AS (
       |  SELECT doc_id, i AS ord, tk[i] AS tok
       |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
       |  CROSS JOIN UNNEST(generate_series(1, len(tk))) AS u(i)),
       | ids AS (
       |  SELECT t.doc_id, t.ord, COALESCE(v.id, 0) AS id
       |  FROM toks t LEFT JOIN vocab v ON v.term = t.tok)
       | SELECT doc_id,
       |   CAST(COUNT(*) AS INTEGER) AS n_tokens,
       |   CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_unk,
       |   list_reduce(list_prepend(CAST(7 AS BIGINT), list(CAST(id AS BIGINT) ORDER BY ord)),
       |     (acc, v) -> (acc * 131 + v) % 1000000007) AS ids_fp
       | FROM ids GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Intra-document repetition profile — the Gopher-style "fraction of
    * the document that is repeated n-grams" quality signal standard in
    * pretraining filters (a looping generator or boilerplate-stuffed page
    * repeats itself; natural text mostly doesn't). For n ∈ {2, 5}: total
    * n-gram occurrences, distinct n-grams, and the duplicate fraction as
    * an integer percentage (occurrences beyond each distinct gram's first
    * = total - distinct). Pure per-row array arithmetic — `transform` +
    * `array_distinct` inside whole-stage codegen, NO shuffle (contrast
    * [[graft.operators.Scrub.boilerplateStats]], the cross-document
    * repetition profile, which must shuffle digests) — so at 100 TB this
    * runs at scan speed alongside the other quality gates. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    def grams(n: Int) = expr(
      s"""transform(
         |  sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)),
         |  i -> concat_ws(' ', slice(split(text, ' '), i, $n)))""".stripMargin)
    def stats(n: Int) = Seq(
      size(grams(n)).as(s"n_grams_$n"),
      size(array_distinct(grams(n))).as(s"n_distinct_$n"))
    val df = Tables.documents(spark, dir)
      .select(col("doc_id") +: (stats(2) ++ stats(5)): _*)
    df.select(col("doc_id"),
        col("n_grams_2"), col("n_distinct_2"),
        expr("cast((n_grams_2 - n_distinct_2) * 100 div n_grams_2 as int)").as("dup_pct_2"),
        col("n_grams_5"), col("n_distinct_5"),
        expr("cast((n_grams_5 - n_distinct_5) * 100 div n_grams_5 as int)").as("dup_pct_5"))
      .orderBy("doc_id")
  }

  def repetitionStatsOracleSql: String = {
    def grams(n: Int) =
      s"""list_transform(
         |  generate_series(1, greatest(len(tk) - ${n - 1}, 1)),
         |  i -> array_to_string(list_slice(tk, i, i + ${n - 1}), ' '))""".stripMargin
    s"""SELECT doc_id,
       |  n_grams_2, n_distinct_2,
       |  CAST((n_grams_2 - n_distinct_2) * 100 // n_grams_2 AS INTEGER) AS dup_pct_2,
       |  n_grams_5, n_distinct_5,
       |  CAST((n_grams_5 - n_distinct_5) * 100 // n_grams_5 AS INTEGER) AS dup_pct_5
       | FROM (
       |  SELECT doc_id,
       |    CAST(len(${grams(2)}) AS INTEGER) AS n_grams_2,
       |    CAST(len(list_distinct(${grams(2)})) AS INTEGER) AS n_distinct_2,
       |    CAST(len(${grams(5)}) AS INTEGER) AS n_grams_5,
       |    CAST(len(list_distinct(${grams(5)})) AS INTEGER) AS n_distinct_5
       |  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents))
       | ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprint: polynomial rolling hash over token lengths in
    * modular arithmetic — portable (no engine-specific hash), so the DuckDB
    * oracle replays it with list_reduce. Used as a cheap shard-stable
    * content fingerprint for incremental dedup at scale. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      expr("""aggregate(split(text, ' '),
             |  CAST(7 AS BIGINT),
             |  (acc, w) -> (acc * 31 + length(w) + 1) % 1000000007)""".stripMargin)
        .as("fingerprint"))
      .orderBy("doc_id")

  /** BM25 constants (Robertson k1/b defaults). Every derived double the
    * score needs is computed ONCE here in Scala and interpolated into
    * both engines, so the per-term arithmetic is bit-identical — Scala's
    * `Double.toString` round-trips, and DuckDB parses it back to the
    * same IEEE value. */
  val bm25K1 = 1.2
  val bm25B = 0.75
  private val bm25K1p1 = bm25K1 + 1
  private val bm25OneMinusB = 1 - bm25B

  /** The fixed evaluation query set: (query_id, terms). Terms are drawn
    * from the synthetic corpus vocabulary so every query has matches. */
  val bm25Queries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("spark", "join"),
    1 -> Seq("window", "agg", "batch"),
    2 -> Seq("customer", "query", "value"))

  /** BM25 top-k retrieval — the lexical ranking half of an evaluation /
    * RAG pipeline, beside [[Similarity]]'s vector half. The plan is the
    * inverted-index access path expressed relationally:
    *
    *  1. postings restricted FIRST: explode to (doc, term) and
    *     broadcast-join against the query-term list, so only the
    *     postings of queried terms ever reach an aggregation — on a
    *     100 TB corpus the exploded stream is filtered at scan speed
    *     and everything downstream is proportional to the MATCHED
    *     postings, not the corpus;
    *  2. document frequency per queried term over that restricted set
    *     (exact: the restriction keeps every (doc, term) pair for those
    *     terms), broadcast back;
    *  3. corpus scalars (N, avgdl) from one tiny aggregate, broadcast;
    *  4. per-(query, doc) score = Σ idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
    *     idf = ln(1 + (N−df+0.5)/(df+0.5)), ROUNDED to 4 decimals so the
    *     float sum is stable across summation orders and engines;
    *  5. top-k per query by (score desc, doc_id) — row_number over
    *     #queries partitions, each bounded by the candidate set.
    *
    * All built-in codegen expressions, no UDF, no driver loop. */
  def bm25TopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val scalars = docs.agg(
      count(lit(1)).as("n_docs"),
      avg(size(col("toks"))).as("avgdl"))
    val queryTerms = bm25Queries
      .flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
      .toDF("query_id", "term")
    val postings = docs
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(queryTerms), Seq("term"))
      .groupBy("query_id", "term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
    val dfreq = postings.select("term", "doc_id").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val scored = postings
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(scalars))
      .withColumn("c",
        log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(bm25K1p1)) /
          (col("tf") + lit(bm25K1) *
            (lit(bm25OneMinusB) + lit(bm25B) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("c")), 4).as("score"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** DuckDB oracle for [[bm25TopK]] — same postings restriction, same
    * constants (interpolated from the same Scala doubles), same 4-decimal
    * round. */
  def bm25OracleSql(k: Int = 10): String = {
    val values = bm25Queries
      .flatMap { case (q, ts) => ts.distinct.map(t => s"($q, '$t')") }
      .mkString(", ")
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |), queries(query_id, term) AS (VALUES $values),
       |scalars AS (
       |  SELECT COUNT(*) AS n_docs, AVG(len(toks)) AS avgdl FROM docs
       |), posts AS (
       |  SELECT query_id, term, doc_id, dl, COUNT(*) AS tf FROM (
       |    SELECT d.doc_id, len(d.toks) AS dl, unnest(d.toks) AS term
       |    FROM docs d) p JOIN queries USING (term)
       |  GROUP BY ALL
       |), dfreq AS (
       |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM posts GROUP BY term
       |), scored AS (
       |  SELECT query_id, doc_id,
       |    ROUND(SUM(
       |      ln(CAST(1.0 AS DOUBLE) +
       |        (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))) *
       |      (tf * CAST($bm25K1p1 AS DOUBLE)) /
       |      (tf + CAST($bm25K1 AS DOUBLE) *
       |        (CAST($bm25OneMinusB AS DOUBLE) +
       |         CAST($bm25B AS DOUBLE) * dl / avgdl))), 4) AS score
       |  FROM posts JOIN dfreq USING (term) CROSS JOIN scalars
       |  GROUP BY query_id, doc_id
       |)
       |SELECT query_id, doc_id, score, rank FROM (
       |  SELECT query_id, doc_id, score,
       |    CAST(row_number() OVER (
       |      PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS rank
       |  FROM scored)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }
}
