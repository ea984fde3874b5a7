package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus scrubbing operators for a training-data pipeline (SURVEY §7.5
  * extensions): PII redaction and boilerplate (repeated-chunk) detection —
  * the two standard "clean the web dump" passes that run between raw
  * ingestion and dedup in production pretraining pipelines.
  *
  * The fixture corpus contains no PII and no cross-document repetition, so
  * both operators run over deterministic injections the DuckDB oracle
  * replays exactly (the [[Dedup.corpusWithDups]] pattern): PII strings are
  * appended by doc_id arithmetic, repetition comes from the planted
  * duplicate corpus.
  *
  * Scale notes: PII scrubbing is per-row narrow regex work (scan-speed
  * codegen, no shuffle). Boilerplate detection shuffles (chunk-digest,
  * doc_id) pairs only — never text — and aggregates map-side first.
  */
object Scrub {

  /** Dialect-neutral PII patterns (Java regex and DuckDB RE2 agree on
    * this subset: char classes, +, {n}, no lookaround). */
  val emailPattern = "[a-zA-Z0-9._]+@[a-zA-Z0-9.]+"
  val phonePattern = "555-[0-9]{4}"

  /** Fixture corpus + deterministically injected PII: every doc_id % 7 == 1
    * gains an email, every doc_id % 7 == 3 a phone number. */
  def corpusWithPii(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      when(col("doc_id") % 7 === 1,
        concat(col("text"), lit(" contact user"), col("doc_id"), lit("@example.com now")))
        .when(col("doc_id") % 7 === 3,
          concat(col("text"), lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text")).as("text"))

  /** Redact emails and phone numbers; report per-doc counts plus the md5
    * of the scrubbed text (so the oracle hash-checks the full redacted
    * CONTENT, not just the counts, without dumping text). */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    corpusWithPii(spark, dir).select(
      col("doc_id"),
      size(expr(s"regexp_extract_all(text, '$emailPattern', 0)")).as("n_emails"),
      size(expr(s"regexp_extract_all(text, '$phonePattern', 0)")).as("n_phones"),
      md5(regexp_replace(regexp_replace(col("text"), emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>")).as("scrubbed_md5"))
      .orderBy("doc_id")

  def piiScrubOracleSql: String =
    s"""WITH pii AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 7 = 1
       |           THEN text || ' contact user' || doc_id || '@example.com now'
       |         WHEN doc_id % 7 = 3
       |           THEN text || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       |         ELSE text END AS text
       |  FROM documents)
       | SELECT doc_id,
       |   CAST(len(regexp_extract_all(text, '$emailPattern')) AS INTEGER) AS n_emails,
       |   CAST(len(regexp_extract_all(text, '$phonePattern')) AS INTEGER) AS n_phones,
       |   md5(regexp_replace(regexp_replace(text, '$emailPattern', '<EMAIL>', 'g'),
       |     '$phonePattern', '<PHONE>', 'g')) AS scrubbed_md5
       | FROM pii ORDER BY doc_id""".stripMargin

  /** Chunk size (tokens) for boilerplate detection — the "line" unit of
    * line-level dedup, fixed-width here because the fixture text has no
    * newlines. */
  val chunkTokens = 10

  /** (doc_id, chunk) rows: consecutive `chunkTokens`-token windows. */
  private def chunks(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(expr(
        s"""transform(
           |  sequence(0, greatest(cast(ceil(size(split(text, ' ')) / $chunkTokens.0) as int) - 1, 0)),
           |  i -> concat_ws(' ', slice(split(text, ' '), i * $chunkTokens + 1, $chunkTokens)))""".stripMargin))
        .as("chunk"))

  /** Boilerplate profile per document: how many of its fixed-width token
    * chunks also appear (by digest) in at least one OTHER document. The
    * planted duplicate corpus guarantees non-vacuous repetition; integer
    * percentage so the oracle hash-matches. */
  def boilerplateStats(spark: SparkSession, dir: String): DataFrame = {
    val ch = chunks(Dedup.corpusWithDups(spark, dir))
      .select(col("doc_id"), md5(col("chunk")).as("digest"))
    // digest -> number of distinct docs containing it (digest-only shuffle)
    val freq = ch.distinct().groupBy("digest")
      .agg(count(lit(1)).as("n_docs"))
    ch.join(freq, Seq("digest"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_chunks"),
        sum(when(col("n_docs") >= 2, 1).otherwise(0)).cast("int").as("n_boiler"))
      .withColumn("boiler_pct", expr("cast((n_boiler * 100) div n_chunks as int)"))
      .orderBy("doc_id")
  }

  /** Boilerplate STRIPPING — the rewrite counterpart of
    * [[boilerplateStats]] (the C4-style "drop repeated lines" cleanup):
    * remove every fixed-width chunk whose digest appears in more than
    * `maxDocFreq` distinct documents, and emit each document's surviving
    * chunk count plus the md5 of the reassembled text (the oracle checks
    * the full rewritten CONTENT without dumping text).
    *
    * 100 TB shape: only (digest, doc_id, pos) tuples shuffle — the chunk
    * TEXT never leaves its document. Kept positions join back as ints,
    * and reassembly re-slices the original text PER ROW (narrow
    * `transform` over the kept-position array), so the rewrite costs a
    * digest-frequency aggregation + one small join, not a corpus-sized
    * text shuffle. */
  def stripBoilerplate(spark: SparkSession, dir: String, maxDocFreq: Int = 1): DataFrame = {
    val docs = Dedup.corpusWithDups(spark, dir)
    val chunkArr = expr(
      s"""transform(
         |  sequence(0, greatest(cast(ceil(size(split(text, ' ')) / $chunkTokens.0) as int) - 1, 0)),
         |  i -> concat_ws(' ', slice(split(text, ' '), i * $chunkTokens + 1, $chunkTokens)))""".stripMargin)
    val chunked = docs
      .select(col("doc_id"), posexplode(chunkArr).as(Seq("pos", "chunk")))
      .select(col("doc_id"), col("pos"), md5(col("chunk")).as("digest"))
    val rare = chunked.select("doc_id", "digest").distinct()
      .groupBy("digest").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") <= maxDocFreq)
      .select("digest")
    val keptPos = chunked.join(rare, Seq("digest"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("kept"))
    docs.join(keptPos, Seq("doc_id"), "left")
      .withColumn("kept", coalesce(col("kept"), array()))
      .withColumn("chunks", chunkArr)
      .select(
        col("doc_id"),
        size(col("chunks")).as("n_chunks"),
        size(col("kept")).as("n_kept"),
        md5(concat_ws(" ",
          expr("transform(kept, p -> element_at(chunks, p + 1))"))).as("stripped_md5"))
      .orderBy("doc_id")
  }

  def stripBoilerplateOracleSql(corpusCte: String, maxDocFreq: Int = 1): String =
    s"""$corpusCte,
       | toks AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM corpus),
       | ch AS (
       |   SELECT doc_id, i AS pos,
       |     array_to_string(list_slice(tk, i * $chunkTokens + 1, i * $chunkTokens + $chunkTokens), ' ') AS chunk
       |   FROM toks CROSS JOIN UNNEST(generate_series(0,
       |     greatest(CAST(ceil(len(tk) / $chunkTokens.0) AS INTEGER) - 1, 0))) AS u(i)),
       | chd AS (SELECT doc_id, pos, chunk, md5(chunk) AS digest FROM ch),
       | rare AS (SELECT digest FROM (SELECT DISTINCT doc_id, digest FROM chd)
       |   GROUP BY digest HAVING COUNT(*) <= $maxDocFreq),
       | kept AS (
       |   SELECT doc_id, COUNT(*) AS n_kept,
       |     md5(array_to_string(list(chunk ORDER BY pos), ' ')) AS stripped_md5
       |   FROM chd JOIN rare USING (digest)
       |   GROUP BY doc_id),
       | totals AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_chunks FROM chd GROUP BY doc_id)
       | SELECT t.doc_id, t.n_chunks,
       |   CAST(COALESCE(k.n_kept, 0) AS INTEGER) AS n_kept,
       |   COALESCE(k.stripped_md5, md5('')) AS stripped_md5
       | FROM totals t LEFT JOIN kept k USING (doc_id)
       | ORDER BY t.doc_id""".stripMargin

  /** Global KEEP-FIRST chunk dedup — the repeated-SPAN dedup of Lee et
    * al.'s "Deduplicating Training Data Makes Language Models Better"
    * (re-expressed at fixed-width chunk granularity): every repeated
    * chunk keeps exactly ONE occurrence corpus-wide — the first in
    * (doc_id, pos) order — and later occurrences are dropped. Contrast
    * [[stripBoilerplate]], which drops ALL occurrences of any chunk seen
    * in >maxDocFreq docs (including the first): stripping removes
    * boilerplate entirely; keep-first preserves one copy of every span,
    * the semantics a pretraining pipeline wants for content that should
    * stay in the corpus exactly once.
    *
    * 100 TB shape: identical to [[stripBoilerplate]] — only (digest,
    * doc_id, pos) tuples shuffle, and the keep-set is ONE aggregation
    * (min struct per digest, map-side combined); the chunk text never
    * leaves its document, and reassembly re-slices the original text per
    * row from the kept-position ints. */
  def chunkDedupKeepFirst(spark: SparkSession, dir: String): DataFrame = {
    val docs = Dedup.corpusWithDups(spark, dir)
    val chunkArr = expr(
      s"""transform(
         |  sequence(0, greatest(cast(ceil(size(split(text, ' ')) / $chunkTokens.0) as int) - 1, 0)),
         |  i -> concat_ws(' ', slice(split(text, ' '), i * $chunkTokens + 1, $chunkTokens)))""".stripMargin)
    val chunked = docs
      .select(col("doc_id"), posexplode(chunkArr).as(Seq("pos", "chunk")))
      .select(col("doc_id"), col("pos"), md5(col("chunk")).as("digest"))
    // exactly one survivor per digest: the minimum (doc_id, pos) pair
    val keptPos = chunked
      .groupBy("digest")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
      .select(col("first.doc_id").as("doc_id"), col("first.pos").as("pos"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("kept"))
    docs.join(keptPos, Seq("doc_id"), "left")
      .withColumn("kept", coalesce(col("kept"), array()))
      .withColumn("chunks", chunkArr)
      .select(
        col("doc_id"),
        size(col("chunks")).as("n_chunks"),
        size(col("kept")).as("n_kept"),
        md5(concat_ws(" ",
          expr("transform(kept, p -> element_at(chunks, p + 1))"))).as("dedup_md5"))
      .orderBy("doc_id")
  }

  def chunkDedupKeepFirstOracleSql(corpusCte: String): String =
    s"""$corpusCte,
       | toks AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM corpus),
       | ch AS (
       |   SELECT doc_id, i AS pos,
       |     array_to_string(list_slice(tk, i * $chunkTokens + 1, i * $chunkTokens + $chunkTokens), ' ') AS chunk
       |   FROM toks CROSS JOIN UNNEST(generate_series(0,
       |     greatest(CAST(ceil(len(tk) / $chunkTokens.0) AS INTEGER) - 1, 0))) AS u(i)),
       | chd AS (SELECT doc_id, pos, chunk, md5(chunk) AS digest FROM ch),
       | firsts AS (
       |   SELECT doc_id, pos, chunk FROM (
       |     SELECT doc_id, pos, chunk,
       |       row_number() OVER (PARTITION BY digest ORDER BY doc_id, pos) AS rn
       |     FROM chd) WHERE rn = 1),
       | kept AS (
       |   SELECT doc_id, COUNT(*) AS n_kept,
       |     md5(array_to_string(list(chunk ORDER BY pos), ' ')) AS dedup_md5
       |   FROM firsts GROUP BY doc_id),
       | totals AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_chunks FROM chd GROUP BY doc_id)
       | SELECT t.doc_id, t.n_chunks,
       |   CAST(COALESCE(k.n_kept, 0) AS INTEGER) AS n_kept,
       |   COALESCE(k.dedup_md5, md5('')) AS dedup_md5
       | FROM totals t LEFT JOIN kept k USING (doc_id)
       | ORDER BY t.doc_id""".stripMargin

  def boilerplateOracleSql(corpusCte: String): String =
    s"""$corpusCte,
       | toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
       | ch AS (
       |   SELECT doc_id, md5(array_to_string(
       |     list_slice(tk, i * $chunkTokens + 1, i * $chunkTokens + $chunkTokens), ' ')) AS digest
       |   FROM toks CROSS JOIN UNNEST(generate_series(0,
       |     greatest(CAST(ceil(len(tk) / $chunkTokens.0) AS INTEGER) - 1, 0))) AS u(i)),
       | freq AS (SELECT digest, CAST(COUNT(*) AS BIGINT) AS n_docs
       |   FROM (SELECT DISTINCT doc_id, digest FROM ch) GROUP BY digest)
       | SELECT doc_id,
       |   CAST(COUNT(*) AS INTEGER) AS n_chunks,
       |   CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS INTEGER) AS n_boiler,
       |   CAST(CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS INTEGER) * 100
       |     // CAST(COUNT(*) AS INTEGER) AS INTEGER) AS boiler_pct
       | FROM ch JOIN freq USING (digest)
       | GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
