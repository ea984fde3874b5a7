package graft.ext

import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-Min sketch — the third member of the brief's "novel sketch"
  * family (next to the HLL approximate distinct and the KMV sketch):
  * point-frequency estimation over an unbounded token stream in FIXED
  * memory (`depth × width` counters, here 4 × 1024 longs = 32 KB,
  * regardless of corpus size).
  *
  * Unlike sampled sketches, a CMS is fully DETERMINISTIC: every counter
  * is a plain SUM of hashed increments, so the whole structure — and
  * every point estimate read from it — replays exactly in DuckDB. Build:
  * explode tokens, hash each through `depth` universal-hash rows
  * ([[Dedup.portableHash60]] + the (a·h+b) mod p family the MinHash path
  * uses, shared seeds), and `groupBy (row, cell) count` — the shuffle
  * carries (row, cell) pairs and the result IS the sketch. Estimate:
  * `min` over the term's `depth` cells — never an underestimate
  * (guaranteed: each cell sums the term's true count plus non-negative
  * collision mass; asserted in CountMinSpec), within `ε·N` of truth with
  * the standard (ε = e/width, δ = e^-depth) guarantees.
  *
  * The registered query reads estimates for the corpus's top-terms probe
  * set next to their true counts, so the oracle checks build + readout
  * end to end and the overestimate invariant is visible in the output. */
object CountMin {

  val depth = 4
  val width = 1024

  /** (a, b) per row, from the same fixed LCG family the MinHash seeds
    * use — shared constants, so both engines interpolate identical
    * literals. */
  val rowSeeds: IndexedSeq[(Long, Long)] = {
    var x = 424242424242L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 3 }
    (0 until depth).map(_ => (next() % (Dedup.hashPrime - 1) + 1, next() % Dedup.hashPrime))
  }

  private def cellCol(h: org.apache.spark.sql.Column, row: Int): org.apache.spark.sql.Column = {
    val (a, b) = rowSeeds(row)
    pmod((lit(a) * h + lit(b)) % Dedup.hashPrime, lit(width.toLong))
  }

  private def cellSql(h: String, row: Int): String = {
    val (a, b) = rowSeeds(row)
    s"(($a * $h + $b) % ${Dedup.hashPrime}) % $width"
  }

  /** The sketch as a relation: (row, cell, n) — `depth × width` counters
    * summed over every token occurrence in `documents`. */
  def sketch(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", Dedup.fastHash60(spark, col("tok")) % Dedup.hashPrime)
    toks
      .select(posexplode(array((0 until depth).map(r => cellCol(col("h"), r)): _*)))
      .toDF("row", "cell")
      .groupBy("row", "cell").agg(count(lit(1)).as("n"))
  }

  /** Probe the sketch for the corpus's high-df terms (the [[graft.operators.TextAnalysis]]
    * vocab convention): emit each probe term's TRUE count next to its CMS
    * estimate (min over rows). `cms_est >= true_tf` always holds. */
  def termEstimates(spark: SparkSession, dir: String, nProbes: Int = 32): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val probes = toks.groupBy("tok").agg(count(lit(1)).as("true_tf"))
      .orderBy(desc("true_tf"), asc("tok")).limit(nProbes)
      .withColumn("h", Dedup.fastHash60(spark, col("tok")) % Dedup.hashPrime)
    val cells = probes.select(col("tok"), col("true_tf"),
        posexplode(array((0 until depth).map(r => cellCol(col("h"), r)): _*)))
      .toDF("tok", "true_tf", "row", "cell")
    cells.join(sketch(spark, dir), Seq("row", "cell"))
      .groupBy("tok", "true_tf").agg(min(col("n")).as("cms_est"))
      .select(col("tok").as("term"), col("true_tf"), col("cms_est"))
      .orderBy("term")
  }

  def termEstimatesOracleSql(nProbes: Int = 32): String = {
    val h60 = "CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT)"
    def cellsList(h: String) =
      (0 until depth).map(r => cellSql(h, r)).mkString("[", ", ", "]")
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       | hashed AS (SELECT tok, $h60 % ${Dedup.hashPrime} AS h FROM toks),
       | cm AS (
       |  SELECT r - 1 AS row, cells[r] AS cell, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM (SELECT ${cellsList("h")} AS cells FROM hashed)
       |  CROSS JOIN UNNEST(generate_series(1, $depth)) AS u(r)
       |  GROUP BY 1, 2),
       | probes AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_tf
       |  FROM toks GROUP BY tok ORDER BY true_tf DESC, tok LIMIT $nProbes),
       | ph AS (SELECT tok, true_tf, $h60 % ${Dedup.hashPrime} AS h FROM probes),
       | pc AS (
       |  SELECT tok, true_tf, r - 1 AS row, cells[r] AS cell
       |  FROM (SELECT tok, true_tf, ${cellsList("h")} AS cells FROM ph)
       |  CROSS JOIN UNNEST(generate_series(1, $depth)) AS u(r))
       | SELECT pc.tok AS term, pc.true_tf, MIN(cm.n) AS cms_est
       | FROM pc JOIN cm USING (row, cell)
       | GROUP BY 1, 2 ORDER BY term""".stripMargin
  }
}
