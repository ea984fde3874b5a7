package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` fixture (vec_id,
  * embedding ARRAY<FLOAT> dim-64, label) — the training-data-pipeline
  * north-star operator (SURVEY §7.5).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    The query set is broadcast, so the plan is one scan of the corpus
  *    with a codegen'd HOF dot product per (query, vector) pair and a
  *    per-query top-k window: at 100 TB the cost is the scan, with no
  *    shuffle of the corpus at all. All arithmetic folds left in DOUBLE
  *    (`zip_with` + `aggregate`), an IEEE-deterministic order the DuckDB
  *    oracle replays bit-identically.
  *  - [[annTopK]]: random-hyperplane LSH (SimHash-for-cosine). Each vector
  *    gets `nTables` independent 8-bit sign codes; vectors sharing a
  *    (table, code) bucket are candidates, verified by exact cosine and
  *    top-k'd. Hyperplanes are seeded-deterministic constants broadcast
  *    with the plan. At scale this replaces the full scan per query with
  *    ~corpus/2^bits bucket probes — the IVF-style trade; recall vs the
  *    brute-force baseline is asserted in SimilaritySpec (no DuckDB oracle:
  *    the hyperplane constants make the SQL replay impractical).
  */
object Similarity {

  val defaultK = 5
  val defaultNQueries = 10
  val dim = 64

  /** LSH shape: recall ≈ 1-(1-p^bits)^tables with p = 1 - θ/π per bit.
    * The fixture corpus is near-isotropic (top-neighbor cosine ≈ 0.3 →
    * p ≈ 0.6), so codes are kept short and tables many (4 bits × 8 tables
    * → ~0.67 expected recall while probing ~half the corpus). A clustered
    * production corpus (top-neighbor cosine ≥ 0.8 → p ≥ 0.8) supports
    * longer codes — 16 bits × 8 tables probes ~corpus/65k per query —
    * which is the knob to turn at 100 TB, exactly like IVF nprobe. */
  val nTables = 8
  val bitsPerTable = 4

  /** Left-fold double dot product of two float arrays — the op order the
    * oracle replays exactly. */
  private def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm2(a: Column): Column = dot(a, a)

  /** Codegen'd dot product over named array columns — the per-pair hot
    * path uses [[graft.functions.VecDot]] (tight loop) instead of the
    * interpreted HOF lambda; identical accumulation order, so
    * oracle-checked sims stay bit-identical. */
  private def vecDot(df: DataFrame, a: String, b: String): Column = {
    graft.functions.VectorExprs.register(df.sparkSession)
    expr(s"vec_dot($a, $b)")
  }

  /** (vec_id, embedding, norm): norms are a per-VECTOR quantity — computing
    * them per PAIR would triple the work in every downstream join. The
    * fold order is identical to the oracle's per-pair replay, so the
    * product `q_norm * norm` is bit-identical either way. */
  private def withNorm(emb: DataFrame): DataFrame =
    emb.withColumn("norm", sqrt(vecDot(emb, "embedding", "embedding")))

  /** Exact cosine top-k of every corpus vector against the first
    * `nQueries` vectors (self-pairs excluded). */
  def bruteForceTopK(spark: SparkSession, dir: String,
      k: Int = defaultK, nQueries: Int = defaultNQueries): DataFrame = {
    val emb = withNorm(Tables.embeddings(spark, dir).select("vec_id", "embedding"))
    val queries = emb.filter(col("vec_id") < nQueries)
      .toDF("query_id", "q_embedding", "q_norm")
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id"),
        (vecDot(emb, "q_embedding", "embedding") /
          (col("q_norm") * col("norm"))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
      .orderBy("query_id", "rank")
  }

  /** DuckDB oracle for [[bruteForceTopK]] — identical left-fold arithmetic. */
  def bruteForceOracleSql(k: Int = defaultK, nQueries: Int = defaultNQueries): String = {
    def dotSql(a: String, b: String) =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |   list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))),
         |   (acc, v) -> acc + v)""".stripMargin
    s"""WITH scored AS (
       |  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
       |    ${dotSql("q.embedding", "v.embedding")} /
       |      (sqrt(${dotSql("q.embedding", "q.embedding")}) *
       |       sqrt(${dotSql("v.embedding", "v.embedding")})) AS sim
       |  FROM embeddings q, embeddings v
       |  WHERE q.vec_id < $nQueries AND v.vec_id <> q.vec_id
       |), ranked AS (
       |  SELECT query_id, vec_id, sim,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rank
       |  FROM scored
       |)
       |SELECT query_id, vec_id, sim, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Seeded-deterministic Gaussian hyperplanes (same constants every run —
    * scala.util.Random's generator is spec-fixed). */
  def hyperplanes(seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nTables * bitsPerTable)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** (vec_id, embedding, norm, table, code): `nTables` independent
    * sign-bit codes per vector plus the precomputed norm, one narrow pass
    * (no shuffle). */
  def codes(emb: DataFrame): DataFrame = {
    val planes = hyperplanes()
    val tableCols = (0 until nTables).map { t =>
      val bits = (0 until bitsPerTable).map { b =>
        val plane = array(planes(t * bitsPerTable + b).map(lit): _*)
        when(dot(col("embedding"), plane) >= 0, lit(1L << b)).otherwise(lit(0L))
      }
      bits.reduce(_ + _).as(s"code_$t")
    }
    withNorm(emb)
      .select((col("vec_id") +: col("embedding") +: col("norm") +: tableCols): _*)
      .select(col("vec_id"), col("embedding"), col("norm"),
        posexplode(array((0 until nTables).map(t => col(s"code_$t")): _*)))
      .toDF("vec_id", "embedding", "norm", "table", "code")
  }

  /** Embedding-cosine near-duplicate pairs (the fifth dedup modality of
    * the training-data brief, next to exact/MinHash/SimHash/n-gram): all
    * unordered pairs with cosine >= minCosine, found via the same LSH
    * bucket self-join as [[annTopK]] — candidates share a (table, code)
    * bucket, then exact-cosine verify. No cross join at any scale; recall
    * vs the quadratic baseline is asserted in SimilaritySpec. */
  /** Bucket-population cap for the near-dup self-join: a bucket of n
    * vectors contributes n² candidate pairs, so one degenerate bucket
    * (all-zero embeddings, a padding cluster) would dominate the job at
    * scale. Same guard as [[Dedup.maxBucketSize]]. */
  val maxBucketSize = 2000

  def embeddingNearDups(spark: SparkSession, dir: String,
      minCosine: Double = 0.25): DataFrame = {
    val coded = cachedCodes(spark, dir)
    val smallBuckets = coded.groupBy("table", "code")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize && col("bucket_n") > 1)
      .select("table", "code")
    val inBuckets = coded.join(smallBuckets, Seq("table", "code"))
      .select("vec_id", "embedding", "norm", "table", "code")
    val left = inBuckets.toDF("vec_a", "emb_a", "norm_a", "table", "code")
    val right = inBuckets.toDF("vec_b", "emb_b", "norm_b", "table", "code")
    left.join(right, Seq("table", "code"))
      .filter(col("vec_a") < col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
      .select(col("vec_a"), col("vec_b"),
        (vecDot(coded, "emb_a", "emb_b") /
          (col("norm_a") * col("norm_b"))).as("cosine"))
      .filter(col("cosine") >= minCosine)
      .orderBy("vec_a", "vec_b")
  }

  /** ANN cosine top-k: LSH bucket candidates -> exact cosine -> top-k.
    * Same output shape as [[bruteForceTopK]]; recall asserted in tests. */
  /** Hyperplane codes memoized per (session, dir): annTopK and
    * embeddingNearDups share them. */
  private def cachedCodes(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Memo(spark, dir, "hyperplane_codes")(
      codes(Tables.embeddings(spark, dir).select("vec_id", "embedding")))

  def annTopK(spark: SparkSession, dir: String,
      k: Int = defaultK, nQueries: Int = defaultNQueries): DataFrame = {
    val coded = cachedCodes(spark, dir)
    val queryCodes = coded.filter(col("vec_id") < nQueries)
      .toDF("query_id", "q_embedding", "q_norm", "table", "code")
    // bucket join: corpus side shuffles on (table, code) once; query side
    // is tiny -> broadcast
    val cands = coded.join(broadcast(queryCodes), Seq("table", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "q_embedding", "q_norm", "vec_id", "embedding", "norm")
      .dropDuplicates("query_id", "vec_id")
    val scored = cands.select(
      col("query_id"), col("vec_id"),
      (vecDot(cands, "q_embedding", "embedding") /
        (col("q_norm") * col("norm"))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "sim", "rank")
      .orderBy("query_id", "rank")
  }
}
