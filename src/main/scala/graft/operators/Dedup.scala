package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for a training-data pipeline (SURVEY §7.5):
  * exact (content-hash groupBy), MinHash+LSH, SimHash, and n-gram Jaccard
  * verification — all expressed as shuffle-aware DataFrame lineages with no
  * driver-side collection, so the same code runs at 100 TB.
  *
  * The fixture corpus has no duplicates, so the operators take an
  * *injected* corpus ([[corpusWithDups]]): exact copies of every 10th doc
  * and lightly-padded copies of every (10k+5)th doc, both added with offset
  * ids. The injection is plain SQL arithmetic so the DuckDB oracle replays
  * it for the exact path (`SparkEntry.oracleSql("exact_dedup")`); the fuzzy
  * paths (MinHash/SimHash use xxhash64, which DuckDB lacks) are rows-only
  * query entries plus `DedupSpec` planted-pair recovery asserts.
  *
  * Scale notes:
  * - exact dedup = one hash shuffle of (digest -> min id); at 100 TB
  *   group on the digest only (never the text) so shuffle rows are ~48 B.
  * - MinHash: the shingle explode multiplies rows by ~tokens/doc, but the
  *   per-seed `min` aggregates map-side, so the shuffle carries one
  *   32-long signature per doc, not the shingles.
  * - LSH band join is the classic bucket self-join; [[maxBucketSize]]
  *   caps degenerate buckets (boilerplate shingles produce popular band
  *   hashes whose buckets would otherwise join quadratically).
  */
object Dedup {

  val numHashes = 32
  val numBands = 8 // x 4 rows/band: catches Jaccard >~ 0.5 w.h.p.
  val maxBucketSize = 100

  /** Fixture corpus + planted duplicates (replayed in oracle SQL). */
  def corpusWithDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val exact = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val near = docs.filter(col("doc_id") % 10 === 5)
      .select((col("doc_id") + 200000).as("doc_id"),
        concat(col("text"), lit(" zzz extra trailing pad")).as("text"))
    docs.unionByName(exact).unionByName(near)
  }

  /** Exact dedup: md5 content digest -> keep the smallest doc_id.
    * (D1's keep-first contract, applied to opaque content.) */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    corpusWithDups(spark, dir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  /** Distinct 3-token shingles per document (the MinHash feature set). */
  def shingles(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        expr("""explode(array_distinct(transform(
               |  sequence(1, greatest(size(split(text, ' ')) - 2, 1)),
               |  i -> concat_ws(' ', slice(split(text, ' '), i, 3)))))""".stripMargin)
          .as("shingle"))

  /** MinHash signatures: 32 independent permutations approximated by
    * seed-prefixed xxhash64; one map-side-combined min per seed. */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"m_$i"))
    shingles(docs)
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"m_$i")): _*).as("sig"))
  }

  /** LSH banding: hash each band of 4 signature slots, bucket-join docs
    * sharing any (band, hash) bucket. Oversized buckets are dropped before
    * the self-join (skew guard). */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until numBands).map(j =>
      xxhash64(lit(100 + j), col("sig")(j * 4), col("sig")(j * 4 + 1),
        col("sig")(j * 4 + 2), col("sig")(j * 4 + 3)).as(s"b_$j"))
    val banded = sigs.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"),
        posexplode(array((0 until numBands).map(j => col(s"b_$j")): _*)))
      .toDF("doc_id", "band_idx", "band_hash")
    val smallBuckets = banded
      .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucketSize && col("bucket_n") > 1)
    val inBuckets = banded.join(smallBuckets, Seq("band_idx", "band_hash"))
      .select("band_idx", "band_hash", "doc_id")
    val left = inBuckets.toDF("band_idx", "band_hash", "doc_a")
    val right = inBuckets.toDF("band_idx", "band_hash", "doc_b")
    left.join(right, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** MinHash near-dup pairs: LSH candidates filtered by signature
    * agreement (n_match/32 estimates Jaccard; >= 16 ~ J >= 0.5). */
  /** Signatures + candidates memoized per (session, dir): minhashPairs and
    * ngramJaccard share them, and the shingle explosion is the expensive
    * stage. */
  private def cachedSigs(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Memo(spark, dir, "minhash_sigs")(
      minhashSignatures(corpusWithDups(spark, dir)))

  private def cachedCands(spark: SparkSession, dir: String): DataFrame =
    graft.functions.Memo(spark, dir, "lsh_cands")(
      lshCandidates(cachedSigs(spark, dir)))

  def minhashPairs(spark: SparkSession, dir: String, minMatch: Int = 16): DataFrame = {
    val sigs = cachedSigs(spark, dir)
    val cands = cachedCands(spark, dir)
    val sigA = sigs.toDF("doc_a", "sig_a")
    val sigB = sigs.toDF("doc_b", "sig_b")
    cands.join(sigA, "doc_a").join(sigB, "doc_b")
      .withColumn("n_match",
        expr("""aggregate(zip_with(sig_a, sig_b,
               |  (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),
               |  0, (acc, v) -> acc + v)""".stripMargin))
      .filter(col("n_match") >= minMatch)
      .select("doc_a", "doc_b", "n_match")
      .orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard on the LSH candidate pairs (the verify step of
    * MinHash dedup): |A ∩ B| / |A ∪ B| over distinct shingle sets, emitted
    * as exact integer counts. Only candidates are verified — never the
    * full cross product — and shingle sets are materialized ONLY for docs
    * that appear in a candidate pair (left-semi join first): at 100 TB the
    * candidate set is a vanishing fraction of the corpus, so collecting
    * every document's shingle set would dominate the job. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = corpusWithDups(spark, dir)
    val cands = cachedCands(spark, dir)
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .unionByName(cands.select(col("doc_b").as("doc_id"))).distinct()
    val candDocs = docs.join(candIds, Seq("doc_id"), "left_semi")
    val sets = shingles(candDocs).groupBy("doc_id")
      .agg(collect_set(col("shingle")).as("shingle_set"))
    val setA = sets.toDF("doc_a", "set_a")
    val setB = sets.toDF("doc_b", "set_b")
    cands.join(setA, "doc_a").join(setB, "doc_b")
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("set_a"), col("set_b"))).as("n_inter"),
        size(array_union(col("set_a"), col("set_b"))).as("n_union"))
      .filter(col("n_inter") * 4 >= col("n_union")) // J >= 0.25
      .orderBy("doc_a", "doc_b")
  }

  /** 64-bit SimHash: per-token hash bit votes; near-dups share a 16-bit
    * band and have Hamming distance <= 12. Bit votes aggregate map-side
    * (64 int sums), so the shuffle is one 64-int row per doc. */
  def simhash(docs: DataFrame): DataFrame = {
    val votes = (0 until 64).map(i =>
      sum(when(shiftright(col("th"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v_$i"))
    val assembled = (0 until 64).foldLeft(lit(0L)) { (acc, i) =>
      acc.bitwiseOR(shiftleft(when(col(s"v_$i") > 0, lit(1L)).otherwise(lit(0L)), i))
    }
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("th", xxhash64(col("tok")))
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), assembled.as("simhash"))
  }

  /** SimHash near-dup pairs via 4x16-bit band LSH + Hamming verify. */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 12): DataFrame = {
    val hashed = simhash(corpusWithDups(spark, dir))
    val banded = hashed.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("simhash"), j * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("doc_id", "simhash", "band_idx", "band_val")
    val left = banded.toDF("doc_a", "sim_a", "band_idx", "band_val")
    val right = banded.toDF("doc_b", "sim_b", "band_idx", "band_val")
    left.join(right, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }
}
