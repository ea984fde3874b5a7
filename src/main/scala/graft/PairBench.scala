package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the DECADE CHECK on the hot dedup/similarity pair family —
  * run `minhash_pairs` / `simhash_pairs` / `ngram_jaccard` /
  * `dup_clusters` / `embedding_near_dups` / `near_dups_topk` at 100× the
  * bench fixture (one decade beyond the round-4 10× stretch) to validate
  * the bucket caps and the clustering convergence guard where duplicate
  * families are 100-member cliques.
  *
  * `sbt "runMain graft.PairBench <inDir> [factor=100]"`
  *
  * Only `documents` and `embeddings` inflate (the family touches nothing
  * else); the copy expressions mirror [[Inflate]] exactly (id offsets +
  * per-copy content perturbation), so results compare against the r4
  * stretch record. Besides per-query seconds, prints the BUCKET-CAP HIT
  * STATISTICS the caps' design assumes: how many LSH buckets (and what
  * row fraction) each family dropped as degenerate — the number that
  * tells you when the code space (band count / bits per table) must grow
  * with the corpus. Output: one JSON line. */
object PairBench {

  val family: Seq[String] = Seq("minhash_pairs", "simhash_pairs", "ngram_jaccard",
    "dup_clusters", "embedding_near_dups", "near_dups_topk", "semantic_dedup")

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val spark = BenchHarness.session()

    val dir =
      if (factor <= 1) inDir
      else {
        val out = BenchHarness.workRoot(s"graft_pair_${factor}x")
        val copies = spark.range(factor).select(col("id").as("_copy"))
        spark.read.parquet(s"$inDir/documents.parquet").crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("_copy") * 10000000L)
          .withColumn("text",
            when(col("_copy") === 0, col("text"))
              .otherwise(concat(col("text"), lit(" copy"), col("_copy"))))
          .withColumn("n_chars", length(col("text")))
          .drop("_copy").repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(s"$out/documents.parquet")
        val emb = spark.read.parquet(s"$inDir/embeddings.parquet")
        val vecUnit = emb.agg(coalesce(max("vec_id"), lit(-1L))).head.getLong(0) + 1
        emb.crossJoin(copies)
          .withColumn("vec_id", col("vec_id") + col("_copy") * vecUnit)
          .withColumn("embedding",
            expr("""transform(embedding,
                   |  (x, j) -> x + CAST(_copy AS FLOAT) *
                   |    CAST(pmod(vec_id + j, 7) - 3 AS FLOAT) * CAST(0.001 AS FLOAT))""".stripMargin))
          .drop("_copy").repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
        out
      }

    // ---- bucket-cap hit statistics (the caps' design telemetry) ------
    // null-safe: sum() over an empty census is NULL, and the harness must
    // report zeros for an empty fixture rather than NPE before timing
    def capStats(buckets: DataFrame, sizeCol: String, cap: Int): (Long, Long, Long, Long) = {
      val agg = buckets.agg(
        count(lit(1)).as("n_buckets"),
        coalesce(sum(when(col(sizeCol) > cap, 1L).otherwise(0L)), lit(0L)).as("n_dropped"),
        coalesce(sum(col(sizeCol)), lit(0L)).as("rows_total"),
        coalesce(sum(when(col(sizeCol) > cap, col(sizeCol)).otherwise(0L)), lit(0L))
          .as("rows_dropped")).head()
      (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3))
    }

    // ---- timed family ------------------------------------------------
    var failed = List.empty[String]
    val results = family.map { name =>
      val t0 = System.nanoTime()
      val n = try SparkEntry.queries(name)(spark, dir).count()
        catch { case e: Throwable =>
          System.err.println(s"[pairbench] $name FAILED: ${e.getMessage}")
          failed ::= name; -1L
        }
      (name, (System.nanoTime() - t0) / 1e9, n)
    }
    // census AFTER the family so the expensive shared builds (shingle
    // explosion → signatures, hyperplane codes) are read from the same
    // Memo entries the timed queries filled, not recomputed
    val minhashBuckets = operators.Dedup.lshBucketSizes(
      graft.functions.Memo(spark, dir, "minhash_sigs")(
        operators.Dedup.minhashSignatures(operators.Dedup.corpusWithDups(spark, dir))))
    val (mb, mbd, mr, mrd) = capStats(minhashBuckets, "bucket_n", operators.Dedup.maxBucketSize)
    val embBuckets = operators.Similarity.codeBucketSizes(spark, dir)
    val (eb, ebd, er, erd) = capStats(embBuckets, "bucket_n", operators.Similarity.maxBucketSize)
    // semantic-dedup cluster census at the corpus-adaptive k (same Memo
    // entry the timed query filled): clusters over maxClusterPop keep all
    // members unverified, so "dropped" here = vectors the cap sheds
    val semClusters = operators.Similarity.semClusterSizes(spark, dir)
    val (sc, scd, scr, scrd) = capStats(semClusters, "cluster_n", operators.Similarity.maxClusterPop)

    // manual code-width sweep for comparison against the registered
    // ADAPTIVE width (Similarity.adaptiveBits picks 13 bits at this 100×
    // scale): 14 bits ≈ 30 vectors/bucket, candidate volume ~57M not ~1B
    // — 10 bits exhausted /tmp with ~1e9 candidate-pair shuffle spill;
    // near-identical copies agree on ~97.5% of sign bits, so 8 tables
    // keep family recall ≈ 1 even at 14
    val scaledBits = sys.env.getOrElse("SPARK_GRAFT_ANN_BITS", "14").toInt
    val t0s = System.nanoTime()
    val nScaled = operators.Similarity.embeddingNearDupsAt(spark, dir, scaledBits).count()
    val scaledSec = (System.nanoTime() - t0s) / 1e9
    val scaledBuckets = operators.Similarity.codesAt(
        spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding"), scaledBits)
      .groupBy("table", "code").agg(count(lit(1)).as("bucket_n"))
    val (sb, sbd, sr, srd) = capStats(scaledBuckets, "bucket_n", operators.Similarity.maxBucketSize)

    val qs = (results :+ ((s"embedding_near_dups@${scaledBits}bits", scaledSec, nScaled)))
      .map { case (k, sec, rows) =>
      s""""$k":{"sec":$sec,"rows":$rows}""" }.mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"pair_family","factor":$factor,"queries":$qs,""" +
      s""""minhash_buckets":{"total":$mb,"dropped":$mbd,"rows":$mr,"rows_dropped":$mrd},""" +
      s""""embedding_buckets":{"total":$eb,"dropped":$ebd,"rows":$er,"rows_dropped":$erd},""" +
      s""""semantic_clusters":{"total":$sc,"dropped":$scd,"rows":$scr,"rows_dropped":$scrd},""" +
      s""""embedding_buckets_${scaledBits}bits":{"total":$sb,"dropped":$sbd,"rows":$sr,"rows_dropped":$srd},""" +
      s""""failed":$failedJson,"in":"$inDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
