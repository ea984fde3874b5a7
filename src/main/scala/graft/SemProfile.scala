package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling main for the semantic-dedup decade record: inflates
  * embeddings PairBench-style (same copy expressions), then times the
  * pipeline's two phases separately — the k-means/cell build (memoized
  * by the first call) and the within-cell pair phase (what the PQ
  * prefilter targets) — so an optimization lands against the phase
  * that actually dominates.
  *
  * `sbt "runMain graft.SemProfile <inDir> [factor=100]"` */
object SemProfile {
  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[semprofile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val dir =
      if (factor <= 1) inDir
      else t(s"inflate ${factor}x") {
        val out = java.nio.file.Files
          .createTempDirectory(s"graft_semprof_${factor}x").toString
        val copies = spark.range(factor).select(col("id").as("_copy"))
        val emb = spark.read.parquet(s"$inDir/embeddings.parquet")
        val vecUnit = emb.agg(coalesce(max("vec_id"), lit(-1L))).head.getLong(0) + 1
        emb.crossJoin(copies)
          .withColumn("vec_id", col("vec_id") + col("_copy") * vecUnit)
          .withColumn("embedding",
            expr("""transform(embedding,
                   |  (x, j) -> x + CAST(_copy AS FLOAT) *
                   |    CAST(pmod(vec_id + j, 7) - 3 AS FLOAT) * CAST(0.001 AS FLOAT))""".stripMargin))
          .drop("_copy").repartition(cpus.toInt)
          .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
        out
      }
    val n = t("corpus count") {
      spark.read.parquet(s"$dir/embeddings.parquet").count()
    }
    println(s"[semprofile] n=$n k=${operators.Similarity.semClusters(n)}")
    t("kmeans + cells (build)") {
      operators.Similarity.semClusterSizes(spark, dir).count()
    }
    t("pair phase (memoized cells)") {
      operators.Similarity.semanticDedup(spark, dir).count()
    }
    t("pair phase (2nd run)") {
      operators.Similarity.semanticDedup(spark, dir).count()
    }
    spark.stop()
  }
}
