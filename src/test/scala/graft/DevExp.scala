package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch experiment harness for the r18 optimization round (dev-only,
  * not part of any gate): quantifies the single-task base-scan hypothesis
  * — sf parquet tables are one file / one row group, so scan-stage work
  * (PNG encode, tokenize+explode) runs on 1 of N cores — and the win from
  * spreading the narrow input before CPU-heavy per-row work.
  * Run: `sbt "Test/runMain graft.DevExp <sfDir>"`. */
object DevExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[exp] $tag%-46s $s%7.2f s")
      s
    }

    // 1. scan partition counts of the base tables
    for (t <- Seq("documents", "lineitem", "events", "embeddings")) {
      val df = Tables(spark, sfDir, t)
      println(s"[exp] $t scan partitions = ${df.rdd.getNumPartitions}")
    }

    // 2. image synthesis: as-is (single-task encode) vs spread
    val enc = operators.Multimodal.syntheticImages(spark, sfDir)
    time("syntheticImages as-is (cold)") { noop(enc.toDF) }
    time("syntheticImages as-is (warm)") { noop(enc.toDF) }
    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .repartition(32, col("doc_id")).as[Long]
    val spreadEnc = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val (w, h) = (operators.Multimodal.imgWidth(id),
          operators.Multimodal.imgHeight(id))
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = operators.Multimodal.pixelValue(id, x, y)
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        (id, out.toByteArray)
      }
    }
    time("syntheticImages spread32 (cold)") { noop(spreadEnc.toDF) }
    time("syntheticImages spread32 (warm)") { noop(spreadEnc.toDF) }

    // 3. simhash signature pass: as-is vs spread input
    val docs = operators.Dedup.corpusWithDups(spark, sfDir)
    time("simhash sigs as-is (cold)") { noop(operators.Dedup.simhash(docs)) }
    time("simhash sigs as-is (warm)") { noop(operators.Dedup.simhash(docs)) }
    val spreadDocs = docs.repartition(32, col("doc_id"))
    time("simhash sigs spread32 (cold)") { noop(operators.Dedup.simhash(spreadDocs)) }
    time("simhash sigs spread32 (warm)") { noop(operators.Dedup.simhash(spreadDocs)) }

    spark.stop()
  }
}
