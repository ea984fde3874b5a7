package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: component-level profile of the change feed's content-diff
  * worst case — the rewritten-pair compare — at the 100× fixture's
  * shape (~7M-row file pair, full staging width). Measures, on the
  * SAME pair:
  *
  *  - `scan`: full-width scan of both sides (xxhash64 over every
  *    column, summed — forces the bytes without a shuffle), the floor
  *    any content compare must pay;
  *  - `except2`: the pre-r13 shape — `A.exceptAll(B)` plus
  *    `B.exceptAll(A)`, two wide-row shuffles, four scans;
  *  - `imbalance1`: the r13 shape — ONE signed-count groupBy serving
  *    both directions (two scans, one shuffle, exchange reused);
  *  - `sortout`: ordering the diff output (the query-face cost on top).
  *
  * `sbt "runMain graft.CfProfile <inDir> [factor=100]"` — one JSON
  * line LAST. */
object CfProfile {

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val spark = BenchHarness.session()
    import BenchHarness.timed
    val root = BenchHarness.workRoot(s"graft_cfprof_${factor}x")

    // the fixture pair's shape: one range-clustered file worth of rows
    // (~3 of 25 countries at factor 100 ≈ 7M rows), and its rewrite
    // with one country deleted
    val cleaned = etl.Warehouse(spark, inDir).cleaned
    val copies = spark.range(factor).select(col("id").as("_copy"))
    val (pair, buildSec) = timed {
      val slice = cleaned
        .filter(col("country").isin("NATION_6", "NATION_7", "NATION_8"))
        .crossJoin(copies)
        .withColumn("invoice_no",
          concat(col("invoice_no"), lit("#"), col("_copy")))
        .drop("_copy")
      slice.repartition(1).write.parquet(s"$root/a")
      spark.read.parquet(s"$root/a").filter(col("country") =!= "NATION_7")
        .repartition(1).write.parquet(s"$root/b")
      val a = spark.read.parquet(s"$root/a")
      val b = spark.read.parquet(s"$root/b")
      (a, b, a.count(), b.count())
    }
    val (a, b, na, nb) = pair
    val cols = a.columns.toSeq

    def fullScan(df: DataFrame): Long =
      df.select(xxhash64(cols.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
    val (_, scanSec) = timed { fullScan(a); fullScan(b) }

    val (n2, except2Sec) = timed {
      a.exceptAll(b).count() + b.exceptAll(a).count()
    }

    def imbalance(): (DataFrame, DataFrame) = {
      val excess = a.withColumn("__side", lit(-1L))
        .unionByName(b.withColumn("__side", lit(1L)))
        .groupBy(cols.map(col): _*)
        .agg(sum("__side").as("__imb"))
        .filter(col("__imb") =!= 0L)
        .withColumn("__dup", explode(sequence(lit(1L), abs(col("__imb")))))
      (excess.filter(col("__imb") < 0L).select(cols.map(col): _*),
        excess.filter(col("__imb") > 0L).select(cols.map(col): _*))
    }
    val (n1, imbalance1Sec) = timed {
      val (d, i) = imbalance()
      d.unionByName(i).count()
    }

    val (_, sortOutSec) = timed {
      val (d, i) = imbalance()
      d.unionByName(i).orderBy(cols.map(col): _*)
        .write.mode("overwrite").parquet(s"$root/out")
    }

    require(n1 == n2, s"diff shapes disagree: $n1 vs $n2")
    println(s"""{"metric":"cf_profile_${factor}x","value":$imbalance1Sec,""" +
      s""""unit":"sec","rows_a":$na,"rows_b":$nb,"diff_rows":$n1,""" +
      s""""build_sec":$buildSec,"scan_sec":$scanSec,""" +
      s""""except2_sec":$except2Sec,"imbalance1_sec":$imbalance1Sec,""" +
      s""""sort_out_sec":$sortOutSec}""")
    spark.stop()
  }
}
