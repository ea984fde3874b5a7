package graft

import org.apache.spark.sql.functions._

/** Dev probe: where does the monthly-pruned read's wall go — planning
  * or I/O? Times (warm, second pass) the same one-year aggregation
  * three ways: raw `spark.read.parquet` over exactly the 13 month
  * files, the catalog monthly table (manifest planning + pruning), and
  * the catalog flat table (full scan). */
object HpProbe {
  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val spark = BenchHarness.session()
    val root = BenchHarness.workRoot(s"graft_hpp_${factor}x")
    BenchHarness.manifestCatalog(spark, s"$root/wh")
    def t[A](body: => A): (A, Double) = BenchHarness.timed(body)
    val monthly = s"$root/wh/hp/monthly"
    val flat = s"$root/wh/hp/flat"
    val cleaned = etl.Warehouse(spark, inDir).cleaned
    val copies = spark.range(factor).select(col("id").as("_copy"))
    val fact = cleaned.crossJoin(copies)
      .withColumn("invoice_no",
        concat(col("invoice_no"), lit("#"), col("_copy")))
      .drop("_copy")
    fact.createOrReplaceTempView("hpp_src")
    spark.conf.set("graft.write.splitByPartition", "true")
    spark.sql(s"CREATE TABLE graft.`$monthly` PARTITIONED BY " +
      "(months(invoice_date)) AS SELECT * FROM hpp_src")
    spark.conf.unset("graft.write.splitByPartition")
    ext.Manifests.commitData(fact, flat)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("invoice_date") >= "1995-01-01" &&
        col("invoice_date") < "1996-01-01")
      .groupBy(month(col("invoice_date")))
      .agg(count(lit(1)), sum(col("quantity")),
        max(col("description"))).collect()
    val v = ext.Manifests.latestVersion(spark, monthly).get
    val (specs, segs) = ext.Manifests.partitionedBy(spark, monthly, v).get
    val pv = spark.read.parquet(segs: _*)
    // the REAL 13 files: months of 1995 = 1995*12 .. +11 (+boundary)
    val m0 = 1995 * 12
    val f13 = pv.filter(col("invoice_date_month") >= m0 &&
        col("invoice_date_month") <= m0 + 12)
      .select("file").distinct().collect().map(_.getString(0)).toSeq
    println(s"[probe] 13-file set size: ${f13.size}")
    def run(tag: String)(body: => Unit): Unit = {
      body // cold
      val (_, s2) = t(body)
      println(f"[probe] $tag warm: $s2%.3f s")
    }
    run("raw13")(agg(spark.read.parquet(f13: _*)): Unit)
    run("catalog_monthly")(agg(spark.table(s"graft.`$monthly`")): Unit)
    run("catalog_flat")(agg(spark.table(s"graft.`$flat`")): Unit)
    // planning-only probe: how long does the monthly query take to PLAN?
    val (_, planSec) = t {
      spark.table(s"graft.`$monthly`")
        .filter(col("invoice_date") >= "1995-01-01" &&
          col("invoice_date") < "1996-01-01")
        .queryExecution.executedPlan.toString(): Unit
    }
    println(f"[probe] monthly plan-only: $planSec%.3f s")
    spark.stop()
  }
}
