package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("incremental MV equals the full recompute, cell for cell") {
    val inc = Mv.monthlySalesViaMv(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val full = Quality.monthlySales(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(inc.nonEmpty)
    assert(inc.toSeq === full.toSeq)
  }

  test("CDC refresh equals full recompute after MoR DELETE + UPDATE; history is never rescanned") {
    import spark.implicits._
    import graft.ext.{CountingFileSystem, Dfs, Manifests}
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftcnt.impl", classOf[CountingFileSystem].getName)
    val b = "graftcnt://" + java.nio.file.Files
      .createTempDirectory("graft_mvcdc").toString + "/t"
    // 12 files range-clustered on invoice_date: the feed's pruning
    // unit; DML below touches a narrow customer slice spread thin
    val fact = Warehouse(spark, sf).fact
      .repartitionByRange(12, org.apache.spark.sql.functions.col("invoice_date"))
    Manifests.commitData(fact, b)
    val mv0 = java.nio.file.Files
      .createTempDirectory("graft_mvcdc_mv").toString + "/v0"
    Mv.partialOf(Manifests.readAt(spark, b, 0))
      .write.parquet(mv0)
    // plain-SQL-shaped MoR DML through the Scala primitives
    Manifests.deleteWhereMor(spark, b,
      org.apache.spark.sql.functions.expr("pmod(customer_key, 7) = 3"))
    Manifests.updateWhereMor(spark, b,
      org.apache.spark.sql.functions.expr("pmod(customer_key, 7) = 2"),
      Map("total_amount" ->
        org.apache.spark.sql.functions.expr("total_amount + 1.50")))
    val latest = Manifests.latestVersion(spark, b).get
    val d0 = CountingFileSystem.dataReads.get()
    val inc = Mv.formatted(Mv.applyChangesFrame(spark, mv0,
      Manifests.changesBetween(spark, b, 0, latest))).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val reads = CountingFileSystem.dataReads.get() - d0
    // the refresh may read changed files (MoR: the vectored originals
    // + appended images), never the whole history twice over — a full
    // recompute here costs 12 original + image files; updateWhereMor
    // vectored every file (spread predicate), so the bound is one
    // read per live file + images, NOT 2x+ (diff both sides raw)
    val nFiles = Manifests.files(spark, b, latest).size
    assert(reads <= nFiles + 2,
      s"CDC refresh read $reads data files for a $nFiles-file table — history rescanned")
    val full = Mv.formatted(Mv.partialOf(Manifests.readLatest(spark, b)))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(inc.toSeq === full.toSeq,
      "incremental CDC refresh diverged from the full recompute")
  }

  test("CDC refresh drops a group whose count reaches zero") {
    import spark.implicits._
    val b = java.nio.file.Files
      .createTempDirectory("graft_mvcdc0").toString + "/t"
    import org.apache.spark.sql.functions._
    val rows = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), BigDecimal("10.00")),
      ("b", java.sql.Timestamp.valueOf("2024-01-15 00:00:00"), BigDecimal("5.00")),
      ("c", java.sql.Timestamp.valueOf("2024-02-01 00:00:00"), BigDecimal("7.00")))
      .toDF("invoice_no", "invoice_date", "total_amount")
      .withColumn("total_amount", col("total_amount").cast("decimal(12,2)"))
    graft.ext.Manifests.commitData(rows.repartition(1), b)
    val mv0 = java.nio.file.Files
      .createTempDirectory("graft_mvcdc0_mv").toString + "/v0"
    Mv.partialOf(graft.ext.Manifests.readAt(spark, b, 0)).write.parquet(mv0)
    graft.ext.Manifests.deleteWhereMor(spark, b,
      month(col("invoice_date")) === 1)
    val latest = graft.ext.Manifests.latestVersion(spark, b).get
    val mv1 = Mv.applyChangesFrame(spark, mv0,
      graft.ext.Manifests.changesBetween(spark, b, 0, latest)).collect()
    assert(mv1.length === 1 && mv1.head.getInt(1) === 2,
      s"January (count 0) must leave the MV: ${mv1.toSeq}")
  }

  test("hash split partitions the fact table: batch counts sum to the whole") {
    val batches = Mv.writeBatches(spark, sf)
    assert(batches.size === Mv.nBatches)
    val counts = batches.map(p => spark.read.parquet(p).count())
    assert(counts.forall(_ > 0), s"degenerate split: $counts")
    assert(counts.sum === Warehouse(spark, sf).fact.count())
  }
}
