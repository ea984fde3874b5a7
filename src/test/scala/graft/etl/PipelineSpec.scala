package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("run id follows the reference strftime format (E10)") {
    val id = Pipeline.runId(java.time.Instant.parse("2026-08-12T06:30:00Z"))
    assert(id === "20260812_0630")
  }

  test("all verification checks pass on the fixture and the summary is SUCCESS (Q2-Q5)") {
    val c = Pipeline.checks(spark, sf).collect()
    assert(c.length === 6)
    assert(c.forall(_.getBoolean(1)), c.filterNot(_.getBoolean(1)).map(_.getString(0)).mkString(","))
    val s = Pipeline.runSummary(spark, sf).head()
    assert(s.getAs[String]("status") === "SUCCESS")
    assert(s.getAs[Long]("pct_passed") === 100L)
  }

  test("a throwing stage lands FAILED stage_metrics and pipeline_runs rows before propagating (O5)") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe_fail").toString
    // an empty input dir: the staging read throws inside stage 1
    val bad = java.nio.file.Files.createTempDirectory("graft_pipe_bad_sf").toString
    intercept[Throwable](Pipeline.run(spark, bad, out))
    val stages = spark.read.parquet(s"$out/meta/stage_metrics")
    val failed = stages.filter(col("status") === "FAILED").collect()
    assert(failed.length === 1, s"expected one FAILED stage row, got ${failed.length}")
    assert(failed.head.getAs[String]("stage") === "1_ingest")
    assert(failed.head.getAs[Long]("rows_in") === -1L)
    assert(stages.filter(col("status") === "SUCCESS").count() === 0)
    val runs = spark.read.parquet(s"$out/meta/pipeline_runs")
    assert(runs.count() === 1)
    assert(runs.head().getAs[String]("status") === "FAILED")
    assert(runs.head().getAs[Long]("records_processed") === -1L)
  }

  test("run() writes warehouse + metadata, registers the top-k view, and appends across runs (O1/O5/K6/S8)") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val status = Pipeline.run(spark, sf, out)
    assert(status === "SUCCESS")
    val runs = spark.read.parquet(s"$out/meta/pipeline_runs")
    assert(runs.count() === 1)
    assert(runs.head().getAs[String]("status") === "SUCCESS")
    val stages = spark.read.parquet(s"$out/meta/stage_metrics")
    assert(stages.select("stage").collect().map(_.getString(0)).sorted
      .sameElements(Array("1_ingest", "2_clean", "3_transform", "4_verify")))
    // stage metrics carry the K8 row deltas: clean stage loses rows
    val clean = stages.filter(col("stage") === "2_clean").head()
    assert(clean.getAs[Long]("rows_in") > clean.getAs[Long]("rows_out"))
    val dq = spark.read.parquet(s"$out/meta/data_quality_log")
    assert(dq.count() === 6 && dq.filter(col("status") =!= "PASS").count() === 0)
    // K6 view + K4 top-k
    assert(spark.catalog.tableExists("recent_pipeline_runs"))
    assert(spark.sql("SELECT * FROM recent_pipeline_runs").count() === 1)
    // second run appends (metadata is an append-only log)
    Pipeline.run(spark, sf, out)
    assert(spark.read.parquet(s"$out/meta/pipeline_runs").count() === 2)
    assert(spark.sql("SELECT * FROM recent_pipeline_runs").count() === 2)
  }
}
