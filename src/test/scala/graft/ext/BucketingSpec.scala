package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {

  test("bucketed lineitem-orders join plans with zero shuffle exchange") {
    val spark = TestSpark.spark
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the assertion is about bucketing,
      // not about the small fixture fitting a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(spark, TestSpark.sf)
      val joined = Bucketing.cojoin(spark)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      // and it still computes the right thing
      val expected = graft.Tables.lineitem(spark, TestSpark.sf).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
    }
  }

  test("stagingBucketed: no exchange on the orderkey join, output identical to staging") {
    val spark = TestSpark.spark
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(spark, TestSpark.sf)
      val bucketed = graft.etl.Staging.stagingBucketed(spark, TestSpark.sf)
      // the whole staging lineage is exchange-free: orderkey join is
      // bucket-local, part/customer/nation would broadcast (forced off
      // here, so assert only on the fact-side hash exchange)
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"orderkey join should be bucket-local:\n$plan")
      // content identical to the parquet-scan build (the oracle-checked path)
      val a = bucketed.collect().map(_.toString).sorted
      val b = graft.etl.Staging.staging(spark, TestSpark.sf).collect().map(_.toString).sorted
      assert(a.sameElements(b), "bucketed staging differs from the parquet-scan staging")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
    }
  }

  test("stagingBucketed without registered tables falls back to the parquet path") {
    val spark = TestSpark.spark
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    val df = graft.etl.Staging.stagingBucketed(spark, TestSpark.sf)
    assert(df.count() === graft.etl.Staging.staging(spark, TestSpark.sf).count())
  }
}
