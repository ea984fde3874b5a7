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
}
