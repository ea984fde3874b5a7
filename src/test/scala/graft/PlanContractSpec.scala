package graft

import graft.etl.Warehouse
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts — the scale properties the build brief grades
  * (pushdown reaches the scan, projection prunes columns, dim joins
  * broadcast, top-k avoids a global sort) asserted as regression tests so
  * a refactor that silently de-optimizes a plan fails CI, not the bench. */
class PlanContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter predicates push down into the parquet scan") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === 42L).select("l_partkey")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(l_orderkey,42)"),
      s"predicate not pushed:\n$plan")
  }

  test("projection prunes unread columns from the scan") {
    val df = Tables.lineitem(spark, sf).select("l_partkey")
    val plan = planOf(df)
    assert(plan.contains("ReadSchema: struct<l_partkey:bigint>"),
      s"scan reads more than the projection:\n$plan")
  }

  test("fact build joins all three dims via broadcast hash join") {
    val plan = planOf(Warehouse(spark, sf).fact)
    // cached plan string may summarize; fall back to the uncached build
    val effective = if (plan.contains("InMemory")) {
      val wh = Warehouse(spark, sf)
      planOf(etl.Transform.factSales(wh.cleaned, wh.dimProduct, wh.dimCustomer, wh.dimDate))
    } else plan
    assert(effective.contains("BroadcastHashJoin"), s"dim joins not broadcast:\n$effective")
    assert(!effective.contains("SortMergeJoin"), "no shuffle join expected in the fact build")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(etl.Quality.topProducts(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"top-k fell back to a global sort:\n$plan")
  }
}
