package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val wh = Warehouse(spark, TestSpark.sf)

  test("cleaning chain is monotone: each stage only removes rows") {
    val s = wh.staging
    val n0 = s.count()
    val n1 = Clean.dropNulls(s).count()
    val n2 = Clean.dedup(Clean.dropNulls(s)).count()
    val n3 = Clean.dropZeroQty(Clean.dedup(Clean.dropNulls(s))).count()
    val n4 = wh.cleaned.count()
    assert(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 >= n4)
    assert(n4 > 0)
  }

  test("dedup is idempotent") {
    val once = Clean.dedup(Clean.dropNulls(wh.staging))
    assert(Clean.dedup(once).count() === once.count())
  }

  test("cleaned rows satisfy every filter invariant") {
    val bad = wh.cleaned.filter(
      Staging.criticalCols.map(col(_).isNull).reduce(_ || _) ||
        col("quantity") === 0 || col("unit_price") <= 0)
    assert(bad.count() === 0)
  }

  test("filter chain is order-independent (O2): filters before dedup give the same result") {
    val s = wh.staging
    val reordered = Clean.dedup(Clean.dropBadPrice(Clean.dropZeroQty(Clean.dropNulls(s))))
    assert(reordered.count() === wh.cleaned.count())
  }

  test("rowCountGate passes at the fixture retention and fails below the 73.8% floor") {
    val raw = wh.staging.count()
    val cleaned = wh.cleaned.count()
    assert(Clean.rowCountGate(raw, cleaned))
    assert(!Clean.rowCountGate(1000, 737))
    assert(Clean.rowCountGate(1000, 738))
  }
}
