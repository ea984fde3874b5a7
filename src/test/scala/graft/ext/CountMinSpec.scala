package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("CMS never underestimates, and is near-exact on the fixture's small vocabulary") {
    val rows = CountMin.termEstimates(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (term, trueTf, est) =>
      assert(est >= trueTf, s"'$term': CMS $est underestimates true $trueTf")
    }
    // 31 distinct terms across 4096 cells: collisions within a hash row
    // are rare, so most probes should be EXACT (the overestimate bound
    // e*N/width is loose; this checks the happy path concretely)
    val exact = rows.count { case (_, t, e) => t == e }
    assert(exact * 10 >= rows.length * 8, s"only $exact/${rows.length} probes exact")
  }

  test("sketch size is fixed: at most depth*width counters regardless of corpus") {
    val n = CountMin.sketch(spark, sf).count()
    assert(n <= CountMin.depth.toLong * CountMin.width,
      s"$n counters exceed the ${CountMin.depth}x${CountMin.width} bound")
    // every counter belongs to a valid (row, cell)
    val bad = CountMin.sketch(spark, sf).filter(
      org.apache.spark.sql.functions.col("row") < 0 ||
        org.apache.spark.sql.functions.col("row") >= CountMin.depth ||
        org.apache.spark.sql.functions.col("cell") < 0 ||
        org.apache.spark.sql.functions.col("cell") >= CountMin.width)
    assert(bad.count() === 0)
  }
}
