package graft.ext

import graft.TestSpark
import graft.etl.Quality
import org.scalatest.funsuite.AnyFunSuite

class ApproxStatsSpec extends AnyFunSuite {

  test("KMV estimate lands within the sketch's error band of the exact count") {
    val spark = TestSpark.spark
    val exact = Quality.distinctStats(spark, TestSpark.sf).head()
      .getAs[Long]("n_invoices").toDouble
    val kmv = ApproxStats.kmvDistinct(spark, TestSpark.sf).head()
    val est = kmv.getAs[Double]("est_invoices")
    // KMV relative error ~ 1/sqrt(k-2) ≈ 6.3% at k=256; assert 3 sigma
    assert(math.abs(est - exact) <= math.max(1.0, 0.19 * exact),
      s"KMV estimate $est vs exact $exact")
    // determinism: the sketch is a pure function of the value set
    assert(ApproxStats.kmvDistinct(spark, TestSpark.sf).head() === kmv)
  }

  test("approx distinct counts land within 5% of the exact gates") {
    val spark = TestSpark.spark
    val exact = Quality.distinctStats(spark, TestSpark.sf).head()
    val approx = ApproxStats.distinctStats(spark, TestSpark.sf).head()
    for (i <- 0 until exact.length) {
      val e = exact.getLong(i).toDouble
      val a = approx.getLong(i).toDouble
      assert(math.abs(a - e) <= math.max(1.0, 0.05 * e),
        s"col $i: approx $a vs exact $e")
    }
  }
}
