package graft.ext

import graft.TestSpark
import graft.etl.Quality
import org.scalatest.funsuite.AnyFunSuite

class ApproxStatsSpec extends AnyFunSuite {

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
