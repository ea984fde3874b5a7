package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("salesRollup: the grand total row equals the sum of the detail rows") {
    val r = Analytics.salesRollup(spark, sf)
    val grand = r.filter(col("year").isNull && col("quarter").isNull).head()
    val detail = r.filter(col("year").isNotNull && col("quarter").isNotNull)
      .agg(sum("n_sales"), sum("revenue")).head()
    assert(grand.getAs[Long]("n_sales") === detail.getLong(0))
    assert(math.abs(grand.getAs[Double]("revenue") - detail.getDouble(1)) < 1e-6)
    // every year subtotal equals the sum of its quarter rows
    val rows = r.collect()
    val subtotals = rows.filter(x => !x.isNullAt(0) && x.isNullAt(1))
      .map(x => x.getInt(0) -> x.getAs[Long]("n_sales")).toMap
    val quarterSums = rows.filter(x => !x.isNullAt(0) && !x.isNullAt(1))
      .groupBy(_.getInt(0)).view.mapValues(_.map(_.getAs[Long]("n_sales")).sum).toMap
    assert(subtotals === quarterSums)
  }

  test("runningRevenue is monotone and ends at the total") {
    val rows = Analytics.runningRevenue(spark, sf).collect()
    assert(rows.nonEmpty)
    val running = rows.map(_.getAs[Double]("running_revenue"))
    assert(running.zip(running.tail).forall { case (a, b) => b >= a - 1e-9 })
    val total = Quality.revenueTotal(spark, sf).head().getAs[Double]("total_revenue")
    assert(math.abs(running.last - total) < 1e-6)
  }

  test("priceQuantiles are ordered and are real price points covering the right mass") {
    val q = Analytics.priceQuantiles(spark, sf).head()
    val (p25, p50, p75) = (q.getDouble(0), q.getDouble(1), q.getDouble(2))
    assert(p25 <= p50 && p50 <= p75)
    val cleaned = Warehouse(spark, sf).cleaned
    val n = cleaned.count()
    // at least a quarter of rows at or below p25; strictly less below it
    assert(cleaned.filter(col("unit_price") <= p25).count() * 4 >= n)
    assert(cleaned.filter(col("unit_price") < p25).count() * 4 < n)
    assert(cleaned.filter(col("unit_price") <= p50).count() * 2 >= n)
  }

  test("countryPriceQuantiles: per-country quantiles ordered and mass-covering") {
    val rows = Analytics.countryPriceQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    val cleaned = Warehouse(spark, sf).cleaned
    rows.take(5).foreach { r =>
      val c = r.getString(0)
      val (p25, p50, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p75, s"country $c quantiles unordered")
      val in = cleaned.filter(col("country") === c)
      val n = in.count()
      assert(in.filter(col("unit_price") <= p50).count() * 2 >= n, s"country $c p50 mass")
      assert(in.filter(col("unit_price") < p50).count() * 2 < n, s"country $c p50 minimality")
    }
    // every country present exactly once
    val countries = cleaned.select("country").distinct().count()
    assert(rows.length.toLong === countries)
  }

  test("fkOrphans is all-zero on the constructively consistent warehouse") {
    val r = Analytics.fkOrphans(spark, sf).head()
    assert(r.getLong(0) === 0 && r.getLong(1) === 0 && r.getLong(2) === 0)
  }

  test("topProductPerCountry: ranks 1..k per country, revenue non-increasing") {
    val rows = Analytics.topProductPerCountry(spark, sf).collect()
    rows.groupBy(_.getAs[String]("country")).foreach { case (c, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq === (1 to byRank.length))
      val revs = byRank.map(_.getAs[Double]("revenue"))
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b - 1e-9 }, s"country $c")
    }
  }

  test("quarterUnpivot is the exact inverse of quarterPivot") {
    val wide = Analytics.quarterPivot(spark, sf).collect()
      .flatMap(r => Seq(
        (r.getString(0), "q1", r.getDouble(1)), (r.getString(0), "q2", r.getDouble(2)),
        (r.getString(0), "q3", r.getDouble(3)), (r.getString(0), "q4", r.getDouble(4))))
      .toSet
    val long = Analytics.quarterUnpivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(long === wide)
  }

  test("salesCube: grouping levels are internally consistent") {
    val rows = Analytics.salesCube(spark, sf).collect()
      .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getInt(1)),
        r.getLong(2), r.getDouble(3), r.getInt(4), r.getInt(5)))
    // exactly one grand-total row, marked by both grouping flags
    val grand = rows.filter(r => r._5 == 1 && r._6 == 1)
    assert(grand.length === 1 && grand.head._1.isEmpty && grand.head._2.isEmpty)
    // per-country subtotals sum to the grand total (counts exactly,
    // revenue to the cent)
    val countrySub = rows.filter(r => r._5 == 0 && r._6 == 1)
    assert(countrySub.map(_._3).sum === grand.head._3)
    assert(math.abs(countrySub.map(_._4).sum - grand.head._4) < 1e-4)
    // cells sum to their country subtotal
    val cells = rows.filter(r => r._5 == 0 && r._6 == 0)
    countrySub.foreach { sub =>
      val mine = cells.filter(_._1 == sub._1)
      assert(mine.map(_._3).sum === sub._3, s"count mismatch for ${sub._1}")
    }
    // and the cube agrees with the independent per-year rollup level
    val yearSub = rows.filter(r => r._5 == 1 && r._6 == 0)
    assert(yearSub.map(_._3).sum === grand.head._3)
  }

  test("dailyDelta: delta equals revenue - prev_revenue, first day NULL") {
    val rows = Analytics.dailyDelta(spark, sf).collect()
    assert(rows.length > 1)
    assert(rows.head.isNullAt(2) && rows.head.isNullAt(3), "first day has no previous")
    rows.tail.zip(rows).foreach { case (cur, prev) =>
      assert(math.abs(cur.getDouble(2) - prev.getDouble(1)) < 1e-9,
        s"prev_revenue must be yesterday's revenue on ${cur.getDate(0)}")
      assert(math.abs(cur.getDouble(3) - (cur.getDouble(1) - cur.getDouble(2))) < 1e-6)
    }
  }

  test("quarterPivot row sums equal countrySales revenue") {
    val piv = Analytics.quarterPivot(spark, sf)
      .select(col("country"),
        (col("q1") + col("q2") + col("q3") + col("q4")).as("total"))
    val cs = Quality.countrySales(spark, sf).select(col("country"), col("revenue"))
    val bad = piv.join(cs, Seq("country"))
      .filter(abs(col("total") - col("revenue")) > 1e-6)
    assert(bad.count() === 0)
    assert(piv.count() === cs.count())
  }
}
