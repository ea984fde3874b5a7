package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("stageCounts decrease monotonically through the cleaning chain") {
    val counts = Quality.stageCounts(spark, sf).collect().map(_.getLong(1))
    assert(counts.length === 5)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("consistency check (Q3) holds: fact within 5% of cleaned staging") {
    val r = Quality.consistency(spark, sf).head()
    assert(r.getAs[Boolean]("within_5pct"))
    assert(r.getAs[Long]("diff") === 0L)
  }

  test("freshness check (Q4) holds: staging and fact agree on max date") {
    assert(Quality.freshness(spark, sf).head().getAs[Boolean]("in_sync"))
  }

  test("nullProfile counts the injected dirt classes") {
    val r = Quality.nullProfile(spark, sf).head()
    // dirt classes 0/1/4/6 each hit ~1/101 of rows (h % 101)
    assert(r.getAs[Long]("null_quantity") > 0)
    assert(r.getAs[Long]("null_invoice_date") > 0)
    assert(r.getAs[Long]("null_customer_id") > 0)
    assert(r.getAs[Long]("null_invoice_no") > 0)
    assert(r.getAs[Long]("null_stock_code") === 0)
  }

  test("analyzeStats: one row per staging column, consistent with the dedicated profiles") {
    val rows = Quality.analyzeStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet === Staging.columns.toSet)
    val s = Warehouse(spark, sf).staging
    for (c <- Seq("customer_id", "invoice_no")) {
      val direct = s.agg(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long"),
        countDistinct(col(c))).head()
      assert(rows(c) === ((direct.getLong(0), direct.getLong(1))), s"column $c")
    }
    assert(rows("customer_id")._1 > 0, "dirt injection must show up as nulls")
    rows.values.foreach { case (nulls, ndv) => assert(nulls >= 0 && ndv > 0) }
  }

  test("analyzeStatsKmv: engine (xxhash64) and portable (md5) modes both land in the sketch error band; nulls identical") {
    val exact = Quality.analyzeStats(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def run(): Map[String, (Long, Double)] =
      Quality.analyzeStatsKmv(spark, sf).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val engine = run() // default: xxhash64, no conf set
    spark.conf.set("graft.kmv.portableHash", "true")
    val portable = try run() finally spark.conf.unset("graft.kmv.portableHash")
    for (c <- Staging.columns; m <- Seq("engine" -> engine, "portable" -> portable)) {
      val (mode, got) = m
      assert(got(c)._1 === exact(c)._1, s"$mode null count, column $c")
      val e = exact(c)._2.toDouble
      // k=256 -> ~6.3% rel error; 3 sigma, and exact below k by contract
      assert(math.abs(got(c)._2 - e) <= math.max(1.0, 0.19 * e),
        s"$mode NDV estimate ${got(c)._2} vs exact $e, column $c")
    }
    // the two modes are DIFFERENT hash families: estimates agree in
    // band, sketch content does not (that is the point of the split)
    assert(engine.keySet === portable.keySet)
  }
}
