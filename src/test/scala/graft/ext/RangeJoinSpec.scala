package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bucketed range join equals the naive inequality join on the fixture") {
    val got = RangeJoin.clickInPurchaseWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive reference: plain inequality join (nested-loop at plan level —
    // fine at fixture scale, the thing the bucketed shape replaces)
    val ev = graft.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("t"))
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("w_user"), unix_timestamp(col("ts")).as("w_start")).distinct()
    val naive = clicks.join(windows,
        col("user_id") === col("w_user") &&
          col("t") >= col("w_start") &&
          col("t") < col("w_start") + RangeJoin.windowHours * 3600L)
      .select("event_id", "user_id", "w_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(naive.nonEmpty, "fixture has no click-in-window pairs (vacuous)")
    assert(got === naive)
  }

  test("each qualifying pair is emitted exactly once (bin replication never duplicates)") {
    val rows = RangeJoin.clickInPurchaseWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.length === rows.distinct.length)
  }

  test("boundary semantics: inclusive start, exclusive end, bin-edge intervals") {
    val spark0 = spark
    import spark0.implicits._
    // interval [100, 200): point 100 in, 199 in, 200 out, 99 out; and a
    // bin-aligned interval [3600, 7200) must not leak into bin 2
    val points = Seq((1L, 99L), (1L, 100L), (1L, 199L), (1L, 200L),
      (1L, 3600L), (1L, 7199L), (1L, 7200L))
      .toDF("k", "t")
    val ivs = Seq((1L, 100L, 200L), (1L, 3600L, 7200L)).toDF("k", "s", "e")
    val got = RangeJoin.rangeJoin(points, ivs, "k", "t", "s", "e", 3600L)
      .select("t", "s").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((100L, 100L), (199L, 100L), (3600L, 3600L), (7199L, 3600L)))
  }
}
