package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val totalEvents = graft.Tables.events(spark, sf).count()

  test("hourlyRollup partitions every event into exactly one bucket") {
    val agg = Events.hourlyRollup(spark, sf).agg(sum("n_events")).head().getLong(0)
    assert(agg === totalEvents)
  }

  test("sessionize covers every event once and respects the 30-minute gap") {
    val sessions = Events.sessionize(spark, sf)
    assert(sessions.agg(sum("n_events")).head().getLong(0) === totalEvents)
    // no session spans a >30-min internal silence; sessions of one user
    // are separated by >30 min: adjacent session_end -> next session_start
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_seq")
    val gaps = sessions
      .withColumn("prev_end", lag("session_end", 1).over(w))
      .filter(col("prev_end").isNotNull)
      .filter(col("session_start") <= col("prev_end") + expr("INTERVAL 30 MINUTES"))
    assert(gaps.count() === 0)
  }

  test("jsonStats covers every event and extracts k for all of them") {
    val js = Events.jsonStats(spark, sf)
    assert(js.agg(sum("n_events")).head().getLong(0) === totalEvents)
    // every props payload carries k (sum_k only counts non-null extracts)
    val extracted = graft.Tables.events(spark, sf)
      .filter(get_json_object(col("props"), "$.k").isNotNull).count()
    assert(extracted === totalEvents)
  }

  test("topUsers are exactly the k largest by total value") {
    val all = Events.sessionize(spark, sf)
      .groupBy("user_id").agg(sum("total_value").as("tv"))
      .orderBy(desc("tv")).limit(10).collect().map(_.getLong(0)).toSet
    val top = Events.topUsers(spark, sf).collect().map(_.getLong(0)).toSet
    assert(top.size === 10)
    // session-level rollup double arithmetic can reorder ties; compare sets loosely
    assert(top.intersect(all).size >= 8)
  }

  test("dailyActive day count matches the distinct calendar days present") {
    val days = graft.Tables.events(spark, sf).select(to_date(col("ts"))).distinct().count()
    assert(Events.dailyActive(spark, sf).count() === days)
  }
}
