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

  test("sessionize and sessionizeScalable agree on arbitrary event sets (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val spark = TestSpark.spark
    import spark.implicits._
    // events clustered around midnight boundaries — the stitching edge case
    val eventGen = for {
      user <- Gen.choose(1L, 3L)
      // minutes offset around several midnights, including exact-gap spacings
      dayBase <- Gen.choose(0, 2)
      offset <- Gen.choose(-90, 90)
      id <- Gen.choose(1L, 1000000L)
      value <- Gen.choose(0, 9999).map(_ / 100.0)
    } yield (id, new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2026-03-01 00:00:00").getTime +
        dayBase * 86400000L + offset * 60000L), user, value)
    val setGen = Gen.nonEmptyListOf(eventGen)
    val prop = Prop.forAll(setGen) { evs0 =>
      // unique event ids: ties on (ts, event_id) would make the window
      // order — and thus value attribution — legitimately ambiguous
      val evs = evs0.zipWithIndex.map { case ((_, ts, u, v), i) => (i.toLong, ts, u, v) }
      val df = evs.toDF("event_id", "ts", "user_id", "value")
      def canon(out: org.apache.spark.sql.DataFrame) =
        out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getTimestamp(3).getTime, r.getTimestamp(4).getTime, r.getDouble(5))).toSeq.sorted
      canon(Events.sessionize(df, 30)) == canon(Events.sessionizeScalable(df, 30))
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("skew: a bot user owning 90% of events across many days — two-phase equals single-window") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2026-03-01 00:00:00").getTime
    // Bot user 1: 9,000 events at ~5-min cadence with a 45-min silence
    // every 7th step — continuous runs repeatedly straddle midnights, the
    // exact case the (user, day) cut + stitch has to get right.
    var t = base
    val bot = (0 until 9000).map { i =>
      t += (if (i % 7 == 6) 45L else 5L) * 60000L
      (i.toLong, new java.sql.Timestamp(t), 1L, (i % 100) / 10.0)
    }
    // 100 normal users with 10 events each, spread thinly
    val normal = (0 until 1000).map { i =>
      (10000L + i, new java.sql.Timestamp(
        base + (i % 10) * 86400000L + (i / 10) * 1800000L), 2L + i % 100, 1.0)
    }
    val df = (bot ++ normal).toDF("event_id", "ts", "user_id", "value").repartition(32)
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3).getTime, r.getTimestamp(4).getTime, r.getDouble(5))).toSeq.sorted
    val single = canon(Events.sessionize(df, 30))
    val twoPhase = canon(Events.sessionizeScalable(df, 30))
    assert(twoPhase === single)
    // sanity: the bot really did split across many days and sessions
    assert(single.count(_._1 == 1L) > 1000, "fixture should cut the bot into many sessions")
  }

  test("dailyActive day count matches the distinct calendar days present") {
    val days = graft.Tables.events(spark, sf).select(to_date(col("ts"))).distinct().count()
    assert(Events.dailyActive(spark, sf).count() === days)
  }
}
