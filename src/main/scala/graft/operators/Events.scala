package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics over the `events` fixture (ts, user_id,
  * event_type, value, props JSON) — the batch analogues of streaming
  * windows/sessionization (SURVEY §7.5), plus JSON extraction and top-k.
  *
  * Scale notes: hourly rollup and top-k are partial-agg + single shuffle.
  * Sessionization shuffles once on user_id, then both window functions and
  * the session aggregation reuse that partitioning (Catalyst plans one
  * Exchange; sort by (ts, event_id) within user is executor-local).
  * user_id is the natural skew risk at 100 TB — a bot user with 10^9 events
  * lands on one task; mitigation is AQE skew handling or pre-splitting hot
  * users by (user_id, day) and stitching sessions across the cut.
  */
object Events {

  /** Tumbling 1-hour windows x event_type: count + exact DECIMAL total
    * (batch analogue of a watermarked streaming window agg). */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2)).cast(DoubleType).as("total_value"))
      .orderBy("hour", "event_type")

  /** Gap-based sessionization (30-min inactivity): lag marks session
    * starts, a running sum assigns session ids, then per-session rollup.
    * Deterministic tiebreak on (ts, event_id). */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    sessionize(Tables.events(spark, dir), gapMinutes)

  /** DataFrame-level form: any (user_id, ts, event_id, value) input. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr(s"INTERVAL $gapMinutes MINUTES"), 1).otherwise(0))
      .withColumn("session_seq",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2)).cast(DoubleType).as("total_value"))
      .orderBy("user_id", "session_seq")
  }

  /** Skew-safe sessionization — identical output to [[sessionize]] (the
    * oracle checks both against the same SQL), different physical shape:
    *
    * Phase 1 windows over (user_id, day), so a bot user with 10^9 events
    * splits across one task per day instead of landing on one executor —
    * the hot key is cut by the calendar. Phase 2 re-windows over the
    * phase-1 SESSIONS (orders of magnitude fewer rows than events) to
    * stitch sessions that straddle a midnight boundary within the gap.
    * Stitching is exact: within-day sessions are maximal except at cut
    * points, and the same gap rule decides each cut, so the composition
    * equals the single-pass result. Money stays DECIMAL through both
    * phases, DOUBLE at the boundary. */
  def sessionizeScalable(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame =
    sessionizeScalable(Tables.events(spark, dir), gapMinutes)

  /** DataFrame-level form: any (user_id, ts, event_id, value) input. */
  def sessionizeScalable(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gap = expr(s"INTERVAL $gapMinutes MINUTES")
    val byUserDay = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    val daySessions = events
      .withColumn("day", to_date(col("ts")))
      .withColumn("prev_ts", lag("ts", 1).over(byUserDay))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts") > col("prev_ts") + gap, 1).otherwise(0))
      .withColumn("day_seq",
        sum("new_sess").over(byUserDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "day", "day_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        sum(col("value").cast(DecimalType(12, 2))).as("dec_value"))
    val byUser = Window.partitionBy("user_id").orderBy("session_start")
    daySessions
      .withColumn("prev_end", lag("session_end", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_end").isNull || col("session_start") > col("prev_end") + gap, 1).otherwise(0))
      .withColumn("session_seq",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(
        sum(col("n_events")).as("n_events"),
        min("session_start").as("session_start"),
        max("session_end").as("session_end"),
        sum(col("dec_value")).cast(DecimalType(18, 2)).cast(DoubleType).as("total_value"))
      .orderBy("user_id", "session_seq")
  }

  /** JSON property extraction (`props` is a JSON string): real JSON-path
    * parsing on the Spark side; the oracle replays it with a regexp so the
    * check does not depend on DuckDB's json extension. */
  def jsonStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("k").as("sum_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  /** Top-k heavy users by total value — plans as TakeOrderedAndProject
    * (per-partition heaps, k-row driver merge; no global sort at scale). */
  def topUsers(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2))).cast(DecimalType(18, 2)).cast(DoubleType).as("total_value"))
      .orderBy(desc("total_value"), asc("user_id")).limit(k)

  /** Daily active users: exact distinct per calendar day. */
  def dailyActive(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("day")
}
