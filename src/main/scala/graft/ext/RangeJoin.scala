package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join — the second "operator Spark lacks" named by the
  * build brief (next to [[AsOfJoin]]): match every point row to every
  * interval row on the same key with `start <= t < end`.
  *
  * Spark's built-in plan for an inequality-only join predicate is a
  * BroadcastNestedLoopJoin — a per-key CROSS PRODUCT filtered after the
  * fact, quadratic in hot keys and a non-starter at 100 TB. The scale
  * shape (preference ladder (a): compose built-ins) is BIN BUCKETING:
  *
  *  - points carry their single bin `floor(t / binWidth)`;
  *  - intervals EXPLODE into every bin they overlap (`sequence` of bin
  *    ids — bounded replication: ceil(len/binWidth) + 1 rows per
  *    interval);
  *  - one hash equi-join on (key, bin), then the exact predicate
  *    filters survivors.
  *
  * A point sits in exactly ONE bin and an interval appears at most once
  * per bin, so a qualifying (point, interval) pair meets exactly once —
  * no post-join dedup. The join is a plain shuffled equi-join
  * (PlanContractSpec asserts no BroadcastNestedLoopJoin survives), and
  * `binWidth` trades replication against bin selectivity exactly like
  * every production interval-join implementation.
  *
  * The registered fixture query joins click events against purchase
  * windows `[ts, ts + 2h)` per user; DuckDB replays it as the plain
  * inequality join, proving the bucketed plan is output-identical to the
  * naive semantics. */
object RangeJoin {

  /** Generic form: `points` has (key, t, ...); `intervals` has
    * (key, start, end, ...) with end exclusive, epoch-second LONG
    * columns. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      t: String, start: String, end: String, binWidthSec: Long): DataFrame = {
    val pts = points.withColumn("_bin", floor(col(t) / binWidthSec))
    val ivs = intervals.withColumn("_bin",
      explode(sequence(
        floor(col(start) / binWidthSec),
        // end is exclusive: a zero-length or bin-aligned end adds no bin
        floor((col(end) - 1) / binWidthSec))))
    pts.join(ivs, Seq(key, "_bin"))
      .filter(col(t) >= col(start) && col(t) < col(end))
      .drop("_bin")
  }

  val windowHours = 2
  val binWidthSec: Long = 3600L

  /** Fixture query: every click inside a `[purchase_ts, +2h)` window of
    * the same user (purchases collapsed to distinct ts first — K3-style
    * uniqueness on the interval side). */
  def clickInPurchaseWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("t"))
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_timestamp(col("ts")).as("w_start")).distinct()
      .withColumn("w_end", col("w_start") + windowHours * 3600L)
    rangeJoin(clicks, windows, "user_id", "t", "w_start", "w_end", binWidthSec)
      .select(col("event_id"), col("user_id"), col("w_start"))
      .orderBy("event_id", "w_start")
  }

  def clickInPurchaseWindowOracleSql: String =
    s"""WITH ev AS (
       |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
       |         user_id, event_type FROM events),
       | clicks AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t
       |   FROM ev WHERE event_type = 'click'),
       | win AS (SELECT DISTINCT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS w_start
       |   FROM ev WHERE event_type = 'purchase')
       | SELECT c.event_id, c.user_id, w.w_start
       | FROM clicks c JOIN win w
       |   ON c.user_id = w.user_id
       |  AND c.t >= w.w_start AND c.t < w.w_start + ${windowHours * 3600}
       | ORDER BY c.event_id, w.w_start""".stripMargin
}
