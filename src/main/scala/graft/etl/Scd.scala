package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval builder — the warehouse
  * counterpart of the reference's upsert family (reference
  * `scripts/load_dim_product.py:60-78` keeps only the LATEST attribute
  * value per key; SCD2 keeps the full change HISTORY as validity
  * intervals, the standard production extension of that upsert).
  *
  * Shape: observe an attribute per (key, period), compress consecutive
  * equal observations into `[valid_from, valid_to)` intervals with an
  * `is_current` marker — change-data capture folded into history rows.
  *
  * 100 TB design: one map-side-combined aggregation to (key, period)
  * grain, then a window PARTITIONED BY KEY over that grain (bounded:
  * #periods rows per key, ~80 months here — never the fact table), then a
  * second key-partitioned groupBy for the run compression. Nothing global,
  * no driver state; the expensive input stays at fact grain only for the
  * first aggregate, which combines map-side.
  */
object Scd {

  /** Monthly observed attribute: the lexicographic max of `l_returnflag`
    * per (part, month) — a deterministic discrete attribute with real
    * month-over-month churn in the fixture. */
  private def observed(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(
        col("l_partkey").as("part_key"),
        date_trunc("month", col("l_shipdate")).cast("date").as("month"))
      .agg(max(col("l_returnflag")).as("attr"))

  /** SCD2 history: consecutive months with the same observed attribute
    * collapse into one row. `valid_from` = first month of the run,
    * `valid_to` = first month of the NEXT run (exclusive bound; null for
    * the current run), `n_months` = observed months inside the run. */
  def partHistory(spark: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy("part_key").orderBy("month")
    val marked = observed(spark, dir)
      .withColumn("changed",
        when(lag(col("attr"), 1).over(byKey).isNull
          || lag(col("attr"), 1).over(byKey) =!= col("attr"), 1).otherwise(0))
      .withColumn("version", sum(col("changed")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = marked.groupBy("part_key", "version", "attr")
      .agg(
        min(col("month")).as("valid_from"),
        count(lit(1)).cast("int").as("n_months"))
    val byKeyRun = Window.partitionBy("part_key").orderBy("version")
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byKeyRun))
      .select(
        col("part_key"),
        col("version").cast("int").as("version"),
        col("attr"),
        col("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, 1).otherwise(0).cast("int").as("is_current"),
        col("n_months"))
      .orderBy("part_key", "version")
  }

  def partHistoryOracleSql: String =
    s"""WITH observed AS (
       |  SELECT l_partkey AS part_key,
       |    CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
       |    MAX(l_returnflag) AS attr
       |  FROM lineitem GROUP BY 1, 2),
       | marked AS (
       |  SELECT part_key, month, attr,
       |    CASE WHEN LAG(attr, 1) OVER w IS NULL
       |           OR LAG(attr, 1) OVER w <> attr THEN 1 ELSE 0 END AS changed
       |  FROM observed
       |  WINDOW w AS (PARTITION BY part_key ORDER BY month)),
       | versioned AS (
       |  SELECT part_key, month, attr,
       |    SUM(changed) OVER (PARTITION BY part_key ORDER BY month
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
       |  FROM marked),
       | runs AS (
       |  SELECT part_key, version, attr,
       |    MIN(month) AS valid_from,
       |    CAST(COUNT(*) AS INTEGER) AS n_months
       |  FROM versioned GROUP BY 1, 2, 3)
       | SELECT part_key, CAST(version AS INTEGER) AS version, attr, valid_from,
       |   LEAD(valid_from, 1) OVER (PARTITION BY part_key ORDER BY version) AS valid_to,
       |   CAST(CASE WHEN LEAD(valid_from, 1) OVER (PARTITION BY part_key ORDER BY version)
       |     IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current,
       |   n_months
       | FROM runs ORDER BY part_key, version""".stripMargin
}
