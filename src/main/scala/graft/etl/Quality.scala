package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's verification/quality suite re-expressed as DataFrame
  * queries (reference `scripts/verify_ingestion.py`, SURVEY §2.4/§2.8).
  * Each returns a small, deterministic result (total ORDER BY) so the
  * DuckDB oracle hash-matches.
  *
  * Scale notes: every query here is a full-scan aggregate with map-side
  * partial aggregation — one shuffle of pre-aggregated partials, no
  * driver-side loops. `countDistinct` is exact (the reference's gates need
  * exact counts); the approximate HLL variant is exposed separately in
  * [[graft.ext.ApproxStats]] for the 100 TB profile where a 2% error is a
  * 50x cheaper plan.
  */
object Quality {

  private def stagingAndCleaned(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val s = Staging.staging(spark, dir)
    (s, Clean.cleaned(s))
  }

  /** A1/K5/K8: per-stage row counts stacked with UNION ALL (the reference's
    * stage-metrics + README verification query, `README.md:201-207`). */
  def stageCounts(spark: SparkSession, dir: String): DataFrame = {
    val s = Staging.staging(spark, dir)
    val afterNulls = Clean.dropNulls(s)
    val afterDedup = Clean.dedup(afterNulls)
    val afterQty = Clean.dropZeroQty(afterDedup)
    val afterPrice = Clean.dropBadPrice(afterQty)
    def one(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    one("1_staging", s)
      .unionByName(one("2_not_null", afterNulls))
      .unionByName(one("3_dedup", afterDedup))
      .unionByName(one("4_qty", afterQty))
      .unionByName(one("5_price", afterPrice))
      .orderBy("stage")
  }

  /** A2/A3: distinct cardinalities of the business keys
    * (reference `dags/dag2_clean_validate.py:114-121`). */
  def distinctStats(spark: SparkSession, dir: String): DataFrame = {
    val (_, cleaned) = stagingAndCleaned(spark, dir)
    cleaned.agg(
      countDistinct(col("invoice_no")).as("n_invoices"),
      countDistinct(col("stock_code")).as("n_products"),
      countDistinct(col("customer_id")).as("n_customers"),
      countDistinct(col("country")).as("n_countries"))
  }

  /** A8/E6: null profile — per-column null counts in one pass
    * (reference `scripts/verify_ingestion.py:119-126`). */
  def nullProfile(spark: SparkSession, dir: String): DataFrame = {
    val s = Staging.staging(spark, dir)
    def nulls(c: String) = sum(when(col(c).isNull, 1).otherwise(0)).as(s"null_$c")
    s.agg(nulls("invoice_no"), nulls("stock_code"), nulls("quantity"),
      nulls("invoice_date"), nulls("unit_price"), nulls("customer_id"))
  }

  /** A6: min/max invoice_date profiling
    * (reference `scripts/verify_ingestion.py:91-98`). */
  def dateRange(spark: SparkSession, dir: String): DataFrame = {
    val (_, cleaned) = stagingAndCleaned(spark, dir)
    cleaned.agg(
      min(col("invoice_date")).as("min_date"),
      max(col("invoice_date")).as("max_date"),
      countDistinct(to_date(col("invoice_date"))).as("n_days"))
  }

  /** A7/A10: total revenue + total quantity over the fact
    * (reference `dags/dag3_transform_warehouse.py:151-164`). */
  def revenueTotal(spark: SparkSession, dir: String): DataFrame =
    Transform.factSales(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      coalesce(sum(col("total_amount")), lit(BigDecimal(0))).cast(DecimalType(18, 2)).as("total_revenue"),
      sum(col("quantity")).as("total_quantity"))

  /** D2/A9: duplicate detection report — (invoice, product) groups with >1
    * row in raw staging (reference `scripts/verify_ingestion.py:351-358`). */
  def duplicateGroups(spark: SparkSession, dir: String): DataFrame =
    Staging.staging(spark, dir)
      .groupBy("invoice_no", "stock_code").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).as("n_dup_groups"), sum(col("n")).as("n_dup_rows"))

  /** F5: data-quality rule counts — negative qty (returns, expected),
    * zero/negative prices (reference `scripts/verify_ingestion.py:302-344`). */
  def valueChecks(spark: SparkSession, dir: String): DataFrame =
    Staging.staging(spark, dir).agg(
      sum(when(col("quantity") < 0, 1).otherwise(0)).as("n_negative_qty"),
      sum(when(col("quantity") === 0, 1).otherwise(0)).as("n_zero_qty"),
      sum(when(col("unit_price") === 0, 1).otherwise(0)).as("n_zero_price"),
      sum(when(col("unit_price") < 0, 1).otherwise(0)).as("n_negative_price"))

  /** K4: top-k — top 10 products by revenue, deterministic tiebreak.
    * Catalyst plans orderBy+limit as TakeOrderedAndProject: per-partition
    * heaps + a k-row driver merge, no global sort even at 100 TB. */
  def topProducts(spark: SparkSession, dir: String): DataFrame =
    Transform.factSales(spark, dir)
      .groupBy("product_key").agg(
        sum(col("total_amount")).cast(DecimalType(18, 2)).as("revenue"),
        sum(col("quantity")).as("units"))
      .orderBy(desc("revenue"), asc("product_key")).limit(10)

  /** Monthly sales rollup — the partition-pruning-shaped query the monthly
    * RANGE layout exists for (reference `schema/warehouse_schema.sql:52-95`). */
  def monthlySales(spark: SparkSession, dir: String): DataFrame =
    Transform.factSales(spark, dir)
      .groupBy(year(col("invoice_date")).as("year"), month(col("invoice_date")).as("month"))
      .agg(count(lit(1)).as("n_sales"),
        sum(col("total_amount")).cast(DecimalType(18, 2)).as("revenue"))
      .orderBy("year", "month")

  /** Revenue by country through the customer dimension (exercises the
    * sentinel: null customers land in UNKNOWN). */
  def countrySales(spark: SparkSession, dir: String): DataFrame = {
    val cleaned = Clean.cleaned(Staging.staging(spark, dir))
    val dimC = Transform.dimCustomer(cleaned)
    val fact = Transform.factSales(cleaned,
      Transform.dimProduct(cleaned), dimC, Transform.dimDate(cleaned))
    fact.join(broadcast(dimC), Seq("customer_key"))
      .groupBy("country")
      .agg(count(lit(1)).as("n_sales"),
        sum(col("total_amount")).cast(DecimalType(18, 2)).as("revenue"))
      .orderBy("country")
  }

  /** S9: deterministic sample — first 3 rows by full ordering
    * (reference `scripts/verify_ingestion.py:136-140`). */
  def sampleRows(spark: SparkSession, dir: String): DataFrame =
    Clean.cleaned(Staging.staging(spark, dir))
      .orderBy(Staging.columns.map(col): _*).limit(3)
}
