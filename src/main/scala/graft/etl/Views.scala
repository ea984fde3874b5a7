package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string interface (K6 at engine scope): the reference's users drive
  * everything through SQL (the dag modules are SQL strings; `README.md:199-217`
  * documents verification SQL to paste into psql). Registering the whole
  * warehouse in the session catalog lets those queries run as-is against
  * this engine via `spark.sql(...)` — same names as the reference DDL
  * where one exists (`staging_online_retail`, dims, `fact_sales`).
  *
  * Temp views are METADATA over the cached [[Warehouse]] lineages — no
  * extra materialization; Catalyst plans through them exactly as through
  * the DataFrames.
  */
object Views {

  def registerAll(spark: SparkSession, dir: String): Unit = {
    val wh = Warehouse(spark, dir)
    wh.staging.createOrReplaceTempView("staging_online_retail")
    wh.cleaned.createOrReplaceTempView("cleaned_retail")
    wh.dimProduct.createOrReplaceTempView("dim_product")
    wh.dimCustomer.createOrReplaceTempView("dim_customer")
    wh.dimDate.createOrReplaceTempView("dim_date")
    wh.fact.createOrReplaceTempView("fact_sales")
  }

  /** A reference-style verification query run as a SQL STRING through the
    * catalog (the reference README's revenue-by-quarter shape). */
  def sqlInterface(spark: SparkSession, dir: String): DataFrame = {
    registerAll(spark, dir)
    spark.sql(
      """SELECT d.year, d.quarter,
        |       COUNT(*) AS n_sales,
        |       CAST(CAST(SUM(f.total_amount) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
        |       COUNT(DISTINCT f.invoice_no) AS n_invoices
        |FROM fact_sales f
        |JOIN dim_date d ON f.date_key = d.date_key
        |GROUP BY d.year, d.quarter
        |ORDER BY d.year, d.quarter""".stripMargin)
  }
}
