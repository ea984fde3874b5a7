package graft.ext

import graft.etl.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate variants of the exact [[graft.etl.Quality]] profiling
  * aggregates for the 100 TB profile.
  *
  * `approx_count_distinct` (HyperLogLog++, rsd 2%) replaces the exact
  * `COUNT(DISTINCT)`: the exact form shuffles every distinct value to a
  * single aggregation path, while HLL sketches merge map-side into a few
  * KB per column — a constant-size shuffle regardless of cardinality. The
  * reference's *gates* stay on the exact form ([[graft.etl.Quality.distinctStats]]);
  * this is the profiling-dashboard variant where a 2% error is acceptable.
  * Sketch merge is commutative/associative, so the estimate is
  * deterministic for a given dataset (hash-based, partitioning-independent)
  * — but there is no DuckDB oracle because DuckDB's approx_count_distinct
  * uses a different sketch; ApproxStatsSpec bounds it against the exact
  * counts instead.
  */
object ApproxStats {

  val rsd = 0.02

  def distinctStats(spark: SparkSession, dir: String): DataFrame =
    Warehouse(spark, dir).cleaned.agg(
      approx_count_distinct(col("invoice_no"), rsd).as("n_invoices"),
      approx_count_distinct(col("stock_code"), rsd).as("n_products"),
      approx_count_distinct(col("customer_id"), rsd).as("n_customers"),
      approx_count_distinct(col("country"), rsd).as("n_countries"))
}
