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

  /** KMV (k-minimum-values) distinct estimator — the approximate sketch
    * that IS oracle-checkable: the k smallest distinct portable hashes are
    * a pure function of the value set (order- and partition-independent),
    * so DuckDB replays the sketch itself, not just a tolerance band.
    * Estimate: (k-1) * H / h_k with H = 2^60 (the hash range), h_k = the
    * k-th smallest hash — standard KMV, ~1/sqrt(k-2) relative error.
    * Plan shape: hash + distinct + TakeOrderedAndProject (per-partition
    * top-k heaps, k-row driver merge) — a constant-size result with no
    * global sort, the same scale story as HLL with a weaker constant. */
  val kmvK = 256

  def kmvDistinct(spark: SparkSession, dir: String, k: Int = kmvK): DataFrame = {
    val hashes = Warehouse(spark, dir).cleaned
      .filter(col("invoice_no").isNotNull)
      .select(graft.operators.Dedup.fastHash60(spark, col("invoice_no")).as("h"))
      .distinct()
      .orderBy("h").limit(k)
    hashes.agg(max(col("h")).as("h_k"), count(lit(1)).as("n_mins"))
      .select(
        col("h_k"), col("n_mins"),
        // fewer than k distinct values -> the sketch is exact
        when(col("n_mins") < k, col("n_mins").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60)) / col("h_k").cast("double"))
          .as("est_invoices"))
  }

  def kmvDistinctOracleSql(k: Int = kmvK): String =
    s"""${graft.etl.Oracle.cleanedCte},
       | mins AS (
       |   SELECT DISTINCT CAST('0x' || substring(md5(invoice_no), 1, 15) AS BIGINT) AS h
       |   FROM cleaned WHERE invoice_no IS NOT NULL
       |   ORDER BY h LIMIT $k)
       | SELECT h_k, n_mins,
       |   CASE WHEN n_mins < $k THEN CAST(n_mins AS DOUBLE)
       |        ELSE ${(k - 1).toDouble} * ${math.pow(2, 60)} / CAST(h_k AS DOUBLE) END
       |     AS est_invoices
       | FROM (SELECT MAX(h) AS h_k, CAST(COUNT(*) AS BIGINT) AS n_mins FROM mins)""".stripMargin
}
