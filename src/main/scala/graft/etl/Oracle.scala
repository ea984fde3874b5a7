package graft.etl

/** DuckDB oracle SQL fragments, kept textually adjacent to the Spark
  * implementations they mirror. Every `SparkEntry.oracleSql` entry is a
  * standalone statement built as `<CTE prefix> SELECT ...` over the raw
  * parquet-backed tables (lineitem/orders/part/customer/nation/events/
  * documents/embeddings) that the driver registers by name.
  *
  * The staging/cleaning CTEs replay [[Staging.staging]] and [[Clean]]'s
  * lineages exactly (same dirt-injection arithmetic, same DECIMAL(10,2)
  * casts). Dedup is expressed as `SELECT DISTINCT *` here vs keyed
  * `dropDuplicates` in Spark — equivalent on this data because
  * description/country are functionally dependent on the dedup keys and
  * injected duplicates are exact row copies (SURVEY §7.4).
  *
  * Money columns cross the query OUTPUT boundary as DOUBLE on both sides
  * ([[stagingSelectDouble]] here, `SparkEntry.moneyDouble` there): interior
  * arithmetic stays exact DECIMAL, but a decimal leaving the query would
  * hash differently per reader ('910.6' vs '910.60' — the r1 failure mode),
  * while the IEEE double nearest an exact 2-decimal ≤1e9 value is unique
  * and bit-identical across engines.
  */
object Oracle {

  /** Staging-shaped SELECT list with the money column cast to DOUBLE at the
    * output boundary. */
  val stagingSelectDouble: String =
    """invoice_no, stock_code, description, quantity, invoice_date,
      |    CAST(unit_price AS DOUBLE) AS unit_price, customer_id, country""".stripMargin

  /** `WITH staging AS (...)` — mirrors [[Staging.staging]]. */
  val stagingCte: String =
    """WITH base AS (
      |  SELECT l.l_orderkey * 7 + l.l_linenumber AS h,
      |         CAST(o.o_orderkey AS VARCHAR) AS invoice_no0,
      |         CAST(l.l_partkey AS VARCHAR) AS stock_code,
      |         p.p_name AS description,
      |         CAST(l.l_quantity AS INTEGER) AS qty0,
      |         o.o_orderdate AS date0,
      |         CAST(p.p_retailprice AS DECIMAL(10,2)) AS price0,
      |         CAST(o.o_custkey AS VARCHAR) AS cust0,
      |         n.n_name AS country
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN part p ON l.l_partkey = p.p_partkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |), staged AS (
      |  SELECT CASE WHEN h % 101 = 6 THEN NULL ELSE invoice_no0 END AS invoice_no,
      |         stock_code, description,
      |         CASE WHEN h % 101 = 0 THEN NULL
      |              WHEN h % 101 = 2 THEN 0
      |              ELSE qty0 END AS quantity,
      |         CASE WHEN h % 101 = 1 THEN NULL ELSE date0 END AS invoice_date,
      |         CASE WHEN h % 101 = 3 THEN CAST(0 AS DECIMAL(10,2)) ELSE price0 END AS unit_price,
      |         CASE WHEN h % 101 = 4 THEN NULL ELSE cust0 END AS customer_id,
      |         country, h
      |  FROM base
      |), staging AS (
      |  SELECT invoice_no, stock_code, description, quantity, invoice_date,
      |         unit_price, customer_id, country
      |  FROM staged
      |  UNION ALL
      |  SELECT invoice_no, stock_code, description, quantity, invoice_date,
      |         unit_price, customer_id, country
      |  FROM staged WHERE h % 101 = 5
      |)""".stripMargin

  /** Null-drop filter (F1). */
  val notNullPred: String =
    """invoice_no IS NOT NULL AND stock_code IS NOT NULL AND quantity IS NOT NULL
      |    AND invoice_date IS NOT NULL AND unit_price IS NOT NULL""".stripMargin

  /** Fully cleaned staging: F1 -> D1 -> F2 -> F3 (order-independent, SURVEY §2.9 O2). */
  val cleanedCte: String =
    stagingCte + s""", cleaned AS (
      |  SELECT DISTINCT invoice_no, stock_code, description, quantity,
      |         invoice_date, unit_price, customer_id, country
      |  FROM staging
      |  WHERE $notNullPred
      |    AND quantity <> 0 AND unit_price > 0
      |)""".stripMargin

  /** Verification-check booleans — mirrors [[Pipeline.checks]]; appended
    * after [[warehouseCte]]. */
  val checksSelect: String =
    """SELECT check_name, passed FROM (
      |  SELECT '1_staging_rows' AS check_name, COUNT(*) > 0 AS passed FROM staging
      |  UNION ALL SELECT '2_post_clean_nulls',
      |    SUM(CASE WHEN invoice_no IS NULL OR stock_code IS NULL OR quantity IS NULL
      |             OR invoice_date IS NULL OR unit_price IS NULL THEN 1 ELSE 0 END) = 0
      |  FROM cleaned
      |  UNION ALL SELECT '3_value_rules',
      |    SUM(CASE WHEN quantity = 0 OR unit_price <= 0 THEN 1 ELSE 0 END) = 0
      |  FROM cleaned
      |  UNION ALL SELECT '4_dedup_effective', COUNT(*) = 0 FROM (
      |    SELECT invoice_no, stock_code, quantity, invoice_date, unit_price,
      |           COALESCE(customer_id, '') AS ck, COUNT(*) AS n
      |    FROM cleaned GROUP BY 1,2,3,4,5,6 HAVING COUNT(*) > 1)
      |  UNION ALL SELECT '5_consistency_5pct',
      |    (SELECT ABS(a.n - b.n) * 100 <= a.n * 5
      |     FROM (SELECT COUNT(*) AS n FROM cleaned) a,
      |          (SELECT COUNT(*) AS n FROM fact_sales) b)
      |  UNION ALL SELECT '6_freshness_sync',
      |    (SELECT a.d = b.d
      |     FROM (SELECT MAX(CAST(invoice_date AS DATE)) AS d FROM cleaned) a,
      |          (SELECT MAX(CAST(invoice_date AS DATE)) AS d FROM fact_sales) b)
      |) ORDER BY check_name""".stripMargin

  /** Dimensions + fact — mirrors [[Transform]]. */
  val warehouseCte: String =
    cleanedCte + """, dim_product AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY stock_code) AS BIGINT) AS product_key,
      |         stock_code, description
      |  FROM (SELECT stock_code, MAX(description) AS description
      |        FROM cleaned GROUP BY stock_code)
      |), dim_customer AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY customer_id) AS BIGINT) AS customer_key,
      |         customer_id, country
      |  FROM (SELECT customer_id, MAX(country) AS country
      |        FROM cleaned WHERE customer_id IS NOT NULL GROUP BY customer_id
      |        UNION ALL SELECT 'UNKNOWN', 'UNKNOWN')
      |), dim_date AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY date) AS BIGINT) AS date_key, date,
      |         CAST(EXTRACT(year FROM date) AS INTEGER) AS year,
      |         CAST(EXTRACT(month FROM date) AS INTEGER) AS month,
      |         CAST(EXTRACT(day FROM date) AS INTEGER) AS day,
      |         CAST(EXTRACT(quarter FROM date) AS INTEGER) AS quarter,
      |         CAST(EXTRACT(dow FROM date) AS INTEGER) AS day_of_week
      |  FROM (SELECT DISTINCT CAST(invoice_date AS DATE) AS date FROM cleaned)
      |), fact_sales AS (
      |  SELECT s.invoice_no, p.product_key, c.customer_key, d.date_key,
      |         s.invoice_date, s.quantity, s.unit_price,
      |         CAST(s.quantity * s.unit_price AS DECIMAL(12,2)) AS total_amount
      |  FROM cleaned s
      |  JOIN dim_product p ON s.stock_code = p.stock_code
      |  JOIN dim_customer c ON COALESCE(s.customer_id, 'UNKNOWN') = c.customer_id
      |  JOIN dim_date d ON CAST(s.invoice_date AS DATE) = d.date
      |)""".stripMargin
}
