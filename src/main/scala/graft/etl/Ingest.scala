package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingestion (reference `dags/dag1_ingest_csv.py:70-95` — the
  * pipeline's entry point): explicit DDL schema (S5), coerce-to-null
  * timestamp parsing (S2, pandas `errors='coerce'`), `'nan'`→null customer
  * normalization (S3, the pandas stringification artifact), and the
  * `loaded_at` audit column (E9, `schema/staging_schema.sql:11`).
  *
  * Scale notes: one schema-checked CSV scan, all fixups are narrow
  * per-row expressions inside the scan's codegen stage; the pandas
  * `iterrows` + batched-INSERT machinery (the reference's slowest
  * construct) disappears into the datasource write. Malformed rows are
  * PERMISSIVE-mode coerced exactly like `errors='coerce'`: unparseable
  * timestamps become NULL and flow to the F1 null-drop instead of
  * killing the job.
  */
object Ingest {

  /** Staging DDL (`schema/staging_schema.sql:2-12`) as an explicit
    * StructType — invoice_date lands as STRING first so parsing is an
    * explicit, coercing step (S2), not an ANSI cast failure. */
  val csvSchema: StructType = StructType(Seq(
    StructField("invoice_no", StringType),
    StructField("stock_code", StringType),
    StructField("description", StringType),
    StructField("quantity", IntegerType),
    StructField("invoice_date", StringType),
    StructField("unit_price", DecimalType(10, 2)),
    StructField("customer_id", StringType),
    StructField("country", StringType)))

  val timestampFmt = "yyyy-MM-dd HH:mm:ss"

  /** S1+S2+S3+E9: CSV → typed staging rows. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(csvSchema)
      .csv(path)
      .withColumn("invoice_date",
        try_to_timestamp(col("invoice_date"), lit(timestampFmt)))
      .withColumn("customer_id",
        when(col("customer_id") === "nan" || col("customer_id") === "",
          lit(null)).otherwise(col("customer_id")))
      .withColumn("loaded_at", current_timestamp())

  /** Writes the fixture staging view as the raw CSV the reference ingests:
    * timestamps formatted, null customers as the literal 'nan' pandas
    * produces (so [[readCsv]]'s S3 normalization is genuinely exercised). */
  def dumpCsv(spark: SparkSession, dir: String, outPath: String): Unit =
    Warehouse(spark, dir).staging
      .withColumn("invoice_date", date_format(col("invoice_date"), timestampFmt))
      .withColumn("customer_id", coalesce(col("customer_id"), lit("nan")))
      .write.mode("overwrite").option("header", "true")
      .csv(outPath)

  /** JSONL variant of the ingestion path: same explicit schema and S2
    * coercion; null fields are simply absent in the dump (Spark's JSON
    * writer default) and come back as nulls under the schema. */
  def dumpJson(spark: SparkSession, dir: String, outPath: String): Unit =
    Warehouse(spark, dir).staging
      .withColumn("invoice_date", date_format(col("invoice_date"), timestampFmt))
      .write.mode("overwrite").json(outPath)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(csvSchema).json(path)
      .withColumn("invoice_date",
        try_to_timestamp(col("invoice_date"), lit(timestampFmt)))
      .withColumn("loaded_at", current_timestamp())

  /** ORC variant: fully typed container (decimal/timestamp preserved
    * natively), so the roundtrip needs no parsing step — the format
    * contract alone is what's being exercised. */
  def dumpOrc(spark: SparkSession, dir: String, outPath: String): Unit =
    Warehouse(spark, dir).staging.write.mode("overwrite").orc(outPath)

  def roundtripOrc(spark: SparkSession, dir: String, outPath: String): DataFrame = {
    dumpOrc(spark, dir, outPath)
    spark.read.orc(outPath)
  }

  /** Schema-EVOLUTION ingestion — the long-lived-pipeline reality the
    * reference's fixed DDL sidesteps: batch 1 predates the `country`
    * column, batch 2 carries a new `channel` column. Both land as parquet
    * as-written; `mergeSchema` unifies the footer schemas on read and
    * either batch's missing columns surface as NULL — old batches are
    * never rewritten. At 100 TB this is the only tenable contract:
    * schema changes must not trigger a corpus rewrite, and the unified
    * read stays a plain parquet scan (footer merge is per-file metadata
    * work, pushdown/pruning unaffected).
    *
    * The batch split is deterministic (stock_code parity) so the DuckDB
    * oracle replays the evolution as a UNION of column-projected halves. */
  def evolvedRoundtrip(spark: SparkSession, dir: String, outPath: String): DataFrame = {
    dumpEvolved(spark, dir, outPath)
    spark.read.option("mergeSchema", "true").parquet(s"$outPath/b1", s"$outPath/b2")
  }

  def dumpEvolved(spark: SparkSession, dir: String, outPath: String): Unit = {
    val st = Warehouse(spark, dir).staging
    // total split: try_cast yields null (never throws) on a non-numeric
    // code, and the length fallback makes the predicate NON-NULL for
    // every row — so batch1 ∪ batch2 is exactly the input even if a
    // future source ships alphanumeric stock codes (a bare cast%2 would
    // silently drop such rows into neither batch)
    val codeNum = expr("try_cast(stock_code AS int)")
    val even = coalesce(codeNum % 2 === 0, length(col("stock_code")) % 2 === 0)
    st.filter(even).drop("country")
      .write.mode("overwrite").parquet(s"$outPath/b1")
    st.filter(!even)
      .withColumn("channel",
        concat(lit("web-"), (codeNum % 3).cast("string")))
      .write.mode("overwrite").parquet(s"$outPath/b2")
  }

  def evolvedOracleSql(orderBy: String): String =
    s"""${Oracle.stagingCte},
       | evolved AS (
       |  SELECT invoice_no, stock_code, description, quantity, invoice_date,
       |    unit_price, customer_id, CAST(NULL AS VARCHAR) AS country,
       |    CAST(NULL AS VARCHAR) AS channel
       |  FROM staging
       |  WHERE COALESCE(TRY_CAST(stock_code AS INTEGER) % 2 = 0,
       |                 LENGTH(stock_code) % 2 = 0)
       |  UNION ALL
       |  SELECT invoice_no, stock_code, description, quantity, invoice_date,
       |    unit_price, customer_id, country,
       |    'web-' || CAST(TRY_CAST(stock_code AS INTEGER) % 3 AS VARCHAR) AS channel
       |  FROM staging
       |  WHERE NOT COALESCE(TRY_CAST(stock_code AS INTEGER) % 2 = 0,
       |                     LENGTH(stock_code) % 2 = 0))
       | SELECT invoice_no, stock_code, description, quantity, invoice_date,
       |   CAST(unit_price AS DOUBLE) AS unit_price, customer_id, country, channel
       | FROM evolved ORDER BY $orderBy""".stripMargin
}
