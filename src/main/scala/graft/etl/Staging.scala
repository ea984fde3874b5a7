package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's `staging_online_retail` table (reference
  * `schema/staging_schema.sql:2-12`), role-played on the TPC-H-ish fixtures
  * per FIXTURES.md §3: one staging row per lineitem, denormalized through
  * orders/part/customer/nation.
  *
  * The fixtures are clean, but the reference's cleaning operators (reference
  * `dags/dag2_clean_validate.py:22-99`: null-drop, dedup, qty!=0, price>0)
  * need dirty rows to act on. We inject them *deterministically* — each row
  * gets `h = l_orderkey*7 + l_linenumber`, and `h % 101` selects a dirt
  * class — so the identical injection is replayed in the DuckDB oracle SQL
  * ([[Oracle.stagingCte]]) and both engines see byte-identical inputs.
  *
  * Dirt classes (h % 101):
  *   0 -> quantity NULL     1 -> invoice_date NULL   2 -> quantity 0
  *   3 -> unit_price 0.00   4 -> customer_id NULL    5 -> exact duplicate row
  *   6 -> invoice_no NULL
  *
  * Scale notes (100 TB): the 5-way join is lineitem (fact-sized) against
  * orders (fact-sized) and three small/medium dims. part/nation broadcast;
  * lineitem⋈orders is the one real shuffle — at cluster scale both sides
  * would be bucketed/pre-partitioned on orderkey so it becomes a local join.
  * Everything else is map-side. unit_price uses `p_retailprice` (an exact
  * 2-decimal value) cast to DECIMAL(10,2), keeping all money arithmetic
  * exact — required both for oracle hash-parity and for drift-free revenue
  * totals at scale (per SURVEY §7.4 decimal-vs-double trap).
  */
object Staging {

  /** Columns the reference null-drops on (F1, reference
    * `dags/dag2_clean_validate.py:27-34`). */
  val criticalCols: Seq[String] =
    Seq("invoice_no", "stock_code", "quantity", "invoice_date", "unit_price")

  /** Dedup keys (D1, reference `dags/dag2_clean_validate.py:48-63`):
    * Description/Country are deliberately NOT keys; null CustomerIDs dedup
    * together (COALESCE to ''). */
  val dedupKeys: Seq[String] =
    Seq("invoice_no", "stock_code", "quantity", "invoice_date", "unit_price", "cust_dedup_key")

  val columns: Seq[String] = Seq(
    "invoice_no", "stock_code", "description", "quantity",
    "invoice_date", "unit_price", "customer_id", "country")

  /** The staging table: fixture join + deterministic dirt injection. */
  def staging(spark: SparkSession, dir: String): DataFrame =
    stagingFrom(spark, dir, Tables.lineitem(spark, dir), Tables.orders(spark, dir))

  /** Bucketing-aware staging build — the opt-in 100 TB amortization path.
    * When lineitem/orders have been registered as bucketed-and-sorted
    * tables ([[graft.ext.Bucketing.writeBucketed]]), consume THOSE for the
    * fact sides: the one real exchange of the staging lineage
    * (lineitem ⋈ orders on orderkey) disappears — bucket i joins bucket i
    * locally — and every downstream stage (clean, dims, fact) inherits the
    * shuffle-free plan. Falls back to the raw-parquet [[staging]] when the
    * bucketed tables are absent, so callers can adopt it unconditionally.
    * Output is identical either way (BucketingSpec asserts equality and
    * the zero-exchange plan shape). */
  def stagingBucketed(spark: SparkSession, dir: String): DataFrame =
    if (spark.catalog.tableExists("lineitem_bucketed") &&
        spark.catalog.tableExists("orders_bucketed"))
      stagingFrom(spark, dir,
        spark.table("lineitem_bucketed"), spark.table("orders_bucketed"))
    else staging(spark, dir)

  private def stagingFrom(spark: SparkSession, dir: String,
      l: DataFrame, o: DataFrame): DataFrame = {
    val p = Tables.part(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)

    // part/customer/nation are dimension-sized -> broadcast; the only
    // shuffle is lineitem |><| orders on orderkey.
    val base = l
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(
        (l("l_orderkey") * lit(7L) + l("l_linenumber")).as("h"),
        o("o_orderkey").cast(StringType).as("invoice_no0"),
        l("l_partkey").cast(StringType).as("stock_code"),
        p("p_name").as("description"),
        l("l_quantity").cast(IntegerType).as("qty0"),
        o("o_orderdate").as("date0"),
        p("p_retailprice").cast(DecimalType(10, 2)).as("price0"),
        o("o_custkey").cast(StringType).as("cust0"),
        n("n_name").as("country"))

    val cls = col("h") % 101
    val staged = base.select(
      when(cls === 6, lit(null)).otherwise(col("invoice_no0")).as("invoice_no"),
      col("stock_code"),
      col("description"),
      when(cls === 0, lit(null))
        .when(cls === 2, lit(0))
        .otherwise(col("qty0")).cast(IntegerType).as("quantity"),
      when(cls === 1, lit(null)).otherwise(col("date0")).as("invoice_date"),
      when(cls === 3, lit(BigDecimal(0)).cast(DecimalType(10, 2)))
        .otherwise(col("price0")).as("unit_price"),
      when(cls === 4, lit(null)).otherwise(col("cust0")).as("customer_id"),
      col("country"),
      col("h"))

    // class 5: emit the row twice (the D1 dedup target). explode of a
    // per-row 1-or-2 element array duplicates in the SAME scan — a
    // self-union would re-run the whole 5-way join for the duplicate
    // branch (two scans of the fact table at 100 TB).
    staged
      .withColumn("copy",
        explode(when(col("h") % 101 === 5, array(lit(1), lit(2)))
          .otherwise(array(lit(1)))))
      .drop("h", "copy")
  }
}
