package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture table readers (see TESTDATA.md / FIXTURES.md §2).
  *
  * Plain parquet scans: Catalyst pushes filters and prunes columns into the
  * scan automatically, so downstream operators should *not* cache or
  * materialize here — every query gets a scan tailored to exactly the
  * columns/rows it touches (`.explain` shows `PushedFilters`/`ReadSchema`).
  * At 100 TB the same code runs unchanged: parquet footer pruning +
  * partition pruning do the heavy lifting; nothing in this layer is
  * driver-bound.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  /** `events.ts` has shipped in two physical spellings across fixture
    * generations, normalized here to session-zoned TimestampType either
    * way (the oracle's `make_timestamp(epoch_ns(ts) // 1000)` is the
    * same normalization: a ns→us truncation on the old fixture, an
    * identity on the new):
    *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it,
    *    so read raw long nanos (legacy conf) and truncate to micros with
    *    integer division (`div`, not `/` — float division would round
    *    through a 53-bit mantissa and corrupt ~1.7e18-scale nanos);
    *  - parquet timestamp[us] (naive): arrives as TIMESTAMP_NTZ; the
    *    cast interprets the wall-clock value in the session zone (UTC
    *    everywhere in this library), matching DuckDB's naive read. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
