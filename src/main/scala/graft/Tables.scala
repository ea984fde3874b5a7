package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
