package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table path for the one genuine shuffle in the staging build:
  * `lineitem ⋈ orders` on orderkey. Writing both sides bucketed AND
  * sorted by the join key lets every subsequent run join them with ZERO
  * exchange — partition i of lineitem joins partition i of orders
  * locally — which is exactly how the 100 TB deployment amortizes the
  * fact-to-fact shuffle across the many queries that join on orderkey.
  * (The parquet-scan path keeps Catalyst's pushdown/pruning; bucketing
  * only adds the co-location contract via the catalog.)
  *
  * BucketingSpec asserts the joined plan contains no shuffle exchange.
  */
object Bucketing {

  /** Register lineitem/orders as bucketed managed tables (full refresh). */
  def writeBucketed(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    Tables.lineitem(spark, dir).write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    Tables.orders(spark, dir).write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
  }

  /** The co-located join: no exchange on either side. */
  def cojoin(spark: SparkSession): DataFrame =
    spark.table("lineitem_bucketed")
      .join(spark.table("orders_bucketed"),
        spark.table("lineitem_bucketed")("l_orderkey") ===
          spark.table("orders_bucketed")("o_orderkey"))
}
