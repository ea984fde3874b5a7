package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** `private[sql]` door #3: Spark's `CatalogManager` freezes a
  * catalog's options at first instantiation; re-pointing
  * `spark.sql.catalog.<name>.*` afterwards is silently ignored until
  * the manager resets. Exposing the reset lets a long-lived session
  * (or a test suite sharing one) re-register a catalog with fresh
  * options — the same hook Spark's own catalog tests use. */
object CatalogShim {
  def resetCatalogs(spark: SparkSession): Unit =
    spark.sessionState.catalogManager.reset()
}
