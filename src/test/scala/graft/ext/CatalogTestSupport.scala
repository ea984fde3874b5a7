package graft.ext

import org.apache.spark.sql.SparkSession

/** Spark freezes a catalog's options at FIRST instantiation (the
  * CatalogManager caches plugins by name), so a suite that re-points
  * `spark.sql.catalog.graft.warehouse` after another suite already
  * touched the catalog would silently keep the old warehouse. Tests
  * that own their warehouse reset the manager after setting options —
  * the same move Spark's own catalog tests make. */
object CatalogTestSupport {
  def registerFreshCatalog(spark: SparkSession, warehouse: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.manifest.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
    org.apache.spark.sql.graft.CatalogShim.resetCatalogs(spark)
  }
}
