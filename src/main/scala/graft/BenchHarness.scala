package graft

import org.apache.spark.sql.SparkSession

/** The one scaffold every decade-bench main runs on: the session
  * recipe (`local[SPARK_GRAFT_CPUS]`, matching shuffle partitions,
  * UTC, no UI), the temp work root, the run-scoped manifest catalog
  * and the wall-clock timer. A harness change — a new required conf,
  * a timer fix — lands HERE once, so no bench can quietly measure a
  * differently-configured session. */
object BenchHarness {

  /** `local[cpus]` session; `defaultCpus` only seeds the env fallback
    * (the streaming relay runs on 4 threads by default, the batch
    * benches on 32). */
  def session(defaultCpus: String = "32"): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Fresh temp work root for one bench run. */
  def workRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Register the `graft` manifest catalog over `warehouse` —
    * run-scoped, so re-runs never trip over a prior run's pointer
    * files in a shared default warehouse. */
  def manifestCatalog(spark: SparkSession, warehouse: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.manifest.ManifestCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
  }

  /** (result, wall seconds). */
  def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }
}
