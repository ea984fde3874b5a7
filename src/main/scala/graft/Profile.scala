package graft
import org.apache.spark.sql.SparkSession
/** Dev profiling main: stage-by-stage timings of the warehouse build. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val wh = t("warehouse-handle") { etl.Warehouse(spark, d) }
    t("staging-count(build)") { wh.staging.count() }
    t("staging-count(cached)") { wh.staging.count() }
    t("cleaned-count(build)") { wh.cleaned.count() }
    t("fact-count(build)") { wh.fact.count() }
    t("dedup-after-cache") { etl.Clean.dedup(etl.Clean.dropNulls(wh.staging)).count() }
    spark.stop()
  }
}
