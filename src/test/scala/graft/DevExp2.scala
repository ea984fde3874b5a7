package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch decomposition of the Warehouse warm-up wall (dev-only).
  * Run: `sbt "Test/runMain graft.DevExp2 <sfDir>"`. */
object DevExp2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[exp2] $tag%-42s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    time("first job (range sum)") {
      spark.range(1000000).agg(sum("id")).collect()
    }
    time("staging build+count") {
      etl.Staging.staging(spark, sfDir).count()
    }
    val wh = {
      var w: etl.Warehouse = null
      time("Warehouse() construct") { w = etl.Warehouse(spark, sfDir) }
      w
    }
    time("staging persist+count") { wh.staging.count() }
    time("cleaned persist+count") { wh.cleaned.count() }
    time("dimProduct persist+count") { wh.dimProduct.count() }
    time("dimCustomer persist+count") { wh.dimCustomer.count() }
    time("dimDate persist+count") { wh.dimDate.count() }
    time("fact persist+count") { wh.fact.count() }
    time("staging query (ordered+money) count") {
      SparkEntry.queries("staging")(spark, sfDir).count()
    }
    time("staging query again") {
      SparkEntry.queries("staging")(spark, sfDir).count()
    }
    spark.stop()
  }
}
