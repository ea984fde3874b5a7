package graft

import org.apache.spark.sql.SparkSession

/** Dev-only decomposition of a slow registered query (not part of any
  * gate): times the registered lambda, then its pieces, to separate
  * planning cost from execution cost. Run:
  * `sbt "Test/runMain graft.DevProfile <sfDir> <queryName>"`. */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = TestSpark.spark
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm-up pass (fixture build + code paths hot)
    time(s"$name pass1 (cold)") {
      SparkEntry.queries(name)(spark, sfDir).write.format("noop")
        .mode("overwrite").save()
    }
    (2 to 4).foreach { i =>
      time(s"$name pass$i (warm)") {
        SparkEntry.queries(name)(spark, sfDir).write.format("noop")
          .mode("overwrite").save()
      }
    }
    // decomposition: just building the frame (planning-side) vs count
    val df = time(s"$name build frame") {
      SparkEntry.queries(name)(spark, sfDir)
    }
    time(s"$name count()") { println("rows=" + df.count()) }
    time(s"$name count() again") { println("rows=" + df.count()) }
    df.explain("formatted")
    spark.stop()
  }
}
