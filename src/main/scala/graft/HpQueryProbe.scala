package graft

/** Dev probe: where does the registered `sql_hidden_partition` spend
  * its wall at sf0.1 — analysis, physical planning, or execution? */
object HpQueryProbe {
  def main(args: Array[String]): Unit = {
    val spark = BenchHarness.session()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](tag: String)(body: => A): A = {
      val (r, s) = BenchHarness.timed(body)
      println(f"[probe] $tag: $s%.3f s")
      r
    }
    t("cold collect")(
      SparkEntry.queries("sql_hidden_partition")(spark, d).collect())
    (1 to 3).foreach { i =>
      val q = SparkEntry.queries("sql_hidden_partition")(spark, d)
      t(s"warm$i analyze")(q.queryExecution.analyzed)
      t(s"warm$i optimize")(q.queryExecution.optimizedPlan)
      t(s"warm$i physical")(q.queryExecution.executedPlan.toString())
      t(s"warm$i execute")(q.collect())
    }
    val q = SparkEntry.queries("sql_hidden_partition")(spark, d)
    println(q.queryExecution.executedPlan.toString().take(4000))
    spark.stop()
  }
}
