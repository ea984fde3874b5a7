package graft

import org.apache.spark.sql.functions._

/** Dev tool: the 100× proof that the DSv2 statistics tier CHANGES
  * PLANS, not just numbers — specifically that DV-ADJUSTED estimates
  * turn a shuffle join into a broadcast join on a merge-on-read table:
  *
  *  - a 100× fact (57M rows) and a 5M-row dim, both catalog manifest
  *    tables, both ANALYZEd;
  *  - CLEAN dim: ~tens of MB of parquet, above the broadcast
  *    threshold — the pure-SQL join plans a shuffle (correct: the dim
  *    is genuinely big);
  *  - after a MoR DELETE of 97.5% of the dim (no data bytes move —
  *    the files still hold 5M rows), the stats tier reports live-scaled
  *    size + exact live rows, the SAME query auto-broadcasts, and the
  *    join gets measurably faster. A file-size-only estimator (stock
  *    FileScan, or any DV-blind one) would keep shuffling forever —
  *    the deleted rows' bytes never leave the files until OPTIMIZE.
  *
  * `sbt "runMain graft.StatsBench <inDir> [factor=100]"` — one JSON
  * line LAST. */
object StatsBench {

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val spark = BenchHarness.session()
    val root = BenchHarness.workRoot(s"graft_stats_${factor}x")
    BenchHarness.manifestCatalog(spark, s"$root/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sb")
    val fact = "graft.sb.fact"
    val dim = "graft.sb.dim"

    def t[A](body: => A): (A, Double) = BenchHarness.timed(body)

    val (rows, buildSec) = t {
      val cleaned = etl.Warehouse(spark, inDir).cleaned
      val copies = spark.range(factor).select(col("id").as("_copy"))
      cleaned.crossJoin(copies)
        .withColumn("invoice_no",
          concat(col("invoice_no"), lit("#"), col("_copy")))
        .drop("_copy")
        .withColumn("cust_key",
          pmod(xxhash64(col("customer_id"), col("invoice_no")),
            lit(5000000L)) + 1)
        .repartitionByRange(64, col("country"))
        .createOrReplaceTempView("sb_fact_src")
      spark.sql(s"CREATE TABLE $fact AS SELECT * FROM sb_fact_src")
      spark.range(1, 5000001)
        .select(col("id").as("cust_key"),
          concat(lit("cust_"), col("id")).as("cust_name"),
          concat(lit("SEG_"), pmod(col("id"), lit(23L))).as("segment"),
          // incompressible payload so the CLEAN dim is honestly above
          // the broadcast threshold (unique hex defeats dictionaries)
          md5(concat(lit("addr"), col("id"))).as("address_hash"),
          md5(concat(lit("meta"), col("id"))).as("profile_hash"))
        .repartition(8)
        .createOrReplaceTempView("sb_dim_src")
      spark.sql(s"CREATE TABLE $dim AS SELECT * FROM sb_dim_src")
      spark.sql(s"CALL graft.system.analyze('sb.fact', 'cust_key,country')")
      spark.sql(s"CALL graft.system.analyze('sb.dim', 'cust_key,segment')")
      spark.table(fact).count()
    }

    val joinSql =
      s"""SELECT d.segment, COUNT(*) AS n, SUM(f.quantity) AS q
         |FROM $fact f JOIN $dim d ON f.cust_key = d.cust_key
         |GROUP BY d.segment""".stripMargin
    def planOf(): String =
      spark.sql(joinSql).queryExecution.executedPlan.toString
    // name WHICH side broadcast: at small factors the FACT fits under
    // the threshold and builds the hash side — only "broadcast_dim"
    // is the stats-tier story this bench exists to prove
    def joinKind(p: String): String =
      if (p.contains("BroadcastHashJoin")) {
        val bx = p.indexOf("BroadcastExchange")
        if (bx < 0) "broadcast_unknown" // reused/staged exchange shape
        else if (p.substring(bx, math.min(p.length, bx + 800))
          .contains("sb.dim")) "broadcast_dim"
        else "broadcast_other"
      } else if (p.contains("SortMergeJoin")) "sortmerge"
      else "other"

    // clean 5M-row dim: genuinely big — the honest plan is a shuffle
    val kindClean = joinKind(planOf())
    val (_, secClean) = t(spark.sql(joinSql).collect())

    // MoR-delete 97.5% of the dim: zero data bytes move, live 125k rows
    val (_, delSec) = t(spark.sql(
      s"CALL graft.system.delete_mor('sb.dim', 'pmod(cust_key, 40) != 0')"))
    val kindVec = joinKind(planOf())
    val (_, secVec) = t(spark.sql(joinSql).collect())

    println(
      s"""{"metric":"stats_broadcast_${factor}x","value":$secVec,""" +
        s""""unit":"sec","rows":$rows,"build_sec":$buildSec,""" +
        s""""delete_sec":$delSec,""" +
        s""""clean_dim":{"join":"$kindClean","sec":$secClean},""" +
        s""""vectored_dim":{"join":"$kindVec","sec":$secVec},""" +
        s""""speedup":${secClean / math.max(secVec, 1e-9)}}""")
    spark.stop()
  }
}
