package graft

import org.apache.spark.sql.functions._

/** Dev tool: the 100× hidden-partitioning record — three A/Bs over a
  * 100×-replicated cleaned fact (~54M rows), all catalog manifest
  * tables, interleaved so each strategy occupies the same position in
  * the run (the host drifts within a session; only same-position pass
  * pairs compare):
  *
  *  1. MONTH PRUNING: the fact CTAS'd `PARTITIONED BY
  *     (months(invoice_date))` in split layout vs the SAME data
  *     committed unpartitioned — a one-year aggregation must plan
  *     ~12/84 of the month files and win proportionally.
  *  2. BUCKET SPJ: fact + per-invoice rollup both
  *     `PARTITIONED BY (bucket(n, invoice_no))` — the high-NDV key
  *     identity partitioning can never co-partition at bounded
  *     partition count — joined on invoice_no with
  *     `v2.bucketing.enabled` off (both sides shuffle) vs on (zero
  *     Exchange under the join).
  *  3. OPTIMIZE RESTORES SPJ: the same pair re-committed in the
  *     DEFAULT (mixed-boundary) layout — proof-less, join shuffles —
  *     then `compact()` (which now splits at tuple boundaries), after
  *     which the identical join plans zero Exchange.
  *  4. SKEW SPJ: a 90%-hot key under bucket(8) — plain SPJ vs
  *     partially-clustered distribution, zero Exchange both ways.
  *  5. SUPERSET-KEY SPJ: join on (invoice_no, stock_code) over
  *     tables bucketed by invoice_no alone —
  *     requireAllClusterKeysForCoPartition=false keeps zero Exchange
  *     where the default pays both shuffles.
  *  6. ALIGNED METADATA DML: month-boundary DELETE retiring whole
  *     files from tuples (zero data files written) vs the row-level
  *     CoW path on an identical clone.
  *
  * `sbt "runMain graft.HpBench <inDir> [factor=100]"` — one JSON line
  * LAST. */
object HpBench {

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val buckets = 32
    val spark = BenchHarness.session()
    val root = BenchHarness.workRoot(s"graft_hp_${factor}x")
    BenchHarness.manifestCatalog(spark, s"$root/wh")
    def t[A](body: => A): (A, Double) = BenchHarness.timed(body)

    val monthly = s"$root/wh/hp/monthly"
    val flat = s"$root/wh/hp/flat"
    val bfact = s"$root/wh/hp/bfact"
    val binv = s"$root/wh/hp/binv"
    val cfact = s"$root/wh/hp/cfact"
    val cinv = s"$root/wh/hp/cinv"

    val (rows, buildSec) = t {
      val cleaned = etl.Warehouse(spark, inDir).cleaned
      val copies = spark.range(factor).select(col("id").as("_copy"))
      val fact = cleaned.crossJoin(copies)
        .withColumn("invoice_no",
          concat(col("invoice_no"), lit("#"), col("_copy")))
        .drop("_copy")
      fact.createOrReplaceTempView("hp_fact_src")
      spark.conf.set("graft.write.splitByPartition", "true")
      spark.sql(s"CREATE TABLE graft.`$monthly` PARTITIONED BY " +
        "(months(invoice_date)) AS SELECT * FROM hp_fact_src")
      spark.conf.unset("graft.write.splitByPartition")
      ext.Manifests.commitData(fact, flat)
      val inv = fact.groupBy("invoice_no")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("quantity").cast("long")).as("inv_qty"))
      inv.createOrReplaceTempView("hp_inv_src")
      spark.conf.set("graft.write.splitByPartition", "true")
      spark.sql(s"CREATE TABLE graft.`$bfact` PARTITIONED BY " +
        s"(bucket($buckets, invoice_no)) AS SELECT * FROM hp_fact_src")
      spark.sql(s"CREATE TABLE graft.`$binv` PARTITIONED BY " +
        s"(bucket($buckets, invoice_no)) AS SELECT * FROM hp_inv_src")
      spark.conf.unset("graft.write.splitByPartition")
      // the restore pair: DEFAULT layout, deliberately mixed boundary
      // files (few files per write → tuples straddle)
      ext.Manifests.commitDataPartitioned(fact, cfact,
        Seq(s"bucket[$buckets](invoice_no)"), filesPerWrite = 8)
      ext.Manifests.commitDataPartitioned(inv, cinv,
        Seq(s"bucket[$buckets](invoice_no)"), filesPerWrite = 8)
      spark.table(s"graft.`$monthly`").count()
    }

    // ---- 1. month pruning ------------------------------------------
    // scan-BOUND shape (revenue arithmetic + the wide description
    // column): at bench scale a narrow 3-column aggregation finishes
    // inside planning overhead on either layout — the wide read is
    // what a real monthly report costs, and where 13/80 files shows
    def yearSql(tbl: String) =
      s"""SELECT month(invoice_date) AS m, COUNT(*) AS n,
         |  CAST(SUM(quantity) AS BIGINT) AS q,
         |  CAST(SUM(CAST(unit_price AS DECIMAL(18,2)) * quantity)
         |    AS DOUBLE) AS rev,
         |  MAX(description) AS top_desc
         |FROM graft.`$tbl`
         |WHERE invoice_date >= DATE '1995-01-01'
         |  AND invoice_date < DATE '1996-01-01'
         |GROUP BY month(invoice_date)""".stripMargin
    def filesPlanned(tbl: String): Int = {
      val q = spark.sql(yearSql(tbl))
      q.collect()
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.execution.SparkPlan]
      def go(p: org.apache.spark.sql.execution.SparkPlan): Unit =
        p.foreach {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => go(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => go(s.plan)
          case n => buf += n
        }
      go(q.queryExecution.executedPlan)
      buf.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputRDD.partitions.map {
            case dp: org.apache.spark.sql.execution.datasources.v2
                .DataSourceRDDPartition =>
              dp.inputPartitions.map {
                case fp: org.apache.spark.sql.execution.datasources
                    .FilePartition => fp.files.length
                case _ => 0
              }.sum
            case _ => 0
          }.sum
      }.sum
    }
    val monthlyFilesAll = ext.Manifests.files(spark, monthly,
      ext.Manifests.latestVersion(spark, monthly).get).size
    val prunedFiles = filesPlanned(monthly)
    // the aggregation needs no key grouping — leaving the SPJ report
    // on would cap the pruned scan at one task per month at THIS
    // file size (each month ≪ maxPartitionBytes; at real scale a
    // month is thousands of files and parallelism is unaffected), so
    // the prune A/B runs with the report off: plain file splits, same
    // parallelism rules on both sides, pruning's I/O the only delta
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    // size file partitions to the PRUNED scan (both sides get the
    // same conf): 13 ~25 MB month files pack into ~3 tasks under the
    // default 128 MB split while the 80-file flat scan saturates every
    // core — the comparison would measure packing, not pruning
    spark.conf.set("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
    // interleaved pass pairs: flat,monthly / flat,monthly
    val (_, flat1) = t(spark.sql(yearSql(flat)).collect())
    val (_, mon1) = t(spark.sql(yearSql(monthly)).collect())
    val (a, flat2) = t(spark.sql(yearSql(flat)).collect())
    val (b, mon2) = t(spark.sql(yearSql(monthly)).collect())
    require(a.map(_.getLong(1)).sum == b.map(_.getLong(1)).sum,
      "pruning A/B results disagree")
    spark.conf.unset("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")

    // ---- 2. bucket SPJ ---------------------------------------------
    val bucketSql =
      s"""SELECT /*+ MERGE(i) */ COUNT(*) AS n, SUM(i.inv_qty) AS q
         |FROM graft.`$bfact` f JOIN graft.`$binv` i
         |  ON f.invoice_no = i.invoice_no""".stripMargin
    def exchangesUnderJoin(sqlText: String): Int = {
      val p = spark.sql(sqlText).queryExecution.executedPlan.toString
      val join = Seq("SortMergeJoin", "ShuffledHashJoin")
        .map(p.indexOf).filter(_ >= 0).minOption.getOrElse(-1)
      require(join >= 0, s"no shuffle-strategy join in the plan:\n$p")
      p.substring(join).split("\n")
        .count(l => l.contains("Exchange hashpartitioning"))
    }
    def runBucket(spj: Boolean): (Int, Double, Long) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
        spj.toString)
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      val ex = exchangesUnderJoin(bucketSql)
      val (res, sec) = t(spark.sql(bucketSql).collect())
      (ex, sec, res.head.getLong(0))
    }
    val (exShuf, shuf1, nShuf) = runBucket(spj = false)
    val (exSpj, spj1, nSpj) = runBucket(spj = true)
    val (_, shuf2, _) = runBucket(spj = false)
    val (_, spj2, _) = runBucket(spj = true)
    require(nShuf == nSpj, s"bucket A/B results disagree: $nShuf vs $nSpj")

    // ---- 3. OPTIMIZE restores SPJ ----------------------------------
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val restoreSql =
      s"""SELECT /*+ MERGE(i) */ COUNT(*) AS n
         |FROM graft.`$cfact` f JOIN graft.`$cinv` i
         |  ON f.invoice_no = i.invoice_no""".stripMargin
    val exBefore = exchangesUnderJoin(restoreSql)
    val (_, secBefore) = t(spark.sql(restoreSql).collect())
    val (_, optSec) = t {
      ext.Manifests.compact(spark, cfact, targetFiles = 32)
      ext.Manifests.compact(spark, cinv, targetFiles = 32)
    }
    val exAfter = exchangesUnderJoin(restoreSql)
    val (_, secAfter) = t(spark.sql(restoreSql).collect())

    // ---- 4. skew-aware SPJ -----------------------------------------
    // a 90%-hot key inside bucket(8): plain SPJ plans ONE task per
    // tuple (the hot bucket serializes ~90% of the table through one
    // core); partially-clustered distribution keeps the hot side's
    // file splits as separate tasks and replicates the other side's
    // matching partition — zero Exchange either way, parallelism only
    // under partial. A/B in interleaved pass pairs.
    val skfact = s"$root/wh/hp/skfact"
    val skinv = s"$root/wh/hp/skinv"
    val (_, skewBuildSec) = t {
      val fact = spark.table(s"graft.`$flat`")
      val skew = fact.withColumn("skew_key",
        when(pmod(hash(col("invoice_no")), lit(10)) =!= 0, lit("HOT#0"))
          .otherwise(col("invoice_no")))
      skew.createOrReplaceTempView("hp_skew_src")
      spark.conf.set("graft.write.splitByPartition", "true")
      spark.sql(s"CREATE TABLE graft.`$skfact` PARTITIONED BY " +
        "(bucket(8, skew_key)) AS SELECT * FROM hp_skew_src")
      spark.sql(s"CREATE TABLE graft.`$skinv` PARTITIONED BY " +
        "(bucket(8, skew_key)) AS SELECT skew_key, COUNT(*) AS n_lines " +
        "FROM hp_skew_src GROUP BY skew_key")
      spark.conf.unset("graft.write.splitByPartition")
    }
    val skewSql =
      s"""SELECT /*+ MERGE(i) */ COUNT(*) AS n, SUM(i.n_lines) AS q
         |FROM graft.`$skfact` f JOIN graft.`$skinv` i
         |  ON f.skew_key = i.skew_key""".stripMargin
    // task-count probe on the BARE join (the aggregate above it
    // coalesces to one partition and would hide the grouping)
    val skewJoinSql =
      s"""SELECT /*+ MERGE(i) */ f.skew_key, i.n_lines
         |FROM graft.`$skfact` f JOIN graft.`$skinv` i
         |  ON f.skew_key = i.skew_key""".stripMargin
    def runSkew(partial: Boolean): (Int, Int, Double, Long) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing" +
        ".partiallyClusteredDistribution.enabled", partial.toString)
      val ex = exchangesUnderJoin(skewSql)
      val parts = spark.sql(skewJoinSql).rdd.getNumPartitions
      val (res, sec) = t(spark.sql(skewSql).collect())
      spark.conf.unset("spark.sql.sources.v2.bucketing" +
        ".partiallyClusteredDistribution.enabled")
      (ex, parts, sec, res.head.getLong(0))
    }
    val (exPlain, partsPlain, skPlain1, nSkPlain) = runSkew(partial = false)
    val (exPart, partsPart, skPart1, nSkPart) = runSkew(partial = true)
    val (_, _, skPlain2, _) = runSkew(partial = false)
    val (_, _, skPart2, _) = runSkew(partial = true)
    require(nSkPlain == nSkPart,
      s"skew A/B results disagree: $nSkPlain vs $nSkPart")

    // ---- 5. join keys SUPERSET of partition keys -------------------
    // the common real-query shape: both sides bucketed on the high-NDV
    // key alone, the join adds a second equi-key the partitioning does
    // not carry. Same-key rows are co-located by the bucket grouping
    // alone, so under requireAllClusterKeysForCoPartition=false the
    // join still plans ZERO Exchange; the default-true A side pays
    // both shuffles.
    val bline = s"$root/wh/hp/bline"
    val (_, supBuildSec) = t {
      spark.conf.set("graft.write.splitByPartition", "true")
      spark.sql(s"CREATE TABLE graft.`$bline` PARTITIONED BY " +
        s"(bucket($buckets, invoice_no)) AS " +
        "SELECT invoice_no, stock_code, COUNT(*) AS n_lines, " +
        "CAST(SUM(quantity) AS BIGINT) AS line_qty " +
        "FROM hp_fact_src GROUP BY invoice_no, stock_code")
      spark.conf.unset("graft.write.splitByPartition")
    }
    val supersetSql =
      s"""SELECT /*+ MERGE(i) */ COUNT(*) AS n, SUM(i.line_qty) AS q
         |FROM graft.`$bfact` f JOIN graft.`$bline` i
         |  ON f.invoice_no = i.invoice_no
         | AND f.stock_code = i.stock_code""".stripMargin
    def runSuperset(allowSuperset: Boolean): (Int, Double, Long) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition",
        (!allowSuperset).toString)
      val ex = exchangesUnderJoin(supersetSql)
      val (res, sec) = t(spark.sql(supersetSql).collect())
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      (ex, sec, res.head.getLong(0))
    }
    val (exSupOff, sup1Off, nSupOff) = runSuperset(allowSuperset = false)
    val (exSupOn, sup1On, nSupOn) = runSuperset(allowSuperset = true)
    val (_, sup2Off, _) = runSuperset(allowSuperset = false)
    val (_, sup2On, _) = runSuperset(allowSuperset = true)
    require(nSupOff == nSupOn,
      s"superset A/B results disagree: $nSupOff vs $nSupOn")
    require(exSupOn == 0,
      s"superset-key SPJ should plan zero Exchange, got $exSupOn")

    // ---- 6. transform-aligned metadata DML -------------------------
    // month-aligned DELETE on the monthly table: the aligned path
    // retires whole files from the recorded tuples (ZERO data files
    // written — a retention job); the row-level CoW path on an
    // identical clone scans and rewrites. Clones are metadata-only, so
    // both sides delete the same bytes from the same layout.
    val mdelA = s"$root/wh/hp/mdel_aligned"
    val mdelB = s"$root/wh/hp/mdel_rowlevel"
    val mv0 = ext.Manifests.latestVersion(spark, monthly).get
    ext.Manifests.shallowClone(spark, monthly, mdelA, mv0)
    ext.Manifests.shallowClone(spark, monthly, mdelB, mv0)
    val delPred = "invoice_date < DATE '1997-01-01'"
    val beforeA = ext.Manifests.files(spark, mdelA, 0).toSet
    val (_, alignedSec) = t(spark.sql(
      s"DELETE FROM graft.`$mdelA` WHERE $delPred"))
    val afterA = ext.Manifests.files(spark, mdelA,
      ext.Manifests.latestVersion(spark, mdelA).get).toSet
    val alignedNewFiles = (afterA -- beforeA).size
    require(alignedNewFiles == 0,
      s"aligned DELETE wrote $alignedNewFiles data files")
    val beforeB = ext.Manifests.files(spark, mdelB, 0).toSet
    val (_, rowlevelSec) = t(ext.Manifests.deleteWhere(spark, mdelB,
      col("invoice_date") < lit(java.sql.Date.valueOf("1997-01-01"))))
    val afterB = ext.Manifests.files(spark, mdelB,
      ext.Manifests.latestVersion(spark, mdelB).get).toSet
    val rowlevelNewFiles = (afterB -- beforeB).size
    val nA = spark.table(s"graft.`$mdelA`").count()
    val nB = spark.table(s"graft.`$mdelB`").count()
    require(nA == nB, s"aligned/row-level DELETE disagree: $nA vs $nB")
    require(nA < rows, "the aligned-DML DELETE matched no rows")

    println(
      s"""{"metric":"hidden_partition_${factor}x","value":$mon2,""" +
        s""""unit":"sec","rows":$rows,"build_sec":$buildSec,""" +
        s""""prune":{"files_total":$monthlyFilesAll,""" +
        s""""files_planned":$prunedFiles,"flat_sec":$flat1,""" +
        s""""monthly_sec":$mon1,"flat_sec_warm":$flat2,""" +
        s""""monthly_sec_warm":$mon2,""" +
        s""""speedup_warm":${flat2 / math.max(mon2, 1e-9)}},""" +
        s""""bucket_spj":{"exchanges_off":$exShuf,"exchanges_on":$exSpj,""" +
        s""""shuffle_sec":$shuf1,"spj_sec":$spj1,""" +
        s""""shuffle_sec_warm":$shuf2,"spj_sec_warm":$spj2,""" +
        s""""speedup_warm":${shuf2 / math.max(spj2, 1e-9)}},""" +
        s""""optimize_restores_spj":{"exchanges_before":$exBefore,""" +
        s""""exchanges_after":$exAfter,"join_sec_before":$secBefore,""" +
        s""""join_sec_after":$secAfter,"optimize_sec":$optSec},""" +
        s""""skew_spj":{"build_sec":$skewBuildSec,""" +
        s""""exchanges_plain":$exPlain,"exchanges_partial":$exPart,""" +
        s""""tasks_plain":$partsPlain,"tasks_partial":$partsPart,""" +
        s""""plain_sec":$skPlain1,"partial_sec":$skPart1,""" +
        s""""plain_sec_warm":$skPlain2,"partial_sec_warm":$skPart2,""" +
        s""""speedup_warm":${skPlain2 / math.max(skPart2, 1e-9)}},""" +
        s""""superset_spj":{"build_sec":$supBuildSec,""" +
        s""""exchanges_default":$exSupOff,"exchanges_superset":$exSupOn,""" +
        s""""shuffle_sec":$sup1Off,"spj_sec":$sup1On,""" +
        s""""shuffle_sec_warm":$sup2Off,"spj_sec_warm":$sup2On,""" +
        s""""speedup_warm":${sup2Off / math.max(sup2On, 1e-9)}},""" +
        s""""aligned_dml":{"aligned_sec":$alignedSec,""" +
        s""""aligned_new_files":$alignedNewFiles,""" +
        s""""rowlevel_sec":$rowlevelSec,""" +
        s""""rowlevel_new_files":$rowlevelNewFiles,""" +
        s""""rows_after":$nA,""" +
        s""""speedup":${rowlevelSec / math.max(alignedSec, 1e-9)}}}""")
    spark.stop()
  }
}
