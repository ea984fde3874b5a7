package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hidden partitioning (Iceberg partition transforms) end-to-end:
  * CTAS accepts `PARTITIONED BY (months(ts))` / `bucket(n, k)` /
  * `truncate(w, s)`, writes derive transformed tuples into the
  * partition sidecar, SOURCE-column predicates lower to tuple pruning
  * (files planned, counted), bucket-co-partitioned joins run with zero
  * Exchange (SPJ over a transform — the shape identity partitioning
  * cannot give a high-NDV key), and dynamic INSERT OVERWRITE replaces
  * exactly the months the batch carries. No derived columns ever
  * appear in the schema — the user's world is the source column. */
class HiddenPartitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def registerCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.manifest.ManifestCatalog")

  private def tmp(tag: String): String = java.nio.file.Files
    .createTempDirectory(s"graft_hp_$tag").toString + "/t"

  /** Timestamped sales rows across 4 months of 2011. */
  private def monthlyDf = {
    import spark.implicits._
    (0 until 4000).map { i =>
      val month = 1 + (i % 4) // Jan..Apr
      val day = 1 + (i % 27)
      (i.toLong, java.sql.Timestamp.valueOf(
        f"2011-$month%02d-$day%02d 10:30:00"), i * 1.5)
    }.toDF("sale_id", "invoice_ts", "amount")
  }

  private def finalNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    df.collect()
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.execution.SparkPlan]
    def go(p: org.apache.spark.sql.execution.SparkPlan): Unit =
      p.foreach {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          go(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          buf += q; go(q.plan)
        case n => buf += n
      }
    go(df.queryExecution.executedPlan)
    buf.toSeq
  }

  /** Data FILES planned by the (single) manifest scan of `df`. */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val scans = finalNodes(df).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[graft.sources.manifest.DvParquetScan] => b
    }
    assert(scans.nonEmpty, "no manifest columnar scan in the plan")
    scans.map(_.inputRDD.partitions.map {
      case dp: org.apache.spark.sql.execution.datasources.v2
          .DataSourceRDDPartition =>
        dp.inputPartitions.map {
          case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
            fp.files.length
          case _ => 0
        }.sum
      case _ => 0
    }.sum).min
  }

  test("spec round-trip: parse/serialize/tuple names") {
    val f = PartitionTransforms.parse("months(invoice_ts)")
    assert(f.transform === "months" && f.source === "invoice_ts")
    assert(f.spec === "months(invoice_ts)")
    assert(f.tupleName === "invoice_ts_month")
    val b = PartitionTransforms.parse("bucket[16](invoice_no)")
    assert(b.param === Some(16) && b.source === "invoice_no")
    assert(b.spec === "bucket[16](invoice_no)")
    val t = PartitionTransforms.parse("truncate[4](category)")
    assert(t.param === Some(4) && t.tupleName === "category_trunc")
    val id = PartitionTransforms.parse("country")
    assert(id.isIdentity && id.spec === "country" &&
      id.tupleName === "country")
    assert(PartitionTransforms.sources(
      Seq("months(ts)", "bucket[8](k)", "c")) === Seq("ts", "k", "c"))
    assert(PartitionTransforms.identitySources(
      Seq("months(ts)", "c")) === Seq("c"))
  }

  test("monthly CTAS: spec recorded, tuples derived, no derived schema columns") {
    registerCatalog()
    val b = tmp("ctas")
    monthlyDf.createOrReplaceTempView("graft_hp_src")
    spark.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY (months(invoice_ts)) " +
      "AS SELECT * FROM graft_hp_src")
    val v = Manifests.latestVersion(spark, b).get
    val (specs, segs) = Manifests.partitionedBy(spark, b, v).get
    assert(specs === Seq("months(invoice_ts)"))
    // schema carries ONLY the user's columns — hidden means hidden
    assert(spark.table(s"graft.`$b`").schema.fieldNames.toSeq ===
      Seq("sale_id", "invoice_ts", "amount"))
    // the sidecar holds derived month ordinals under the tuple name
    val pv = spark.read.parquet(segs: _*)
    assert(pv.schema.fieldNames.toSet === Set("file", "invoice_ts_month"))
    val months = pv.select("invoice_ts_month").distinct()
      .collect().map(_.getInt(0)).sorted
    // 2011 months Jan..Apr: 2011*12 + m - 1
    assert(months === Array(24132, 24133, 24134, 24135))
    // content exact
    assert(spark.table(s"graft.`$b`").count() === 4000)
  }

  test("source-column predicates prune files through the month tuples") {
    registerCatalog()
    val b = tmp("prune")
    monthlyDf.createOrReplaceTempView("graft_hp_src2")
    spark.conf.set("graft.write.splitByPartition", "true")
    try spark.sql(
      s"CREATE TABLE graft.`$b` PARTITIONED BY (months(invoice_ts)) " +
        "AS SELECT * FROM graft_hp_src2")
    finally spark.conf.unset("graft.write.splitByPartition")
    val all = plannedFiles(spark.sql(s"SELECT * FROM graft.`$b`"))
    assert(all === 4, s"split layout should give one file per month, got $all")
    // equality on the SOURCE timestamp → one month's file
    val eq = plannedFiles(spark.sql(
      s"SELECT * FROM graft.`$b` WHERE invoice_ts = " +
        "TIMESTAMP '2011-02-03 10:30:00'"))
    assert(eq === 1, s"timestamp equality should plan 1 file, got $eq")
    // a RANGE on the source column: strict > at a mid-month point
    // keeps that month and later (widened, never narrower)
    val range = plannedFiles(spark.sql(
      s"SELECT * FROM graft.`$b` WHERE invoice_ts >= " +
        "TIMESTAMP '2011-03-01 00:00:00'"))
    assert(range === 2, s"March..April should plan 2 files, got $range")
    // correctness under pruning: exact row counts
    val n = spark.sql(
      s"SELECT COUNT(*) AS n FROM graft.`$b` WHERE invoice_ts >= " +
        "TIMESTAMP '2011-03-01 00:00:00'").head.getLong(0)
    assert(n === 2000)
    // and a predicate the transform cannot decide keeps everything
    val none = plannedFiles(spark.sql(
      s"SELECT * FROM graft.`$b` WHERE amount > 100"))
    assert(none === 4)
  }

  test("bucket SPJ: two bucket-partitioned tables join with zero Exchange") {
    registerCatalog()
    import spark.implicits._
    val da = tmp("ba")
    val db = tmp("bb")
    val dim = (1 to 2000).map(i => (i.toLong, s"cust_$i"))
      .toDF("customer_key", "customer_id")
    val fact = (1 to 20000).map(i =>
      ((i % 2000 + 1).toLong, i * 2.0)).toDF("customer_key", "amount")
    dim.createOrReplaceTempView("graft_hp_dim")
    fact.createOrReplaceTempView("graft_hp_fact")
    spark.conf.set("graft.write.splitByPartition", "true")
    try {
      spark.sql(s"CREATE TABLE graft.`$da` PARTITIONED BY " +
        "(bucket(8, customer_key)) AS SELECT * FROM graft_hp_dim")
      spark.sql(s"CREATE TABLE graft.`$db` PARTITIONED BY " +
        "(bucket(8, customer_key)) AS SELECT * FROM graft_hp_fact")
    } finally spark.conf.unset("graft.write.splitByPartition")
    // purity proof holds over the bucket tuples
    val va = Manifests.latestVersion(spark, da).get
    val proof = new ManifestFileIndex(spark, da, va).purePartitionTuples
    assert(proof.isDefined, "bucket split layout failed the purity proof")
    assert(proof.get._1 === Seq("bucket[8](customer_key)"))
    assert(proof.get._2.values.toSeq.distinct.size === 8)
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val old = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "true")
      spark.conf.set(keys(2), "-1")
      val q = spark.sql(
        s"""SELECT a.customer_key, a.customer_id, SUM(b.amount) AS amt
           |FROM graft.`$da` a JOIN graft.`$db` b
           |  ON a.customer_key = b.customer_key
           |GROUP BY a.customer_key, a.customer_id""".stripMargin)
      val nodes = finalNodes(q)
      val joins = nodes.filter {
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
        case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
        case _ => false
      }
      assert(joins.size === 1, "expected one shuffle-family join")
      assert(joins.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty,
        s"bucket SPJ join still exchanges:\n${joins.head.toString.take(3000)}")
      // exact content
      val rows = q.collect()
      assert(rows.length === 2000)
      assert(rows.map(_.getDouble(2)).sum ===
        fact.agg(sum("amount")).head.getDouble(0))
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucket equality pruning: a point lookup plans one bucket's file") {
    registerCatalog()
    import spark.implicits._
    val b = tmp("beq")
    val df = (1 to 4000).map(i => (i.toLong, s"v_$i")).toDF("k", "v")
    df.createOrReplaceTempView("graft_hp_beq")
    spark.conf.set("graft.write.splitByPartition", "true")
    try spark.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY (bucket(8, k)) " +
      "AS SELECT * FROM graft_hp_beq")
    finally spark.conf.unset("graft.write.splitByPartition")
    assert(plannedFiles(spark.sql(s"SELECT * FROM graft.`$b`")) === 8)
    val one = plannedFiles(spark.sql(
      s"SELECT * FROM graft.`$b` WHERE k = 1234"))
    assert(one === 1, s"bucket point lookup should plan 1 file, got $one")
    assert(spark.sql(s"SELECT v FROM graft.`$b` WHERE k = 1234")
      .head.getString(0) === "v_1234")
    // IN-list: at most one file per distinct bucket
    val few = plannedFiles(spark.sql(
      s"SELECT * FROM graft.`$b` WHERE k IN (7, 1234, 3999)"))
    assert(few <= 3)
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$b` " +
      "WHERE k IN (7, 1234, 3999)").head.getLong(0) === 3)
  }

  test("truncate + years transforms: derivation and range pruning") {
    registerCatalog()
    import spark.implicits._
    val b = tmp("tr")
    val df = (0 until 1000).map { i =>
      val cat = Seq("ALPHA", "BETA", "GAMMA", "DELTA")(i % 4)
      (i.toLong, s"$cat-${i % 10}",
        java.sql.Date.valueOf(s"${2009 + i % 3}-06-15"))
    }.toDF("id", "category", "d")
    df.createOrReplaceTempView("graft_hp_tr")
    spark.conf.set("graft.write.splitByPartition", "true")
    try spark.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY " +
      "(truncate(2, category), years(d)) AS SELECT * FROM graft_hp_tr")
    finally spark.conf.unset("graft.write.splitByPartition")
    val v = Manifests.latestVersion(spark, b).get
    val (specs, segs) = Manifests.partitionedBy(spark, b, v).get
    assert(specs === Seq("truncate[2](category)", "years(d)"))
    val pv = spark.read.parquet(segs: _*)
    assert(pv.schema.fieldNames.toSet ===
      Set("file", "category_trunc", "d_year"))
    assert(pv.select("category_trunc").distinct().collect()
      .map(_.getString(0)).sorted === Array("AL", "BE", "DE", "GA"))
    // 4 prefixes × 3 years = 12 split files
    assert(plannedFiles(spark.sql(s"SELECT * FROM graft.`$b`")) === 12)
    // string prefix pruning through equality on the source
    val one = plannedFiles(spark.sql(
      s"SELECT * FROM graft.`$b` WHERE category = 'BETA-3' AND " +
        "d >= DATE '2011-01-01'"))
    assert(one === 1, s"prefix+year pruning should plan 1 file, got $one")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$b` " +
      "WHERE category = 'BETA-3' AND d >= DATE '2011-01-01'")
      .head.getLong(0) ===
      df.filter($"category" === "BETA-3" && $"d" >= "2011-01-01").count())
  }

  test("dynamic INSERT OVERWRITE replaces exactly the months the batch holds") {
    registerCatalog()
    import spark.implicits._
    val b = tmp("dyn")
    monthlyDf.createOrReplaceTempView("graft_hp_dyn")
    spark.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY (months(invoice_ts)) " +
      "AS SELECT * FROM graft_hp_dyn")
    val before = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // replacement batch: ONLY February rows, new amounts
      (0 until 50).map(i => (90000L + i, java.sql.Timestamp.valueOf(
          "2011-02-10 09:00:00"), 7.0))
        .toDF("sale_id", "invoice_ts", "amount")
        .createOrReplaceTempView("graft_hp_feb")
      spark.sql(s"INSERT OVERWRITE graft.`$b` SELECT * FROM graft_hp_feb")
    } finally before match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val byMonth = spark.sql(
      s"""SELECT month(invoice_ts) AS m, COUNT(*) AS n
         |FROM graft.`$b` GROUP BY month(invoice_ts)""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // Jan/Mar/Apr untouched (1000 each), Feb replaced by the 50 rows
    assert(byMonth === Map(1 -> 1000L, 2 -> 50L, 3 -> 1000L, 4 -> 1000L))
  }

  test("registered sql_hidden_partition: month-range predicate prunes to the year's files") {
    val q = graft.SparkEntry.queries("sql_hidden_partition")(
      spark, TestSpark.sf)
    val rows = q.collect()
    assert(rows.length === 12, "one row per 1995 month")
    // the fixture's cleaned frame spans 1992-1998 (~80 month files in
    // split layout); the 1995 range must plan ≤ 13 files (12 target
    // months + at most the widened `< Jan-1996` boundary file) — the
    // pruning a monthly 100 TB fact needs to answer one year's query
    // proportionally to the year
    val planned = plannedFiles(q)
    assert(planned <= 13 && planned >= 12,
      s"month-range pruning planned $planned files")
  }

  test("INSERT INTO a monthly table derives tuples for the appended files; pruning stays exact") {
    registerCatalog()
    import spark.implicits._
    val b = tmp("ins")
    monthlyDf.createOrReplaceTempView("graft_hp_ins")
    spark.conf.set("graft.write.splitByPartition", "true")
    try {
      spark.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY " +
        "(months(invoice_ts)) AS SELECT * FROM graft_hp_ins")
      // a plain INSERT INTO lands rows in a NEW month (May) — the
      // append must derive month tuples for its files under the
      // recorded spec, with no rescan of the old files
      (0 until 70).map(i => (80000L + i, java.sql.Timestamp.valueOf(
          "2011-05-05 08:00:00"), 3.0))
        .toDF("sale_id", "invoice_ts", "amount")
        .createOrReplaceTempView("graft_hp_may")
      spark.sql(s"INSERT INTO graft.`$b` SELECT * FROM graft_hp_may")
    } finally spark.conf.unset("graft.write.splitByPartition")
    val v = Manifests.latestVersion(spark, b).get
    val (_, segs) = Manifests.partitionedBy(spark, b, v).get
    val months = spark.read.parquet(segs: _*)
      .select("invoice_ts_month").distinct().collect()
      .map(_.getInt(0)).sorted
    assert(months === Array(24132, 24133, 24134, 24135, 24136),
      "the appended May files must carry derived tuples")
    // May-only predicate plans only the appended file(s)
    val may = plannedFiles(spark.sql(
      s"SELECT * FROM graft.`$b` WHERE invoice_ts >= " +
        "TIMESTAMP '2011-05-01 00:00:00'"))
    assert(may === 1, s"May predicate should plan 1 appended file, got $may")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$b` " +
      "WHERE invoice_ts >= TIMESTAMP '2011-05-01 00:00:00'")
      .head.getLong(0) === 70)
    assert(spark.table(s"graft.`$b`").count() === 4070)
  }

  test("runtime join filter prunes bucket-partitioned fact FILES through the transform") {
    registerCatalog()
    import spark.implicits._
    val f = tmp("rtf")
    val dd = tmp("rtd")
    val fact = (1 to 8000).map(i =>
      ((i % 500 + 1).toLong, i * 1.0)).toDF("k", "amount")
    fact.createOrReplaceTempView("graft_hp_rtf")
    spark.conf.set("graft.write.splitByPartition", "true")
    try spark.sql(s"CREATE TABLE graft.`$f` PARTITIONED BY (bucket(8, k)) " +
      "AS SELECT * FROM graft_hp_rtf")
    finally spark.conf.unset("graft.write.splitByPartition")
    Manifests.commitData((1 to 500).map(i =>
      (i.toLong, s"d_$i")).toDF("k", "name"), dd)
    // the dim filter is invisible at plan time — only the RUNTIME
    // surviving join keys can prune, and they must lower through the
    // bucket transform to the tuple sidecar
    val q =
      s"""SELECT COUNT(*) AS n FROM graft.`$f` t
         |JOIN graft.`$dd` d ON t.k = d.k
         |WHERE d.name IN ('d_7', 'd_13')""".stripMargin
    val all = plannedFiles(spark.sql(s"SELECT * FROM graft.`$f`"))
    assert(all === 8)
    val qdf = spark.sql(q)
    val pruned = {
      qdf.collect()
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
      go(qdf.queryExecution.executedPlan)
      buf.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.toString.contains(f.stripPrefix("/")) =>
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
      }.min
    }
    assert(pruned <= 2,
      s"runtime keys {7,13} hit ≤2 buckets, planned $pruned files")
    assert(spark.sql(q).head.getLong(0) === 32L)
  }

  test("months-SPJ: two monthly tables join on the raw timestamp with zero Exchange") {
    registerCatalog()
    import spark.implicits._
    val da = tmp("mja")
    val db = tmp("mjb")
    monthlyDf.createOrReplaceTempView("graft_hp_mja")
    // per-timestamp rollup co-partitioned monthly
    spark.conf.set("graft.write.splitByPartition", "true")
    try {
      spark.sql(s"CREATE TABLE graft.`$da` PARTITIONED BY " +
        "(months(invoice_ts)) AS SELECT * FROM graft_hp_mja")
      spark.sql(s"CREATE TABLE graft.`$db` PARTITIONED BY " +
        "(months(invoice_ts)) AS SELECT invoice_ts, " +
        "COUNT(*) AS n_sales FROM graft_hp_mja GROUP BY invoice_ts")
    } finally spark.conf.unset("graft.write.splitByPartition")
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val old = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "true")
      spark.conf.set(keys(2), "-1")
      val q = spark.sql(
        s"""SELECT /*+ MERGE(r) */ a.sale_id, r.n_sales
           |FROM graft.`$da` a JOIN graft.`$db` r
           |  ON a.invoice_ts = r.invoice_ts""".stripMargin)
      val joins = finalNodes(q).filter {
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
        case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
        case _ => false
      }
      assert(joins.size === 1)
      assert(joins.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty,
        s"months-SPJ join still exchanges:\n${joins.head.toString.take(2500)}")
      assert(q.count() === 4000)
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("identity guards: DDL on a transform SOURCE column refuses; metadata delete stays identity-only") {
    registerCatalog()
    import spark.implicits._
    val b = tmp("guard")
    monthlyDf.createOrReplaceTempView("graft_hp_guard")
    spark.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY (months(invoice_ts)) " +
      "AS SELECT * FROM graft_hp_guard")
    // renaming the transform SOURCE is a METADATA commit since r18:
    // spec + sidecar re-key under the new name, zero data files moved
    val filesBefore = Manifests.files(spark, b, 0)
    spark.sql(s"ALTER TABLE graft.`$b` RENAME COLUMN invoice_ts TO ts2")
    val vr = Manifests.latestVersion(spark, b).get
    assert(Manifests.files(spark, b, vr) === filesBefore)
    assert(Manifests.partitionedBy(spark, b, vr).get._1 ===
      Seq("months(ts2)"))
    // a DELETE keyed on the (renamed) transform SOURCE must take the
    // row-level path (a month tuple cannot delimit one day) — exact
    spark.sql(s"DELETE FROM graft.`$b` WHERE ts2 = " +
      "TIMESTAMP '2011-02-03 10:30:00'")
    val expect = monthlyDf.filter(
      $"invoice_ts" =!= java.sql.Timestamp.valueOf("2011-02-03 10:30:00"))
      .count()
    assert(spark.table(s"graft.`$b`").count() === expect)
  }

  test("time transforms are UTC-pinned: writer and reader session zones never disagree") {
    registerCatalog()
    import spark.implicits._
    val b = tmp("tz")
    // instants straddling the UTC Feb/Mar 2011 boundary by a few hours
    // on each side — exactly the rows a session-TZ derivation (or
    // lowering) would misclassify into the wrong month granule
    val feb28 = java.time.Instant.parse("2011-02-28T22:00:00Z")
    val rows = (0 until 12).map { h =>
      (h.toLong, new java.sql.Timestamp(
        feb28.plusSeconds(h * 3600L).toEpochMilli), h * 1.0)
    }
    val old = spark.conf.get("spark.sql.session.timeZone")
    try {
      // WRITE under a UTC+ zone
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      rows.toDF("sale_id", "invoice_ts", "amount")
        .createOrReplaceTempView("graft_hp_tz")
      spark.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY " +
        "(months(invoice_ts)) AS SELECT * FROM graft_hp_tz")
      // the sidecar tuples must be the UTC months: 2011-02 and 2011-03
      val (_, segs) = Manifests.partitionedBy(spark, b, 0).get
      val tuples = spark.read.parquet(segs: _*)
        .select("invoice_ts_month").distinct().collect()
        .map(_.getInt(0)).sorted.toSeq
      assert(tuples === Seq(2011 * 12 + 1, 2011 * 12 + 2),
        s"expected UTC month tuples, got $tuples")
      // READ under a UTC- zone: an instant-literal predicate returns
      // exactly the instants it names — a session-TZ lowering against
      // the UTC-derived tuples would prune the boundary file wrongly
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val cut = new java.sql.Timestamp(
        java.time.Instant.parse("2011-03-01T00:00:00Z").toEpochMilli)
      val got = spark.table(s"graft.`$b`")
        .filter($"invoice_ts" >= lit(cut)).count()
      assert(got === rows.count(_._2.getTime >= cut.getTime).toLong)
    } finally spark.conf.set("spark.sql.session.timeZone", old)
  }

  test("hours over TIMESTAMP_NTZ refuses at CREATE (Spark 4 has no NTZ->numeric cast)") {
    registerCatalog()
    val b = tmp("ntz")
    spark.sql("SELECT 1L AS id, TIMESTAMP_NTZ '2011-01-01 10:00:00' AS ts")
      .createOrReplaceTempView("graft_hp_ntz")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY (hours(ts)) " +
        "AS SELECT * FROM graft_hp_ntz")
    }
    assert(e.getMessage.contains("hours"), e.getMessage)
    // the calendar transforms DO admit NTZ (wall-clock date part)
    val b2 = tmp("ntz2")
    spark.sql(s"CREATE TABLE graft.`$b2` PARTITIONED BY (months(ts)) " +
      "AS SELECT * FROM graft_hp_ntz")
    assert(spark.table(s"graft.`$b2`").count() === 1)
  }

  test("decimal truncate: unscaled floor derivation, exact pruning, Iceberg width semantics") {
    registerCatalog()
    import spark.implicits._
    val b = tmp("dec")
    // amounts 0.00 .. 39.96 as DECIMAL(9,2); truncate[1000] floors the
    // UNSCALED value to multiples of 1000 = granules of 10.00
    (0 until 4)
      .flatMap(g => (0 until 100).map(i =>
        (g * 100 + i.toLong, BigDecimal((g * 1000 + i * 4) / 100.0)
          .setScale(2))))
      .toDF("id", "amount")
      .withColumn("amount", $"amount".cast("decimal(9,2)"))
      .repartitionByRange(4, $"amount")
      .createOrReplaceTempView("graft_hp_dec")
    spark.conf.set("graft.write.splitByPartition", "true")
    try spark.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY " +
      "(truncate(1000, amount)) AS SELECT * FROM graft_hp_dec")
    finally spark.conf.unset("graft.write.splitByPartition")
    val (_, segs) = Manifests.partitionedBy(spark, b, 0).get
    val tuples = spark.read.parquet(segs: _*)
      .select("amount_trunc").distinct().collect()
      .map(_.getDecimal(0).unscaledValue().longValueExact()).sorted.toSeq
    assert(tuples === Seq(0L, 1000L, 2000L, 3000L), s"tuples: $tuples")
    // range predicate on the source prunes to the matching granules —
    // typed to the column's exact decimal so the comparison pushes as
    // an attribute filter (a bare 30.0 double literal casts the COLUMN
    // and nothing translates, which only loses pruning, not rows)
    val q = spark.table(s"graft.`$b`")
      .filter(expr("amount >= CAST(30.00 AS DECIMAL(9,2))"))
    assert(plannedFiles(q) < 4, "decimal truncate pruning never bit")
    assert(q.count() === 100)
    // point lookup: equality lowers through the unscaled floor
    val p = spark.table(s"graft.`$b`")
      .filter(expr("amount = CAST(10.04 AS DECIMAL(9,2))"))
    assert(plannedFiles(p) < plannedFiles(spark.table(s"graft.`$b`")),
      "decimal equality pruning never bit")
    assert(p.count() === 1)
  }

  test("tuple-name collisions refuse at CREATE: shadowed sidecar columns would corrupt pruning") {
    registerCatalog()
    val b = tmp("collide")
    // a real column named ts_month beside months(ts) — the sidecar
    // would write two columns under one name
    spark.sql("SELECT 1L AS id, TIMESTAMP '2011-01-01 10:00:00' AS ts, " +
      "7 AS ts_month").createOrReplaceTempView("graft_hp_collide")
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY " +
        "(months(ts), ts_month) AS SELECT * FROM graft_hp_collide")
    }
    assert(e.getMessage.contains("collide"), e.getMessage)
    // 'file' is the sidecar's reserved join key
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY (file) AS " +
        "SELECT id, ts, ts_month, 'x' AS file FROM graft_hp_collide")
    }
    assert(e2.getMessage.contains("file"), e2.getMessage)
  }
}
