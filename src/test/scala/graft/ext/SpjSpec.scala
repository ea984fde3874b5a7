package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins (Iceberg SPJ parity): the manifest scan
  * reports `KeyGroupedPartitioning` over the table's partition columns
  * whenever the version's PURITY PROOF holds (every file covered by
  * the tuple sidecar, exactly one tuple per file), so two tables
  * partitioned on the same key join with ZERO Exchange on either side.
  * The proof is checked per version, never assumed — the default
  * range-clustered layout (boundary files may mix tuples) degrades to
  * today's shuffle plan, byte-identical results. */
class SpjSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def registerCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.manifest.ManifestCatalog")

  private def dimDf = {
    import spark.implicits._
    (1 to 2000).map(i => (i.toLong, s"cust_$i", s"N${i % 8}"))
      .toDF("customer_key", "customer_id", "country")
  }

  private def factDf = {
    import spark.implicits._
    (1 to 40000).map(i =>
      (i.toLong, s"N${i % 8}", (i % 50).toLong, i * 1.5))
      .toDF("sale_id", "country", "quantity", "amount")
  }

  /** Execute and return every physical node, unwrapped through AQE
    * boundaries (the plan string alone summarizes stages as leaves). */
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

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    finalNodes(df).count {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
      case _ => false
    }

  private def withSpj[A](partial: Boolean = false)(f: => A): A = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val old = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set(keys(0), "true")
      spark.conf.set(keys(1), "true")
      spark.conf.set(keys(2), partial.toString)
      // force a shuffle-family join: the contract is zero Exchange
      // WITHOUT broadcast help
      spark.conf.set(keys(3), "-1")
      f
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def splitCommit(df: org.apache.spark.sql.DataFrame,
      base: String, cols: Seq[String]): Unit = {
    spark.conf.set("graft.write.splitByPartition", "true")
    try Manifests.commitDataPartitioned(df, base, cols): Unit
    finally spark.conf.unset("graft.write.splitByPartition")
  }

  test("split layout yields the purity proof; default layout may not lie") {
    val b = java.nio.file.Files
      .createTempDirectory("graft_spj_pure").toString + "/t"
    splitCommit(dimDf, b, Seq("country"))
    val v = Manifests.latestVersion(spark, b).get
    val idx = new ManifestFileIndex(spark, b, v)
    val proof = idx.purePartitionTuples
    assert(proof.isDefined, "split-layout commit failed the purity proof")
    val (pcols, tuples) = proof.get
    assert(pcols === Seq("country"))
    // every manifest file mapped, 8 distinct tuples
    assert(tuples.keySet === Manifests.files(spark, b, v).map(Dfs.canonical).toSet)
    assert(tuples.values.toSeq.distinct.size === 8)
    // one file per tuple: the split writer co-locates before splitting
    assert(tuples.size === 8,
      s"expected ~1 file per tuple, got ${tuples.size}")
    // content identical to the source (partition columns stay IN data)
    assert(Manifests.readLatest(spark, b).orderBy("customer_key")
      .collect() === dimDf.orderBy("customer_key").collect())
  }

  test("co-partitioned catalog join plans ZERO shuffle exchange (SPJ)") {
    registerCatalog()
    val da = java.nio.file.Files
      .createTempDirectory("graft_spj_a").toString + "/t"
    val db = java.nio.file.Files
      .createTempDirectory("graft_spj_b").toString + "/t"
    splitCommit(dimDf, da, Seq("country"))
    splitCommit(factDf, db, Seq("country"))
    val sqlText =
      s"""SELECT a.country, COUNT(*) AS n, SUM(b.amount) AS amt
         |FROM graft.`$da` a JOIN graft.`$db` b
         |  ON a.country = b.country
         |GROUP BY a.country""".stripMargin
    // baseline with SPJ forced OFF: the same join shuffles both sides
    // (v2 bucketing is ON by default in Spark 4 — SPJ needs no opt-in)
    val keys = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val before = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "false")
    spark.conf.set(keys(1), "-1")
    val baseline =
      try shuffleCount(spark.sql(sqlText))
      finally before.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    assert(baseline >= 2, s"baseline should shuffle both sides, got $baseline")
    withSpj() {
      val q = spark.sql(sqlText)
      val nodes = finalNodes(q)
      val shuffles = nodes.count {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
        case _ => false
      }
      // the JOIN itself must be exchange-free; the final single-group
      // aggregation may still shuffle ABOVE it — locate the join and
      // assert no exchange below either side
      val joins = nodes.filter {
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
        case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
        case _ => false
      }
      assert(joins.size === 1, s"expected one shuffle-family join node")
      val underJoin = joins.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(underJoin.isEmpty,
        s"SPJ join still exchanges:\n${joins.head.toString.take(3000)}")
      assert(shuffles < baseline,
        s"SPJ did not reduce shuffles: $shuffles vs baseline $baseline")
      // values: 250 dim rows × 5000 fact rows per country
      val rows = q.collect()
      assert(rows.length === 8)
      assert(rows.map(_.getLong(1)).sum === 8L * 250 * 5000)
    }
  }

  test("SPJ survives a split-layout INSERT; default-layout append degrades conservatively") {
    registerCatalog()
    val b = java.nio.file.Files
      .createTempDirectory("graft_spj_ins").toString + "/t"
    splitCommit(dimDf, b, Seq("country"))
    // split-layout append: proof must still hold
    spark.conf.set("graft.write.splitByPartition", "true")
    try {
      import spark.implicits._
      Manifests.append((1 to 100).map(i =>
        (100000L + i, s"x_$i", s"N${i % 8}"))
        .toDF("customer_key", "customer_id", "country"), b)
    } finally spark.conf.unset("graft.write.splitByPartition")
    val v1 = Manifests.latestVersion(spark, b).get
    assert(new ManifestFileIndex(spark, b, v1).purePartitionTuples.isDefined,
      "split-layout append broke the purity proof")
    // a plain (non-split) append writes files that may straddle
    // tuples: the proof must refuse rather than guess
    import spark.implicits._
    Manifests.append((1 to 64).map(i =>
      (200000L + i, s"y_$i", s"N${i % 8}"))
      .toDF("customer_key", "customer_id", "country").coalesce(1), b)
    val v2 = Manifests.latestVersion(spark, b).get
    assert(new ManifestFileIndex(spark, b, v2).purePartitionTuples.isEmpty,
      "an 8-tuple single file must fail the purity proof")
    // and the read is still exactly right (fallback, not failure)
    assert(Manifests.readLatest(spark, b).count() === 2164)
  }

  test("partially-clustered distribution + AQE: SPJ join stays exchange-free and exact") {
    registerCatalog()
    val da = java.nio.file.Files
      .createTempDirectory("graft_spj_pca").toString + "/t"
    val db = java.nio.file.Files
      .createTempDirectory("graft_spj_pcb").toString + "/t"
    splitCommit(dimDf, da, Seq("country"))
    splitCommit(factDf, db, Seq("country"))
    withSpj(partial = true) {
      val q = spark.sql(
        s"""SELECT a.country, b.sale_id, a.customer_key
           |FROM graft.`$da` a JOIN graft.`$db` b
           |  ON a.country = b.country
           |WHERE a.customer_key <= 2 AND b.sale_id <= 8""".stripMargin)
      val nodes = finalNodes(q)
      val joins = nodes.filter {
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
        case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
        case _ => false
      }
      assert(joins.nonEmpty)
      assert(joins.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, "partially-clustered SPJ join still exchanges")
      // exact content: 2 customers × 8 sales, matched on country
      val expect = dimDf.filter(col("customer_key") <= 2)
        .join(factDf.filter(col("sale_id") <= 8), "country")
        .select("country", "sale_id", "customer_key")
        .collect().map(_.toString).sorted
      assert(q.collect().map(_.toString).sorted === expect)
    }
  }

  test("skew-aware SPJ: a 90%-hot key splits across tasks under partially-clustered distribution, zero Exchange") {
    registerCatalog()
    import spark.implicits._
    val da = java.nio.file.Files
      .createTempDirectory("graft_spj_ska").toString + "/t"
    val db = java.nio.file.Files
      .createTempDirectory("graft_spj_skb").toString + "/t"
    splitCommit(dimDf, da, Seq("country"))
    // fact: ~90% of rows under N7, landed as a bootstrap + 3 split
    // appends so the hot tuple holds MULTIPLE files — the shape plain
    // SPJ serializes into one task per tuple
    val skew = (1 to 40000).map { i =>
      val c = if (i % 10 != 0) "N7" else s"N${i % 8}"
      (i.toLong, c, i * 1.0)
    }.toDF("sale_id", "country", "amount")
    spark.conf.set("graft.write.splitByPartition", "true")
    try {
      Manifests.commitDataPartitioned(
        skew.filter($"sale_id" % 4 === 0), db, Seq("country"))
      (1 to 3).foreach(k => Manifests.appendBatch(
        skew.filter($"sale_id" % 4 === k), db, k.toLong, "spjskew"): Unit)
    } finally spark.conf.unset("graft.write.splitByPartition")
    val sql =
      s"""SELECT a.customer_key, b.sale_id
         |FROM graft.`$da` a JOIN graft.`$db` b
         |  ON a.country = b.country""".stripMargin
    def run(partial: Boolean): (Int, Int, Long) = withSpj(partial) {
      val q = spark.sql(sql)
      val n = q.count()
      val shuffles = shuffleCount(spark.sql(sql))
      // join parallelism = the executed join's RDD partition count
      // (no shuffle above it under SPJ, so this IS the task count on
      // the join stage)
      val parts = spark.sql(sql).rdd.getNumPartitions
      (shuffles, parts, n)
    }
    val expect = dimDf.join(skew, "country").count()
    val (exPlain, partsPlain, nPlain) = run(partial = false)
    val (exPart, partsPart, nPart) = run(partial = true)
    assert(nPlain === expect && nPart === expect,
      s"skewed join content drifted: $nPlain / $nPart vs $expect")
    assert(exPlain === 0 && exPart === 0,
      s"SPJ must stay exchange-free: plain=$exPlain partial=$exPart")
    assert(partsPlain === 8,
      s"plain SPJ groups to one task per tuple, got $partsPlain")
    assert(partsPart > partsPlain,
      s"partially-clustered SPJ must split the hot tuple across " +
        s"tasks: $partsPart vs $partsPlain")
  }

  test("join keys SUPERSET of partition keys: equi-join on (country, extra) over country-bucketed tables stays zero-Exchange") {
    registerCatalog()
    import spark.implicits._
    val da = java.nio.file.Files
      .createTempDirectory("graft_spj_supa").toString + "/t"
    val db = java.nio.file.Files
      .createTempDirectory("graft_spj_supb").toString + "/t"
    // both sides partitioned by country ONLY; the join adds a second
    // equi-key the partitioning does not carry — the common real-query
    // shape (the reference fact table carries six b-tree indexes
    // because queries filter/join on MORE than the partition key).
    // Rows with equal (country, k) are co-located by the country
    // grouping alone, so the join needs no Exchange — Spark admits
    // the superset under requireAllClusterKeysForCoPartition=false.
    val left = (1 to 8000).map(i =>
      (s"N${i % 8}", (i % 40).toLong, i.toLong))
      .toDF("country", "k", "a_val")
    val right = (1 to 4000).map(i =>
      (s"N${i % 8}", (i % 40).toLong, i * 2.0))
      .toDF("country", "k", "b_val")
    splitCommit(left, da, Seq("country"))
    splitCommit(right, db, Seq("country"))
    val sql =
      s"""SELECT a.country, a.k, a.a_val, b.b_val
         |FROM graft.`$da` a JOIN graft.`$db` b
         |  ON a.country = b.country AND a.k = b.k""".stripMargin
    val expect = left.join(right, Seq("country", "k")).count()
    val reqKey = "spark.sql.requireAllClusterKeysForCoPartition"
    val oldReq = spark.conf.getOption(reqKey)
    try withSpj() {
      spark.conf.set(reqKey, "false")
      val q = spark.sql(sql)
      assert(q.count() === expect, "superset-key join content drifted")
      assert(shuffleCount(spark.sql(sql)) === 0,
        "join keys ⊃ partition keys must still plan zero Exchange")
    } finally oldReq match {
      case Some(v) => spark.conf.set(reqKey, v)
      case None => spark.conf.unset(reqKey)
    }
  }

  test("registered sql_spj_join: zero Exchange under the join, oracle-shaped result") {
    val q = graft.SparkEntry.queries("sql_spj_join")(spark, TestSpark.sf)
    val nodes = finalNodes(q)
    val joins = nodes.filter {
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
      case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
      case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
      case _ => false
    }
    assert(joins.size === 1, s"expected exactly one join node, got ${joins.size}")
    assert(joins.head.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
    }.isEmpty,
      s"registered SPJ join still exchanges:\n${joins.head.toString.take(3000)}")
    val rows = q.collect()
    assert(rows.nonEmpty)
    // per-country: n_customers == sum_n / n_customers's own value —
    // the stats side contributes exactly one row per country
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(1) * r.getLong(1),
        s"stats row fan-out broke: $r")
    }
  }

  test("one side filtered by partition key: pushPartValues pads the missing partitions") {
    registerCatalog()
    val da = java.nio.file.Files
      .createTempDirectory("graft_spj_fa").toString + "/t"
    val db = java.nio.file.Files
      .createTempDirectory("graft_spj_fb").toString + "/t"
    splitCommit(dimDf, da, Seq("country"))
    splitCommit(factDf, db, Seq("country"))
    withSpj() {
      val q = spark.sql(
        s"""SELECT a.country, COUNT(*) AS n
           |FROM graft.`$da` a JOIN graft.`$db` b
           |  ON a.country = b.country
           |WHERE a.country IN ('N1', 'N5')
           |GROUP BY a.country""".stripMargin)
      val joins = finalNodes(q).filter {
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
        case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
        case _ => false
      }
      assert(joins.nonEmpty && joins.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, "filtered SPJ join still exchanges")
      val rows = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows === Map("N1" -> 250L * 5000, "N5" -> 250L * 5000))
    }
  }

  test("OPTIMIZE restores SPJ: a proof-less mixed layout compacts into tuple-split files and joins exchange-free") {
    registerCatalog()
    val da = java.nio.file.Files
      .createTempDirectory("graft_spj_opt_a").toString + "/t"
    val db = java.nio.file.Files
      .createTempDirectory("graft_spj_opt_b").toString + "/t"
    // DEFAULT layout, few files: boundary files straddle countries —
    // the proof must refuse
    Manifests.commitDataPartitioned(dimDf, da, Seq("country"),
      filesPerWrite = 3)
    Manifests.commitDataPartitioned(factDf, db, Seq("country"),
      filesPerWrite = 3)
    assert(new ManifestFileIndex(spark, da,
      Manifests.latestVersion(spark, da).get).purePartitionTuples.isEmpty,
      "fixture must start proof-less (mixed boundary files)")
    // manual OPTIMIZE: the partitioned default splits at tuple
    // boundaries and RESTORES the proof on both tables
    Manifests.compact(spark, da, targetFiles = 4)
    Manifests.compact(spark, db, targetFiles = 4)
    Seq(da, db).foreach { t =>
      val v = Manifests.latestVersion(spark, t).get
      val proof = new ManifestFileIndex(spark, t, v).purePartitionTuples
      assert(proof.isDefined, s"compact must restore the purity proof on $t")
      assert(proof.get._2.values.toSeq.distinct.size === 8)
    }
    // and the restored layout joins with zero Exchange under the join
    withSpj() {
      val q = spark.sql(
        s"""SELECT a.country, COUNT(*) AS n
           |FROM graft.`$da` a JOIN graft.`$db` b
           |  ON a.country = b.country
           |GROUP BY a.country""".stripMargin)
      val joins = finalNodes(q).filter {
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => true
        case _: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => true
        case _ => false
      }
      assert(joins.size === 1)
      assert(joins.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty, "post-OPTIMIZE join still exchanges")
      assert(q.collect().map(_.getLong(1)).sum === 8L * 250 * 5000)
    }
  }

  test("auto-compact CREATES purity: a proof-less partitioned table of small files becomes SPJ-eligible by policy") {
    import spark.implicits._
    val b = java.nio.file.Files
      .createTempDirectory("graft_spj_acp").toString + "/t"
    // proof-less bootstrap: one file mixing all 8 countries
    Manifests.commitDataPartitioned(dimDf, b, Seq("country"),
      filesPerWrite = 1)
    val v0 = Manifests.latestVersion(spark, b).get
    assert(new ManifestFileIndex(spark, b, v0).purePartitionTuples.isEmpty)
    spark.conf.set("graft.autocompact.minFiles", "2")
    try {
      // appends trip the census; every live file is small, so the
      // table-wide rewrite splits at tuple boundaries
      Manifests.appendBatch((1 to 64).map(i =>
        (300000L + i, s"z_$i", s"N${i % 8}"))
        .toDF("customer_key", "customer_id", "country").coalesce(1),
        b, 1L, "acspj")
    } finally spark.conf.unset("graft.autocompact.minFiles")
    val v = Manifests.latestVersion(spark, b).get
    assert((0 to v).exists(w =>
      Manifests.tagOf(spark, b, w).contains("autocompact")),
      "policy must have fired")
    val proof = new ManifestFileIndex(spark, b, v).purePartitionTuples
    assert(proof.isDefined,
      "the policy rewrite must have created the purity proof")
    assert(proof.get._2.values.toSeq.distinct.size === 8)
    assert(Manifests.readLatest(spark, b).count() === 2064)
  }

  test("purity proof folds incrementally: warm scans pay no full-sidecar fold, appends pay only their delta") {
    import spark.implicits._
    val b = java.nio.file.Files
      .createTempDirectory("graft_spj_inc").toString + "/t"
    splitCommit(dimDf, b, Seq("country"))
    def proofAt(v: Int) =
      new ManifestFileIndex(spark, b, v).purePartitionTuples
    PurityCache.resetMeters()
    val v0 = Manifests.latestVersion(spark, b).get
    assert(proofAt(v0).isDefined)
    assert(PurityCache.fullFolds === 1L,
      "first cold scan pays exactly one full fold")
    // warm scans: NEW index instances, zero additional folds
    (1 to 3).foreach(_ => assert(proofAt(v0).isDefined))
    assert(PurityCache.fullFolds === 1L && PurityCache.incrementalFolds === 0L,
      s"warm scans re-folded: full=${PurityCache.fullFolds} " +
        s"inc=${PurityCache.incrementalFolds}")
    // a split-layout append extends the segment list by one — the next
    // scan folds ONLY the appended segment
    spark.conf.set("graft.write.splitByPartition", "true")
    try Manifests.append((1 to 80).map(i =>
        (400000L + i, s"w_$i", s"N${i % 8}"))
        .toDF("customer_key", "customer_id", "country"), b)
    finally spark.conf.unset("graft.write.splitByPartition")
    val v1 = Manifests.latestVersion(spark, b).get
    assert(proofAt(v1).isDefined, "append must keep the proof")
    assert(PurityCache.fullFolds === 1L,
      "the post-append scan must not re-fold the whole sidecar")
    assert(PurityCache.incrementalFolds === 1L,
      "the post-append scan folds exactly the appended segment")
    // and again warm
    assert(proofAt(v1).isDefined)
    assert(PurityCache.fullFolds === 1L && PurityCache.incrementalFolds === 1L)
  }

  test("runtime file pruning on the ordinary catalog read: a filtered dim prunes fact FILES") {
    registerCatalog()
    val df = java.nio.file.Files
      .createTempDirectory("graft_dpp_f").toString + "/t"
    val dd = java.nio.file.Files
      .createTempDirectory("graft_dpp_d").toString + "/t"
    splitCommit(factDf, df, Seq("country"))
    // the dim is NOT filterable at plan time — only its runtime
    // surviving join keys can prune the fact, which is exactly what
    // SupportsRuntimeV2Filtering on DvParquetScan lowers to the
    // manifest's partition/zone/bloom machinery
    Manifests.commitData(dimDf, dd)
    def factFiles(sqlText: String): (Int, Boolean) = {
      val q = spark.sql(sqlText)
      val scans = finalNodes(q).collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.scan.isInstanceOf[
              graft.sources.manifest.DvParquetScan] &&
              // COUNT(*) prunes every column, so identify the fact
              // side by its table path in the scan description
              b.toString.contains(df.stripPrefix("/")) => b
      }
      assert(scans.nonEmpty, "no columnar fact scan in the plan")
      // FILES planned, not partitions: under KeyGroupedPartitioning the
      // partition COUNT is preserved across runtime filtering (empty
      // groups keep the distribution stable) — the pruning shows up in
      // the file lists
      val files = scans.map(_.inputRDD.partitions.map {
        case dp: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
          dp.inputPartitions.map {
            case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
              fp.files.length
            case _ => 0
          }.sum
        case _ => 0
      }.sum).min
      (files, scans.exists(_.runtimeFilters.nonEmpty))
    }
    val (unfiltered, _) = factFiles(
      s"""SELECT COUNT(*) AS n FROM graft.`$df` f
         |JOIN graft.`$dd` d ON f.country = d.country""".stripMargin)
    val (filtered, hadRf) = factFiles(
      s"""SELECT COUNT(*) AS n FROM graft.`$df` f
         |JOIN graft.`$dd` d ON f.country = d.country
         |WHERE d.customer_id IN ('cust_1', 'cust_9')""".stripMargin)
    assert(hadRf, "no runtime filter reached the fact scan")
    // cust_1 -> N1, cust_9 -> N1: one surviving country of eight — the
    // fact side must plan strictly fewer FILES
    assert(filtered < unfiltered,
      s"runtime filter did not prune fact files: $filtered vs $unfiltered")
    assert(filtered === 1, s"one surviving country = one split file, got $filtered")
    // and the result stays exact
    val n = spark.sql(
      s"""SELECT COUNT(*) AS n FROM graft.`$df` f
         |JOIN graft.`$dd` d ON f.country = d.country
         |WHERE d.customer_id IN ('cust_1', 'cust_9')""".stripMargin)
      .head.getLong(0)
    assert(n === 2L * 5000)
  }
}
