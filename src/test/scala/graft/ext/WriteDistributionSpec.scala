package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Write-side distribution contract
  * ([[graft.sources.manifest.ManifestWriteDistribution]]): row-level
  * writes request partition-column clustering (plus `_file` for
  * position deltas), non-strict, so Spark plans an AQE-sized
  * REBALANCE before the write — a wide DML at high parallelism emits
  * ~one file per clustered partition, not one fragment per task. */
class WriteDistributionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_wdist_wh").toString
    CatalogTestSupport.registerFreshCatalog(spark, d)
    d
  }

  private def sql(s: String) = spark.sql(s)

  private def mkPartitioned(ns: String, files: Int = 12): String = {
    wh
    sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    sql(s"CREATE TABLE graft.$ns.t (id BIGINT, grp INT, s STRING) " +
      "USING manifest PARTITIONED BY (grp)")
    (1 to 2400).map(i => (i.toLong, i % 4, s"v$i"))
      .toDF("id", "grp", "s").repartition(files)
      .createOrReplaceTempView(s"${ns}_src")
    sql(s"INSERT INTO graft.$ns.t SELECT * FROM ${ns}_src")
    s"$wh/$ns/t"
  }

  test("CoW UPDATE plans a REBALANCE on the partition columns; distribution=none opts out") {
    val b = mkPartitioned("wdista")
    val explain = sql("EXPLAIN UPDATE graft.wdista.t SET s = 'x' " +
      "WHERE id % 2 = 0").head.getString(0)
    assert(explain.toLowerCase.contains("rebalance"),
      s"no rebalance in the CoW write plan:\n$explain")
    try {
      spark.conf.set("graft.write.distribution", "none")
      val off = sql("EXPLAIN UPDATE graft.wdista.t SET s = 'x' " +
        "WHERE id % 2 = 0").head.getString(0)
      assert(!off.toLowerCase.contains("rebalance"),
        s"distribution=none must drop the rebalance:\n$off")
    } finally spark.conf.unset("graft.write.distribution")
  }

  test("delta (MoR) MERGE plans a REBALANCE clustered on partition cols + _file") {
    val b = mkPartitioned("wdistb")
    sql(s"CALL graft.system.delete_mor('wdistb.t', 'id % 17 = 0')")
    Seq((1L, 0, "u1"), (9001L, 1, "n1")).toDF("id", "grp", "s")
      .createOrReplaceTempView("wdistb_upd")
    val explain = sql(
      """EXPLAIN MERGE INTO graft.wdistb.t t USING wdistb_upd u
        |ON t.id = u.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head.getString(0)
    assert(explain.toLowerCase.contains("rebalance"),
      s"no rebalance in the delta write plan:\n$explain")
    assert(explain.contains("_file"),
      s"delta rebalance must cluster on _file:\n$explain")
  }

  test("unpartitioned CoW write stays unspecified: no rebalance, and an advisory size must not throw") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.wdiste")
    (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .createOrReplaceTempView("wdiste_src")
    sql("CREATE TABLE graft.wdiste.t AS SELECT * FROM wdiste_src")
    try {
      // the empty-clustering trap: Spark refuses an advisory partition
      // size over an unspecified distribution — an unpartitioned table
      // must not declare one
      spark.conf.set("graft.write.advisoryPartitionBytes", "134217728")
      sql("UPDATE graft.wdiste.t SET s = 'u' WHERE id % 2 = 0")
      assert(sql("SELECT COUNT(*) AS n FROM graft.wdiste.t WHERE s = 'u'")
        .head.getLong(0) === 250)
      val explain = sql("EXPLAIN UPDATE graft.wdiste.t SET s = 'x' " +
        "WHERE id % 2 = 1").head.getString(0)
      assert(!explain.toLowerCase.contains("rebalance"),
        s"unpartitioned CoW write must not request a distribution:\n$explain")
    } finally spark.conf.unset("graft.write.advisoryPartitionBytes")
  }

  test("INSERT INTO (the V1 append face) clusters by partition columns — files per insert ≈ partitions") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.wdistf")
    sql("CREATE TABLE graft.wdistf.t (id BIGINT, grp INT, s STRING) " +
      "USING manifest PARTITIONED BY (grp)")
    val b = s"$wh/wdistf/t"
    (1 to 2400).map(i => (i.toLong, i % 4, s"v$i"))
      .toDF("id", "grp", "s").repartition(12)
      .createOrReplaceTempView("wdistf_src")
    sql("INSERT INTO graft.wdistf.t SELECT * FROM wdistf_src")
    val v = Manifests.latestVersion(spark, b).get
    val n = Manifests.files(spark, b, v).size
    assert(n <= 4,
      s"12-partition INSERT INTO wrote $n files for a 4-partition table")
    assert(sql("SELECT COUNT(*) AS n FROM graft.wdistf.t WHERE grp = 1")
      .head.getLong(0) === 600)
  }

  test("streaming epochs cluster by partition columns — files per trigger ≈ partitions touched") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.wdistg")
    sql("CREATE TABLE graft.wdistg.t (id BIGINT, grp INT, s STRING) " +
      "USING manifest PARTITIONED BY (grp)")
    val b = s"$wh/wdistg/t"
    val root = java.nio.file.Files
      .createTempDirectory("graft_wdist_stream").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Int, String)]
    val q = input.toDF().toDF("id", "grp", "s")
      .repartition(12) // many tasks INTO the sink
      .writeStream.option("checkpointLocation", s"$root/ckpt")
      .outputMode("append").toTable("graft.wdistg.t")
    try {
      input.addData((1 to 1200).map(i => (i.toLong, i % 3, s"v$i")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val v = Manifests.latestVersion(spark, b).get
    val n = Manifests.files(spark, b, v).size
    assert(n <= 3,
      s"one 12-task trigger wrote $n files for 3 touched partitions")
    assert(spark.table("graft.wdistg.t").count() === 1200)
  }

  test("wide CoW UPDATE writes ~one file per partition, not one per input task") {
    def filesAdded(ns: String, dist: Boolean): Int = {
      val b = mkPartitioned(ns)
      val v0 = Manifests.latestVersion(spark, b).get
      val before = Manifests.files(spark, b, v0).map(Dfs.canonical).toSet
      try {
        if (!dist) spark.conf.set("graft.write.distribution", "none")
        sql(s"UPDATE graft.$ns.t SET s = 'w'") // every row: full rewrite
      } finally spark.conf.unset("graft.write.distribution")
      val v1 = Manifests.latestVersion(spark, b).get
      (Manifests.files(spark, b, v1).map(Dfs.canonical).toSet -- before).size
    }
    val without = filesAdded("wdistc", dist = false)
    val withDist = filesAdded("wdistd", dist = true)
    assert(withDist <= 4,
      s"clustered rewrite wrote $withDist files for 4 partitions")
    assert(withDist < without,
      s"distribution did not reduce fragmentation: $withDist vs $without")
    // content survives the re-clustering, partition pruning intact
    assert(sql("SELECT COUNT(*) FROM graft.wdistd.t WHERE grp = 2")
      .head.getLong(0) === 600)
  }
}
