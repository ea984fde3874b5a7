package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDF update images — Delta parity for the `.changes` feed's UPDATE
  * tagging: with `graft.cdf.updateImages=true` the `SupportsDelta`
  * write records WHICH rowIds/image files belonged to UPDATE actions
  * (`_cdcupd` + a `cdc_` sidecar), and the per-version replay feed
  * ([[Manifests.changesAt]] / [[Manifests.changesBetweenWithUpdates]])
  * emits `update_preimage`/`update_postimage` pairs instead of bare
  * delete+insert. Default-off: the split representation stays the
  * back-compat shape. */
class CdfUpdateImagesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_cdf_wh").toString
    CatalogTestSupport.registerFreshCatalog(spark, d)
    d
  }

  private def sql(s: String) = spark.sql(s)

  private def mk(ns: String, rows: Int = 400): String = {
    wh
    sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    (1 to rows).map(i => (i.toLong, i % 5, s"v$i"))
      .toDF("id", "grp", "s").createOrReplaceTempView(s"${ns}_src")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM ${ns}_src")
    s"$wh/$ns/t"
  }

  private def withImages[A](f: => A): A = {
    spark.conf.set("graft.dml.mode", "mor")
    spark.conf.set("graft.cdf.updateImages", "true")
    try f finally {
      spark.conf.unset("graft.dml.mode")
      spark.conf.unset("graft.cdf.updateImages")
    }
  }

  private def tagCounts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("MoR UPDATE with images: the per-version replay pairs pre/post exactly") {
    val b = mk("cdfa")
    withImages {
      sql("UPDATE graft.cdfa.t SET s = 'mut' WHERE id % 7 = 0")
    }
    val w = Manifests.latestVersion(spark, b).get
    val feed = Manifests.changesAt(spark, b, w)
    val counts = tagCounts(feed)
    val updated = 400 / 7
    assert(counts.getOrElse("update_preimage", 0L) === updated.toLong)
    assert(counts.getOrElse("update_postimage", 0L) === updated.toLong)
    assert(!counts.contains("insert") && !counts.contains("delete"),
      s"a pure UPDATE must emit only update images: $counts")
    // images pair 1:1 on the key, old value on the pre side, new on
    // the post side
    val pre = feed.filter(col("_change_type") === "update_preimage")
    val post = feed.filter(col("_change_type") === "update_postimage")
    assert(pre.filter(col("s") === "mut").count() === 0)
    assert(post.filter(col("s") =!= "mut").count() === 0)
    assert(pre.select("id").except(post.select("id")).count() === 0)
    assert(post.select("id").except(pre.select("id")).count() === 0)
  }

  test("MERGE mixes tags: update pairs + plain inserts + plain deletes, exact counts") {
    val b = mk("cdfb")
    Seq((1L, 0, "u1"), (2L, 0, "u2"), (9001L, 9, "n1"), (9002L, 9, "n2"),
      (3L, 0, "kill"))
      .toDF("id", "grp", "s").createOrReplaceTempView("cdfb_upd")
    withImages {
      sql("""MERGE INTO graft.cdfb.t t USING cdfb_upd u ON t.id = u.id
            |WHEN MATCHED AND u.s = 'kill' THEN DELETE
            |WHEN MATCHED THEN UPDATE SET *
            |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    val w = Manifests.latestVersion(spark, b).get
    val counts = tagCounts(Manifests.changesAt(spark, b, w))
    assert(counts.getOrElse("update_preimage", 0L) === 2L, counts.toString)
    assert(counts.getOrElse("update_postimage", 0L) === 2L, counts.toString)
    assert(counts.getOrElse("insert", 0L) === 2L, counts.toString)
    assert(counts.getOrElse("delete", 0L) === 1L, counts.toString)
    // table state agrees with the feed
    assert(sql("SELECT COUNT(*) AS n FROM graft.cdfb.t").head.getLong(0)
      === 401)
  }

  test("flag off keeps the back-compat delete+insert shape; old versions fall back to the content diff") {
    val b = mk("cdfc")
    spark.conf.set("graft.dml.mode", "mor")
    try {
      sql("UPDATE graft.cdfc.t SET s = 'plain' WHERE id <= 10")
    } finally spark.conf.unset("graft.dml.mode")
    val w = Manifests.latestVersion(spark, b).get
    assert(Manifests.cdcOf(spark, b, w).isEmpty,
      "no _cdcupd may be recorded with the flag off")
    val counts = tagCounts(Manifests.changesAt(spark, b, w))
    assert(counts.getOrElse("delete", 0L) === 10L, counts.toString)
    assert(counts.getOrElse("insert", 0L) === 10L, counts.toString)
    assert(!counts.keys.exists(_.startsWith("update_")), counts.toString)
  }

  test("elision edge: updating EVERY row of a file retires it — the replay still pairs") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.cdfd")
    val b = s"$wh/cdfd/t"
    // two single-file commits → file-per-grp layout; updating all of
    // grp 0 fully deletes its file (elision: the file RETIRES, no DV
    // survives) while grp 1's file is untouched
    Manifests.commitData(
      (1 to 50).map(i => (i.toLong, 0, s"a$i")).toDF("id", "grp", "s")
        .coalesce(1), b)
    Manifests.append(
      (51 to 100).map(i => (i.toLong, 1, s"b$i")).toDF("id", "grp", "s")
        .coalesce(1), b)
    withImages {
      sql(s"UPDATE graft.`$b` SET s = 'gone' WHERE grp = 0")
    }
    val w = Manifests.latestVersion(spark, b).get
    val feed = Manifests.changesAt(spark, b, w)
    val counts = tagCounts(feed)
    assert(counts.getOrElse("update_preimage", 0L) === 50L, counts.toString)
    assert(counts.getOrElse("update_postimage", 0L) === 50L, counts.toString)
    assert(!counts.contains("delete") && !counts.contains("insert"),
      s"full-file update must still classify as updates: $counts")
    assert(sql(s"SELECT COUNT(*) AS n FROM graft.`$b` WHERE s = 'gone'")
      .head.getLong(0) === 50)
  }

  test("MV fold accepts update images: fold(update feed) == full recompute") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.cdfe")
    val b = s"$wh/cdfe/t"
    def fact(rows: Seq[(Long, String, java.math.BigDecimal)]) =
      rows.toDF("invoice_no", "d", "total_amount")
        .withColumn("invoice_date", to_timestamp(col("d")))
        .drop("d")
    val seed = fact((1 to 300).map(i => (i.toLong,
      f"2011-${i % 12 + 1}%02d-15 10:00:00",
      new java.math.BigDecimal(s"${i % 50 + 1}.25"))))
    Manifests.commitData(seed, b)
    val v0 = Manifests.latestVersion(spark, b).get
    val mvDir = java.nio.file.Files
      .createTempDirectory("graft_cdf_mv").toString
    graft.etl.Mv.partialOf(Manifests.readLatest(spark, b))
      .write.mode("overwrite").parquet(s"$mvDir/v0")
    withImages {
      sql(s"UPDATE graft.`$b` SET total_amount = total_amount + 100 " +
        "WHERE invoice_no % 13 = 0")
      sql(s"DELETE FROM graft.`$b` WHERE invoice_no % 29 = 0")
    }
    val w = Manifests.latestVersion(spark, b).get
    val feed = Manifests.changesBetweenWithUpdates(spark, b, v0, w)
    assert(feed.filter(col("_change_type") === "update_preimage").count() > 0,
      "fixture must exercise the update tags")
    val folded = graft.etl.Mv
      .applyChangesFrame(spark, s"$mvDir/v0", feed)
      .orderBy("year", "month").collect().toSeq
    val full = graft.etl.Mv.partialOf(Manifests.readLatest(spark, b))
      .orderBy("year", "month").collect().toSeq
    assert(folded.map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
      r.getDecimal(3))) ===
      full.map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDecimal(3))),
      "fold over the update-image feed must equal the full recompute")
  }

  test("the catalog .changes faces serve the replay under updateImages=true, default shape unchanged") {
    val b = mk("cdfg", rows = 100)
    withImages {
      sql(s"UPDATE graft.`$b` SET s = 'img' WHERE id <= 25")
    }
    val w = Manifests.latestVersion(spark, b).get
    // BATCH face: spark.read.option(...).table("graft.`<b>`.changes")
    val batch = spark.read
      .option("startingVersion", (w - 1).toString)
      .option("endingVersion", w.toString)
      .option("updateImages", "true")
      .table(s"graft.`$b`.changes")
    val counts = tagCounts(batch)
    assert(counts.getOrElse("update_preimage", 0L) === 25L, counts.toString)
    assert(counts.getOrElse("update_postimage", 0L) === 25L, counts.toString)
    // default shape stays delete+insert (back-compat)
    val plain = tagCounts(spark.read
      .option("startingVersion", (w - 1).toString)
      .option("endingVersion", w.toString)
      .table(s"graft.`$b`.changes"))
    assert(plain.getOrElse("delete", 0L) === 25L, plain.toString)
    assert(plain.getOrElse("insert", 0L) === 25L, plain.toString)
    // STREAMING face: the micro-batch feed under the same option
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cdf_stream").toString
    val q = spark.readStream
      .option("startingVersion", (w - 1).toString)
      .option("updateImages", "true")
      .table(s"graft.`$b`.changes")
      .writeStream.format("memory").queryName("cdf_upd_stream")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = tagCounts(spark.table("cdf_upd_stream"))
    assert(streamed.getOrElse("update_preimage", 0L) === 25L,
      streamed.toString)
    assert(streamed.getOrElse("update_postimage", 0L) === 25L,
      streamed.toString)
  }

  test("range replay concatenates per-version changes; vacuum reclaims dropped versions' cdc dirs") {
    val b = mk("cdff", rows = 100)
    withImages {
      sql("UPDATE graft.cdff.t SET s = 'r1' WHERE id <= 20")
      sql("UPDATE graft.cdff.t SET s = 'r2' WHERE id <= 20")
    }
    val w = Manifests.latestVersion(spark, b).get
    // per-version semantics: BOTH rounds' images appear (2×20 pairs),
    // where the endpoint content diff would net the intermediate state
    val feed = Manifests.changesBetweenWithUpdates(spark, b, w - 2, w)
    assert(feed.filter(col("_change_type") === "update_preimage")
      .count() === 40)
    assert(feed.filter(col("_change_type") === "update_postimage")
      .count() === 40)
    // _commit_version attributes each round's images to its commit —
    // the provenance a range consumer orders by (Delta CDF parity)
    val byVer = feed.filter(col("_change_type") === "update_preimage")
      .groupBy("_commit_version").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byVer === Map((w - 1) -> 20L, w -> 20L),
      s"per-commit attribution wrong: $byVer")
    def cdcDirs: Seq[String] = Dfs.list(spark, b)
      .map(_.getPath.getName).filter(_.startsWith("cdc_")).toSeq
    assert(cdcDirs.size === 2)
    // retire the vectored history (compact first: vacuum keeps files
    // referenced by retained versions) and reclaim — dropped versions
    // release their cdc sidecars like every other payload
    Manifests.compact(spark, b, 2)
    Manifests.vacuum(spark, b, keepLast = 1)
    assert(cdcDirs.isEmpty,
      s"vacuum must reclaim dropped versions' cdc dirs: $cdcDirs")
  }
}
