package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `_commit_timestamp` provenance (Delta `table_changes` parity): the
  * commit instant is RECORDED in the version payload at commit time
  * (never filesystem mtime), served beside `_commit_version` on the
  * per-version API feeds AND the catalog `.changes` faces, batch and
  * streaming. TIMESTAMP AS OF and DESCRIBE HISTORY resolve against
  * the same recorded instants. */
class CdfProvenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def registerCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft",
      "graft.sources.manifest.ManifestCatalog")

  private def batch(lo: Int, hi: Int) =
    (lo to hi).map(i => (i.toLong, s"v$i")).toDF("id", "s")

  test("commit records its own timestamp; history and TIMESTAMP AS OF use it") {
    val b = java.nio.file.Files
      .createTempDirectory("graft_cts").toString + "/t"
    val t0 = System.currentTimeMillis()
    Manifests.commitData(batch(1, 10).coalesce(1), b)
    Manifests.append(batch(11, 20).coalesce(1), b)
    val t1 = System.currentTimeMillis()
    (0 to 1).foreach { v =>
      val ts = Manifests.commitTimestampOf(spark, b, v)
      assert(ts >= t0 && ts <= t1,
        s"recorded stamp $ts outside the commit window [$t0, $t1]")
    }
    assert(Manifests.commitTimestampOf(spark, b, 0) <=
      Manifests.commitTimestampOf(spark, b, 1))
    // history serves the recorded stamps (same values, not mtime)
    val hist = Manifests.history(spark, b)
    assert(hist.map(_._2) ===
      Seq(0, 1).map(Manifests.commitTimestampOf(spark, b, _)))
    // TIMESTAMP AS OF: just-before-v1 resolves v0
    val v1ts = Manifests.commitTimestampOf(spark, b, 1)
    val asOf = Manifests.versionAsOf(spark, b, v1ts - 1)
    assert(asOf.contains(0) ||
      Manifests.commitTimestampOf(spark, b, 0) === v1ts,
      s"asOf($v1ts - 1) = $asOf")
  }

  test("changesAt / changesBetweenWithUpdates carry the provenance pair") {
    val b = java.nio.file.Files
      .createTempDirectory("graft_cts_api").toString + "/t"
    Manifests.commitData(batch(1, 10).coalesce(1), b)
    Manifests.append(batch(11, 20).coalesce(1), b)
    Manifests.deleteWhere(spark, b, col("id") <= 3)
    val step = Manifests.changesAt(spark, b, 1)
    assert(step.columns.takeRight(3).toSeq ===
      Seq("_change_type", "_commit_version", "_commit_timestamp"))
    val r = step.select("_commit_version", "_commit_timestamp").distinct()
      .collect()
    assert(r.length === 1 && r.head.getInt(0) === 1)
    assert(r.head.getTimestamp(1).getTime ===
      Manifests.commitTimestampOf(spark, b, 1))
    // the per-version range feed: each row stamped with ITS commit
    val feed = Manifests.changesBetweenWithUpdates(spark, b, 0, 2)
    val byV = feed.groupBy("_commit_version")
      .agg(countDistinct("_commit_timestamp").as("nts")).collect()
      .map(row => row.getInt(0) -> row.getLong(1)).toMap
    assert(byV.keySet === Set(1, 2))
    assert(byV.values.forall(_ === 1L))
  }

  test("catalog .changes faces serve the pair: batch attributed on a single step, null on netting ranges") {
    registerCatalog()
    val b = java.nio.file.Files
      .createTempDirectory("graft_cts_cat").toString + "/t"
    batch(1, 10).coalesce(1).createOrReplaceTempView("graft_cts_src")
    spark.sql(s"CREATE TABLE graft.`$b` AS SELECT * FROM graft_cts_src")
    batch(11, 15).coalesce(1).createOrReplaceTempView("graft_cts_src2")
    spark.sql(s"INSERT INTO graft.`$b` SELECT * FROM graft_cts_src2")
    val one = spark.read.option("startingVersion", "0")
      .option("endingVersion", "1").table(s"graft.`$b`.changes")
    assert(one.schema.fieldNames.takeRight(3).toSeq ===
      Seq("_change_type", "_commit_version", "_commit_timestamp"))
    val rows = one.select("_commit_version", "_commit_timestamp")
      .distinct().collect()
    assert(rows.length === 1 && rows.head.getInt(0) === 1)
    assert(rows.head.getTimestamp(1).getTime ===
      Manifests.commitTimestampOf(spark, b, 1))
    // a multi-step netting range cannot attribute: columns present,
    // values null (the updateImages shape is the attributed range)
    spark.sql(s"DELETE FROM graft.`$b` WHERE id <= 2")
    val multi = spark.read.option("startingVersion", "0")
      .option("endingVersion", "2").table(s"graft.`$b`.changes")
      .select("_commit_version").distinct().collect()
    assert(multi.length === 1 && multi.head.isNullAt(0))
    val upd = spark.read.option("startingVersion", "0")
      .option("endingVersion", "2").option("updateImages", "true")
      .table(s"graft.`$b`.changes")
    assert(upd.select("_commit_version").distinct().collect()
      .map(_.getInt(0)).sorted === Array(1, 2))
  }

  test("a checkpoint pins its feed shape: restarting with updateImages flipped refuses") {
    registerCatalog()
    val b = java.nio.file.Files
      .createTempDirectory("graft_cts_shape").toString + "/t"
    Manifests.commitData(batch(1, 5).coalesce(1), b)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cts_shck").toString
    def run(flag: Boolean) = {
      val q = spark.readStream
        .option("updateImages", flag.toString)
        .table(s"graft.`$b`.changes")
        .writeStream.option("checkpointLocation", ckpt)
        .format("noop").start()
      try { q.processAllAvailable(); None }
      catch { case e: org.apache.spark.sql.streaming
          .StreamingQueryException => Some(e) }
      finally q.stop()
    }
    assert(run(flag = false).isEmpty, "first run must succeed")
    Manifests.append(batch(6, 10).coalesce(1), b)
    val e = run(flag = true)
    assert(e.isDefined, "flipped restart must refuse")
    assert(e.get.getMessage.contains("updateImages flipped") ||
      Option(e.get.getCause).exists(_.getMessage
        .contains("updateImages flipped")), e.get.getMessage)
    // and the ORIGINAL shape still resumes cleanly
    assert(run(flag = false).isEmpty, "original shape must still resume")
  }

  test("streaming .changes: per-trigger batches carry real provenance") {
    registerCatalog()
    val b = java.nio.file.Files
      .createTempDirectory("graft_cts_str").toString + "/t"
    Manifests.commitData(batch(1, 10).coalesce(1), b)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_cts_ck").toString
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, String)]
    val q = spark.readStream
      .option("maxVersionsPerTrigger", "1")
      .table(s"graft.`$b`.changes")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("_commit_version", "_commit_timestamp", "_change_type")
          .collect().foreach(r => out.synchronized {
            out += ((r.getInt(0), r.getTimestamp(1).getTime,
              r.getString(2)))
          })
        ()
      }
      .start()
    try {
      q.processAllAvailable() // initial snapshot: (-1, 0] → v0
      Manifests.append(batch(11, 20).coalesce(1), b)
      q.processAllAvailable() // the append step: (0, 1] → v1
    } finally q.stop()
    val got = out.synchronized(out.toSeq)
    assert(got.nonEmpty)
    // the initial snapshot batch attributes to the snapshot version
    // (v0, Delta's tagging); the append step to v1 — every row
    // carries its version's recorded stamp
    val byV = got.groupBy(_._1)
    assert(byV.keySet === Set(0, 1))
    byV.foreach { case (v, rows) =>
      assert(rows.forall(_._2 === Manifests.commitTimestampOf(spark, b, v)))
      assert(rows.forall(_._3 === "insert"))
    }
    assert(byV(0).size === 10 && byV(1).size === 10)
  }
}
