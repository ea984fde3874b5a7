package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A local filesystem that answers ONLY to the `graftfs:` scheme —
  * `java.io.File` cannot resolve `graftfs:/...` strings, so any storage
  * code that still touched `java.io` would fail these flows. Registered
  * under `fs.graftfs.impl`; this is the standard Hadoop trick for
  * proving scheme-agnostic I/O without a real HDFS. */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

/** The storage/maintenance layer must run where a 100 TB table actually
  * lives — HDFS/S3, not the driver's disk. These specs run the snapshot
  * protocol, the surgical delete, and the CAS commit claim end to end
  * through [[GraftTestFileSystem]]'s non-`file:` scheme: if any
  * listing/exists/rename/create on the protocol path regressed to
  * `java.io`, the `graftfs:` URI would be unresolvable and the flow
  * would throw. */
class DfsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    s
  }

  private def scratch(prefix: String): String =
    "graftfs:" + java.nio.file.Files.createTempDirectory(prefix).toString

  test("snapshot protocol end to end on a non-file: scheme") {
    import spark.implicits._
    val base = scratch("graft_dfs_snap")
    assert(Snapshots.latestVersion(spark, base).isEmpty)
    val v0 = Snapshots.commit(Seq((1, "a"), (2, "b")).toDF("id", "s"), base)
    val v1 = Snapshots.commit(Seq((1, "a"), (2, "B"), (3, "c")).toDF("id", "s"), base)
    assert(v0 === 0 && v1 === 1)
    assert(Snapshots.readLatest(spark, base).count() === 3)
    assert(Snapshots.readAt(spark, base, 0).count() === 2)
  }

  test("surgical delete end to end on a non-file: scheme") {
    import spark.implicits._
    val dir = scratch("graft_dfs_del") + "/t"
    (1 to 100).map(i => (i, i % 10)).toDF("id", "k")
      .repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(dir)
    val (affected, total) = Deletes.deleteWhere(spark, dir, col("k") === 3)
    assert(affected >= 1 && affected < total,
      s"range-clustered key should touch a strict subset ($affected/$total)")
    val after = spark.read.parquet(dir)
    assert(after.filter(col("k") === 3).count() === 0)
    assert(after.count() === 90)
  }

  test("createExclusive is a CAS: exactly one of N concurrent claimers wins") {
    val base = scratch("graft_dfs_cas")
    val marker = s"$base/_claims/v7"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val wins =
      try {
        val futs = (1 to 8).map(_ => scala.concurrent.Future {
          Dfs.createExclusive(spark, marker)
        })
        import scala.concurrent.duration.Duration
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futs), Duration.Inf)
      } finally pool.shutdown()
    assert(wins.count(identity) === 1,
      s"exactly one claimer must win, got ${wins.count(identity)}")
  }

  test("two concurrent committers both survive as distinct versions") {
    import spark.implicits._
    val base = scratch("graft_dfs_race")
    Snapshots.commit(Seq(0).toDF("id"), base) // v0 exists; both racers see it
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val versions =
      try {
        val a = scala.concurrent.Future {
          Snapshots.commit(Seq(1, 1).toDF("id"), base)
        }
        val b = scala.concurrent.Future {
          Snapshots.commit(Seq(2, 2, 2).toDF("id"), base)
        }
        import scala.concurrent.duration.Duration
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(Seq(a, b)), Duration.Inf)
      } finally pool.shutdown()
    // the CAS claim forces distinct version numbers — neither overwrote
    // the other, and both published
    assert(versions.toSet.size === 2, s"colliding versions: $versions")
    assert(versions.forall(v => Snapshots.readAt(spark, base, v).count() > 0))
    assert(Snapshots.latestVersion(spark, base) === Some(versions.max))
  }

  test("scratchDir honors the scheme of GRAFT_SCRATCH-style bases via Dfs.mkdirs") {
    val d = Dfs.scratchDir(spark, "graft_dfs_scratch")
    assert(Dfs.exists(spark, d))
    assert(Dfs.list(spark, d).isEmpty)
  }
}
