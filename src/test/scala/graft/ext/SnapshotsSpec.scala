package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SnapshotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("commit/readAt/readLatest: versions immutable, latest advances, time travel pins") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_snap").toString
    assert(Snapshots.latestVersion(spark, base).isEmpty)
    val v0 = Snapshots.commit(Seq((1, "a"), (2, "b")).toDF("id", "s"), base)
    val v1 = Snapshots.commit(Seq((1, "a"), (2, "B"), (3, "c")).toDF("id", "s"), base)
    assert(v0 === 0 && v1 === 1)
    assert(Snapshots.latestVersion(spark, base) === Some(1))
    assert(Snapshots.readLatest(spark, base).count() === 3)
    // time travel: v0 unchanged by the later commit
    val pinned = Snapshots.readAt(spark, base, 0).orderBy("id").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(pinned.toSeq === Seq((1, "a"), (2, "b")))
    // reading a never-committed version fails loudly
    intercept[IllegalArgumentException] { Snapshots.readAt(spark, base, 7) }
  }

  test("a marker-less (crashed) version directory is invisible to readers") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_snap_crash").toString
    Snapshots.commit(Seq(1, 2, 3).toDF("id"), base)
    // simulate a writer that died mid-copy: data files, no _SUCCESS
    val dead = new java.io.File(s"$base/v1")
    dead.mkdirs()
    java.nio.file.Files.write(dead.toPath.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))
    assert(Snapshots.latestVersion(spark, base) === Some(0),
      "a crashed, marker-less write must not become the visible latest")
    assert(Snapshots.readLatest(spark, base).count() === 3)
    // the next commit OVERWRITES the dead directory and publishes cleanly
    val v = Snapshots.commit(Seq(4, 5).toDF("id"), base)
    assert(v === 1 && Snapshots.readLatest(spark, base).count() === 2)
  }
}
