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

  test("vacuum: expired + crashed versions swept, retained window immutable, horizon loud") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_snap_vac").toString
    (0 to 3).foreach(i => Snapshots.commit(Seq.fill(i + 1)(i).toDF("id"), base))
    val dropped = Snapshots.vacuum(spark, base, keepLast = 2)
    assert(dropped === Seq(0, 1))
    // retained: v2, v3 readable and intact; latest unchanged
    assert(Snapshots.latestVersion(spark, base) === Some(3))
    assert(Snapshots.readAt(spark, base, 2).count() === 3)
    assert(Snapshots.readAt(spark, base, 3).count() === 4)
    // below the horizon: loud failure, not silent emptiness
    intercept[IllegalArgumentException](Snapshots.readAt(spark, base, 0))
    intercept[IllegalArgumentException](Snapshots.readAt(spark, base, 1))
    // a new commit lands strictly above the retained latest
    val v = Snapshots.commit(Seq(7, 7, 7, 7, 7).toDF("id"), base)
    assert(v === 4 && Snapshots.readLatest(spark, base).count() === 5)
  }

  test("vacuum sweeps a marker-less crashed directory below the floor") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_snap_vac2").toString
    (0 to 2).foreach(i => Snapshots.commit(Seq(i).toDF("id"), base))
    // fake a crashed writer at v1's era: marker-less dir v0 replaced by
    // hand (delete marker from v0)
    Dfs.delete(spark, s"$base/v0/_SUCCESS")
    val dropped = Snapshots.vacuum(spark, base, keepLast = 1)
    // v0 is now marker-less (crashed-looking) and v1 expired: both swept
    assert(dropped === Seq(0, 1))
    assert(!Dfs.exists(spark, s"$base/v0") && !Dfs.exists(spark, s"$base/v1"))
    assert(Snapshots.readLatest(spark, base).count() === 1)
  }
}
