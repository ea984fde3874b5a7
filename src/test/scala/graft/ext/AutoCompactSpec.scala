package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Auto-compaction (`graft.autocompact.minFiles`) — Delta's autoCompact
  * as a post-append policy pass: a partition whose live small-file
  * count reaches the threshold bin-packs as a follow-on OCC commit,
  * scoped to that partition; untouched partitions and healthy files
  * carry by reference. Off by default. */
class AutoCompactSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def withPolicy[A](minFiles: Int)(f: => A): A = {
    spark.conf.set("graft.autocompact.minFiles", minFiles.toString)
    try f finally spark.conf.unset("graft.autocompact.minFiles")
  }

  private def batch(lo: Int, hi: Int, grp: Int) =
    (lo to hi).map(i => (i.toLong, grp, s"v$i")).toDF("id", "grp", "s")

  test("N epochs into one partition leave ~1 file; the cold partition carries by reference") {
    val b = java.nio.file.Files
      .createTempDirectory("graft_ac").toString + "/t"
    spark.conf.set("graft.write.splitByPartition", "true")
    try {
      Manifests.commitDataPartitioned(
        batch(1, 100, 0).unionByName(batch(101, 200, 1)), b, Seq("grp"))
      val coldFiles = {
        val v = Manifests.latestVersion(spark, b).get
        val tuples = new ManifestFileIndex(spark, b, v)
          .purePartitionTuples.get._2
        Manifests.files(spark, b, v)
          .filter(f => tuples(Dfs.canonical(f)) == Seq(1))
      }
      withPolicy(4) {
        // eight appends, ALL into partition grp=0 (the hot-partition
        // streaming shape)
        (1 to 8).foreach(i =>
          Manifests.appendBatch(batch(200 + i * 10, 209 + i * 10, 0), b,
            i.toLong, "acwriter"))
      }
      val v = Manifests.latestVersion(spark, b).get
      // the policy fires MID-SEQUENCE whenever the census trips (the
      // last version is whatever the final append left)
      assert((0 to v).exists(w =>
        Manifests.tagOf(spark, b, w).contains("autocompact")),
        "policy pass must have fired at least once")
      val tuples = new ManifestFileIndex(spark, b, v)
        .purePartitionTuples
        .getOrElse(fail("auto-compact must preserve the purity proof"))
        ._2
      val byPart = Manifests.files(spark, b, v)
        .groupBy(f => tuples(Dfs.canonical(f)))
      assert(byPart(Seq(0)).size <= 3,
        s"hot partition still fragmented: ${byPart(Seq(0)).size} files")
      assert(byPart(Seq(1)).map(Dfs.canonical).toSet ===
        coldFiles.map(Dfs.canonical).toSet,
        "cold partition must carry by reference, byte-identical paths")
      // content unharmed
      assert(Manifests.readLatest(spark, b).count() === 280)
      assert(Manifests.readLatest(spark, b)
        .filter(col("grp") === 1).count() === 100)
    } finally spark.conf.unset("graft.write.splitByPartition")
  }

  test("a malformed knob never fails the append it follows; the replay feed skips policy versions") {
    val b = java.nio.file.Files
      .createTempDirectory("graft_ac_knob").toString + "/t"
    Manifests.commitData(batch(1, 50, 0).coalesce(1), b)
    // malformed minFiles: the append must still commit durably (the
    // policy pass swallows its own failures by contract)
    spark.conf.set("graft.autocompact.minFiles", "8 files")
    try {
      assert(Manifests.appendBatch(batch(51, 60, 0).coalesce(1), b, 1L,
        "acknob").isDefined,
        "append must survive a malformed autocompact knob")
    } finally spark.conf.unset("graft.autocompact.minFiles")
    assert(Manifests.readLatest(spark, b).count() === 60)
    // a REAL policy pass is content-preserving (dataChange=false): its
    // per-version replay step must be EMPTY, not a content diff that
    // shuffles the partition to cancel itself
    withPolicy(3) {
      (2 to 5).foreach(i =>
        Manifests.appendBatch(batch(i * 100, i * 100 + 9, 0)
          .coalesce(1), b, i.toLong, "acknob"))
    }
    val v = Manifests.latestVersion(spark, b).get
    val acVersions = (0 to v).filter(w =>
      Manifests.tagOf(spark, b, w).contains("autocompact"))
    assert(acVersions.nonEmpty, "fixture must exercise the policy")
    acVersions.foreach(w =>
      assert(Manifests.changesAt(spark, b, w).count() === 0,
        s"autocompact version $w must replay as empty"))
  }

  test("manual OPTIMIZE is dataChange=false: compact/compactSmall replay empty, the appends still replay") {
    val b = java.nio.file.Files
      .createTempDirectory("graft_ac_manual").toString + "/t"
    Manifests.commitData(batch(1, 50, 0).coalesce(1), b)
    Manifests.appendBatch(batch(51, 80, 0).coalesce(1), b, 1L, "acman")
    // a MoR delete before the compact: the compact also materializes
    // the vector — still content-preserving (the delete was already
    // reported at ITS version)
    Manifests.deleteWhereMor(spark, b, col("id") <= 5)
    val (_, _, vc) = Manifests.compact(spark, b, targetFiles = 1)
    assert(Manifests.tagOf(spark, b, vc).contains("compact"))
    assert(Manifests.changesAt(spark, b, vc).count() === 0,
      "manual compact must replay as empty (dataChange=false)")
    // fragment again, then compactSmall
    Manifests.appendBatch(batch(81, 90, 0).coalesce(1), b, 2L, "acman")
    Manifests.appendBatch(batch(91, 99, 0).coalesce(1), b, 3L, "acman")
    val (_, _, vs) = Manifests.compactSmall(spark, b,
      smallBytes = 1L << 26, targetBytes = 1L << 26)
    assert(Manifests.tagOf(spark, b, vs).contains("compact-small"))
    assert(Manifests.changesAt(spark, b, vs).count() === 0,
      "compactSmall must replay as empty (dataChange=false)")
    // a RANGE spanning both compactions still replays every real
    // change: inserts from the appends, deletes from the MoR step —
    // and nothing from the rewrites
    val feed = Manifests.changesBetween(spark, b, 0,
      Manifests.latestVersion(spark, b).get)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.getOrElse("insert", 0L) === 49L, byType.toString)
    assert(byType.getOrElse("delete", 0L) === 5L, byType.toString)
    // and the final table content is exact
    assert(Manifests.readLatest(spark, b).count() === 94)
  }

  test("policy off: small files accumulate (the baseline the knob exists to fix)") {
    val b = java.nio.file.Files
      .createTempDirectory("graft_ac_off").toString + "/t"
    Manifests.commitData(batch(1, 50, 0).coalesce(1), b)
    (1 to 6).foreach(i =>
      Manifests.appendBatch(batch(50 + i * 10, 59 + i * 10, 0)
        .coalesce(1), b, i.toLong, "acoff"))
    val v = Manifests.latestVersion(spark, b).get
    assert(Manifests.files(spark, b, v).size === 7,
      "without the policy every append must leave its file")
    assert(Manifests.tagOf(spark, b, v).isEmpty)
  }

  test("unpartitioned table folds table-wide; a vectored version skips the policy") {
    val b = java.nio.file.Files
      .createTempDirectory("graft_ac_flat").toString + "/t"
    Manifests.commitData(batch(1, 50, 0).coalesce(1), b)
    withPolicy(3) {
      (1 to 4).foreach(i =>
        Manifests.appendBatch(batch(50 + i * 10, 59 + i * 10, 0)
          .coalesce(1), b, i.toLong, "acflat"))
      val v1 = Manifests.latestVersion(spark, b).get
      assert(Manifests.files(spark, b, v1).size <= 3,
        "unpartitioned backlog must bin-pack table-wide")
      assert(Manifests.readLatest(spark, b).count() === 90)
      // vector the table: the next append must NOT trigger a policy
      // rewrite (materializing vectors is compact()'s deliberate call)
      Manifests.deleteWhereMor(spark, b, col("id") === 1L)
      (5 to 9).foreach(i =>
        Manifests.appendBatch(batch(50 + i * 10, 59 + i * 10, 0)
          .coalesce(1), b, i.toLong, "acflat"))
      val v2 = Manifests.latestVersion(spark, b).get
      assert(!(v1 + 1 to v2).exists(w =>
        Manifests.tagOf(spark, b, w).contains("autocompact")),
        "a vectored version must skip auto-compact")
      assert(Manifests.dvFiles(spark, b, v2).nonEmpty)
      assert(Manifests.readLatest(spark, b).count() === 139)
    }
  }
}
