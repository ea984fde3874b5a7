package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native merge-on-read SQL DML via `SupportsDelta`
  * ([[graft.sources.manifest.ManifestDeltaOperation]]): plain
  * `UPDATE`/`DELETE`/`MERGE INTO` on a VECTORED table lands vectors +
  * image appends with no `CALL` procedure and no compact() wall — and
  * the copy-on-write path provably no longer fires on vectored
  * tables. */
class DeltaDmlSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_ddml_wh").toString
    CatalogTestSupport.registerFreshCatalog(spark, d)
    d
  }

  private def sql(s: String) = spark.sql(s)

  private def mkVectored(ns: String, rows: Int = 400): String = {
    wh
    sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    (1 to rows).map(i => (i.toLong, i % 8, s"v$i"))
      .toDF("id", "grp", "s").createOrReplaceTempView(s"${ns}_src")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM ${ns}_src")
    sql(s"CALL graft.system.delete_mor('$ns.t', 'id % 13 = 0')")
    val b = s"$wh/$ns/t"
    assert(Manifests.dvFiles(spark, b,
      Manifests.latestVersion(spark, b).get).nonEmpty)
    b
  }

  private def canonFiles(b: String, v: Int): Set[String] =
    Manifests.files(spark, b, v).map(Dfs.canonical).toSet

  test("plain UPDATE on a vectored table: merge-on-read, carried files by reference, stacked vectors, no CALL") {
    val b = mkVectored("ddmlu")
    val v1 = Manifests.latestVersion(spark, b).get
    val before = canonFiles(b, v1)
    val dvBefore = Manifests.dvFiles(spark, b, v1).size
    // the round-11 wall: this exact statement used to refuse with
    // "carries deletion vectors ... run compact() first"
    sql("UPDATE graft.ddmlu.t SET s = 'touched', grp = grp + 100 " +
      "WHERE id % 10 = 7")
    val v2 = Manifests.latestVersion(spark, b).get
    assert(v2 === v1 + 1, "one UPDATE = one atomic commit")
    val after = canonFiles(b, v2)
    // merge-on-read: every parent file CARRIES (no rewrite — a CoW
    // rewrite would replace the matched files), plus appended images
    assert(before.subsetOf(after),
      "MoR UPDATE must not rewrite data files — old files carry by " +
        "reference with their rows vectored out")
    assert(after.size > before.size, "new images must append")
    assert(Manifests.dvFiles(spark, b, v2).size > dvBefore,
      "the UPDATE's old rows must land as stacked deletion vectors")
    // semantics: matched live rows updated, everything else untouched
    val got = sql("SELECT id, grp, s FROM graft.ddmlu.t").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val want = (1 to 400).filter(_ % 13 != 0).map { i =>
      if (i % 10 == 7) (i.toLong, i % 8 + 100, "touched")
      else (i.toLong, i % 8, s"v$i")
    }.toSet
    assert(got === want)
    // time travel: the pre-update version is intact
    assert(sql(s"SELECT COUNT(*) AS n FROM graft.ddmlu.t VERSION AS OF $v1 " +
      "WHERE s = 'touched'").head.getLong(0) === 0)
  }

  test("plain DELETE with an untranslatable predicate on a vectored table: delta path, full-file elision included") {
    val b = mkVectored("ddmld")
    val v1 = Manifests.latestVersion(spark, b).get
    val before = canonFiles(b, v1)
    // length(s) > 0 never translates to a source filter, so the
    // metadata tier refuses and the delta rewrite carries the DELETE
    sql("DELETE FROM graft.ddmld.t WHERE length(s) >= 4 AND id > 350")
    val v2 = Manifests.latestVersion(spark, b).get
    assert(v2 === v1 + 1)
    assert(canonFiles(b, v2).subsetOf(before),
      "a pure DELETE appends nothing — files carry or retire")
    val want = (1 to 400).filter(i => i % 13 != 0 &&
      !(s"v$i".length >= 4 && i > 350)).map(_.toLong).toSet
    assert(sql("SELECT id FROM graft.ddmld.t").collect()
      .map(_.getLong(0)).toSet === want)

    // full-file elision: kill every remaining row (untranslatable
    // spelling keeps it on the delta path) — files retire from the
    // manifest rather than carrying data-sized vectors; one survivor
    // file stays (an empty manifest is unrepresentable)
    sql("DELETE FROM graft.ddmld.t WHERE length(s) > 0")
    val v3 = Manifests.latestVersion(spark, b).get
    assert(sql("SELECT * FROM graft.ddmld.t").count() === 0)
    assert(Manifests.files(spark, b, v3).size === 1,
      "an all-row delete must ELIDE files, not vector them all")
  }

  test("plain MERGE INTO a vectored table: matched rows vector out, updates + inserts append, one commit") {
    val b = mkVectored("ddmlm")
    val v1 = Manifests.latestVersion(spark, b).get
    val before = canonFiles(b, v1)
    Seq((26L, 999, "upd26"), (39L, 999, "upd39"), (9001L, 1, "new1"))
      .toDF("id", "grp", "s").createOrReplaceTempView("ddmlm_upd")
    sql("""MERGE INTO graft.ddmlm.t t USING ddmlm_upd u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val v2 = Manifests.latestVersion(spark, b).get
    assert(v2 === v1 + 1, "one MERGE = one atomic commit")
    assert(before.subsetOf(canonFiles(b, v2)))
    val got = sql("SELECT id, grp, s FROM graft.ddmlm.t WHERE id IN " +
      "(26, 39, 9001, 40)").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // id 26 and 39 are multiples of 13 — deleted by the fixture, so
    // the MERGE re-INSERTS them (not matched); 9001 inserts; 40 intact
    assert(got === Set((26L, 999, "upd26"), (39L, 999, "upd39"),
      (9001L, 1, "new1"), (40L, 0, "v40")))
    // a matched-update really vectors: update a LIVE row and check DVs
    Seq((40L, 777, "upd40")).toDF("id", "grp", "s")
      .createOrReplaceTempView("ddmlm_upd2")
    val dvBefore = Manifests.dvFiles(spark, b, v2).size
    sql("""MERGE INTO graft.ddmlm.t t USING ddmlm_upd2 u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val v3 = Manifests.latestVersion(spark, b).get
    assert(Manifests.dvFiles(spark, b, v3).size > dvBefore)
    assert(sql("SELECT s FROM graft.ddmlm.t WHERE id = 40")
      .head.getString(0) === "upd40")
  }

  test("graft.dml.mode=mor routes CLEAN tables through the delta path; default stays copy-on-write") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ddmlc")
    (1 to 200).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .createOrReplaceTempView("ddmlc_src")
    sql("CREATE TABLE graft.ddmlc.t AS SELECT * FROM ddmlc_src")
    val b = s"$wh/ddmlc/t"
    // default: CoW — the matched file REWRITES (no vectors appear)
    sql("UPDATE graft.ddmlc.t SET s = 'cow' WHERE id = 5")
    assert(Manifests.dvFiles(spark, b,
      Manifests.latestVersion(spark, b).get).isEmpty,
      "clean tables default to the copy-on-write rewrite")
    try {
      spark.conf.set("graft.dml.mode", "mor")
      val vBefore = Manifests.latestVersion(spark, b).get
      val before = canonFiles(b, vBefore)
      sql("UPDATE graft.ddmlc.t SET s = 'mor' WHERE id = 6")
      val vAfter = Manifests.latestVersion(spark, b).get
      assert(Manifests.dvFiles(spark, b, vAfter).nonEmpty,
        "graft.dml.mode=mor must vector instead of rewriting")
      assert(before.subsetOf(canonFiles(b, vAfter)))
      assert(sql("SELECT s FROM graft.ddmlc.t WHERE id = 6")
        .head.getString(0) === "mor")
      assert(sql("SELECT COUNT(*) AS n FROM graft.ddmlc.t")
        .head.getLong(0) === 200)
    } finally spark.conf.unset("graft.dml.mode")
  }

  test("live renames keep the compact-first contract; constraints hold on delta images; no version burned on refusal") {
    val b = mkVectored("ddmlg")
    // vectored + renamed: the delta scan cannot era-compose — the CoW
    // path's execution-time refusal still guards the spelling
    sql("ALTER TABLE graft.ddmlg.t RENAME COLUMN s TO txt")
    val e = intercept[Throwable](
      sql("UPDATE graft.ddmlg.t SET txt = 'x' WHERE id = 2"))
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("compact"), chain(e))

    // CHECK constraints validate delta images exactly like appends
    val b2 = mkVectored("ddmlh")
    Manifests.addConstraint(spark, b2, "grp_bound", "grp < 1000")
    val vBefore = Manifests.latestVersion(spark, b2).get
    val e2 = intercept[Throwable](
      sql("UPDATE graft.ddmlh.t SET grp = 5000 WHERE id = 3"))
    assert(chain(e2).toLowerCase.contains("constraint"), chain(e2))
    assert(Manifests.latestVersion(spark, b2).get === vBefore,
      "a refused delta write must not burn a version")
    assert(sql("SELECT grp FROM graft.ddmlh.t WHERE id = 3")
      .head.getInt(0) === 3)
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: sync-from-source on a vectored table takes the delta path") {
    val b = mkVectored("ddmlnb")
    val v1 = Manifests.latestVersion(spark, b).get
    val before = canonFiles(b, v1)
    val dvBefore = Manifests.dvFiles(spark, b, v1).size
    // source = ids 1..100 refreshed; ids > 100 are gone from source
    (1 to 100).map(i => (i.toLong, 500, s"sync$i"))
      .toDF("id", "grp", "s").createOrReplaceTempView("ddmlnb_src2")
    sql("""MERGE INTO graft.ddmlnb.t t USING ddmlnb_src2 u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val v2 = Manifests.latestVersion(spark, b).get
    assert(v2 === v1 + 1, "one sync MERGE = one atomic commit")
    // the final table IS the source — the sync contract
    val got = sql("SELECT id, grp, s FROM graft.ddmlnb.t").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got === (1 to 100).map(i => (i.toLong, 500, s"sync$i")).toSet)
    // merge-on-read shape: no parent file was REWRITTEN — each either
    // carries (vectored) or retires (fully dead); updates/inserts append
    val after = canonFiles(b, v2)
    assert((after -- before).nonEmpty, "refreshed images must append")
    assert(Manifests.dvFiles(spark, b, v2).size >= dvBefore,
      "unmatched-by-source rows must vector out (or elide), not rewrite")
  }

  test("MERGE NOT MATCHED BY SOURCE with conditions: DELETE one slice, UPDATE another, rest untouched") {
    val b = mkVectored("ddmlnc")
    // source keeps only grp 0 and 1 rows (by id arithmetic the fixture
    // left alive); everything else is unmatched-by-source
    (1 to 400).filter(i => i % 13 != 0 && i % 8 <= 1)
      .map(i => (i.toLong, i % 8, s"keep$i"))
      .toDF("id", "grp", "s").createOrReplaceTempView("ddmlnc_src2")
    sql("""MERGE INTO graft.ddmlnc.t t USING ddmlnc_src2 u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED BY SOURCE AND t.grp = 2 THEN DELETE
          |WHEN NOT MATCHED BY SOURCE AND t.grp = 3 THEN UPDATE SET s = 'stale'
          |""".stripMargin)
    val got = sql("SELECT id, grp, s FROM graft.ddmlnc.t").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val want = (1 to 400).filter(i => i % 13 != 0 && i % 8 != 2).map { i =>
      (i % 8) match {
        case 0 | 1 => (i.toLong, i % 8, s"keep$i")
        case 3 => (i.toLong, 3, "stale")
        case _ => (i.toLong, i % 8, s"v$i")
      }
    }.toSet
    assert(got === want)
  }

  test("MERGE NOT MATCHED BY SOURCE on a CLEAN table rides the copy-on-write rewrite") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ddmlnd")
    (1 to 200).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .createOrReplaceTempView("ddmlnd_src")
    sql("CREATE TABLE graft.ddmlnd.t AS SELECT * FROM ddmlnd_src")
    val b = s"$wh/ddmlnd/t"
    (1 to 50).map(i => (i.toLong, s"n$i")).toDF("id", "s")
      .createOrReplaceTempView("ddmlnd_upd")
    sql("""MERGE INTO graft.ddmlnd.t t USING ddmlnd_upd u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(Manifests.dvFiles(spark, b,
      Manifests.latestVersion(spark, b).get).isEmpty,
      "clean table sync MERGE stays copy-on-write")
    val got = sql("SELECT id, s FROM graft.ddmlnd.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === (1 to 50).map(i => (i.toLong, s"n$i")).toSet)
  }

  test("delta commit OCC: a concurrent append rebases when the pushed condition excludes it, refuses otherwise") {
    val b = mkVectored("ddmlo")
    val v = Manifests.latestVersion(spark, b).get
    // hand-build a delta write derived from snapshot v: one DELETE
    // rowId against a real file (the engine's task output shape)
    def dvSidecar(): String = {
      val f = Manifests.files(spark, b, v).head
      val dir = s"$b/dv_${java.util.UUID.randomUUID().toString.take(8)}"
      Seq((Dfs.canonical(f), 0L)).toDF("__file", "__pos")
        .coalesce(1).write.parquet(dir)
      Dfs.dataFiles(spark, dir).map(_.getPath.toString).head
    }
    val liveBefore = Manifests.readAt(spark, b, v).count()
    // concurrent append lands AFTER the snapshot was resolved
    Manifests.append(Seq((9001L, 1, "late")).toDF("id", "grp", "s"), b)
    // pushed condition excludes the appended row -> rebase succeeds
    val (d1, nv1) = Manifests.commitDeltaWrite(spark, b, v,
      Seq(dvSidecar()), Seq.empty, Some("test"),
      conflict = Some(col("grp") === 999))
    assert(d1 === 1L && nv1 === v + 2)
    assert(Manifests.readLatest(spark, b).count() === liveBefore,
      "rebase must keep the concurrent append AND apply the delete")
    // condition MATCHES the appended row -> refuse (lost-update guard)
    val v2 = Manifests.latestVersion(spark, b).get
    Manifests.append(Seq((9002L, 999, "hot")).toDF("id", "grp", "s"), b)
    intercept[ConcurrentCommitException] {
      Manifests.commitDeltaWrite(spark, b, v2,
        Seq(dvSidecar()), Seq.empty, Some("test"),
        conflict = Some(col("grp") === 999))
    }
    // uncapturable condition (None) -> conservative refusal
    val v3 = Manifests.latestVersion(spark, b).get
    Manifests.append(Seq((9003L, 1, "late2")).toDF("id", "grp", "s"), b)
    intercept[ConcurrentCommitException] {
      Manifests.commitDeltaWrite(spark, b, v3,
        Seq(dvSidecar()), Seq.empty, Some("test"), conflict = None)
    }
  }

  test("translatable DELETE on a vectored table still takes the metadata MoR tier, not the rewrite") {
    val b = mkVectored("ddmli")
    val v1 = Manifests.latestVersion(spark, b).get
    val before = canonFiles(b, v1)
    sql("DELETE FROM graft.ddmli.t WHERE id = 40")
    val v2 = Manifests.latestVersion(spark, b).get
    assert(canonFiles(b, v2) === before,
      "a translatable one-row DELETE writes no data files at all — " +
        "deleteWhereMor stacks a vector")
    assert(sql("SELECT COUNT(*) AS n FROM graft.ddmli.t WHERE id = 40")
      .head.getLong(0) === 0)
  }
}
