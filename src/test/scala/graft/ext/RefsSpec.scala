package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Named refs — tags, branches, write-audit-publish
  * ([[Manifests.createTag]]/[[Manifests.createBranch]]/
  * [[Manifests.fastForward]]): history addressable by NAME, vacuum
  * that respects references, and the Iceberg WAP flow end to end in
  * pure SQL. */
class RefsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_refs_wh").toString
    CatalogTestSupport.registerFreshCatalog(spark, d)
    d
  }

  private def sql(s: String) = spark.sql(s)

  private def mk(ns: String, rows: Int = 300): String = {
    wh
    sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    (1 to rows).map(i => (i.toLong, i % 5, s"v$i"))
      .toDF("id", "grp", "s").createOrReplaceTempView(s"${ns}_src")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM ${ns}_src")
    s"$wh/$ns/t"
  }

  test("tag pins a version by name: readable after DML, protected from vacuum, released on drop") {
    val b = mk("refta")
    sql("CALL graft.system.tag('refta.t', 'baseline', 0)")
    sql("DELETE FROM graft.refta.t WHERE grp = 2")
    sql("UPDATE graft.refta.t SET s = 'mut' WHERE grp = 3")
    // the tag reads the PRE-DML content through pure SQL
    assert(sql("SELECT COUNT(*) AS n FROM graft.refta.t " +
      "VERSION AS OF 'baseline'").head.getLong(0) === 300)
    assert(sql("SELECT COUNT(*) AS n FROM graft.refta.t").head.getLong(0)
      === 240)
    // vacuum keeps the tagged version even with keep_last=1
    sql("CALL graft.system.vacuum('refta.t', 1)")
    assert(sql("SELECT COUNT(*) AS n FROM graft.refta.t " +
      "VERSION AS OF 'baseline'").head.getLong(0) === 300,
      "vacuum reclaimed a tag-pinned version")
    // .refs metadata table lists it
    val refs = sql("SELECT name, kind, version FROM graft.refta.t.refs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(refs.toSeq === Seq(("baseline", "tag", 0)))
    // drop releases the pin; the next vacuum reclaims; the name errors
    sql("CALL graft.system.drop_ref('refta.t', 'baseline')")
    sql("CALL graft.system.vacuum('refta.t', 1)")
    val e = intercept[Throwable](
      sql("SELECT * FROM graft.refta.t VERSION AS OF 'baseline'").collect())
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("no ref 'baseline'") ||
      chain(e).contains("vacuumed"), chain(e))
  }

  test("WAP round-trip: branch, write+audit on the branch, fast-forward publishes atomically") {
    val b = mk("reftb")
    sql("CALL graft.system.branch('reftb.t', 'audit')")
    val bb = Manifests.branchBaseOf(b, "audit")
    // WRITE to the branch (path-addressed — the full protocol, OCC and
    // constraints included); main must not see it
    sql(s"INSERT INTO graft.`$bb` VALUES (9001, 99, 'staged')")
    sql(s"UPDATE graft.`$bb` SET s = 'fixed' WHERE id = 7")
    assert(sql("SELECT COUNT(*) AS n FROM graft.reftb.t").head.getLong(0)
      === 300, "main leaked unpublished branch writes")
    // AUDIT via the named read
    val audit = sql("SELECT COUNT(*) AS n FROM graft.reftb.t " +
      "VERSION AS OF 'audit' WHERE s IN ('staged', 'fixed')")
      .head.getLong(0)
    assert(audit === 2)
    // PUBLISH: one atomic commit on main
    val v0 = Manifests.latestVersion(spark, b).get
    sql("CALL graft.system.fast_forward('reftb.t', 'audit')")
    assert(Manifests.latestVersion(spark, b).get === v0 + 1)
    assert(sql("SELECT COUNT(*) AS n FROM graft.reftb.t " +
      "WHERE s IN ('staged', 'fixed')").head.getLong(0) === 2)
    assert(sql("SELECT COUNT(*) AS n FROM graft.reftb.t").head.getLong(0)
      === 301)
    // time travel still has the pre-publish main
    assert(sql(s"SELECT COUNT(*) AS n FROM graft.reftb.t VERSION AS OF $v0")
      .head.getLong(0) === 300)
    // a second audit cycle on the SAME branch publishes again
    sql(s"INSERT INTO graft.`$bb` VALUES (9002, 99, 'staged2')")
    sql("CALL graft.system.fast_forward('reftb.t', 'audit')")
    assert(sql("SELECT COUNT(*) AS n FROM graft.reftb.t").head.getLong(0)
      === 302)
  }

  test("fast-forward refuses when main diverged; dropped-branch storage lives until unreferenced") {
    val b = mk("reftc")
    sql("CALL graft.system.branch('reftc.t', 'audit')")
    val bb = Manifests.branchBaseOf(b, "audit")
    sql(s"INSERT INTO graft.`$bb` VALUES (9001, 99, 'staged')")
    // main moves concurrently — the fork is no longer main's head
    sql("INSERT INTO graft.reftc.t VALUES (8001, 88, 'hot')")
    val e = intercept[Throwable](
      sql("CALL graft.system.fast_forward('reftc.t', 'audit')"))
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("main moved"), chain(e))
    // re-branch from the new head and publish cleanly
    sql("CALL graft.system.drop_ref('reftc.t', 'audit')")
    sql("CALL graft.system.branch('reftc.t', 'audit2')")
    val bb2 = Manifests.branchBaseOf(b, "audit2")
    sql(s"INSERT INTO graft.`$bb2` VALUES (9002, 99, 'staged2')")
    sql("CALL graft.system.fast_forward('reftc.t', 'audit2')")
    assert(sql("SELECT COUNT(*) AS n FROM graft.reftc.t").head.getLong(0)
      === 302)
    // main's head references the branch's image file: the drop
    // releases the NAME but must keep the storage until unreferenced
    sql("CALL graft.system.drop_ref('reftc.t', 'audit2')")
    assert(Dfs.exists(spark, bb2),
      "referenced branch storage must survive its ref drop")
    assert(sql("SELECT COUNT(*) AS n FROM graft.reftc.t").head.getLong(0)
      === 302, "main must keep reading through the dropped-ref storage")
    // a compact re-homes the bytes under main; vacuum retires the
    // referencing versions and the orphan sweep reclaims the dir
    Manifests.compact(spark, b, 2)
    sql("CALL graft.system.vacuum('reftc.t', 1)")
    assert(!Dfs.exists(spark, bb2),
      "unreferenced ref-less branch directory must sweep")
    assert(sql("SELECT COUNT(*) AS n FROM graft.reftc.t").head.getLong(0)
      === 302)
  }

  test("t.branch_<name> addresses the branch as a table: INSERT/UPDATE/SELECT by name, then publish") {
    val b = mk("reftg")
    sql("CALL graft.system.branch('reftg.t', 'audit')")
    // the Iceberg branch-write spelling — no path addressing anywhere
    sql("INSERT INTO graft.reftg.t.branch_audit VALUES (9001, 99, 'staged')")
    sql("UPDATE graft.reftg.t.branch_audit SET s = 'fixed' WHERE id = 7")
    assert(sql("SELECT COUNT(*) AS n FROM graft.reftg.t.branch_audit " +
      "WHERE s IN ('staged', 'fixed')").head.getLong(0) === 2)
    assert(sql("SELECT COUNT(*) AS n FROM graft.reftg.t").head.getLong(0)
      === 300, "main leaked branch-name writes")
    sql("CALL graft.system.fast_forward('reftg.t', 'audit')")
    assert(sql("SELECT COUNT(*) AS n FROM graft.reftg.t " +
      "WHERE s IN ('staged', 'fixed')").head.getLong(0) === 2)
    // unknown branch name keeps the normal missing-table error
    val e = intercept[Throwable](
      sql("SELECT * FROM graft.reftg.t.branch_nope").collect())
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).toLowerCase.contains("cannot be found") ||
      chain(e).toLowerCase.contains("table_or_view_not_found"), chain(e))
  }

  test("fast-forward carries the branch's transaction ledger: a replay against published main is suppressed") {
    val b = mk("refte")
    sql("CALL graft.system.branch('refte.t', 'sink')")
    val bb = Manifests.branchBaseOf(b, "sink")
    val batch = Seq((9001L, 99, "epoch5")).toDF("id", "grp", "s")
    // an idempotent writer lands epoch 5 on the BRANCH
    assert(Manifests.appendBatch(batch, bb, 5L, "wapwriter").isDefined)
    sql("CALL graft.system.fast_forward('refte.t', 'sink')")
    assert(sql("SELECT COUNT(*) AS n FROM graft.refte.t WHERE id = 9001")
      .head.getLong(0) === 1)
    // the writer replays epoch 5 against MAIN after the publish: the
    // published ledger must suppress it (None), not double-append
    assert(Manifests.appendBatch(batch, b, 5L, "wapwriter").isEmpty,
      "published main lost the branch's replay high-water mark")
    assert(sql("SELECT COUNT(*) AS n FROM graft.refte.t WHERE id = 9001")
      .head.getLong(0) === 1)
    // a GENUINELY new epoch still lands
    assert(Manifests.appendBatch(
      Seq((9002L, 99, "epoch6")).toDF("id", "grp", "s"), b, 6L,
      "wapwriter").isDefined)
  }

  test("VERSION AS OF with a malformed ref name gets the refs-listing error, not a charset require") {
    val b = mk("reftf")
    sql("CALL graft.system.tag('reftf.t', 'good', 0)")
    val e = intercept[Throwable](
      sql("SELECT * FROM graft.reftf.t VERSION AS OF 'my tag'").collect())
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("no ref 'my tag'") &&
      chain(e).contains("good"), chain(e))
  }

  test("branch-side vacuum never reclaims files a published main still references") {
    val b = mk("refth")
    sql("CALL graft.system.branch('refth.t', 'audit')")
    val bb = Manifests.branchBaseOf(b, "audit")
    // the branch REWRITES everything (CoW UPDATE → fresh data dir under
    // the branch), then publishes: main's new head points at files that
    // live under the branch directory
    sql(s"UPDATE graft.`$bb` SET s = 'published'")
    sql("CALL graft.system.fast_forward('refth.t', 'audit')")
    assert(sql("SELECT COUNT(*) AS n FROM graft.refth.t " +
      "WHERE s = 'published'").head.getLong(0) === 300)
    // the branch keeps moving (the supported repeat-audit flow): its
    // own history retires the published files…
    sql(s"UPDATE graft.`$bb` SET s = 'next_audit_round'")
    // …and a branch-side vacuum with keep_last=1 must NOT delete them —
    // they are referenced by MAIN, which the branch's own manifests
    // cannot see (the published-pin protection)
    Manifests.vacuum(spark, bb, keepLast = 1)
    assert(sql("SELECT COUNT(*) AS n FROM graft.refth.t " +
      "WHERE s = 'published'").head.getLong(0) === 300,
      "branch-side vacuum reclaimed files a published main references")
    // main retires the published head; now nothing pins the old branch
    // files and the NEXT branch vacuum may reclaim them
    sql("UPDATE graft.refth.t SET s = 'rehomed'")
    sql("CALL graft.system.vacuum('refth.t', 1)")
    Manifests.vacuum(spark, bb, keepLast = 1)
    assert(sql("SELECT COUNT(*) AS n FROM graft.refth.t " +
      "WHERE s = 'rehomed'").head.getLong(0) === 300)
    assert(Manifests.readLatest(spark, bb)
      .filter(col("s") === "next_audit_round").count() === 300,
      "branch head must survive its own vacuum")
  }

  test("concurrent tag creators of one name: exactly one wins, content is the winner's") {
    val b = mk("refti")
    sql("INSERT INTO graft.refti.t VALUES (9001, 9, 'x')") // v1 exists
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val results = (0 until 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Option[Int]] {
          // racers pin DIFFERENT versions — a lost race that silently
          // overwrote would leave content from a loser
          def call(): Option[Int] = {
            val v = i % 2
            try { Manifests.createTag(spark, b, "raced", v); Some(v) }
            catch { case _: IllegalArgumentException => None }
          }
        })
      }.map(_.get())
      val winners = results.flatten
      assert(winners.size === 1,
        s"expected exactly one createTag winner, got $winners")
      val pinned = sql(
        "SELECT version FROM graft.refti.t.refs WHERE name = 'raced'")
        .head.getInt(0)
      assert(pinned === winners.head,
        "ref content must be the race winner's version")
    } finally pool.shutdown()
  }

  test("stale publish anchor (crash between commit and ref write) recovers instead of refusing forever") {
    val b = mk("reftj")
    sql("CALL graft.system.branch('reftj.t', 'audit')")
    val bb = Manifests.branchBaseOf(b, "audit")
    sql(s"INSERT INTO graft.`$bb` VALUES (9001, 99, 'staged')")
    val published = Manifests.fastForward(spark, b, "audit")
    // simulate the crash: the publish committed but the ref write never
    // landed — rewind the ref to the pre-publish anchor
    Dfs.writeBytes(spark, s"$b/_refs/audit",
      s"branch\t${published - 1}\n".getBytes("UTF-8"))
    // retry of the crashed publish: main's head is tagged wap:audit and
    // carries the branch state — recovery repairs the ref and returns
    // the existing head WITHOUT burning a duplicate version
    assert(Manifests.fastForward(spark, b, "audit") === published,
      "idempotent retry must return the already-published head")
    assert(Manifests.latestVersion(spark, b).get === published,
      "retry must not re-commit an identical publish")
    // a METADATA-ONLY branch change after the crash must still
    // publish on retry — "same state" covers schema/constraints/etc.,
    // not just file sets (a swallowed ADD COLUMN would report success
    // while main silently misses the column)
    Dfs.writeBytes(spark, s"$b/_refs/audit",
      s"branch\t${published - 1}\n".getBytes("UTF-8"))
    Manifests.addColumn(spark, bb, "extra",
      org.apache.spark.sql.types.IntegerType)
    val republished = Manifests.fastForward(spark, b, "audit")
    assert(republished === published + 1,
      "a post-crash metadata change must force a real re-publish")
    assert(sql("SELECT extra FROM graft.reftj.t LIMIT 1").columns
      .contains("extra"))
    // the repaired anchor lets the next audit cycle proceed normally
    sql(s"INSERT INTO graft.`$bb` VALUES (9002, 99, 'staged2', NULL)")
    assert(Manifests.fastForward(spark, b, "audit") === published + 2)
    assert(sql("SELECT COUNT(*) AS n FROM graft.reftj.t").head.getLong(0)
      === 302)
    // a moved head with any OTHER tag still refuses — recovery is
    // strictly the wap:<name> shape
    sql("CALL graft.system.branch('reftj.t', 'other')")
    sql("INSERT INTO graft.reftj.t VALUES (8001, 88, 'hot', NULL)")
    val e = intercept[Throwable](
      Manifests.fastForward(spark, b, "other"))
    assert(e.getMessage.contains("main moved"), e.getMessage)
  }

  test("branch fork point survives main's vacuum while the branch lives") {
    val b = mk("reftd")
    sql("CALL graft.system.branch('reftd.t', 'keepme')")
    // main rewrites everything twice — without ref protection the fork
    // version's files would reclaim and the branch would dangle
    sql("UPDATE graft.reftd.t SET s = 'a'")
    sql("UPDATE graft.reftd.t SET s = 'b'")
    sql("CALL graft.system.vacuum('reftd.t', 1)")
    val bb = Manifests.branchBaseOf(b, "keepme")
    assert(Manifests.readLatest(spark, bb).count() === 300,
      "vacuum pulled files out from under a live branch")
    sql("CALL graft.system.drop_ref('reftd.t', 'keepme')")
    sql("CALL graft.system.vacuum('reftd.t', 1)")
    assert(Manifests.history(spark, b).size === 1)
  }
}
