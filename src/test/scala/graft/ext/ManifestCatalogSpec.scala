package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DSv2 catalog surface: name-based manifest tables and the SQL
  * row-level DML triad. Every mutation in this suite is issued ONLY
  * through `spark.sql` DML strings — the point is that the full
  * protocol (OCC, constraints, sidecar maintenance, file-surgical
  * rewrites) holds on the pure-SQL path. */
/** A local filesystem whose delete silently FAILS (returns false, the
  * way HDFS signals e.g. a trash-policy refusal) for any path under the
  * armed prefix — the failure mode `DROP TABLE` must not paper over. */
class FailingDeleteFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftdel:///")
  override def delete(p: org.apache.hadoop.fs.Path,
      recursive: Boolean): Boolean = {
    val armed = FailingDeleteFileSystem.failUnder.get()
    if (armed != null && p.toUri.getPath.startsWith(armed)) false
    else super.delete(p, recursive)
  }
}
object FailingDeleteFileSystem {
  val failUnder = new java.util.concurrent.atomic.AtomicReference[String](null)
}

class ManifestCatalogSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_cat_wh").toString
    CatalogTestSupport.registerFreshCatalog(spark, d)
    d
  }

  private def sql(s: String) = spark.sql(s)

  test("CREATE TABLE / INSERT INTO / SELECT / INSERT OVERWRITE round-trip by name") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
    sql("CREATE TABLE graft.db.t1 (id BIGINT, k INT, s STRING)")
    sql("INSERT INTO graft.db.t1 VALUES (1, 10, 'a'), (2, 20, 'b')")
    sql("INSERT INTO graft.db.t1 VALUES (3, 30, 'c')")
    assert(sql("SELECT * FROM graft.db.t1").count() === 3)
    assert(spark.table("graft.db.t1").filter($"k" === 20).count() === 1)
    // overwrite supersedes; history stays (versions advanced)
    sql("INSERT OVERWRITE graft.db.t1 VALUES (9, 90, 'z')")
    assert(sql("SELECT * FROM graft.db.t1").collect().map(_.getLong(0)).toSeq === Seq(9L))
  }

  test("DELETE FROM by name is file-surgical; UPDATE and MERGE land through SQL only") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.dml")
    sql("CREATE TABLE graft.dml.t (id BIGINT, k INT, s STRING)")
    // range-clustered bootstrap through SQL so the delete can be surgical
    (1 to 100).map(i => (i.toLong, i % 10, s"s$i")).toDF("id", "k", "s")
      .repartitionByRange(5, col("id"))
      .createOrReplaceTempView("src_rows")
    sql("INSERT INTO graft.dml.t SELECT * FROM src_rows")

    // DELETE: translatable predicate -> the metadata-optimized path
    sql("DELETE FROM graft.dml.t WHERE k = 3")
    assert(sql("SELECT COUNT(*) AS n FROM graft.dml.t").head.getLong(0) === 90)
    assert(sql("SELECT * FROM graft.dml.t WHERE k = 3").count() === 0)

    // UPDATE with expressions over the OLD row
    sql("UPDATE graft.dml.t SET s = concat(s, '!'), k = k + 100 WHERE id <= 10")
    val updated = sql("SELECT * FROM graft.dml.t WHERE id <= 10 AND k >= 100")
      .collect()
    assert(updated.length === 9) // id 3 was deleted (k=3)
    assert(updated.forall(_.getString(2).endsWith("!")))
    assert(sql("SELECT * FROM graft.dml.t WHERE s LIKE '%!'").count() === 9)

    // MERGE INTO: update matches, insert the rest
    Seq((50L, 999, "upd"), (500L, 5, "new"))
      .toDF("id", "k", "s").createOrReplaceTempView("merge_src")
    sql("""MERGE INTO graft.dml.t AS t USING merge_src AS s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET t.k = s.k, t.s = s.s
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(sql("SELECT k FROM graft.dml.t WHERE id = 50").head.getInt(0) === 999)
    assert(sql("SELECT s FROM graft.dml.t WHERE id = 500").head.getString(0) === "new")
    assert(sql("SELECT COUNT(*) AS n FROM graft.dml.t").head.getLong(0) === 91)
  }

  test("SQL UPDATE is file-surgical on a clustered, ANALYZEd table; group DELETE handles untranslatable predicates") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.surg")
    val base = s"$wh/surg/c"
    // clustered on id so zone maps make the rewrite surgical
    Manifests.commitData(
      (1 to 1000).map(i => (i.toLong, i % 7, s"s$i")).toDF("id", "k", "s")
        .repartitionByRange(8, col("id")), base)
    Manifests.analyze(spark, base, Seq("id"))
    sql(s"CREATE TABLE graft.surg.t (id BIGINT, k INT, s STRING) LOCATION '$base'")
    val v0 = Manifests.latestVersion(spark, base).get
    val before = Manifests.files(spark, base, v0).map(Dfs.canonical).toSet
    sql("UPDATE graft.surg.t SET s = 'hit' WHERE id BETWEEN 10 AND 20")
    val v1 = Manifests.latestVersion(spark, base).get
    val after = Manifests.files(spark, base, v1).map(Dfs.canonical).toSet
    // zone pruning on the pushed command condition keeps most files out
    // of the rewrite: they carry into the next manifest BY REFERENCE
    val carried = before.intersect(after)
    assert(carried.nonEmpty && carried.size >= 6,
      s"UPDATE rewrote ${before.size - carried.size} of ${before.size} " +
        "files — expected a zone-pruned surgical rewrite")
    assert(sql("SELECT COUNT(*) AS n FROM graft.surg.t WHERE s = 'hit'")
      .head.getLong(0) === 11)
    assert(sql("SELECT COUNT(*) AS n FROM graft.surg.t").head.getLong(0) === 1000)

    // an untranslatable DELETE falls back to the group rewrite and is
    // still exact (null-safe survivor semantics included)
    sql("DELETE FROM graft.surg.t WHERE length(s) = 2 AND id < 10")
    assert(sql("SELECT COUNT(*) AS n FROM graft.surg.t").head.getLong(0) === 991)
  }

  test("SQL DELETE on a partition column retires files by manifest arithmetic alone") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.part")
    val base = s"$wh/part/p"
    Manifests.commitDataPartitioned(
      (1 to 400).map(i => (i.toLong, s"N${i % 4}")).toDF("id", "country"),
      base, Seq("country"), filesPerWrite = 4)
    sql(s"CREATE TABLE graft.part.t (id BIGINT, country STRING) LOCATION '$base'")
    val v0 = Manifests.latestVersion(spark, base).get
    val before = Manifests.files(spark, base, v0).map(Dfs.canonical).toSet
    sql("DELETE FROM graft.part.t WHERE country = 'N2'")
    val v1 = Manifests.latestVersion(spark, base).get
    val after = Manifests.files(spark, base, v1).map(Dfs.canonical).toSet
    // metadata-only: every surviving file was carried by reference and
    // NO new file was written (partition-pure files drop whole)
    assert(after.subsetOf(before), "partition DELETE wrote new files")
    assert(after.size < before.size)
    assert(sql("SELECT COUNT(*) AS n FROM graft.part.t").head.getLong(0) === 300)
    assert(sql("SELECT COUNT(*) AS n FROM graft.part.t WHERE country = 'N2'")
      .head.getLong(0) === 0)
  }

  test("CHECK constraints hold on the SQL DML path; violating UPDATE refuses without burning a version") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ck")
    val base = s"$wh/ck/t"
    sql(s"CREATE TABLE graft.ck.t (id BIGINT, qty INT) LOCATION '$base'")
    sql("INSERT INTO graft.ck.t VALUES (1, 5), (2, 7)")
    Manifests.addConstraint(spark, base, "qty_pos", "qty > 0")
    val v = Manifests.latestVersion(spark, base).get
    intercept[Exception](sql("UPDATE graft.ck.t SET qty = -1 WHERE id = 1"))
    assert(Manifests.latestVersion(spark, base) === Some(v))
    assert(sql("SELECT qty FROM graft.ck.t WHERE id = 1").head.getInt(0) === 5)
    // a violating SQL INSERT refuses the same way
    intercept[Exception](sql("INSERT INTO graft.ck.t VALUES (3, 0)"))
    assert(sql("SELECT COUNT(*) AS n FROM graft.ck.t").head.getLong(0) === 2)
    // and a legal UPDATE through the same path lands
    sql("UPDATE graft.ck.t SET qty = 9 WHERE id = 2")
    assert(sql("SELECT qty FROM graft.ck.t WHERE id = 2").head.getInt(0) === 9)
  }

  test("time travel, path addressing, CTAS, RENAME and DROP through the catalog") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.tt")
    sql("CREATE TABLE graft.tt.t (id BIGINT, s STRING)")
    sql("INSERT INTO graft.tt.t VALUES (1, 'a')")
    sql("INSERT INTO graft.tt.t VALUES (2, 'b')")
    sql("DELETE FROM graft.tt.t WHERE id = 1")
    assert(sql("SELECT COUNT(*) AS n FROM graft.tt.t").head.getLong(0) === 1)
    // VERSION AS OF: v1 = after the second insert, before the delete
    assert(sql("SELECT COUNT(*) AS n FROM graft.tt.t VERSION AS OF 1")
      .head.getLong(0) === 2)
    assert(sql("SELECT COUNT(*) AS n FROM graft.tt.t VERSION AS OF 0")
      .head.getLong(0) === 1)

    // Delta-style path addressing: no registration at all
    val pbase = s"$wh/free/standing"
    Manifests.commitData(Seq((7L, "x")).toDF("id", "s"), pbase)
    assert(sql(s"SELECT * FROM graft.`$pbase`").count() === 1)
    sql(s"INSERT INTO graft.`$pbase` VALUES (8, 'y')")
    assert(Manifests.readLatest(spark, pbase).count() === 2)

    // CTAS
    sql("CREATE TABLE graft.tt.c AS SELECT * FROM graft.tt.t")
    assert(sql("SELECT * FROM graft.tt.c").count() === 1)

    // RENAME keeps content; DROP removes managed data (the TO side is
    // catalog-relative — Spark resolves it inside the source catalog)
    sql("ALTER TABLE graft.tt.c RENAME TO tt.c2")
    assert(sql("SELECT * FROM graft.tt.c2").count() === 1)
    assert(!spark.catalog.tableExists("graft.tt.c"))
    sql("DROP TABLE graft.tt.c2")
    intercept[Exception](sql("SELECT * FROM graft.tt.c2").collect())
  }

  test("concurrent SQL UPDATEs serialize through OCC: no lost update, losers refuse cleanly") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.occ")
    val base = s"$wh/occ/t"
    sql(s"CREATE TABLE graft.occ.t (id BIGINT, n INT) LOCATION '$base'")
    sql("INSERT INTO graft.occ.t VALUES (1, 0), (2, 0)")
    val v0 = Manifests.latestVersion(spark, base).get
    import scala.concurrent._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val fs = (1 to 2).map(i => Future {
      try Right(sql(s"UPDATE graft.occ.t SET n = n + 1 WHERE id = $i"))
      catch { case e: Throwable => Left(e) }
    })
    val rs = Await.result(Future.sequence(fs),
      duration.Duration(180, "s"))
    pool.shutdown()
    val ok = rs.count(_.isRight)
    // at least one writer lands; EVERY landed update is fully visible
    // and every refused one is fully invisible (version math proves it)
    assert(ok >= 1)
    assert(sql("SELECT CAST(SUM(n) AS INT) AS s FROM graft.occ.t")
      .head.getInt(0) === ok)
    assert(Manifests.latestVersion(spark, base).get === v0 + ok)
    // a loser surfaces the protocol refusal, never silent corruption
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    rs.collect { case Left(e) => e }.foreach(e =>
      assert(chain(e).exists(_.isInstanceOf[ConcurrentCommitException]),
        s"unexpected failure kind: $e"))
  }

  test("metadata tables: history/files/constraints queryable as graft.ns.t.<view>") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.meta")
    sql("CREATE TABLE graft.meta.t (id BIGINT, qty INT)")
    sql("INSERT INTO graft.meta.t VALUES (1, 5)")
    sql("INSERT INTO graft.meta.t VALUES (2, 6)")
    sql("DELETE FROM graft.meta.t WHERE id = 1")
    val hist = sql(
      "SELECT version, n_files, tag FROM graft.meta.t.history ORDER BY version")
      .collect()
    assert(hist.map(_.getInt(0)).toSeq === Seq(0, 1, 2))
    val files = sql("SELECT file, size_bytes FROM graft.meta.t.files").collect()
    assert(files.nonEmpty && files.forall(_.getLong(1) > 0))
    Manifests.addConstraint(spark, s"$wh/meta/t", "qty_pos", "qty > 0")
    assert(sql("SELECT name, predicate FROM graft.meta.t.constraints")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("qty_pos", "qty > 0")))
    // the view reflects the CURRENT state on every query, not load time
    sql("INSERT INTO graft.meta.t VALUES (3, 7)")
    assert(sql("SELECT MAX(version) AS v FROM graft.meta.t.history")
      .head.getInt(0) === 4) // +constraint version +insert
  }

  test("catalog aggregates answer from metadata: COUNT/MIN/MAX/SUM collapse to a LocalRelation") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.fast")
    val base = s"$wh/fast/t"
    Manifests.commitData(
      (1 to 500).map(i => (i.toLong, i % 10)).toDF("id", "k").repartition(4),
      base)
    Manifests.analyze(spark, base, Seq("k"))
    sql(s"CREATE TABLE graft.fast.t (id BIGINT, k INT) LOCATION '$base'")
    def localPlan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      }.nonEmpty
    val agg = sql("""SELECT COUNT(*) AS n, MIN(k) AS mn, MAX(k) AS mx,
                    |SUM(k) AS s, COUNT(k) AS nk FROM graft.fast.t""".stripMargin)
    assert(localPlan(agg),
      "DSv2 catalog aggregate over an ANALYZEd table must fold from metadata")
    val r = agg.head
    assert(r.getLong(0) === 500L && r.getInt(1) === 0 && r.getInt(2) === 9)
    assert(r.getLong(3) === 2250L && r.getLong(4) === 500L)
    // the proof survives a catalog INSERT (incremental stats segment)
    sql("INSERT INTO graft.fast.t VALUES (9001, 4)")
    val agg2 = sql("SELECT COUNT(*) AS n, SUM(k) AS s FROM graft.fast.t")
    assert(localPlan(agg2))
    assert(agg2.head.getLong(0) === 501L && agg2.head.getLong(1) === 2254L)
    // unprovable shapes keep the real scan, correctly
    val filtered = sql("SELECT COUNT(*) AS n FROM graft.fast.t WHERE k = 3")
    assert(!localPlan(filtered)) // k is a stats key, not a partition col
    assert(filtered.head.getLong(0) === 50L)
    assert(!localPlan(sql("SELECT MIN(id) AS m FROM graft.fast.t"))) // unindexed
  }

  test("SQL MERGE is file-surgical: runtime group filtering narrows the rewrite to matching files") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.rgf")
    val base = s"$wh/rgf/t"
    Manifests.commitData(
      (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
        .repartitionByRange(8, col("id")), base)
    Manifests.analyze(spark, base, Seq("id"))
    sql(s"CREATE TABLE graft.rgf.t (id BIGINT, s STRING) LOCATION '$base'")
    val v0 = Manifests.latestVersion(spark, base).get
    val before = Manifests.files(spark, base, v0).map(Dfs.canonical).toSet
    Seq((15L, "upd"), (16L, "upd2"), (1500L, "new"))
      .toDF("id", "s").createOrReplaceTempView("rgf_src")
    sql("""MERGE INTO graft.rgf.t t USING rgf_src u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET t.s = u.s
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val v1 = Manifests.latestVersion(spark, base).get
    val after = Manifests.files(spark, base, v1).map(Dfs.canonical).toSet
    // the matched keys (15, 16) live in ONE id-clustered file: the
    // runtime IN-list reaches the zone index, every other file carries
    // by reference — a small MERGE must not rewrite the table
    val carried = before.intersect(after)
    assert(carried.size >= 6,
      s"MERGE rewrote ${before.size - carried.size} of ${before.size} " +
        "files — runtime group filtering did not narrow the rewrite")
    assert(sql("SELECT s FROM graft.rgf.t WHERE id = 15").head.getString(0) === "upd")
    assert(sql("SELECT s FROM graft.rgf.t WHERE id = 16").head.getString(0) === "upd2")
    assert(sql("SELECT s FROM graft.rgf.t WHERE id = 1500").head.getString(0) === "new")
    assert(sql("SELECT COUNT(*) AS n FROM graft.rgf.t").head.getLong(0) === 1001)
    assert(sql("SELECT COUNT(*) AS n FROM graft.rgf.t WHERE s LIKE 'v%'")
      .head.getLong(0) === 998)
  }

  test("CALL procedures: compact, analyze, constraints, restore and vacuum through pure SQL") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.proc")
    val base = s"$wh/proc/t"
    sql(s"CREATE TABLE graft.proc.t (id BIGINT, qty INT) LOCATION '$base'")
    (1 to 6).foreach(i => sql(s"INSERT INTO graft.proc.t VALUES ($i, $i)"))
    // compact the insert drip into one file; content unchanged
    val c = sql("CALL graft.system.compact('proc.t', 1)").head
    assert(c.getInt(1) === 1 && c.getInt(0) >= 6)
    assert(sql("SELECT COUNT(*) AS n FROM graft.proc.t").head.getLong(0) === 6)
    // ANALYZE via CALL arms the metadata-only aggregates
    sql("CALL graft.system.analyze('proc.t', 'qty')")
    val fast = sql("SELECT COUNT(*) AS n, SUM(qty) AS s FROM graft.proc.t")
    assert(fast.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.nonEmpty)
    assert(fast.head.getLong(1) === 21L)
    // constraints round-trip through CALL; enforcement via SQL INSERT
    sql("CALL graft.system.add_constraint('proc.t', 'qty_pos', 'qty > 0')")
    assert(sql("SELECT name FROM graft.proc.t.constraints").head.getString(0)
      === "qty_pos")
    intercept[Exception](sql("INSERT INTO graft.proc.t VALUES (9, -1)"))
    sql("CALL graft.system.drop_constraint('proc.t', 'qty_pos')")
    sql("INSERT INTO graft.proc.t VALUES (9, -1)")
    assert(sql("SELECT COUNT(*) AS n FROM graft.proc.t").head.getLong(0) === 7)
    // restore via CALL: back to the pre-(-1) table
    val vPre = Manifests.latestVersion(spark, base).get - 1
    sql(s"CALL graft.system.restore('proc.t', $vPre)")
    assert(sql("SELECT COUNT(*) AS n FROM graft.proc.t").head.getLong(0) === 6)
    // vacuum via CALL drops expired versions
    val vac = sql("CALL graft.system.vacuum('proc.t', 2)").head
    assert(vac.getInt(0) > 0)
    assert(sql("SELECT COUNT(*) AS n FROM graft.proc.t").head.getLong(0) === 6)
  }

  test("CALL procedures: the MoR DML faces — delete_mor/update_mor/merge_mor land vectors + images through pure SQL") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.mordml")
    val base = s"$wh/mordml/t"
    sql(s"CREATE TABLE graft.mordml.t (id BIGINT, k INT, qty BIGINT) " +
      s"LOCATION '$base'")
    sql("INSERT INTO graft.mordml.t SELECT id, 1, CAST(10 AS BIGINT) FROM range(100)")
    sql("INSERT INTO graft.mordml.t SELECT id + 100, 2, CAST(10 AS BIGINT) FROM range(100)")
    val files0 = Manifests.files(spark, base,
      Manifests.latestVersion(spark, base).get).toSet
    // MoR DELETE via CALL: vectors stack, zero data files rewritten
    val del = sql(
      "CALL graft.system.delete_mor('mordml.t', 'id % 10 = 0')").head
    assert(del.getLong(0) === 20)
    val v1 = Manifests.latestVersion(spark, base).get
    assert(Manifests.dvFiles(spark, base, v1).nonEmpty)
    assert(Manifests.files(spark, base, v1).toSet === files0,
      "a MoR delete must not rewrite data files")
    // (plain SQL UPDATE now lands natively on vectored tables via
    // SupportsDelta — DeltaDmlSpec pins that path; this suite pins the
    // CALL faces, which stay as Iceberg-style compat procedures)
    // update_mor reads THROUGH the vectors; multi-assignment SETs
    // parse with full SQL expressions (';'-separated)
    val upd = sql("CALL graft.system.update_mor('mordml.t', 'k = 1', " +
      "'qty = qty + 5; k = 7')").head
    assert(upd.getLong(1) === 90)
    assert(sql("SELECT COUNT(*) AS n FROM graft.mordml.t " +
      "WHERE k = 7 AND qty = 15").head.getLong(0) === 90)
    assert(sql("SELECT COUNT(*) AS n FROM graft.mordml.t")
      .head.getLong(0) === 180)
    // merge_mor from a registered view: matched update + insert
    spark.sql("SELECT CAST(105 AS BIGINT) AS id, 9 AS k, " +
      "CAST(1 AS BIGINT) AS qty UNION ALL " +
      "SELECT CAST(9999 AS BIGINT), 9, CAST(2 AS BIGINT)")
      .createOrReplaceTempView("mordml_upd")
    val mrg = sql(
      "CALL graft.system.merge_mor('mordml.t', 'mordml_upd', 'id')").head
    assert(mrg.getLong(1) === 2)
    assert(sql("SELECT k FROM graft.mordml.t WHERE id = 105")
      .head.getInt(0) === 9)
    assert(sql("SELECT COUNT(*) AS n FROM graft.mordml.t")
      .head.getLong(0) === 181)
    // time travel across the whole CALL-driven MoR lineage
    assert(sql(s"SELECT COUNT(*) AS n FROM graft.mordml.t VERSION AS OF $v1")
      .head.getLong(0) === 180)
    // assignment parsing edges: a ';' inside a string literal is NOT a
    // separator; duplicate SET columns refuse like SQL UPDATE's rule
    sql("ALTER TABLE graft.mordml.t ADD COLUMN note STRING")
    val lit = sql("CALL graft.system.update_mor('mordml.t', 'id = 1', " +
      "\"note = 'a;b'\")").head
    assert(lit.getLong(1) === 1)
    assert(sql("SELECT note FROM graft.mordml.t WHERE id = 1")
      .head.getString(0) === "a;b")
    intercept[Exception](sql(
      "CALL graft.system.update_mor('mordml.t', 'id = 2', " +
        "'qty = 1; qty = 2')"))
    // a backslash-ESCAPED quote inside the literal must not close it:
    // the RHS `'a\';b'` is one literal whose value is a';b — Spark's
    // own lexing — and the ';' inside it is not a separator
    val esc = sql("CALL graft.system.update_mor('mordml.t', 'id = 1', " +
      "'note = \\'a\\\\\\';b\\'')").head
    assert(esc.getLong(1) === 1)
    assert(sql("SELECT note FROM graft.mordml.t WHERE id = 1")
      .head.getString(0) === "a';b")
  }

  test("MERGE bootstraps an empty created table; DML on empty tables no-ops; traversal idents refuse; CASCADE drops managed data") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.boot")
    sql("CREATE TABLE graft.boot.t (id BIGINT, s STRING)")
    // DELETE/UPDATE against the never-written table are no-ops
    sql("DELETE FROM graft.boot.t WHERE id = 1")
    sql("UPDATE graft.boot.t SET s = 'x' WHERE id = 1")
    assert(sql("SELECT * FROM graft.boot.t").count() === 0)
    // the Delta merge-bootstrap shape: NOT MATCHED inserts create v0
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .createOrReplaceTempView("boot_src")
    sql("""MERGE INTO graft.boot.t t USING boot_src u ON t.id = u.id
          |WHEN MATCHED THEN UPDATE SET t.s = u.s
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(sql("SELECT * FROM graft.boot.t").count() === 2)
    assert(Manifests.latestVersion(spark, s"$wh/boot/t") === Some(0))

    // a relative-segment identifier must refuse, not traverse out of
    // the metastore (DROP NAMESPACE CASCADE deletes recursively)
    intercept[Exception](sql("CREATE NAMESPACE graft.`..`"))
    intercept[Exception](sql("DROP NAMESPACE IF EXISTS graft.`..` CASCADE"))

    // CASCADE drops the managed DATA, not just the registrations
    sql("CREATE NAMESPACE IF NOT EXISTS graft.casc")
    sql("CREATE TABLE graft.casc.t AS SELECT 1L AS id")
    val dataDir = s"$wh/casc/t"
    assert(Manifests.latestVersion(spark, dataDir).isDefined)
    sql("DROP NAMESPACE graft.casc CASCADE")
    assert(!Dfs.exists(spark, dataDir),
      "cascade must delete managed table data, not orphan it")
    assert(!Dfs.exists(spark, s"$wh/_defs/casc"))
  }

  test("SQL ALTER TABLE ADD COLUMN is metadata-only: files carried by reference, time travel under each version's own schema, tombstoned names refuse") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.addc")
    sql("CREATE TABLE graft.addc.t (id BIGINT, s STRING)")
    sql("INSERT INTO graft.addc.t VALUES (1, 'a'), (2, 'b')")
    val b = s"$wh/addc/t"
    val v0 = Manifests.latestVersion(spark, b).get
    val files0 = Manifests.files(spark, b, v0)
    sql("ALTER TABLE graft.addc.t ADD COLUMN score DOUBLE")
    val v1 = Manifests.latestVersion(spark, b).get
    assert(v1 === v0 + 1, "ADD COLUMN must land as one new version")
    assert(Manifests.files(spark, b, v1) === files0,
      "ADD COLUMN is metadata-only — the same files carried by reference")
    // existing rows null-fill; the widened schema is live immediately
    assert(spark.table("graft.addc.t").columns.toSeq ===
      Seq("id", "s", "score"))
    assert(sql("SELECT * FROM graft.addc.t WHERE score IS NULL")
      .count() === 2)
    // the post-ADD insert carries the column
    sql("INSERT INTO graft.addc.t VALUES (3, 'c', 1.5)")
    assert(sql("SELECT score FROM graft.addc.t WHERE id = 3")
      .head.getDouble(0) === 1.5)
    // time travel reads each version under ITS schema
    assert(sql(s"SELECT * FROM graft.addc.t VERSION AS OF $v0")
      .columns.toSeq === Seq("id", "s"))
    assert(sql(s"SELECT * FROM graft.addc.t VERSION AS OF $v1")
      .columns.toSeq === Seq("id", "s", "score"))
    // duplicate and NOT NULL refuse; ADD COLUMNS (plural) widens again
    intercept[Exception](sql("ALTER TABLE graft.addc.t ADD COLUMN id INT"))
    intercept[Exception](
      sql("ALTER TABLE graft.addc.t ADD COLUMN z INT NOT NULL"))
    sql("ALTER TABLE graft.addc.t ADD COLUMNS (u STRING, w INT)")
    assert(spark.table("graft.addc.t").columns.toSeq ===
      Seq("id", "s", "score", "u", "w"))
    // a dropped name is tombstoned: re-ADDing it would resurrect the
    // old files' physical bytes instead of null-filling — refuse
    sql("ALTER TABLE graft.addc.t DROP COLUMN s")
    assert(spark.table("graft.addc.t").columns.toSeq ===
      Seq("id", "score", "u", "w"))
    intercept[Exception](
      sql("ALTER TABLE graft.addc.t ADD COLUMN s STRING"))
  }

  test("SQL ALTER TABLE RENAME COLUMN is metadata-only: era-composed reads, filters and aggregates on the new name, CoW refusal with compact escape") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.renc")
    sql("CREATE TABLE graft.renc.t (id BIGINT, s STRING)")
    sql("INSERT INTO graft.renc.t VALUES (1, 'a'), (2, 'b')")
    val b = s"$wh/renc/t"
    val v0 = Manifests.latestVersion(spark, b).get
    val files0 = Manifests.files(spark, b, v0)
    sql("ALTER TABLE graft.renc.t RENAME COLUMN s TO label")
    val v1 = Manifests.latestVersion(spark, b).get
    assert(v1 === v0 + 1, "RENAME COLUMN must land as one new version")
    assert(Manifests.files(spark, b, v1) === files0,
      "RENAME COLUMN is metadata-only — the same files carried by reference")
    // pre-rename rows surface their REAL values under the new name
    assert(spark.table("graft.renc.t").columns.toSeq === Seq("id", "label"))
    assert(sql("SELECT label FROM graft.renc.t WHERE id = 1")
      .head.getString(0) === "a")
    assert(sql("SELECT count(*) FROM graft.renc.t WHERE label IS NULL")
      .head.getLong(0) === 0)
    // post-rename inserts mix with pre-rename files; filters and
    // aggregates on the new name span both eras
    sql("INSERT INTO graft.renc.t VALUES (3, 'a')")
    assert(sql("SELECT count(*) FROM graft.renc.t WHERE label = 'a'")
      .head.getLong(0) === 2)
    assert(sql("SELECT label, count(*) AS n FROM graft.renc.t GROUP BY label " +
      "ORDER BY label").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq === Seq(("a", 2L), ("b", 1L)))
    // time travel reads each version under ITS name
    assert(sql(s"SELECT * FROM graft.renc.t VERSION AS OF $v0")
      .columns.toSeq === Seq("id", "s"))
    // DELETE reads through eras (the CoW path is era-aware)
    sql("DELETE FROM graft.renc.t WHERE label = 'b'")
    assert(sql("SELECT count(*) FROM graft.renc.t").head.getLong(0) === 2)
    // UPDATE rides the group-based CoW rewrite, whose raw-file scan
    // cannot re-map physical names — it refuses with the compact()
    // contract, and compact() heals the table back to the fast path
    val e = intercept[Exception](
      sql("UPDATE graft.renc.t SET label = 'z' WHERE id = 1"))
    assert(e.getMessage.contains("compact"))
    Manifests.compact(spark, b, 1)
    assert(!Manifests.hasLiveRenames(spark, b,
      Manifests.latestVersion(spark, b).get))
    sql("UPDATE graft.renc.t SET label = 'z' WHERE id = 1")
    assert(sql("SELECT label FROM graft.renc.t WHERE id = 1")
      .head.getString(0) === "z")
    // the old name is gone: SELECTing it fails analysis, and its
    // tombstone (which outlives compact — a rewrite keeps the parent
    // chain) still refuses a re-ADD
    intercept[Exception](sql("SELECT s FROM graft.renc.t"))
    intercept[Exception](
      sql("ALTER TABLE graft.renc.t ADD COLUMN s STRING"))
  }

  test("SQL ALTER TABLE ALTER COLUMN TYPE is metadata-only widening: mixed-era reads, DML under the wide type, narrowing refused") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.widc")
    sql("CREATE TABLE graft.widc.t (id BIGINT, n INT)")
    sql("INSERT INTO graft.widc.t VALUES (1, 10), (2, 20)")
    val b = s"$wh/widc/t"
    val v0 = Manifests.latestVersion(spark, b).get
    val files0 = Manifests.files(spark, b, v0)
    sql("ALTER TABLE graft.widc.t ALTER COLUMN n TYPE BIGINT")
    val v1 = Manifests.latestVersion(spark, b).get
    assert(v1 === v0 + 1, "ALTER COLUMN TYPE must land as one new version")
    assert(Manifests.files(spark, b, v1) === files0,
      "type widening is metadata-only — the same files carried by reference")
    assert(spark.table("graft.widc.t").schema("n").dataType ===
      org.apache.spark.sql.types.LongType)
    // narrow-era bytes surface with their real values as BIGINT, and a
    // post-widening insert carries a value only the wide type holds —
    // filters and aggregates span both eras
    sql("INSERT INTO graft.widc.t VALUES (3, 3000000007)")
    assert(sql("SELECT sum(n) FROM graft.widc.t").head.getLong(0) ===
      3000000037L)
    assert(sql("SELECT count(*) FROM graft.widc.t WHERE n > 2147483647")
      .head.getLong(0) === 1)
    assert(sql("SELECT n FROM graft.widc.t WHERE id = 1")
      .head.getLong(0) === 10L)
    // time travel reads each version under ITS type
    assert(sql(s"SELECT * FROM graft.widc.t VERSION AS OF $v0")
      .schema("n").dataType === org.apache.spark.sql.types.IntegerType)
    // DML reads the mixed eras and rewrites under the wide type — no
    // compact() wall anywhere (the physical NAMES never changed)
    sql("UPDATE graft.widc.t SET n = 4000000009 WHERE id = 1")
    assert(sql("SELECT n FROM graft.widc.t WHERE id = 1")
      .head.getLong(0) === 4000000009L)
    sql("DELETE FROM graft.widc.t WHERE n = 20")
    assert(sql("SELECT count(*) FROM graft.widc.t").head.getLong(0) === 2)
    // narrowing refuses in Spark's own analyzer (ALTER COLUMN TYPE
    // only admits up-casts) — it never reaches the catalog
    intercept[Exception](
      sql("ALTER TABLE graft.widc.t ALTER COLUMN n TYPE INT"))
    // BIGINT→STRING is a Spark up-cast but NOT parquet-reader-native:
    // it passes analysis and OUR whitelist refuses it — metadata-only
    // widening never promises what the reader cannot deliver
    val e = intercept[Exception](
      sql("ALTER TABLE graft.widc.t ALTER COLUMN id TYPE STRING"))
    assert(e.getMessage.contains("widening"))
  }

  test("SQL ALTER COLUMN SET/DROP NOT NULL and COMMENT: metadata-only, the bit enforced on SQL and Scala writes alike") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.nnc")
    sql("CREATE TABLE graft.nnc.t (id BIGINT, s STRING)")
    sql("INSERT INTO graft.nnc.t VALUES (1, 'a'), (2, 'b')")
    val b = s"$wh/nnc/t"
    val v0 = Manifests.latestVersion(spark, b).get
    val files0 = Manifests.files(spark, b, v0)
    // Spark's analyzer hard-blocks the ALTER spelling of the tighten
    // for DSv2 tables — the proof-carrying SQL face is the procedure
    sql("CALL graft.system.set_not_null('nnc.t', 's')")
    assert(Manifests.files(spark, b, v0 + 1) === files0,
      "SET NOT NULL is metadata-only — same files carried by reference")
    assert(!spark.table("graft.nnc.t").schema("s").nullable)
    // enforced on the SQL write path...
    intercept[Throwable](
      sql("INSERT INTO graft.nnc.t VALUES (3, CAST(NULL AS STRING))"))
    assert(sql("SELECT count(*) FROM graft.nnc.t").head.getLong(0) === 2,
      "a refused INSERT must not have half-applied")
    // ...and on the Scala append path (same single-pass invariant agg)
    intercept[Throwable](Manifests.append(
      Seq((4L, null: String)).toDF("id", "s"), b))
    // DROP NOT NULL relaxes; the null lands; re-tightening refuses
    sql("ALTER TABLE graft.nnc.t ALTER COLUMN s DROP NOT NULL")
    sql("INSERT INTO graft.nnc.t VALUES (5, CAST(NULL AS STRING))")
    assert(sql("SELECT count(*) FROM graft.nnc.t WHERE s IS NULL")
      .head.getLong(0) === 1)
    intercept[Throwable](
      sql("CALL graft.system.set_not_null('nnc.t', 's')"))
    // COMMENT is pure metadata riding the recorded schema
    sql("ALTER TABLE graft.nnc.t ALTER COLUMN id COMMENT 'the key'")
    assert(spark.table("graft.nnc.t").schema("id")
      .getComment().contains("the key"))
    assert(Manifests.files(spark, b,
      Manifests.latestVersion(spark, b).get).toSet !== Set.empty)
  }

  test("DROP TABLE keeps the registration when the managed-data delete fails — no orphaned bytes") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftdel.impl", classOf[FailingDeleteFileSystem].getName)
    val w = "graftdel:" + java.nio.file.Files
      .createTempDirectory("graft_cat_faildrop").toString
    CatalogTestSupport.registerFreshCatalog(spark, w)
    try {
      sql("CREATE NAMESPACE IF NOT EXISTS graft.fd")
      sql("CREATE TABLE graft.fd.t AS SELECT 7L AS id")
      val dataDir = s"$w/fd/t"
      assert(Manifests.latestVersion(spark, dataDir).isDefined)
      // arm: deletes under the DATA dir silently return false (the
      // pointer under _defs stays deletable — that's the hazard)
      FailingDeleteFileSystem.failUnder.set(
        dataDir.stripPrefix("graftdel:"))
      val e = intercept[Exception](sql("DROP TABLE graft.fd.t"))
      assert(e.getMessage.contains("delete failed"),
        s"unexpected failure: ${e.getMessage}")
      // the registration survived: the data is still reachable by name
      assert(Dfs.exists(spark, s"$w/_defs/fd/t.tbl"),
        "a failed data delete must NOT remove the pointer file")
      assert(sql("SELECT id FROM graft.fd.t").head.getLong(0) === 7L)
      // disarm: the retried DROP completes and removes both halves
      FailingDeleteFileSystem.failUnder.set(null)
      sql("DROP TABLE graft.fd.t")
      assert(!Dfs.exists(spark, dataDir))
      assert(!Dfs.exists(spark, s"$w/_defs/fd/t.tbl"))
    } finally {
      FailingDeleteFileSystem.failUnder.set(null)
      // restore the suite's shared warehouse for any later catalog use
      CatalogTestSupport.registerFreshCatalog(spark, wh)
    }
  }

  private def chainMsg(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("DV-aware catalog reads: SELECT reads through vectors, DELETE stacks merge-on-read, UPDATE keeps the compact() contract") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.mor")
    sql("CREATE TABLE graft.mor.t (id BIGINT, k INT, s STRING)")
    (1 to 40).map(i => (i.toLong, i % 4, s"s$i")).toDF("id", "k", "s")
      .repartitionByRange(4, col("id")).createOrReplaceTempView("mor_src")
    sql("INSERT INTO graft.mor.t SELECT * FROM mor_src") // v0
    val base = s"$wh/mor/t"
    Manifests.deleteWhereMor(spark, base, col("k") === 0) // v1: vectors only
    assert(Manifests.dvFiles(spark, base, 1).nonEmpty)

    // SELECT on the vectored version: no compact() wall, vectors applied
    assert(sql("SELECT * FROM graft.mor.t").count() === 30)
    assert(sql("SELECT s FROM graft.mor.t WHERE k = 1").count() === 10)
    assert(sql("SELECT COUNT(*) AS n FROM graft.mor.t").head.getLong(0) === 30)
    // joins/aggregates compose over the DV-aware relation
    assert(sql("SELECT k, COUNT(*) AS n FROM graft.mor.t GROUP BY k ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      === Seq((1, 10), (2, 10), (3, 10)))

    // SQL DELETE against the still-vectored table routes MERGE-ON-READ:
    // data files untouched, a second vector stacks on the first
    val filesBefore = Manifests.files(spark, base, 1).map(Dfs.canonical).toSet
    sql("DELETE FROM graft.mor.t WHERE k = 1") // v2
    assert(Manifests.files(spark, base, 2).map(Dfs.canonical).toSet === filesBefore,
      "a MoR-tier DELETE must move no data bytes")
    assert(Manifests.dvFiles(spark, base, 2).size >
      Manifests.dvFiles(spark, base, 1).size)
    assert(sql("SELECT * FROM graft.mor.t").count() === 20)
    assert(sql("SELECT * FROM graft.mor.t WHERE k = 1").count() === 0)

    // time travel reads each vectored version through ITS OWN vectors
    assert(sql("SELECT * FROM graft.mor.t VERSION AS OF 1").count() === 30)
    assert(sql("SELECT * FROM graft.mor.t VERSION AS OF 0").count() === 40)

    // UPDATE on the vectored table is NATIVE merge-on-read (the
    // SupportsDelta operation — round 13): the CoW rewrite provably
    // does NOT fire — no data file is rewritten, the old image lands
    // as another stacked vector, the new image appends
    val v2Files = Manifests.files(spark, base, 2).map(Dfs.canonical).toSet
    val dvV2 = Manifests.dvFiles(spark, base, 2).size
    sql("UPDATE graft.mor.t SET s = 'x' WHERE id = 6") // v3, delta path
    val v3 = Manifests.latestVersion(spark, base).get
    assert(v2Files.subsetOf(
      Manifests.files(spark, base, v3).map(Dfs.canonical).toSet),
      "the CoW path must no longer fire on vectored tables — every " +
        "parent file carries by reference under the delta write")
    assert(Manifests.dvFiles(spark, base, v3).size > dvV2)
    assert(sql("SELECT s FROM graft.mor.t WHERE id = 6").head.getString(0) === "x")
    assert(sql("SELECT * FROM graft.mor.t").count() === 20)

    // compact() still materializes everything; a post-compact UPDATE
    // takes the plain CoW rewrite on the clean files
    Manifests.compact(spark, base, 4)
    assert(Manifests.dvFiles(spark, base,
      Manifests.latestVersion(spark, base).get).isEmpty)
    sql("UPDATE graft.mor.t SET s = 'y' WHERE id = 6")
    assert(sql("SELECT s FROM graft.mor.t WHERE id = 6").head.getString(0) === "y")
    assert(sql("SELECT * FROM graft.mor.t").count() === 20)
  }

  test("batch .changes face: version-range feed via read options; defaults snapshot-tag the latest; bad ranges refuse") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.cb")
    sql("CREATE TABLE graft.cb.t (id BIGINT, k INT)")
    sql("INSERT INTO graft.cb.t VALUES (1, 1), (2, 2)") // v0
    sql("INSERT INTO graft.cb.t VALUES (3, 3)")         // v1
    sql("UPDATE graft.cb.t SET k = 99 WHERE id = 1")    // v2 CoW
    def feed(opts: (String, String)*) = {
      val r = opts.foldLeft(spark.read) { case (b, (k, v)) => b.option(k, v) }
      r.table("graft.cb.t.changes")
    }
    // (0, 2]: v1's insert + the update's delete/insert image pair —
    // carried-identical rows in the rewritten file cancel in the diff
    val all = feed("startingVersion" -> "0", "endingVersion" -> "2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(all === Set((3L, 3, "insert"), (1L, 1, "delete"), (1L, 99, "insert")))
    // (1, 2]: just the update pair
    assert(feed("startingVersion" -> "1", "endingVersion" -> "2").count() === 2)
    // projection + filter compose above the feed scan
    assert(feed("startingVersion" -> "0", "endingVersion" -> "2")
      .filter(col("_change_type") === "insert").select("id").count() === 2)
    // defaults: the whole latest snapshot tagged insert
    val snap = feed()
    assert(snap.count() === 3)
    assert(snap.filter(col("_change_type") =!= "insert").count() === 0)
    // a range that starts past its end refuses loudly
    val e = intercept[Throwable](
      feed("startingVersion" -> "5", "endingVersion" -> "2").collect())
    assert(chainMsg(e).contains("past endingVersion"), chainMsg(e))
  }

  test("partition INSERT OVERWRITE: untouched partitions carry by reference, repeats replace, out-of-region rows refuse") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.ovw")
    (1 to 30).map(i => (i.toLong, s"P${i % 3}")).toDF("id", "c")
      .createOrReplaceTempView("ovw_src")
    sql("CREATE TABLE graft.ovw.t PARTITIONED BY (c) AS SELECT * FROM ovw_src") // v0
    val base = s"$wh/ovw/t"
    val v0Files = Manifests.files(spark, base, 0).map(Dfs.canonical).toSet

    sql("INSERT OVERWRITE graft.ovw.t PARTITION (c = 'P1') VALUES (100), (101)") // v1
    assert(Manifests.latestVersion(spark, base) === Some(1),
      "a partition overwrite is ONE atomic commit — drop + insert never publish separately")
    val v1Files = Manifests.files(spark, base, 1).map(Dfs.canonical).toSet
    val carried = v0Files.intersect(v1Files)
    val retired = v0Files.diff(v1Files)
    assert(carried.nonEmpty, "untouched partitions must carry by reference")
    // exactly the P1 partition's files retired: every retired file holds
    // only P1 rows, and no carried file holds any
    assert(retired.nonEmpty)
    assert(spark.read.parquet(retired.toSeq: _*)
      .filter(col("c") =!= "P1").count() === 0)
    assert(spark.read.parquet(carried.toSeq: _*)
      .filter(col("c") === "P1").count() === 0)
    val afterFirst = sql("SELECT id FROM graft.ovw.t WHERE c = 'P1'")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(afterFirst === Seq(100L, 101L))
    assert(sql("SELECT COUNT(*) AS n FROM graft.ovw.t WHERE c <> 'P1'")
      .head.getLong(0) === 20)

    // repeated overwrite of the same partition REPLACES the first
    sql("INSERT OVERWRITE graft.ovw.t PARTITION (c = 'P1') VALUES (200)") // v2
    assert(sql("SELECT id FROM graft.ovw.t WHERE c = 'P1'")
      .collect().map(_.getLong(0)).toSeq === Seq(200L))
    assert(sql("SELECT COUNT(*) AS n FROM graft.ovw.t").head.getLong(0) === 21)

    // whole-table overwrite still works beside the partition form
    sql("INSERT OVERWRITE graft.ovw.t VALUES (7, 'P9')")
    assert(sql("SELECT * FROM graft.ovw.t").count() === 1)

    // replaceWhere containment: rows outside the predicate refuse
    val t2 = s"$wh/ovw/t2"
    Manifests.commitDataPartitioned(
      (1 to 10).map(i => (i.toLong, s"P${i % 2}")).toDF("id", "c"),
      t2, Seq("c"))
    val e = intercept[Throwable](Manifests.overwriteWhere(
      Seq((99L, "P0"), (98L, "P7")).toDF("id", "c"), t2, col("c") === "P0"))
    assert(chainMsg(e).contains("outside the overwrite predicate"), chainMsg(e))
    assert(Manifests.latestVersion(spark, t2) === Some(0),
      "a refused overwrite burns no version")

    // containment holds on the BOOTSTRAP branch too: a scoped overwrite
    // of a created-but-never-written table refuses out-of-region rows
    // instead of silently landing them under a statement that claims to
    // touch one region (Delta refuses these)
    sql("CREATE TABLE graft.ovw.t3 (id BIGINT, c STRING) PARTITIONED BY (c)")
    val t3 = s"$wh/ovw/t3"
    val eb = intercept[Throwable](
      Seq((1L, "P0"), (2L, "P7")).toDF("id", "c")
        .writeTo("graft.ovw.t3").overwrite(col("c") === "P0"))
    assert(chainMsg(eb).contains("outside the declared PARTITION region"),
      chainMsg(eb))
    assert(Manifests.latestVersion(spark, t3).isEmpty,
      "a refused bootstrap overwrite must not commit a version")
    // the contained form bootstraps cleanly
    Seq((1L, "P0")).toDF("id", "c")
      .writeTo("graft.ovw.t3").overwrite(col("c") === "P0")
    assert(sql("SELECT * FROM graft.ovw.t3").count() === 1)
  }

  test("dynamic partitionOverwriteMode: INSERT OVERWRITE replaces exactly the partitions the data holds") {
    wh
    sql("CREATE NAMESPACE IF NOT EXISTS graft.dyn")
    (1 to 30).map(i => (i.toLong, s"D${i % 3}")).toDF("id", "c")
      .createOrReplaceTempView("dyn_src")
    sql("CREATE TABLE graft.dyn.t PARTITIONED BY (c) AS SELECT * FROM dyn_src") // v0
    val base = s"$wh/dyn/t"
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      sql("INSERT OVERWRITE graft.dyn.t VALUES (100, 'D1'), (101, 'D2')") // v1
      assert(Manifests.latestVersion(spark, base) === Some(1),
        "a dynamic overwrite is ONE atomic commit")
      assert(sql("SELECT COUNT(*) AS n FROM graft.dyn.t WHERE c = 'D0'")
        .head.getLong(0) === 10, "a partition the data does not hold is untouched")
      assert(sql("SELECT id FROM graft.dyn.t WHERE c = 'D1'")
        .collect().map(_.getLong(0)).toSeq === Seq(100L))
      assert(sql("SELECT id FROM graft.dyn.t WHERE c = 'D2'")
        .collect().map(_.getLong(0)).toSeq === Seq(101L))
      // the untouched partition's files carried by reference
      assert(Manifests.files(spark, base, 0).map(Dfs.canonical).toSet
        .intersect(Manifests.files(spark, base, 1).map(Dfs.canonical).toSet)
        .nonEmpty)
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
