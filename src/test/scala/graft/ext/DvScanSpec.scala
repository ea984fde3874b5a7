package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The columnar deletion-vector scan ([[graft.sources.manifest.DvParquetScan]]):
  * a vectored version reads through Spark's own vectorized parquet
  * path (pushdown, codegen, columnar batches) with the vectors applied
  * per file inside the reader — the r12 V1 detour retired — plus the
  * `_file`/`_pos` metadata-column face on every read path. */
class DvScanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_dvscan_wh").toString
    CatalogTestSupport.registerFreshCatalog(spark, d)
    d
  }

  private def sql(s: String) = spark.sql(s)

  private def executed(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan

  private def mkTable(ns: String, rows: Int = 500): String = {
    wh // force catalog registration before the first SQL statement
    sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    (1 to rows).map(i => (i.toLong, i % 7, s"v$i"))
      .toDF("id", "grp", "s").createOrReplaceTempView(s"${ns}_src")
    sql(s"CREATE TABLE graft.$ns.t AS SELECT * FROM ${ns}_src")
    s"$wh/$ns/t"
  }

  test("a vectored version reads COLUMNAR: BatchScan + whole-stage codegen, no V1 row detour; results read through the vectors") {
    val b2 = mkTable("dvscan2")
    sql("CALL graft.system.delete_mor('dvscan2.t', 'id % 10 = 3')")
    assert(Manifests.dvFiles(spark, b2,
      Manifests.latestVersion(spark, b2).get).nonEmpty,
      "fixture must actually be vectored")
    val df = sql("SELECT * FROM graft.dvscan2.t")
    assert(df.count() === 450)
    assert(df.filter(col("id") % 10 === 3).count() === 0,
      "deleted rows must not resurrect through the columnar scan")
    val plan = executed(df).toString
    assert(plan.contains("BatchScan"),
      s"vectored read must stay a DSv2 columnar scan, got:\n$plan")
    assert(!plan.contains("Scan ExistingRDD") && !plan.contains("RDDScan"),
      s"the V1 row detour must be retired for DV-only versions:\n$plan")
    assert(executed(df).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      s"whole-stage codegen must survive the DV wrapper:\n$plan")
    // filters still push into the scan (parquet row-group pruning is
    // intersection-safe under the DV filter)
    val filtered = sql("SELECT id FROM graft.dvscan2.t WHERE grp = 2")
    assert(filtered.count() ===
      (1 to 500).count(i => i % 7 == 2 && i % 10 != 3))
    // a second MoR delete STACKS and still reads columnar
    sql("CALL graft.system.delete_mor('dvscan2.t', 'grp = 5')")
    val df2 = sql("SELECT * FROM graft.dvscan2.t")
    assert(df2.count() === (1 to 500)
      .count(i => i % 10 != 3 && i % 7 != 5))
    assert(executed(df2).toString.contains("BatchScan"))
  }

  test("_file/_pos metadata columns: served on clean and vectored reads, absent from *, consistent with the manifest") {
    val base = mkTable("dvmeta")
    // clean table: _file spans exactly the manifest's files
    val meta = sql("SELECT _file, _pos, id FROM graft.dvmeta.t")
    assert(meta.columns.toSeq === Seq("_file", "_pos", "id"))
    val manifestFiles = Manifests.files(spark, base, 0)
      .map(Dfs.canonical).toSet
    val seen = meta.select("_file").distinct().collect()
      .map(r => Dfs.canonical(r.getString(0))).toSet
    assert(seen === manifestFiles,
      "_file must spell the manifest's data files")
    // (file, pos) is unique — it is the rowId
    assert(meta.select("_file", "_pos").distinct().count() === 500)
    // SELECT * never includes metadata columns
    assert(sql("SELECT * FROM graft.dvmeta.t").columns.toSeq ===
      Seq("id", "grp", "s"))
    // vectored: deleted positions disappear from the (file, pos) space
    val before = meta.select("_file", "_pos").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    sql("CALL graft.system.delete_mor('dvmeta.t', 'id % 2 = 0')")
    val after = sql("SELECT _file, _pos FROM graft.dvmeta.t").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after.size === 250)
    assert(after.subsetOf(before),
      "surviving rows keep their ORIGINAL physical positions")
    // and the positions match the sidecars' complement: re-deleting by
    // rowId through the DV machinery would find exactly these rows
    val lv = Manifests.latestVersion(spark, base).get
    val dvRows = spark.read.parquet(
        Manifests.dvFiles(spark, base, lv): _*)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dvRows.map { case (f, p) => (Dfs.canonical(f), p) } ===
      (before -- after).map { case (f, p) => (Dfs.canonical(f), p) },
      "sidecar (file,pos) rows must be exactly the deleted identities")
  }

  test("metadata COUNT(*) stays exact across vectoring; MIN/MAX refuse over vectors") {
    val base = mkTable("dvcnt")
    Manifests.analyze(spark, base, Seq("id")) // arm the stats tier
    // clean: COUNT(*) collapses to the metadata tier (LocalRelation —
    // no scan node at all)
    val clean = sql("SELECT COUNT(*) AS n FROM graft.dvcnt.t")
    assert(clean.head.getLong(0) === 500)
    assert(!executed(clean).toString.contains("BatchScan"),
      "clean-version COUNT(*) should be metadata-only")
    sql("CALL graft.system.delete_mor('dvcnt.t', 'id <= 100')")
    // r14: a vectored COUNT(*) STILL answers from metadata — sidecar
    // n_rows minus the scan's bitmap cardinalities (Delta's
    // numRecords − dvCardinality), exact because bitmaps dedup
    val counted = sql("SELECT COUNT(*) AS n FROM graft.dvcnt.t")
    assert(counted.head.getLong(0) === 400,
      "COUNT over a vectored version must see the deletes")
    assert(!executed(counted).toString.contains("BatchScan"),
      "vectored COUNT(*) should subtract bitmap cardinalities, not scan")
    // zone bounds may be held up by deleted rows: MIN/MAX must keep
    // the real scan on a vectored version
    val mn = sql("SELECT MIN(id) AS m FROM graft.dvcnt.t")
    assert(executed(mn).toString.contains("BatchScan"),
      "vectored MIN must SCAN (zone bounds may be deleted rows)")
    assert(mn.head.getLong(0) === 101)
  }

  test("bitmap budget blown → V1 anti-join fallback serves identical results including _file/_pos") {
    val base = mkTable("dvbudget")
    sql("CALL graft.system.delete_mor('dvbudget.t', 'id % 3 = 0')")
    val colRows = sql("SELECT _file, _pos, id FROM graft.dvbudget.t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    try {
      spark.conf.set("graft.dv.indexMaxBytes", "1")
      val v1 = sql("SELECT _file, _pos, id FROM graft.dvbudget.t")
      val v1Rows = v1.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(v1Rows.map(t => (Dfs.canonical(t._1), t._2, t._3)) ===
        colRows.map(t => (Dfs.canonical(t._1), t._2, t._3)),
        "the fallback path must produce the identical live set")
      assert(sql("SELECT * FROM graft.dvbudget.t").count() ===
        (1 to 500).count(_ % 3 != 0))
    } finally spark.conf.unset("graft.dv.indexMaxBytes")
  }

  test("the row-based reader path (vectorization off) applies the same vectors and metadata columns") {
    mkTable("dvrow")
    sql("CALL graft.system.delete_mor('dvrow.t', 'id > 400')")
    val expect = (1 to 400).map(_.toLong).toSet
    try {
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
      val df = sql("SELECT id, _pos FROM graft.dvrow.t")
      assert(df.collect().map(_.getLong(0)).toSet === expect)
      assert(df.select("_pos").distinct().count() > 0)
      assert(sql("SELECT COUNT(*) AS n FROM graft.dvrow.t")
        .head.getLong(0) === 400)
    } finally
      spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
  }

  test("empty projection over a vectored version: COUNT(*) via the scan stays exact") {
    mkTable("dvempty", rows = 50)
    sql("CALL graft.system.delete_mor('dvempty.t', 'id = 7')")
    // force the scan shape (group by constant defeats the rule's
    // global-aggregate pattern)
    assert(sql("SELECT COUNT(*) AS n FROM graft.dvempty.t GROUP BY 'x'")
      .head.getLong(0) === 49)
  }
}
