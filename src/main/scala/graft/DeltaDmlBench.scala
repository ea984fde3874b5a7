package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the 100× record for NATIVE merge-on-read SQL DML — the
  * `SupportsDelta` path ([[graft.sources.manifest.ManifestDeltaOperation]]),
  * measured on the same spread-update shape as [[MorBench]]'s
  * procedural twin so the numbers compare directly:
  *
  *  - build the country-clustered 100× fact VIA THE CATALOG (CTAS),
  *  - vector it with a thin MoR delete (the table now LIVES vectored),
  *  - plain SQL UPDATE of ~1‰ of rows spread across every file,
  *  - plain SQL MERGE of a small keyed batch (updates + inserts),
  *  - a full read back through the stacked vectors (the columnar DV
  *    scan), timed against a pre-vector read of the same table.
  *
  * Reported per op: wall seconds, files added/retired, bytes written.
  * `sbt "runMain graft.DeltaDmlBench <inDir> [factor=100]"` — one JSON
  * line LAST. */
object DeltaDmlBench {

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val spark = BenchHarness.session()
    val root = BenchHarness.workRoot(s"graft_ddml_${factor}x")
    BenchHarness.manifestCatalog(spark, s"$root/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dd")
    val base = s"$root/wh/dd/fact"
    val tableName = "graft.dd.fact"

    def t[A](body: => A): (A, Double) = BenchHarness.timed(body)
    def refs(): Set[String] = {
      val v = ext.Manifests.latestVersion(spark, base).get
      (ext.Manifests.files(spark, base, v) ++
        ext.Manifests.dvFiles(spark, base, v))
        .map(ext.Dfs.canonical).toSet
    }
    def fileLen(f: String): Long =
      try ext.Dfs.fs(spark, f)
        .getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
      catch { case scala.util.control.NonFatal(_) => 0L }
    case class Op(label: String, sec: Double, imgAdded: Int,
        dvAdded: Int, retired: Int, bytesWritten: Long, maxFile: Long) {
      def json: String =
        s""""$label":{"sec":$sec,"files_added":${imgAdded + dvAdded},""" +
          s""""img_files":$imgAdded,"dv_files":$dvAdded,""" +
          s""""files_retired":$retired,"bytes_written":$bytesWritten,""" +
          s""""max_file_bytes":$maxFile}"""
    }
    def measure(label: String)(body: => Any): Op = {
      val before = refs()
      val (_, sec) = t(body)
      val after = refs()
      val added = after -- before
      val (dvA, imgA) = added.partition(_.contains("/dv_"))
      val perFile = added.toSeq.map(fileLen)
      Op(label, sec, imgA.size, dvA.size, (before -- after).size,
        perFile.sum, if (perFile.isEmpty) 0L else perFile.max)
    }

    // ---- the 100× fact via the catalog ------------------------------
    val (rows, buildSec) = t {
      val cleaned = etl.Warehouse(spark, inDir).cleaned
      val copies = spark.range(factor).select(col("id").as("_copy"))
      cleaned.crossJoin(copies)
        .withColumn("invoice_no",
          concat(col("invoice_no"), lit("#"), col("_copy")))
        .drop("_copy")
        .repartitionByRange(64, col("country"))
        .createOrReplaceTempView("ddml_src")
      spark.sql(s"CREATE TABLE $tableName AS SELECT * FROM ddml_src")
      spark.table(tableName).count()
    }

    // pre-vector read baseline: the plain columnar catalog scan
    val (cleanCount, readCleanSec) = t(spark.sql(
      s"SELECT COUNT(*), SUM(quantity) FROM $tableName " +
        "WHERE quantity >= 0").head.getLong(0))

    // vector the table: a thin MoR delete (the CALL face — the ENTRY
    // into the vectored state, as in production)
    val vecOp = measure("delete_mor_thin")(spark.sql(
      s"CALL graft.system.delete_mor('dd.fact', 'quantity = 17')"))

    // ---- native SQL UPDATE, ~1‰ spread across every file ------------
    // FIRST and on the same predicate as prior rounds, so the
    // cross-round comparison of sql_update_spread measures the same op
    // on the same table state
    val upd = measure("sql_update_spread")(spark.sql(
      s"UPDATE $tableName SET quantity = quantity + 1 " +
        "WHERE pmod(xxhash64(invoice_no, stock_code), 1000) = 7"))

    // ---- native SQL MERGE: small keyed batch, updates + inserts -----
    // still the r13 position (directly after the spread UPDATE), so
    // the 3-op headline measures the same ops on the same table state
    // round over round; the A/B and hot-key extras run strictly AFTER
    spark.table(tableName).limit(50000)
      .withColumn("quantity", col("quantity") + 100)
      .unionByName(spark.table(tableName).limit(10000)
        .withColumn("invoice_no", concat(col("invoice_no"), lit("@new"))))
      .dropDuplicates("invoice_no", "stock_code")
      .createOrReplaceTempView("ddml_batch")
    val mrg = measure("sql_merge_batch")(spark.sql(
      s"""MERGE INTO $tableName t USING ddml_batch u
         |ON t.invoice_no = u.invoice_no AND t.stock_code = u.stock_code
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))

    // ---- A/B on the write-side distribution contract ----------------
    // the same-shaped spread UPDATE with the rebalance OFF writes one
    // image + one DV sidecar per TASK; with it ON (sql_update_spread
    // above), inserts cluster to one AQE-sized bucket and deletes
    // cluster per vectored file — the fragmentation the contract
    // exists to prevent, measured
    val updOff = measure("sql_update_spread_nodist") {
      spark.conf.set("graft.write.distribution", "none")
      try spark.sql(
        s"UPDATE $tableName SET quantity = quantity + 1 " +
          "WHERE pmod(xxhash64(invoice_no, stock_code), 1000) = 8")
      finally spark.conf.unset("graft.write.distribution")
    }

    // ---- hot-key MERGE: 90% of the source hits ONE target file ------
    // the shape where per-task delta writers degenerate under source
    // skew; the non-strict clustered rebalance lets AQE split the hot
    // file's bucket instead of funneling it through one writer
    val vNow = ext.Manifests.latestVersion(spark, base).get
    val hotFile = ext.Manifests.files(spark, base, vNow).maxBy(fileLen)
    val hot = spark.read.parquet(hotFile)
      .select("invoice_no", "stock_code").limit(90000)
    val cold = spark.table(tableName)
      .select("invoice_no", "stock_code").limit(10000)
    spark.table(tableName)
      .join(hot.unionByName(cold).dropDuplicates("invoice_no", "stock_code"),
        Seq("invoice_no", "stock_code"), "left_semi")
      // the staging lineage carries duplicate (invoice_no, stock_code)
      // keys — one source row per key or MERGE refuses by cardinality
      .dropDuplicates("invoice_no", "stock_code")
      .withColumn("quantity", col("quantity") + 7)
      .createOrReplaceTempView("ddml_hot_batch")
    val hotMrg = measure("sql_merge_hotkey")(spark.sql(
      s"""MERGE INTO $tableName t USING ddml_hot_batch u
         |ON t.invoice_no = u.invoice_no AND t.stock_code = u.stock_code
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))

    // ---- read back through the stacked vectors (columnar DV scan) ---
    val (vecCount, readVecSec) = t(spark.sql(
      s"SELECT COUNT(*), SUM(quantity) FROM $tableName " +
        "WHERE quantity >= 0").head.getLong(0))

    // "value" stays the sum of the THREE r13 ops — the cross-round
    // comparable number; the A/B and hot-key ops report per-op only
    val ops = Seq(vecOp, upd, mrg, updOff, hotMrg)
    println(
      s"""{"metric":"native_mor_dml_${factor}x","value":${
        Seq(vecOp, upd, mrg).map(_.sec).sum},"unit":"sec","rows":$rows,""" +
        s""""build_sec":$buildSec,"read_clean_sec":$readCleanSec,""" +
        s""""read_vectored_sec":$readVecSec,""" +
        s""""read_ratio":${readVecSec / math.max(readCleanSec, 1e-9)},""" +
        s""""ops":{${ops.map(_.json).mkString(",")}}}""")
    val _ = (cleanCount, vecCount)
    spark.stop()
  }
}
