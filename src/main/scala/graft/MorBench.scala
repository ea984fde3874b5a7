package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the DECADE CHECK on the merge-on-read DML tier — the same
  * 100× tables as [[DmlBench]], each row-level op run BOTH ways from
  * the SAME snapshot (merge-on-read first, then a metadata-only
  * `restore` back, then the copy-on-write twin), so the comparison is
  * content-identical:
  *
  *  - UPDATE of a thin slice inside one country: CoW rewrites every
  *    affected FILE, MoR writes only the matched rows + a vector;
  *  - MERGE of a small upsert into the clustered dim: CoW rewrites the
  *    matched keys' files, MoR appends the batch + vectors.
  *
  * Reported per op: wall seconds, files written/dropped/carried, and
  * BYTES WRITTEN under the table root — the number that scales (a MoR
  * op's write is ∝ changed rows, a CoW op's ∝ affected files).
  *
  * `sbt "runMain graft.MorBench <inDir> [factor=100]"` — one JSON line. */
object MorBench {

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val spark = BenchHarness.session()
    val root = BenchHarness.workRoot(s"graft_mor_${factor}x")

    def t[A](body: => A): (A, Double) = BenchHarness.timed(body)
    def refs(base: String): Set[String] = {
      val v = ext.Manifests.latestVersion(spark, base).get
      (ext.Manifests.files(spark, base, v) ++
        ext.Manifests.dvFiles(spark, base, v))
        .map(ext.Dfs.canonical).toSet
    }
    def bytes(paths: Set[String]): Long =
      paths.toSeq.map { f =>
        try ext.Dfs.fs(spark, f)
          .getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen
        catch { case scala.util.control.NonFatal(_) => 0L }
      }.sum
    def measure(base: String)(body: => Any): (Double, Int, Int, Long) = {
      val before = refs(base)
      val (_, sec) = t(body)
      val after = refs(base)
      (sec, (after -- before).size, (before -- after).size,
        bytes(after -- before))
    }

    // ---- fact: cleaned staging × factor, country-clustered ----------
    val (factRows, buildFactSec) = t {
      val cleaned = etl.Warehouse(spark, inDir).cleaned
      val copies = spark.range(factor).select(col("id").as("_copy"))
      val big = cleaned.crossJoin(copies)
        .withColumn("invoice_no",
          concat(col("invoice_no"), lit("#"), col("_copy")))
        .drop("_copy")
      val base = s"$root/fact"
      ext.Manifests.commitData(
        big.repartitionByRange(64, col("country")), base)
      ext.Manifests.analyze(spark, base, Seq("quantity"))
      ext.Manifests.readLatest(spark, base).count()
    }
    val factBase = s"$root/fact"
    val factV = ext.Manifests.latestVersion(spark, factBase).get

    // a thin slice of one country: the files holding NATION_2 are the
    // CoW rewrite set; the matched rows are ~1/40th of them
    val pred = col("country") === "NATION_2" && col("quantity") === 13
    val set = Map("quantity" -> (col("quantity") + lit(1000)))

    val (morUpdSec, morUpdNew, morUpdDrop, morUpdBytes) =
      measure(factBase)(ext.Manifests.updateWhereMor(
        spark, factBase, pred, set))
    val morUpdated = ext.Manifests.readLatest(spark, factBase)
      .filter(col("country") === "NATION_2" && col("quantity") === 1013)
      .count()
    ext.Manifests.restore(spark, factBase, factV) // metadata-only reset
    val (cowUpdSec, cowUpdNew, cowUpdDrop, cowUpdBytes) =
      measure(factBase)(ext.Manifests.updateWhere(
        spark, factBase, pred, set))
    val cowUpdated = ext.Manifests.readLatest(spark, factBase)
      .filter(col("country") === "NATION_2" && col("quantity") === 1013)
      .count()

    // ---- the spread case: a THIN slice of every file (quantity=13
    // lives everywhere) — CoW must rewrite each affected file whole,
    // MoR writes only the matched rows + vectors -----------------------
    ext.Manifests.restore(spark, factBase, factV)
    val spread = col("quantity") === 13
    val (morSprSec, morSprNew, morSprDrop, morSprBytes) =
      measure(factBase)(ext.Manifests.updateWhereMor(
        spark, factBase, spread, set))
    val morSprRows = ext.Manifests.readLatest(spark, factBase)
      .filter(col("quantity") === 1013).count()
    ext.Manifests.restore(spark, factBase, factV)
    val (cowSprSec, cowSprNew, cowSprDrop, cowSprBytes) =
      measure(factBase)(ext.Manifests.updateWhere(
        spark, factBase, spread, set))
    val cowSprRows = ext.Manifests.readLatest(spark, factBase)
      .filter(col("quantity") === 1013).count()

    // ---- dim: customers × factor, id-clustered ----------------------
    val (dimRows, buildDimSec) = t {
      val dim = etl.Warehouse(spark, inDir).dimCustomer
      val copies = spark.range(factor).select(col("id").as("_copy"))
      val bigDim = dim.crossJoin(copies)
        .select(
          (col("customer_key") + col("_copy") * 10000000L).as("customer_key"),
          concat(col("customer_id"), lit("#"), col("_copy")).as("customer_id"),
          col("country"))
      val base = s"$root/dim"
      ext.Manifests.commitData(
        bigDim.repartitionByRange(32, col("customer_id")), base)
      ext.Manifests.analyze(spark, base, Seq("customer_id"))
      ext.Manifests.readLatest(spark, base).count()
    }
    val dimBase = s"$root/dim"
    val dimV = ext.Manifests.latestVersion(spark, dimBase).get
    def upsert() = {
      val d = ext.Manifests.readAt(spark, dimBase, dimV)
      d.orderBy("customer_id").limit(500)
        .withColumn("country", lit("RELOCATED"))
        .unionByName(spark.range(100).select(
          (col("id") + 900000000L).as("customer_key"),
          concat(lit("NEWCUST_"), col("id")).as("customer_id"),
          lit("FRESH").as("country")))
    }

    val (morMrgSec, morMrgNew, morMrgDrop, morMrgBytes) =
      measure(dimBase)(ext.Manifests.mergeMor(
        spark, dimBase, upsert(), Seq("customer_id")))
    val morRelocated = ext.Manifests.readLatest(spark, dimBase)
      .filter(col("country") === "RELOCATED").count()
    ext.Manifests.restore(spark, dimBase, dimV)
    val (cowMrgSec, cowMrgNew, cowMrgDrop, cowMrgBytes) =
      measure(dimBase)(ext.Manifests.merge(
        spark, dimBase, upsert(), Seq("customer_id")))
    val cowRelocated = ext.Manifests.readLatest(spark, dimBase)
      .filter(col("country") === "RELOCATED").count()

    println(
      s"""{"metric":"mor_dml_${factor}x","factor":$factor,""" +
        s""""fact_rows":$factRows,"dim_rows":$dimRows,""" +
        s""""build_fact_sec":$buildFactSec,"build_dim_sec":$buildDimSec,""" +
        s""""update_mor":{"sec":$morUpdSec,"files_written":$morUpdNew,"files_dropped":$morUpdDrop,"bytes_written":$morUpdBytes,"rows":$morUpdated},""" +
        s""""update_cow":{"sec":$cowUpdSec,"files_written":$cowUpdNew,"files_dropped":$cowUpdDrop,"bytes_written":$cowUpdBytes,"rows":$cowUpdated},""" +
        s""""spread_update_mor":{"sec":$morSprSec,"files_written":$morSprNew,"files_dropped":$morSprDrop,"bytes_written":$morSprBytes,"rows":$morSprRows},""" +
        s""""spread_update_cow":{"sec":$cowSprSec,"files_written":$cowSprNew,"files_dropped":$cowSprDrop,"bytes_written":$cowSprBytes,"rows":$cowSprRows},""" +
        s""""merge_mor":{"sec":$morMrgSec,"files_written":$morMrgNew,"files_dropped":$morMrgDrop,"bytes_written":$morMrgBytes,"relocated":$morRelocated},""" +
        s""""merge_cow":{"sec":$cowMrgSec,"files_written":$cowMrgNew,"files_dropped":$cowMrgDrop,"bytes_written":$cowMrgBytes,"relocated":$cowRelocated},""" +
        s""""in":"$inDir"}""")
    spark.stop()
  }
}
