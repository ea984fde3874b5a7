package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the DECADE CHECK on the SQL DML surface — build manifest
  * tables at 100× the bench fixture THROUGH THE CATALOG, then run the
  * row-level triad as pure `spark.sql` statements and report wall
  * seconds plus the file accounting that proves each op paid its
  * designed price:
  *
  *  - `DELETE` on a partition column → manifest arithmetic (files
  *    retire whole, zero new files);
  *  - `UPDATE` under a partition predicate → group rewrite pruned to
  *    the partition's files, everything else carried by reference;
  *  - `MERGE` of a small source into a clustered, ANALYZEd dim →
  *    runtime group filtering narrows the rewrite to the files the
  *    matching keys live in.
  *
  * `sbt "runMain graft.DmlBench <inDir> [factor=100]"` — one JSON line. */
object DmlBench {

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val spark = BenchHarness.session()
    val root = BenchHarness.workRoot(s"graft_dml_${factor}x")
    BenchHarness.manifestCatalog(spark, s"$root/_cat")

    def t[A](body: => A): (A, Double) = BenchHarness.timed(body)
    def files(base: String): Set[String] = {
      val v = ext.Manifests.latestVersion(spark, base).get
      ext.Manifests.files(spark, base, v).map(ext.Dfs.canonical).toSet
    }

    // ---- fact-shaped table: cleaned staging × factor, one country per
    // append (partition-pure files — the production layout for a table
    // partitioned by country), quantity zones via ANALYZE --------------
    val (factRows, buildFactSec) = t {
      val cleaned = etl.Warehouse(spark, inDir).cleaned
      val copies = spark.range(factor).select(col("id").as("_copy"))
      val big = cleaned.crossJoin(copies)
        .withColumn("invoice_no",
          concat(col("invoice_no"), lit("#"), col("_copy")))
        .drop("_copy")
      big.persist()
      val n = big.count()
      val base = s"$root/fact"
      val countries = big.select("country").distinct().collect()
        .map(r => Option(r.getString(0))).toSeq.sortBy(_.getOrElse(""))
      def slice(c: Option[String]) =
        c.fold(big.filter(col("country").isNull))(v =>
          big.filter(col("country") === v))
      ext.Manifests.commitDataPartitioned(slice(countries.head), base,
        Seq("country"), filesPerWrite = 8)
      countries.tail.zipWithIndex.foreach { case (c, i) =>
        ext.Manifests.appendBatch(slice(c), base, i.toLong)
      }
      ext.Manifests.analyze(spark, base, Seq("quantity"))
      big.unpersist()
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.dml")
      spark.sql(
        s"CREATE TABLE graft.dml.fact (${big.schema.toDDL}) LOCATION '$base'")
      n
    }
    val factBase = s"$root/fact"

    // metadata-only COUNT on the way (the profiling query at 100×)
    val (cnt, countSec) = t(spark.sql(
      "SELECT COUNT(*) AS n FROM graft.dml.fact").head.getLong(0))

    // ---- DELETE on the partition column: manifest arithmetic ---------
    val before1 = files(factBase)
    val (_, delSec) = t(spark.sql(
      "DELETE FROM graft.dml.fact WHERE country = 'NATION_3'"))
    val after1 = files(factBase)
    val delNew = (after1 -- before1).size
    val delDropped = (before1 -- after1).size

    // ---- UPDATE under a partition predicate: pruned group rewrite ----
    val before2 = after1
    val (_, updSec) = t(spark.sql(
      "UPDATE graft.dml.fact SET quantity = quantity + 1000 " +
        "WHERE country = 'NATION_5'"))
    val after2 = files(factBase)
    val updCarried = before2.intersect(after2).size
    val updRewritten = (before2 -- after2).size

    // ---- dim-shaped table for MERGE: customers × factor, id-clustered,
    // ANALYZEd so runtime group filtering can prune -------------------
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
      spark.sql(
        s"CREATE TABLE graft.dml.dim (customer_key BIGINT, " +
          s"customer_id STRING, country STRING) LOCATION '$base'")
      spark.table("graft.dml.dim").count()
    }
    val dimBase = s"$root/dim"

    // small upsert: 500 relocations + 100 brand-new customers, as one
    // inline SQL source (a temp view over the TARGET would store a
    // V2TableReference Spark 4.1 cannot re-plan inside a MERGE rewrite)
    val before3 = files(dimBase)
    val (_, mrgSec) = t(spark.sql(
      """MERGE INTO graft.dml.dim t USING (
        |  SELECT customer_key, customer_id, 'RELOCATED' AS country
        |  FROM (SELECT * FROM graft.dml.dim ORDER BY customer_id LIMIT 500)
        |  UNION ALL
        |  SELECT id + 900000000 AS customer_key,
        |         concat('NEWCUST_', id) AS customer_id,
        |         'FRESH' AS country
        |  FROM range(100)
        |) u
        |ON t.customer_id = u.customer_id
        |WHEN MATCHED THEN UPDATE SET t.country = u.country
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    val after3 = files(dimBase)
    val mrgCarried = before3.intersect(after3).size
    val mrgRewritten = (before3 -- after3).size

    // correctness spot-checks (cheap aggregates)
    val postCnt = spark.sql("SELECT COUNT(*) AS n FROM graft.dml.fact")
      .head.getLong(0)
    val relocated = spark.sql(
      "SELECT COUNT(*) AS n FROM graft.dml.dim WHERE country = 'RELOCATED'")
      .head.getLong(0)
    val fresh = spark.sql(
      "SELECT COUNT(*) AS n FROM graft.dml.dim WHERE country = 'FRESH'")
      .head.getLong(0)

    println(
      s"""{"metric":"sql_dml_100x","factor":$factor,""" +
        s""""fact_rows":$factRows,"dim_rows":$dimRows,""" +
        s""""build_fact_sec":$buildFactSec,"build_dim_sec":$buildDimSec,""" +
        s""""fast_count_sec":$countSec,"fast_count":$cnt,""" +
        s""""delete":{"sec":$delSec,"files_dropped":$delDropped,"files_written":$delNew},""" +
        s""""update":{"sec":$updSec,"files_rewritten":$updRewritten,"files_carried":$updCarried},""" +
        s""""merge":{"sec":$mrgSec,"files_rewritten":$mrgRewritten,"files_carried":$mrgCarried},""" +
        s""""post_count":$postCnt,"relocated":$relocated,"fresh":$fresh,""" +
        s""""in":"$inDir"}""")
    spark.stop()
  }
}
