package graft

import org.apache.spark.sql.functions._

/** Dev tool: the 100× storage-partitioned-join A/B — proof that
  * [[graft.sources.manifest.DvParquetScan]]'s `KeyGroupedPartitioning`
  * report removes BOTH shuffle exchanges from a co-partitioned
  * big ⋈ big join, and that the removal is wall-clock real at scale:
  *
  *  - a 100× fact (57M rows) and a per-invoice rollup (~2.8M rows,
  *    too big to broadcast), both catalog manifest tables PARTITIONED
  *    on `country` with the split-by-partition layout (one partition
  *    tuple per file — the purity proof SPJ keys on);
  *  - join ON (country, invoice_no): partition columns ⊆ join keys,
  *    Spark 4's SPJ shape;
  *  - A: `spark.sql.sources.v2.bucketing.enabled=false` → both sides
  *    shuffle (the stock plan);
  *  - B: `=true` (the session default) → ZERO Exchange under the
  *    join — the scan's reported key-grouping IS the distribution.
  *
  * `sbt "runMain graft.SpjBench <inDir> [factor=100]"` — one JSON
  * line LAST. */
object SpjBench {

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val spark = BenchHarness.session()
    val root = BenchHarness.workRoot(s"graft_spj_${factor}x")
    BenchHarness.manifestCatalog(spark, s"$root/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.sj")

    def t[A](body: => A): (A, Double) = BenchHarness.timed(body)

    val (rows, buildSec) = t {
      spark.conf.set("graft.write.splitByPartition", "true")
      val cleaned = etl.Warehouse(spark, inDir).cleaned
      val copies = spark.range(factor).select(col("id").as("_copy"))
      val fact = cleaned.crossJoin(copies)
        .withColumn("invoice_no",
          concat(col("invoice_no"), lit("#"), col("_copy")))
        .drop("_copy")
      graft.ext.Manifests.commitDataPartitioned(
        fact, s"$root/wh/sj/fact", Seq("country"))
      // the per-invoice rollup: one row per (country, invoice), far
      // beyond any broadcast threshold at 100×, co-partitioned with
      // the fact — the join shape SPJ exists for
      val inv = fact.groupBy("country", "invoice_no")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("quantity").cast("long")).as("inv_qty"))
      graft.ext.Manifests.commitDataPartitioned(
        inv, s"$root/wh/sj/inv", Seq("country"))
      spark.conf.unset("graft.write.splitByPartition")
      spark.table(s"graft.`$root/wh/sj/fact`").count()
    }

    val joinSql =
      // the MERGE hint only pins the JOIN STRATEGY (at small dev
      // factors the rollup would broadcast and the A/B would measure
      // nothing): removing the exchanges is the part no hint can do
      s"""SELECT /*+ MERGE(i) */ f.country, COUNT(*) AS n, SUM(i.inv_qty) AS q
        |FROM graft.`$root/wh/sj/fact` f JOIN graft.`$root/wh/sj/inv` i
        |  ON f.country = i.country AND f.invoice_no = i.invoice_no
        |GROUP BY f.country""".stripMargin

    def exchangesUnderJoin(): Int = {
      val p = spark.sql(joinSql).queryExecution.executedPlan.toString
      val join = Seq("SortMergeJoin", "ShuffledHashJoin")
        .map(p.indexOf).filter(_ >= 0).minOption.getOrElse(-1)
      require(join >= 0, s"no shuffle-strategy join in the plan:\n$p")
      p.substring(join).split("\n")
        .count(l => l.contains("Exchange hashpartitioning"))
    }

    def run(spj: Boolean): (Int, Double, Long) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
        spj.toString)
      // pushPartValues pads one-sided partitions so SPJ survives
      // asymmetric pruning — the deployment shape
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // the join keys are a SUPERSET of the partition keys
      // (country, invoice_no) ⊃ (country): Spark only groups by the
      // common prefix when the exact-match requirement is relaxed —
      // the documented SPJ setup for Iceberg's equivalent shape
      spark.conf.set(
        "spark.sql.requireAllClusterKeysForCoPartition", "false")
      val ex = exchangesUnderJoin()
      val (res, sec) = t(spark.sql(joinSql).collect())
      (ex, sec, res.map(_.getLong(1)).sum)
    }

    // cold pass each first (page cache favors whoever runs later, so
    // each strategy gets one cold and one warm pass; the honest A/B is
    // warm-vs-warm, where scan I/O stops hiding the exchange cost)
    val (exShuffle, secShuffle, nShuffle) = run(spj = false)
    val (exSpj, secSpj, nSpj) = run(spj = true)
    val (_, secShuffle2, _) = run(spj = false)
    val (_, secSpj2, _) = run(spj = true)
    require(nShuffle == nSpj, s"A/B results disagree: $nShuffle vs $nSpj")

    println(
      s"""{"metric":"spj_${factor}x","value":$secSpj2,"unit":"sec",""" +
        s""""rows":$rows,"build_sec":$buildSec,""" +
        s""""shuffle":{"exchanges":$exShuffle,"sec":$secShuffle,""" +
        s""""sec_warm":$secShuffle2},""" +
        s""""spj":{"exchanges":$exSpj,"sec":$secSpj,"sec_warm":$secSpj2},""" +
        s""""speedup_warm":${secShuffle2 / math.max(secSpj2, 1e-9)}}""")
    spark.stop()
  }
}
