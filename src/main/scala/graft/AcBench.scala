package graft

import org.apache.spark.sql.functions._

/** Dev tool: the auto-compaction 10× record — what the policy buys a
  * table taking a steady drip of small appends (the streaming-epoch
  * shape [[graft.ext.Manifests]]'s write distribution cannot fix,
  * because each STATEMENT is already small):
  *
  *  - a 10× base table partitioned on `country`, then N small
  *    appends, all landing in ONE hot partition;
  *  - A: policy off → every append leaves its file; the read side
  *    pays per-file planning (listing, stats rows, parquet footers)
  *    forever;
  *  - B: `graft.autocompact.minFiles` armed → the hot partition
  *    bin-packs as scoped follow-on commits; cold partitions carry by
  *    reference the whole time.
  *
  * Reported: live file count and a filtered read (hot partition scan)
  * under both policies. `sbt "runMain graft.AcBench <inDir>
  * [factor=10] [appends=40]"` — one JSON line LAST. */
object AcBench {

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val appends = if (args.length > 2) args(2).toInt else 40
    val spark = BenchHarness.session()
    val root = BenchHarness.workRoot(s"graft_ac_${factor}x")
    import spark.implicits._

    def t[A](body: => A): (A, Double) = BenchHarness.timed(body)

    def build(base: String, policy: Boolean): (Int, Double, Double) = {
      spark.conf.set("graft.write.splitByPartition", "true")
      val cleaned = etl.Warehouse(spark, inDir).cleaned
      val copies = spark.range(factor).select(col("id").as("_copy"))
      graft.ext.Manifests.commitDataPartitioned(
        cleaned.crossJoin(copies).drop("_copy"), base, Seq("country"))
      spark.conf.unset("graft.write.splitByPartition")
      if (policy) {
        spark.conf.set("graft.autocompact.minFiles", "8")
        spark.conf.set("graft.autocompact.smallBytes",
          (64L << 20).toString)
      }
      val (_, appendSec) = t {
        (1 to appends).foreach { i =>
          graft.ext.Manifests.appendBatch(
            (1 to 2000).map(j =>
              (s"AC$i-$j", s"S$j", s"drip $i $j", 1 + j % 5,
                java.sql.Timestamp.valueOf(s"2011-06-15 10:00:00"),
                new java.math.BigDecimal("2.50"), s"c$j",
                "United Kingdom"))
              .toDF("invoice_no", "stock_code", "description",
                "quantity", "invoice_date", "unit_price", "customer_id",
                "country")
              .withColumn("invoice_date",
                col("invoice_date").cast("timestamp_ntz"))
              .withColumn("unit_price",
                col("unit_price").cast("decimal(10,2)")),
            base, i.toLong, "acbench")
        }
      }
      if (policy) {
        spark.conf.unset("graft.autocompact.minFiles")
        spark.conf.unset("graft.autocompact.smallBytes")
      }
      val v = graft.ext.Manifests.latestVersion(spark, base).get
      val files = graft.ext.Manifests.files(spark, base, v).size
      // the read the backlog taxes: scan the HOT partition (planning
      // lists/opens every live file the partition holds)
      val (_, readSec) = t {
        graft.ext.Manifests.readLatest(spark, base)
          .filter(col("country") === "United Kingdom")
          .agg(count(lit(1)), sum(col("quantity").cast("long")))
          .collect()
      }
      (files, appendSec, readSec)
    }

    val (fOff, appOff, readOff) = build(s"$root/off/t", policy = false)
    val (fOn, appOn, readOn) = build(s"$root/on/t", policy = true)

    println(
      s"""{"metric":"autocompact_${factor}x","value":$readOn,""" +
        s""""unit":"sec","appends":$appends,""" +
        s""""off":{"files":$fOff,"append_sec":$appOff,"read_sec":$readOff},""" +
        s""""on":{"files":$fOn,"append_sec":$appOn,"read_sec":$readOn},""" +
        s""""file_ratio":${fOff.toDouble / math.max(fOn, 1)}}""")
    spark.stop()
  }
}
