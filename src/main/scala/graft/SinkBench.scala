package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dev tool: the CONCURRENT-SINK CONTENTION record — N streaming
  * queries all writing `format("manifest")` into ONE table, each under
  * its own `appId`, appends racing through the OCC commute-and-retry
  * loop. The per-query appId isolation test proves two sinks COEXIST;
  * this measures N=4 at 10× scale: per-sink per-batch wall latency,
  * zero lost batches (every (sink, batch) row count lands exactly
  * once), dense version numbers (no burned or skipped versions), and
  * per-app ledger high-water marks at batches−1.
  *
  * `sbt "runMain graft.SinkBench <inDir> [factor=10] [sinks=4]
  * [batches=6]"` — one JSON line LAST. */
object SinkBench {

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val nSinks = if (args.length > 2) args(2).toInt else 4
    val nBatches = if (args.length > 3) args(3).toInt else 6
    val spark = BenchHarness.session()
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val root = BenchHarness.workRoot(s"graft_sinkbench_${factor}x")
    val base = s"$root/t"

    // ---- input slices: cleaned × factor split into sink×batch cells,
    // keyed so the final content check can attribute every row
    val cleaned = etl.Warehouse(spark, inDir).cleaned
    val copies = spark.range(factor).select(col("id").as("_copy"))
    val big = cleaned.crossJoin(copies)
      .withColumn("invoice_no",
        concat(col("invoice_no"), lit("#"), col("_copy")))
      .select(col("invoice_no"), col("quantity"),
        pmod(xxhash64(col("invoice_no")), lit(nSinks * nBatches))
          .as("_cell"))
      .persist()
    val totalRows = big.count()
    // one local Row batch per (sink, batch): MemoryStream feeds from
    // the driver, so materialize each cell once up front (setup, not
    // relay time)
    val cells = (0 until nSinks * nBatches).map { c =>
      big.filter(col("_cell") === c).drop("_cell")
        .collect().map(r => (r.getString(0), r.getInt(1)))
    }

    val streams = (0 until nSinks).map(_ =>
      MemoryStream[(String, Int)])
    val queries = (0 until nSinks).map { i =>
      streams(i).toDF().toDF("invoice_no", "quantity").writeStream
        .format("manifest").option("path", base)
        .option("appId", s"sink$i")
        .option("checkpointLocation", s"$root/ck$i")
        .outputMode("append").start()
    }

    // ---- drive all sinks concurrently, batch by batch
    val latencies = Array.fill(nSinks)(
      scala.collection.mutable.Buffer.empty[Double])
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      val threads = (0 until nSinks).map { i =>
        new Thread(() => {
          val tb = System.nanoTime()
          streams(i).addData(cells(b * nSinks + i).toIndexedSeq)
          queries(i).processAllAvailable()
          latencies(i) += (System.nanoTime() - tb) / 1e9
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
    }
    val relaySec = (System.nanoTime() - t0) / 1e9
    queries.foreach(_.stop())

    // ---- invariants
    val lv = ext.Manifests.latestVersion(spark, base).get
    val committed = (0 to lv).filter(v =>
      ext.Dfs.exists(spark, s"$base/v$v/_SUCCESS"))
    val dense = committed == (0 to lv)
    val landed = ext.Manifests.readLatest(spark, base).count()
    val ledger = ext.Manifests.txnsOf(spark, base, lv)
    val ledgerOk = (0 until nSinks).forall(i =>
      ledger.get(s"b:sink$i").contains((nBatches - 1).toLong))
    val ok = dense && landed == totalRows && ledgerOk
    if (!ok) sys.error(s"SINK CONTENTION FAILURE: dense=$dense " +
      s"landed=$landed/$totalRows ledger=$ledger")

    println(
      s"""{"metric":"concurrent_sinks_${factor}x","value":$relaySec,""" +
        s""""unit":"sec","sinks":$nSinks,"batches":$nBatches,""" +
        s""""rows":$totalRows,"versions":${lv + 1},"dense":$dense,""" +
        s""""lost_batches":0,"per_sink_batch_sec":{${
          (0 until nSinks).map(i =>
            s""""sink$i":[${latencies(i).map(s => f"$s%.2f")
              .mkString(",")}]""").mkString(",")}}}""")
    spark.stop()
  }
}
