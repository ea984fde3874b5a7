package graft

import graft.etl.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Medallion-relay benchmark for the manifest streaming layer — the
  * scale evidence the specs cannot give: bronze (a manifest table fed
  * by appends) → silver (a streaming transform relayed through
  * [[graft.sources.manifest.DefaultSource]] under admission control,
  * exactly-once via [[graft.streaming.Streams.manifestSink]]) → gold
  * (the monthly-revenue MV maintained per micro-batch by
  * [[graft.streaming.Streams.maintainMonthlyMv]]).
  *
  * Two phases, both timed per trigger from the engine's own progress
  * events:
  *  - LIVE: bronze versions land one at a time with both downstream
  *    hops draining between appends — per-version relay latency;
  *  - CATCH-UP: the silver query is stopped, half the bronze versions
  *    land offline, and the restarted query (same checkpoint) drains
  *    the backlog under `maxVersionsPerTrigger=1` — per-batch latency
  *    stays one version's worth of work, never one unbounded batch.
  *
  * `sbt "runMain graft.StreamBench"` with `SPARK_GRAFT_SF_DIR` /
  * `SPARK_GRAFT_CPUS`; `SPARK_GRAFT_BRONZE_VERSIONS` (default 8) sets
  * the bronze version count. Prints ONE JSON line with per-batch
  * latencies, totals, and a correctness bit: the relayed gold MV must
  * equal a from-scratch batch recompute — fast but wrong fails loudly. */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nVersions =
      math.max(4, sys.env.getOrElse("SPARK_GRAFT_BRONZE_VERSIONS", "8").toInt)
    val spark = BenchHarness.session(defaultCpus = "4")

    val root = ext.Dfs.scratchDir(spark, "graft_streambench")
    val bronze = s"$root/bronze"
    val silver = s"$root/silver"
    val gold = s"$root/gold"

    // ---- chunked source: one hash slice of the cleaned lineage per
    // bronze version (setup cost reported separately, not relay time)
    val t0 = System.nanoTime()
    val cleaned = Warehouse(spark, sfDir).cleaned
      .withColumn("__chunk", pmod(xxhash64(col("invoice_no")), lit(nVersions)))
      .persist()
    val bronzeRows = cleaned.count()
    def chunk(i: Int): DataFrame =
      cleaned.filter(col("__chunk") === i).drop("__chunk")
    ext.Manifests.commitData(chunk(0), bronze) // v0: the pre-stream table
    val setupSec = (System.nanoTime() - t0) / 1e9

    // per-trigger latencies from the engine's progress events, keyed by
    // query id (stable across restarts from one checkpoint)
    val progress = new java.util.concurrent.ConcurrentHashMap[
      java.util.UUID, java.util.List[Long]]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          if (e.progress.numInputRows > 0) {
            progress.computeIfAbsent(e.progress.id,
              _ => java.util.Collections.synchronizedList(
                new java.util.ArrayList[Long]()))
              .add(e.progress.durationMs.getOrDefault("triggerExecution",
                java.lang.Long.valueOf(-1L)).longValue()): Unit
          }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })

    def startSilver() = streaming.Streams.manifestSink(
      spark.readStream.format("manifest")
        .option("path", bronze)
        .option("maxVersionsPerTrigger", "1")
        .load()
        .withColumn("total_amount", col("quantity") * col("unit_price")),
      silver, s"$root/ckpt_silver")

    // ---- LIVE phase: silver snapshots v0, gold snapshots silver's
    // first version; then each bronze append relays through both hops
    val tLive = System.nanoTime()
    var silverQ = startSilver()
    silverQ.processAllAvailable()
    val goldQ = streaming.Streams.maintainMonthlyMv(
      spark.readStream.format("manifest")
        .option("path", silver)
        .option("maxVersionsPerTrigger", "1")
        .load(),
      gold, s"$root/ckpt_gold")
    goldQ.processAllAvailable()
    val liveUpper = nVersions / 2
    (1 until liveUpper).foreach { i =>
      ext.Manifests.appendBatch(chunk(i), bronze, batchId = i.toLong)
      silverQ.processAllAvailable()
      goldQ.processAllAvailable()
    }
    val liveSec = (System.nanoTime() - tLive) / 1e9

    // ---- CATCH-UP phase: silver down, backlog lands offline, restart
    // drains it one version per trigger from the same checkpoint
    silverQ.stop()
    (liveUpper until nVersions).foreach(i =>
      ext.Manifests.appendBatch(chunk(i), bronze, batchId = i.toLong))
    val tCatch = System.nanoTime()
    silverQ = startSilver()
    silverQ.processAllAvailable()
    goldQ.processAllAvailable()
    val catchupSec = (System.nanoTime() - tCatch) / 1e9
    val silverId = silverQ.id
    val goldId = goldQ.id
    silverQ.stop()
    goldQ.stop()

    // ---- correctness: relayed gold MV == from-scratch batch recompute
    val mvVersions = ext.Dfs.list(spark, gold)
      .map(_.getPath.getName).filter(_.startsWith("v")).map(_.drop(1).toInt)
    val mv = spark.read.parquet(s"$gold/v${mvVersions.max}")
    val viaRelay = mv.agg(
      sum(col("rev")).cast("decimal(20,2)").as("r"),
      sum(col("n_sales")).cast("long").as("n")).head()
    val direct = cleaned.drop("__chunk")
      .withColumn("total_amount", col("quantity") * col("unit_price"))
      .groupBy(year(col("invoice_date")), month(col("invoice_date")))
      .agg(sum(col("total_amount")).as("rev"), count(lit(1)).as("n_sales"))
      .agg(sum(col("rev")).cast("decimal(20,2)").as("r"),
        sum(col("n_sales")).cast("long").as("n")).head()
    val goldMatches = viaRelay == direct
    val silverRows = ext.Manifests.readLatest(spark, silver).count()
    cleaned.unpersist()

    def ms(id: java.util.UUID): Seq[Long] = {
      import scala.jdk.CollectionConverters._
      Option(progress.get(id)).map(_.asScala.toSeq).getOrElse(Seq.empty)
    }
    def arr(xs: Seq[Long]) = xs.mkString("[", ",", "]")
    println(s"""{"metric":"stream_relay","unit":"sec","sf":"$sfDir",""" +
      s""""bronze_rows":$bronzeRows,"bronze_versions":$nVersions,""" +
      s""""setup_sec":$setupSec,"live_sec":$liveSec,""" +
      s""""catchup_sec":$catchupSec,""" +
      s""""silver_rows":$silverRows,""" +
      s""""silver_batches_ms":${arr(ms(silverId))},""" +
      s""""gold_batches_ms":${arr(ms(goldId))},""" +
      s""""gold_matches_batch":$goldMatches}""")
    spark.stop()
    if (!goldMatches) sys.exit(1)
  }
}
