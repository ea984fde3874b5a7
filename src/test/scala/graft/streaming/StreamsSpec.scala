package graft.streaming

import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2026-01-01 $hhmm:00")

  test("streaming hourlyRollup matches the batch aggregation (complete mode)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "event_type", "value")
    val q = Streams.hourlyRollup(df).writeStream
      .format("memory").queryName("rollup_out").outputMode("complete").start()
    try {
      input.addData(
        (ts("10:05"), "click", 1.50), (ts("10:35"), "click", 2.25),
        (ts("10:45"), "view", 4.00), (ts("11:10"), "click", 8.00))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM rollup_out ORDER BY hour, event_type").collect()
      assert(rows.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq ===
        Seq(
          (ts("10:00"), "click", 2L, 3.75),
          (ts("10:00"), "view", 1L, 4.00),
          (ts("11:00"), "click", 1L, 8.00)))
    } finally q.stop()
  }

  test("streaming sessionize closes a session when the gap is exceeded") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.sessionize(input.toDS()).writeStream
      .format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      input.addData(
        Streams.Event(1L, ts("10:00"), 1.0),
        Streams.Event(1L, ts("10:10"), 2.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sessions_out").count() === 0, "session still open")
      // an event past the 30-min gap closes the first session inline
      input.addData(Streams.Event(1L, ts("12:00"), 5.0))
      q.processAllAvailable()
      val closed = spark.sql("SELECT * FROM sessions_out").collect()
      assert(closed.length === 1)
      val s = closed.head
      assert(s.getLong(0) === 1L)
      assert(s.getTimestamp(1) === ts("10:00") && s.getTimestamp(2) === ts("10:10"))
      assert(s.getLong(3) === 2L && s.getDouble(4) === 3.0)
    } finally q.stop()
  }

  test("file sink + checkpoint: restart resumes without duplicating output") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")
    val input = MemoryStream[(Timestamp, String, Double)]
    def start() = Streams.hourlyRollup(input.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // append mode only emits finalized windows: watermark must pass hour+2h
    val q1 = start()
    try {
      input.addData((ts("10:05"), "click", 1.0), (ts("10:10"), "click", 2.0))
      input.addData((ts("13:30"), "view", 1.0)) // watermark -> 11:30, closes 10:00
      q1.processAllAvailable()
    } finally q1.stop()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst >= 1, "10:00 window flushed to the file sink")
    // restart from the checkpoint; old batches must not re-emit
    val q2 = start()
    try {
      input.addData((ts("16:30"), "view", 1.0)) // closes the 13:00 window
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(rows.length === rows.distinct.length, "no duplicated windows after restart")
    assert(rows.count(_._1 == ts("10:00")) === 1)
    assert(rows.exists(_._1 == ts("13:00")), "13:00 window emitted after restart")
  }

  test("streaming dedup drops repeats within the watermark horizon, readmits after it") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = Streams.dedupWithinWatermark(input.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(
        (ts("10:00"), "alpha"), (ts("10:05"), "alpha"), // duplicate in-batch
        (ts("10:10"), "beta"))
      q.processAllAvailable()
      input.addData((ts("10:20"), "alpha")) // still inside the 1h horizon
      q.processAllAvailable()
      val early = spark.sql("SELECT text FROM dedup_out").collect().map(_.getString(0))
      assert(early.sorted.toSeq === Seq("alpha", "beta"), "one alpha, one beta within horizon")
      // advance the watermark far past alpha's digest state, then repeat it:
      // the key was evicted, so the record is readmitted
      input.addData((ts("14:00"), "gamma"))
      q.processAllAvailable()
      input.addData((ts("14:05"), "alpha"))
      q.processAllAvailable()
      val late = spark.sql("SELECT text FROM dedup_out").collect().map(_.getString(0))
      assert(late.count(_ == "alpha") === 2, "evicted key readmits after the horizon")
    } finally q.stop()
  }

  test("streaming corpus append == sequential batch admitAndCommit on the same batches") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    // persisted digest index over a 3-doc corpus (the batch twin's state)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_stream_idx").toString
    Seq("alpha body", "beta body", "gamma body").toDF("text")
      .select(md5(col("text")).as("digest"))
      .write.mode("overwrite").parquet(indexDir)
    // two arrival batches: corpus dupes, a cross-batch stream dupe, and
    // genuinely new docs. (In-batch dupes excluded only because the KEEP
    // CHOICE differs — the batch twin keeps the smallest doc_id, the
    // stream keeps the first arrival per state-store partition — while
    // both admit exactly one doc per digest.)
    val batch1 = Seq((10L, "alpha body"), (11L, "delta body"), (12L, "epsilon body"))
    val batch2 = Seq((20L, "delta body"), (21L, "zeta body"), (22L, "beta body"))

    // batch oracle: sequential admitAndCommit against a twin index copy
    val batchIdxDir = java.nio.file.Files.createTempDirectory("graft_batch_idx").toString
    spark.read.parquet(indexDir).write.mode("overwrite").parquet(batchIdxDir)
    val admittedBatch =
      graft.operators.Corpus.admitAndCommit(spark, batchIdxDir,
          batch1.toDF("doc_id", "text")).collect().map(_.getLong(0)) ++
        graft.operators.Corpus.admitAndCommit(spark, batchIdxDir,
          batch2.toDF("doc_id", "text")).collect().map(_.getLong(0))

    val input = MemoryStream[(Timestamp, Long, String)]
    val q = Streams.appendStream(
        input.toDF().toDF("ts", "doc_id", "text"), indexDir)
      .writeStream.format("memory").queryName("append_out").outputMode("append").start()
    try {
      input.addData(batch1.map { case (id, t) => (ts("10:00"), id, t) })
      q.processAllAvailable()
      input.addData(batch2.map { case (id, t) => (ts("10:30"), id, t) })
      q.processAllAvailable()
      val admittedStream = spark.sql("SELECT doc_id FROM append_out").collect()
        .map(_.getLong(0))
      // identical admitted rows: corpus dupes (alpha, beta) and the
      // cross-batch stream dupe (20's delta) rejected on both sides
      assert(admittedStream.sorted.toSeq === admittedBatch.sorted.toSeq,
        s"stream admitted ${admittedStream.toSeq}, batch admitted ${admittedBatch.toSeq}")
      assert(admittedStream.toSet === Set(11L, 12L, 21L))
    } finally q.stop()
  }

  test("streaming near-dup flagging against the persisted band index (bounded state)") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    def body(tag: String) = (0 until 60).map(j => s"$tag$j").mkString(" ")
    // band/signature index over a 2-doc corpus (the batch twin's state)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_stream_band_idx").toString
    val corpus = Seq((1L, body("a")), (2L, body("b"))).toDF("doc_id", "text")
    graft.operators.Dedup.minhashSignatures(corpus)
      .write.mode("overwrite").parquet(s"$indexDir/sigs")

    val input = MemoryStream[(Timestamp, Long, String)]
    val q = Streams.nearDupStream(input.toDF().toDF("ts", "doc_id", "text"), indexDir)
      .writeStream.format("memory").queryName("neardup_out").outputMode("append").start()
    try {
      // batch 1: a near-dup of corpus doc 1 + a genuinely new doc
      input.addData((ts("10:00"), 10L, body("a") + " tail"), (ts("10:05"), 11L, body("x")))
      q.processAllAvailable()
      // batch 2: a near-dup of corpus doc 2
      input.addData((ts("10:30"), 20L, body("b") + " tail"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, matched_id, n_match FROM neardup_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(rows.map(r => (r._1, r._2)).toSet === Set((10L, 1L), (20L, 2L)),
        s"flagged pairs: ${rows.toSeq}")
      // each pair exactly once despite matching through several bands
      assert(rows.length === rows.distinct.length && rows.length === 2)
      assert(rows.forall(_._3 >= 16), "verified by signature agreement")
    } finally q.stop()
  }

  test("appendStream restart: killed mid-stream, resumes from checkpoint, digests admitted once") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val indexDir = java.nio.file.Files.createTempDirectory("graft_restart_idx").toString
    Seq("alpha body").toDF("text")
      .select(md5(col("text")).as("digest"))
      .write.mode("overwrite").parquet(indexDir)
    val base = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val (out, ckpt) = (s"$base/out", s"$base/ckpt")
    val input = MemoryStream[(Timestamp, Long, String)]
    def start() = Streams.appendStream(input.toDF().toDF("ts", "doc_id", "text"), indexDir)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // phase 1: a corpus dupe (rejected) and a new doc (admitted), then KILL
    val q1 = start()
    try {
      input.addData((ts("10:00"), 10L, "alpha body"), (ts("10:05"), 11L, "delta body"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(out).select("doc_id")
      .collect().map(_.getLong(0)).toSet === Set(11L), "phase 1 admits only the new doc")

    // phase 2: resume from the checkpoint. The dedup state must have
    // survived the kill: a stream-dupe of phase 1's admitted doc is
    // rejected, a genuinely new doc is admitted, and nothing re-emits.
    val q2 = start()
    try {
      input.addData((ts("10:30"), 20L, "delta body"), (ts("10:35"), 21L, "zeta body"))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("digest")))
    assert(rows.map(_._1).toSet === Set(11L, 21L),
      s"exactly the two new docs admitted across the restart: ${rows.toSeq}")
    assert(rows.map(_._2).distinct.length === rows.length,
      "each digest admitted exactly once across the restart")
  }

  // ------------------------------------------------------------------
  // Batch equivalence on the REAL fixture: the streaming twins must
  // produce exactly what the batch operators compute over the same
  // events (sf0.001: 1,000 events, 15 users, 30 days). This is the
  // streaming counterpart of the DuckDB oracle — the batch operator IS
  // the oracle.
  // ------------------------------------------------------------------

  private val fixtureSf = "/root/testdata/sf0.001"

  test("streaming hourlyRollup == batch hourlyRollup on the sf0.001 events fixture") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val fixture = graft.Tables.events(spark, fixtureSf)
      .select("ts", "event_type", "value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = Streams.hourlyRollup(input.toDF().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("rollup_fixture").outputMode("complete").start()
    try {
      // one batch -> nothing is late, so the watermark drops nothing and
      // complete-mode state equals the batch aggregation
      input.addData(fixture.toSeq)
      q.processAllAvailable()
      val streaming = spark.sql("SELECT * FROM rollup_fixture").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = graft.operators.Events.hourlyRollup(spark, fixtureSf).collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(batch.nonEmpty && streaming === batch)
    } finally q.stop()
  }

  test("streaming sessionize == batch sessionize on the sf0.001 events fixture") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val fixture = graft.Tables.events(spark, fixtureSf)
      .select("user_id", "ts", "value")
      .collect().map(r => Streams.Event(r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
    val input = MemoryStream[Streams.Event]
    val q = Streams.sessionize(input.toDS()).writeStream
      .format("memory").queryName("sessions_fixture").outputMode("append").start()
    try {
      input.addData(fixture.toSeq)
      q.processAllAvailable()
      // two sentinel batches from a fake user: the first advances the
      // watermark past every real session's timeout, the second triggers
      // the timeout flush of all still-open sessions
      input.addData(Streams.Event(-1L, ts2("2024-03-01 00:00"), 0.0))
      q.processAllAvailable()
      input.addData(Streams.Event(-1L, ts2("2024-03-02 00:00"), 0.0))
      q.processAllAvailable()
      // totals: streaming accumulates doubles incrementally, batch sums
      // DECIMAL(12,2) — compare at the cent, where both are exact
      def cents(v: Double): Long = math.rint(v * 100).toLong
      val streaming = spark.sql("SELECT * FROM sessions_fixture WHERE user_id >= 0").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), cents(r.getDouble(4)))).toSet
      val batch = graft.operators.Events.sessionize(spark, fixtureSf)
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), cents(r.getDouble(4)))).toSet
      assert(batch.nonEmpty && streaming === batch,
        s"streaming-only: ${(streaming -- batch).take(3)}; batch-only: ${(batch -- streaming).take(3)}")
    } finally q.stop()
  }

  private def ts2(s: String): Timestamp = Timestamp.valueOf(s + ":00")

  test("streaming sessionize times out idle users via the watermark") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Streams.Event]
    val q = Streams.sessionize(input.toDS()).writeStream
      .format("memory").queryName("sessions_timeout").outputMode("append").start()
    try {
      input.addData(Streams.Event(7L, ts("09:00"), 1.0))
      q.processAllAvailable()
      // another user's much-later events advance the watermark past user
      // 7's timeout; the timed-out session flushes on the following batch
      input.addData(Streams.Event(8L, ts("13:00"), 1.0))
      q.processAllAvailable()
      input.addData(Streams.Event(8L, ts("13:01"), 1.0))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM sessions_timeout WHERE user_id = 7").collect()
      assert(out.length === 1)
      assert(out.head.getLong(3) === 1L)
    } finally q.stop()
  }

  test("streaming MV maintenance == full recompute; version commits are idempotent") {
    val sf = TestSpark.sf
    val batches = graft.etl.Mv.writeBatches(spark, sf)
    val batchesRoot = new java.io.File(batches.head).getParent
    val mvBase = java.nio.file.Files.createTempDirectory("graft_mv_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_mv_ckpt").toString
    val schema = spark.read.parquet(batches.head).schema
    val facts = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(batchesRoot)
    val q = Streams.maintainMonthlyMv(facts, mvBase, ckpt)
    try q.processAllAvailable() finally q.stop()
    val versions = new java.io.File(mvBase).listFiles().map(_.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toInt).sorted
    assert(versions.nonEmpty && versions.head === 0)
    def readMv(v: Int) = spark.read.parquet(s"$mvBase/v$v")
      .select(col("year"), col("month"), col("n_sales"),
        col("rev").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .cast("double").as("revenue"))
      .orderBy("year", "month").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val last = versions.last
    val streamed = readMv(last)
    val full = graft.etl.Quality.monthlySales(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq === full.toSeq,
      s"streamed MV (v$last of ${versions.length} versions) != full recompute")
    // at-least-once replay safety, synthetic chain: committing the same
    // (batch, batchId) twice must leave the version byte-identical —
    // this is what makes foreachBatch replay a no-op after a crash
    val mv2 = java.nio.file.Files.createTempDirectory("graft_mv_replay").toString
    val b0 = spark.read.parquet(batches(0))
    val b1 = spark.read.parquet(batches(1))
    Streams.commitMvVersion(b0, mv2, 0)
    Streams.commitMvVersion(b1, mv2, 1)
    def snap() = spark.read.parquet(s"$mv2/v1")
      .orderBy("year", "month").collect().map(_.toSeq).toSeq
    val once = snap()
    Streams.commitMvVersion(b1, mv2, 1) // crash-replay of batch 1
    assert(snap() === once, "replayed commit diverged")
    // a broken chain (missing predecessor) fails loudly instead of
    // silently resetting the rollup to one batch's totals
    val ex = intercept[RuntimeException] {
      Streams.commitMvVersion(b1, mv2, 7)
    }
    assert(ex.getMessage.contains("chain broken"))
  }

  test("stream-stream interval join == batch inequality join on the same events") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    // clicks at :05 :30 :50 / 11:10; purchases open 2h windows at 10:00, 10:40
    val clicks = Seq((1L, ts("10:05")), (1L, ts("10:30")), (2L, ts("10:50")),
      (1L, ts("11:00")), (1L, ts("13:10")), (3L, ts("10:20")))
    val purchases = Seq((1L, ts("10:00")), (2L, ts("10:40")), (1L, ts("10:40")))
    val cIn = MemoryStream[(Long, Timestamp)]
    val pIn = MemoryStream[(Long, Timestamp)]
    val joined = Streams.clickAttribution(
      cIn.toDF().toDF("user_id", "ts"), pIn.toDF().toDF("user_id", "ts"))
    val q = joined.writeStream.format("memory")
      .queryName("attr_out").outputMode("append").start()
    try {
      cIn.addData(clicks); pIn.addData(purchases)
      q.processAllAvailable()
      // append-mode stream-stream inner joins emit once the WATERMARK
      // closes the match window; push both watermarks far past the data
      cIn.addData((9L, ts("23:00"))); pIn.addData((9L, ts("23:00")))
      q.processAllAvailable()
      val streamed = spark.sql(
          "SELECT user_id, click_ts, purchase_ts FROM attr_out WHERE user_id <> 9")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).sorted
      val batch = clicks.toDF("user_id", "click_ts")
        .join(purchases.toDF("p_user", "purchase_ts"),
          expr("user_id = p_user AND click_ts >= purchase_ts " +
            "AND click_ts < purchase_ts + INTERVAL 2 HOURS"))
        .select("user_id", "click_ts", "purchase_ts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).sorted
      assert(batch.nonEmpty && batch.length >= 4, s"fixture must drive matches: ${batch.length}")
      assert(streamed.toSeq === batch.toSeq,
        "stream-stream join must equal the batch inequality join")
    } finally q.stop()
  }

  test("streaming funnel == batch funnelStages on the sf0.001 events fixture") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    // per-user event-time order (the user-keyed Kafka contract the
    // operator documents); one batch, so the in-batch sort covers it
    val fixture = graft.Tables.events(spark, fixtureSf)
      .select("user_id", "event_type", "ts")
      .collect().map(r => Streams.StageEvent(r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val input = MemoryStream[Streams.StageEvent]
    val q = Streams.funnelStream(input.toDS()).writeStream
      .format("memory").queryName("funnel_fixture").outputMode("append").start()
    try {
      input.addData(fixture.toSeq)
      q.processAllAvailable()
      // sentinels: advance the watermark past every user's idle horizon,
      // then trigger the timeout flush (the sessionize fixture pattern)
      input.addData(Streams.StageEvent(-1L, "view", ts2("2027-01-01 00:00")))
      q.processAllAvailable()
      input.addData(Streams.StageEvent(-1L, "view", ts2("2027-01-02 00:00")))
      q.processAllAvailable()
      val streaming = spark.sql("SELECT * FROM funnel_fixture WHERE user_id >= 0").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getTimestamp(3), r.getInt(4))).toSet
      val batch = graft.operators.Events.funnelStages(spark, fixtureSf).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getTimestamp(3), r.getInt(4))).toSet
      assert(batch.nonEmpty && streaming === batch,
        s"streaming-only: ${(streaming -- batch).take(3)}; batch-only: ${(batch -- streaming).take(3)}")
    } finally q.stop()
  }

  test("streaming funnel: idle timeout seals the verdict; later stages start no new funnel") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[Streams.StageEvent]
    val q = Streams.funnelStream(input.toDS(), idleDays = 1).writeStream
      .format("memory").queryName("funnel_timeout").outputMode("append").start()
    try {
      input.addData(
        Streams.StageEvent(1L, "view", ts("09:00")),
        Streams.StageEvent(1L, "click", ts("09:05")))
      q.processAllAvailable()
      // user 2's much-later activity pushes the watermark past user 1's
      // idle horizon; the next batch flushes the sealed funnel
      input.addData(Streams.StageEvent(2L, "view", ts2("2026-01-05 00:00")))
      q.processAllAvailable()
      input.addData(Streams.StageEvent(2L, "view", ts2("2026-01-06 00:00")))
      q.processAllAvailable()
      val out = spark.sql("SELECT * FROM funnel_timeout WHERE user_id = 1").collect()
      assert(out.length === 1)
      assert(out.head.getTimestamp(2) === ts("09:05") && out.head.isNullAt(3)
        && out.head.getInt(4) === 0, "click reached, no purchase, not converted")
      // a purchase arriving after the flush must NOT resurrect the chain:
      // purchase without a view/click in state is ignored
      input.addData(Streams.StageEvent(1L, "purchase", ts2("2026-01-06 01:00")))
      q.processAllAvailable()
      input.addData(Streams.StageEvent(2L, "view", ts2("2026-01-09 00:00")))
      q.processAllAvailable()
      input.addData(Streams.StageEvent(2L, "view", ts2("2026-01-10 00:00")))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM funnel_timeout WHERE user_id = 1").count() === 1)
    } finally q.stop()
  }

  test("streaming cohort hits aggregate to the batch retention triangle") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val fixture = graft.Tables.events(spark, fixtureSf)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
      .collect().map(r => Streams.WeekHit(r.getLong(0), r.getDate(1)))
    val input = MemoryStream[Streams.WeekHit]
    val q = Streams.cohortHits(input.toDS()).writeStream
      .format("memory").queryName("cohort_fixture").outputMode("append").start()
    try {
      input.addData(fixture.toSeq)
      q.processAllAvailable()
      // hits are exactly-once per (user, offset): the triangle is a plain
      // COUNT over them — no distinct needed
      val streaming = spark.sql(
        """SELECT cohort_week, offset_weeks, CAST(COUNT(user_id) AS BIGINT) AS n_users
          |FROM cohort_fixture GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
        .map(r => (r.getDate(0), r.getInt(1), r.getLong(2)))
      val batch = graft.operators.Events.cohortRetention(spark, fixtureSf).collect()
        .map(r => (r.getDate(0), r.getInt(1), r.getLong(2)))
      assert(batch.nonEmpty && streaming.toSeq === batch.toSeq)
      // exactly-once: replaying a week for an existing user adds no hit
      val before = spark.sql("SELECT COUNT(*) FROM cohort_fixture").collect().head.getLong(0)
      input.addData(fixture.head)
      q.processAllAvailable()
      val after = spark.sql("SELECT COUNT(*) FROM cohort_fixture").collect().head.getLong(0)
      assert(after === before, "replayed week must not re-emit a hit")
    } finally q.stop()
  }

  test("manifestSink: each batch is one atomic version; restart from checkpoint never duplicates") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_mansink").toString
    val (base, ckpt) = (s"$root/table", s"$root/ckpt")
    val input = MemoryStream[(Long, String)]
    def start() = Streams.manifestSink(
      input.toDF().toDF("id", "s"), base, ckpt)
    val q1 = start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
      input.addData((3L, "c"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(graft.ext.Manifests.latestVersion(spark, base) === Some(1),
      "two non-empty batches -> two versions")
    assert(graft.ext.Manifests.readLatest(spark, base).count() === 3)
    // time travel across batch boundaries
    assert(graft.ext.Manifests.readAt(spark, base, 0).count() === 2)
    // restart from the checkpoint: committed batches must not re-append
    val q2 = start()
    try {
      input.addData((4L, "d"))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = graft.ext.Manifests.readLatest(spark, base)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(rows.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
      "restart appends only the new batch, exactly once")
  }

  test("appendBatch: replay no-ops; a crashed pre-commit attempt is overwritten, not duplicated") {
    val spark0 = spark
    import spark0.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_manappend").toString + "/t"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    assert(graft.ext.Manifests.appendBatch(b0, base, 0L) === Some(0))
    // at-least-once replay of a COMMITTED batch: manifest already
    // references data_batch_0 -> no write, no version
    assert(graft.ext.Manifests.appendBatch(b0, base, 0L) === None)
    assert(graft.ext.Manifests.latestVersion(spark, base) === Some(0))
    // crash window: batch 1's data landed but the commit never did —
    // the replay overwrites the orphan directory and commits once
    Seq((9L, "stale")).toDF("id", "s")
      .write.mode("overwrite").parquet(s"$base/data_batch_1")
    val b1 = Seq((3L, "c")).toDF("id", "s")
    assert(graft.ext.Manifests.appendBatch(b1, base, 1L) === Some(1))
    val rows = graft.ext.Manifests.readLatest(spark, base)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(rows.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "stale crashed attempt must not leak into the table")
    // empty batch: skipped, no version burned
    assert(graft.ext.Manifests.appendBatch(b1.limit(0), base, 2L) === None)
    assert(graft.ext.Manifests.latestVersion(spark, base) === Some(1))
  }

  test("cdcSink: streamed upserts merge one atomic version per batch; restart replays nothing") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cdcsink").toString
    val (base, ckpt) = (s"$root/table", s"$root/ckpt")
    val input = MemoryStream[(Long, String)]
    def start() = Streams.cdcSink(
      input.toDF().toDF("id", "s"), base, Seq("id"), ckpt)
    val q1 = start()
    try {
      input.addData((1L, "a"), (2L, "b")) // bootstrap batch
      q1.processAllAvailable()
      input.addData((2L, "b2"), (3L, "c")) // update + insert
      q1.processAllAvailable()
    } finally q1.stop()
    assert(graft.ext.Manifests.readLatest(spark, base)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ===
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // the pre-update image is one version back
    assert(graft.ext.Manifests.readAt(spark, base, 0)
      .filter(col("s") === "b").count() === 1)
    val versionsBefore = graft.ext.Manifests.latestVersion(spark, base)
    // restart from the checkpoint: committed batches must not re-merge
    val q2 = start()
    try {
      input.addData((1L, "a9")) // fresh update for key 1
      q2.processAllAvailable()
    } finally q2.stop()
    assert(graft.ext.Manifests.readLatest(spark, base)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ===
      Seq((1L, "a9"), (2L, "b2"), (3L, "c")))
    assert(graft.ext.Manifests.latestVersion(spark, base) ===
      versionsBefore.map(_ + 1), "exactly one new version after restart")
  }

  test("manifest source: snapshot then appends, restart resumes from checkpointed version") {
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mansrc").toString
    val (base, ckpt) = (s"$root/table", s"$root/ckpt")
    graft.ext.Manifests.commitData(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), base)
    val got = scala.collection.mutable.ListBuffer.empty[(Long, String)]
    def start() = spark.readStream.format("graft.sources.manifest")
      .option("path", base).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.collect().map(r => (r.getLong(0), r.getString(1)))
        }: Unit
      }
      .start()
    val q1 = start()
    try {
      q1.processAllAvailable() // batch 0: full snapshot
      assert(got.sorted.toSeq === Seq((1L, "a"), (2L, "b")))
      graft.ext.Manifests.appendBatch(
        Seq((3L, "c")).toDF("id", "s"), base, 0L)
      q1.processAllAvailable() // batch 1: only the appended file
      assert(got.sorted.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q1.stop()
    // offline appends, then restart from the checkpoint: no re-emission
    graft.ext.Manifests.appendBatch(Seq((4L, "d")).toDF("id", "s"), base, 1L)
    got.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(got.sorted.toSeq === Seq((4L, "d")),
        "restart must emit only versions after the checkpointed offset")
    } finally q2.stop()
  }

  test("manifest source: a partition evolve mid-stream serves as an empty step — every append exactly once, checkpoint survives") {
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_mansrc_evo").toString
    val (base, ckpt) = (s"$root/table", s"$root/ckpt")
    graft.ext.Manifests.commitDataPartitioned(
      (1 to 40).map(i => (i.toLong, java.sql.Timestamp.valueOf(
        f"2011-${1 + i % 2}%02d-05 10:00:00"), s"r$i"))
        .toDF("id", "ts", "s"),
      base, Seq("months(ts)"))
    val got = scala.collection.mutable.ListBuffer.empty[Long]
    def start() = spark.readStream.format("graft.sources.manifest")
      .option("path", base).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= b.collect().map(_.getLong(0)) }: Unit
      }
      .start()
    val q1 = start()
    try {
      q1.processAllAvailable() // snapshot
      assert(got.sorted.toSeq === (1L to 40L))
      graft.ext.Manifests.appendBatch(
        Seq((41L, java.sql.Timestamp.valueOf("2011-03-05 10:00:00"), "a"))
          .toDF("id", "ts", "s"), base, 0L)
      q1.processAllAvailable()
      assert(got.sorted.toSeq === (1L to 41L))
      // EVOLVE mid-stream: delta-empty metadata commit — the stream
      // must advance past it with an empty step, not fail, not
      // re-emit any file
      graft.ext.Manifests.evolvePartitions(spark, base, Seq("days(ts)"))
      q1.processAllAvailable()
      assert(got.sorted.toSeq === (1L to 41L),
        "an evolve commit must serve empty — no duplicates, no loss")
      // appends AFTER the evolve (tuples derive under the new spec)
      // still arrive exactly once
      graft.ext.Manifests.appendBatch(
        Seq((42L, java.sql.Timestamp.valueOf("2011-03-06 10:00:00"), "b"))
          .toDF("id", "ts", "s"), base, 1L)
      q1.processAllAvailable()
      assert(got.sorted.toSeq === (1L to 42L))
    } finally q1.stop()
    // offline: another evolve AND an append; the restarted stream must
    // deliver only the append
    graft.ext.Manifests.evolvePartitions(spark, base, Seq("months(ts)"))
    graft.ext.Manifests.appendBatch(
      Seq((43L, java.sql.Timestamp.valueOf("2011-04-01 00:00:00"), "c"))
        .toDF("id", "ts", "s"), base, 2L)
    got.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(got.sorted.toSeq === Seq(43L),
        "restart across an evolve must emit only the new append")
    } finally q2.stop()
  }

  test("manifest source: startingTimestamp resumes from where the table stood at T") {
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mansrc_sts").toString
    val (base, ckpt) = (s"$root/table", s"$root/ckpt")
    graft.ext.Manifests.commitData(Seq((0L, "v0")).toDF("id", "s"), base)
    graft.ext.Manifests.appendBatch(Seq((1L, "v1")).toDF("id", "s"), base, 1L)
    // T = after v1 landed; v2/v3 are the future the stream must deliver
    val t = graft.ext.Dfs.mtime(spark, s"$base/v1/_SUCCESS")
    Thread.sleep(1100) // local-fs mtimes are second-granular
    graft.ext.Manifests.appendBatch(Seq((2L, "v2")).toDF("id", "s"), base, 2L)
    graft.ext.Manifests.appendBatch(Seq((3L, "v3")).toDF("id", "s"), base, 3L)
    val got = scala.collection.mutable.ListBuffer.empty[Long]
    val q = spark.readStream.format("graft.sources.manifest")
      .option("path", base)
      .option("startingTimestamp", t.toString)
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= b.collect().map(_.getLong(0)) }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(got.sorted.toSeq === Seq(2L, 3L),
        s"changes AFTER the table's state at T stream; got $got")
    } finally q.stop()
    // both starting options together refuse (the source factory runs on
    // the stream thread, so the refusal surfaces as the query's error)
    val bad = spark.readStream.format("graft.sources.manifest")
      .option("path", base)
      .option("startingVersion", "0")
      .option("startingTimestamp", t.toString)
      .load()
      .writeStream.option("checkpointLocation", s"$root/ckpt_bad")
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      bad.processAllAvailable()
      bad.awaitTermination(30000): Unit
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .take(5).exists(_.getMessage.contains("mutually exclusive")))
    bad.stop()
  }

  test("manifest source: maxVersionsPerTrigger drains a backlog in bounded batches") {
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mansrc_rate").toString
    val (base, ckpt) = (s"$root/table", s"$root/ckpt")
    graft.ext.Manifests.commitData(Seq((0L, "v0")).toDF("id", "s"), base)
    (1 to 3).foreach(i => graft.ext.Manifests.appendBatch(
      Seq((i.toLong, s"v$i")).toDF("id", "s"), base, i.toLong))
    // backlog of 4 versions; starting from v0 with a 1-version cap the
    // catch-up must arrive as 3 single-version batches, never one big one
    val batches = scala.collection.mutable.ListBuffer.empty[Seq[Long]]
    val q = spark.readStream.format("graft.sources.manifest")
      .option("path", base)
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = b.collect().map(_.getLong(0)).toSeq.sorted
        if (ids.nonEmpty) batches.synchronized { batches += ids }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(batches.toSeq === Seq(Seq(1L), Seq(2L), Seq(3L)),
        s"each trigger must admit exactly one version: $batches")
    } finally q.stop()
  }

  test("manifest source: maxBytesPerTrigger admits mixed-size versions in bounded-byte batches; oversized versions progress alone") {
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mansrc_bytes").toString
    val (base, ckpt) = (s"$root/table", s"$root/ckpt")
    graft.ext.Manifests.commitData(Seq((0L, "v0")).toDF("id", "s"), base)
    // backlog: two tiny versions, one version ~3 orders bigger, one tiny
    graft.ext.Manifests.appendBatch(Seq((1L, "v1")).toDF("id", "s"), base, 1L)
    graft.ext.Manifests.appendBatch(Seq((2L, "v2")).toDF("id", "s"), base, 2L)
    graft.ext.Manifests.appendBatch(
      (100L until 4100L).map(i => (i, "v3")).toDF("id", "s").repartition(4),
      base, 3L)
    graft.ext.Manifests.appendBatch(Seq((4L, "v4")).toDF("id", "s"), base, 4L)
    val s1 = graft.ext.Manifests.addedBytesOf(spark, base, 1).get
    val s2 = graft.ext.Manifests.addedBytesOf(spark, base, 2).get
    val s3 = graft.ext.Manifests.addedBytesOf(spark, base, 3).get
    assert(s1 > 0 && s2 > 0 && s3 > s1 + s2,
      s"fixture: the big version ($s3 B) must exceed the cap (${s1 + s2} B)")
    // cap admits exactly the two tiny versions together; the big one
    // exceeds it and must land ALONE (first-version progress rule), and
    // the trailing tiny one waits behind it
    val batches = scala.collection.mutable.ListBuffer.empty[Set[String]]
    val q = spark.readStream.format("graft.sources.manifest")
      .option("path", base)
      .option("startingVersion", "0")
      .option("maxBytesPerTrigger", (s1 + s2).toString)
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val tags = b.select("s").distinct().collect().map(_.getString(0)).toSet
        if (tags.nonEmpty) batches.synchronized { batches += tags }: Unit
      }
      .start()
    try {
      q.processAllAvailable()
      assert(batches.toSeq === Seq(Set("v1", "v2"), Set("v3"), Set("v4")),
        s"bounded-byte admission grouped: $batches")
    } finally q.stop()
  }

  test("manifest source: Trigger.AvailableNow drains the captured backlog in admitted batches then terminates; later appends wait for the next run") {
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mansrc_an").toString
    val (base, ckpt) = (s"$root/table", s"$root/ckpt")
    graft.ext.Manifests.commitData(Seq((0L, "v0")).toDF("id", "s"), base)
    (1 to 3).foreach(i => graft.ext.Manifests.appendBatch(
      Seq((i.toLong, s"v$i")).toDF("id", "s"), base, i.toLong))
    val batches = scala.collection.mutable.ListBuffer.empty[Seq[Long]]
    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.manifest")
        .option("path", base)
        .option("startingVersion", "0")
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = b.collect().map(_.getLong(0)).toSeq.sorted
          if (ids.nonEmpty) batches.synchronized { batches += ids }: Unit
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000),
        "an AvailableNow run must terminate itself once the captured " +
          "backlog is drained")
    }
    // the 3-version backlog drains as 3 single-version batches — the
    // admission cap holds under AvailableNow (Spark's no-support
    // fallback would be ONE batch spanning everything), and the run
    // stops itself
    run()
    assert(batches.toSeq === Seq(Seq(1L), Seq(2L), Seq(3L)),
      s"admitted batches: $batches")
    // appends landing after the drain belong to the NEXT run, which
    // resumes from the checkpoint and drains exactly them
    graft.ext.Manifests.appendBatch(Seq((4L, "v4")).toDF("id", "s"), base, 4L)
    graft.ext.Manifests.appendBatch(Seq((5L, "v5")).toDF("id", "s"), base, 5L)
    batches.clear()
    run()
    assert(batches.toSeq === Seq(Seq(4L), Seq(5L)),
      s"the second run must drain exactly the new versions: $batches")
  }

  test("manifest source: non-append version fails the stream; allowNonAppend reads past it; startingVersion=latest skips backfill") {
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mansrc_na").toString
    val (base, ckpt) = (s"$root/table", s"$root/ckpt")
    graft.ext.Manifests.commitData(
      (1 to 20).map(i => (i.toLong, i % 2)).toDF("id", "k"), base)
    val n = new java.util.concurrent.atomic.AtomicLong(0)
    def start(opts: Map[String, String] = Map.empty) = {
      val r = spark.readStream.format("graft.sources.manifest")
        .option("path", base)
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load().writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          n.addAndGet(b.count()): Unit
        }
        .start()
    }
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(n.get() === 20)
    // a merge-on-read delete is not an append — the stream must refuse
    graft.ext.Manifests.deleteWhereMor(spark, base, col("k") === 0)
    val q2 = start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    assert(ex.getMessage.contains("not append-only") ||
      Option(ex.getCause).exists(_.getMessage.contains("not append-only")))
    q2.stop()
    // opting in reads past the delete (nothing added), then appends flow
    val q3 = start(Map("allowNonAppend" -> "true"))
    try {
      q3.processAllAvailable()
      assert(n.get() === 20)
      graft.ext.Manifests.appendBatch(Seq((100L, 7)).toDF("id", "k"), base, 0L)
      q3.processAllAvailable()
      assert(n.get() === 21)
    } finally q3.stop()
    // a fresh query from `latest` sees only what comes after it starts
    val m = new java.util.concurrent.atomic.AtomicLong(0)
    val q4 = spark.readStream.format("graft.sources.manifest")
      .option("path", base).option("startingVersion", "latest").load()
      .writeStream.option("checkpointLocation", s"$root/ckpt2")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        m.addAndGet(b.count()): Unit
      }
      .start()
    try {
      q4.processAllAvailable()
      assert(m.get() === 0, "latest must skip the backfill")
      graft.ext.Manifests.appendBatch(Seq((200L, 8)).toDF("id", "k"), base, 1L)
      q4.processAllAvailable()
      assert(m.get() === 1)
    } finally q4.stop()
  }

  test("medallion relay: manifest source through a transform into a manifest sink, exactly-once across restart") {
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_medal").toString
    val (bronze, silver, ckpt) = (s"$root/bronze", s"$root/silver", s"$root/ckpt")
    graft.ext.Manifests.commitData(
      (1 to 10).map(i => (i.toLong, i * 1.0)).toDF("id", "v"), bronze)
    def relay() = Streams.manifestSink(
      spark.readStream.format("graft.sources.manifest")
        .option("path", bronze).load()
        .filter(col("id") % 2 === 0)
        .withColumn("v2", col("v") * 2),
      silver, ckpt)
    val q1 = relay()
    try {
      q1.processAllAvailable()
      graft.ext.Manifests.appendBatch(
        Seq((11L, 11.0), (12L, 12.0)).toDF("id", "v"), bronze, 0L)
      q1.processAllAvailable()
    } finally q1.stop()
    // restart; nothing new -> silver must not grow or burn versions
    val vBefore = graft.ext.Manifests.latestVersion(spark, silver)
    val q2 = relay()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(graft.ext.Manifests.latestVersion(spark, silver) === vBefore,
      "an idle restart must not re-append")
    val out = graft.ext.Manifests.readLatest(spark, silver)
    assert(out.columns.toSeq === Seq("id", "v", "v2"))
    assert(out.collect().map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq ===
      Seq((2L, 4.0), (4L, 8.0), (6L, 12.0), (8L, 16.0), (10L, 20.0), (12L, 24.0)))
  }

  test("manifest change-feed stream: deletes arrive as data, and a downstream mirror stays row-exact") {
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cdfsrc").toString
    val (base, mirror, ckpt) = (s"$root/table", s"$root/mirror", s"$root/ckpt")
    graft.ext.Manifests.commitData(
      (1 to 10).map(i => (i.toLong, i % 2)).toDF("id", "k")
        .repartitionByRange(4, col("k")), base)
    // downstream applies the feed: inserts merge in, deletes fall out —
    // incremental view maintenance driven entirely by change rows
    def apply(b: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      val ins = b.filter(col("_change_type") === "insert").drop("_change_type")
      val del = b.filter(col("_change_type") === "delete").drop("_change_type")
      val cur = graft.ext.Manifests.latestVersion(spark, mirror)
        .map(_ => graft.ext.Manifests.readLatest(spark, mirror))
        .getOrElse(ins.limit(0))
      val next = cur.exceptAll(del).unionByName(ins)
      if (!next.isEmpty) graft.ext.Manifests.commitData(next, mirror): Unit
    }
    def start() = spark.readStream.format("graft.sources.manifest")
      .option("path", base).option("readChangeFeed", "true").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(apply _).start()
    val q1 = start()
    try {
      q1.processAllAvailable() // snapshot arrives tagged insert
      // a MoR delete is a legal feed event, not a failure
      graft.ext.Manifests.deleteWhereMor(spark, base, col("k") === 0)
      graft.ext.Manifests.appendBatch(
        Seq((100L, 7), (101L, 8)).toDF("id", "k"), base, 0L)
      q1.processAllAvailable()
    } finally q1.stop()
    def ids(b: String) = graft.ext.Manifests.readLatest(spark, b)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(mirror) === ids(base),
      "mirror maintained from the change feed must equal the source table")
    assert(ids(mirror) === Seq(1L, 3L, 5L, 7L, 9L, 100L, 101L))
  }

  test("cdcApply: replayed batch id no-ops; tag survives only on its own version") {
    val spark0 = spark
    import spark0.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString + "/t"
    assert(graft.ext.Manifests.cdcApply(
      Seq((1L, "a")).toDF("id", "s"), base, Seq("id"), 0L) === Some(0))
    assert(graft.ext.Manifests.latestTag(spark, base) === Some("cdc_batch_0"))
    // at-least-once replay of the committed batch: tag matches -> no-op
    assert(graft.ext.Manifests.cdcApply(
      Seq((1L, "a")).toDF("id", "s"), base, Seq("id"), 0L) === None)
    assert(graft.ext.Manifests.latestVersion(spark, base) === Some(0))
    // next batch merges and moves the tag
    assert(graft.ext.Manifests.cdcApply(
      Seq((1L, "a2")).toDF("id", "s"), base, Seq("id"), 1L) === Some(1))
    assert(graft.ext.Manifests.latestTag(spark, base) === Some("cdc_batch_1"))
    assert(graft.ext.Manifests.tagOf(spark, base, 0) === Some("cdc_batch_0"))
    // a maintenance commit moves the latest tag off the cdc batch
    // (compact self-tags as content-preserving since r16) — the view
    // no longer claims a cdc batch as latest, and replay detection
    // stays ledger-driven either way
    graft.ext.Manifests.compact(spark, base, 1)
    assert(graft.ext.Manifests.latestTag(spark, base) === Some("compact"))
  }

  test("expectations route a stream: good rows flow, quarantine carries named violations — narrow, no state, no watermark") {
    import graft.etl.{Expectation, Expectations}
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Option[Long], Option[Double])]
    val df = input.toDF().toDF("k", "price")
    val exps = Seq(
      Expectation("key_present", col("k").isNotNull),
      Expectation("price_positive", col("price") > 0))
    // the same narrow split as batch — stateless, so plain append mode
    // with no watermark: expectations cost a stream nothing
    val qGood = Expectations.expectOrDrop(df, exps).writeStream
      .format("memory").queryName("exp_good").outputMode("append").start()
    val qBad = Expectations.quarantine(df, exps).writeStream
      .format("memory").queryName("exp_bad").outputMode("append").start()
    try {
      input.addData(
        (Some(1L), Some(5.0)), (None, Some(3.0)),
        (Some(2L), Some(-1.0)), (Some(3L), None))
      qGood.processAllAvailable(); qBad.processAllAvailable()
      assert(spark.sql("SELECT k FROM exp_good").collect()
        .map(_.getLong(0)).toSeq === Seq(1L))
      val bad = spark.sql("SELECT k, violations FROM exp_bad").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1))
        .toMap
      assert(bad === Map(-1L -> "key_present", 2L -> "price_positive",
        3L -> "price_positive"))
    } finally { qGood.stop(); qBad.stop() }
  }

  test("writeStream.format(manifest): declarative exactly-once sink, checkpoint restart, mode/partition refusals") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sinkfmt").toString
    val (base, ckpt) = (s"$root/t", s"$root/ckpt")
    val input = MemoryStream[(Long, String)]
    def start() = input.toDF().toDF("id", "s").writeStream
      .format("manifest").option("path", base)
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val q = start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val afterTwo = graft.ext.Manifests.readLatest(spark, base)
    assert(afterTwo.count() === 3)
    // each micro-batch committed as one manifest version, batch-tagged
    assert(graft.ext.Manifests.latestVersion(spark, base) === Some(1))
    // restart from the checkpoint: the stream resumes exactly where it
    // stopped — no batch replays into a duplicate append
    val q2 = start()
    try {
      input.addData((4L, "d"))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = graft.ext.Manifests.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows === Seq(1L, 2L, 3L, 4L))
    // the sink is append-only and manifest-partitioned: other shapes refuse
    intercept[Exception] {
      input.toDF().toDF("id", "s").writeStream
        .format("manifest").option("path", s"$root/t2")
        .option("checkpointLocation", s"$root/ckpt2")
        .partitionBy("s").outputMode("append").start()
    }
    intercept[Exception] {
      input.toDF().toDF("id", "s").groupBy("s").count().writeStream
        .format("manifest").option("path", s"$root/t3")
        .option("checkpointLocation", s"$root/ckpt3")
        .outputMode("complete").start()
    }
    // the table a FORMAT sink built feeds the manifest SOURCE unchanged:
    // the medallion relay needs no foreachBatch anywhere
    val out = spark.readStream.format("manifest").option("path", base).load()
      .writeStream.format("memory").queryName("sinkfmt_out")
      .outputMode("append").start()
    try {
      out.processAllAvailable()
      assert(spark.sql("SELECT id FROM sinkfmt_out").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    } finally out.stop()
  }

  test("writeStream.format(manifest): two queries into one table keep independent replay identities via the appId option") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sinkapp").toString
    val base = s"$root/t"
    val inA = MemoryStream[(Long, String)]
    val inB = MemoryStream[(Long, String)]
    def start(in: MemoryStream[(Long, String)], app: String, ckpt: String) =
      in.toDF().toDF("id", "src").writeStream
        .format("manifest").option("path", base).option("appId", app)
        .option("checkpointLocation", s"$root/$ckpt")
        .outputMode("append").start()
    // query A advances to batch 1 BEFORE query B's batch 0 arrives:
    // under a shared identity, B's batch 0 would read high-water 1 and
    // be silently dropped as a replay — distinct appIds keep the
    // sequences independent
    val qA = start(inA, "qa", "ckA")
    try {
      inA.addData((1L, "a")); qA.processAllAvailable()
      inA.addData((2L, "a")); qA.processAllAvailable()
    } finally qA.stop()
    val qB = start(inB, "qb", "ckB")
    try {
      inB.addData((100L, "b")); qB.processAllAvailable()
    } finally qB.stop()
    val rows = graft.ext.Manifests.readLatest(spark, base)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(rows === Seq(1L, 2L, 100L),
      "query B's first batch must land despite query A's higher batch ids")
    val v = graft.ext.Manifests.latestVersion(spark, base).get
    assert(graft.ext.Manifests.txnsOf(spark, base, v) ===
      Map("b:qa" -> 1L, "b:qb" -> 0L))
  }

  test("catalog streaming: readStream.table relays versions; writeStream.toTable is exactly-once across restart") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cat_stream").toString
    graft.ext.CatalogTestSupport.registerFreshCatalog(spark, s"$root/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.st")
    spark.sql("CREATE TABLE graft.st.src (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.st.src VALUES (1, 'a'), (2, 'b')")

    // READ: versions stream as micro-batches (snapshot first, then
    // each SQL INSERT's appended files)
    val q = spark.readStream.table("graft.st.src").writeStream
      .format("memory").queryName("cat_read_out").outputMode("append")
      .option("checkpointLocation", s"$root/ckpt_read").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM cat_read_out").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
      spark.sql("INSERT INTO graft.st.src VALUES (3, 'c')")
      q.processAllAvailable()
      assert(spark.sql("SELECT id FROM cat_read_out").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()

    // WRITE: toTable commits one manifest version per epoch, replay-safe
    val input = MemoryStream[(Long, String)]
    def start() = input.toDF().toDF("id", "s").writeStream
      .option("checkpointLocation", s"$root/ckpt_write")
      .outputMode("append").toTable("graft.st.sink")
    val q2 = start()
    try {
      input.addData((1L, "x"), (2L, "y"))
      q2.processAllAvailable()
      input.addData((3L, "z"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.table("graft.st.sink").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    // restart from the checkpoint: no epoch double-appends
    val q3 = start()
    try {
      input.addData((4L, "w"))
      q3.processAllAvailable()
    } finally q3.stop()
    assert(spark.table("graft.st.sink").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    // the sink table is an ordinary manifest table: metadata views and
    // SQL DML work on it directly
    assert(spark.sql("SELECT MAX(version) AS v FROM graft.st.sink.history")
      .head.getInt(0) >= 1)
    spark.sql("DELETE FROM graft.st.sink WHERE id = 2")
    assert(spark.table("graft.st.sink").count() === 3)
  }

  test("two streaming queries into one table: epoch replay detection is query-scoped") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_twoq").toString
    graft.ext.CatalogTestSupport.registerFreshCatalog(spark, s"$root/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tq")
    // query A writes its epochs 0..1
    val a = MemoryStream[(Long, String)]
    val qa = a.toDF().toDF("id", "s").writeStream
      .option("checkpointLocation", s"$root/ckptA")
      .outputMode("append").toTable("graft.tq.t")
    try {
      a.addData((1L, "a")); qa.processAllAvailable()
      a.addData((2L, "a")); qa.processAllAvailable()
    } finally qa.stop()
    // a DIFFERENT query (fresh checkpoint) also starts at epoch 0: its
    // batches must LAND, not be read as replays of query A's epochs
    val b = MemoryStream[(Long, String)]
    val qb = b.toDF().toDF("id", "s").writeStream
      .option("checkpointLocation", s"$root/ckptB")
      .outputMode("append").toTable("graft.tq.t")
    try {
      b.addData((10L, "b")); qb.processAllAvailable()
      b.addData((11L, "b")); qb.processAllAvailable()
    } finally qb.stop()
    assert(spark.table("graft.tq.t").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L, 10L, 11L),
      "a second query's early epochs must not be swallowed as replays")
  }

  test(".changes DSv2 stream: mirror maintained across append, CoW update, MoR delete; " +
      "bounded checkpoint; replay after restart serves from the materialized feed even under vacuum") {
    val spark0 = spark
    import spark0.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_dsv2cdf").toString
    graft.ext.CatalogTestSupport.registerFreshCatalog(spark, s"$root/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cd")
    spark.sql("CREATE TABLE graft.cd.src (id BIGINT, k INT)")
    (1L to 8L).map(i => (i, (i % 2).toInt)).toDF("id", "k")
      .repartitionByRange(2, col("id")).createOrReplaceTempView("cd_src_rows")
    spark.sql("INSERT INTO graft.cd.src SELECT * FROM cd_src_rows") // v0
    val base = s"$root/wh/cd/src"
    val mirror = s"$root/mirror"
    val ckpt = s"$root/ckpt"

    // the downstream table is maintained PURELY from change rows;
    // replay guard: every served batch here is non-empty and commits
    // exactly one mirror version, so a replayed batch id is already
    // covered when the mirror head is at or past it
    def apply(b: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
      if (graft.ext.Manifests.latestVersion(spark, mirror).exists(_ >= batchId)) return
      // whole-row arithmetic must project the provenance columns away
      // (they differ per commit by design — Delta table_changes
      // consumers make the same move)
      val b2 = b.drop("_commit_version", "_commit_timestamp")
      val ins = b2.filter(col("_change_type") === "insert").drop("_change_type")
      val del = b2.filter(col("_change_type") === "delete").drop("_change_type")
      val cur = graft.ext.Manifests.latestVersion(spark, mirror)
        .map(_ => graft.ext.Manifests.readLatest(spark, mirror))
        .getOrElse(ins.limit(0))
      graft.ext.Manifests.commitData(cur.exceptAll(del).unionByName(ins), mirror): Unit
    }
    def start() = spark.readStream.table("graft.cd.src.changes")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(apply _).start()
    def rows(read: => org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
      read.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    def srcRows = rows(spark.table("graft.cd.src"))
    def mirRows = rows(graft.ext.Manifests.readLatest(spark, mirror))

    val q1 = start()
    try {
      q1.processAllAvailable() // batch 0: whole snapshot tagged insert
      assert(mirRows === srcRows)
      spark.sql("INSERT INTO graft.cd.src VALUES (9, 1), (10, 0)") // v1 append
      q1.processAllAvailable()
      assert(mirRows === srcRows)
      spark.sql("UPDATE graft.cd.src SET k = 7 WHERE id = 2") // v2 CoW rewrite
      q1.processAllAvailable()
      assert(mirRows === srcRows)
      assert(mirRows.contains((2L, 7)) && !mirRows.contains((2L, 0)))
      // v3: merge-on-read delete — vectors, not files; a legal feed event
      graft.ext.Manifests.deleteWhereMor(spark, base, col("k") === 0)
      q1.processAllAvailable()
      assert(mirRows === srcRows)
      assert(!mirRows.exists(_._2 == 0))
    } finally q1.stop()

    // bounded checkpoint: batch commit purged every feed dir except the
    // one ending at the committed offset (4 batches served -> not 4
    // dirs). The engine scopes the stream's checkpoint dir per source
    // (ckpt/sources/<i>), so locate graft_cdf by walking the tree.
    def findCdfRoot(p: String): Option[String] =
      graft.ext.Dfs.list(spark, p).filter(_.isDirectory).flatMap { s =>
        if (s.getPath.getName == "graft_cdf") Seq(s.getPath.toString)
        else findCdfRoot(s.getPath.toString).toSeq
      }.headOption
    val cdfRoot = findCdfRoot(ckpt).getOrElse(
      fail("no graft_cdf dir under the checkpoint"))
    val cdfDirs = graft.ext.Dfs.list(spark, cdfRoot)
      .filter(_.isDirectory).map(_.getPath.getName)
    assert(cdfDirs.length <= 2, s"feed dirs not purged: $cdfDirs")
    assert(cdfDirs.exists(_.endsWith("_3")), "the committed batch's dir is kept for replay")

    // idle restart burns nothing
    val vBefore = graft.ext.Manifests.latestVersion(spark, mirror)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(graft.ext.Manifests.latestVersion(spark, mirror) === vBefore)

    // force a REPLAY of the last batch (offsets present, commit record
    // gone) AND vacuum the source to 1 version, dropping the old
    // manifests/files the feed was computed FROM: a recompute is now
    // impossible, so only the marker-guarded materialized feed can
    // serve the replayed batch — replay stability under vacuum
    val lastCommit = graft.ext.Dfs.list(spark, s"$ckpt/commits")
      .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toInt).max
    graft.ext.Dfs.delete(spark, s"$ckpt/commits/$lastCommit")
    graft.ext.Manifests.vacuum(spark, base, keepLast = 1)
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    assert(mirRows === srcRows, "replayed batch must re-serve the materialized feed")
    assert(graft.ext.Manifests.latestVersion(spark, mirror) === vBefore,
      "the replayed batch must be recognized as applied, not re-applied")
  }

  test(".changes catch-up across ADD COLUMN: pre-evolution batches null-fill the added column") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdfevo").toString
    graft.ext.CatalogTestSupport.registerFreshCatalog(spark, s"$root/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ce")
    spark.sql("CREATE TABLE graft.ce.t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.ce.t VALUES (1, 'a')") // v0
    spark.sql("INSERT INTO graft.ce.t VALUES (2, 'b')") // v1
    spark.sql("ALTER TABLE graft.ce.t ADD COLUMN extra STRING") // v2, metadata-only
    spark.sql("INSERT INTO graft.ce.t VALUES (3, 'c', 'x')") // v3
    // startingVersion=0 + one version per trigger: batch (0,1] is built
    // from PRE-evolution manifests whose union schema lacks `extra` —
    // the stream's resolution schema has it, so the feed must null-fill
    // (before the fix this threw AnalysisException and killed the query)
    val q = spark.readStream
      .option("startingVersion", "0").option("maxVersionsPerTrigger", "1")
      .table("graft.ce.t.changes")
      .writeStream.format("memory").queryName("cdf_catchup")
      .option("checkpointLocation", s"$root/ckpt").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.sql(
        "SELECT id, s, extra, _change_type FROM cdf_catchup ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), r.getString(3))).toSeq
    assert(rows === Seq(
      (2L, "b", None, "insert"),        // pre-evolution batch, null-filled
      (3L, "c", Some("x"), "insert")))  // post-evolution batch carries it
  }

  test(".changes catch-up across RENAME COLUMN: pre-rename batches era-map to the new name, never null-fill") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdfren").toString
    graft.ext.CatalogTestSupport.registerFreshCatalog(spark, s"$root/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cr")
    spark.sql("CREATE TABLE graft.cr.t (id BIGINT, s STRING)")
    spark.sql("INSERT INTO graft.cr.t VALUES (1, 'a')") // v0
    spark.sql("INSERT INTO graft.cr.t VALUES (2, 'b')") // v1
    spark.sql("ALTER TABLE graft.cr.t RENAME COLUMN s TO label") // v2
    spark.sql("INSERT INTO graft.cr.t VALUES (3, 'c')") // v3
    // the stream resolves at the POST-rename schema (id, label); the
    // catch-up batch (0,1] builds its feed from pre-rename manifests
    // whose schema names the column `s` — the feed machinery must
    // alias s→label through the recorded name history (a null-fill
    // here silently destroys every pre-rename change row)
    val q = spark.readStream
      .option("startingVersion", "0").option("maxVersionsPerTrigger", "1")
      .table("graft.cr.t.changes")
      .writeStream.format("memory").queryName("cdf_rename")
      .option("checkpointLocation", s"$root/ckpt").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.sql(
        "SELECT id, label, _change_type FROM cdf_rename ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    assert(rows === Seq(
      (2L, "b", "insert"),   // pre-rename batch: real value, new name
      (3L, "c", "insert")))  // post-rename batch reads plainly
  }

  test(".changes catch-up across ALTER COLUMN TYPE: narrow-era batches cast up to the widened type") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdfwid").toString
    graft.ext.CatalogTestSupport.registerFreshCatalog(spark, s"$root/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cw")
    spark.sql("CREATE TABLE graft.cw.t (id BIGINT, n INT)")
    spark.sql("INSERT INTO graft.cw.t VALUES (1, 10)") // v0
    spark.sql("INSERT INTO graft.cw.t VALUES (2, 20)") // v1
    spark.sql("ALTER TABLE graft.cw.t ALTER COLUMN n TYPE BIGINT") // v2
    spark.sql("INSERT INTO graft.cw.t VALUES (3, 3000000007)") // v3
    // the stream resolves at the POST-widening schema (n BIGINT); the
    // catch-up batch (0,1] builds its feed from pre-widening manifests
    // whose union schema still types n as INT — the feed must cast the
    // column up (before the fix the stream-schema select could not
    // unify the rows with the resolved plan)
    val q = spark.readStream
      .option("startingVersion", "0").option("maxVersionsPerTrigger", "1")
      .table("graft.cw.t.changes")
      .writeStream.format("memory").queryName("cdf_widen")
      .option("checkpointLocation", s"$root/ckpt").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.sql(
        "SELECT id, n, _change_type FROM cdf_widen ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq
    assert(rows === Seq(
      (2L, 20L, "insert"),          // narrow-era batch, cast up
      (3L, 3000000007L, "insert"))) // wide-era batch reads plainly
  }

  test("branch-scoped streaming: epochs land on the branch by name, publishes are exactly-once, the branch reads as a stream") {
    val spark0 = spark
    import spark0.implicits._
    implicit val ctx = spark.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft_brstream").toString
    graft.ext.CatalogTestSupport.registerFreshCatalog(spark, root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.brs")
    Seq((1L, "seed")).toDF("id", "s").createOrReplaceTempView("brs_src")
    spark.sql("CREATE TABLE graft.brs.t AS SELECT * FROM brs_src")
    val base = s"$root/brs/t"
    spark.sql("CALL graft.system.branch('brs.t', 'audit')")
    // the WAP streaming loop: a checkpointed stream writes EPOCHS to
    // the branch BY NAME; main sees nothing until the publish
    val input = MemoryStream[(Long, String)]
    def start() = input.toDF().toDF("id", "s").writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .toTable("graft.brs.t.branch_audit")
    val q1 = start()
    try {
      input.addData((2L, "e0"))
      q1.processAllAvailable()
      input.addData((3L, "e1"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.brs.t")
      .head.getLong(0) === 1, "main leaked unpublished epochs")
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.brs.t " +
      "VERSION AS OF 'audit'").head.getLong(0) === 3)
    // publish; the stream CONTINUES on the branch; publish again —
    // main accumulates exactly once (the txn ledger rides fastForward)
    spark.sql("CALL graft.system.fast_forward('brs.t', 'audit')")
    assert(spark.sql("SELECT COUNT(*) AS n FROM graft.brs.t")
      .head.getLong(0) === 3)
    val q2 = start()
    try {
      input.addData((4L, "e2"))
      q2.processAllAvailable()
    } finally q2.stop()
    spark.sql("CALL graft.system.fast_forward('brs.t', 'audit')")
    val rows = spark.sql("SELECT id, s FROM graft.brs.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "seed"), (2L, "e0"), (3L, "e1"),
      (4L, "e2")), "publishes must be exactly-once on main")
    // replay safety of a branch-landed epoch against published main is
    // RefsSpec's ledger-merge case; here the exactly-once assertion
    // above is the streaming-shaped proof (a replayed epoch would show
    // up as a duplicate row on main)
    // the branch itself reads as a STREAM by name — the audit side of
    // a streaming WAP loop
    val q3 = spark.readStream.table("graft.brs.t.branch_audit")
      .writeStream.format("memory").queryName("brs_audit")
      .option("checkpointLocation", s"$root/ckpt_read")
      .outputMode("append").start()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.sql("SELECT COUNT(*) AS n FROM brs_audit")
      .head.getLong(0) === 4)
  }
}
