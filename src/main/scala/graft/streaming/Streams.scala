package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface: the streaming twins of the batch event
  * operators ([[graft.operators.Events]]), built on `readStream` →
  * transform → `writeStream`. The reference is strictly batch (daily
  * Airflow, SURVEY §2.9), so these are §7.5 extensions: the operators a
  * training-data pipeline runs continuously over an event firehose.
  *
  * Scale notes: both operators keep bounded state. The windowed rollup's
  * state is (window × event_type) aggregates, evicted once the 2-hour
  * watermark passes; sessionization keeps ONE open-session record per
  * active user, evicted by event-time timeout. Neither buffers raw
  * events, so state size tracks active keys, not throughput. Shuffle
  * partitioning is by the grouping key exactly as in batch; at 1000
  * executors the state store shards with the shuffle.
  */
object Streams {

  /** Watermarked tumbling-hour rollup (streaming [[graft.operators.Events.hourlyRollup]]).
    * Late events beyond 2 hours are dropped; money stays DECIMAL inside
    * the agg, DOUBLE at the boundary, matching the batch contract. */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 2)))
          .cast(DecimalType(18, 2)).cast("double").as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup (the streaming twin of the batch dedup family,
    * [[graft.operators.Dedup.exactDedup]] / `Clean.dedup`): drop any record
    * whose content digest was already seen within the watermark horizon.
    * `dropDuplicatesWithinWatermark` keeps ONE state entry per distinct
    * digest and evicts it once the watermark passes — state is bounded by
    * unique keys per horizon, not by throughput, which is the only dedup
    * contract that survives an unbounded stream. (Exactly-once global
    * dedup over all history needs an external key store; within-horizon is
    * the standard streaming-ingest guarantee.) */
  def dedupWithinWatermark(docs: DataFrame, delay: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", delay)
      .withColumn("digest", md5(col("text")))
      .dropDuplicatesWithinWatermark("digest")
      .drop("digest")

  /** Streaming corpus append — the streaming twin of
    * [[graft.operators.Corpus.appendBatch]]/`admitAndCommit`: admit a
    * document only if its content digest is neither in the EXISTING
    * corpus's persisted digest index nor already admitted from the
    * stream. Two stateless-or-bounded pieces:
    *
    *  1. stream-static LEFT ANTI join against the digest index parquet —
    *     stream-static joins keep NO state (each micro-batch probes the
    *     static side), so corpus-side rejection costs one index probe per
    *     batch regardless of stream history;
    *  2. `dropDuplicatesWithinWatermark` on the digest for stream-side
    *     dupes — one state entry per distinct admitted digest inside the
    *     horizon, evicted as the watermark passes (the bounded-state
    *     contract of [[dedupWithinWatermark]]); the batch twin's index
    *     APPEND plays this role durably, so a deployment periodically
    *     compacts admitted digests into the index and lets the watermark
    *     horizon cover the gap between compactions.
    *
    * Output: the admitted rows with their digest. Equivalence with the
    * sequential batch `admitAndCommit` on fixture batches is asserted in
    * StreamsSpec. */
  def appendStream(docs: DataFrame, indexDir: String, delay: String = "1 hour"): DataFrame = {
    val index = docs.sparkSession.read.parquet(indexDir)
    docs
      .withWatermark("ts", delay)
      .withColumn("digest", md5(col("text")))
      .join(index, Seq("digest"), "left_anti")
      .dropDuplicatesWithinWatermark("digest")
  }

  /** Streaming NEAR-dup flagging — the streaming twin of
    * [[graft.operators.Corpus.appendNearDups]]: sign each arriving
    * document with the narrow per-row MinHash signature
    * ([[graft.operators.Dedup.signatureCol]] — one `aggregate` HOF, no
    * stateful aggregation), band it, and stream-static join the bands
    * against the persisted signature index ([[graft.operators.Corpus
    * .bandIndexDir]] layout), then signature-verify the candidates.
    * State is bounded: the only stateful operator is the
    * within-watermark dedup of (doc_id, matched_id) pairs (a pair can
    * surface through several bands). The index is a SNAPSHOT — stream
    * flags are relative to it, and a deployment periodically compacts
    * admitted documents into the index exactly like the exact-dedup
    * twin ([[appendStream]]'s horizon contract).
    *
    * Output: one row per (arriving doc, matched index doc) with the
    * signature-agreement count. Cap semantics mirror the batch path
    * (index-side buckets over [[graft.operators.Dedup.maxBucketSize]]
    * are shed). */
  def nearDupStream(docs: DataFrame, bandIndexDir: String,
      minMatch: Int = 16, delay: String = "1 hour"): DataFrame = {
    import graft.operators.Dedup
    val spark = docs.sparkSession
    // static side, built once and persisted: capped band buckets + sigs
    val oldSigs = spark.read.parquet(s"$bandIndexDir/sigs")
    val oldBand = Dedup.bandedOf(oldSigs)
    val ok = oldBand.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= Dedup.maxBucketSize)
      .select("band_idx", "band_hash")
    val oldIn = oldBand.join(ok, Seq("band_idx", "band_hash"))
      .select("doc_id", "band_idx", "band_hash")
      .toDF("matched_id", "band_idx", "band_hash")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val oldSigl = oldSigs.toDF("matched_id", "sig_old")
    val signed = docs
      .withWatermark("ts", delay)
      .withColumn("sig", Dedup.signatureCol(spark))
    val banded = signed.select(col("ts"), col("doc_id"), col("sig"),
      posexplode(array((0 until Dedup.numBands).map(j =>
        Dedup.bandHashOf(j, col("sig"))): _*)))
      .toDF("ts", "doc_id", "sig", "band_idx", "band_hash")
    banded
      .join(oldIn, Seq("band_idx", "band_hash")) // stream-static: stateless
      .select("ts", "doc_id", "sig", "matched_id")
      .join(oldSigl, Seq("matched_id"))
      .withColumn("n_match",
        expr("""aggregate(zip_with(sig, sig_old,
               |  (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),
               |  0, (acc, v) -> acc + v)""".stripMargin))
      .filter(col("n_match") >= minMatch)
      .select("ts", "doc_id", "matched_id", "n_match")
      .dropDuplicatesWithinWatermark("doc_id", "matched_id")
  }

  /** Stream-STREAM interval join — the streaming twin of
    * [[graft.ext.RangeJoin.clickInPurchaseWindow]]: attribute every click
    * to same-user purchase windows `[purchase_ts, +2h)` while BOTH sides
    * flow. Spark's stream-stream join keeps each side's rows in state
    * only as long as the watermark + the join's time bound require:
    * a click can only match purchases at most 2 h older, so once the
    * purchase watermark passes `click_ts`, the click row is evicted —
    * state is bounded by (throughput × horizon), never by history. The
    * batch twin's bin-bucketing trick is unnecessary here: the state
    * store IS the bucketed index, keyed by user and pruned by time.
    * Equivalence with the batch inequality join is asserted in
    * StreamsSpec. */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
      delay: String = "3 hours"): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", delay)
    c.join(p, expr(
      s"""user_id = p_user AND click_ts >= purchase_ts
         |AND click_ts < purchase_ts + INTERVAL ${graft.ext.RangeJoin.windowHours} HOURS"""
        .stripMargin.replace('\n', ' ')))
      .select("user_id", "click_ts", "purchase_ts")
  }

  /** Streaming incremental MV maintenance — the streaming twin of
    * [[graft.etl.Mv]]: each micro-batch's partial aggregate merges into
    * the persisted monthly rollup as a NEW version directory keyed by the
    * micro-batch id. foreachBatch delivers at-least-once, so the commit
    * must be idempotent: re-running batch i recomputes v_i from v_{i-1} +
    * batch_i and overwrites — the version chain makes replay a no-op,
    * which upgrades the sink to exactly-once (the standard
    * foreachBatch-with-batchId-keyed-commit protocol). Readers always see
    * a complete version; cost per batch is O(batch + grain), history is
    * never rescanned — identical contracts to the batch twin, proven by
    * the StreamsSpec equivalence against the full recompute. */
  def commitMvVersion(batch: DataFrame, mvBase: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val partial = batch.groupBy(
      year(col("invoice_date")).as("year"),
      month(col("invoice_date")).as("month"))
      .agg(count(lit(1)).as("n_sales"),
        sum(col("total_amount")).cast(DecimalType(30, 2)).as("rev"))
    val prev = s"$mvBase/v${batchId - 1}"
    // a missing predecessor for batchId > 0 means the chain is broken
    // (retention deleted old versions, or markers are disabled) — fail
    // LOUDLY rather than silently resetting the rollup to one batch's
    // totals, which readers could not distinguish from real data
    if (batchId > 0 && !graft.ext.Dfs.exists(spark, s"$prev/_SUCCESS"))
      sys.error(s"MV chain broken: $prev was never committed (batch $batchId)")
    val next =
      if (batchId > 0)
        spark.read.parquet(prev).unionByName(partial)
          .groupBy("year", "month")
          .agg(sum(col("n_sales")).as("n_sales"),
            sum(col("rev")).cast(DecimalType(30, 2)).as("rev"))
      else partial
    next.write.mode("overwrite").parquet(s"$mvBase/v$batchId")
  }

  /** Drive [[commitMvVersion]] from a stream of fact rows. */
  def maintainMonthlyMv(facts: DataFrame, mvBase: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    facts.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitMvVersion(batch, mvBase, batchId)
      }
      .start()

  /** Exactly-once streaming append into a [[graft.ext.Manifests]] table —
    * the landing-zone sink a versioned warehouse table ingests through:
    * each micro-batch lands as one atomic manifest version, readers time
    * travel over batch boundaries, and [[graft.ext.Manifests.deleteWhere]]/
    * `merge`/`compact`/`vacuum` run against the same table the stream
    * feeds. Idempotence (and so exactly-once on top of foreachBatch's
    * at-least-once) is [[graft.ext.Manifests.appendBatch]]'s contract:
    * the manifest itself records which batch directories are in, so a
    * replayed batch no-ops. StreamsSpec proves replay stability and the
    * crashed-attempt window. `appId` scopes replay detection per writer
    * query (the txn-ledger key): pass a stable per-query id when
    * MULTIPLE streaming queries append into the same table; the default
    * keeps the single-writer assumption. */
  def manifestSink(rows: DataFrame, base: String,
      checkpoint: String, appId: String = "batch")
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ext.Manifests.appendBatch(batch, base, batchId, appId): Unit
      }
      .start()

  /** Exactly-once CDC apply — the upsert twin of [[manifestSink]]: a
    * stream of keyed change rows (the Debezium/CDC shape after
    * projection to latest-image-per-key) MERGEs into a manifest table,
    * one atomic version per micro-batch, replays skipped via
    * [[graft.ext.Manifests.cdcApply]]'s batch-id tag. Each batch must
    * carry at most one row per key — dedupe upstream (e.g.
    * [[dedupWithinWatermark]] or a last-image aggregation) or the merge
    * throws rather than guess an order. */
  def cdcSink(changes: DataFrame, base: String, keyCols: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ext.Manifests.cdcApply(batch, base, keyCols, batchId): Unit
      }
      .start()

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  /** start/end are epoch MICROSECONDS: Spark timestamps are micro-precision,
    * and tracking `Timestamp.getTime` millis would silently truncate
    * session bounds (caught by the batch-equivalence fixture test). */
  final case class SessionState(start: Long, end: Long, n: Long, total: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  private def toMicros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  final case class StageEvent(user_id: Long, event_type: String, ts: Timestamp)
  /** Stage micros, -1 = not reached; lastTs drives the idle timeout. */
  final case class FunnelState(view: Long, click: Long, purchase: Long, lastTs: Long)
  final case class FunnelRow(user_id: Long, view_ts: Timestamp,
      click_ts: Option[Timestamp], purchase_ts: Option[Timestamp], converted: Int)

  /** Streaming ordered funnel — the stateful twin of
    * [[graft.operators.Events.funnelStages]]: per user, ONE compact
    * state record (three stage micros + last activity) advanced
    * monotonically as events arrive; the funnel row is emitted when the
    * user has been idle past `idleDays` of event time (event-time
    * timeout), at which point the within-window conversion verdict is
    * final. State is O(active users) — no event buffering, so a bot
    * user with 10^9 events still costs 32 bytes — and eviction rides
    * the watermark exactly like [[sessionize]].
    *
    * Ordering contract: stage advancement (`first click AFTER the first
    * view`, strict >) folds events in event-time order WITHIN each
    * micro-batch; across batches the state is advance-only, so
    * equivalence with the batch operator holds under per-user
    * event-time-ordered delivery — the guarantee a user-keyed Kafka
    * topic provides (per-key log order), and the streaming norm this
    * twin documents rather than hides. StreamsSpec proves equality
    * against `funnelStages` on the fixture events. */
  def funnelStream(events: Dataset[StageEvent],
      idleDays: Int = 30): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    val idleUs = idleDays * 86400L * 1000000L
    val windowUs =
      graft.operators.Events.funnelWindowDays * 86400L * 1000000L
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (userId, batch, state) =>
        def emit(s: FunnelState): Iterator[FunnelRow] =
          if (s.view < 0) Iterator.empty
          else Iterator.single(FunnelRow(
            userId, fromMicros(s.view),
            if (s.click < 0) None else Some(fromMicros(s.click)),
            if (s.purchase < 0) None else Some(fromMicros(s.purchase)),
            if (s.purchase >= 0 && s.purchase - s.view <= windowUs) 1 else 0))
        if (state.hasTimedOut) {
          val out = state.getOption.map(emit).getOrElse(Iterator.empty)
          state.remove()
          out
        } else {
          var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, -1L))
          for (e <- batch.toSeq.sortBy(e => toMicros(e.ts))) {
            val t = toMicros(e.ts)
            e.event_type match {
              case "view" if s.view < 0 => s = s.copy(view = t)
              case "click" if s.view >= 0 && t > s.view && s.click < 0 =>
                s = s.copy(click = t)
              case "purchase" if s.click >= 0 && t > s.click && s.purchase < 0 =>
                s = s.copy(purchase = t)
              case _ => ()
            }
            s = s.copy(lastTs = math.max(s.lastTs, t))
          }
          state.update(s)
          state.setTimeoutTimestamp(
            math.max((s.lastTs + idleUs) / 1000L + 1, state.getCurrentWatermarkMs() + 1))
          Iterator.empty
        }
      }
  }

  final case class WeekHit(user_id: Long, week: java.sql.Date)
  /** cohortDays = the user's first active week as epoch DAYS;
    * seenOffsets = week offsets already emitted (bounded by the program
    * horizon in weeks — a 5-year product history is ≤261 ints). */
  final case class CohortState(cohortDays: Long, seenOffsets: List[Int])
  final case class CohortHit(user_id: Long, cohort_week: java.sql.Date, offset_weeks: Int)

  /** Streaming cohort retention — the stateful half of
    * [[graft.operators.Events.cohortRetention]]: per user, remember the
    * FIRST active week (the cohort) and emit one `(user, cohort_week,
    * offset_weeks)` hit the first time each later week is seen.
    * Exactly-once hit emission is the stateful work; the retention
    * triangle itself is then an ordinary `GROUP BY cohort_week, offset
    * COUNT(user)` over the emitted hits (each hit is already distinct
    * per (user, offset), so the count needs no further dedup) — the
    * StreamsSpec equivalence aggregates the hits and matches the batch
    * triangle cell for cell. Week truncation happens in the DataFrame
    * layer (`date_trunc('week', ts)`) BEFORE the typed fold, so both
    * twins share one week definition. Same per-user ordering contract
    * as [[funnelStream]]. */
  def cohortHits(weeks: Dataset[WeekHit]): Dataset[CohortHit] = {
    import weeks.sparkSession.implicits._
    weeks
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CohortState, CohortHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (userId, batch, state) =>
        var s = state.getOption.getOrElse(CohortState(-1L, Nil))
        val out = List.newBuilder[CohortHit]
        for (w <- batch.toSeq.sortBy(_.week.getTime)) {
          val days = w.week.toLocalDate.toEpochDay
          if (s.cohortDays < 0) s = s.copy(cohortDays = days)
          val off = ((days - s.cohortDays) / 7).toInt
          if (!s.seenOffsets.contains(off)) {
            out += CohortHit(userId,
              java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(s.cohortDays)), off)
            s = s.copy(seenOffsets = off :: s.seenOffsets)
          }
        }
        state.update(s)
        out.result().iterator
      }
  }

  /** Stateful gap-based sessionization (streaming
    * [[graft.operators.Events.sessionize]]): one open session per user in
    * `flatMapGroupsWithState`, closed either by an event beyond the gap or
    * by event-time timeout once the watermark passes the gap horizon.
    * Output equality with the batch operator on the fixture events is
    * asserted in StreamsSpec. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60000000L
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) { (userId, batch, state) =>
        def emit(s: SessionState) =
          Session(userId, fromMicros(s.start), fromMicros(s.end), s.n, s.total)
        if (state.hasTimedOut) {
          val out = state.getOption.map(emit).iterator
          state.remove()
          out
        } else {
          var closed = List.empty[Session]
          var cur = state.getOption
          for (e <- batch.toSeq.sortBy(e => toMicros(e.ts))) {
            val t = toMicros(e.ts)
            cur match {
              case Some(s) if t <= s.end + gapUs =>
                cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
              case Some(s) =>
                closed ::= emit(s)
                cur = Some(SessionState(t, t, 1, e.value))
              case None =>
                cur = Some(SessionState(t, t, 1, e.value))
            }
          }
          cur.foreach { s =>
            state.update(s)
            // timeout API is millisecond-granular and must sit beyond the
            // current watermark
            state.setTimeoutTimestamp(
              math.max((s.end + gapUs) / 1000L + 1, state.getCurrentWatermarkMs() + 1))
          }
          closed.reverse.iterator
        }
      }
  }
}
