package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental materialized-view maintenance — the reference's
  * truncate-and-reload warehouse (S6) rebuilt as the thing a 100 TB
  * deployment actually runs: a persisted rollup that each appended batch
  * UPDATES by merging partial aggregates, never rescanning history.
  *
  * The maintained view here is the monthly-sales rollup
  * ([[Quality.monthlySales]]'s grain): per (year, month), row count and
  * exact-DECIMAL revenue. Counts and decimal sums are mergeable
  * (associative, exact), so
  * `merge(MV_prev, partial(batch)) == full recompute over history+batch`
  * is an algebraic identity — and the registered query proves it by
  * replaying the ENTIRE fact table through three hash-split batches and
  * hash-matching the full-recompute oracle.
  *
  * Scale shape: a refresh reads the incoming batch (one scan, partial
  * agg map-side) plus the current MV (grain-sized — months, not rows)
  * and writes the next MV version to a NEW directory (version-directory
  * commit: readers of v_i never see a partial v_{i+1}; the swap is a
  * manifest pointer, mirroring [[graft.operators.Corpus.admitAndCommit]]'s
  * append contract). Cost is O(batch + |MV|); history is never touched.
  * Each batch must be merged exactly once — the exactly-once admission
  * is the caller's contract, same as every append path in this library.
  */
object Mv {

  val nBatches = 3

  /** MV storage schema keeps the revenue sum in a wide exact DECIMAL;
    * the output boundary casts to (18,2)->DOUBLE like every money
    * column. */
  private val revStore = DecimalType(30, 2)

  private def base(spark: SparkSession, dir: String): String =
    s"${graft.ext.Dfs.scratchBase}/graftfix_${graft.ext.Dfs.codeEpoch}_mv_" +
      new org.apache.hadoop.fs.Path(dir).getName + "_" +
      graft.ext.Dfs.datasetKey(spark, dir)

  /** The version-chain root [[monthlySalesViaMv]] commits under — exposed
    * for time-travel reads ([[graft.ext.Snapshots.readAt]]). */
  def chainBase(spark: SparkSession, dir: String): String = base(spark, dir)

  /** Deterministic 3-way hash split of the fact table (every batch
    * touches every month, so refreshes genuinely merge rather than
    * appending disjoint keys), dumped once per application. */
  def writeBatches(spark: SparkSession, dir: String): Seq[String] = {
    val b = base(spark, dir)
    // one partitioned write (a single fact scan), not one job per batch;
    // reading a partition subdir directly yields the data columns only
    val paths = (0 until nBatches).map(i => s"$b/batches/_b=$i")
    graft.ext.Dfs.buildOnce(spark, s"$b/batches") {
      val fact = Warehouse(spark, dir).fact
      val split = pmod(graft.operators.Dedup.fastHash60(spark,
        concat_ws("|", lit("mv"), col("invoice_no"), col("product_key"),
          col("customer_key"), col("date_key"), col("quantity"),
          col("unit_price").cast("string"))), lit(nBatches.toLong)).cast("int")
      fact.withColumn("_b", split)
        .write.mode("overwrite").partitionBy("_b").parquet(s"$b/batches")
    }
    paths
  }

  /** Partial aggregate of one batch at MV grain. */
  private def partial(batch: DataFrame): DataFrame =
    batch.groupBy(
      year(col("invoice_date")).as("year"),
      month(col("invoice_date")).as("month"))
      .agg(count(lit(1)).as("n_sales"),
        sum(col("total_amount")).cast(revStore).as("rev"))

  /** The UNEXECUTED refresh frame: current MV + one batch → next MV
    * content. Exposed for plan contracts — its scans must read exactly
    * the MV and the batch, never history. */
  def refreshFrame(spark: SparkSession, mvPath: String, batchPath: String): DataFrame =
    spark.read.parquet(mvPath)
      .unionByName(partial(spark.read.parquet(batchPath)))
      .groupBy("year", "month")
      .agg(sum(col("n_sales")).as("n_sales"),
        sum(col("rev")).cast(revStore).as("rev"))

  /** Version-directory commit: write v_{i+1} from v_i + batch. */
  def refresh(spark: SparkSession, mvPath: String, batchPath: String,
      outPath: String): String = {
    refreshFrame(spark, mvPath, batchPath).write.mode("overwrite").parquet(outPath)
    outPath
  }

  /** v0: the first batch's partial aggregate, committed as a version dir. */
  def init(spark: SparkSession, batchPath: String, outPath: String): String = {
    partial(spark.read.parquet(batchPath)).write.mode("overwrite").parquet(outPath)
    outPath
  }

  /** The MV-grain partial aggregate of an arbitrary fact-shaped frame
    * — the public face [[partial]] hides, for callers that seed an MV
    * from a manifest snapshot. */
  def partialOf(fact: DataFrame): DataFrame = partial(fact)

  /** CDC-DRIVEN refresh — the maintenance path append-only [[refresh]]
    * cannot cover: after a merge-on-read UPDATE/DELETE on the base
    * table, the `.changes` feed ([[graft.ext.Manifests.changesBetween]]
    * / the streaming `.changes` relation / the update-image replay
    * [[graft.ext.Manifests.changesBetweenWithUpdates]]) emits full row
    * images tagged with the Delta CDF tags — plain {insert, delete},
    * or {update_preimage, update_postimage} pairs where the write
    * recorded them — and this folds them into the MV at grain
    * (pre = −1, post = +1, algebraically identical). Counts and exact
    * DECIMAL sums form a commutative GROUP — a delete is a NEGATIVE
    * delta — so `apply(MV@v_i, changes(v_i → v_j)) == full recompute
    * at v_j` is an algebraic identity (Delta's incremental-MV
    * pattern). Groups whose count reaches zero leave the MV, exactly
    * as the recompute would drop them.
    *
    * Scale shape: cost is O(changes + |MV|) — the change feed is
    * file-pruned at the source (only files whose vectors/content
    * moved are read, zone-stat pruning on top), the fold is one
    * grain-sized groupBy, and HISTORY IS NEVER RESCANNED (MvSpec pins
    * the read set with a counting filesystem). */
  def applyChangesFrame(spark: SparkSession, mvPath: String,
      changes: DataFrame): DataFrame = {
    // STRICT tag whitelist over the four Delta CDF tags: a preimage is
    // a NEGATIVE delta exactly like a delete, a postimage a positive
    // one like an insert — the commutative-group identity holds for
    // the keyed feed and the write-path update-image feed
    // (graft.cdf.updateImages) as it does for the plain one. Anything
    // else still refuses at scan speed (codegen'd raise_error, no
    // extra pass): silently folding an unknown tag as ±1 is the
    // corruption this guard exists to stop.
    val sign = when(col("_change_type").isin("delete", "update_preimage"),
      -1L)
      .when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(raise_error(concat(
        lit("Mv.applyChangesFrame takes {insert, delete, "),
        lit("update_preimage, update_postimage} tags; got _change_type = "),
        // a NULL tag must not null the whole diagnostic via concat
        coalesce(col("_change_type"), lit("NULL"))))
        .cast("long"))
    val delta = changes.groupBy(
      year(col("invoice_date")).as("year"),
      month(col("invoice_date")).as("month"))
      .agg(sum(sign).as("n_sales"),
        sum(col("total_amount").cast(revStore) * sign).cast(revStore)
          .as("rev"))
    spark.read.parquet(mvPath).unionByName(delta)
      .groupBy("year", "month")
      .agg(sum(col("n_sales")).as("n_sales"),
        sum(col("rev")).cast(revStore).as("rev"))
      .filter(col("n_sales") > 0)
  }

  /** [[applyChangesFrame]] committed as the next MV version dir. */
  def applyChanges(spark: SparkSession, mvPath: String,
      changes: DataFrame, outPath: String): String = {
    applyChangesFrame(spark, mvPath, changes)
      .write.mode("overwrite").parquet(outPath)
    outPath
  }

  /** The (year, month, n_sales, revenue) output boundary every
    * monthly-rollup face shares. */
  def formatted(mv: DataFrame): DataFrame =
    mv.select(col("year"), col("month"), col("n_sales"),
      col("rev").cast(DecimalType(18, 2)).cast(DoubleType).as("revenue"))
      .orderBy("year", "month")

  /** Drive the full lifecycle on the fixture: init from batch 0, refresh
    * with batches 1..n-1, read the final version — formatted exactly like
    * the full-recompute monthly rollup so the q_monthly_sales oracle
    * hash-checks the incremental path end to end. */
  def monthlySalesViaMv(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
    val last = s"$b/v${nBatches - 1}"
    graft.ext.Dfs.buildOnce(spark, s"$b/chain") {
      val batches = writeBatches(spark, dir)
      init(spark, batches.head, s"$b/v0")
      batches.tail.zipWithIndex.foldLeft(s"$b/v0") {
        case (prev, (batch, i)) => refresh(spark, prev, batch, s"$b/v${i + 1}")
      }: Unit
    }
    spark.read.parquet(last)
      .select(col("year"), col("month"), col("n_sales"),
        col("rev").cast(DecimalType(18, 2)).cast(DoubleType).as("revenue"))
      .orderBy("year", "month")
  }
}
