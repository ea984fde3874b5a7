package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical "operator Spark lacks" (time-series point
  * lookup: for every left row, the most recent right row with
  * `right.ts <= left.ts` on the same key).
  *
  * Preference ladder (a) from the brief applies: the semantics COMPOSE
  * from built-ins, so no custom `SparkPlan` is needed. The classic
  * union+window encoding shuffles both sides ONCE on the key, sorts
  * within partitions by (ts, side), and carries the latest right payload
  * forward with `last(_, ignoreNulls)` — right rows sort before left rows
  * at equal timestamps, giving the standard `<=` as-of contract. At 100 TB
  * this is strictly one exchange + one sort, the same cost as the
  * sort-merge join a native AsOfJoinExec would do; a range-bucketed
  * variant (join on (key, ts_bucket) after replicating right rows into
  * the buckets they can serve) drops the sort width when keys are hot.
  *
  * Contract: `right` has exactly (key, ts, payload...) columns; callers
  * needing uniqueness at (key, ts) aggregate right first. The carried
  * value is the most recent right ROW — its payload fields ride inside
  * one struct, so a right row whose payload value is NULL still wins as
  * "most recent" (and yields NULL), exactly like a native ASOF join;
  * carrying each payload column independently with `last(_, ignoreNulls)`
  * would instead resurrect an OLDER non-null value.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String): DataFrame = {
    val payload = right.columns.filterNot(c => c == key || c == tsCol).toSeq
    val leftOnly = left.columns.filterNot(c => c == key || c == tsCol).toSeq
    val pStruct = struct(payload.map(col): _*)
    val pType = right.select(pStruct).schema.head.dataType
    val lt = left.select(
      Seq(col(key), col(tsCol)) ++ leftOnly.map(col) :+
        lit(null).cast(pType).as("_p") :+ lit(1).as("_side"): _*)
    val rt = right.select(
      Seq(col(key), col(tsCol)) ++
        leftOnly.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        pStruct.as("_p") :+ lit(0).as("_side"): _*)
    val w = Window.partitionBy(key).orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lt.unionByName(rt)
      .withColumn("_pc", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        Seq(col(key), col(tsCol)) ++ leftOnly.map(col) ++
          payload.map(p => col("_pc")(p).as(p)): _*)
  }
}
