package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-rebinding for frames that cross session boundaries.
  *
  * The library memoizes expensive shared lineages per APPLICATION
  * ([[graft.etl.Warehouse]], [[graft.functions.Memo]]): any session of the
  * app gets the same DataFrame back, and the shared block-manager cache
  * makes that correct and cheap. But a `DataFrame` is bound to the session
  * that ANALYZED it — `createOrReplaceTempView` registers in the frame's
  * own session catalog, not the caller's — so a caller on a sibling
  * session (the bench's conf-isolated warm-up workers) would register the
  * view where its own `sql(...)` cannot see it. [[rebind]] re-roots the
  * frame's logical plan onto the caller's session; the cache manager is
  * application-shared and matches by canonicalized plan, so a rebound
  * frame still reads the memoized InMemoryRelation instead of recomputing.
  */
object SessionShim {
  def rebind(s: SparkSession, df: DataFrame): DataFrame =
    if (df.sparkSession eq s) df
    else org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.logical)
}
