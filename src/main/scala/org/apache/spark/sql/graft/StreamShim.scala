package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The one `private[sql]` door a DSv1 streaming source must walk
  * through: `MicroBatchExecution` asserts that `Source.getBatch`
  * returns a frame with `isStreaming = true`, and the only way to mint
  * one is `internalCreateDataFrame` — package-private to
  * `org.apache.spark.sql`. Living in this package to reach it is the
  * established connector pattern (spark-sql-kafka's KafkaSource does
  * exactly this); nothing else in graft touches Spark internals. */
object StreamShim {
  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
        .queryExecution.toRdd,
      df.schema, isStreaming = true)
  }

  /** The inverse door, for a V1 streaming SINK: the `DataFrame` handed
    * to `Sink.addBatch` is bound to the engine's incremental execution
    * and must not be re-planned by ordinary writer actions (the classic
    * custom-sink trap — Delta's V1 sink does exactly this re-wrap).
    * Rebuilding a plain batch frame over the already-planned RDD gives
    * the commit path a frame it can write/retry safely. */
  def asBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
        .queryExecution.toRdd,
      df.schema, isStreaming = false)
  }
}
