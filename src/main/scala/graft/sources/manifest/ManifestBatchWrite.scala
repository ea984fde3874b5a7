package graft.sources.manifest

import graft.ext.Dfs
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** The write-side distribution contract, shared by the batch and delta
  * writes: request CLUSTERING by the table's partition columns (plus
  * `_file` for position deltas), non-strict — Spark then plans a
  * `RebalancePartitions` instead of a hard repartition, so AQE sizes
  * the shuffle (coalescing small clusters, splitting skewed ones at
  * `spark.sql.adaptive.advisoryPartitionSizeInBytes`). The payoff at
  * high parallelism: a wide MERGE/overwrite emits ~one file per
  * clustered partition instead of one fragment per task — pay-never
  * instead of OPTIMIZE's pay-later. `graft.write.distribution=none`
  * opts a session out (Iceberg's write.distribution-mode escape
  * hatch). An UNPARTITIONED batch write has no clustering to request
  * and stays unspecified — Spark refuses an advisory size over an
  * unspecified distribution and plans no rebalance for an empty
  * clustering, so declaring one would be an analysis error, not a
  * size-rebalance; `compactSmall` remains the small-file remedy
  * there. (Position deltas always cluster: `_file` is in every delta
  * row.) */
private[manifest] trait ManifestWriteDistribution
    extends RequiresDistributionAndOrdering {
  protected def spark: SparkSession
  protected def clusterCols: Seq[String]

  private def enabled: Boolean = clusterCols.nonEmpty && !spark.conf
    .getOption("graft.write.distribution").exists(_.equalsIgnoreCase("none"))

  override def requiredDistribution(): Distribution =
    if (!enabled) Distributions.unspecified()
    else Distributions.clustered(clusterCols.map(c =>
      Expressions.column(c)
        : org.apache.spark.sql.connector.expressions.Expression).toArray)

  override def distributionStrictlyRequired(): Boolean = false

  override def requiredNumPartitions(): Int = 0

  override def advisoryPartitionSizeInBytes(): Long =
    if (!enabled) 0L
    else spark.conf.getOption("graft.write.advisoryPartitionBytes")
      .map(_.toLong).getOrElse(0L) // 0 → the session's AQE advisory size

  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array.empty
}

/** The distributed half of SQL row-level DML on manifest tables: a
  * DSv2 `BatchWrite` whose tasks stream `InternalRow`s into immutable
  * parquet files under a fresh `data_*` directory, and whose COMMIT is
  * a caller-supplied manifest publish over exactly the files the tasks
  * reported. Spark's `ReplaceData` plan (the group-based copy-on-write
  * rewrite behind DELETE/UPDATE/MERGE) requires a real `BatchWrite` —
  * the V1 `InsertableRelation` fallback only covers appends — so this
  * drives [[ParquetFileFormat.prepareWrite]]'s task-side writer
  * directly: same encoder, same codec, same footer stats as every
  * other parquet the engine writes.
  *
  * Crash/abort contract mirrors the rest of the protocol: files land
  * under a uniquely-named directory no manifest references until the
  * commit callback publishes them, so an abort (or a crash anywhere)
  * leaves only unreferenced residue for [[graft.ext.Manifests.sweepOrphans]];
  * task retries each write their own UUID-named file and only the
  * files of SUCCESSFUL tasks reach the commit message list. Empty
  * tasks open no file at all — a 1000-partition rewrite of 3 files
  * writes 3 files, not 1000. */
private[manifest] class ManifestParquetWrite(
    override protected val spark: SparkSession,
    base: String, schema: StructType,
    commitFn: Seq[String] => Unit,
    override protected val clusterCols: Seq[String] = Seq.empty)
    extends Write with ManifestWriteDistribution {

  override def toBatch: BatchWrite = {
    val dir = s"$base/data_${java.util.UUID.randomUUID().toString.take(8)}"
    Dfs.mkdirs(spark, dir)
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, schema)
    val conf = new SerializableConfiguration(job.getConfiguration)
    new BatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory =
        ManifestWriterFactory(dir, schema, factory, conf)

      override def commit(messages: Array[WriterCommitMessage]): Unit =
        // tasks report the raw paths they constructed; QUALIFY them
        // (scheme + authority) so the manifest stores the same spelling
        // a directory listing yields — every rewrite's replaced-file
        // set arithmetic compares manifest entries against listed
        // statuses, and a schemeless entry would silently never match
        commitFn(messages.flatMap {
          case ManifestWriteMessage(paths) => paths
          case _ => Seq.empty
        }.toSeq.map(Dfs.qualified(spark, _)))

      override def abort(messages: Array[WriterCommitMessage]): Unit =
        try Dfs.delete(spark, dir, recursive = true)
        catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  override def description(): String = s"manifest-parquet-write($base)"
}

private[manifest] case class ManifestWriteMessage(paths: Seq[String])
    extends WriterCommitMessage

private[manifest] case class ManifestWriterFactory(dir: String,
    schema: StructType, factory: OutputWriterFactory,
    conf: SerializableConfiguration) extends DataWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = new DataWriter[InternalRow] {

    private var out: org.apache.spark.sql.execution.datasources.OutputWriter = _
    private var path: String = _
    private var proj: org.apache.spark.sql.catalyst.expressions.UnsafeProjection = _

    private def ctx = new TaskAttemptContextImpl(conf.value,
      new TaskAttemptID(new TaskID(new org.apache.hadoop.mapreduce.JobID(
        "graft-manifest", 0), TaskType.MAP, partitionId),
        (taskId % Int.MaxValue).toInt))

    override def write(row: InternalRow): Unit = {
      if (out == null) {
        val c = ctx
        // task-attempt-unique name: a retried task writes its own file,
        // and only the surviving attempt's path reaches the commit list
        path = f"$dir/part-$partitionId%05d-${java.util.UUID.randomUUID()
          .toString.take(8)}-$taskId${factory.getFileExtension(c)}"
        out = factory.newInstance(path, schema, c)
        // group-based row-level rewrites (ReplaceData) PREPEND an
        // internal `__row_operation` column to the query output, and
        // Spark applies its row projection only on the
        // metadata-attributes path (DataAndMetadataWritingSparkTask) —
        // a connector declaring none receives the raw wider row while
        // LogicalWriteInfo.schema() reports the projected one. Adapt
        // positionally: the write schema's columns sit after the
        // operation column, in table order (the rewrite's Project
        // shape). Anything but a 0/1 arity delta is a real mismatch.
        val offset = row.numFields - schema.length
        require(offset >= 0 && offset <= 1,
          s"write row has ${row.numFields} fields for a ${schema.length}" +
            s"-column schema — unexpected rewrite plan shape")
        proj = if (offset == 0) null
          else org.apache.spark.sql.catalyst.expressions.UnsafeProjection
            .create(schema.fields.zipWithIndex.map { case (f, i) =>
              org.apache.spark.sql.catalyst.expressions.BoundReference(
                i + offset, f.dataType, f.nullable)
            }.toIndexedSeq)
      }
      out.write(if (proj == null) row else proj(row))
    }

    override def commit(): WriterCommitMessage = {
      if (out != null) { out.close(); out = null }
      ManifestWriteMessage(Option(path).toSeq)
    }

    override def abort(): Unit = {
      if (out != null) { out.close(); out = null }
      if (path != null)
        try new org.apache.hadoop.fs.Path(path)
          .getFileSystem(conf.value).delete(
            new org.apache.hadoop.fs.Path(path), false)
        catch { case scala.util.control.NonFatal(_) => () }
    }

    override def close(): Unit = if (out != null) { out.close(); out = null }
  }
}
