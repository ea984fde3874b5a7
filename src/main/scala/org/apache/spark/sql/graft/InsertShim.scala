package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.{InsertIntoHadoopFsRelationCommand, WriteFiles}

/** SQL `INSERT INTO` / `INSERT OVERWRITE` routed through the manifest
  * COMMIT protocol — closing a silent-data-loss door: the manifest scan
  * relation is a `HadoopFsRelation`, so Spark's own resolution turns an
  * INSERT against it into `InsertIntoHadoopFsRelationCommand`, which
  * writes bare parquet part-files into the table ROOT. No manifest
  * version lists them, so the INSERT "succeeds" while every read keeps
  * answering without the new rows — the worst failure mode a table
  * format can have.
  *
  * The fix is ladder step (c) of the build brief — a `SparkStrategy`,
  * installed at runtime into `spark.experimental.extraStrategies` the
  * first time a manifest relation is created (extra strategies plan
  * BEFORE the built-ins, so interception is total for any session that
  * has ever touched a manifest table — and an INSERT target must have
  * been resolved through [[graft.sources.manifest.DefaultSource]] to
  * exist at all). The strategy recognizes the command by its
  * [[graft.ext.ManifestFileIndex]] and replaces the bare file write
  * with the real protocol: append → [[graft.ext.Manifests.append]]
  * (OCC retry loop, schema evolution, incremental stats/partition/
  * bloom maintenance), INSERT OVERWRITE →
  * [[graft.ext.Manifests.commitData]] (a superseding version, history
  * intact). Hive-style partition clauses refuse loudly — manifest
  * tables declare partitioning in the manifest, not the path. */
object ManifestInsertStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case i: InsertIntoHadoopFsRelationCommand
        if i.fileIndex.exists(_.isInstanceOf[graft.ext.ManifestFileIndex]) =>
      ManifestInsertExec(i) :: Nil
    case _ => Nil
  }

  /** Idempotent runtime installation — `experimental.extraStrategies`
    * is the one strategy hook mutable after session construction, the
    * lightweight face of `SparkSessionExtensions.injectPlannerStrategy`
    * (same registration a session built with extensions would get). */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(ManifestInsertStrategy))
      exp.extraStrategies = exp.extraStrategies :+ ManifestInsertStrategy
  }
}

/** The physical node the strategy substitutes: runs the INSERT's query
  * and commits it through the manifest write path. Executed eagerly by
  * the command-execution machinery (the logical node is a `Command`);
  * the side effect is latched so replanning never double-appends. */
case class ManifestInsertExec(cmd: InsertIntoHadoopFsRelationCommand)
    extends LeafExecNode {

  override def output: Seq[Attribute] = Nil

  private lazy val committed: Unit = {
    require(cmd.staticPartitions.isEmpty,
      "manifest tables take no Hive-style PARTITION clause — partitioning " +
        "is declared in the manifest (commitDataPartitioned / " +
        "option(\"partitionedBy\", ...)); INSERT plain rows instead")
    val spark = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // V1Writes wraps the query in a WriteFiles node sized for the bare
    // file write this strategy replaces — peel it to get the data plan
    val query = cmd.query match {
      case w: WriteFiles => w.child
      case q => q
    }
    val df = org.apache.spark.sql.classic.Dataset.ofRows(spark, query)
      .toDF(cmd.outputColumnNames: _*)
    val base = cmd.outputPath.toString
    cmd.mode match {
      case SaveMode.Append => graft.ext.Manifests.append(df, base)
      case SaveMode.Overwrite => graft.ext.Manifests.commitData(df, base)
      case m => sys.error(s"unsupported INSERT mode $m for a manifest table")
    }
    ()
  }

  override def executeCollect(): Array[InternalRow] = {
    committed
    Array.empty
  }

  override protected def doExecute(): RDD[InternalRow] = {
    committed
    sparkContext.emptyRDD
  }
}
