package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Metadata-only aggregates over manifest tables — the Delta/Iceberg
  * "answer from file statistics" optimization as a logical rewrite: an
  * unfiltered, ungrouped aggregate whose only input is a manifest
  * relation and whose every aggregate is provable from the version's
  * zone-stats sidecar collapses to a [[LocalRelation]] at plan time.
  * Provable aggregates:
  *
  *  - `COUNT(*)` / `COUNT(1)` — Σ per-file `n_rows`;
  *  - `COUNT(col)` for a stats-indexed column — Σ (`n_rows` − nulls);
  *  - `MIN(col)` / `MAX(col)` for a stats-indexed column — the fold of
  *    per-file zone bounds (all-null files carry null bounds, which the
  *    fold ignores exactly as the real aggregate ignores nulls).
  *
  * On a 100 TB table that turns the most common profiling queries
  * (`COUNT(*)`, date-range `MIN`/`MAX`) from a million-footer
  * distributed scan into one metadata-sized driver read, amortized to
  * zero by the sidecar memo.
  *
  * The rewrite fires only when it is PROVABLY exact: no grouping, no
  * filter between the aggregate and the scan, no DISTINCT, no
  * per-aggregate FILTER clause, only attribute-projections below — and
  * [[graft.ext.ManifestFileIndex.coveredStats]] proves the stats cover
  * exactly the manifest's files (appends maintain the stats sidecar
  * incrementally, so the proof survives appends without re-ANALYZE;
  * batch manifest relations carry no deletion vectors by provider
  * contract). A table never ANALYZEd, or an aggregate over a
  * non-indexed column, simply keeps its normal scan — correctness
  * never depends on the rule.
  *
  * Installed into `spark.experimental.extraOptimizations` alongside
  * [[ManifestInsertStrategy]] the first time a manifest relation is
  * created; the batch runs after Catalyst's own optimization, exactly
  * where an eligible plan has settled into
  * `Aggregate(Nil, aggs, [Project(attrs),] LogicalRelation)`. */
object ManifestCountRule extends Rule[LogicalPlan] {

  private def manifestIndex(
      plan: LogicalPlan): Option[graft.ext.ManifestFileIndex] = plan match {
    // column pruning leaves an attributes-only Project over the
    // relation; attribute projections cannot change cardinality or
    // column values, so they are transparent to the proof
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      manifestIndex(child)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case m: graft.ext.ManifestFileIndex => Some(m)
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  /** The metadata answer for one aggregate, as a CATALYST value of the
    * aggregate's output type — None when this aggregate is not
    * provable from the stats. */
  private def statValue(idx: graft.ext.ManifestFileIndex,
      ne: NamedExpression): Option[Any] = {
    val ae = ne match {
      case Alias(a: AggregateExpression, _) => a
      case a: AggregateExpression => a
      case _ => return None
    }
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case Count(children) if children.forall {
            case l: Literal => l.value != null
            case _ => false
          } =>
        idx.exactRowCount
      case Count(Seq(a: AttributeReference)) =>
        idx.statNonNullCount(a.name)
      case Min(a: AttributeReference) =>
        idx.statBound(a.name, isMin = true).map(v =>
          CatalystTypeConverters.convertToCatalyst(v.orNull))
      case Max(a: AttributeReference) =>
        idx.statBound(a.name, isMin = false).map(v =>
          CatalystTypeConverters.convertToCatalyst(v.orNull))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      manifestIndex(child) match {
        case Some(idx) =>
          val vals = aggExprs.map(statValue(idx, _))
          if (vals.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(vals.map(_.get))))
          else agg
        case None => agg
      }
  }

  /** Idempotent runtime installation — `extraOptimizations` is the
    * optimizer-side twin of `experimental.extraStrategies`, the same
    * registration `SparkSessionExtensions.injectOptimizerRule` gives a
    * session built with extensions. */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(ManifestCountRule))
      exp.extraOptimizations = exp.extraOptimizations :+ ManifestCountRule
  }
}
