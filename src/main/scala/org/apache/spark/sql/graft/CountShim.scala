package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Metadata-only `SELECT COUNT(*)` over manifest tables — the Delta/
  * Iceberg "answer cardinality from file statistics" optimization as a
  * logical rewrite: an unfiltered, ungrouped `COUNT(*)` (or `COUNT(1)`)
  * whose only input is a manifest relation collapses to a
  * [[LocalRelation]] holding the sum of the per-file `n_rows` recorded
  * in the version's zone-stats sidecar. On a 100 TB table that turns a
  * million-footer distributed scan into one metadata-sized driver read
  * (amortized to zero by the sidecar memo) — the single most common
  * query a table gets, for free at plan time.
  *
  * The rewrite fires only when it is PROVABLY exact:
  *  - no grouping, no filter between the aggregate and the scan, no
  *    DISTINCT, no per-aggregate FILTER clause — anything else keeps
  *    the ordinary plan;
  *  - every aggregate in the list is a literal-argument `Count` (the
  *    resolved form of `COUNT(*)`/`COUNT(1)`), so projections below
  *    cannot change the answer;
  *  - [[graft.ext.ManifestFileIndex.exactRowCount]] proves coverage:
  *    a stats row for EVERY manifest file (appends maintain the stats
  *    sidecar incrementally, so the proof survives appends without
  *    re-ANALYZE), and batch manifest relations carry no deletion
  *    vectors by provider contract. A table never ANALYZEd simply
  *    keeps its normal scan — correctness never depends on the rule.
  *
  * Installed into `spark.experimental.extraOptimizations` alongside
  * [[ManifestInsertStrategy]] the first time a manifest relation is
  * created; the batch runs after Catalyst's own optimization, exactly
  * where a count-only plan has settled into
  * `Aggregate(Nil, counts, [Project([]),] LogicalRelation)`. */
object ManifestCountRule extends Rule[LogicalPlan] {

  private def countOnly(aggs: Seq[NamedExpression]): Boolean =
    aggs.nonEmpty && aggs.forall {
      case Alias(ae: AggregateExpression, _) => literalCount(ae)
      case ae: AggregateExpression => literalCount(ae)
      case _ => false
    }

  private def literalCount(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(children) => children.forall {
        case l: Literal => l.value != null
        case _ => false
      }
      case _ => false
    })

  private def manifestIndex(
      plan: LogicalPlan): Option[graft.ext.ManifestFileIndex] = plan match {
    // column pruning leaves an empty Project over the relation for a
    // count-only aggregate; a Project cannot change cardinality, but
    // only the pruned (no-expression, nothing-can-throw) form appears
    // under a settled count plan, so only that form is recognized
    case Project(Nil, child) => manifestIndex(child)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case m: graft.ext.ManifestFileIndex => Some(m)
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Nil, aggExprs, child, _) if countOnly(aggExprs) =>
      manifestIndex(child).flatMap(_.exactRowCount) match {
        case Some(n) =>
          LocalRelation(agg.output, Seq(InternalRow.fromSeq(
            agg.output.map(_ => n))))
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
