package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

/** Metadata-only aggregates over manifest tables — the Delta/Iceberg
  * "answer from file statistics" optimization as a logical rewrite: an
  * ungrouped aggregate whose only input is a manifest relation and
  * whose every aggregate is provable from the version's zone-stats
  * sidecar collapses to a [[LocalRelation]] at plan time. Provable
  * aggregates:
  *
  *  - `COUNT(*)` / `COUNT(1)` — Σ per-file `n_rows`;
  *  - `COUNT(col)` for a stats-indexed column — Σ (`n_rows` − nulls);
  *  - `MIN(col)` / `MAX(col)` for a stats-indexed column — the fold of
  *    per-file zone bounds (all-null files carry null bounds, which the
  *    fold ignores exactly as the real aggregate ignores nulls);
  *  - `SUM(col)` for an INTEGRAL stats-indexed column — Σ per-file
  *    sums (legacy mode: integer addition is associative mod 2^64, so
  *    the fold is bit-equal to the scan; ANSI mode: only under the
  *    zone-bound no-overflow proof, so the scan's overflow-throw can
  *    never be shadowed; floating sums never rewrite — FP addition is
  *    order-dependent).
  *
  * A FILTER between the aggregate and the scan no longer always
  * disables the rewrite: when the whole condition translates STRICTLY
  * to a predicate over the version's recorded partition tuples and
  * every file classifies PURELY under it (all tuples match or none —
  * Iceberg's partition-predicate count, made exact-or-absent), the
  * aggregates fold over just the matching files' stats rows. A mixed
  * file, an uncovered file, or any non-partition conjunct keeps the
  * real scan — correctness never depends on the clustering.
  *
  * On a 100 TB table this turns the most common profiling queries
  * (`COUNT(*)`, date-range `MIN`/`MAX`, per-partition counts, revenue
  * `SUM`s) from a million-footer distributed scan into one
  * metadata-sized driver read, amortized to zero by the sidecar memo.
  *
  * The rewrite fires only when it is PROVABLY exact: no grouping, no
  * DISTINCT, no per-aggregate FILTER clause, only attribute-projections
  * and (partition-pure) filters below — and
  * [[graft.ext.ManifestFileIndex.coveredStats]] proves the stats cover
  * exactly the manifest's files (appends maintain the stats sidecar
  * incrementally, so the proof survives appends without re-ANALYZE;
  * batch manifest relations carry no deletion vectors by provider
  * contract). A table never ANALYZEd, or an aggregate over a
  * non-indexed column, simply keeps its normal scan.
  *
  * Installed into `spark.experimental.extraOptimizations` alongside
  * [[ManifestInsertStrategy]] the first time a manifest relation is
  * created; the batch runs after Catalyst's own optimization, exactly
  * where an eligible plan has settled into
  * `Aggregate(Nil, aggs, [Project/Filter,] LogicalRelation)`. */
object ManifestCountRule extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** The manifest index under attribute-only projections and filters,
    * plus every filter conjunct on the way down and the scan's
    * per-file DELETION-VECTOR cardinalities (empty for clean
    * versions). Projections cannot change cardinality or values;
    * filters are returned for the partition-purity proof to consume
    * (or refuse). */
  private def manifestScan(plan: LogicalPlan)
      : Option[(graft.ext.ManifestFileIndex, Seq[Expression],
        Map[String, Long])] = plan match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      manifestScan(child)
    case Filter(cond, child) =>
      manifestScan(child).map { case (i, cs, d) =>
        (i, conjuncts(cond) ++ cs, d) }
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case m: graft.ext.ManifestFileIndex => Some((m, Seq.empty, Map.empty))
        case _ => None
      }
      case _ => None
    }
    // the DSv2 CATALOG read path: by the time extraOptimizations run,
    // V2ScanRelationPushDown has settled the relation into a scan node.
    // A row-level CoW scan also rides a ManifestScanIndex but must
    // never be aggregate-collapsed — it is the one ParquetScan here
    // implementing runtime filtering, which is the discriminator. No
    // pushed aggregate (footer-based pushdown changes the shape).
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
      r.scan match {
        // a VECTORED version still answers COUNT(*) from metadata —
        // Delta's numRecords − dvCardinality: the bitmap index the
        // scan already holds gives exact per-file deleted counts, and
        // statValue subtracts them (only COUNT(*) — zone bounds and
        // per-column null counts are raw, so MIN/MAX/COUNT(col)/SUM
        // refuse and keep the real scan)
        // the ordinary catalog read — clean OR vectored. It implements
        // SupportsRuntimeV2Filtering since the SPJ round, so it must be
        // matched BY CLASS here, before the runtime-filtering exclusion
        // below (whose job is only to fence off the CoW DML scan):
        // runtime filters exist only under joins, where the Aggregate-
        // over-scan collapse shape can't match anyway.
        case dv: graft.sources.manifest.DvParquetScan
            if dv.pushedAggregate.isEmpty =>
          dv.fileIndex match {
            case m: graft.sources.manifest.ManifestScanIndex =>
              m.innerIndex.map(i =>
                (i, Seq.empty,
                  if (dv.hasDeletes) dv.deletedCardinalities
                  else Map.empty[String, Long]))
            case _ => None
          }
        case ps: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
            if !ps.isInstanceOf[
              org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering] &&
              ps.pushedAggregate.isEmpty =>
          ps.fileIndex match {
            case m: graft.sources.manifest.ManifestScanIndex =>
              m.innerIndex.map(i => (i, Seq.empty, Map.empty))
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  /** The metadata answer for one aggregate, as a CATALYST value of the
    * aggregate's output type — None when this aggregate is not
    * provable from the (possibly filtered) stats. */
  private def statValue(idx: graft.ext.ManifestFileIndex,
      filters: Seq[Expression], ne: NamedExpression,
      deleted: Map[String, Long]): Option[Any] = {
    val ae = ne match {
      case Alias(a: AggregateExpression, _) => a
      case a: AggregateExpression => a
      case _ => return None
    }
    if (ae.isDistinct || ae.filter.isDefined) return None
    // over a VECTORED version only COUNT(*) is provable: per-file
    // bitmap cardinalities subtract exactly, and partition-purity
    // still holds (live rows ⊆ a purely-matching file's raw rows).
    // Everything else refuses — zone bounds may be held up by deleted
    // rows, per-column nulls/sums are raw.
    if (deleted.nonEmpty && !(ae.aggregateFunction match {
      case Count(children) => children.forall {
        case l: Literal => l.value != null
        case _ => false
      }
      case _ => false
    })) return None
    ae.aggregateFunction match {
      case Count(children) if children.forall {
            case l: Literal => l.value != null
            case _ => false
          } =>
        if (deleted.isEmpty) idx.exactRowCountWhere(filters)
        else idx.liveRowCountWhere(filters, deleted)
      case Count(Seq(a: AttributeReference)) =>
        idx.statNonNullCount(a.name, filters)
      case Min(a: AttributeReference) =>
        idx.statBound(a.name, isMin = true, filters).map(v =>
          CatalystTypeConverters.convertToCatalyst(v.orNull))
      case Max(a: AttributeReference) =>
        idx.statBound(a.name, isMin = false, filters).map(v =>
          CatalystTypeConverters.convertToCatalyst(v.orNull))
      // integral sums only (result type LongType): in legacy mode the
      // fold of per-file sums wraps identically to the scan (mod-2^64
      // associativity); under ANSI the index additionally proves no
      // partial sum in any order can overflow (zone-bound argument in
      // ManifestFileIndex.noOverflowPossible) or refuses, so the scan's
      // overflow-throw semantics are never shadowed
      case s: Sum if s.dataType == LongType =>
        s.child match {
          case a: AttributeReference =>
            idx.statSum(a.name, filters).map(v =>
              CatalystTypeConverters.convertToCatalyst(v.orNull))
          case _ => None
        }
      case _ => None
    }
  }

  /** Cheap global rejection: does this plan hold ANY manifest-capable
    * leaf? One short-circuiting traversal; the overwhelmingly common
    * non-manifest query pays a leaf check per node and nothing else —
    * no Aggregate pattern-match, no manifestScan walk, no stats reads.
    * (Measured r11: the rule's cost was already unobservable across a
    * 48-query steady-state A/B, but a globally-armed rule should bail
    * structurally, not rely on plans being small.) */
  private def hasManifestLeaf(plan: LogicalPlan): Boolean = plan.exists {
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation =>
        fs.location.isInstanceOf[graft.ext.ManifestFileIndex]
      case _ => false
    }
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
      r.scan match {
        case ps: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          ps.fileIndex.isInstanceOf[graft.sources.manifest.ManifestScanIndex]
        case _ => false
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!hasManifestLeaf(plan)) plan
    else plan.transform {
      case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
        manifestScan(child) match {
          case Some((idx, filters, deleted)) =>
            val vals = aggExprs.map(statValue(idx, filters, _, deleted))
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
