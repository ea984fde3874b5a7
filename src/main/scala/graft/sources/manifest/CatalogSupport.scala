package graft.sources.manifest

import graft.ext.{Dfs, ManifestFileIndex, Manifests}
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{PartitionDirectory, PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** [[graft.ext.ManifestFileIndex]] re-exposed through the shape DSv2
  * file scans require: `ParquetScanBuilder`/`ParquetScan` take a
  * `PartitioningAwareFileIndex`, so the manifest listing plus its
  * partition-tuple / zone-map / bloom pruning ride into the catalog
  * read path by DELEGATION — `listFiles` hands Catalyst's pushed
  * filters straight to the inner index, exactly as the V1 relation
  * does. A table with no committed version yet (`CREATE TABLE` before
  * the first write) lists zero files: an empty scan, not an error.
  * Partition columns live IN the data (Iceberg shape), so the partition
  * spec is always empty — partition predicates arrive as dataFilters
  * and prune via the recorded per-file tuples. */
final class ManifestScanIndex(spark: SparkSession, base: String,
    version: Option[Int])
    extends PartitioningAwareFileIndex(spark, Map.empty, None) {

  private val inner: Option[ManifestFileIndex] =
    version.map(new ManifestFileIndex(spark, base, _))

  /** The wrapped index — [[org.apache.spark.sql.graft.ManifestCountRule]]
    * reaches through this to prove metadata-only aggregates for DSv2
    * catalog scans exactly as for the V1 relation. */
  def innerIndex: Option[ManifestFileIndex] = inner

  /** The resolved snapshot this index lists (None: no committed
    * version yet) — the DSv2 statistics face keys its NDV lookup on
    * it. */
  def versionOpt: Option[Int] = version

  /** The table base path, for sidecar lookups keyed (base, version). */
  def basePath: String = base

  /** RUNTIME file filters — the hook behind the CoW scan's
    * `SupportsRuntimeV2Filtering`: Spark's row-level runtime group
    * filtering evaluates the command's matching-rows subquery and hands
    * the scan an IN-list over a prunable column; appending those
    * expressions here lets the next `listFiles` re-prune through the
    * SAME partition/zone/bloom machinery the static filters use.
    * Pruning-safe by construction (a dropped or untranslatable runtime
    * filter only keeps more files); each row-level operation builds its
    * OWN index instance, so the slot is never shared across queries. */
  @volatile private var runtimeFilters: Seq[Expression] = Seq.empty

  private[manifest] def addRuntimeFilters(fs: Seq[Expression]): Unit =
    runtimeFilters = runtimeFilters ++ fs

  private val statuses: Seq[FileStatus] =
    inner.fold(Seq.empty[FileStatus])(_.fileStatuses)

  override def rootPaths: Seq[Path] = Seq(new Path(base))

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override def partitionSchema: StructType = new StructType()

  override val leafFiles: scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    statuses.foreach(s => m += (s.getPath -> s))
    m
  }

  override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent).view.mapValues(_.toArray).toMap

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    inner.fold(Seq(PartitionDirectory(
        org.apache.spark.sql.catalyst.InternalRow.empty,
        Array.empty[FileStatus])))(
      _.listFiles(partitionFilters, dataFilters ++ runtimeFilters))

  override def inputFiles: Array[String] =
    inner.fold(Array.empty[String])(_.inputFiles)

  override def sizeInBytes: Long = statuses.map(_.getLen).sum

  override def allFiles(): Seq[FileStatus] = statuses

  override def refresh(): Unit = () // a committed version is immutable
}

/** V1 `sources.Filter` → `Column` translation — the bridge that lets
  * SQL `DELETE FROM t WHERE ...` land on the file-surgical
  * [[graft.ext.Manifests.deleteWhere]] / metadata-only
  * [[graft.ext.Manifests.dropPartitions]] paths: Spark's
  * `OptimizeMetadataOnlyDeleteFromTable` hands the condition as
  * connector predicates, `PredicateUtils.toV1` lowers them to V1
  * filters, and this rebuilds the exact row predicate those APIs take.
  * Translation is EXACT or refused (`None`) — a dropped conjunct would
  * delete the wrong rows, so unlike pruning there is no conservative
  * fallback. Nested-field references (dotted names) refuse: the DML
  * paths address top-level columns. */
private[manifest] object FilterColumns {

  private def c(attr: String): Option[Column] =
    if (attr.contains(".")) None else Some(col(s"`$attr`"))

  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => c(a).map(_ === lit(v))
    case EqualNullSafe(a, v) => c(a).map(_ <=> lit(v))
    case GreaterThan(a, v) => c(a).map(_ > lit(v))
    case GreaterThanOrEqual(a, v) => c(a).map(_ >= lit(v))
    case LessThan(a, v) => c(a).map(_ < lit(v))
    case LessThanOrEqual(a, v) => c(a).map(_ <= lit(v))
    case In(a, vs) => c(a).map(_.isin(vs.toIndexedSeq: _*))
    case IsNull(a) => c(a).map(_.isNull)
    case IsNotNull(a) => c(a).map(_.isNotNull)
    case StringStartsWith(a, v) => c(a).map(_.startsWith(v))
    case StringEndsWith(a, v) => c(a).map(_.endsWith(v))
    case StringContains(a, v) => c(a).map(_.contains(v))
    case And(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a && b
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) } yield a || b
    case Not(x) => toColumn(x).map(not)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  def toColumn(fs: Seq[Filter]): Option[Column] = {
    val cs = fs.map(toColumn)
    if (cs.isEmpty) Some(lit(true))
    else if (cs.exists(_.isEmpty)) None
    else Some(cs.flatten.reduce(_ && _))
  }
}

/** V1 filter → CATALYST expression, in the shapes the pruning machinery
  * ([[graft.ext.ManifestFileIndex]]'s zone/partition/bloom predicates)
  * understands — the lowering runtime group filters take to reach the
  * file-pruning indexes. PRUNING-safe, unlike [[FilterColumns]]'s exact
  * contract: an untranslatable filter is simply dropped (fewer filters
  * prune fewer files — conservative), so partial translation is fine
  * here and forbidden there. */
private[manifest] object FilterPruning {
  import org.apache.spark.sql.catalyst.{expressions => ce}

  private def ref(name: String, dt: org.apache.spark.sql.types.DataType)
      : ce.AttributeReference =
    ce.AttributeReference(name, dt, nullable = true)()

  def toExpr(f: Filter): Option[ce.Expression] = f match {
    case EqualTo(a, v) =>
      val l = ce.Literal(v); Some(ce.EqualTo(ref(a, l.dataType), l))
    case EqualNullSafe(a, v) =>
      val l = ce.Literal(v); Some(ce.EqualNullSafe(ref(a, l.dataType), l))
    case GreaterThan(a, v) =>
      val l = ce.Literal(v); Some(ce.GreaterThan(ref(a, l.dataType), l))
    case GreaterThanOrEqual(a, v) =>
      val l = ce.Literal(v); Some(ce.GreaterThanOrEqual(ref(a, l.dataType), l))
    case LessThan(a, v) =>
      val l = ce.Literal(v); Some(ce.LessThan(ref(a, l.dataType), l))
    case LessThanOrEqual(a, v) =>
      val l = ce.Literal(v); Some(ce.LessThanOrEqual(ref(a, l.dataType), l))
    case In(a, vs) if vs.nonEmpty =>
      val ls = vs.map(ce.Literal(_)).toIndexedSeq
      Some(ce.In(ref(a, ls.head.dataType), ls))
    case IsNull(a) =>
      Some(ce.IsNull(ref(a, org.apache.spark.sql.types.NullType)))
    case IsNotNull(a) =>
      Some(ce.IsNotNull(ref(a, org.apache.spark.sql.types.NullType)))
    case And(l, r) =>
      for { a <- toExpr(l); b <- toExpr(r) } yield ce.And(a, b)
    case Or(l, r) =>
      for { a <- toExpr(l); b <- toExpr(r) } yield ce.Or(a, b)
    case _ => None
  }
}

/** Shared resolution helpers for the catalog surface. */
private[manifest] object CatalogSupport {

  /** Can SQL DELETE on this snapshot retire whole files from manifest
    * metadata alone? True when the table records partition tuples and
    * the predicate references partition columns only — then
    * [[Manifests.dropPartitions]] classifies every file from the
    * recorded tuples and only boundary files pay a rewrite. */
  def partitionOnly(spark: SparkSession, base: String, v: Int,
      filters: Seq[Filter]): Boolean =
    Manifests.partitionedBy(spark, base, v).exists { case (pcols, _) =>
      val resolver = spark.sessionState.analyzer.resolver
      val refs = filters.flatMap(_.references)
      // IDENTITY sources only: metadata-only DML regions are EXACT
      // over the recorded tuples, and a predicate on a transform's
      // source (e.g. one day of a monthly table) addresses rows the
      // month tuple cannot delimit — those shapes keep the row-level
      // path instead of widening to the whole transform granule
      val exact = graft.ext.PartitionTransforms.identitySources(pcols)
      refs.nonEmpty && refs.forall(r => exact.exists(resolver(_, r)))
    }

  /** The EXACT tuple-domain form of a DML condition, when one exists —
    * what routes SQL DELETE to the metadata-only
    * [[Manifests.dropPartitions]] beyond identity specs: a predicate
    * on a TRANSFORM's source column translates whenever its satisfying
    * rows are a union of whole granules ([[graft.ext.PartField]]'s
    * exact lowering — boundary-ALIGNED ranges like
    * `ts < DATE '1995-01-01'` on a monthly table, singleton-granule
    * equality, null tests). Identity fields translate every ordinary
    * shape. EVERY leaf must translate (a dropped conjunct would widen
    * the delete); And/Or/Not compose exactly because unions of
    * granules are closed under them. None → the caller keeps the
    * row-level path. */
  def exactTuplePredicate(spark: SparkSession, base: String, v: Int,
      filters: Seq[Filter]): Option[Column] = {
    val pcols = Manifests.partitionedBy(spark, base, v)
      .map(_._1).getOrElse(return None)
    lowerExactFor(spark, base, v, pcols, filters)
  }

  /** [[exactTuplePredicate]] for each LEGACY spec group of `v` (after
    * a partition evolution): the same condition lowered under each
    * old spec's own fields, paired with that group's sidecar
    * segments. A group the condition is not aligned under is simply
    * omitted — its files stay unclassified and pay the boundary
    * rewrite, exactly as before. With these, a DELETE aligned under
    * BOTH eras (e.g. a year boundary on a monthly-evolved-to-daily
    * table) retires legacy files from metadata too instead of
    * rewriting them. */
  def exactHistoryPredicates(spark: SparkSession, base: String, v: Int,
      filters: Seq[Filter]): Seq[(Seq[String], Column)] =
    Manifests.partitionHistory(spark, base, v).flatMap {
      case (pcols, segs) =>
        lowerExactFor(spark, base, v, pcols, filters).map((segs, _))
    }

  private def lowerExactFor(spark: SparkSession, base: String, v: Int,
      pcols: Seq[String], filters: Seq[Filter]): Option[Column] = {
    val fields = graft.ext.PartitionTransforms.parseAll(pcols)
    val resolver = spark.sessionState.analyzer.resolver
    // tuples recorded under pre-UTC semantics cannot EXACTLY decide a
    // boundary predicate on a TZ-sensitive field (the session-TZ month
    // of a row near midnight may differ from the UTC lowering) — those
    // fields refuse here and the DML keeps the row-level path
    val tzTrusted =
      Manifests.partSemOf(spark, base, v) >= Manifests.PartSemCurrent
    import org.apache.spark.sql.catalyst.expressions.{Literal => CLit}
    def fieldsOf(a: String): Seq[graft.ext.PartField] =
      if (a.contains(".")) Seq.empty
      else fields.filter(f => resolver(f.source, a))
    def leaf(a: String, v0: Any,
        one: (graft.ext.PartField, CLit) => Option[Column]): Option[Column] =
      scala.util.Try(CLit(v0)).toOption.flatMap(l =>
        fieldsOf(a).iterator
          .filter(f => tzTrusted || !f.tzSensitive(l.dataType))
          .map(one(_, l)).collectFirst {
          case Some(c) => c })
    def go(f: Filter): Option[Column] = f match {
      case And(l, r) => for { a <- go(l); b <- go(r) } yield a && b
      case Or(l, r) => for { a <- go(l); b <- go(r) } yield a || b
      case Not(x) => go(x).map(not)
      case EqualTo(a, v0) => leaf(a, v0, _.exactEq(_))
      case EqualNullSafe(a, null) =>
        fieldsOf(a).iterator.map(_.exactIsNull)
          .collectFirst { case Some(c) => c }
      case EqualNullSafe(a, v0) =>
        // <=> with a non-null literal differs from === only on NULL
        // rows (FALSE vs NULL) — identical under "TRUE deletes, FALSE
        // and NULL survive", but NOT exact under NOT(...): refuse the
        // null-safe form inside negation by translating to the
        // two-valued <=> shape instead
        leaf(a, v0, (fld, l) => fld.exactEq(l).map(c =>
          c <=> lit(true)))
      case GreaterThan(a, v0) => leaf(a, v0, _.exactGt(_))
      case GreaterThanOrEqual(a, v0) => leaf(a, v0, _.exactGe(_))
      case LessThan(a, v0) => leaf(a, v0, _.exactLt(_))
      case LessThanOrEqual(a, v0) => leaf(a, v0, _.exactLe(_))
      case In(a, vs) if vs.nonEmpty && vs.length <= 1000 =>
        val cs = vs.toSeq.map(v0 =>
          if (v0 == null) None else leaf(a, v0, _.exactEq(_)))
        if (cs.exists(_.isEmpty)) None
        else Some(cs.flatten.reduce(_ || _))
      case IsNull(a) =>
        fieldsOf(a).iterator.map(_.exactIsNull)
          .collectFirst { case Some(c) => c }
      case IsNotNull(a) =>
        fieldsOf(a).iterator.map(_.exactIsNotNull)
          .collectFirst { case Some(c) => c }
      case AlwaysFalse() => Some(lit(false))
      // any OTHER shape (StringStartsWith, …) stays exact as long as
      // every referenced column is an IDENTITY partition source — the
      // tuple column IS the source column there, so the plain V1
      // translation applies verbatim (the pre-r17 partitionOnly
      // surface, preserved)
      case other =>
        val identity =
          graft.ext.PartitionTransforms.identitySources(pcols)
        val refs = other.references
        if (refs.nonEmpty && refs.forall(r =>
            !r.contains(".") && identity.exists(resolver(_, r))))
          FilterColumns.toColumn(other)
        else None
    }
    val cs = filters.map(go)
    if (cs.isEmpty || cs.exists(_.isEmpty)) None
    else Some(cs.flatten.reduce(_ && _))
  }
}
