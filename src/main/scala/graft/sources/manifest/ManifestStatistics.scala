package graft.sources.manifest

import java.util.OptionalLong

import graft.ext.{Dfs, Manifests}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.Statistics
import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
import org.apache.spark.sql.types.StructType

/** DSv2 statistics from manifest metadata alone — the
  * `SupportsReportStatistics` answer for every catalog read path.
  *
  * What the planner learns, and where it comes from (zero data-file
  * opens — the counting-FS spec pins it):
  *
  *  - `sizeInBytes`: the byte total of exactly the files the scan will
  *    plan — the PRUNED listing (partition tuples, zone maps, blooms
  *    applied to the pushed filters), not the whole table — scaled by
  *    `spark.sql.sources.fileCompressionFactor` like Spark's own file
  *    scans. On a vectored version each file's bytes scale by its LIVE
  *    fraction, so a merge-on-read delete of 90% of a dim shrinks the
  *    estimate it joins under.
  *  - `numRows`: exact live cardinality when provable — Σ per-file
  *    `n_rows` from the covered zone-stats sidecar over the pruned
  *    files, minus per-file deletion-vector cardinalities (the bitmap
  *    index the columnar scan already holds). Absent when a pruned
  *    file lacks a stats row; pushed row-level filters make it an
  *    upper bound, which estimation treats conservatively.
  *  - `columnStats`: per-column min/max (zone-bound fold,
  *    Catalyst-internal values), null counts (Σ per-file nulls) and
  *    NDV (the ANALYZE-time `_ndv` estimates, [[Manifests.ndvOf]],
  *    kept current across appends by the KMV sketch fold). Filtered
  *    scans get BOUNDS over their pruned file set (min/max zone folds,
  *    NDV clamped by the subset's raw rows) — valid, conservatively
  *    absent wherever a pruned file lacks its stats row.
  *
  * Why it matters: without this, a DSv2 relation that cannot report
  * falls back to `spark.sql.defaultSizeInBytes` (= Long.MaxValue) and
  * a small dim can NEVER auto-broadcast — the exact fate of the V1
  * detour scan (live renames, bitmap budget) before this round. The
  * columnar path reported file bytes only; now both paths serve the
  * same manifest-tier numbers, DV-adjusted, with row counts and column
  * stats when the sidecars carry them.
  *
  * Everything here is driver-side metadata arithmetic over sidecar
  * frames the planning path already memoizes ([[graft.ext.SidecarCache]],
  * the DV bitmap cache) — a plan-time cost of O(files-in-version)
  * string/long folds, no job, no footer, no data open. */
/** Marker for the manifest V1 DETOUR scans that carry their own
  * statistics — the handle
  * [[org.apache.spark.sql.graft.ManifestV1StatsRule]] keys on to
  * restore estimates `V1ScanWrapper` would otherwise swallow. */
trait ManifestReportingV1Scan

private[manifest] object ManifestStats {

  def estimate(spark: SparkSession, idx: ManifestScanIndex,
      deleted: Map[String, Long],
      partFilters: Seq[Expression], dataFilters: Seq[Expression],
      output: StructType): Statistics = {

    // the PRUNED file listing — the same partition/zone/bloom pruning
    // the scan itself plans over, so a selective query's estimate
    // reflects what it will actually read. `deleted` is the scan's
    // per-file DV cardinality fold ([[DvParquetScan.deletedCardinalities]])
    val pruned: Seq[(String, Long)] =
      idx.listFiles(partFilters, dataFilters).flatMap(_.files)
        .map(f => (Dfs.canonical(f.getPath.toString), f.getLen))

    val rowCounts: Option[Map[String, Long]] =
      idx.innerIndex.flatMap(_.rowCountsByFile)

    // numRows is the EXACT channel — serve it only when the proof is
    // exact: unfiltered scans fold live counts over the (whole) pruned
    // listing; filtered scans demand the partition-PURITY proof
    // (liveRowCountWhere: every conjunct strictly translatable over
    // the recorded tuples, every file pure under it). A zone-pruned
    // upper bound used to flow through here as if exact — for a
    // selective non-partition filter that can overstate cardinality by
    // orders of magnitude into downstream join estimation, so it now
    // stays absent and only sizeInBytes (allowed to be a bound) talks.
    val exactRows: Option[Long] =
      if (partFilters.isEmpty && dataFilters.isEmpty)
        rowCounts.flatMap { rc =>
          if (pruned.forall { case (f, _) => rc.contains(f) })
            Some(pruned.iterator.map { case (f, _) =>
              math.max(0L, rc(f) - deleted.getOrElse(f, 0L)) }.sum)
          else None
        }
      else if (partFilters.isEmpty)
        idx.innerIndex.flatMap(_.liveRowCountWhere(dataFilters, deleted))
      else None

    // vectored files count their live fraction of bytes; a file whose
    // row count is unknown keeps its full length (conservative: an
    // over-estimate can only withhold a broadcast, never force one)
    def liveBytesOf(fs: Seq[(String, Long)]): Long =
      fs.iterator.map { case (f, len) =>
        val del = deleted.getOrElse(f, 0L)
        rowCounts.flatMap(_.get(f)) match {
          case Some(t) if t > 0 && del > 0 =>
            math.ceil(len.toDouble * math.max(0L, t - del) / t).toLong
          case _ => len
        }
      }.sum
    val liveBytes: Long = liveBytesOf(pruned)
    // the UNPRUNED live byte total — the base the histogram's
    // selectivity legitimately applies to. File pruning and the
    // histogram price the SAME predicate; multiplying the pruned bytes
    // by its selectivity again would square it (an underestimate in
    // the direction that wrongly forces a broadcast), so the estimate
    // below takes min(pruned bytes, all bytes × selectivity): both are
    // valid sizes for the filtered scan, and whichever signal is
    // sharper wins without ever compounding.
    val liveBytesAll: Long =
      if (dataFilters.isEmpty) liveBytes
      else liveBytesOf(idx.allFiles().map(f =>
        (Dfs.canonical(f.getPath.toString), f.getLen)))
    val factor = spark.sessionState.conf.fileCompressionFactor
    // HISTOGRAM selectivity on the byte estimate: equality/range
    // conjuncts on ANALYZE'd-histogram columns scale `sizeInBytes` by
    // the per-VALUE selectivity the equi-height bins price — the
    // differentiation uniform NDV cannot make (a 95%-hot key scales by
    // ~0.95, a rare key by ~1/rows), which is what lets a selectively
    // filtered dim auto-broadcast and stops a hot-key filter from
    // masquerading as one. Untranslatable conjuncts contribute 1
    // (the estimate only tightens where the histogram can price);
    // tables with no histogram are byte-identical to before.
    val hists0 = idx.versionOpt
      .map(v => Manifests.histOf(spark, idx.basePath, v))
      .getOrElse(Map.empty)
    // PARTITION SOURCES are excluded from the histogram scaling: the
    // pruned listing above already removed their files exactly, and
    // scaling the surviving bytes by the same predicate's selectivity
    // would square it — an underestimate in the dangerous direction
    // (it could force a broadcast). Only columns partition pruning
    // cannot see keep their histogram conjuncts.
    val partSrcs = idx.versionOpt
      .flatMap(v => Manifests.partitionedBy(spark, idx.basePath, v))
      .map(m => graft.ext.PartitionTransforms.sources(m._1))
      .getOrElse(Seq.empty)
    val resolver0 = spark.sessionState.analyzer.resolver
    val hists = hists0.filter { case (c, _) =>
      !partSrcs.exists(resolver0(_, c)) }
    // HISTOGRAM FRESHNESS: the sidecar records the live rows the
    // histogram was built over; as appends/deletes move the table away
    // from that anchor the per-value frequencies go stale, so the
    // selectivity damps linearly toward 1 (no tightening) with the
    // row-count divergence — a histogram built at 1M rows prices a hot
    // key at half weight once the table doubles, and not at all past
    // heavy churn. Re-ANALYZE restores full sharpness. Pre-freshness
    // tables (no anchor) serve undamped, exactly as before.
    val fresh: Double = (for {
      n0 <- idx.versionOpt
        .flatMap(v => Manifests.histRowsOf(spark, idx.basePath, v))
      raw <- idx.innerIndex.flatMap(_.exactRowCount)
    } yield {
      val now = math.max(0L, raw - deleted.values.sum)
      if (n0 <= 0 || now <= 0) 1.0
      else math.min(n0, now).toDouble / math.max(n0, now)
    }).getOrElse(1.0)
    val sel: Double =
      if (hists.isEmpty || dataFilters.isEmpty) 1.0
      else {
        val s = HistogramSelectivity.of(dataFilters, hists, resolver0)
        s * fresh + (1.0 - fresh)
      }
    val sizeOut = math.max(1L, math.min(liveBytes * factor,
      liveBytesAll * factor * sel).toLong)

    // column statistics: exact-channel values on the whole-version
    // shape; under pushed filters, BOUNDS over the PRUNED file set —
    // every surviving row lives in a pruned file whose zone bounds are
    // exact, so min/max folded over just those stats rows are valid
    // (possibly loose) bounds for the filtered output, and NDV clamps
    // to min(table NDV, pruned raw rows). Null counts stay absent under
    // filters (survivor nulls are unknowable from zones). Conservative
    // absence everywhere a pruned file lacks its stats row.
    // A badly stale histogram (rows diverged >2× from the ANALYZE
    // anchor) is withheld from the CBO entirely — its per-bin shape no
    // longer describes the table.
    val serveHist = fresh >= 0.5
    val colStats: java.util.Map[NamedReference, ColumnStatistics] =
      if (partFilters.nonEmpty || dataFilters.nonEmpty)
        prunedColumnStats(spark, idx, output, pruned.map(_._1).toSet,
          serveHist)
      else columnStats(spark, idx, output, exactRows,
        vectored = deleted.nonEmpty, serveHist)

    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(sizeOut)
      override def numRows(): OptionalLong =
        exactRows.fold(OptionalLong.empty())(OptionalLong.of)
      override def columnStats()
          : java.util.Map[NamedReference, ColumnStatistics] = colStats
    }
  }

  /** Statistics for the V1 detour scan (live renames / bitmap budget
    * blown): no pruning hooks there, so the whole-version numbers —
    * still transformative, because a V1Scan that reports nothing plans
    * at `defaultSizeInBytes` = Long.MaxValue and can never broadcast.
    * `numRows` only when the version carries no vectors (the sidecar
    * count would need the bitmaps the budget just refused); bytes stay
    * the raw total then — an upper bound, conservative by the same
    * argument as above. */
  def estimateDetour(spark: SparkSession, base: String, v: Int,
      output: StructType): Statistics = {
    val idx = new ManifestScanIndex(spark, base, Some(v))
    val hasDvs = Manifests.dvFiles(spark, base, v).nonEmpty
    val bytes = idx.sizeInBytes
    val factor = spark.sessionState.conf.fileCompressionFactor
    val rows: Option[Long] =
      if (hasDvs) None
      else idx.innerIndex.flatMap(_.exactRowCount)
    new Statistics {
      override def sizeInBytes(): OptionalLong =
        OptionalLong.of(math.max(1L, (bytes * factor).toLong))
      override def numRows(): OptionalLong =
        rows.fold(OptionalLong.empty())(OptionalLong.of)
    }
  }

  /** Column statistics for a FILTERED scan, bounded over its pruned
    * file listing (canonical paths): zone-fold min/max via
    * [[graft.ext.ManifestFileIndex.statBoundOver]], NDV = the ANALYZE
    * estimate clamped by the subset's raw-row upper bound. Every value
    * is a valid bound for the filtered output; null counts are not
    * (survivors unknown) and stay absent. */
  private def prunedColumnStats(spark: SparkSession,
      idx: ManifestScanIndex, output: StructType,
      prunedFiles: Set[String], serveHist: Boolean)
      : java.util.Map[NamedReference, ColumnStatistics] = {
    val out = new java.util.HashMap[NamedReference, ColumnStatistics]()
    val inner = idx.innerIndex.getOrElse(return out)
    val ndv: Map[String, Long] = idx.versionOpt
      .map(v => Manifests.ndvOf(spark, idx.basePath, v))
      .getOrElse(Map.empty)
    // ONE collect of the memoized stats rows, pure driver folds per
    // column after it — statistics run at plan time, so this path
    // must never cost a job
    val rows = inner.statRowsOver(prunedFiles).getOrElse(return out)
    val rowCap: Long = inner.rawRowsOver(rows)
    val hists =
      if (!serveHist) Map.empty[String, (Double, Seq[(Double, Double, Long)])]
      else idx.versionOpt
        .map(v => Manifests.histOf(spark, idx.basePath, v))
        .getOrElse(Map.empty)
    val resolver = spark.sessionState.analyzer.resolver
    output.fields.foreach { f =>
      val conv = CatalystTypeConverters.createToCatalystConverter(f.dataType)
      val minV = inner.statBoundOver(rows, f.name, isMin = true)
        .flatten.map(conv)
      val maxV = inner.statBoundOver(rows, f.name, isMin = false)
        .flatten.map(conv)
      val ndvHit = ndv.collectFirst {
        case (c, n) if resolver(c, f.name) => math.min(n, rowCap) }
      // the TABLE-level histogram is a valid approximation over any
      // pruned subset (pruning only removes rows; per-value skew shape
      // survives) — serving it lets Spark's own FilterEstimation price
      // the residual filter above the scan
      val histHit = hists.collectFirst {
        case (c, h) if resolver(c, f.name) => h }
      if (minV.isDefined || maxV.isDefined || ndvHit.isDefined ||
          histHit.isDefined)
        out.put(Expressions.column(f.name), new ColumnStatistics {
          override def distinctCount(): OptionalLong =
            ndvHit.fold(OptionalLong.empty())(OptionalLong.of)
          override def min(): java.util.Optional[Object] =
            java.util.Optional.ofNullable(
              minV.map(_.asInstanceOf[Object]).orNull)
          override def max(): java.util.Optional[Object] =
            java.util.Optional.ofNullable(
              maxV.map(_.asInstanceOf[Object]).orNull)
          override def histogram(): java.util.Optional[
              org.apache.spark.sql.connector.read.colstats.Histogram] =
            java.util.Optional.ofNullable(
              histHit.map(connectorHist).orNull)
        })
    }
    out
  }

  /** A recorded histogram as the connector shape — Spark's
    * `transformV2Stats` converts it to the catalyst `Histogram` the
    * CBO estimators consume (`FilterEstimation`'s per-bin equality
    * and range math). */
  private def connectorHist(h: (Double, Seq[(Double, Double, Long)]))
      : org.apache.spark.sql.connector.read.colstats.Histogram =
    new org.apache.spark.sql.connector.read.colstats.Histogram {
      override def height(): Double = h._1
      override def bins(): Array[
          org.apache.spark.sql.connector.read.colstats.HistogramBin] =
        h._2.map { case (binLo, binHi, binNdv) =>
          new org.apache.spark.sql.connector.read.colstats.HistogramBin {
            override def lo(): Double = binLo
            override def hi(): Double = binHi
            override def ndv(): Long = binNdv
          }: org.apache.spark.sql.connector.read.colstats.HistogramBin
        }.toArray
    }

  private def columnStats(spark: SparkSession, idx: ManifestScanIndex,
      output: StructType, tableRows: Option[Long], vectored: Boolean,
      serveHist: Boolean)
      : java.util.Map[NamedReference, ColumnStatistics] = {
    val out = new java.util.HashMap[NamedReference, ColumnStatistics]()
    val inner = idx.innerIndex.getOrElse(return out)
    val keys = inner.coveredStats.map(_._1).getOrElse(return out)
    val ndv: Map[String, Long] = idx.versionOpt
      .map(v => Manifests.ndvOf(spark, idx.basePath, v))
      .getOrElse(Map.empty)
    val hists =
      if (!serveHist) Map.empty[String, (Double, Seq[(Double, Double, Long)])]
      else idx.versionOpt
        .map(v => Manifests.histOf(spark, idx.basePath, v))
        .getOrElse(Map.empty)
    val resolver = spark.sessionState.analyzer.resolver
    output.fields.foreach { f =>
      val indexed = keys.exists(k => resolver(k, f.name))
      val ndvHit = ndv.collectFirst {
        case (c, n) if resolver(c, f.name) => n }
      val histHit = hists.collectFirst {
        case (c, h) if resolver(c, f.name) => h }
      if (indexed || ndvHit.isDefined || histHit.isDefined) {
        // zone bounds come back as external JVM values (sidecar
        // collect); ColumnStat stores Catalyst-internal ones — convert
        // (UTF8String for strings, days/micros for date/timestamp)
        val conv = CatalystTypeConverters.createToCatalystConverter(f.dataType)
        val minV: Option[Any] =
          if (!indexed) None
          else inner.statBound(f.name, isMin = true).flatten.map(conv)
        val maxV: Option[Any] =
          if (!indexed) None
          else inner.statBound(f.name, isMin = false).flatten.map(conv)
        // null counts only on CLEAN versions: the sidecar's non-null
        // counts are RAW (pre-vector), so live-rows − raw-non-null
        // UNDERcounts live nulls whenever vectors removed non-null
        // rows (clamping to 0 — the opposite of conservative). Zone
        // min/max stay valid on vectored versions (bounds only widen
        // over deleted rows) and NDV is an estimate by contract.
        val nulls: Option[Long] =
          if (!indexed || vectored) None
          else for {
            total <- tableRows
            nonNull <- inner.statNonNullCount(f.name)
          } yield math.max(0L, total - nonNull)
        out.put(Expressions.column(f.name), new ColumnStatistics {
          override def distinctCount(): OptionalLong =
            ndvHit.fold(OptionalLong.empty())(OptionalLong.of)
          override def min(): java.util.Optional[Object] =
            java.util.Optional.ofNullable(
              minV.map(_.asInstanceOf[Object]).orNull)
          override def max(): java.util.Optional[Object] =
            java.util.Optional.ofNullable(
              maxV.map(_.asInstanceOf[Object]).orNull)
          override def nullCount(): OptionalLong =
            nulls.fold(OptionalLong.empty())(OptionalLong.of)
          override def histogram(): java.util.Optional[
              org.apache.spark.sql.connector.read.colstats.Histogram] =
            java.util.Optional.ofNullable(
              histHit.map(connectorHist).orNull)
        })
      }
    }
    out
  }
}

/** Selectivity of pushed-down conjuncts over recorded equi-height
  * histograms — the driver-side pricing behind the filtered
  * `sizeInBytes` estimate. Mirrors `FilterEstimation`'s per-bin math:
  * equality sums `height / ndv` over the bins that can hold the value
  * (a hot value occupies many single-value bins and prices near its
  * true frequency); ranges sum linear overlap fractions. Conjuncts
  * combine multiplicatively; anything untranslatable contributes 1
  * (never tightens), so the result is an estimate exactly as
  * trustworthy as the histogram itself. */
private[manifest] object HistogramSelectivity {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._

  private def litDouble(l: Literal): Option[Double] = l.dataType match {
    case ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | _: DecimalType =>
      Option(l.value).flatMap {
        case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
        case n: Number => Some(n.doubleValue())
        case _ => None
      }
    case DateType => Option(l.value).map(_.asInstanceOf[Int].toDouble)
    case TimestampType | TimestampNTZType =>
      Option(l.value).map(_.asInstanceOf[Long].toDouble)
    case _ => None
  }

  private def total(h: (Double, Seq[(Double, Double, Long)])): Double =
    math.max(1e-9, h._1 * h._2.size)

  private def eqSel(h: (Double, Seq[(Double, Double, Long)]),
      v: Double): Double = {
    val hit = h._2.iterator.filter { case (lo, hi, _) => lo <= v && v <= hi }
      .map { case (_, _, ndv) => h._1 / math.max(1L, ndv) }.sum
    math.min(1.0, math.max(hit, 1.0) / total(h)) // floor: one row
  }

  private def rangeSel(h: (Double, Seq[(Double, Double, Long)]),
      lo: Option[Double], hi: Option[Double]): Double = {
    val s = h._2.iterator.map { case (blo, bhi, _) =>
      val a = lo.getOrElse(Double.NegativeInfinity)
      val b = hi.getOrElse(Double.PositiveInfinity)
      val frac =
        if (bhi < a || blo > b) 0.0
        else if (bhi == blo) 1.0
        else math.min(1.0, math.max(0.0,
          (math.min(bhi, b) - math.max(blo, a)) / (bhi - blo)))
      h._1 * frac
    }.sum
    math.min(1.0, math.max(s, 1.0) / total(h))
  }

  def of(filters: Seq[Expression],
      hists: Map[String, (Double, Seq[(Double, Double, Long)])],
      resolver: (String, String) => Boolean): Double = {
    def histFor(a: AttributeReference) =
      hists.collectFirst { case (c, h) if resolver(c, a.name) => h }
    def selOf(e: Expression): Double = e match {
      case And(l, r) => selOf(l) * selOf(r)
      case EqualTo(a: AttributeReference, l: Literal) =>
        histFor(a).flatMap(h => litDouble(l).map(eqSel(h, _))).getOrElse(1.0)
      case EqualTo(l: Literal, a: AttributeReference) =>
        selOf(EqualTo(a, l))
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.size <= 64 &&
            vs.forall(_.isInstanceOf[Literal]) =>
        histFor(a).map { h =>
          val ds = vs.flatMap(v => litDouble(v.asInstanceOf[Literal]))
          if (ds.size < vs.size) 1.0
          else math.min(1.0, ds.map(eqSel(h, _)).sum)
        }.getOrElse(1.0)
      case GreaterThan(a: AttributeReference, l: Literal) =>
        histFor(a).flatMap(h => litDouble(l)
          .map(v => rangeSel(h, Some(v), None))).getOrElse(1.0)
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        selOf(GreaterThan(a, l))
      case LessThan(a: AttributeReference, l: Literal) =>
        histFor(a).flatMap(h => litDouble(l)
          .map(v => rangeSel(h, None, Some(v)))).getOrElse(1.0)
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        selOf(LessThan(a, l))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        selOf(LessThan(a, l))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        selOf(LessThanOrEqual(a, l))
      case LessThan(l: Literal, a: AttributeReference) =>
        selOf(GreaterThan(a, l))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        selOf(GreaterThanOrEqual(a, l))
      case _ => 1.0
    }
    math.max(1e-6, filters.map(selOf).product)
  }
}
