package graft.ext

/** Equi-height histograms as MERGEABLE state — the fold that keeps the
  * `_hist` sidecar sharp across appends the way the KMV sketch keeps
  * NDV honest ([[Manifests.appendWrittenFiles]]): an append computes a
  * histogram over ITS OWN rows only (cost ∝ batch) and folds it into
  * the inherited one here, driver-side, O(bins). The anchor
  * (`_histrows`) advances with the fold, so the freshness damp stays
  * at 1 and per-value pricing survives table growth without a
  * re-ANALYZE — the damp remains only for the shapes no fold can see
  * (deletes, `graft.hist.incremental=false`).
  *
  * Each histogram is read as a piecewise-uniform distribution: a
  * zero-width bin is a POINT MASS (a heavy hitter the quantile sketch
  * pinned — exactly the value whose pricing must survive). The merge
  * cuts the combined mass function at the B equi-height quantiles and
  * folds each input's NDV into the output bins overlap-weighted.
  * Estimates throughout (overlapping distinct sets cannot be
  * reconciled from counts), in the tolerance class CBO histograms
  * already live in. */
object HistogramMerge {

  /** Merge histogram `b` into `a` (same bin count): (height, bins) as
    * stored in `_hist` — height = rows/bin, bins = (lo, hi, ndv). */
  def merge(a: (Double, Seq[(Double, Double, Long)]),
      b: (Double, Seq[(Double, Double, Long)]))
      : (Double, Seq[(Double, Double, Long)]) = {
    val nBins = a._2.size
    require(b._2.size == nBins,
      s"cannot merge histograms of ${a._2.size} and ${b._2.size} bins")
    final case class Seg(lo: Double, hi: Double, rows: Double, ndv: Double)
    def segsOf(h: (Double, Seq[(Double, Double, Long)])): Seq[Seg] =
      h._2.map { case (lo, hi, ndv) => Seg(lo, hi, h._1, ndv.toDouble) }
    val segs = (segsOf(a) ++ segsOf(b)).filter(_.rows > 0)
    if (segs.isEmpty) return a
    val total = segs.map(_.rows).sum
    val xMin = segs.map(_.lo).min
    val xMax = segs.map(_.hi).max
    // combined cumulative mass: interval segments contribute linearly,
    // point masses jump the moment x reaches them
    def massUpTo(x: Double): Double = segs.iterator.map { s =>
      if (s.hi <= s.lo) { if (x >= s.lo) s.rows else 0.0 }
      else s.rows * math.min(1.0, math.max(0.0, (x - s.lo) / (s.hi - s.lo)))
    }.sum
    // place the B-1 interior cuts at the equi-height quantiles by
    // bisection (the CDF is monotone; jumps converge onto their point)
    def cutAt(target: Double): Double = {
      var lo = xMin
      var hi = xMax
      var i = 0
      while (i < 64 && hi - lo > 0) {
        val mid = lo / 2 + hi / 2
        if (massUpTo(mid) >= target) hi = mid else lo = mid
        i += 1
      }
      hi
    }
    val cuts = xMin +:
      (1 until nBins).map(j => cutAt(total * j / nBins)) :+ xMax
    def ndvIn(lo: Double, hi: Double): Long = {
      // a zero-width output bin holds exactly ONE value by definition
      if (hi <= lo) return 1L
      // point masses at the SAME x are the SAME value — fold them by
      // max per x, never sum (a hot key arrives as dozens of identical
      // point bins; summing would re-dilute exactly the value the
      // merge must keep sharp)
      val points = segs.filter(s =>
          s.hi <= s.lo && s.lo >= lo && s.lo <= hi)
        .groupBy(_.lo).map { case (_, ss) => ss.map(_.ndv).max }.sum
      val intervals = segs.iterator.filter(s => s.hi > s.lo).map { s =>
        val ov = math.min(hi, s.hi) - math.max(lo, s.lo)
        if (ov <= 0) 0.0 else s.ndv * ov / (s.hi - s.lo)
      }.sum
      math.max(1L, math.ceil(points + intervals).toLong)
    }
    (total / nBins,
      (0 until nBins).map(j =>
        (cuts(j), cuts(j + 1), ndvIn(cuts(j), cuts(j + 1)))))
  }
}
