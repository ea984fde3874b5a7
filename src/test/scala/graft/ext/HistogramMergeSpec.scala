package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function properties of the histogram fold ([[HistogramMerge]])
  * — the invariants the CBO pricing depends on, checked without a
  * Spark session: mass conservation, bin-count stability, hot-key
  * point-mass preservation (the failure mode that motivated the
  * max-per-value NDV fold), and monotone boundaries. */
class HistogramMergeSpec extends AnyFunSuite {

  private def uniform(lo: Double, hi: Double, bins: Int, rows: Double,
      ndvPerBin: Long): (Double, Seq[(Double, Double, Long)]) = {
    val w = (hi - lo) / bins
    (rows / bins,
      (0 until bins).map(i => (lo + i * w, lo + (i + 1) * w, ndvPerBin)))
  }

  private def pointMass(x: Double, bins: Int, rows: Double)
      : (Double, Seq[(Double, Double, Long)]) =
    (rows / bins, (0 until bins).map(_ => (x, x, 1L)))

  test("mass conservation and bin count: merged height*bins = total rows") {
    val a = uniform(0, 100, 8, 800, 5)
    val b = uniform(50, 150, 8, 400, 3)
    val (h, bins) = HistogramMerge.merge(a, b)
    assert(bins.size === 8)
    assert(math.abs(h * 8 - 1200.0) < 1e-6)
    // boundaries monotone non-decreasing, spanning the union range
    assert(bins.head._1 === 0.0 && bins.last._2 === 150.0)
    bins.sliding(2).foreach { case Seq(x, y) =>
      assert(x._2 <= y._1 + 1e-9) }
  }

  test("a dominant point mass survives as zero-width bins with ndv=1 — never re-diluted by summing identical point bins") {
    // 10k uniform rows, then fold in 30k rows ALL at value 42 (the
    // batch histogram arrives as 8 identical point bins)
    val a = uniform(0, 100, 8, 10000, 10)
    val b = pointMass(42.0, 8, 30000)
    val (h, bins) = HistogramMerge.merge(a, b)
    val hot = bins.filter(bn => bn._1 == 42.0 && bn._2 == 42.0)
    // 75% of the mass sits at 42 -> ~6 of 8 bins collapse onto it
    assert(hot.size >= 5, s"hot value lost its bins: $bins")
    assert(hot.forall(_._3 === 1L),
      s"zero-width bins must price as ONE value: $bins")
    // equality mass at 42 ~= hot.size * height ~= 30000
    val mass42 = hot.size * h
    assert(mass42 > 20000 && mass42 < 40000, s"hot mass $mass42")
  }

  test("repeated folds stay sharp: three appends of a new hot key shift the shape monotonically") {
    var cur = uniform(0, 200, 16, 20000, 12)
    (1 to 3).foreach { _ =>
      cur = HistogramMerge.merge(cur, pointMass(150.0, 16, 20000))
    }
    val (h, bins) = cur
    assert(math.abs(h * 16 - 80000.0) < 1e-3)
    val hot = bins.filter(bn => bn._1 == 150.0 && bn._2 == 150.0)
    // 60k of 80k rows at the hot key -> ~12 of 16 bins
    assert(hot.size >= 10, s"folded hot key under-represented: $bins")
    assert(hot.forall(_._3 === 1L))
  }

  test("merging disjoint uniforms keeps interval NDV roughly additive, never below 1") {
    val a = uniform(0, 100, 4, 1000, 25) // 100 distinct in [0,100)
    val b = uniform(100, 200, 4, 1000, 25) // 100 distinct in [100,200)
    val (_, bins) = HistogramMerge.merge(a, b)
    assert(bins.forall(_._3 >= 1L))
    val totalNdv = bins.map(_._3).sum
    assert(totalNdv >= 150 && totalNdv <= 260,
      s"disjoint NDV fold drifted: $totalNdv ($bins)")
  }

  test("mismatched bin counts refuse") {
    intercept[IllegalArgumentException] {
      HistogramMerge.merge(uniform(0, 10, 4, 100, 2),
        uniform(0, 10, 8, 100, 2))
    }
  }
}
