package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Golden cardinalities at sf0.001 — the fixture analogue of the
  * reference README's pinned expected values (541,909 → 534,123 rows,
  * dim sizes; `README.md:163-170`). Any semantic drift in the staging
  * injection, cleaning chain, or dim builds shows up here before it
  * reaches the oracle gate. */
class GoldenSpec extends AnyFunSuite {
  private lazy val wh = Warehouse(TestSpark.spark, TestSpark.sf)

  test("pinned stage cardinalities at sf0.001") {
    assert(wh.staging.count() === 6063L)
    assert(wh.cleaned.count() === 5694L)
    assert(wh.fact.count() === 5694L)
  }

  test("pinned dimension cardinalities at sf0.001") {
    assert(wh.dimProduct.count() === 200L)
    assert(wh.dimCustomer.count() === 151L) // 150 customers + UNKNOWN sentinel
    assert(wh.dimDate.count() === 1080L)
  }

  test("pinned retention ratio clears the Q1 gate with margin") {
    val retention = wh.cleaned.count().toDouble / wh.staging.count()
    assert(retention > 0.90 && retention < 1.0)
  }
}
