package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class MvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("incremental MV equals the full recompute, cell for cell") {
    val inc = Mv.monthlySalesViaMv(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val full = Quality.monthlySales(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(inc.nonEmpty)
    assert(inc.toSeq === full.toSeq)
  }

  test("hash split partitions the fact table: batch counts sum to the whole") {
    val batches = Mv.writeBatches(spark, sf)
    assert(batches.size === Mv.nBatches)
    val counts = batches.map(p => spark.read.parquet(p).count())
    assert(counts.forall(_ > 0), s"degenerate split: $counts")
    assert(counts.sum === Warehouse(spark, sf).fact.count())
  }
}
