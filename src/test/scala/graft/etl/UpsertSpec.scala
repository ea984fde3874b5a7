package graft.etl

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class UpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dim(rows: (String, String)*) = {
    val spark = TestSpark.spark
    import spark.implicits._
    rows.toSeq.toDF("k", "v")
  }

  test("upsertDoUpdate: incoming wins on collision, existing survives otherwise (K2)") {
    val merged = Transform.upsertDoUpdate(
      dim("a" -> "old", "b" -> "old"), dim("b" -> "new", "c" -> "new"), "k")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(merged === Map("a" -> "old", "b" -> "new", "c" -> "new"))
  }

  test("upsertDoNothing: existing wins on collision, incoming fills gaps (K3)") {
    val merged = Transform.upsertDoNothing(
      dim("a" -> "old", "b" -> "old"), dim("b" -> "new", "c" -> "new"), "k")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(merged === Map("a" -> "old", "b" -> "old", "c" -> "new"))
  }

  test("upserting a dim with itself is a no-op (idempotent refresh)") {
    val wh = Warehouse(spark, TestSpark.sf)
    val dimP = wh.dimProduct
    assert(Transform.upsertDoUpdate(dimP, dimP, "stock_code").count() === dimP.count())
    assert(Transform.upsertDoNothing(dimP, dimP, "stock_code").count() === dimP.count())
  }
}
