package graft.ext

import java.sql.Timestamp

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("as-of semantics: latest right row at-or-before each left row, per key") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq(
      (1L, ts(0), "l0"), // before any right row
      (1L, ts(10), "l1"), // exactly at r@10 -> matches it
      (1L, ts(25), "l2"), // between r@10 and r@30 -> r@10
      (1L, ts(45), "l3"), // after r@30 -> r@30
      (2L, ts(50), "l4")  // other key, no right rows -> null
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts(10), 10.0),
      (1L, ts(30), 30.0)
    ).toDF("k", "ts", "v")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts")
      .collect().map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out === Map(
      "l0" -> None, "l1" -> Some(10.0), "l2" -> Some(10.0),
      "l3" -> Some(30.0), "l4" -> None))
  }

  test("a most-recent right row with NULL payload wins (no resurrection of older values)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, ts(40), "l")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts(10), Some(10.0)),
      (1L, ts(30), None: Option[Double]) // most recent, but payload NULL
    ).toDF("k", "ts", "v")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts").collect()
    // DuckDB ASOF returns the ts(30) row -> v is NULL, not the older 10.0
    assert(out.length === 1 && out.head.isNullAt(3),
      s"expected NULL payload from the most recent right row, got ${out.head}")
  }

  test("no future leak: right rows strictly after every left row never match") {
    val spark = TestSpark.spark
    import spark.implicits._
    val left = Seq((1L, ts(0), "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts(1), 1.0)).toDF("k", "ts", "v")
    val out = AsOfJoin.asofJoin(left, right, "k", "ts").collect()
    assert(out.length === 1 && out.head.isNullAt(3))
  }
}
