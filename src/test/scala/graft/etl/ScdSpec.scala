package graft.etl

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("partHistory: intervals tile each key's timeline without overlap") {
    val rows = Scd.partHistory(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("part_key")).foreach { case (k, rs) =>
      val byV = rs.sortBy(_.getAs[Int]("version"))
      // versions are dense 1..n
      assert(byV.map(_.getAs[Int]("version")).toSeq === (1 to byV.length), s"key $k")
      // each interval's exclusive end is the next interval's start
      byV.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Date]("valid_to") ===
            b.getAs[java.sql.Date]("valid_from"), s"key $k gap/overlap")
        case _ =>
      }
      // exactly one current row per key, and it is the last version
      val current = byV.filter(_.getAs[Int]("is_current") === 1)
      assert(current.length === 1 && (current.head eq byV.last), s"key $k current")
      assert(byV.init.forall(_.getAs[java.sql.Date]("valid_to") != null))
    }
  }

  test("partHistory: adjacent runs always differ in attr (maximal compression)") {
    val rows = Scd.partHistory(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("part_key")).foreach { case (k, rs) =>
      val attrs = rs.sortBy(_.getAs[Int]("version")).map(_.getAs[String]("attr"))
      attrs.sliding(2).foreach {
        case Array(a, b) => assert(a !== b, s"key $k uncompressed run")
        case _ =>
      }
    }
  }

  test("partHistory: run month counts add up to the observed grain") {
    val hist = Scd.partHistory(spark, sf)
    val observedMonths = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), date_trunc("month", col("l_shipdate")))
      .distinct().count()
    val summed = hist.agg(sum("n_months")).head().getLong(0)
    assert(summed === observedMonths)
  }
}
