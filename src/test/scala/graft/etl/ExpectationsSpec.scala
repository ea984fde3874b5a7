package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq[(java.lang.Long, java.lang.Double, String)](
    (1L, 5.0, "ok"),
    (2L, -1.0, "bad_price"),
    (null, 5.0, "bad_key"),
    (3L, null, "bad_both_null_price"),
    (null, -2.0, "bad_both")
  ).toDF("k", "price", "tag")

  private val exps = Seq(
    Expectation("key_present", col("k").isNotNull),
    Expectation("price_positive", col("price") > 0))

  test("annotate: violations in declaration order, NULL check is a violation, clean rows get NULL") {
    val got = Expectations.annotate(fixture, exps)
      .select("tag", "violations").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("ok") === null)
    assert(got("bad_price") === "price_positive")
    assert(got("bad_key") === "key_present")
    // NULL price > 0 is NULL -> unknown is not known-good
    assert(got("bad_both_null_price") === "price_positive")
    assert(got("bad_both") === "key_present,price_positive")
  }

  test("expectOrDrop and quarantine partition the input exactly") {
    val good = Expectations.expectOrDrop(fixture, exps)
    val bad = Expectations.quarantine(fixture, exps)
    assert(good.count() + bad.count() === fixture.count())
    assert(good.select("tag").as[String].collect().toSet === Set("ok"))
    assert(bad.columns.contains("violations"))
    // routing loses nothing: quarantined rows keep full fidelity
    assert(bad.drop("violations").columns.toSeq === fixture.columns.toSeq)
  }

  test("expectOrFail: gate passes within tolerance with per-rule counts, dies loudly beyond it") {
    // 4 of 5 rows violate something; tolerance 0.8 admits them
    val counts = Expectations.expectOrFail(fixture, exps, 0.8)
    assert(counts("") === 5L)
    assert(counts("key_present") === 2L)
    assert(counts("price_positive") === 3L)
    val e = intercept[RuntimeException](
      Expectations.expectOrFail(fixture, exps, 0.5))
    assert(e.getMessage.contains("key_present=2") &&
      e.getMessage.contains("price_positive=3"),
      s"failure must carry the per-rule breakdown: ${e.getMessage}")
    // empty input passes any gate
    assert(Expectations.expectOrFail(fixture.limit(0), exps)("") === 0L)
  }

  test("declaration hygiene: duplicate or comma-bearing names refuse") {
    intercept[IllegalArgumentException](Expectations.annotate(fixture,
      Seq(Expectation("a", lit(true)), Expectation("a", lit(false)))))
    intercept[IllegalArgumentException](Expectations.annotate(fixture,
      Seq(Expectation("a,b", lit(true)))))
    intercept[IllegalArgumentException](
      Expectations.annotate(fixture, Nil))
  }

  test("plan contract: annotate is a narrow per-row projection — no shuffle, no extra job") {
    val plan = Expectations.annotate(fixture, exps)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expectations must not shuffle:\n$plan")
  }
}
