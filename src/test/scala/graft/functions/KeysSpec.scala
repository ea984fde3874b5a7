package graft.functions

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class KeysSpec extends AnyFunSuite {

  test("withRank equals ROW_NUMBER() OVER (ORDER BY key) for arbitrary distinct keys (ScalaCheck)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val keySets = Gen.nonEmptyContainerOf[Set, String](Gen.alphaNumStr.suchThat(_.nonEmpty))
    val prop = Prop.forAll(keySets) { xs =>
      val df = xs.toSeq.toDF("k").repartition(3)
      val ranked = Keys.withRank(df, "rank", Seq("k"))
        .select("k", "rank").collect().map(r => (r.getString(0), r.getLong(1)))
      val expected = xs.toSeq.sorted.zipWithIndex.map { case (k, i) => (k, i + 1L) }
      ranked.sortBy(_._2).toSeq == expected
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  test("withRank on an already-keyed dimension matches the dim oracle ordering") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("b", "a", "d", "c", "e").toDF("k")
    val ranked = Keys.withRank(df, "rank", Seq("k"))
      .orderBy("rank").select("k").collect().map(_.getString(0))
    assert(ranked.toSeq === Seq("a", "b", "c", "d", "e"))
  }
}
