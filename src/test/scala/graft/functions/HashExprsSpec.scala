package graft.functions

import graft.TestSpark
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HashExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("md5_prefix60 equals the conv/substring formula on arbitrary strings (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val spark0 = spark
    import spark0.implicits._
    HashExprs.register(spark)
    val strGen = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.listOf(Gen.choose(' ', '~')).map(_.mkString),
      Gen.listOf(Gen.oneOf("é", "ß", "中", "🦀", "a", " ")).map(_.mkString))
    val prop = Prop.forAll(Gen.nonEmptyListOf(strGen)) { strs =>
      val df = strs.toDF("s").select(
        graft.operators.Dedup.portableHash60(col("s")).as("slow"),
        call_function("md5_prefix60", col("s").cast("binary")).as("fast"))
      df.collect().forall(r => r.getLong(0) == r.getLong(1))
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("interpreted eval matches the codegen'd DataFrame path and the known value") {
    // md5('hello') = 5d41402abc4b2a76... -> 0x5d41402abc4b2a7 = 419982666956583591
    val expected = 419982666956583591L
    assert(Md5Prefix60(Literal("hello".getBytes("UTF-8"))).eval() === expected)
    HashExprs.register(spark)
    val viaDf = spark.sql("SELECT md5_prefix60(CAST('hello' AS BINARY))").head().getLong(0)
    assert(viaDf === expected)
  }

  test("mistyped or misarity calls fail at analysis, not with a runtime cast error") {
    HashExprs.register(spark)
    // non-binary argument -> checkInputDataTypes failure at analysis time
    val typeErr = intercept[Exception](spark.sql("SELECT md5_prefix60(42)").collect())
    assert(typeErr.getMessage.toLowerCase.contains("binary"), typeErr.getMessage)
    // wrong arity -> builder rejects before any expression is constructed
    val arityErr = intercept[Exception](spark.sql("SELECT md5_prefix60('a', 'b')").collect())
    assert(arityErr.getMessage.contains("exactly 1 argument"), arityErr.getMessage)
  }
}
