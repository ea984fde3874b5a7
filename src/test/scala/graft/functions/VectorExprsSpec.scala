package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExprsSpec extends AnyFunSuite {

  test("vec_dot is bit-identical to the HOF fold on the fixture embeddings") {
    val spark = TestSpark.spark
    VectorExprs.register(spark)
    val emb = graft.Tables.embeddings(spark, TestSpark.sf).select("vec_id", "embedding")
    val hof = expr("""aggregate(zip_with(embedding, embedding,
      (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
    val diff = emb
      .withColumn("a", expr("vec_dot(embedding, embedding)"))
      .withColumn("b", hof)
      .filter(col("a") =!= col("b"))
    assert(diff.count() === 0)
  }

  test("vec_dot interpreted eval matches codegen eval") {
    val x = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(1.5f, -2.25f, 3.0f))
    val y = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(2.0f, 4.0f, 0.5f))
    val e = VecDot(
      org.apache.spark.sql.catalyst.expressions.Literal(x,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal(y,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) === (1.5 * 2.0 + -2.25 * 4.0 + 3.0 * 0.5))
  }
}
