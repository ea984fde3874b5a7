package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the similarity hot path — preference
  * ladder (b) from the build brief: Spark's higher-order functions
  * (`zip_with` + `aggregate` with lambdas) express the dot product
  * correctly but evaluate the lambda INTERPRETED, one function call per
  * element per row; at 10^9 candidate pairs × 64 dims that is the
  * dominant cost. [[VecDot]] emits a tight codegen'd loop (and a
  * matching interpreted `nullSafeEval` for non-codegen paths).
  *
  * Numeric contract: identical to the HOF encoding AND the DuckDB oracle
  * replay — left-to-right accumulation of `(double) a[i] * (double) b[i]`
  * into a double — so swapping it into an oracle-checked query keeps the
  * hash green (verified by `similarity_topk`).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are ARRAY<FLOAT> columns by construction (embedding fixtures);
  // no implicit-cast contract needed
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Registers `vec_dot` in the session function registry (the
    * lightweight runtime face of a `SparkSessionExtensions.injectFunction`
    * — same builder, registered on first use instead of at session
    * construction so driver-owned sessions pick it up too). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")
}
