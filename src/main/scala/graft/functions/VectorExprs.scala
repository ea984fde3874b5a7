package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

  // inputs are ARRAY<FLOAT> embedding columns or ARRAY<DOUBLE> centroid
  // literals; each side's accessor is picked from its static element type,
  // and every product accumulates in DOUBLE left-to-right — the same fold
  // the HOF encoding and the DuckDB oracle replay use, so swapping either
  // element type keeps oracle hashes green
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _)  => false
    case t => throw new IllegalArgumentException(s"vec_dot: unsupported array type $t")
  }
  private lazy val (lDouble, rDouble) = (isDouble(left), isDouble(right))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (rDouble) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xi = if (lDouble) s"$x.getDouble($i)" else s"((double) $x.getFloat($i))"
      val yi = if (rDouble) s"$y.getDouble($i)" else s"((double) $y.getFloat($i))"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $xi * $yi;
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
