package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Exact grouped top-k as a NATIVE aggregate function (preference ladder
  * (b), the aggregate companion of [[VecDot]]/[[Md5Prefix60]]/[[ZOrder2]]):
  * a bounded min-heap per group, combined MAP-SIDE like any partial
  * aggregate.
  *
  * Why it exists: the window form of grouped top-k
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`) must
  * shuffle EVERY row to its group's partition and sort there — at 100 TB
  * that is a full-data exchange for a k-row-per-group answer. The
  * aggregate form ships at most k doubles per (group, map task):
  * partial heaps fold in the scan stage, the exchange carries k-sized
  * states, and the final merge is k log k per group. Same answer,
  * shuffle bytes smaller by rows/k.
  *
  * Determinism: the result is the sorted-descending VALUE multiset —
  * ties are equal values, so any tie order yields the identical array;
  * the DuckDB oracle replays it with a rank window.
  */
case class TopKAgg(
    child: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "topk_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg requires a DOUBLE value column, got ${child.dataType.catalogString}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("topk_agg requires a literal INT k")
    else if (kExpr.eval(InternalRow.empty).asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure("topk_agg requires k >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  override def update(
      buf: java.util.PriorityQueue[java.lang.Double],
      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[java.lang.Double],
      other: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  private def offer(buf: java.util.PriorityQueue[java.lang.Double], v: Double): Unit = {
    if (buf.size < k) buf.offer(v)
    else if (buf.peek() < v) { buf.poll(); buf.offer(v) }
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending
    val out = new Array[Any](arr.length)
    var j = 0
    while (j < arr.length) { out(j) = arr(arr.length - 1 - j); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { offer(buf, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object TopKAggExprs {
  /** Registers `topk_agg(value, k)` with an arity-checked builder. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_agg",
      exprs => {
        require(exprs.length == 2, s"topk_agg expects 2 arguments, got ${exprs.length}")
        TopKAgg(exprs.head, exprs(1))
      },
      "built-in")
}
