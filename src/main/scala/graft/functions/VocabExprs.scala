package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native vocabulary lookup for the tokenize-to-ids hot path at REALISTIC
  * vocab sizes (50k–200k BPE entries) — preference ladder (b), like
  * [[Md5Prefix60]]/[[VecDot]].
  *
  * Why not the alternatives:
  *  - the literal `map(k1, v1, k2, v2, ...)` column
  *    ([[graft.operators.TextAnalysis.tokenizeIds]]) inlines every entry
  *    into the expression tree — perfect at V=64, but a 50k-entry map is
  *    100k expression nodes: analysis cost blows up and codegen hits the
  *    JVM constant/method budget;
  *  - a join against a vocab table shuffles or broadcasts the exploded
  *    TOKEN STREAM (corpus-sized) to reassemble sequences by position;
  *  - a Scala UDF with a broadcast map works but drops out of codegen
  *    and boxes every call.
  *
  * [[VocabLookup]] instead holds the vocabulary as ONE reference object —
  * a `java.util.HashMap<UTF8String, Integer>` — carried by the serialized
  * plan (Spark ships task binaries to executors via its internal
  * broadcast, so the map travels once per stage, not per row or task) and
  * accessed through `CodegenContext.addReferenceObj`: the generated code
  * does a single O(1) hash probe per token with no string conversion
  * (UTF8String keys compare raw bytes). Unknown tokens map to 0, the UNK
  * convention of tokenizeIds. */
case class VocabLookup(child: Expression, vocab: Map[String, Int])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "vocab_lookup"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vocab_lookup requires a STRING argument, got ${child.dataType.catalogString}")

  @transient private lazy val table: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(UTF8String.fromString(k), Integer.valueOf(v)) }
    m
  }

  override protected def nullSafeEval(input: Any): Any = {
    val r = table.get(input.asInstanceOf[UTF8String])
    if (r == null) 0 else r.intValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val mapRef = ctx.addReferenceObj("vocabTable", table, "java.util.HashMap")
      val r = ctx.freshName("vid")
      s"""
         |Object $r = $mapRef.get($input);
         |${ev.value} = ($r == null) ? 0 : ((Integer) $r).intValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VocabLookup =
    copy(child = newChild)
}

object VocabExprs {
  /** Registers `name` as a lookup function bound to THIS vocabulary
    * (the registry builder only sees argument expressions, so each vocab
    * instance gets its own named binding). Idempotent per name. */
  def registerVocab(spark: SparkSession, name: String, vocab: Map[String, Int]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => {
        require(exprs.length == 1,
          s"$name expects exactly 1 argument, got ${exprs.length}")
        VocabLookup(exprs.head, vocab)
      }, "built-in")
}
