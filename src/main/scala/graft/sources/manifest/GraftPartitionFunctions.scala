package graft.sources.manifest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Add, BoundReference, Cast, Expression, Literal, Month, Multiply, Murmur3Hash, Pmod, Substring, Subtract, Year}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The V2 FUNCTION side of hidden partitioning — what lets Spark's
  * storage-partitioned join resolve a reported transform
  * (`bucket(16, k)`, `months(ts)`, …) into a catalyst
  * `TransformExpression`: `V2ScanPartitioningAndOrdering` looks the
  * transform's name up in the TABLE'S catalog (its `FunctionCatalog`
  * face), binds it against the source column's type, and compares the
  * two join sides by the bound function's `canonicalName` — equal
  * names + equal arguments ⇒ co-partitioned ⇒ zero Exchange.
  *
  * Each bound function EVALUATES exactly the sidecar's tuple
  * derivation ([[graft.ext.PartField.tupleColumn]]) — built from the
  * same resolved catalyst expressions, so a partition value computed
  * by Spark (e.g. under `v2.bucketing.shuffle.enabled`, which shuffles
  * the un-partitioned side BY this function) can never disagree with
  * the values the manifest recorded.
  *
  * `canonicalName` embeds the VALUE type: Spark's Murmur3 hashes an
  * int and a long of the same value differently, so
  * `bucket(16, int_col)` and `bucket(16, bigint_col)` must never be
  * deemed compatible — distinct canonical names make that mismatch
  * degrade to an ordinary shuffle plan. */
private[manifest] object GraftPartitionFunctions {

  val names: Seq[String] =
    Seq("years", "months", "days", "hours", "bucket", "truncate")

  def unbound(name: String): Option[UnboundFunction] =
    names.find(_ == name.toLowerCase).map(n => new GraftUnbound(n))

  private val timeTypes: Seq[DataType] =
    Seq(DateType, TimestampType, TimestampNTZType)

  private final class GraftUnbound(fname: String) extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"graft partition transform '$fname'"

    override def bind(inputType: StructType): BoundFunction = {
      def in(i: Int, dt: DataType, nullable: Boolean = true): Expression =
        BoundReference(i, dt, nullable)
      // UTC pinned, NOT the session zone — the single definition of
      // the time transforms ([[graft.ext.PartField.tupleColumn]]); a
      // session-TZ bind would let v2.bucketing.shuffle SPJ shuffle
      // rows to partitions the UTC-derived sidecar never recorded
      def asDate(e: Expression): Expression =
        if (e.dataType == DateType) e else Cast(e, DateType, Some("UTC"))
      fname match {
        case "years" | "months" | "days" =>
          require(inputType.length == 1 &&
              timeTypes.contains(inputType.head.dataType),
            s"$fname takes one date/timestamp argument, got $inputType")
          val dt = inputType.head.dataType
          val d = asDate(in(0, dt))
          val (expr, out) = fname match {
            case "years" => (Year(d), IntegerType)
            case "months" => (Subtract(Add(Multiply(Year(d), Literal(12)),
              Month(d)), Literal(1)), IntegerType)
            case _ => (d, DateType)
          }
          new GraftBound(fname, Array(dt), out, expr,
            s"graft.$fname(${dt.catalogString})")
        case "hours" =>
          // TIMESTAMP only — NTZ cannot cast to numeric in Spark 4
          // (validate() refuses it at CREATE for the same reason)
          require(inputType.length == 1 &&
              inputType.head.dataType == TimestampType,
            s"hours takes one TIMESTAMP argument, got $inputType")
          val dt = inputType.head.dataType
          // floor(unix_seconds / 3600) — the analyzed form of the
          // sidecar derivation (Cast ts→long is TZ-free epoch seconds)
          val expr = Cast(
            org.apache.spark.sql.catalyst.expressions.Floor(
              org.apache.spark.sql.catalyst.expressions.Divide(
                Cast(Cast(in(0, dt), LongType, Some("UTC")), DoubleType),
                Literal(3600d))), IntegerType)
          new GraftBound(fname, Array(dt), IntegerType, expr,
            s"graft.hours(${dt.catalogString})")
        case "bucket" =>
          require(inputType.length == 2 &&
              inputType.head.dataType == IntegerType,
            s"bucket takes (numBuckets INT, value), got $inputType")
          val dt = inputType(1).dataType
          val expr = Pmod(new Murmur3Hash(Seq(in(1, dt))),
            in(0, IntegerType, nullable = false))
          new GraftBound(fname, Array(IntegerType, dt), IntegerType, expr,
            s"graft.bucket(${dt.catalogString})")
        case "truncate" =>
          require(inputType.length == 2 &&
              inputType.head.dataType == IntegerType,
            s"truncate takes (width INT, value), got $inputType")
          val dt = inputType(1).dataType
          val w = in(0, IntegerType, nullable = false)
          val v = in(1, dt)
          val expr = dt match {
            case StringType => Substring(v, Literal(1), w)
            case IntegerType | LongType => Subtract(v, Pmod(v, Cast(w, dt)))
            case d: DecimalType if d.precision <= 18 =>
              // unscaled-long floor — the sidecar derivation's exact form
              org.apache.spark.sql.catalyst.expressions.MakeDecimal(
                Subtract(
                  org.apache.spark.sql.catalyst.expressions.UnscaledValue(v),
                  Pmod(
                    org.apache.spark.sql.catalyst.expressions.UnscaledValue(v),
                    Cast(w, LongType))),
                d.precision, d.scale)
            case _ => sys.error(
              s"truncate is defined over string/int/bigint/decimal(<=18,s)" +
                s", got ${dt.catalogString}")
          }
          new GraftBound(fname, Array(IntegerType, dt), dt, expr,
            s"graft.truncate(${dt.catalogString})")
      }
    }
  }

  /** A bound transform: `produceResult` evaluates the resolved
    * catalyst expression over the input row — internal representations
    * in, internal out, exactly what the `ScalarFunction` contract
    * wants. */
  private final class GraftBound(fname: String,
      inTypes: Array[DataType], out: DataType, expr: Expression,
      canonical: String) extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = inTypes
    override def resultType(): DataType = out
    override def name(): String = fname
    override def canonicalName(): String = canonical
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Any = expr.eval(input)
  }
}
