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
      val tz = org.apache.spark.sql.internal.SQLConf.get
        .sessionLocalTimeZone
      def in(i: Int, dt: DataType, nullable: Boolean = true): Expression =
        BoundReference(i, dt, nullable)
      def asDate(e: Expression): Expression =
        if (e.dataType == DateType) e else Cast(e, DateType, Some(tz))
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
          require(inputType.length == 1 &&
              Seq(TimestampType, TimestampNTZType)
                .contains(inputType.head.dataType),
            s"hours takes one timestamp argument, got $inputType")
          val dt = inputType.head.dataType
          // floor(unix_seconds / 3600) — the analyzed form of the
          // sidecar derivation (Cast ts→long is TZ-free epoch seconds)
          val expr = Cast(
            org.apache.spark.sql.catalyst.expressions.Floor(
              org.apache.spark.sql.catalyst.expressions.Divide(
                Cast(Cast(in(0, dt), LongType, Some(tz)), DoubleType),
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
          require(Seq(StringType, IntegerType, LongType).contains(dt),
            s"truncate is defined over string/int/bigint, got " +
              dt.catalogString)
          val w = in(0, IntegerType, nullable = false)
          val v = in(1, dt)
          val expr =
            if (dt == StringType) Substring(v, Literal(1), w)
            else Subtract(v, Pmod(v, Cast(w, dt)))
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
