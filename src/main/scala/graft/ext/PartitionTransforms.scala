package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, Month, Murmur3Hash, Pmod, Substring, Subtract, Year}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.functions.{col, floor, hash, lit, month, pmod, substring, year}
import org.apache.spark.sql.types._

/** HIDDEN PARTITIONING (Iceberg's partition transforms) for manifest
  * tables: a partition field is no longer just a column — it is a
  * TRANSFORM of a source column (`months(invoice_date)`,
  * `bucket[16](invoice_no)`, `truncate[4](category)`, …), recorded in
  * the version's `_partcols` spec and derived per file into the
  * partition-tuple sidecar. Users query the SOURCE column; the engine
  * lowers source-column predicates to transformed-tuple predicates for
  * file pruning, and reports the transform through
  * `SupportsReportPartitioning` so bucket-co-partitioned tables join
  * with zero Exchange (the SPJ shape identity partitioning can never
  * give a high-NDV key at bounded partition count).
  *
  * Spec grammar — deliberately COMMA-FREE, because the catalog pointer
  * file and the `_partcols` sidecar both store specs in comma/newline
  * joined lists (a bare column name remains a valid spec, so every
  * pre-transform table reads back unchanged):
  *
  *  - `colname`                 identity
  *  - `years(c)` `months(c)` `days(c)` `hours(c)`   time transforms
  *  - `bucket[n](c)`            Murmur3 hash-mod bucketing
  *  - `truncate[w](c)`          string prefix / integral floor-to-width
  *
  * Tuple semantics (the values the sidecar stores, one row per
  * (file, distinct tuple)):
  *
  *  - `years`   calendar year, INT (`year(c)` — session-TZ calendar
  *              for timestamps, TZ-free for dates, like Delta's
  *              generated-column partitioning)
  *  - `months`  `year*12 + month - 1`, INT — monotonic across years
  *  - `days`    `CAST(c AS DATE)`, DATE
  *  - `hours`   `floor(unix_seconds / 3600)`, INT — TZ-free
  *  - `bucket`  `pmod(hash(c), n)`, INT (Spark's Murmur3, seed 42)
  *  - `truncate` string: `substring(c, 1, w)`; int/long:
  *              `c - pmod(c, w)` (floor to multiple — order-preserving)
  *
  * Pruning lowering is CONSERVATIVE by construction: the time and
  * truncate transforms are monotonic, so source ranges lower to tuple
  * ranges (`src > v` widens to `tuple >= T(v)`); bucket admits only
  * equality/IN shapes; anything else refuses and keeps every file.
  * EXACT (metadata-answer) translation stays identity-only — a month
  * tuple cannot decide a mid-month predicate, so transformed fields
  * never participate in metadata-only aggregate proofs. */
final case class PartField(transform: String, source: String,
    param: Option[Int]) {

  def isIdentity: Boolean = transform == "identity"

  /** The comma-free serialized form stored in `_partcols` and the
    * catalog pointer file. Identity serializes as the bare name —
    * byte-compatible with every pre-transform table. */
  def spec: String = transform match {
    case "identity" => source
    case "bucket" | "truncate" => s"$transform[${param.get}]($source)"
    case t => s"$t($source)"
  }

  /** The tuple column's name in the partition-values sidecar
    * (identity keeps the source name — existing sidecars unchanged). */
  def tupleName: String = transform match {
    case "identity" => source
    case "years" => s"${source}_year"
    case "months" => s"${source}_month"
    case "days" => s"${source}_day"
    case "hours" => s"${source}_hour"
    case "bucket" => s"${source}_bucket"
    case "truncate" => s"${source}_trunc"
  }

  /** Source ranges lower to tuple ranges only for order-preserving
    * transforms; bucket scatters and admits equality shapes only. */
  def monotonic: Boolean = transform != "bucket"

  /** The sidecar tuple's data type, given the source column's. */
  def outputType(srcType: DataType): DataType = transform match {
    case "identity" => srcType
    case "days" => DateType
    case "truncate" => srcType
    case _ => IntegerType
  }

  /** Write-side tuple derivation over the live source column — the
    * SINGLE definition of the transform; the driver-side literal
    * evaluator below mirrors the analyzed form of exactly these
    * columns, so pruning and derivation can never disagree. */
  def tupleColumn(srcType: DataType): Column = {
    val c = col(s"`$source`")
    transform match {
      case "identity" => c
      case "years" => year(c)
      case "months" => year(c) * lit(12) + month(c) - lit(1)
      case "days" => c.cast(DateType)
      case "hours" =>
        floor(c.cast(LongType) / lit(3600)).cast(IntegerType)
      case "bucket" => pmod(hash(c), lit(param.get))
      case "truncate" =>
        if (srcType == StringType) substring(c, 1, param.get)
        else c - pmod(c, lit(param.get).cast(srcType))
    }
  }

  /** The transform applied to a pushed-down CATALYST literal, on the
    * driver, as the EXTERNAL Scala value of [[outputType]] — what the
    * pruning predicates compare sidecar tuple columns against. Built
    * from resolved catalyst expressions matching the analyzed form of
    * [[tupleColumn]] (casts carry the session timezone explicitly).
    * None when the literal cannot take the transform (type mismatch,
    * overflow, a shape the eval refuses) — pruning then skips,
    * conservatively. */
  def evalLiteral(l: Literal, tz: String): Option[Any] =
    // time/truncate transforms map null → null; BUCKET does not —
    // Spark's Murmur3 hash of a null input is the seed, so null rows
    // land in a real bucket (pmod(42, n)), which is what the Try path
    // computes below. Only the null-preserving transforms short-circuit.
    if (l.value == null && transform != "bucket") Some(null)
    else scala.util.Try {
      def asDate: Expression =
        if (l.dataType == DateType) l else Cast(l, DateType, Some(tz))
      val internal: Any = transform match {
        case "identity" => l.value
        case "years" => Year(asDate).eval(null)
        case "months" =>
          val y = Year(asDate).eval(null).asInstanceOf[Int]
          val m = Month(asDate).eval(null).asInstanceOf[Int]
          y * 12 + m - 1
        case "days" => asDate match {
          case lit: Literal => lit.value
          case e => e.eval(null)
        }
        case "hours" =>
          val secs = Cast(l, LongType, Some(tz)).eval(null)
            .asInstanceOf[Long]
          math.floor(secs.toDouble / 3600d).toInt
        case "bucket" =>
          Pmod(new Murmur3Hash(Seq(l)), Literal(param.get)).eval(null)
        case "truncate" =>
          if (l.dataType == StringType)
            Substring(l, Literal(1), Literal(param.get)).eval(null)
          else Subtract(l,
            Pmod(l, Cast(Literal(param.get), l.dataType))).eval(null)
      }
      CatalystTypeConverters.convertToScala(internal,
        outputType(l.dataType))
    }.toOption

  /** The connector-expression form [[ManifestTable.partitioning]] and
    * the SPJ report serve. */
  def v2Transform: Transform = transform match {
    case "identity" => Expressions.identity(source)
    case "years" => Expressions.years(source)
    case "months" => Expressions.months(source)
    case "days" => Expressions.days(source)
    case "hours" => Expressions.hours(source)
    case "bucket" => Expressions.bucket(param.get, source)
    case "truncate" =>
      Expressions.apply("truncate",
        Expressions.literal(param.get), Expressions.column(source))
  }

  /** CREATE-time validation against the declared schema: the source
    * must exist and carry a type the transform is defined over. */
  def validate(schema: StructType,
      resolver: (String, String) => Boolean): Unit = {
    val f = schema.fields.find(f => resolver(f.name, source)).getOrElse(
      sys.error(s"partition transform $spec: source column '$source' " +
        "is not in the schema"))
    def ok(kinds: DataType*): Unit = require(kinds.contains(f.dataType),
      s"partition transform $spec is not defined over " +
        s"${f.dataType.catalogString} — supported: " +
        kinds.map(_.catalogString).mkString(", "))
    transform match {
      case "identity" => ()
      case "years" | "months" | "days" =>
        ok(DateType, TimestampType, TimestampNTZType)
      case "hours" => ok(TimestampType, TimestampNTZType)
      case "truncate" => ok(StringType, IntegerType, LongType)
      case "bucket" => require(f.dataType != NullType && !f.dataType.isInstanceOf[StructType] && !f.dataType.isInstanceOf[ArrayType] && !f.dataType.isInstanceOf[MapType],
        s"partition transform $spec needs an atomic source type, got " +
          f.dataType.catalogString)
    }
    param.foreach(p => require(p > 0,
      s"partition transform $spec needs a positive parameter"))
  }
}

object PartitionTransforms {

  private val Parameterized = """^(bucket|truncate)\[(\d+)\]\((.+)\)$""".r
  private val Plain = """^(years|months|days|hours)\((.+)\)$""".r

  /** Parse one `_partcols` line / pointer-file entry. A bare name —
    * anything that is not a recognized transform shape — is identity,
    * which is exactly what every pre-transform table recorded. */
  def parse(spec: String): PartField = spec.trim match {
    case Parameterized(t, p, src) => PartField(t, src.trim, Some(p.toInt))
    case Plain(t, src) => PartField(t, src.trim, None)
    case s => PartField("identity", s, None)
  }

  def parseAll(specs: Seq[String]): Seq[PartField] = specs.map(parse)

  /** The DATA columns the spec reads — what write paths must find in
    * the incoming batch and clustering/pruning resolve against. */
  def sources(specs: Seq[String]): Seq[String] =
    parseAll(specs).map(_.source).distinct

  /** Sources of IDENTITY fields only — the columns whose predicates
    * are EXACT over the recorded tuples (metadata-only DML regions and
    * aggregate proofs must not widen through a lossy transform). */
  def identitySources(specs: Seq[String]): Seq[String] =
    parseAll(specs).filter(_.isIdentity).map(_.source)

  /** True iff every field is identity — the pre-transform world, where
    * tuple columns ARE the source columns. */
  def allIdentity(specs: Seq[String]): Boolean =
    parseAll(specs).forall(_.isIdentity)

  /** A CREATE TABLE transform (Spark's parsed `PARTITIONED BY` entry)
    * to its spec string. Accepts `truncate` literal/ref in either
    * order (`truncate(4, c)` and `truncate(c, 4)` both appear in the
    * wild). */
  def fromV2(t: Transform): String = {
    def oneRef: String = {
      require(t.references.length == 1,
        s"partition transform $t must reference exactly one column")
      t.references.head.fieldNames.mkString(".")
    }
    def oneLiteral: Int = t.arguments.collect {
      case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
        l.value match {
          case i: Integer => i.intValue
          case i: java.lang.Long => i.intValue
          case v => sys.error(s"partition transform $t: non-integer " +
            s"parameter $v")
        }
    } match {
      case Array(n) => n
      case _ => sys.error(s"partition transform $t needs exactly one " +
        "integer parameter")
    }
    t.name.toLowerCase match {
      case "identity" => oneRef
      case n @ ("years" | "months" | "days" | "hours") => s"$n($oneRef)"
      case "bucket" => s"bucket[$oneLiteral]($oneRef)"
      case "truncate" => s"truncate[$oneLiteral]($oneRef)"
      case other => sys.error(
        s"manifest tables support PARTITIONED BY identity columns and " +
          s"the years/months/days/hours/bucket/truncate transforms — " +
          s"got $other")
    }
  }
}
