package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, MakeDecimal, Month, Murmur3Hash, Pmod, Substring, Subtract, UnscaledValue, Year}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.functions.{col, floor, hash, lit, month, pmod, substring, year}
import org.apache.spark.sql.graft.ColumnShim
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
  *  - `years`   calendar year, INT — UTC calendar for timestamps
  *              (Iceberg's TZ-free definition: writer and reader
  *              session zones can never disagree on a granule),
  *              wall-clock for DATE / TIMESTAMP_NTZ
  *  - `months`  `year*12 + month - 1`, INT — monotonic across years,
  *              same UTC calendar
  *  - `days`    `CAST(c AS DATE)` under UTC, DATE
  *  - `hours`   `floor(unix_seconds / 3600)`, INT — TZ-free epoch;
  *              TIMESTAMP sources only (NTZ has no numeric cast)
  *  - `bucket`  `pmod(hash(c), n)`, INT (Spark's Murmur3, seed 42).
  *              NULLS land in a REAL bucket — `pmod(hash(null)=seed,
  *              n)` — consistently on the derivation, lowering and
  *              function faces. This DIVERGES from Iceberg, which
  *              gives nulls their own null tuple: an external reader
  *              consuming these sidecars must use this library's
  *              lowering, not Iceberg's.
  *  - `truncate` string: `substring(c, 1, w)`; int/long:
  *              `c - pmod(c, w)` (floor to multiple — order-preserving);
  *              decimal(p<=18,s): floor of the UNSCALED value to a
  *              multiple of w (Iceberg semantics, exact long arithmetic)
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

  /** True when this field's recorded tuples DEPEND on the writer's
    * session timezone under pre-UTC semantics
    * ([[Manifests.partSemOf]] < [[Manifests.PartSemCurrent]]):
    * years/months/days over TIMESTAMP derived calendar fields in the
    * session zone before the UTC re-pin, and hours(TIMESTAMP_NTZ) was
    * writable before `validate` refused NTZ. Consumers on a
    * below-current table must not lower predicates through such a
    * field (tuples near granule boundaries may name the WRONG granule
    * under current rules — pruning would drop files holding matching
    * rows) and must not report SPJ key-grouping by it. DATE and
    * NTZ calendar fields are wall-clock in both eras; hours over
    * TIMESTAMP was epoch-floor in both; identity/bucket/truncate
    * never involve a zone. */
  def tzSensitive(srcType: DataType): Boolean = transform match {
    case "years" | "months" | "days" => srcType == TimestampType
    case "hours" => srcType == TimestampNTZType
    case _ => false
  }

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
    * columns, so pruning and derivation can never disagree.
    *
    * TIME TRANSFORMS ARE TZ-FREE BY DEFINITION (Iceberg semantics):
    * a TIMESTAMP's year/month/day is its UTC calendar field, pinned
    * with an explicit UTC cast — NOT the writer's session timezone.
    * A session-TZ derivation would let a writer and a reader (or two
    * writers) in different zones disagree on which granule a row
    * near midnight belongs to: the lowered tuple predicate could then
    * prune files that contain matching rows — wrong results, not
    * just missed pruning. DATE and TIMESTAMP_NTZ are wall-clock types
    * with no zone to begin with. */
  def tupleColumn(srcType: DataType): Column = {
    val c = col(s"`$source`")
    def asUtcDate: Column =
      if (srcType == TimestampType)
        ColumnShim.column(Cast(ColumnShim.expression(c), DateType,
          Some("UTC")))
      else c.cast(DateType)
    transform match {
      case "identity" => c
      case "years" => year(asUtcDate)
      case "months" => year(asUtcDate) * lit(12) + month(asUtcDate) - lit(1)
      case "days" => asUtcDate
      case "hours" =>
        // epoch-second floor — TZ-free by construction (ts→long is the
        // epoch, no calendar involved); validate() admits TIMESTAMP only
        // (TIMESTAMP_NTZ cannot cast to numeric in Spark 4). A table
        // CREATED under pre-UTC semantics could carry hours(ntz) —
        // fail its appends with the remedy, not an opaque cast error
        require(srcType == TimestampType,
          s"partition transform $spec is defined over TIMESTAMP only; " +
            "a table partitioned by hours() of a TIMESTAMP_NTZ column " +
            "predates UTC tuple semantics — re-partition it " +
            "(commitDataPartitioned overwrite, or evolvePartitions to " +
            "a supported transform)")
        floor(c.cast(LongType) / lit(3600)).cast(IntegerType)
      case "bucket" => pmod(hash(c), lit(param.get))
      case "truncate" => srcType match {
        case StringType => substring(c, 1, param.get)
        case d: DecimalType =>
          // Iceberg's decimal truncate: floor the UNSCALED value to a
          // multiple of the width (exact integer arithmetic — no
          // precision drift); validate() caps precision at 18 so the
          // unscaled value fits a long
          val e = ColumnShim.expression(c)
          ColumnShim.column(MakeDecimal(
            Subtract(UnscaledValue(e),
              Pmod(UnscaledValue(e), Literal(param.get.toLong))),
            d.precision, d.scale))
        case _ => c - pmod(c, lit(param.get).cast(srcType))
      }
    }
  }

  /** The transform applied to a pushed-down CATALYST literal, on the
    * driver, as the EXTERNAL Scala value of [[outputType]] — what the
    * pruning predicates compare sidecar tuple columns against. Built
    * from resolved catalyst expressions matching the analyzed form of
    * [[tupleColumn]] EXACTLY — time casts pinned UTC like the
    * derivation, never the reader's session zone (a session-TZ
    * lowering against UTC-derived tuples would prune files that hold
    * matching rows). None when the literal cannot take the transform
    * (type mismatch, overflow, a shape the eval refuses) — pruning
    * then skips, conservatively. */
  def evalLiteral(l: Literal): Option[Any] =
    evalInternal(l).map(
      CatalystTypeConverters.convertToScala(_, outputType(l.dataType)))

  /** [[evalLiteral]] in the CATALYST-internal domain (days as Int,
    * micros as Long, Decimal) — what the granule-alignment math below
    * compares against. */
  private def evalInternal(l: Literal): Option[Any] =
    // time/truncate transforms map null → null; BUCKET does not —
    // Spark's Murmur3 hash of a null input is the seed, so null rows
    // land in a real bucket (pmod(42, n)), which is what the Try path
    // computes below. Only the null-preserving transforms short-circuit.
    if (l.value == null && transform != "bucket") Some(null)
    else scala.util.Try {
      def asDate: Expression =
        if (l.dataType == DateType) l else Cast(l, DateType, Some("UTC"))
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
          val secs = Cast(l, LongType, Some("UTC")).eval(null)
            .asInstanceOf[Long]
          math.floor(secs.toDouble / 3600d).toInt
        case "bucket" =>
          Pmod(new Murmur3Hash(Seq(l)), Literal(param.get)).eval(null)
        case "truncate" => l.dataType match {
          case StringType =>
            Substring(l, Literal(1), Literal(param.get)).eval(null)
          case d: DecimalType =>
            MakeDecimal(Subtract(UnscaledValue(l),
              Pmod(UnscaledValue(l), Literal(param.get.toLong))),
              d.precision, d.scale).eval(null)
          case _ => Subtract(l,
            Pmod(l, Cast(Literal(param.get), l.dataType))).eval(null)
        }
      }
      internal
    }.toOption

  // ------------------------------------------------------------------
  // EXACT tuple-domain lowering for METADATA DML — unlike pruning's
  // conservative widening, these translate a source-column leaf ONLY
  // when its satisfying row set is a union of whole granules, so a
  // file classification over the recorded tuples decides every row
  // exactly. `DELETE WHERE ts < DATE '1995-01-01'` on a monthly table
  // is month-ALIGNED (the boundary is a granule start) and retires
  // whole files from metadata; a mid-month boundary refuses and keeps
  // the row-level path. Identity fields translate every shape; bucket
  // translates nothing (a bucket is never a contiguous row set).
  // ------------------------------------------------------------------

  private def tcol: Column = col(s"`$tupleName`")

  private def tupleLit(l: Literal): Option[Column] =
    evalLiteral(l).filter(_ != null).map(lit)

  /** The first instant/value of the granule `t` (internal tuple value)
    * names, as a CATALYST-internal source-typed value — None when the
    * transform cannot reconstruct one (bucket; string truncate, whose
    * granules are prefix classes, not ranges with a computable start
    * in every collation edge). */
  private def granuleStartInternal(t: Any, srcType: DataType): Option[Any] = {
    def dateToSrc(d: java.time.LocalDate): Option[Any] = srcType match {
      case DateType => scala.util.Try(math.toIntExact(d.toEpochDay)).toOption
      case TimestampType | TimestampNTZType =>
        // UTC midnight for TIMESTAMP (the transforms are UTC-pinned);
        // wall-clock midnight for NTZ — same epoch-day arithmetic
        scala.util.Try(math.multiplyExact(d.toEpochDay, 86400000000L))
          .toOption
      case _ => None
    }
    transform match {
      case "years" =>
        dateToSrc(java.time.LocalDate.of(t.asInstanceOf[Int], 1, 1))
      case "months" =>
        val m = t.asInstanceOf[Int]
        val y = Math.floorDiv(m, 12)
        dateToSrc(java.time.LocalDate.of(y, m - y * 12 + 1, 1))
      case "days" =>
        dateToSrc(java.time.LocalDate.ofEpochDay(t.asInstanceOf[Int].toLong))
      case "hours" =>
        scala.util.Try(
          math.multiplyExact(t.asInstanceOf[Int].toLong, 3600000000L))
          .toOption
      case "truncate" => srcType match {
        // int/long/decimal truncate floors IN the source domain — the
        // tuple value IS the granule start
        case IntegerType | LongType | _: DecimalType => Some(t)
        case _ => None
      }
      case _ => None
    }
  }

  /** True iff `l` IS the first value of its granule — the alignment
    * that makes `src >= l ⟺ tuple >= T(l)` and `src < l ⟺
    * tuple < T(l)` exact. */
  private def alignedDown(l: Literal): Boolean =
    l.value != null && (for {
      t <- evalInternal(l)
      g <- granuleStartInternal(t, l.dataType)
    } yield g == l.value).getOrElse(false)

  /** The source domain's successor of `l` (+1 day / µs / unit /
    * unscaled step) — what rewrites `<=` as `<` and `>` as `>=` so
    * only the aligned-down check is ever needed. */
  private def succ(l: Literal): Option[Literal] =
    if (l.value == null) None
    else scala.util.Try(l.dataType match {
      case DateType =>
        Literal(math.addExact(l.value.asInstanceOf[Int], 1), DateType)
      case TimestampType =>
        Literal(math.addExact(l.value.asInstanceOf[Long], 1L), TimestampType)
      case TimestampNTZType =>
        Literal(math.addExact(l.value.asInstanceOf[Long], 1L),
          TimestampNTZType)
      case IntegerType =>
        Literal(math.addExact(l.value.asInstanceOf[Int], 1), IntegerType)
      case LongType =>
        Literal(math.addExact(l.value.asInstanceOf[Long], 1L), LongType)
      case d: DecimalType =>
        val cur = l.value.asInstanceOf[org.apache.spark.sql.types.Decimal]
        val next = org.apache.spark.sql.types.Decimal(
          cur.toJavaBigDecimal.add(
            java.math.BigDecimal.valueOf(1L, d.scale)), d.precision, d.scale)
        Literal(next, d)
    }).toOption

  /** Exact `src < l` (strict upper bound). */
  def exactLt(l: Literal): Option[Column] =
    if (l.value == null) None
    else if (isIdentity) scalaLitOpt(l).map(tcol < _)
    else if (!monotonic || !alignedDown(l)) None
    else tupleLit(l).map(tcol < _)

  /** Exact `src >= l` (inclusive lower bound). */
  def exactGe(l: Literal): Option[Column] =
    if (l.value == null) None
    else if (isIdentity) scalaLitOpt(l).map(tcol >= _)
    else if (!monotonic || !alignedDown(l)) None
    else tupleLit(l).map(tcol >= _)

  /** Exact `src <= l` — rewritten as `src < succ(l)`. */
  def exactLe(l: Literal): Option[Column] =
    if (isIdentity) scalaLitOpt(l).map(tcol <= _)
    else succ(l).flatMap(exactLt)

  /** Exact `src > l` — rewritten as `src >= succ(l)`. */
  def exactGt(l: Literal): Option[Column] =
    if (isIdentity) scalaLitOpt(l).map(tcol > _)
    else succ(l).flatMap(exactGe)

  /** Exact `src = l` — a transform admits it only when the granule is
    * a SINGLETON (`l` aligned and `succ(l)` starting the next granule:
    * `days` over DATE, `truncate[1]`), else the tuple equality would
    * sweep the whole granule. */
  def exactEq(l: Literal): Option[Column] =
    if (l.value == null) None
    else if (isIdentity) scalaLitOpt(l).map(tcol === _)
    else if (!monotonic || !alignedDown(l) ||
      !succ(l).exists(alignedDown)) None
    else tupleLit(l).map(tcol === _)

  /** Exact `src IS NULL` — null-preserving transforms only (bucket's
    * null bucket also holds real values). */
  def exactIsNull: Option[Column] =
    if (transform != "bucket") Some(tcol.isNull) else None

  /** Exact `src IS NOT NULL`. */
  def exactIsNotNull: Option[Column] =
    if (transform != "bucket") Some(tcol.isNotNull) else None

  private def scalaLitOpt(l: Literal): Option[Column] =
    scala.util.Try(
      lit(CatalystTypeConverters.convertToScala(l.value, l.dataType))
    ).toOption.filter(_ => l.value != null)

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
      // TIMESTAMP only: the epoch-second derivation casts ts→long,
      // which Spark 4 does not define for TIMESTAMP_NTZ — admitting
      // NTZ here would pass CREATE and fail the first write
      case "hours" => ok(TimestampType)
      case "truncate" => f.dataType match {
        case StringType | IntegerType | LongType => ()
        case d: DecimalType => require(d.precision <= 18,
          s"partition transform $spec: decimal truncate needs " +
            s"precision <= 18 (unscaled-long arithmetic), got " +
            d.catalogString)
        case dt => sys.error(s"partition transform $spec is not " +
          s"defined over ${dt.catalogString} — supported: string, " +
          "int, bigint, decimal(<=18,s)")
      }
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

  /** Whole-SPEC validation: each field against the schema, plus the
    * cross-field invariants one field cannot see — sidecar tuple names
    * must be pairwise distinct (an identity field named `ts_month`
    * beside `months(ts)`, or two transforms colliding on a derived
    * name, would write duplicate/shadowed sidecar columns and corrupt
    * pruning and SPJ tuples silently) and none may claim the sidecar's
    * reserved `file` column. */
  def validateAll(specs: Seq[String], schema: StructType,
      resolver: (String, String) => Boolean): Unit = {
    val fields = parseAll(specs)
    fields.foreach(_.validate(schema, resolver))
    val names = fields.map(_.tupleName)
    names.foreach(n => require(!resolver(n, "file"),
      s"partition spec ${specs.mkString(", ")}: tuple name '$n' " +
        "collides with the sidecar's reserved 'file' column"))
    val dup = names.groupBy(_.toLowerCase).collect {
      case (_, ns) if ns.size > 1 => ns.head
    }
    require(dup.isEmpty,
      s"partition spec ${specs.mkString(", ")}: sidecar tuple name(s) " +
        s"${dup.mkString(", ")} collide — rename the column or drop " +
        "one of the overlapping transforms")
  }

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
