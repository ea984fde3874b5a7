package graft.sources.manifest

import graft.ext.Manifests
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

/** Maintenance as SQL `CALL` statements — Spark 4's native
  * `ProcedureCatalog` face of the operations every table format ships
  * as stored procedures (Iceberg's `CALL catalog.system.rewrite_*`
  * family): `CALL graft.system.compact('ns.t', 4)`,
  * `vacuum('ns.t', 2)`, `analyze('ns.t', 'a,b')`,
  * `analyze_bloom(...)`, `restore('ns.t', 3)`,
  * `clone('ns.t', '/fork/path', 3)`, `add_constraint`/`drop_constraint`,
  * `compact_small`, and the merge-on-read DML faces
  * `update_mor`/`delete_mor`/`merge_mor`. The table argument takes a catalog name
  * (`ns.t`) or an absolute path — the same two spellings every other
  * surface accepts. Each call returns one summary row (a driver-local
  * [[LocalScan]]); the work itself runs through the exact Scala
  * primitives the DataFrame surface uses, so OCC, constraint
  * validation and sidecar maintenance hold identically. */
private[manifest] final class ManifestProcedures(
    resolveBase: String => String) {

  private def spark: SparkSession = SparkSession.active

  /** One-column or multi-column summary result as a local scan. */
  private def result(schema: StructType, row: InternalRow): Scan =
    new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = schema
    }

  private case class Proc(procName: String,
      params: Seq[ProcedureParameter],
      out: StructType,
      body: (String, InternalRow) => InternalRow) extends UnboundProcedure {
    override def name(): String = procName
    override def description(): String = s"manifest $procName"
    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = procName
        override def description(): String = s"manifest $procName"
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val base = resolveBase(input.getUTF8String(0).toString)
          java.util.List.of(result(out, body(base, input))).iterator()
        }
      }
  }

  private def p(n: String, dt: DataType) = ProcedureParameter.in(n, dt).build()

  /** `col = expr; col2 = expr2` → SET map. Each assignment is parsed
    * by Spark's own expression parser (so the RHS may be any SQL
    * expression, commas included); the `;` separator is recognized
    * only OUTSIDE quoted literals and backticked identifiers, so a
    * string value like `'a;b'` sets cleanly. Duplicate target columns
    * refuse, matching SQL UPDATE's own rule. */
  private def parseAssignments(s: String)
      : Map[String, org.apache.spark.sql.Column] = {
    val parts = scala.collection.mutable.Buffer.empty[String]
    val cur = new StringBuilder
    var quote: Option[Char] = None // inside '…', "…" or `…`
    var esc = false // char after a backslash inside '…'/"…"
    // under spark.sql.parser.escapedStringLiterals=true (the legacy
    // lexing) a backslash is a plain character, NOT an escape — the
    // splitter must lex exactly as the parser that consumes each piece
    val backslashEscapes = !spark.conf
      .get("spark.sql.parser.escapedStringLiterals", "false").toBoolean
    s.foreach { c =>
      quote match {
        case Some(q) =>
          cur += c
          // Spark's default string-literal lexer honors backslash
          // escapes inside single/double quotes ('a\';b' stays one
          // literal); backticked identifiers escape only by ``
          // doubling, which the plain toggle already nets out
          if (esc) esc = false
          else if (backslashEscapes && c == '\\' && q != '`') esc = true
          else if (c == q) quote = None // '' doubling toggles twice: net ok
        case None =>
          if (c == '\'' || c == '"' || c == '`') { quote = Some(c); cur += c }
          else if (c == ';') { parts += cur.result(); cur.clear() }
          else cur += c
      }
    }
    parts += cur.result()
    val pairs = parts.iterator.map(_.trim).filter(_.nonEmpty).map { a =>
      spark.sessionState.sqlParser.parseExpression(a) match {
        case org.apache.spark.sql.catalyst.expressions.EqualTo(
            attr: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute,
            rhs) =>
          attr.name -> org.apache.spark.sql.graft.ColumnShim.column(rhs)
        case _ => sys.error(
          s"assignment must be `col = <expr>` (separate with ';'): $a")
      }
    }.toSeq
    val dup = pairs.groupBy(_._1.toLowerCase).collect {
      case (n, ps) if ps.size > 1 => n
    }
    require(dup.isEmpty,
      s"duplicate SET column(s): ${dup.mkString(", ")} — " +
        "SQL UPDATE refuses duplicate assignments")
    pairs.toMap
  }

  private def out1(n: String, dt: DataType) = new StructType().add(n, dt)

  val all: Map[String, UnboundProcedure] = Seq(
    Proc("compact",
      Seq(p("table", StringType), p("target_files", IntegerType)),
      new StructType().add("files_before", IntegerType)
        .add("files_after", IntegerType).add("version", IntegerType),
      (base, in) => {
        val (b, a, v) = Manifests.compact(spark, base, in.getInt(1))
        InternalRow(b, a, v)
      }),
    Proc("compact_small",
      Seq(p("table", StringType), p("small_bytes", LongType),
        p("target_bytes", LongType)),
      new StructType().add("files_packed", IntegerType)
        .add("files_written", IntegerType).add("version", IntegerType),
      (base, in) => {
        val (pk, w, v) =
          Manifests.compactSmall(spark, base, in.getLong(1), in.getLong(2))
        InternalRow(pk, w, v)
      }),
    Proc("vacuum",
      Seq(p("table", StringType), p("keep_last", IntegerType)),
      new StructType().add("versions_dropped", IntegerType)
        .add("files_deleted", IntegerType),
      (base, in) => {
        val (dropped, files) = Manifests.vacuum(spark, base, in.getInt(1))
        InternalRow(dropped.size, files)
      }),
    Proc("analyze",
      Seq(p("table", StringType), p("columns", StringType)),
      out1("version", IntegerType),
      (base, in) => InternalRow(Manifests.analyze(spark, base,
        in.getUTF8String(1).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq))),
    Proc("analyze_histogram",
      Seq(p("table", StringType), p("columns", StringType)),
      out1("version", IntegerType),
      (base, in) => InternalRow(Manifests.analyzeHistograms(spark, base,
        in.getUTF8String(1).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq))),
    Proc("analyze_bloom",
      Seq(p("table", StringType), p("columns", StringType)),
      out1("version", IntegerType),
      (base, in) => InternalRow(Manifests.analyzeBloom(spark, base,
        in.getUTF8String(1).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq))),
    // partition evolution: `CALL graft.system.evolve_partitions('ns.t',
    // 'months(ts)')` — future writes derive tuples under the new spec,
    // existing files keep planning under theirs, OPTIMIZE re-unifies
    Proc("evolve_partitions",
      Seq(p("table", StringType), p("spec", StringType)),
      out1("version", IntegerType),
      (base, in) => InternalRow(Manifests.evolvePartitions(spark, base,
        in.getUTF8String(1).toString.split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq))),
    Proc("restore",
      Seq(p("table", StringType), p("version", IntegerType)),
      out1("restored_as", IntegerType),
      (base, in) => InternalRow(Manifests.restore(spark, base, in.getInt(1)))),
    Proc("clone",
      Seq(p("table", StringType), p("target", StringType),
        p("version", IntegerType)),
      out1("cloned_as", IntegerType),
      (base, in) => InternalRow(Manifests.shallowClone(spark, base,
        in.getUTF8String(1).toString, in.getInt(2)))),
    Proc("add_constraint",
      Seq(p("table", StringType), p("name", StringType),
        p("predicate", StringType)),
      out1("version", IntegerType),
      (base, in) => InternalRow(Manifests.addConstraint(spark, base,
        in.getUTF8String(1).toString, in.getUTF8String(2).toString))),
    Proc("drop_constraint",
      Seq(p("table", StringType), p("name", StringType)),
      out1("version", IntegerType),
      (base, in) => InternalRow(Manifests.dropConstraint(spark, base,
        in.getUTF8String(1).toString))),
    Proc("drop_column",
      Seq(p("table", StringType), p("column", StringType)),
      out1("version", IntegerType),
      (base, in) => InternalRow(Manifests.dropColumn(spark, base,
        in.getUTF8String(1).toString))),
    // the SQL face of the TIGHTENING direction: Spark's analyzer
    // hard-blocks `ALTER COLUMN ... SET NOT NULL` for DSv2 tables
    // (CheckAnalysis cannot know a connector can prove the data), so
    // the proof-carrying tighten ships as a procedure — Iceberg's
    // pattern for every operation ALTER cannot express. DROP NOT NULL
    // stays on the standard ALTER path.
    Proc("set_not_null",
      Seq(p("table", StringType), p("column", StringType)),
      out1("version", IntegerType),
      (base, in) => InternalRow(Manifests.setColumnNullability(spark, base,
        in.getUTF8String(1).toString, nullable = false))),
    // merge-on-read DML as procedures — the SQL face of the MoR tier
    // for the commands Spark's DML grammar routes to the group-based
    // copy-on-write rewrite (which refuses on vectored tables with
    // "compact() first"): these land as deletion vectors + appended
    // images through the exact Scala primitives, O(changed rows) at
    // any table size. The predicate and assignments are parsed by
    // Spark's own SQL parser; a MERGE source is any registered view.
    Proc("update_mor",
      Seq(p("table", StringType), p("predicate", StringType),
        p("assignments", StringType)),
      new StructType().add("files_touched", IntegerType)
        .add("rows_updated", LongType).add("version", IntegerType),
      (base, in) => {
        val (f, r, v) = Manifests.updateWhereMor(spark, base,
          org.apache.spark.sql.functions.expr(in.getUTF8String(1).toString),
          parseAssignments(in.getUTF8String(2).toString))
        InternalRow(f, r, v)
      }),
    Proc("delete_mor",
      Seq(p("table", StringType), p("predicate", StringType)),
      new StructType().add("rows_deleted", LongType)
        .add("version", IntegerType),
      (base, in) => {
        val (d, v) = Manifests.deleteWhereMor(spark, base,
          org.apache.spark.sql.functions.expr(in.getUTF8String(1).toString))
        InternalRow(d, v)
      }),
    // named refs + write-audit-publish (Iceberg's tag/branch/
    // fast_forward procedure family): `tag` pins a version under a
    // name, `branch` forks an isolated audit table (metadata-only
    // clone; write to it path-addressed, read it via
    // `VERSION AS OF '<name>'`), `fast_forward` publishes the audited
    // branch head onto main as one atomic commit, `drop_ref` releases
    // the pin (and the branch's storage, once unreferenced)
    Proc("tag",
      Seq(p("table", StringType), p("name", StringType),
        p("version", IntegerType)),
      out1("tagged", IntegerType),
      (base, in) => {
        Manifests.createTag(spark, base, in.getUTF8String(1).toString,
          in.getInt(2))
        InternalRow(in.getInt(2))
      }),
    Proc("branch",
      Seq(p("table", StringType), p("name", StringType)),
      out1("forked_at", IntegerType),
      (base, in) => InternalRow(Manifests.createBranch(spark, base,
        in.getUTF8String(1).toString))),
    Proc("fast_forward",
      Seq(p("table", StringType), p("name", StringType)),
      out1("published_as", IntegerType),
      (base, in) => InternalRow(Manifests.fastForward(spark, base,
        in.getUTF8String(1).toString))),
    Proc("drop_ref",
      Seq(p("table", StringType), p("name", StringType)),
      out1("dropped", IntegerType),
      (base, in) => {
        Manifests.dropRef(spark, base, in.getUTF8String(1).toString)
        InternalRow(1)
      }),
    Proc("merge_mor",
      Seq(p("table", StringType), p("source_view", StringType),
        p("keys", StringType)),
      new StructType().add("files_touched", IntegerType)
        .add("rows_merged", LongType).add("version", IntegerType),
      (base, in) => {
        val (f, r, v) = Manifests.mergeMor(spark, base,
          spark.table(in.getUTF8String(1).toString),
          in.getUTF8String(2).toString.split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq)
        InternalRow(f, r, v)
      })
  ).map(pr => pr.procName -> (pr: UnboundProcedure)).toMap
}
