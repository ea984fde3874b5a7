package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One declarative data-quality rule: `check` must hold for a row to
  * be considered good. A NULL check value counts as a VIOLATION —
  * "unknown" data is not known-good data, the conservative reading
  * every expectations framework settles on. */
final case class Expectation(name: String, check: Column)

/** Declarative expectations over any DataFrame — the routing layer the
  * reference's quality checks imply but never build: its verifier
  * counts violations after the fact and prints warnings
  * (`scripts/verify_ingestion.py:302-371` — negative quantities,
  * negative/zero prices, duplicate keys), while its cleaner silently
  * drops the same rows (`scripts/transform_load.py` filter chain).
  * Expectations unify the two: each rule is named, every row is either
  * passed through or quarantined WITH the list of rules it broke, and
  * a hard gate can fail the run when violations exceed a budget.
  *
  * Scale shape: [[annotate]]/[[expectOrDrop]]/[[quarantine]] are pure
  * narrow per-row expressions (codegen'd CASE chains — no UDF, no
  * shuffle, no pass over the data beyond the one the caller was
  * already making). [[expectOrFail]] is ONE aggregate job emitting a
  * single row of per-rule violation counts — the same cost as a
  * COUNT(*), regardless of how many rules are attached. Quarantined
  * rows keep full fidelity, so the dead-letter table replays once the
  * rule or the data is fixed.
  */
object Expectations {

  private def failed(e: Expectation): Column =
    !coalesce(e.check, lit(false))

  /** The row's broken rules as a comma-joined string in declaration
    * order; NULL when the row passes everything. A string, not an
    * array, so the dead-letter table stays trivially portable (CSV,
    * JDBC, an oracle hash compare) — rule names may not contain ','. */
  def violationsCol(exps: Seq[Expectation]): Column = {
    require(exps.nonEmpty, "no expectations declared")
    require(exps.forall(!_.name.contains(",")),
      "expectation names may not contain ','")
    require(exps.map(_.name).distinct.size == exps.size,
      "expectation names must be unique")
    val joined = concat_ws(",", exps.map(e => when(failed(e), lit(e.name))): _*)
    when(joined === "", lit(null).cast("string")).otherwise(joined)
  }

  /** Every row, plus a `violations` column (NULL = clean). */
  def annotate(df: DataFrame, exps: Seq[Expectation]): DataFrame =
    df.withColumn("violations", violationsCol(exps))

  /** Only the rows that pass every expectation (DLT expect_or_drop). */
  def expectOrDrop(df: DataFrame, exps: Seq[Expectation]): DataFrame =
    df.filter(exps.map(e => !failed(e)).reduce(_ && _))

  /** Only the broken rows, each carrying its violation list — the
    * dead-letter/quarantine side of [[expectOrDrop]]'s split. */
  def quarantine(df: DataFrame, exps: Seq[Expectation]): DataFrame =
    annotate(df, exps).filter(col("violations").isNotNull)

  /** Hard gate (DLT expect_or_fail, with a tolerance): one aggregate
    * pass counts rows and per-rule violations; if the violating-row
    * fraction exceeds `maxViolationFraction` the run dies loudly with
    * the per-rule breakdown in the message. Returns the per-rule
    * counts (rule -> violations, plus "" -> total rows) so callers can
    * log them into run metadata even on success. */
  def expectOrFail(df: DataFrame, exps: Seq[Expectation],
      maxViolationFraction: Double = 0.0): Map[String, Long] = {
    require(exps.nonEmpty, "no expectations declared")
    val anyFailed = exps.map(failed).reduce(_ || _)
    // coalesce: SUM over zero rows is NULL, but a zero-row batch has
    // zero violations, not unknown ones
    val aggs = coalesce(sum(when(anyFailed, 1L).otherwise(0L)), lit(0L)).as("__bad") +:
      exps.map(e =>
        coalesce(sum(when(failed(e), 1L).otherwise(0L)), lit(0L)).as(e.name))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*).collect()(0)
    val n = row.getLong(0)
    val bad = row.getLong(1)
    val perRule = exps.zipWithIndex.map { case (e, i) =>
      e.name -> row.getLong(i + 2)
    }.toMap
    val frac = if (n == 0) 0.0 else bad.toDouble / n
    if (frac > maxViolationFraction)
      sys.error(
        f"expectations failed: $bad/$n rows ($frac%.4f > $maxViolationFraction%.4f) — " +
          perRule.filter(_._2 > 0).map { case (k, c) => s"$k=$c" }
            .toSeq.sorted.mkString(", "))
    perRule + ("" -> n)
  }
}
