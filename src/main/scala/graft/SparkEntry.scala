package graft

import graft.etl._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (plus the §7.5 large-scale extensions) is a
  * named entry in [[queries]]; SQL-expressible ones carry a DuckDB oracle in
  * [[oracleSql]] built over the same parquet tables with the same
  * dirt-injection CTE ([[graft.etl.Oracle]]). Column names and orderings are
  * kept identical on both sides (SURVEY §7.4 traps: NULLS FIRST, dow
  * 0=Sunday, and money columns cast DECIMAL→DOUBLE at the output boundary —
  * see [[graft.etl.Oracle]]).
  */
object SparkEntry {

  /** Flagship query (reference EP3 fact build) on sf0.001; driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Transform.factSales(spark, "/root/testdata/sf0.001")

  /** Temp-view registration that works across the app's sessions: the
    * Warehouse/Memo frames are app-scoped, so a caller on a sibling
    * session (bench warm-up workers) must re-root the frame onto ITS
    * session before registering, or its own sql() cannot resolve the
    * view ([[org.apache.spark.sql.graft.SessionShim.rebind]]). */
  private implicit class ViewOps(df: DataFrame) {
    def viewOn(s: SparkSession, name: String): Unit =
      org.apache.spark.sql.graft.SessionShim.rebind(s, df)
        .createOrReplaceTempView(name)
  }

  private def orderedAsc(df: DataFrame, cols: Seq[String]): DataFrame =
    df.orderBy(cols.map(c => col(c).asc_nulls_first): _*)

  private def orderBySql(cols: Seq[String]): String =
    cols.map(c => s"$c NULLS FIRST").mkString(", ")

  /** Output-boundary money representation: internal arithmetic stays exact
    * DECIMAL (drift-free sums at any scale); query OUTPUTS cast money
    * columns to DOUBLE so Spark parquet and the DuckDB oracle hash
    * identically (decimals print '910.6' vs '910.60' depending on the
    * reader — the r1 failure mode; a 2-decimal value ≤1e9 is lossless in
    * a double, and IEEE casting is bit-identical on both sides). */
  private def moneyDouble(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((acc, c) => acc.withColumn(c, col(c).cast("double")))

  private val stagingCols = Staging.columns
  private val factCols = Seq("invoice_no", "product_key", "customer_key",
    "date_key", "invoice_date", "quantity", "unit_price", "total_amount")

  // ---------------------------------------------------------------- core ETL
  private val etlQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "staging" -> ((s, d) =>
      orderedAsc(moneyDouble(Warehouse(s, d).staging, Seq("unit_price")), stagingCols)),
    "clean_nulls" -> ((s, d) =>
      orderedAsc(moneyDouble(Clean.dropNulls(Warehouse(s, d).staging), Seq("unit_price")), stagingCols)),
    "clean_dedup" -> ((s, d) =>
      orderedAsc(moneyDouble(Clean.dedup(Clean.dropNulls(Warehouse(s, d).staging)), Seq("unit_price")), stagingCols)),
    "clean_qty" -> ((s, d) =>
      orderedAsc(moneyDouble(Clean.dropZeroQty(Clean.dedup(Clean.dropNulls(Warehouse(s, d).staging))), Seq("unit_price")), stagingCols)),
    "cleaned" -> ((s, d) =>
      orderedAsc(moneyDouble(Warehouse(s, d).cleaned, Seq("unit_price")), stagingCols)),
    // the clean chain's DROPS, routed instead of discarded: each
    // quarantined row carries the named rules it broke (row-local
    // rules only — dedup is cross-row and stays in the clean chain);
    // pure narrow CASE chains, no extra pass or shuffle
    "expectations_quarantine" -> ((s, d) => {
      val exps = Seq(
        Expectation("required_present",
          col("invoice_no").isNotNull && col("stock_code").isNotNull &&
            col("quantity").isNotNull && col("invoice_date").isNotNull &&
            col("unit_price").isNotNull),
        Expectation("qty_nonzero", col("quantity") =!= 0),
        Expectation("price_positive", col("unit_price") > 0))
      orderedAsc(
        moneyDouble(Expectations.quarantine(Warehouse(s, d).staging, exps)
          .select((stagingCols :+ "violations").map(col): _*), Seq("unit_price")),
        stagingCols :+ "violations")
    }),
    "dim_product" -> ((s, d) => Warehouse(s, d).dimProduct.orderBy("product_key")),
    "dim_customer" -> ((s, d) => Warehouse(s, d).dimCustomer.orderBy("customer_key")),
    "dim_date" -> ((s, d) => Warehouse(s, d).dimDate.orderBy("date_key")),
    "fact_sales" -> ((s, d) =>
      orderedAsc(moneyDouble(Warehouse(s, d).fact, Seq("unit_price", "total_amount")), factCols)),
    // S4/S6 write path: writeWarehouse then read the partitioned fact back
    "fact_roundtrip" -> ((s, d) =>
      orderedAsc(moneyDouble(Transform.factRoundtrip(s, d), Seq("unit_price", "total_amount")), factCols)),
    // S1-S3/E9: dump the staging view as raw CSV (nulls as pandas-style
    // 'nan'), re-ingest through the typed CSV path, and prove the
    // roundtrip is lossless against the parquet-side staging oracle.
    // Dump dirs are scoped per Spark application: two concurrent processes
    // (e.g. Bench and Verify on the same fixture) must not race on a
    // shared overwrite-vs-read path.
    "ingest_csv" -> ((s, d) => {
      val csvDir = dumpDir(s, d, "csv")
      ensureFixture(s, csvDir) { Ingest.dumpCsv(s, d, csvDir) }
      orderedAsc(
        moneyDouble(Ingest.readCsv(s, csvDir).drop("loaded_at"), Seq("unit_price")),
        stagingCols)
    }),
    "ingest_json" -> ((s, d) => {
      val jsonDir = dumpDir(s, d, "json")
      ensureFixture(s, jsonDir) { Ingest.dumpJson(s, d, jsonDir) }
      orderedAsc(
        moneyDouble(Ingest.readJson(s, jsonDir).drop("loaded_at"), Seq("unit_price")),
        stagingCols)
    }),
    "ingest_orc" -> ((s, d) => {
      val orcDir = dumpDir(s, d, "orc")
      ensureFixture(s, orcDir) { Ingest.dumpOrc(s, d, orcDir) }
      orderedAsc(
        moneyDouble(s.read.orc(orcDir), Seq("unit_price")),
        stagingCols)
    }),
    // K2-extension: SCD2 change history (upsert keeps latest; this keeps all)
    "scd2_part_history" -> ((s, d) => Scd.partHistory(s, d)),
    // S6-extension: incremental MV maintenance (truncate-and-reload's
    // 100 TB replacement) — incremental result must hash-match the
    // full-recompute oracle
    "mv_monthly_sales" -> ((s, d) => Mv.monthlySalesViaMv(s, d)),
    // time travel: pin the rollup AS OF its first commit (v0 = batch 0
    // only) — the oracle replays the hash-bucket membership from scratch
    "snapshot_monthly_v0" -> ((s, d) => {
      Mv.monthlySalesViaMv(s, d).count() // build + commit the version chain
      ext.Snapshots.readAt(s, Mv.chainBase(s, d), 0)
        .select(col("year"), col("month"), col("n_sales"),
          expr("cast(cast(rev as decimal(18,2)) as double)").as("revenue"))
        .orderBy("year", "month")
    }),
    // right-to-be-forgotten roundtrip: surgical file-level delete, then
    // read back — the oracle replays NOT(pred) over the clean lineage
    "delete_roundtrip" -> ((s, d) => {
      val p = dumpDir(s, d, "del")
      ensureFixture(s, p) {
        Warehouse(s, d).cleaned.repartition(8)
          .write.mode("overwrite").parquet(p)
        ext.Deletes.deleteWhere(s, p, col("country") === "NATION_7")
      }
      orderedAsc(
        moneyDouble(s.read.parquet(p).select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // the same right-to-be-forgotten through the MANIFEST protocol:
    // one-job rewrite of affected files, atomic version swap, untouched
    // files carried by reference — and the pre-delete version still
    // resolves (ManifestsSpec proves history + sharing; the oracle
    // checks the post-delete content equals NOT(pred) exactly)
    "delete_versioned" -> ((s, d) => {
      val b = mandelFixture(s, d)
      orderedAsc(
        moneyDouble(ext.Manifests.readLatest(s, b).select(stagingCols.map(col): _*),
          Seq("unit_price")),
        stagingCols)
    }),
    // UPDATE ... SET through the manifest — the third DML leg beside
    // delete and merge: the table is range-clustered on country, so the
    // predicate's files are a bounded subset and ONLY those are
    // rewritten (ManifestsSpec pins the strict-subset rewrite + file
    // sharing); set-exprs read the OLD row, null-country rows are left
    // alone, and the oracle replays both as CASE over the clean lineage
    "update_versioned" -> ((s, d) => {
      val b = dumpDir(s, d, "manupdate")
      ensureFixture(s, b) {
        ext.Manifests.commitData(
          Warehouse(s, d).cleaned.repartitionByRange(8, col("country")), b)
        ext.Manifests.updateWhere(s, b, col("country") === "NATION_2",
          Map("country" -> lit("REDACTED"),
            "quantity" -> (col("quantity") + lit(1000))))
      }
      orderedAsc(
        moneyDouble(ext.Manifests.readLatest(s, b).select(stagingCols.map(col): _*),
          Seq("unit_price")),
        stagingCols)
    }),
    // merge-on-read UPDATE: a spread MoR delete stacks vectors first,
    // then updateWhereMor reads THROUGH them (where the CoW update
    // refuses with "compact() first") and lands vector + new images in
    // one commit — zero raw-file rewrites across the whole lineage
    "update_mor" -> ((s, d) => {
      val b = dumpDir(s, d, "manupdmor")
      ensureFixture(s, b) {
        ext.Manifests.commitData(
          Warehouse(s, d).cleaned.repartitionByRange(8, col("country")), b)
        ext.Manifests.deleteWhereMor(s, b, col("quantity") === 13)
        ext.Manifests.updateWhereMor(s, b, col("country") === "NATION_2",
          Map("country" -> lit("REWRITTEN"),
            "quantity" -> (col("quantity") + lit(1000))))
      }
      orderedAsc(
        moneyDouble(ext.Manifests.readLatest(s, b)
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // the same delete as a MERGE-ON-READ deletion vector: zero data
    // files rewritten, the version carries a (file, pos) sidecar and
    // the read anti-joins it against only the touched files
    // (ManifestsSpec pins zero-rewrite + accumulation + materialize;
    // the oracle checks the read equals NOT(pred) exactly, same as the
    // copy-on-write twin)
    "delete_mor" -> ((s, d) => {
      val b = morFixture(s, d)
      orderedAsc(
        moneyDouble(ext.Manifests.readLatest(s, b).select(stagingCols.map(col): _*),
          Seq("unit_price")),
        stagingCols)
    }),
    // change feed across a merge-on-read delete: no data file changed,
    // so the diff comes entirely from deletion-vector churn — rows are
    // read from the touched files at the churned positions only
    "change_feed_mor" -> ((s, d) => {
      val b = morFixture(s, d)
      orderedAsc(
        moneyDouble(ext.Manifests.changesBetween(s, b, 0, 1)
          .select((stagingCols :+ "_change_type").map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // zone-map stats recorded IN the manifest (ANALYZE -> _statsfile):
    // the pruned read plans only files whose zones can match the box —
    // no data footer is opened to decide (ManifestsSpec asserts the
    // strict-subset scan; the oracle checks content equals the exact
    // row filter, pruning being invisible to results by contract)
    "skipping_manifest" -> ((s, d) => {
      val b = manskipFixture(s, d)
      orderedAsc(
        moneyDouble(ext.Manifests.readWhere(s, b, Seq(("quantity", 10, 20)))
          .filter(col("quantity").between(10, 20))
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // the SAME pruned read, but through Catalyst: the manifest table
    // mounted as a HadoopFsRelation over a ManifestFileIndex, so the
    // user-written filter is what prunes files — Catalyst pushes it
    // down, the index evaluates it against the manifest's zone maps,
    // and the surviving parquet scans still get codegen + row-group
    // pushdown (ManifestRelationSpec asserts the scanned-file subset;
    // the oracle checks the exact row filter, pruning invisible)
    "manifest_catalyst_scan" -> ((s, d) => {
      val b = manskipFixture(s, d)
      orderedAsc(
        moneyDouble(s.read.format("graft.sources.manifest").load(b)
          .filter(col("quantity").between(10, 20))
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // PARTITIONED manifest table (Iceberg shape: per-file partition
    // tuples in the manifest, columns stay in the data): the partition
    // predicate prunes files from manifest metadata ALONE — this
    // fixture records no zone maps, so the strict-subset scan
    // ManifestRelationSpec asserts comes entirely from partition
    // pruning (the oracle checks the exact row filter, as ever)
    "manifest_partition_scan" -> ((s, d) => {
      val b = manpartFixture(s, d)
      orderedAsc(
        moneyDouble(s.read.format("manifest").load(b)
          .filter(col("country").isin("NATION_3", "NATION_7"))
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // point lookup through the per-file BLOOM index on a hash-scattered
    // layout (zones span the whole domain there; the bloom plans a
    // strict file subset — ManifestRelationSpec pins the plan). The min
    // invoice keeps the probe value deterministic at every SF; the
    // oracle replays it as a scalar subquery
    "bloom_lookup" -> ((s, d) => {
      val b = manbloomFixture(s, d)
      val rel = s.read.format("manifest").load(b)
      val k = rel.agg(min(col("invoice_no"))).head.getString(0)
      orderedAsc(
        moneyDouble(rel.filter(col("invoice_no") === k)
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // partition-predicate DELETE: the partitions' files retire from
    // the manifest without a data byte read or written (pure files
    // drop whole — ManifestsSpec pins the zero-rewrite invariant); the
    // oracle replays the row filter over the clean lineage
    "drop_partitions" -> ((s, d) => {
      val b = mandropFixture(s, d)
      orderedAsc(
        moneyDouble(s.read.format("manifest").load(b)
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // the SAME relation addressed from PURE SQL: the manifest table
    // registers as a view (shortName "manifest" + the Catalyst
    // relation), and the registered query is one spark.sql string —
    // partition pruning, pushdown and codegen all arrive through the
    // SQL path unchanged
    // metadata-only COUNT(*): the whole-table count of an ANALYZEd
    // manifest table collapses to the stats-sidecar sum at plan time —
    // LocalTableScan, zero data-file opens, no job (ManifestRelationSpec
    // pins the plan; at 100 TB this is the difference between a
    // million-footer scan and one metadata read). The oracle replays
    // the count over the clean lineage: the rewrite must be invisible
    "fast_count" -> ((s, d) => {
      val b = manskipFixture(s, d)
      s.read.format("manifest").load(b)
        .viewOn(s, "man_fastcnt")
      s.sql("SELECT COUNT(*) AS n_rows FROM man_fastcnt")
    }),
    // ...and MIN/MAX/COUNT(col) of the stats-indexed column fold the
    // per-file zone bounds the same way — the date-range / profiling
    // queries every table gets, answered without touching data
    "fast_minmax" -> ((s, d) => {
      val b = manskipFixture(s, d)
      s.read.format("manifest").load(b)
        .viewOn(s, "man_fastmm")
      s.sql("""SELECT MIN(quantity) AS min_qty, MAX(quantity) AS max_qty,
              |       COUNT(quantity) AS n_qty FROM man_fastmm""".stripMargin)
    }),
    // ...FILTERED metadata aggregates: the condition translates to the
    // recorded partition tuples, every file classifies purely (one
    // country per commit), and COUNT/MIN/MAX fold over just the
    // matching files' stats rows — Iceberg's partition-predicate count,
    // exact-or-absent (a mixed file keeps the real scan; the oracle
    // replays the row filter over the clean lineage)
    "fast_count_filtered" -> ((s, d) => {
      val b = manfcntFixture(s, d)
      s.read.format("manifest").load(b)
        .viewOn(s, "man_fcf")
      s.sql("""SELECT COUNT(*) AS n_rows, MIN(quantity) AS min_qty,
              |       MAX(quantity) AS max_qty FROM man_fcf
              |WHERE country = 'NATION_2'""".stripMargin)
    }),
    // ...and SUM(col) of an integral stats key folds the per-file sums
    // recorded at ANALYZE/append — bit-equal to the scan because
    // integer addition is associative; the most common revenue/volume
    // profiling query never touches data
    "fast_sum" -> ((s, d) => {
      val b = manskipFixture(s, d)
      s.read.format("manifest").load(b)
        .viewOn(s, "man_fastsum")
      s.sql("""SELECT SUM(quantity) AS sum_qty, COUNT(*) AS n_rows
              |FROM man_fastsum""".stripMargin)
    }),
    "manifest_sql_scan" -> ((s, d) => {
      val b = manpartFixture(s, d)
      s.read.format("manifest").load(b).viewOn(s, "man_sales")
      s.sql("""SELECT country, COUNT(*) AS n_sales,
              |       CAST(SUM(quantity) AS BIGINT) AS sum_qty
              |FROM man_sales
              |WHERE country IN ('NATION_1', 'NATION_2')
              |GROUP BY country ORDER BY country""".stripMargin)
    }),
    // the WRITE half of the SQL surface: this table exists only through
    // df.write.format("manifest") — a bootstrap save plus an append —
    // so OCC claims, schema recording and the commuting-append metadata
    // derivation all ran on the SQL path. The oracle replays the full
    // clean lineage: bootstrap ∪ append must equal it exactly
    "manifest_writer" -> ((s, d) => {
      val b = manwriteFixture(s, d)
      orderedAsc(
        moneyDouble(s.read.format("manifest").load(b)
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // the FULL SQL DML surface in one lineage: this table exists and
    // mutated ONLY through spark.sql strings against the DSv2 catalog —
    // CTAS bootstrap, UPDATE (CASE snapshot semantics), DELETE (NULL
    // survives) — so OCC claims, CHECK enforcement, group-based
    // copy-on-write rewrites and sidecar maintenance all ran on the
    // pure-SQL path (ManifestCatalogSpec pins the plan properties:
    // zone-pruned surgical rewrites, metadata-only partition deletes)
    "sql_dml_updel" -> ((s, d) => {
      val b = mansqlFixture(s, d)
      orderedAsc(
        moneyDouble(s.sql(s"SELECT * FROM graft.`$b`")
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // SQL MERGE INTO through the catalog: the Scala merge_versioned
    // twin issued as one MERGE statement — update-on-match rewrites,
    // not-matched inserts, all landing through the group-based
    // copy-on-write protocol; same oracle shape as merge_versioned
    "sql_dml_merge" -> ((s, d) => {
      val c = mansqlMergeFixture(s, d)
      s.sql(s"SELECT customer_key, customer_id, country FROM graft.`$c`")
        .orderBy("customer_id")
    }),
    // SQL ADD COLUMN lineage: CREATE → INSERT → ADD COLUMN → INSERT →
    // SELECT, every step a spark.sql string; pre-evolution rows read
    // NULL in the added column via the recorded (metadata-only) schema
    "sql_add_column" -> ((s, d) => {
      val c = mansqlAddColFixture(s, d)
      s.sql(s"SELECT customer_key, customer_id, country, segment " +
        s"FROM graft.`$c`").orderBy("customer_id")
    }),
    // SQL RENAME COLUMN lineage: CREATE → ALTER TABLE RENAME COLUMN →
    // INSERT → SELECT; the rename is metadata-only (zero bytes move) —
    // pre-rename files still hold the bytes under the OLD physical
    // name and the era-composed read aliases them to the new one, so
    // every pre-rename row must surface its real value (a null-fill
    // bug here fails the oracle hash outright)
    "sql_rename_column" -> ((s, d) => {
      val c = mansqlRenameFixture(s, d)
      s.sql(s"SELECT customer_key, customer_id, region " +
        s"FROM graft.`$c`").orderBy("customer_id")
    }),
    // SQL ALTER COLUMN TYPE lineage: CREATE (INT) → ALTER COLUMN TYPE
    // BIGINT → INSERT of values only the wide type holds → SELECT;
    // the widening is metadata-only (same files, widened recorded
    // schema — the parquet reader promotes the narrow era natively),
    // and the SELECT reads both eras as BIGINT
    "sql_widen_column" -> ((s, d) => {
      val c = mansqlWidenFixture(s, d)
      s.sql(s"SELECT customer_id, code, country FROM graft.`$c`")
        .orderBy("customer_id")
    }),
    // the MoR DML tier through pure SQL (CALL procedures): a MoR
    // delete stacks vectors, then update_mor reads THROUGH them and
    // lands its SETs as vectors + images — where SQL UPDATE's group
    // rewrite refuses until compact()
    "sql_mor_dml" -> ((s, d) => {
      val b = mansqlMorDmlFixture(s, d)
      orderedAsc(
        moneyDouble(s.sql(s"SELECT * FROM graft.`$b`")
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // plain MERGE INTO a VECTORED table: the analyzer's SupportsDelta
    // rewrite lands it merge-on-read — matched target rows vector out
    // by (file, pos), updates + inserts append as image files, one
    // atomic commit. The CALL procedure is compat; this is the native
    // spelling.
    "sql_mor_merge" -> ((s, d) => {
      val b = mansqlMorMergeFixture(s, d)
      s.sql(s"SELECT customer_key, customer_id, country FROM graft.`$b`")
        .orderBy("customer_id")
    }),
    // metadata COUNT(*) over a VECTORED version: the table carries
    // deletion vectors, yet the count never opens a data file —
    // sidecar n_rows minus DV bitmap cardinalities, exact (the oracle
    // recomputes the count with the delete expressed relationally)
    "fast_count_mor" -> ((s, d) => {
      val b = manfcMorFixture(s, d)
      s.sql(s"SELECT COUNT(*) AS n_rows FROM graft.`$b`")
    }),
    // CDC-driven MV maintenance: the monthly rollup seeded at v0 and
    // kept current by FOLDING THE CHANGE FEED (delete+insert row
    // images from the MoR DELETE + native UPDATE) at grain — the
    // oracle recomputes the rollup from scratch with the same
    // mutations expressed relationally, so a sign error, a dropped
    // group or a leaked deleted row hash-fails
    "mv_cdc_refresh" -> ((s, d) => {
      val b = manMvCdcFixture(s, d)
      val mv0 = s"${b}_mv0"
      ensureFixture(s, mv0) {
        etl.Mv.partialOf(ext.Manifests.readAt(s, b, 0))
          .write.mode("overwrite").parquet(mv0)
      }
      val latest = ext.Manifests.latestVersion(s, b).get
      etl.Mv.formatted(etl.Mv.applyChangesFrame(s, mv0,
        ext.Manifests.changesBetween(s, b, 0, latest)))
    }),
    // name-addressed time travel: the table mutated TWICE after the
    // tag pinned v0, and this SELECT reads `VERSION AS OF 'baseline'`
    // — the Iceberg tag-read UX; content must equal the original
    // lineage exactly (the mutations must NOT leak through the ref)
    "sql_read_tag" -> ((s, d) => {
      val b = mansqlTagFixture(s, d)
      orderedAsc(
        moneyDouble(s.sql(
          s"SELECT * FROM graft.`$b` VERSION AS OF 'baseline'")
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // the sync-from-source MERGE (WHEN NOT MATCHED BY SOURCE): the
    // full three-clause grammar in one statement against a VECTORED
    // table — matched rows refresh, new rows insert, rows gone from
    // the source delete or flag, all merge-on-read through the
    // SupportsDelta operation (DeltaDmlSpec pins both paths)
    "sql_merge_sync" -> ((s, d) => {
      val b = mansqlMergeSyncFixture(s, d)
      s.sql(s"SELECT customer_key, customer_id, country FROM graft.`$b`")
        .orderBy("customer_id")
    }),
    // the pure-SQL STAR JOIN through the catalog: fact × dim_customer
    // × dim_date addressed by graft. names only — no hints, no
    // DataFrame broadcast() call; the DSv2 statistics tier (exact
    // manifest row counts + sidecar column stats) is what lets the
    // planner auto-broadcast both dims (plan pinned by
    // ManifestStatsSpec/PlanContractSpec)
    "sql_star_join" -> ((s, d) => {
      val (f, c, dd) = mansqlStarFixture(s, d)
      s.sql(
        s"""SELECT c.country, d.year, COUNT(*) AS n_sales,
           |  CAST(CAST(SUM(f.total_amount) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
           |FROM graft.`$f` f
           |JOIN graft.`$c` c ON f.customer_key = c.customer_key
           |JOIN graft.`$dd` d ON f.date_key = d.date_key
           |GROUP BY c.country, d.year
           |ORDER BY c.country, d.year""".stripMargin)
    }),
    // the STORAGE-PARTITIONED join (Iceberg SPJ): two catalog tables
    // committed in the partition-SPLIT layout (every file holds one
    // country tuple — the purity proof), joined on their shared
    // partition key with ZERO Exchange on either side: the scan
    // reports KeyGroupedPartitioning from the manifest's recorded
    // tuples, Spark aligns the keyed partitions, and the per-country
    // aggregation above the join rides the same grouping shuffle-free
    // (SpjSpec pins the exchange-free plan; the oracle replays the
    // join relationally — layout is invisible to results)
    "sql_spj_join" -> ((s, d) => {
      val (a, b) = manspjFixture(s, d)
      s.sql(
        // the MERGE hint only picks the JOIN STRATEGY (the tiny stats
      // side would otherwise broadcast): eliminating the exchanges is
      // the part no hint can do — that is the key-grouped report
      s"""SELECT /*+ MERGE(t) */ c.country, COUNT(*) AS n_customers,
           |  CAST(SUM(t.n_customers) AS BIGINT) AS sum_n,
           |  MIN(t.first_id) AS first_id
           |FROM graft.`$b` c JOIN graft.`$a` t ON c.country = t.country
           |GROUP BY c.country
           |ORDER BY c.country""".stripMargin)
    }),
    // HIDDEN PARTITIONING (Iceberg transform parity): the cleaned
    // frame CTAS'd as a catalog table PARTITIONED BY
    // (months(invoice_date)) — no derived year/month columns in the
    // schema; the month predicate lands on the SOURCE date column and
    // the manifest lowers it to month-tuple file pruning
    // (HiddenPartitionSpec counts the planned files; the oracle
    // replays the same predicate relationally — layout is invisible
    // to results)
    "sql_hidden_partition" -> ((s, d) => {
      val b = manhpFixture(s, d)
      s.sql(
        s"""SELECT year(invoice_date) AS year, month(invoice_date) AS month,
           |  COUNT(*) AS n_sales, CAST(SUM(quantity) AS BIGINT) AS sum_qty
           |FROM graft.`$b`
           |WHERE invoice_date >= DATE '1995-01-01'
           |  AND invoice_date < DATE '1996-01-01'
           |GROUP BY year(invoice_date), month(invoice_date)
           |ORDER BY year, month""".stripMargin)
    }),
    // PARTITION EVOLUTION end-to-end through SQL: a yearly table
    // outgrows its spec — CALL evolve_partitions moves it to monthly
    // (metadata-only), the pre-1995 files keep planning under their
    // YEAR tuples, the post-1995 INSERT derives MONTH tuples, and the
    // rollup over both eras must be exactly the relational answer —
    // a dropped era, a double-planned file or a wrong-group lowering
    // all hash-fail
    "sql_evolve_partitions" -> ((s, d) => {
      val b = manevoFixture(s, d)
      s.sql(
        s"""SELECT year(invoice_date) AS year, month(invoice_date) AS month,
           |  COUNT(*) AS n_sales, CAST(SUM(quantity) AS BIGINT) AS sum_qty
           |FROM graft.`$b`
           |WHERE invoice_date >= DATE '1996-06-01'
           |GROUP BY year(invoice_date), month(invoice_date)
           |ORDER BY year, month""".stripMargin)
    }),
    // transform-ALIGNED metadata DML: a month-boundary DELETE on a
    // monthly table retires whole files from the recorded tuples —
    // the fixture REQUIRES zero new data files (the O(metadata)
    // retention-job shape), and the surviving content must equal the
    // relational complement exactly
    "sql_drop_months" -> ((s, d) => {
      val b = manmdropFixture(s, d)
      orderedAsc(
        moneyDouble(s.table(s"graft.`$b`")
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // aligned metadata DML ACROSS a partition evolution: the monthly
    // table evolves to daily, then a year-boundary DELETE — aligned
    // under BOTH eras — retires the legacy months' files from their
    // OWN spec group's tuples (zero new data files; the fixture
    // requires it). The surviving content must equal the relational
    // complement exactly — a mis-lowered legacy-group predicate
    // drops or keeps the wrong granule and hash-fails
    "sql_evolve_drop" -> ((s, d) => {
      val b = manevodropFixture(s, d)
      orderedAsc(
        moneyDouble(s.table(s"graft.`$b`")
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // the delta-encoded manifest log end-to-end: a long pure-SQL
    // lineage (CTAS, 6 INSERTs crossing the chain cap twice, ADD
    // COLUMN, DELETE, VACUUM cutting the chain, one more INSERT) whose
    // final state must still resolve exactly through whatever mix of
    // flat and delta manifests the lineage left behind
    "sql_delta_log" -> ((s, d) => {
      val c = mansqlDlogFixture(s, d)
      s.sql(s"SELECT customer_key, customer_id, country, flag " +
        s"FROM graft.`$c`").orderBy("customer_id")
    }),
    // NOT NULL lifecycle, pure SQL: CTAS → CALL set_not_null (proof:
    // zero live nulls, metadata-only commit) → INSERT under the
    // enforced bit → ALTER COLUMN DROP NOT NULL → INSERT of a row
    // only the relaxed contract admits; the SELECT carries that null
    // row, so a lost relax (or a lost insert) hash-fails
    "sql_not_null" -> ((s, d) => {
      val c = mansqlNnFixture(s, d)
      s.sql(s"SELECT customer_key, customer_id, country FROM graft.`$c`")
        .orderBy("customer_id")
    }),
    // DV-aware catalog reads: the table took a country-aligned
    // merge-on-read delete (full-file elision retires the pure files,
    // vectors the boundary), a SQL DELETE, then an UNclustered MoR
    // delete that leaves every file genuinely vectored — this SELECT
    // reads THROUGH the stacked vectors via the V1 liveRead scan, no
    // compact() wall anywhere
    "sql_select_mor" -> ((s, d) => {
      val b = mansqlMorFixture(s, d)
      orderedAsc(
        moneyDouble(s.sql(s"SELECT * FROM graft.`$b`")
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // partition-scoped INSERT OVERWRITE: the NATION_2 partition was
    // replaced TWICE (static PARTITION spec) — untouched partitions
    // carried by reference both times, each overwrite one atomic
    // commit, and the second replaces (never accumulates on) the first
    "sql_insert_overwrite" -> ((s, d) => {
      val b = mansqlOvwFixture(s, d)
      orderedAsc(
        moneyDouble(s.sql(s"SELECT * FROM graft.`$b`")
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // the BATCH face of the change feed (Delta's table_changes):
    // versions (0, 2] of a pure-SQL lineage — an INSERT and a CoW
    // UPDATE — read as one relation of tagged change rows through
    // `spark.read.option(...).table("graft.`<path>`.changes")`;
    // carried-identical rows in the UPDATE's rewritten files cancel in
    // the content diff, so the feed is exactly the churn
    "sql_changes_between" -> ((s, d) => {
      val c = mansqlCdfFixture(s, d)
      // the face also serves `_commit_version`/`_commit_timestamp`
      // (Delta table_changes parity, CdfProvenanceSpec pins them);
      // the registered result projects the deterministic columns —
      // a wall-clock commit stamp can never hash-match an oracle
      s.read.option("startingVersion", "0").option("endingVersion", "2")
        .table(s"graft.`$c`.changes")
        .drop("_commit_version", "_commit_timestamp")
        .orderBy(col("_change_type"), col("customer_id"))
    }),
    // time travel through the SAME relation: versionAsOf 0 of the
    // versioned-delete table is the table BEFORE the delete — the
    // oracle replays the full clean lineage, proving the deleted rows
    // are still exactly recoverable from history
    "manifest_time_travel" -> ((s, d) => {
      val b = mandelFixture(s, d)
      orderedAsc(
        moneyDouble(s.read.format("graft.sources.manifest")
          .option("versionAsOf", "0").load(b)
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // RESTORE: the table was deleted-from then rolled back to v0 by
    // publishing v0's content as a NEW version (metadata-only, files by
    // reference, history intact) — latest must equal the full clean
    // lineage, the deleted rows exactly recovered
    "restore_table" -> ((s, d) => {
      val (b, _) = manrestoreFixture(s, d)
      orderedAsc(
        moneyDouble(s.read.format("manifest").load(b)
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // shallow CLONE pinned at the PRE-restore (post-delete) version:
    // the zero-copy fork carries that snapshot's exact content and its
    // own independent history from then on
    "clone_table" -> ((s, d) => {
      val (_, c) = manrestoreFixture(s, d)
      orderedAsc(
        moneyDouble(s.read.format("manifest").load(c)
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // metadata-only DROP COLUMN: latest reads the SAME files under a
    // narrowed recorded schema — zero bytes moved, the column gone
    // everywhere (time travel keeps it; ManifestsSpec pins tombstones)
    "drop_column" -> ((s, d) => {
      val b = mandropcolFixture(s, d)
      val cols = stagingCols.filterNot(_ == "description")
      orderedAsc(
        moneyDouble(s.read.format("manifest").load(b)
          .select(cols.map(col): _*), Seq("unit_price")),
        cols)
    }),
    // co-bucketed fact⋈dim: both tables were committed bucketed on
    // stock_code, the relation exposes the layout as a BucketSpec, and
    // Catalyst plans join AND aggregation with ZERO exchange — the
    // recurring warehouse shuffle pre-paid once at write time
    // (ManifestRelationSpec asserts the no-exchange plan; the oracle
    // replays the join, bucketing being invisible to results)
    "bucketed_join" -> ((s, d) => {
      val (bf, bd) = bucketedFixture(s, d)
      val facts = s.read.format("graft.sources.manifest").load(bf)
      val dim = s.read.format("graft.sources.manifest").load(bd)
      facts.join(dim, "stock_code")
        .groupBy("stock_code", "description")
        .agg(count(lit(1)).as("n_sales"),
          sum(col("quantity")).cast("long").as("sum_qty"))
        .orderBy("stock_code")
    }),
    // copy-on-write MERGE through the manifest protocol: dim_customer
    // upserted with relocations + brand-new customers in one atomic
    // version; the oracle replays upsert semantics as
    // updates UNION ALL (target ANTI JOIN updates)
    "merge_versioned" -> ((s, d) => {
      val b = manmergeFixture(s, d)
      ext.Manifests.readLatest(s, b)
        .select("customer_key", "customer_id", "country")
        .orderBy("customer_id")
    }),
    // merge-on-read MERGE: the table carries a NATION_7 deletion
    // vector when the upsert lands — mergeMor reads through it,
    // vectors the matched rows and appends the whole batch (updates +
    // inserts) as fresh files; the CoW merge would refuse here
    "merge_mor" -> ((s, d) => {
      val b = manmergeMorFixture(s, d)
      ext.Manifests.readLatest(s, b)
        .select("customer_key", "customer_id", "country")
        .orderBy("customer_id")
    }),
    // the merge's v0->v1 feed with row identity DECLARED: keyed on
    // customer_id, the relocated customers' old/new images pair up as
    // update_preimage/update_postimage while the brand-new customers
    // stay plain inserts — the Delta-CDF tagging a downstream MERGE
    // consumer needs (bare delete+insert pairs would transiently drop
    // updated rows on replication)
    "change_feed_keyed" -> ((s, d) => {
      val b = manmergeFixture(s, d)
      ext.Manifests.changesBetweenKeyed(s, b, 0, 1, Seq("customer_id"))
        .select("customer_key", "customer_id", "country", "_change_type")
        .orderBy("customer_id", "_change_type")
    }),
    // the WRITE-PATH update classification (graft.cdf.updateImages):
    // the per-version replay re-emits update_preimage/update_postimage
    // from what the SupportsDelta writer RECORDED (`_cdcupd` + the cdc
    // rowId sidecar) — no keys needed at read time, unlike
    // change_feed_keyed's diff-side pairing, and preimages read from
    // the parent version's retained files. Same logical content as the
    // keyed feed on this fixture, so the same oracle shape pins both
    // mechanisms against each other.
    "change_feed_upd_images" -> ((s, d) => {
      val b = mancdfUpdFixture(s, d)
      ext.Manifests.changesAt(s, b, 1)
        .select("customer_key", "customer_id", "country", "_change_type")
        .orderBy("customer_id", "_change_type")
    }),
    // change-data-feed between manifest versions: the v1->v2 diff of
    // the delete_versioned table (v1 = ANALYZE) is exactly the deleted
    // rows tagged 'delete' — the manifest prunes the diff to
    // non-shared files, and the zone stats prune the exceptAll to
    // range-overlapping boundary pairs
    "change_feed" -> ((s, d) => {
      val b = mandelFixture(s, d)
      orderedAsc(
        moneyDouble(ext.Manifests.changesBetween(s, b, 1, 2)
          .select((stagingCols :+ "_change_type").map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // small-file compaction roundtrip: 64 fragment files -> 4, content
    // row-exact against the clean-lineage oracle
    "compact_roundtrip" -> ((s, d) => {
      val frag = dumpDir(s, d, "frag")
      val comp = dumpDir(s, d, "compact")
      ensureFixture(s, comp, frag) {
        Warehouse(s, d).cleaned.repartition(64).write.mode("overwrite").parquet(frag)
        val (b, a) = ext.Layout.compact(s, frag, comp, 4)
        require(b == 64 && a == 4, s"compaction shape unexpected: $b -> $a files")
      }
      orderedAsc(
        moneyDouble(s.read.parquet(comp).select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // AUTO-compaction roundtrip (Delta's autoCompact as a policy):
    // the cleaned lineage lands as 1 seed + 7 hash-sliced appends with
    // graft.autocompact.minFiles armed, so the policy fires its scoped
    // rewrites MID-LINEAGE — the oracle pins that every bin-pack was
    // content-preserving (same rows as the clean lineage, exactly)
    "autocompact_roundtrip" -> ((s, d) => {
      val b = dumpDir(s, d, "manac")
      ensureFixture(s, b) {
        val cl = Warehouse(s, d).cleaned
        val sliced = cl.withColumn("_sl",
          pmod(operators.Dedup.fastHash60(s, col("invoice_no")),
            lit(8L)).cast("int"))
        ext.Manifests.commitData(
          sliced.filter(col("_sl") === 0).drop("_sl").coalesce(1), b)
        s.conf.set("graft.autocompact.minFiles", "4")
        try (1 to 7).foreach(i =>
          ext.Manifests.appendBatch(
            sliced.filter(col("_sl") === i).drop("_sl").coalesce(1),
            b, i.toLong, "acq"): Unit)
        finally s.conf.unset("graft.autocompact.minFiles")
        val v = ext.Manifests.latestVersion(s, b).get
        require((0 to v).exists(w =>
          ext.Manifests.tagOf(s, b, w).contains("autocompact")),
          "autocompact fixture never tripped the policy")
      }
      orderedAsc(
        moneyDouble(ext.Manifests.readLatest(s, b)
          .select(stagingCols.map(col): _*), Seq("unit_price")),
        stagingCols)
    }),
    // schema evolution through the MANIFEST: the append records the
    // union schema in the version metadata, so the read null-fills old
    // files from ONE manifest-level schema — no mergeSchema footer
    // sweep over 100k files (same logical result as ingest_evolve, a
    // different — and at scale the only tenable — mechanism)
    "evolve_manifest" -> ((s, d) => {
      val b = dumpDir(s, d, "manevolve")
      ensureFixture(s, b) {
        val st = Warehouse(s, d).staging
        val codeNum = expr("try_cast(stock_code AS int)")
        val even = coalesce(codeNum % 2 === 0,
          length(col("stock_code")) % 2 === 0)
        ext.Manifests.commitData(st.filter(even).drop("country"), b)
        ext.Manifests.appendBatch(
          st.filter(!even).withColumn("channel",
            concat(lit("web-"), (codeNum % 3).cast("string"))), b, 0L)
      }
      orderedAsc(
        moneyDouble(ext.Manifests.readLatest(s, b)
          .select((stagingCols :+ "channel").map(col): _*), Seq("unit_price")),
        stagingCols :+ "channel")
    }),
    // S5-extension: schema evolution across parquet batches (mergeSchema)
    "ingest_evolve" -> ((s, d) => {
      val evoDir = dumpDir(s, d, "evolve")
      ensureFixture(s, evoDir) { Ingest.dumpEvolved(s, d, evoDir) }
      val merged = s.read.option("mergeSchema", "true")
        .parquet(s"$evoDir/b1", s"$evoDir/b2")
      orderedAsc(
        moneyDouble(merged.select((stagingCols :+ "channel").map(col): _*), Seq("unit_price")),
        stagingCols :+ "channel")
    }),
  )

  /** Fixture paths are shared ACROSS processes of the same build
    * ([[ext.Dfs.codeEpoch]] instead of the applicationId): the first
    * process to need a fixture builds it under [[ensureFixture]]'s
    * claim/marker protocol, every later one — Verify after Bench, the
    * driver's replay after the builder's closing gate — reads it for
    * free. This is what caps the gate's warm-up at ONE fixture build
    * per code change per host (the r16 warm-up wall was ~40 lineages
    * rebuilt per JVM). */
  private def dumpDir(s: SparkSession, d: String, fmt: String): String =
    s"${ext.Dfs.scratchBase}/graftfix_${ext.Dfs.codeEpoch}_${fmt}_" +
      new org.apache.hadoop.fs.Path(d).getName + "_" +
      ext.Dfs.datasetKey(s, d)

  /** [[ext.Dfs.buildOnce]] — build-once cross-process fixture gate. */
  private def ensureFixture(s: SparkSession, paths: String*)
      (build: => Unit): Unit =
    ext.Dfs.buildOnce(s, paths: _*)(build)

  /** The versioned-delete fixture manifest table (v0 = cleaned, v1 =
    * ANALYZE on the cluster key, v2 = post-delete), shared by
    * `delete_versioned` (reads latest) and `change_feed` (diffs
    * v1 -> v2, zone-stat-pruned). Range-clustered on the delete key:
    * the production layout for a table that takes surgical deletes —
    * the delete rewrites ONE file and the change feed diffs one file
    * pair instead of the whole table (measured at 100x: a scattered
    * layout made the v0-v1 diff exceptAll 60M rows a side, 176 s;
    * clustered it reads only the affected pair). Content is identical
    * either way — the oracle does not see the layout. */
  private def mandelFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mandel")
    ensureFixture(s, b) {
      ext.Manifests.commitData(
        Warehouse(s, d).cleaned.repartitionByRange(8, col("country")), b)
      // zone stats on the cluster key (v1, metadata-only): the change
      // feed's content diff prunes its exceptAll inputs to range-
      // overlapping file pairs with these — the production shape
      ext.Manifests.analyze(s, b, Seq("country"))
      ext.Manifests.deleteWhere(s, b, col("country") === "NATION_7") // v2
    }
    b
  }

  /** Restore/clone fixture: v0 = the clean lineage, v1 = DELETE
    * NATION_5, v2 = RESTORE to v0 (rollback by manifest reference —
    * zero data bytes moved). The clone forks the post-delete state
    * (v1) into its own table: `restore_table` proves the rollback
    * recovered every deleted row; `clone_table` proves the fork pinned
    * its version's exact content. */
  private def manrestoreFixture(s: SparkSession, d: String): (String, String) = {
    val b = dumpDir(s, d, "manrestore")
    val c = dumpDir(s, d, "manclone")
    ensureFixture(s, b, c) {
      ext.Manifests.commitData(
        Warehouse(s, d).cleaned.repartitionByRange(8, col("country")), b)
      ext.Manifests.deleteWhere(s, b, col("country") === "NATION_5")
      ext.Manifests.restore(s, b, 0)
      ext.Manifests.shallowClone(s, b, c, 1)
    }
    (b, c)
  }

  /** Drop-column fixture: the clean lineage committed whole, then
    * `description` dropped by metadata alone — the query proves every
    * read path honors the narrowed recorded schema over unchanged
    * files. */
  private def mandropcolFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mandropcol")
    ensureFixture(s, b) {
      ext.Manifests.commitData(
        Warehouse(s, d).cleaned.repartitionByRange(8, col("invoice_date")), b)
      ext.Manifests.dropColumn(s, b, "description")
    }
    b
  }

  /** The write-path fixture: a manifest table built ENTIRELY through
    * `df.write.format("manifest")` — bootstrap save of the clean lineage
    * minus NATION_3, then a mode("append") of the NATION_3 slice — so
    * `manifest_writer` proves the SQL write surface commits through the
    * same OCC/schema/metadata protocol as the Scala API. */
  private def manwriteFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manwrite")
    ensureFixture(s, b) {
      val cleaned = Warehouse(s, d).cleaned
      cleaned.filter(!(col("country") <=> "NATION_3")).repartition(8)
        .write.format("manifest").save(b)
      cleaned.filter(col("country") <=> "NATION_3").repartition(2)
        .write.format("manifest").mode("append").save(b)
    }
    b
  }

  /** The quantity-clustered manifest table with zone maps ANALYZEd
    * into the version metadata — shared by `skipping_manifest` (pruned
    * read via the box API) and `manifest_catalyst_scan` (the same
    * pruning driven by Catalyst's pushed-down filters through
    * [[graft.ext.ManifestFileIndex]]). */
  private def manskipFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manskip")
    ensureFixture(s, b) {
      ext.Manifests.commitData(
        Warehouse(s, d).cleaned.repartitionByRange(8, col("quantity")), b)
      ext.Manifests.analyze(s, b, Seq("quantity"))
    }
    b
  }

  /** Country-partitioned manifest table (Iceberg shape:
    * [[graft.ext.Manifests.commitDataPartitioned]]) — shared by
    * `manifest_partition_scan` (Catalyst read pruned by partition
    * metadata alone; deliberately NO zone maps here) and
    * `manifest_sql_scan` (the same relation from pure SQL). */
  private def manpartFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manpart")
    ensureFixture(s, b) {
      ext.Manifests.commitDataPartitioned(
        Warehouse(s, d).cleaned, b, Seq("country"), filesPerWrite = 8)
    }
    b
  }

  /** Hash-scattered manifest table with a bloom index on invoice_no
    * ([[graft.ext.Manifests.analyzeBloom]]) — the layout where min/max
    * zones prune nothing and only the bloom can answer a point
    * lookup. */
  private def manbloomFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manbloom")
    ensureFixture(s, b) {
      ext.Manifests.commitData(
        Warehouse(s, d).cleaned.repartition(8, hash(col("invoice_no"))), b)
      ext.Manifests.analyzeBloom(s, b, Seq("invoice_no"))
    }
    b
  }

  /** Country-partitioned table after a partition-predicate DELETE
    * ([[graft.ext.Manifests.dropPartitions]]): partition-pure files
    * retired by manifest arithmetic alone. */
  private def mandropFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mandrop")
    ensureFixture(s, b) {
      ext.Manifests.commitDataPartitioned(
        Warehouse(s, d).cleaned, b, Seq("country"), filesPerWrite = 8)
      ext.Manifests.dropPartitions(s, b,
        col("country").isin("NATION_3", "NATION_8"))
    }
    b
  }

  /** Two manifest tables bucketed the same way on stock_code — the
    * cleaned lineage (fact side, quantity only) and dim_product — so
    * the registered join plans without any exchange. */
  private def bucketedFixture(s: SparkSession, d: String): (String, String) = {
    val bf = dumpDir(s, d, "bkfact")
    val bd = dumpDir(s, d, "bkdim")
    ensureFixture(s, bf, bd) {
      val wh = Warehouse(s, d)
      ext.Manifests.commitDataBucketed(
        wh.cleaned.select("stock_code", "quantity"), bf, Seq("stock_code"), 8,
        sortBy = Seq("stock_code"))
      ext.Manifests.commitDataBucketed(wh.dimProduct, bd, Seq("stock_code"), 8,
        sortBy = Seq("stock_code"))
    }
    (bf, bd)
  }

  /** The upserted-dim fixture (v0 = dim_customer, v1 = one atomic MERGE
    * carrying relocations of NATION_3 + brand-new NATION_5B customers) —
    * shared by `merge_versioned` (reads v1) and `change_feed_keyed`
    * (classifies the v0->v1 diff by customer_id). */
  /** Partition-pure metadata-count fixture: the clean lineage landed
    * one COUNTRY PER COMMIT (bootstrap + appends), so every data file
    * holds exactly one partition tuple and ANY country predicate
    * classifies every file purely — the layout under which a filtered
    * COUNT/MIN/MAX answers from manifest metadata alone. ANALYZE
    * records n_rows + quantity zones (and per-file sums) per file. */
  private def manfcntFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manfcnt")
    ensureFixture(s, b) {
      val cleaned = Warehouse(s, d).cleaned
      val countries = cleaned.select("country").distinct().collect()
        .map(r => Option(r.getString(0))).toSeq.sortBy(_.getOrElse(""))
      def slice(c: Option[String]) =
        c.fold(cleaned.filter(col("country").isNull))(v =>
          cleaned.filter(col("country") === v))
      ext.Manifests.commitDataPartitioned(slice(countries.head), b,
        Seq("country"), filesPerWrite = 2)
      countries.tail.zipWithIndex.foreach { case (c, i) =>
        ext.Manifests.appendBatch(slice(c), b, i.toLong)
      }
      ext.Manifests.analyze(s, b, Seq("quantity"))
    }
    b
  }

  /** Lazily register the DSv2 catalog (idempotent; catalogs
    * instantiate on first reference, so a runtime conf set is all the
    * installation the SQL DML surface needs). */
  private def registerCatalog(s: SparkSession): Unit =
    s.conf.set("spark.sql.catalog.graft",
      "graft.sources.manifest.ManifestCatalog")

  /** Pure-SQL DML fixture: CTAS bootstrap of the clean lineage
    * (range-clustered on country so the DML is file-surgical), then
    * UPDATE and DELETE — every statement a spark.sql string. */
  private def mansqlFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mansqldml")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).cleaned.repartitionByRange(8, col("country"))
        .viewOn(s, "graft_sqldml_src")
      s.sql(s"CREATE TABLE graft.`$b` AS SELECT * FROM graft_sqldml_src")
      s.sql(s"UPDATE graft.`$b` SET quantity = quantity + 500, " +
        "country = 'SQLLAND' WHERE country = 'NATION_4'")
      s.sql(s"DELETE FROM graft.`$b` WHERE country = 'NATION_6'")
    }
    b
  }

  /** SQL MERGE fixture — [[manmergeFixture]]'s twin with the upsert
    * issued as a MERGE INTO statement through the catalog. */
  private def mansqlMergeFixture(s: SparkSession, d: String): String = {
    val c = dumpDir(s, d, "mansqlmrg")
    registerCatalog(s)
    ensureFixture(s, c) {
      Warehouse(s, d).dimCustomer.repartition(8)
        .viewOn(s, "graft_sqlmrg_dim")
      s.sql(s"CREATE TABLE graft.`$c` AS SELECT customer_key, " +
        "customer_id, country FROM graft_sqlmrg_dim")
      val dim = ext.Manifests.readAt(s, c, 0)
      dim.filter(col("country") === "NATION_3")
        .withColumn("country", lit("RELOCATED"))
        .unionByName(dim.filter(col("country") === "NATION_5")
          .select((col("customer_key") + 1000000L).as("customer_key"),
            concat(col("customer_id"), lit("_B")).as("customer_id"),
            lit("NATION_5B").as("country")))
        .viewOn(s, "graft_sqlmrg_upd")
      s.sql(s"""MERGE INTO graft.`$c` t USING graft_sqlmrg_upd u
               |ON t.customer_id = u.customer_id
               |WHEN MATCHED THEN UPDATE SET t.customer_key = u.customer_key,
               |  t.country = u.country
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    c
  }

  /** Pure-SQL additive schema evolution: CREATE (CTAS of the pre-
    * evolution batch) → ALTER TABLE ADD COLUMN → INSERT carrying the
    * new column — the ADD COLUMN is a metadata-only commit that carries
    * the first batch's files by reference, so the pre-evolution rows
    * null-fill `segment` through the recorded read schema while zero
    * bytes move (the 100 TB contract for additive DDL). */
  private def mansqlAddColFixture(s: SparkSession, d: String): String = {
    val c = dumpDir(s, d, "mansqladdc")
    registerCatalog(s)
    ensureFixture(s, c) {
      Warehouse(s, d).dimCustomer
        .select("customer_key", "customer_id", "country")
        .repartition(4).viewOn(s, "graft_sqladdc_dim")
      s.sql(s"CREATE TABLE graft.`$c` AS SELECT * FROM graft_sqladdc_dim " +
        "WHERE country IS DISTINCT FROM 'NATION_5'")
      s.sql(s"ALTER TABLE graft.`$c` ADD COLUMN segment STRING")
      s.sql(s"INSERT INTO graft.`$c` SELECT customer_key, customer_id, " +
        "country, 'NEW' AS segment FROM graft_sqladdc_dim " +
        "WHERE country = 'NATION_5'")
    }
    c
  }

  /** Pure-SQL RENAME COLUMN: CTAS of the pre-rename batch → ALTER
    * TABLE RENAME COLUMN country TO region (metadata-only: same files,
    * renamed recorded schema, one rename event remembering which files
    * predate it) → INSERT of a post-rename batch (files physically
    * holding `region`). The registered SELECT reads both eras under
    * the new name — the pre-rename files through the era-composed
    * alias, the post-rename files plainly. */
  private def mansqlRenameFixture(s: SparkSession, d: String): String = {
    val c = dumpDir(s, d, "mansqlren")
    registerCatalog(s)
    ensureFixture(s, c) {
      Warehouse(s, d).dimCustomer
        .select("customer_key", "customer_id", "country")
        .repartition(4).viewOn(s, "graft_sqlren_dim")
      s.sql(s"CREATE TABLE graft.`$c` AS SELECT * FROM graft_sqlren_dim " +
        "WHERE country IS DISTINCT FROM 'NATION_5'")
      s.sql(s"ALTER TABLE graft.`$c` RENAME COLUMN country TO region")
      s.sql(s"INSERT INTO graft.`$c` SELECT customer_key, customer_id, " +
        "country AS region FROM graft_sqlren_dim " +
        "WHERE country = 'NATION_5'")
    }
    c
  }

  /** Pure-SQL type-widening lineage: CTAS of an INT-typed batch →
    * ALTER TABLE ALTER COLUMN code TYPE BIGINT (metadata-only: the
    * same files under a widened recorded schema — Spark's parquet
    * reader promotes the narrow era natively, so zero bytes move) →
    * INSERT of a batch whose values only the wide type holds. The
    * registered SELECT reads both eras as BIGINT. */
  private def mansqlWidenFixture(s: SparkSession, d: String): String = {
    val c = dumpDir(s, d, "mansqlwid")
    registerCatalog(s)
    ensureFixture(s, c) {
      Warehouse(s, d).dimCustomer
        .select("customer_key", "customer_id", "country")
        .repartition(4).viewOn(s, "graft_sqlwid_dim")
      s.sql(s"CREATE TABLE graft.`$c` AS SELECT customer_id, " +
        "CAST(abs(customer_key % 1000000) AS INT) AS code, country " +
        "FROM graft_sqlwid_dim WHERE country IS DISTINCT FROM 'NATION_5'")
      s.sql(s"ALTER TABLE graft.`$c` ALTER COLUMN code TYPE BIGINT")
      s.sql(s"INSERT INTO graft.`$c` SELECT customer_id, " +
        "abs(customer_key % 1000000) + 3000000000 AS code, country " +
        "FROM graft_sqlwid_dim WHERE country = 'NATION_5'")
    }
    c
  }

  /** Pure-SQL merge-on-read DML lineage via CALL procedures: CTAS →
    * `CALL delete_mor` (vectors stack, zero rewrites) →
    * `CALL update_mor` reading THROUGH those vectors (where SQL
    * UPDATE's group rewrite would refuse "compact() first"). Every
    * mutation a spark.sql string; the registered SELECT reads the
    * stacked state. (`merge_mor`'s SQL face is exercised by
    * ManifestCatalogSpec — the staging table has no dup-free merge
    * key, so the fixture keeps to delete + update.) */
  private def mansqlMorDmlFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mansqlmrdml")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).cleaned.repartitionByRange(8, col("country"))
        .viewOn(s, "graft_sqlmrdml_src")
      s.sql(s"CREATE TABLE graft.`$b` AS SELECT * FROM graft_sqlmrdml_src")
      s.sql(s"CALL graft.system.delete_mor('$b', 'quantity = 17')")
      // the UPDATE is the PLAIN SQL spelling: the table is vectored,
      // so the analyzer routes it through the SupportsDelta operation
      // (native merge-on-read — old images vector out, new images
      // append; no CALL, no compact() wall)
      s.sql(s"UPDATE graft.`$b` SET country = 'CALLED', " +
        "quantity = quantity + 2000 WHERE country = 'NATION_3'")
    }
    b
  }

  /** Native MoR MERGE fixture: the merge_mor twin issued as PLAIN SQL
    * — CTAS, a clustered MoR delete (vectoring the table), then
    * `MERGE INTO` whose matched rows update and unmatched rows insert.
    * The vectored state routes the MERGE through the SupportsDelta
    * operation; a CoW fallback would refuse (compact wall), so the
    * fixture completing AT ALL pins the native path. */
  private def mansqlMorMergeFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mansqlmrgmor")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).dimCustomer.repartitionByRange(8, col("country"))
        .viewOn(s, "graft_sqlmrgmor_src")
      s.sql(s"CREATE TABLE graft.`$b` AS SELECT * FROM graft_sqlmrgmor_src")
      s.sql(s"CALL graft.system.delete_mor('$b', \"country = 'NATION_7'\")")
      val dim = s.sql(s"SELECT * FROM graft.`$b` VERSION AS OF 0")
      dim.filter(col("country") === "NATION_3")
        .withColumn("country", lit("RELOCATED"))
        .unionByName(dim.filter(col("country") === "NATION_5")
          .select((col("customer_key") + 1000000L).as("customer_key"),
            concat(col("customer_id"), lit("_B")).as("customer_id"),
            lit("NATION_5B").as("country")))
        .viewOn(s, "graft_sqlmrgmor_upd")
      s.sql(s"""MERGE INTO graft.`$b` t USING graft_sqlmrgmor_upd u
                |ON t.customer_id = u.customer_id
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    b
  }

  /** Vectored-count fixture: CTAS → ANALYZE → MoR DELETE. The
    * registered COUNT(*) then answers from metadata alone even though
    * the version carries deletion vectors — sidecar n_rows minus
    * bitmap cardinalities (Delta's numRecords − dvCardinality),
    * LocalRelation collapse pinned by ManifestStatsSpec. */
  private def manfcMorFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manfcmor")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).cleaned.repartitionByRange(8, col("country"))
        .viewOn(s, "graft_fcmor_src")
      s.sql(s"CREATE TABLE graft.`$b` AS SELECT * FROM graft_fcmor_src")
      s.sql(s"CALL graft.system.analyze('$b', 'quantity,country')")
      s.sql(s"CALL graft.system.delete_mor('$b', 'quantity = 17')")
    }
    b
  }

  /** CDC-MV fixture: the fact table as a manifest catalog table
    * (clustered by invoice_date so the change feed's zone pruning
    * bites), vectored by a MoR DELETE, then a native SupportsDelta
    * UPDATE — the two DML shapes an append-only MV refresh cannot
    * absorb. The registered query seeds the MV from v0 once
    * (marker-guarded) and then folds `changesBetween(0, latest)` into
    * it — the steady-state cost is the pruned feed + a grain-sized
    * groupBy, never a history rescan. */
  private def manMvCdcFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manmvcdc")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).fact.repartitionByRange(8, col("invoice_date"))
        .viewOn(s, "graft_mvcdc_src")
      s.sql(s"CREATE TABLE graft.`$b` AS SELECT * FROM graft_mvcdc_src")
      s.sql(s"CALL graft.system.delete_mor('$b', " +
        "'pmod(customer_key, 7) = 3')")
      s.sql(s"UPDATE graft.`$b` SET total_amount = total_amount + 1.50 " +
        "WHERE pmod(customer_key, 7) = 2")
    }
    b
  }

  /** Named-ref fixture: CTAS of the cleaned lineage, `CALL tag` pins
    * v0 as 'baseline', then two mutations (CoW DELETE + UPDATE) move
    * the head away. The registered query reads `VERSION AS OF
    * 'baseline'` — name-addressed time travel whose content must
    * still hash-equal the original lineage (RefsSpec pins the vacuum
    * protection and the WAP branch flow on top of the same ref tier). */
  private def mansqlTagFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mansqltag")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).cleaned.repartitionByRange(8, col("country"))
        .viewOn(s, "graft_sqltag_src")
      s.sql(s"CREATE TABLE graft.`$b` AS SELECT * FROM graft_sqltag_src")
      s.sql(s"CALL graft.system.tag('$b', 'baseline', 0)")
      s.sql(s"DELETE FROM graft.`$b` WHERE country = 'NATION_6'")
      s.sql(s"UPDATE graft.`$b` SET quantity = quantity + 77 " +
        "WHERE country = 'NATION_2'")
    }
    b
  }

  /** Sync-from-source MERGE fixture — the missing third MERGE clause:
    * CTAS of dim_customer, a clustered MoR delete (vectoring the
    * table so the statement routes through `SupportsDelta`), then ONE
    * `MERGE INTO` whose clauses cover the full grammar — MATCHED
    * UPDATE, NOT MATCHED INSERT, and two conditioned NOT MATCHED BY
    * SOURCE actions (DELETE one slice, UPDATE another). The shape is
    * the production "make target equal source" sync Delta/Iceberg
    * users run nightly. */
  private def mansqlMergeSyncFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mansqlsync")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).dimCustomer.repartitionByRange(8, col("country"))
        .viewOn(s, "graft_sqlsync_src")
      s.sql(s"CREATE TABLE graft.`$b` AS SELECT * FROM graft_sqlsync_src")
      s.sql(s"CALL graft.system.delete_mor('$b', \"country = 'NATION_7'\")")
      val dim = s.sql(s"SELECT * FROM graft.`$b` VERSION AS OF 0")
      dim.filter(col("country").isin("NATION_1", "NATION_3"))
        .withColumn("country", concat(lit("KEEP_"), col("country")))
        .unionByName(dim.filter(col("country") === "NATION_5")
          .select((col("customer_key") + 1000000L).as("customer_key"),
            concat(col("customer_id"), lit("_B")).as("customer_id"),
            lit("NATION_5B").as("country")))
        .viewOn(s, "graft_sqlsync_upd")
      s.sql(s"""MERGE INTO graft.`$b` t USING graft_sqlsync_upd u
               |ON t.customer_id = u.customer_id
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *
               |WHEN NOT MATCHED BY SOURCE AND t.country = 'NATION_2'
               |  THEN DELETE
               |WHEN NOT MATCHED BY SOURCE AND t.country = 'NATION_4'
               |  THEN UPDATE SET t.country = 'STALE'""".stripMargin)
    }
    b
  }

  /** Star-schema catalog fixture: fact_sales + dim_customer + dim_date
    * published as manifest catalog tables (pure-SQL CTAS) and ANALYZEd
    * (`CALL graft.system.analyze`), so the DSv2 statistics tier
    * carries exact row counts, zone bounds and NDV estimates for every
    * join column. The registered star join then plans from CATALOG
    * NAMES alone — ManifestStatsSpec pins that the dims broadcast with
    * no hint and that stats resolution opens zero data files. */
  private def mansqlStarFixture(s: SparkSession, d: String)
      : (String, String, String) = {
    val f = dumpDir(s, d, "manstar_fact")
    val c = dumpDir(s, d, "manstar_dimc")
    val dd = dumpDir(s, d, "manstar_dimd")
    registerCatalog(s)
    ensureFixture(s, f, c, dd) {
      val wh = Warehouse(s, d)
      wh.fact.viewOn(s, "graft_star_fact_src")
      wh.dimCustomer.viewOn(s, "graft_star_dimc_src")
      wh.dimDate.viewOn(s, "graft_star_dimd_src")
      s.sql(s"CREATE TABLE graft.`$f` AS SELECT * FROM graft_star_fact_src")
      s.sql(s"CREATE TABLE graft.`$c` AS SELECT * FROM graft_star_dimc_src")
      s.sql(s"CREATE TABLE graft.`$dd` AS SELECT * FROM graft_star_dimd_src")
      s.sql(s"CALL graft.system.analyze('$f', 'customer_key,date_key')")
      s.sql(s"CALL graft.system.analyze('$c', 'customer_key,country')")
      s.sql(s"CALL graft.system.analyze('$dd', 'date_key,year')")
    }
    (f, c, dd)
  }

  /** Storage-partitioned-join fixture: a per-country stats dim and the
    * customer dim, BOTH committed as manifest tables in the
    * partition-SPLIT layout (`graft.write.splitByPartition` — one
    * country tuple per file, Delta/Iceberg's physical layout), so the
    * SPJ purity proof holds and the registered join plans with zero
    * Exchange under Spark 4's default `v2.bucketing.enabled`. */
  private def manspjFixture(s: SparkSession, d: String): (String, String) = {
    val a = dumpDir(s, d, "manspj_cstats")
    val b = dumpDir(s, d, "manspj_cust")
    registerCatalog(s)
    ensureFixture(s, a, b) {
      val dim = Warehouse(s, d).dimCustomer
        .select("customer_key", "customer_id", "country")
      val stats = dim.groupBy("country")
        .agg(count(lit(1)).as("n_customers"),
          min(col("customer_id")).as("first_id"))
      s.conf.set("graft.write.splitByPartition", "true")
      try {
        ext.Manifests.commitDataPartitioned(stats, a, Seq("country")): Unit
        ext.Manifests.commitDataPartitioned(dim, b, Seq("country")): Unit
      } finally s.conf.unset("graft.write.splitByPartition")
    }
    (a, b)
  }

  /** Hidden-partitioning fixture: the cleaned staging frame CTAS'd
    * through the catalog as a MONTHLY-partitioned table —
    * `PARTITIONED BY (months(invoice_date))`, split layout (one month
    * tuple per file), partition values derived into the sidecar and
    * NEVER materialized as schema columns. The reference's fact table
    * is monthly RANGE-partitioned on its timestamp
    * (schema/warehouse_schema.sql:52-95); this is the lakehouse form
    * of the same layout, with pruning driven from the source column. */
  private def manhpFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manhp")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).cleaned.viewOn(s, "graft_hp_cleaned")
      s.conf.set("graft.write.splitByPartition", "true")
      try s.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY " +
        "(months(invoice_date)) AS SELECT * FROM graft_hp_cleaned")
      finally s.conf.unset("graft.write.splitByPartition")
    }
    b
  }

  /** Partition-evolution fixture: the pre-1995 half of the clean
    * lineage CTAS'd YEARLY, evolved to MONTHLY (metadata-only commit —
    * same files, spec history recorded), then the post-1995 half
    * INSERTed under the monthly spec. Both eras prune under their own
    * tuples; the registered rollup reads across them. */
  private def manevoFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manevo")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).cleaned.viewOn(s, "graft_evo_cleaned")
      s.conf.set("graft.write.splitByPartition", "true")
      try {
        s.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY " +
          "(years(invoice_date)) AS SELECT * FROM graft_evo_cleaned " +
          "WHERE invoice_date < DATE '1998-01-01'")
        s.sql(s"CALL graft.system.evolve_partitions('$b', " +
          "'months(invoice_date)')")
        s.sql(s"INSERT INTO graft.`$b` SELECT * FROM graft_evo_cleaned " +
          "WHERE invoice_date >= DATE '1998-01-01' " +
          "OR invoice_date IS NULL")
      } finally s.conf.unset("graft.write.splitByPartition")
    }
    b
  }

  /** Transform-aligned metadata-DML fixture: a monthly table whose
    * month-boundary DELETE must retire files from metadata alone —
    * the require pins the zero-new-data-files contract, so a silent
    * regression to the rewrite path fails the fixture loudly. */
  private def manmdropFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manmdrop")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).cleaned.viewOn(s, "graft_mdrop_cleaned")
      s.conf.set("graft.write.splitByPartition", "true")
      try s.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY " +
        "(months(invoice_date)) AS SELECT * FROM graft_mdrop_cleaned")
      finally s.conf.unset("graft.write.splitByPartition")
      val v0 = ext.Manifests.latestVersion(s, b).get
      val before = ext.Manifests.files(s, b, v0).toSet
      s.sql(s"DELETE FROM graft.`$b` WHERE invoice_date < " +
        "DATE '1996-01-01'")
      val v1 = ext.Manifests.latestVersion(s, b).get
      val after = ext.Manifests.files(s, b, v1).toSet
      require(after.subsetOf(before) && after.size < before.size,
        "month-aligned DELETE was expected to retire files from " +
          s"metadata alone — new files: ${(after -- before).take(3)}")
    }
    b
  }

  /** Evolve-then-aligned-DELETE fixture: monthly CTAS → evolve to
    * daily (metadata-only; the months group moves to history) → a
    * year-boundary DELETE aligned under BOTH specs. The requires pin
    * the r18 contract: legacy files retire from THEIR group's tuples
    * with zero new data files — a regression to the boundary-rewrite
    * path (or a lost legacy group) fails the fixture loudly. */
  private def manevodropFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manevodrop")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).cleaned
        .viewOn(s, "graft_evodrop_cleaned")
      s.conf.set("graft.write.splitByPartition", "true")
      try s.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY " +
        "(months(invoice_date)) AS SELECT * FROM graft_evodrop_cleaned")
      finally s.conf.unset("graft.write.splitByPartition")
      s.sql(s"CALL graft.system.evolve_partitions('$b', " +
        "'days(invoice_date)')")
      val v0 = ext.Manifests.latestVersion(s, b).get
      val before = ext.Manifests.files(s, b, v0).toSet
      s.sql(s"DELETE FROM graft.`$b` WHERE invoice_date < " +
        "DATE '1996-01-01'")
      val v1 = ext.Manifests.latestVersion(s, b).get
      val after = ext.Manifests.files(s, b, v1).toSet
      require(after.subsetOf(before) && after.size < before.size,
        "the cross-era aligned DELETE was expected to retire legacy " +
          "files from metadata alone — new files: " +
          s"${(after -- before).take(3)}")
    }
    b
  }

  /** Delta-log lineage fixture: a table maintained through enough
    * single-batch INSERTs to cross the delta-chain cap TWICE (forced
    * low via `graft.manifest.maxChain=3`, so mid-lineage commits
    * flatten and the rest delta-encode against their parents), plus a
    * metadata-only DDL (a zero-line delta), a CoW DELETE
    * (removes+adds in one delta), a VACUUM whose retention floor cuts
    * the chain (the floor survivor flattens before its bases are
    * reclaimed) and one post-vacuum INSERT chaining on the flattened
    * floor. The registered SELECT reads the final state through every
    * encoding the lineage left behind — a lost add, a misapplied
    * remove or a dangling base shifts rows and hash-fails the oracle. */
  private def mansqlDlogFixture(s: SparkSession, d: String): String = {
    val c = dumpDir(s, d, "mansqldlg")
    registerCatalog(s)
    ensureFixture(s, c) {
      s.conf.set("graft.manifest.maxChain", "3")
      try {
        Warehouse(s, d).dimCustomer
          .select("customer_key", "customer_id", "country")
          .repartition(4).viewOn(s, "graft_sqldlg_dim")
        s.sql(s"CREATE TABLE graft.`$c` AS SELECT * FROM graft_sqldlg_dim " +
          "WHERE customer_key % 8 IN (0, 1)")
        (2 to 7).foreach(i =>
          s.sql(s"INSERT INTO graft.`$c` SELECT * FROM graft_sqldlg_dim " +
            s"WHERE customer_key % 8 = $i"))
        s.sql(s"ALTER TABLE graft.`$c` ADD COLUMN flag STRING")
        s.sql(s"DELETE FROM graft.`$c` WHERE customer_key % 8 = 4")
        s.sql(s"CALL graft.system.vacuum('$c', 2)")
        s.sql(s"INSERT INTO graft.`$c` SELECT customer_key, customer_id, " +
          "country, 'LATE' AS flag FROM graft_sqldlg_dim " +
          "WHERE customer_key % 8 = 4")
      } finally s.conf.unset("graft.manifest.maxChain")
    }
    c
  }

  /** NOT NULL lifecycle fixture: CTAS of the non-NATION_5 customers →
    * `CALL graft.system.set_not_null` (scan-proof, metadata-only
    * commit) → the NATION_5 INSERT lands under the enforced bit →
    * `ALTER COLUMN country DROP NOT NULL` → an INSERT with a NULL
    * country that only the relaxed contract admits. */
  private def mansqlNnFixture(s: SparkSession, d: String): String = {
    val c = dumpDir(s, d, "mansqlnn")
    registerCatalog(s)
    ensureFixture(s, c) {
      Warehouse(s, d).dimCustomer
        .select("customer_key", "customer_id", "country")
        .repartition(4).viewOn(s, "graft_sqlnn_dim")
      s.sql(s"CREATE TABLE graft.`$c` AS SELECT * FROM graft_sqlnn_dim " +
        "WHERE country IS DISTINCT FROM 'NATION_5'")
      s.sql(s"CALL graft.system.set_not_null('$c', 'country')")
      s.sql(s"INSERT INTO graft.`$c` SELECT customer_key, customer_id, " +
        "country FROM graft_sqlnn_dim WHERE country = 'NATION_5'")
      s.sql(s"ALTER TABLE graft.`$c` ALTER COLUMN country DROP NOT NULL")
      s.sql(s"INSERT INTO graft.`$c` VALUES " +
        "(-1, 'ZZZ_NULL_CUSTOMER', CAST(NULL AS STRING))")
    }
    c
  }

  /** Fresh-MoR SQL fixture: CTAS bootstrap (clustered on country), a
    * Scala merge-on-read delete of a clustered country (full-file
    * elision retires the pure files, vectors only the boundary), a SQL
    * DELETE, then an UNclustered MoR delete that leaves every file
    * genuinely vectored. `sql_select_mor` reads the result through the
    * DV-aware catalog scan. */
  private def mansqlMorFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mansqlmor")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).cleaned.repartitionByRange(8, col("country"))
        .viewOn(s, "graft_sqlmor_src")
      s.sql(s"CREATE TABLE graft.`$b` AS SELECT * FROM graft_sqlmor_src")
      // country-aligned on the clustered layout: full-file DV elision
      // retires the pure files and vectors only the boundary
      ext.Manifests.deleteWhereMor(s, b, col("country") === "NATION_7")
      s.sql(s"DELETE FROM graft.`$b` WHERE country = 'NATION_1'")
      // deliberately UNclustered predicate: every file is a boundary
      // file, so the table ends genuinely vectored and the SELECT
      // reads through real position vectors
      ext.Manifests.deleteWhereMor(s, b, col("quantity") === 7)
    }
    b
  }

  /** Partition-overwrite fixture: a country-partitioned CTAS, then the
    * NATION_2 partition replaced twice by static-PARTITION
    * `INSERT OVERWRITE` (first with NATION_1's rows, then NATION_3's) —
    * the second must REPLACE the first, and untouched partitions carry
    * by reference through both commits (files-accounting spec in
    * ManifestCatalogSpec). */
  private def mansqlOvwFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mansqlovw")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).cleaned.viewOn(s, "graft_sqlovw_src")
      s.sql(s"CREATE TABLE graft.`$b` PARTITIONED BY (country) AS " +
        "SELECT * FROM graft_sqlovw_src")
      def overwriteFrom(src: String): Unit = {
        s.sql(s"INSERT OVERWRITE graft.`$b` PARTITION (country = 'NATION_2') " +
          "SELECT invoice_no, stock_code, description, quantity, " +
          "invoice_date, unit_price, customer_id FROM graft_sqlovw_src " +
          s"WHERE country = '$src'")
        ()
      }
      overwriteFrom("NATION_1")
      overwriteFrom("NATION_3")
    }
    b
  }

  /** Change-range fixture for the batch `.changes` face: v0 = CTAS of
    * the non-NATION_5 customers, v1 = INSERT of NATION_5, v2 = CoW
    * UPDATE relocating NATION_3 — all pure SQL. The (0, 2] feed is the
    * NATION_5 inserts plus the update's delete/insert image pair. */
  private def mansqlCdfFixture(s: SparkSession, d: String): String = {
    val c = dumpDir(s, d, "mansqlcdf")
    registerCatalog(s)
    ensureFixture(s, c) {
      Warehouse(s, d).dimCustomer
        .select("customer_key", "customer_id", "country")
        .repartitionByRange(4, col("country"))
        .viewOn(s, "graft_sqlcdf_dim")
      s.sql(s"CREATE TABLE graft.`$c` AS SELECT * FROM graft_sqlcdf_dim " +
        "WHERE country IS DISTINCT FROM 'NATION_5'")
      s.sql(s"INSERT INTO graft.`$c` SELECT * FROM graft_sqlcdf_dim " +
        "WHERE country = 'NATION_5'")
      s.sql(s"UPDATE graft.`$c` SET country = 'MOVED' " +
        "WHERE country = 'NATION_3'")
    }
    c
  }

  /** CDF update-image fixture: a customer-dim CTAS through the
    * catalog, then ONE SQL MERGE under `graft.cdf.updateImages=true`
    * (+ `graft.dml.mode=mor` so the clean table takes the
    * SupportsDelta path) — NATION_3 customers relocate as UPDATE
    * actions (rowIds recorded in the cdc sidecar, postimages in their
    * own file) and `_B` clones of NATION_5 insert plain. v0→v1 holds
    * exactly one delta write with its `_cdcupd` classification. */
  private def mancdfUpdFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mancdfupd")
    registerCatalog(s)
    ensureFixture(s, b) {
      Warehouse(s, d).dimCustomer.repartition(8)
        .viewOn(s, "graft_cdfupd_src")
      s.sql(s"CREATE TABLE graft.`$b` AS SELECT * FROM graft_cdfupd_src")
      val dim = ext.Manifests.readAt(s, b, 0)
      dim.filter(col("country") === "NATION_3")
        .withColumn("country", lit("RELOCATED"))
        .unionByName(dim.filter(col("country") === "NATION_5")
          .select((col("customer_key") + 1000000L).as("customer_key"),
            concat(col("customer_id"), lit("_B")).as("customer_id"),
            lit("NATION_5B").as("country")))
        .viewOn(s, "graft_cdfupd_upd")
      s.conf.set("graft.dml.mode", "mor")
      s.conf.set("graft.cdf.updateImages", "true")
      try s.sql(
        s"""MERGE INTO graft.`$b` t USING graft_cdfupd_upd u
           |ON t.customer_id = u.customer_id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      finally {
        s.conf.unset("graft.dml.mode")
        s.conf.unset("graft.cdf.updateImages")
      }
    }
    b
  }

  private def manmergeFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manmerge")
    ensureFixture(s, b) {
      ext.Manifests.commitData(Warehouse(s, d).dimCustomer.repartition(8), b)
      val dim = ext.Manifests.readAt(s, b, 0)
      val updates = dim.filter(col("country") === "NATION_3")
        .withColumn("country", lit("RELOCATED"))
        .unionByName(dim.filter(col("country") === "NATION_5")
          .select((col("customer_key") + 1000000L).as("customer_key"),
            concat(col("customer_id"), lit("_B")).as("customer_id"),
            lit("NATION_5B").as("country")))
      ext.Manifests.merge(s, b, updates, Seq("customer_id"))
    }
    b
  }

  /** [[manmergeFixture]]'s merge-on-read twin: a NATION_7 MoR delete
    * stacks vectors first, then the SAME upsert batch lands through
    * [[ext.Manifests.mergeMor]] — matched rows vector out, the whole
    * batch appends, zero raw-file rewrites across the lineage. */
  private def manmergeMorFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "manmrgmor")
    ensureFixture(s, b) {
      ext.Manifests.commitData(
        Warehouse(s, d).dimCustomer.repartitionByRange(8, col("country")), b)
      ext.Manifests.deleteWhereMor(s, b, col("country") === "NATION_7")
      val dim = ext.Manifests.readAt(s, b, 0)
      val updates = dim.filter(col("country") === "NATION_3")
        .withColumn("country", lit("RELOCATED"))
        .unionByName(dim.filter(col("country") === "NATION_5")
          .select((col("customer_key") + 1000000L).as("customer_key"),
            concat(col("customer_id"), lit("_B")).as("customer_id"),
            lit("NATION_5B").as("country")))
      ext.Manifests.mergeMor(s, b, updates, Seq("customer_id"))
    }
    b
  }

  /** The merge-on-read twin of [[mandelFixture]]: same clustered v0,
    * but the NATION_7 delete is merge-on-read — full-file elision
    * retires the country's pure files from v1's manifest and vectors
    * only boundary files (where a file straddles two countries), so
    * the delete is manifest-shaped and reads/the change feed pay the
    * position machinery only on the boundary. */
  private def morFixture(s: SparkSession, d: String): String = {
    val b = dumpDir(s, d, "mordel")
    ensureFixture(s, b) {
      ext.Manifests.commitData(
        Warehouse(s, d).cleaned.repartitionByRange(8, col("country")), b)
      ext.Manifests.deleteWhereMor(s, b, col("country") === "NATION_7")
    }
    b
  }

  /** Full-recompute monthly rollup — shared by q_monthly_sales AND the
    * incremental-MV query (the whole point: the incremental path must
    * hash-match the from-scratch answer). */
  private val monthlySalesOracle: String =
    s"""${Oracle.warehouseCte} SELECT
       | CAST(EXTRACT(year FROM invoice_date) AS INTEGER) AS year,
       | CAST(EXTRACT(month FROM invoice_date) AS INTEGER) AS month,
       | COUNT(*) AS n_sales,
       | CAST(CAST(SUM(total_amount) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
       | FROM fact_sales GROUP BY 1, 2 ORDER BY year, month""".stripMargin

  /** The batch-0 membership predicate of [[Mv.writeBatches]]'s hash
    * split, replayed in DuckDB (md5-prefix hash % nBatches = 0). */
  private val mvBatch0Pred: String =
    // plain concatenation, not stripMargin: a leading SQL || operator
    // would donate one pipe to the margin and corrupt the predicate
    "(CAST('0x' || substring(md5('mv|' || invoice_no || " +
      "'|' || CAST(product_key AS VARCHAR) || " +
      "'|' || CAST(customer_key AS VARCHAR) || " +
      "'|' || CAST(date_key AS VARCHAR) || " +
      "'|' || CAST(quantity AS VARCHAR) || " +
      "'|' || CAST(unit_price AS VARCHAR)), 1, 15) AS BIGINT)) % 3 = 0"

  private val etlOracles: Map[String, String] = Map(
    "scd2_part_history" -> Scd.partHistoryOracleSql,
    "mv_monthly_sales" -> monthlySalesOracle,
    "delete_roundtrip" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE country IS DISTINCT FROM 'NATION_7' ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    "delete_versioned" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE country IS DISTINCT FROM 'NATION_7' ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // write-path table = bootstrap (≠ NATION_3) ∪ append (= NATION_3):
    // the union IS the clean lineage, whatever the physical split
    "manifest_writer" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // UPDATE replayed as CASE with snapshot semantics: both branches
    // read the pre-update row, unknown predicates leave the row alone
    "update_versioned" ->
      s"""${Oracle.cleanedCte}, updated AS (
         | SELECT invoice_no, stock_code, description,
         |  CASE WHEN country = 'NATION_2' THEN quantity + 1000
         |       ELSE quantity END AS quantity,
         |  invoice_date, unit_price, customer_id,
         |  CASE WHEN country = 'NATION_2' THEN 'REDACTED'
         |       ELSE country END AS country
         | FROM cleaned)
         | SELECT ${Oracle.stagingSelectDouble} FROM updated
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // merge-on-read update over a merge-on-read delete: the quantity=13
    // rows are gone, NATION_2 survivors carry the SET — vectors and
    // image files are invisible to the oracle, only content counts
    "update_mor" ->
      s"""${Oracle.cleanedCte}, survivors AS (
         | SELECT * FROM cleaned WHERE quantity IS DISTINCT FROM 13
         |), updated AS (
         | SELECT invoice_no, stock_code, description,
         |  CASE WHEN country = 'NATION_2' THEN quantity + 1000
         |       ELSE quantity END AS quantity,
         |  invoice_date, unit_price, customer_id,
         |  CASE WHEN country = 'NATION_2' THEN 'REWRITTEN'
         |       ELSE country END AS country
         | FROM survivors)
         | SELECT ${Oracle.stagingSelectDouble} FROM updated
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // merge-on-read delete: same logical content as the copy-on-write
    // twin — the deletion vector is invisible to the oracle
    "delete_mor" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE country IS DISTINCT FROM 'NATION_7' ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // stats pruning is metadata-only: result = the exact row filter
    "skipping_manifest" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE quantity BETWEEN 10 AND 20 ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // Catalyst-planned twin: same contract — pruning cannot change rows
    "manifest_catalyst_scan" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE quantity BETWEEN 10 AND 20 ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // partition pruning is metadata-only: result = the exact row filter
    "manifest_partition_scan" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE country IN ('NATION_3', 'NATION_7') ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // bloom point lookup: pruning invisible to results, as ever
    "bloom_lookup" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE invoice_no = (SELECT MIN(invoice_no) FROM cleaned)
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // partition-predicate delete: survivors = NOT(pred), NULL survives
    "drop_partitions" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE NOT COALESCE(country IN ('NATION_3', 'NATION_8'), FALSE)
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // the metadata-only count must equal the count computed over data
    "fast_count" ->
      s"""${Oracle.cleanedCte} SELECT COUNT(*) AS n_rows FROM cleaned""",
    // zone-bound folds must equal the real MIN/MAX/COUNT over data
    "fast_minmax" ->
      s"""${Oracle.cleanedCte} SELECT MIN(quantity) AS min_qty,
         | MAX(quantity) AS max_qty, COUNT(quantity) AS n_qty
         | FROM cleaned""".stripMargin,
    // the filtered metadata fold must equal the real filtered aggregate
    "fast_count_filtered" ->
      s"""${Oracle.cleanedCte} SELECT COUNT(*) AS n_rows,
         | MIN(quantity) AS min_qty, MAX(quantity) AS max_qty
         | FROM cleaned WHERE country = 'NATION_2'""".stripMargin,
    // the per-file-sum fold must equal the real SUM over data
    "fast_sum" ->
      s"""${Oracle.cleanedCte} SELECT CAST(SUM(quantity) AS BIGINT) AS sum_qty,
         | COUNT(*) AS n_rows FROM cleaned""".stripMargin,
    // the SQL-addressed relation: same content as the DataFrame path
    "manifest_sql_scan" ->
      s"""${Oracle.cleanedCte} SELECT country, COUNT(*) AS n_sales,
         | CAST(SUM(quantity) AS BIGINT) AS sum_qty FROM cleaned
         | WHERE country IN ('NATION_1', 'NATION_2')
         | GROUP BY country ORDER BY country""".stripMargin,
    // the pure-SQL lineage replayed: UPDATE as CASE over the OLD row
    // (snapshot semantics, NULL predicate leaves the row alone), then
    // DELETE survivors = NOT-pred with NULL surviving
    "sql_dml_updel" ->
      s"""${Oracle.cleanedCte}, updated AS (
         | SELECT invoice_no, stock_code, description,
         |  CASE WHEN country = 'NATION_4' THEN quantity + 500
         |       ELSE quantity END AS quantity,
         |  invoice_date, unit_price, customer_id,
         |  CASE WHEN country = 'NATION_4' THEN 'SQLLAND'
         |       ELSE country END AS country
         | FROM cleaned)
         | SELECT ${Oracle.stagingSelectDouble} FROM updated
         | WHERE country IS DISTINCT FROM 'NATION_6'
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // SQL MERGE = upsert semantics: updates win on key match, everything
    // else survives, new keys append (merge_versioned's oracle shape)
    "sql_dml_merge" ->
      s"""${Oracle.warehouseCte}, upd AS (
         |  SELECT customer_key, customer_id, 'RELOCATED' AS country
         |  FROM dim_customer WHERE country = 'NATION_3'
         |  UNION ALL
         |  SELECT customer_key + 1000000, customer_id || '_B', 'NATION_5B'
         |  FROM dim_customer WHERE country = 'NATION_5')
         | SELECT customer_key, customer_id, country FROM upd
         | UNION ALL
         | SELECT t.customer_key, t.customer_id, t.country FROM dim_customer t
         | WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.customer_id = t.customer_id)
         | ORDER BY customer_id""".stripMargin,
    // ADD COLUMN: batch-1 rows (non-NATION_5) predate the evolution and
    // read NULL in the added column; batch-2 rows carry 'NEW' — the
    // union is all of dim_customer with segment decided by the split
    "sql_add_column" ->
      s"""${Oracle.warehouseCte}
         | SELECT customer_key, customer_id, country,
         |   CASE WHEN country = 'NATION_5' THEN 'NEW'
         |        ELSE CAST(NULL AS VARCHAR) END AS segment
         | FROM dim_customer
         | ORDER BY customer_id""".stripMargin,
    // RENAME COLUMN: every row of dim_customer under the post-rename
    // name — pre-rename rows must carry their REAL country values
    // (null-filled pre-rename files would hash-mismatch immediately)
    "sql_rename_column" ->
      s"""${Oracle.warehouseCte}
         | SELECT customer_key, customer_id, country AS region
         | FROM dim_customer
         | ORDER BY customer_id""".stripMargin,
    // full dim_customer plus the one explicitly-inserted null-country
    // row the relaxed contract admits
    "sql_not_null" ->
      s"""${Oracle.warehouseCte}
         | SELECT customer_key, customer_id, country FROM (
         |  SELECT customer_key, customer_id, country FROM dim_customer
         |  UNION ALL
         |  SELECT CAST(-1 AS BIGINT) AS customer_key,
         |         'ZZZ_NULL_CUSTOMER' AS customer_id,
         |         CAST(NULL AS VARCHAR) AS country
         | ) nn_all
         | ORDER BY customer_id""".stripMargin,
    // CALL-procedure MoR lineage: quantity=17 rows vectored out, then
    // NATION_3 survivors updated through the stacked vectors
    "sql_mor_dml" ->
      s"""${Oracle.cleanedCte}, survivors AS (
         | SELECT * FROM cleaned WHERE quantity IS DISTINCT FROM 17
         |), updated AS (
         | SELECT invoice_no, stock_code, description,
         |  CASE WHEN country = 'NATION_3' THEN quantity + 2000
         |       ELSE quantity END AS quantity,
         |  invoice_date, unit_price, customer_id,
         |  CASE WHEN country = 'NATION_3' THEN 'CALLED'
         |       ELSE country END AS country
         | FROM survivors)
         | SELECT ${Oracle.stagingSelectDouble} FROM updated
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // delta-log lineage: the final table is ALL of dim_customer —
    // bucket 4 was deleted and re-inserted with flag='LATE', every
    // other row predates the ADD COLUMN and reads a NULL flag
    "sql_delta_log" ->
      s"""${Oracle.warehouseCte}
         | SELECT customer_key, customer_id, country,
         |   CASE WHEN customer_key % 8 = 4 THEN 'LATE'
         |        ELSE CAST(NULL AS VARCHAR) END AS flag
         | FROM dim_customer
         | ORDER BY customer_id""".stripMargin,
    // ALTER COLUMN TYPE: pre-widening rows carry their INT-era values
    // read as BIGINT; the post-widening batch holds values above
    // Int.MaxValue — a narrow read (or a dropped era) hash-fails
    "sql_widen_column" ->
      s"""${Oracle.warehouseCte}
         | SELECT customer_id,
         |   CASE WHEN country = 'NATION_5'
         |        THEN abs(customer_key % 1000000) + 3000000000
         |        ELSE abs(customer_key % 1000000) END AS code,
         |   country
         | FROM dim_customer
         | ORDER BY customer_id""".stripMargin,
    // all three deletes (elided-MoR country, SQL, unclustered MoR)
    // applied: survivors only, nulls surviving each predicate
    "sql_select_mor" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE country IS DISTINCT FROM 'NATION_7'
         |   AND country IS DISTINCT FROM 'NATION_1'
         |   AND quantity IS DISTINCT FROM 7
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // the twice-overwritten partition holds the LAST overwrite's rows
    // (NATION_3's, relabeled); every other partition is untouched
    "sql_insert_overwrite" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM (
         |  SELECT invoice_no, stock_code, description, quantity,
         |         invoice_date, unit_price, customer_id, country
         |  FROM cleaned WHERE country IS DISTINCT FROM 'NATION_2'
         |  UNION ALL
         |  SELECT invoice_no, stock_code, description, quantity,
         |         invoice_date, unit_price, customer_id,
         |         'NATION_2' AS country
         |  FROM cleaned WHERE country = 'NATION_3'
         | ) final_tbl
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // the (0, 2] change range: v1's inserts plus the v2 update's
    // delete/insert image pair — carried-identical rows cancel
    "sql_changes_between" ->
      s"""${Oracle.warehouseCte}
         | SELECT customer_key, customer_id, country, _change_type FROM (
         |  SELECT customer_key, customer_id, country,
         |         'insert' AS _change_type
         |  FROM dim_customer WHERE country = 'NATION_5'
         |  UNION ALL
         |  SELECT customer_key, customer_id, 'MOVED' AS country,
         |         'insert' AS _change_type
         |  FROM dim_customer WHERE country = 'NATION_3'
         |  UNION ALL
         |  SELECT customer_key, customer_id, country,
         |         'delete' AS _change_type
         |  FROM dim_customer WHERE country = 'NATION_3'
         | ) feed
         | ORDER BY _change_type, customer_id""".stripMargin,
    // versionAsOf 0 = before the delete: the full clean lineage
    "manifest_time_travel" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // rollback recovered every deleted row: latest = the full lineage
    "restore_table" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // the fork pinned the post-delete snapshot exactly
    "clone_table" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE country IS DISTINCT FROM 'NATION_5'
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // the narrowed schema = the lineage minus the dropped column
    "drop_column" ->
      s"""${Oracle.cleanedCte} SELECT invoice_no, stock_code, quantity,
         | invoice_date, CAST(unit_price AS DOUBLE) AS unit_price,
         | customer_id, country FROM cleaned
         | ORDER BY ${orderBySql(stagingCols.filterNot(_ == "description"))}""".stripMargin,
    // DV-churn feed: exactly the pred-TRUE rows, tagged delete
    "change_feed_mor" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble},
         | 'delete' AS _change_type FROM cleaned
         | WHERE country = 'NATION_7' ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // upsert semantics replayed exactly: updates win on key match,
    // everything else survives, new keys append
    "merge_versioned" ->
      s"""${Oracle.warehouseCte}, upd AS (
         |  SELECT customer_key, customer_id, 'RELOCATED' AS country
         |  FROM dim_customer WHERE country = 'NATION_3'
         |  UNION ALL
         |  SELECT customer_key + 1000000, customer_id || '_B', 'NATION_5B'
         |  FROM dim_customer WHERE country = 'NATION_5')
         | SELECT customer_key, customer_id, country FROM upd
         | UNION ALL
         | SELECT t.customer_key, t.customer_id, t.country FROM dim_customer t
         | WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.customer_id = t.customer_id)
         | ORDER BY customer_id""".stripMargin,
    // merge-on-read merge over a merge-on-read delete: NATION_7 is
    // gone when the upsert lands; the upsert result matches the CoW
    // twin's shape on the survivors
    "merge_mor" ->
      s"""${Oracle.warehouseCte}, survivors AS (
         |  SELECT customer_key, customer_id, country FROM dim_customer
         |  WHERE country IS DISTINCT FROM 'NATION_7'
         |), upd AS (
         |  SELECT customer_key, customer_id, 'RELOCATED' AS country
         |  FROM dim_customer WHERE country = 'NATION_3'
         |  UNION ALL
         |  SELECT customer_key + 1000000, customer_id || '_B', 'NATION_5B'
         |  FROM dim_customer WHERE country = 'NATION_5')
         | SELECT customer_key, customer_id, country FROM upd
         | UNION ALL
         | SELECT s.customer_key, s.customer_id, s.country FROM survivors s
         | WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.customer_id = s.customer_id)
         | ORDER BY customer_id""".stripMargin,
    // native MoR MERGE: same final state as the procedural twin — the
    // NATION_7 delete's survivors, NATION_3 relocated in place,
    // NATION_5's shadow customers inserted
    "sql_mor_merge" ->
      s"""${Oracle.warehouseCte}, survivors AS (
         |  SELECT customer_key, customer_id, country FROM dim_customer
         |  WHERE country IS DISTINCT FROM 'NATION_7'
         |), upd AS (
         |  SELECT customer_key, customer_id, 'RELOCATED' AS country
         |  FROM dim_customer WHERE country = 'NATION_3'
         |  UNION ALL
         |  SELECT customer_key + 1000000, customer_id || '_B', 'NATION_5B'
         |  FROM dim_customer WHERE country = 'NATION_5')
         | SELECT customer_key, customer_id, country FROM upd
         | UNION ALL
         | SELECT s.customer_key, s.customer_id, s.country FROM survivors s
         | WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.customer_id = s.customer_id)
         | ORDER BY customer_id""".stripMargin,
    // the vectored count is the clean lineage minus the deleted slice
    "fast_count_mor" ->
      s"""${Oracle.cleanedCte} SELECT COUNT(*) AS n_rows FROM cleaned
         | WHERE quantity <> 17""".stripMargin,
    // the CDC-maintained MV must equal a from-scratch rollup with the
    // DML expressed relationally (delete = filter, update = CASE)
    "mv_cdc_refresh" ->
      s"""${Oracle.warehouseCte} SELECT
         | CAST(EXTRACT(year FROM invoice_date) AS INTEGER) AS year,
         | CAST(EXTRACT(month FROM invoice_date) AS INTEGER) AS month,
         | COUNT(*) AS n_sales,
         | CAST(CAST(SUM(CASE WHEN customer_key % 7 = 2
         |   THEN total_amount + 1.50 ELSE total_amount END)
         |   AS DECIMAL(18,2)) AS DOUBLE) AS revenue
         | FROM fact_sales WHERE customer_key % 7 <> 3
         | GROUP BY 1, 2 ORDER BY year, month""".stripMargin,
    // the tag read is the UNMUTATED cleaned lineage: post-tag DML must
    // not leak through the name-pinned version
    "sql_read_tag" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // sync MERGE: every src row lands verbatim (matched→updated,
    // unmatched→inserted); survivors off-source delete (NATION_2),
    // flag (NATION_4→STALE) or carry, per the conditioned clauses
    "sql_merge_sync" ->
      s"""${Oracle.warehouseCte}, survivors AS (
         |  SELECT customer_key, customer_id, country FROM dim_customer
         |  WHERE country IS DISTINCT FROM 'NATION_7'
         |), src AS (
         |  SELECT customer_key, customer_id, 'KEEP_' || country AS country
         |  FROM dim_customer WHERE country IN ('NATION_1', 'NATION_3')
         |  UNION ALL
         |  SELECT customer_key + 1000000, customer_id || '_B', 'NATION_5B'
         |  FROM dim_customer WHERE country = 'NATION_5')
         | SELECT customer_key, customer_id, country FROM src
         | UNION ALL
         | SELECT s.customer_key, s.customer_id,
         |   CASE WHEN s.country = 'NATION_4' THEN 'STALE'
         |        ELSE s.country END AS country
         | FROM survivors s
         | WHERE NOT EXISTS (SELECT 1 FROM src u
         |                   WHERE u.customer_id = s.customer_id)
         |   AND s.country IS DISTINCT FROM 'NATION_2'
         | ORDER BY customer_id""".stripMargin,
    // the catalog star join is content-wise just the warehouse star
    // join — the DSv2 plumbing (CTAS'd manifest tables, stats-driven
    // broadcasts) must not change a single aggregated row
    "sql_star_join" ->
      s"""${Oracle.warehouseCte}
         | SELECT c.country, d.year, COUNT(*) AS n_sales,
         | CAST(CAST(SUM(f.total_amount) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
         | FROM fact_sales f
         | JOIN dim_customer c ON f.customer_key = c.customer_key
         | JOIN dim_date d ON f.date_key = d.date_key
         | GROUP BY c.country, d.year
         | ORDER BY c.country, d.year""".stripMargin,
    // hidden partitioning is layout, not semantics: the oracle replays
    // the month predicate over the relational cleaned frame
    "sql_hidden_partition" ->
      s"""${Oracle.cleanedCte}
         | SELECT CAST(EXTRACT(year FROM invoice_date) AS INTEGER) AS year,
         |   CAST(EXTRACT(month FROM invoice_date) AS INTEGER) AS month,
         |   COUNT(*) AS n_sales, CAST(SUM(quantity) AS BIGINT) AS sum_qty
         | FROM cleaned
         | WHERE invoice_date >= DATE '1995-01-01'
         |   AND invoice_date < DATE '1996-01-01'
         | GROUP BY 1, 2 ORDER BY year, month""".stripMargin,
    // partition evolution is layout, not semantics: whatever spec each
    // era planned under, the union of both eras IS the clean lineage
    "sql_evolve_partitions" ->
      s"""${Oracle.cleanedCte}
         | SELECT CAST(EXTRACT(year FROM invoice_date) AS INTEGER) AS year,
         |   CAST(EXTRACT(month FROM invoice_date) AS INTEGER) AS month,
         |   COUNT(*) AS n_sales, CAST(SUM(quantity) AS BIGINT) AS sum_qty
         | FROM cleaned
         | WHERE invoice_date >= DATE '1996-06-01'
         | GROUP BY 1, 2 ORDER BY year, month""".stripMargin,
    // evolve is layout, the aligned DELETE is semantics: whatever spec
    // group each file planned under, the survivors are exactly the
    // relational complement
    "sql_evolve_drop" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE invoice_date >= DATE '1996-01-01'
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // the aligned metadata DELETE is exactly the relational complement
    "sql_drop_months" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | WHERE invoice_date >= DATE '1996-01-01'
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    // the storage-partitioned join is layout, not semantics: the
    // oracle replays dim × per-country stats relationally
    "sql_spj_join" ->
      s"""${Oracle.warehouseCte}, cstats AS (
         |  SELECT country, COUNT(*) AS n_customers,
         |         MIN(customer_id) AS first_id
         |  FROM dim_customer GROUP BY country)
         | SELECT c.country, COUNT(*) AS n_customers,
         |   CAST(SUM(t.n_customers) AS BIGINT) AS sum_n,
         |   MIN(t.first_id) AS first_id
         | FROM dim_customer c JOIN cstats t ON c.country = t.country
         | GROUP BY c.country
         | ORDER BY c.country""".stripMargin,
    // bucketing is layout, not semantics: the oracle is the plain join
    "bucketed_join" ->
      s"""${Oracle.warehouseCte}
         | SELECT c.stock_code, p.description,
         |        COUNT(*) AS n_sales,
         |        CAST(SUM(c.quantity) AS BIGINT) AS sum_qty
         | FROM cleaned c JOIN dim_product p ON p.stock_code = c.stock_code
         | GROUP BY 1, 2 ORDER BY c.stock_code""".stripMargin,
    // keyed CDF replayed exactly: NATION_3 keys appear on both sides of
    // the diff -> their images tag update_pre/postimage; NATION_5B keys
    // are insert-only
    "change_feed_keyed" ->
      s"""${Oracle.warehouseCte}
         | SELECT customer_key, customer_id, country,
         |        'update_preimage' AS _change_type
         | FROM dim_customer WHERE country = 'NATION_3'
         | UNION ALL
         | SELECT customer_key, customer_id, 'RELOCATED' AS country,
         |        'update_postimage' AS _change_type
         | FROM dim_customer WHERE country = 'NATION_3'
         | UNION ALL
         | SELECT customer_key + 1000000, customer_id || '_B',
         |        'NATION_5B' AS country, 'insert' AS _change_type
         | FROM dim_customer WHERE country = 'NATION_5'
         | ORDER BY customer_id, _change_type""".stripMargin,
    // same logical feed as change_feed_keyed, produced by the WRITE
    // path's recorded classification instead of the keyed diff — one
    // oracle pins both mechanisms
    "change_feed_upd_images" ->
      s"""${Oracle.warehouseCte}
         | SELECT customer_key, customer_id, country,
         |        'update_preimage' AS _change_type
         | FROM dim_customer WHERE country = 'NATION_3'
         | UNION ALL
         | SELECT customer_key, customer_id, 'RELOCATED' AS country,
         |        'update_postimage' AS _change_type
         | FROM dim_customer WHERE country = 'NATION_3'
         | UNION ALL
         | SELECT customer_key + 1000000, customer_id || '_B',
         |        'NATION_5B' AS country, 'insert' AS _change_type
         | FROM dim_customer WHERE country = 'NATION_5'
         | ORDER BY customer_id, _change_type""".stripMargin,
    // the v0->v1 diff is exactly the rows the delete removed: pred-TRUE
    // rows only (null-country rows survive deletes, so they never
    // appear in the feed)
    "change_feed" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble},
         | 'delete' AS _change_type FROM cleaned
         | WHERE country = 'NATION_7' ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    "compact_roundtrip" ->
      s"${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned ORDER BY ${orderBySql(stagingCols)}",
    // bin-packing is content-preserving: the policy-compacted lineage
    // reads back as exactly the clean lineage
    "autocompact_roundtrip" ->
      s"${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned ORDER BY ${orderBySql(stagingCols)}",
    "snapshot_monthly_v0" ->
      s"""${Oracle.warehouseCte} SELECT
         | CAST(EXTRACT(year FROM invoice_date) AS INTEGER) AS year,
         | CAST(EXTRACT(month FROM invoice_date) AS INTEGER) AS month,
         | COUNT(*) AS n_sales,
         | CAST(CAST(SUM(total_amount) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
         | FROM fact_sales WHERE $mvBatch0Pred
         | GROUP BY 1, 2 ORDER BY year, month""".stripMargin,
    "ingest_evolve" -> Ingest.evolvedOracleSql(orderBySql(stagingCols :+ "channel")),
    // same logical evolution, manifest-schema mechanism
    "evolve_manifest" -> Ingest.evolvedOracleSql(orderBySql(stagingCols :+ "channel")),
    "staging" ->
      s"${Oracle.stagingCte} SELECT ${Oracle.stagingSelectDouble} FROM staging ORDER BY ${orderBySql(stagingCols)}",
    "ingest_csv" ->
      s"${Oracle.stagingCte} SELECT ${Oracle.stagingSelectDouble} FROM staging ORDER BY ${orderBySql(stagingCols)}",
    "ingest_json" ->
      s"${Oracle.stagingCte} SELECT ${Oracle.stagingSelectDouble} FROM staging ORDER BY ${orderBySql(stagingCols)}",
    "ingest_orc" ->
      s"${Oracle.stagingCte} SELECT ${Oracle.stagingSelectDouble} FROM staging ORDER BY ${orderBySql(stagingCols)}",
    "clean_nulls" ->
      s"""${Oracle.stagingCte} SELECT ${Oracle.stagingSelectDouble} FROM staging WHERE ${Oracle.notNullPred}
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    "clean_dedup" ->
      s"""${Oracle.stagingCte} SELECT ${Oracle.stagingSelectDouble} FROM
         | (SELECT DISTINCT * FROM staging WHERE ${Oracle.notNullPred})
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    "clean_qty" ->
      s"""${Oracle.stagingCte} SELECT ${Oracle.stagingSelectDouble} FROM
         | (SELECT DISTINCT * FROM staging WHERE ${Oracle.notNullPred} AND quantity <> 0)
         | ORDER BY ${orderBySql(stagingCols)}""".stripMargin,
    "cleaned" ->
      s"${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned ORDER BY ${orderBySql(stagingCols)}",
    // concat_ws skips NULL arguments in both engines, so the CASE
    // chain reproduces the violation list in declaration order
    "expectations_quarantine" ->
      s"""${Oracle.stagingCte}, q AS (
         | SELECT *, concat_ws(',',
         |   CASE WHEN NOT COALESCE((${Oracle.notNullPred}), FALSE)
         |        THEN 'required_present' END,
         |   CASE WHEN NOT COALESCE(quantity <> 0, FALSE)
         |        THEN 'qty_nonzero' END,
         |   CASE WHEN NOT COALESCE(unit_price > 0, FALSE)
         |        THEN 'price_positive' END) AS violations
         | FROM staging)
         | SELECT ${Oracle.stagingSelectDouble}, violations FROM q
         | WHERE violations <> ''
         | ORDER BY ${orderBySql(stagingCols :+ "violations")}""".stripMargin,
    "dim_product" ->
      s"${Oracle.warehouseCte} SELECT * FROM dim_product ORDER BY product_key",
    "dim_customer" ->
      s"${Oracle.warehouseCte} SELECT * FROM dim_customer ORDER BY customer_key",
    "dim_date" ->
      s"${Oracle.warehouseCte} SELECT * FROM dim_date ORDER BY date_key",
    "fact_sales" ->
      s"""${Oracle.warehouseCte} SELECT invoice_no, product_key, customer_key, date_key,
         | invoice_date, quantity, CAST(unit_price AS DOUBLE) AS unit_price,
         | CAST(total_amount AS DOUBLE) AS total_amount
         | FROM fact_sales ORDER BY ${orderBySql(factCols)}""".stripMargin,
    // identical SQL to fact_sales: the roundtrip must preserve content exactly
    "fact_roundtrip" ->
      s"""${Oracle.warehouseCte} SELECT invoice_no, product_key, customer_key, date_key,
         | invoice_date, quantity, CAST(unit_price AS DOUBLE) AS unit_price,
         | CAST(total_amount AS DOUBLE) AS total_amount
         | FROM fact_sales ORDER BY ${orderBySql(factCols)}""".stripMargin,
  )

  // ------------------------------------------------------- quality / verify
  private val qualityQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stage_counts" -> ((s, d) => Quality.stageCounts(s, d)),
    "q_distinct_stats" -> ((s, d) => Quality.distinctStats(s, d)),
    "q_null_profile" -> ((s, d) => Quality.nullProfile(s, d)),
    "q_analyze_stats" -> ((s, d) => Quality.analyzeStats(s, d)),
    "q_analyze_stats_kmv" -> ((s, d) => Quality.analyzeStatsKmv(s, d)),
    "q_date_range" -> ((s, d) => Quality.dateRange(s, d)),
    "q_revenue_total" -> ((s, d) => Quality.revenueTotal(s, d)),
    "q_dup_groups" -> ((s, d) => Quality.duplicateGroups(s, d)),
    "q_value_checks" -> ((s, d) => Quality.valueChecks(s, d)),
    "q_top_products" -> ((s, d) => Quality.topProducts(s, d)),
    "q_monthly_sales" -> ((s, d) => Quality.monthlySales(s, d)),
    "q_country_sales" -> ((s, d) => Quality.countrySales(s, d)),
    // same result through the salted hot-key join; same oracle SQL
    "q_country_sales_salted" -> ((s, d) => Quality.countrySalesSalted(s, d)),
    "q_region_sales" -> ((s, d) => Quality.regionSales(s, d)),
    "q_sample" -> ((s, d) => moneyDouble(Quality.sampleRows(s, d), Seq("unit_price"))),
    "q_consistency" -> ((s, d) => Quality.consistency(s, d)),
    "q_freshness" -> ((s, d) => Quality.freshness(s, d)),
    // approximate-distinct is registered through the KMV family only:
    // HLL readouts (ApproxStats.distinctStats) are engine-specific, so
    // that operator is pinned by ApproxStatsSpec's tolerance bound
    // rather than a hash-compared oracle row
    // KMV: the approximate sketch that IS deterministic cross-engine
    "q_kmv_distinct" -> ((s, d) => ext.ApproxStats.kmvDistinct(s, d)),
    // Count-Min: fixed-memory point-frequency estimates, fully replayable
    "q_cms_terms" -> ((s, d) => ext.CountMin.termEstimates(s, d)),
    "q_checks" -> ((s, d) => Pipeline.checks(s, d)),
    "q_run_summary" -> ((s, d) => Pipeline.runSummary(s, d)),
    // K6 at engine scope: a reference-style SQL string through the catalog
    "q_sql_interface" -> ((s, d) => Views.sqlInterface(s, d)),
    // OLAP analytics pack (etl/Analytics.scala) — all oracle-checked
    "q_sales_rollup" -> ((s, d) => Analytics.salesRollup(s, d)),
    "q_sales_cube" -> ((s, d) => Analytics.salesCube(s, d)),
    "q_daily_delta" -> ((s, d) => Analytics.dailyDelta(s, d)),
    "q_running_revenue" -> ((s, d) => Analytics.runningRevenue(s, d)),
    "q_price_quantiles" -> ((s, d) => Analytics.priceQuantiles(s, d)),
    "q_country_quantiles" -> ((s, d) => Analytics.countryPriceQuantiles(s, d)),
    "q_fk_orphans" -> ((s, d) => Analytics.fkOrphans(s, d)),
    "q_top_per_country" -> ((s, d) => Analytics.topProductPerCountry(s, d)),
    "q_quarter_pivot" -> ((s, d) => Analytics.quarterPivot(s, d)),
    "q_quarter_unpivot" -> ((s, d) => Analytics.quarterUnpivot(s, d)),
  )

  private val stageCountsOracle: String =
    s"""${Oracle.stagingCte},
       | s2 AS (SELECT * FROM staging WHERE ${Oracle.notNullPred}),
       | s3 AS (SELECT DISTINCT * FROM s2),
       | s4 AS (SELECT * FROM s3 WHERE quantity <> 0),
       | s5 AS (SELECT * FROM s4 WHERE unit_price > 0)
       | SELECT stage, n FROM (
       |   SELECT '1_staging' AS stage, COUNT(*) AS n FROM staging
       |   UNION ALL SELECT '2_not_null', COUNT(*) FROM s2
       |   UNION ALL SELECT '3_dedup', COUNT(*) FROM s3
       |   UNION ALL SELECT '4_qty', COUNT(*) FROM s4
       |   UNION ALL SELECT '5_price', COUNT(*) FROM s5
       | ) ORDER BY stage""".stripMargin

  /** One SQL serves both country-sales variants: the salted-join
    * implementation must be OUTPUT-identical to the broadcast one. */
  private val countrySalesOracle: String =
    s"""${Oracle.warehouseCte} SELECT c.country, COUNT(*) AS n_sales,
       | CAST(CAST(SUM(f.total_amount) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
       | FROM fact_sales f JOIN dim_customer c ON f.customer_key = c.customer_key
       | GROUP BY c.country ORDER BY c.country""".stripMargin

  private val qualityOracles: Map[String, String] = Map(
    "q_stage_counts" -> stageCountsOracle,
    "q_distinct_stats" ->
      s"""${Oracle.cleanedCte} SELECT
         | COUNT(DISTINCT invoice_no) AS n_invoices,
         | COUNT(DISTINCT stock_code) AS n_products,
         | COUNT(DISTINCT customer_id) AS n_customers,
         | COUNT(DISTINCT country) AS n_countries
         | FROM cleaned""".stripMargin,
    "q_analyze_stats" -> Quality.analyzeStatsOracleSql(Oracle.stagingCte),
    "q_analyze_stats_kmv" -> Quality.analyzeStatsKmvOracleSql(Oracle.stagingCte),
    "q_null_profile" ->
      s"""${Oracle.stagingCte} SELECT
         | CAST(SUM(CASE WHEN invoice_no IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_invoice_no,
         | CAST(SUM(CASE WHEN stock_code IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_stock_code,
         | CAST(SUM(CASE WHEN quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_quantity,
         | CAST(SUM(CASE WHEN invoice_date IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_invoice_date,
         | CAST(SUM(CASE WHEN unit_price IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_unit_price,
         | CAST(SUM(CASE WHEN customer_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_customer_id
         | FROM staging""".stripMargin,
    "q_date_range" ->
      s"""${Oracle.cleanedCte} SELECT min(invoice_date) AS min_date,
         | max(invoice_date) AS max_date,
         | COUNT(DISTINCT CAST(invoice_date AS DATE)) AS n_days
         | FROM cleaned""".stripMargin,
    "q_revenue_total" ->
      s"""${Oracle.warehouseCte} SELECT COUNT(*) AS n_rows,
         | CAST(CAST(COALESCE(SUM(total_amount), 0) AS DECIMAL(18,2)) AS DOUBLE) AS total_revenue,
         | CAST(SUM(quantity) AS BIGINT) AS total_quantity
         | FROM fact_sales""".stripMargin,
    "q_dup_groups" ->
      s"""${Oracle.stagingCte} SELECT COUNT(*) AS n_dup_groups,
         | CAST(SUM(n) AS BIGINT) AS n_dup_rows FROM (
         |   SELECT invoice_no, stock_code, COUNT(*) AS n FROM staging
         |   GROUP BY invoice_no, stock_code HAVING COUNT(*) > 1)""".stripMargin,
    "q_value_checks" ->
      s"""${Oracle.stagingCte} SELECT
         | CAST(SUM(CASE WHEN quantity < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative_qty,
         | CAST(SUM(CASE WHEN quantity = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_qty,
         | CAST(SUM(CASE WHEN unit_price = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_price,
         | CAST(SUM(CASE WHEN unit_price < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative_price
         | FROM staging""".stripMargin,
    "q_top_products" ->
      s"""${Oracle.warehouseCte} SELECT product_key,
         | CAST(CAST(SUM(total_amount) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
         | CAST(SUM(quantity) AS BIGINT) AS units
         | FROM fact_sales GROUP BY product_key
         | ORDER BY revenue DESC, product_key LIMIT 10""".stripMargin,
    "q_monthly_sales" -> monthlySalesOracle,
    "q_country_sales" -> countrySalesOracle,
    "q_country_sales_salted" -> countrySalesOracle,
    "q_region_sales" ->
      s"""${Oracle.warehouseCte} SELECT COALESCE(r.r_name, 'UNKNOWN') AS region,
         | COUNT(*) AS n_sales,
         | CAST(CAST(SUM(f.total_amount) AS DECIMAL(18,2)) AS DOUBLE) AS revenue
         | FROM fact_sales f
         | JOIN dim_customer c ON f.customer_key = c.customer_key
         | LEFT JOIN nation n ON c.country = n.n_name
         | LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
         | GROUP BY 1 ORDER BY region""".stripMargin,
    "q_sample" ->
      s"""${Oracle.cleanedCte} SELECT ${Oracle.stagingSelectDouble} FROM cleaned
         | ORDER BY ${orderBySql(stagingCols)} LIMIT 3""".stripMargin,
    "q_consistency" ->
      s"""${Oracle.warehouseCte} SELECT n_cleaned, n_fact, n_cleaned - n_fact AS diff,
         | ABS(n_cleaned - n_fact) * 100 <= n_cleaned * 5 AS within_5pct
         | FROM (SELECT COUNT(*) AS n_cleaned FROM cleaned),
         |      (SELECT COUNT(*) AS n_fact FROM fact_sales)""".stripMargin,
    "q_freshness" ->
      s"""${Oracle.warehouseCte} SELECT staging_max_date, fact_max_date,
         | staging_max_date = fact_max_date AS in_sync
         | FROM (SELECT MAX(CAST(invoice_date AS DATE)) AS staging_max_date FROM cleaned),
         |      (SELECT MAX(CAST(invoice_date AS DATE)) AS fact_max_date FROM fact_sales)""".stripMargin,
    "q_checks" -> s"${Oracle.warehouseCte} ${Oracle.checksSelect}",
    "q_kmv_distinct" -> ext.ApproxStats.kmvDistinctOracleSql(),
    "q_cms_terms" -> ext.CountMin.termEstimatesOracleSql(),
    "q_sales_rollup" -> Analytics.salesRollupOracleSql,
    "q_sales_cube" -> Analytics.salesCubeOracleSql,
    "q_daily_delta" -> Analytics.dailyDeltaOracleSql,
    "q_running_revenue" -> Analytics.runningRevenueOracleSql,
    "q_price_quantiles" -> Analytics.priceQuantilesOracleSql,
    "q_country_quantiles" -> Analytics.countryPriceQuantilesOracleSql,
    "q_fk_orphans" -> Analytics.fkOrphansOracleSql,
    "q_top_per_country" -> Analytics.topProductPerCountryOracleSql(),
    "q_quarter_pivot" -> Analytics.quarterPivotOracleSql,
    "q_quarter_unpivot" -> Analytics.quarterUnpivotOracleSql,
    "q_sql_interface" ->
      s"""${Oracle.warehouseCte} SELECT d.year, d.quarter,
         | COUNT(*) AS n_sales,
         | CAST(CAST(SUM(f.total_amount) AS DECIMAL(18,2)) AS DOUBLE) AS revenue,
         | COUNT(DISTINCT f.invoice_no) AS n_invoices
         | FROM fact_sales f JOIN dim_date d ON f.date_key = d.date_key
         | GROUP BY d.year, d.quarter ORDER BY d.year, d.quarter""".stripMargin,
    "q_run_summary" ->
      s"""${Oracle.warehouseCte},
         | checks AS (${Oracle.checksSelect}),
         | agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_checks,
         |         CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_passed
         |         FROM checks)
         | SELECT n_checks, n_passed, n_passed * 100 // n_checks AS pct_passed,
         |   CASE WHEN n_passed = n_checks THEN 'SUCCESS'
         |        WHEN n_passed * 100 // n_checks >= 70 THEN 'PARTIAL'
         |        ELSE 'FAILED' END AS status
         | FROM agg""".stripMargin,
  )

  // ------------------------------------ LLM-data-pipeline operators (§7.5)
  /** Corpus-with-planted-duplicates CTE — mirrors
    * [[graft.operators.Dedup.corpusWithDups]]. */
  private val corpusCte: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000 AS doc_id, text || ' zzz extra trailing pad' AS text
      |  FROM documents WHERE doc_id % 10 = 5
      |)""".stripMargin

  private val opsQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deduplication family — ALL oracle-checked: hashing is the portable
    // md5-prefix hash ([[operators.Dedup.portableHash60]]), so DuckDB
    // replays MinHash/LSH/SimHash value-for-value; DedupSpec additionally
    // asserts planted-pair recovery
    "exact_dedup" -> ((s, d) => operators.Dedup.exactDedup(s, d)),
    // sequence-level exact dedup: repeated k-token spans keep their
    // first occurrence, every other occurrence is excised in place —
    // the span-level complement of the document-level families
    "substring_dedup" -> ((s, d) => operators.Dedup.substringDedup(s, d)),
    "minhash_pairs" -> ((s, d) => operators.Dedup.minhashPairs(s, d)),
    "simhash_pairs" -> ((s, d) => operators.Dedup.simhashPairs(s, d)),
    "ngram_jaccard" -> ((s, d) => operators.Dedup.ngramJaccard(s, d)),
    "dup_clusters" -> ((s, d) => operators.Dedup.dupClusters(s, d)),
    // text analysis
    "token_stats" -> ((s, d) => operators.TextAnalysis.tokenStats(s, d)),
    "quality_score" -> ((s, d) => operators.TextAnalysis.qualityScore(s, d)),
    "language_id" -> ((s, d) => operators.TextAnalysis.languageId(s, d)),
    "fingerprint" -> ((s, d) => operators.TextAnalysis.fingerprint(s, d)),
    // Gopher-style intra-doc repetition quality signal (no shuffle)
    "repetition_stats" -> ((s, d) => operators.TextAnalysis.repetitionStats(s, d)),
    "term_stats" -> ((s, d) => operators.TextAnalysis.termStats(s, d)),
    // lexical retrieval: inverted-index BM25, postings restricted to the
    // query terms before any aggregation
    "bm25_topk" -> ((s, d) => operators.TextAnalysis.bm25TopK(s, d)),
    "tokenize_ids" -> ((s, d) => operators.TextAnalysis.tokenizeIds(s, d)),
    // the same encode at a realistic 50k vocab via the reference-object
    // VocabLookup expression (a literal map blows the codegen budget there)
    "tokenize_ids_50k" -> ((s, d) => operators.TextAnalysis.tokenizeIdsBroadcast(s, d, 50000)),
    // multimodal binary-column plumbing — all three oracle-checked:
    // media_meta and media_frames replay the binary container as VARCHAR
    // formulas; media_features replays a REAL javax.imageio PNG
    // encode/decode roundtrip by pixel formula
    "media_meta" -> ((s, d) => operators.Multimodal.mediaMeta(s, d)),
    "media_frames" -> ((s, d) => operators.Multimodal.frameSample(s, d)),
    "media_features" -> ((s, d) =>
      operators.Multimodal.decodeFeatures(s, d).toDF().orderBy("doc_id")),
    // real decode + nearest-neighbor resize, formula-oracle-checked
    "media_resize" -> ((s, d) =>
      operators.Multimodal.resizeFeatures(s, d).toDF().orderBy("doc_id")),
    // binaryFile SOURCE roundtrip: PNGs written as real files, read back
    // via spark.read.format("binaryFile"), decoded by the same lineage —
    // hash-matches media_features' formula oracle
    "media_binary_roundtrip" -> ((s, d) =>
      operators.Multimodal.binaryIngestFeatures(s, d).toDF().orderBy("doc_id")),
    // similarity search — brute force, hyperplane-LSH ANN, and embedding
    // near-dups are all oracle-checked (the seeded planes are literal
    // constants DuckDB replays); only the iterative k-means IVF index is
    // rows-only (cross-engine float-sum order differs in centroid
    // averages), covered by SimilaritySpec recall + determinism asserts
    "similarity_topk" -> ((s, d) => operators.Similarity.bruteForceTopK(s, d)),
    "ann_topk" -> ((s, d) => operators.Similarity.annTopK(s, d)),
    "ivf_topk" -> ((s, d) => operators.Similarity.ivfTopK(s, d)),
    // SemDeDup-shaped dedup decision over the same IVF index: within-
    // cluster keep-first pruning of >= minCosine semantic neighbors
    "semantic_dedup" -> ((s, d) => operators.Similarity.semanticDedup(s, d)),
    "q8_codes" -> ((s, d) => operators.Similarity.quantizeCodes(s, d)),
    "q8_topk" -> ((s, d) => operators.Similarity.quantizedTopK(s, d)),
    "pq_codes" -> ((s, d) => operators.Similarity.pqCodes(s, d)),
    "ivfpq_topk" -> ((s, d) => operators.Similarity.ivfpqTopK(s, d)),
    "ivfpq_rerank_topk" -> ((s, d) => operators.Similarity.ivfpqRerankTopK(s, d)),
    // residual encoding (by_residual=true): PQ books quantize
    // vector - coarse_centroid; ADC anchors on the exact query-centroid
    // dot and approximates only the residual
    "pq_residual_codes" -> ((s, d) => operators.Similarity.pqResidualCodes(s, d)),
    "ivfpq_residual_topk" -> ((s, d) => operators.Similarity.ivfpqResidualTopK(s, d)),
    "embedding_near_dups" -> ((s, d) => operators.Similarity.embeddingNearDups(s, d)),
    // output-capped variant: each vector's top-k near-dup neighbors —
    // bounded output on dense duplicate clusters (the all-pairs surface
    // is output-bound: pairs grew 100.8x at the 10x stretch)
    "near_dups_topk" -> ((s, d) => operators.Similarity.nearDupsTopK(s, d)),
    // incremental embedding near-dup maintenance: batch codes join the
    // persisted LSH code index — no corpus re-code, no self-join
    "append_embedding_near_dups" -> ((s, d) =>
      operators.Similarity.appendEmbeddingNearDups(s, d)),
    // training-corpus assembly (operators/Corpus.scala) — all oracle-checked
    "train_split" -> ((s, d) => operators.Corpus.trainSplit(s, d)),
    "epoch_order" -> ((s, d) => operators.Corpus.epochOrder(s, d)),
    "pack_documents" -> ((s, d) => operators.Corpus.packDocuments(s, d)),
    "clean_corpus" -> ((s, d) => operators.Corpus.cleanCorpus(s, d)),
    "interleave_sources" -> ((s, d) => operators.Corpus.interleaveSources(s, d)),
    "decontaminate" -> ((s, d) => operators.Corpus.decontaminate(s, d)),
    // bloom-prefiltered twin for eval sets too big to broadcast exactly:
    // scan-stage bloom probe kills ~99% of grams, exact join re-verifies
    // the hits — must hash-match the exact path's oracle
    "decontaminate_bloom" -> ((s, d) => operators.Corpus.decontaminateBloom(s, d)),
    "stratified_sample" -> ((s, d) => operators.Corpus.stratifiedSample(s, d)),
    "temperature_mix" -> ((s, d) => operators.Corpus.temperatureMix(s, d)),
    "corpus_append" -> ((s, d) => operators.Corpus.appendBatch(s, d)),
    // incremental NEAR-dup maintenance: batch LSH-joins the persisted
    // MinHash band/signature index — no recluster, no corpus text rescan
    "append_near_dups" -> ((s, d) => operators.Corpus.appendNearDups(s, d)),
    // end-to-end corpus pipeline: scrub → quality → dedup (exact + near
    // clusters) → decontaminate → split → interleave/pack, with per-stage
    // row metrics — DuckDB replays EVERY stage including the clustering
    "corpus_run_summary" -> ((s, d) => operators.CorpusPipeline.runSummary(s, d)),
    // corpus scrubbing (operators/Scrub.scala) — PII redaction and
    // boilerplate chunk detection, both over deterministic injections
    "pii_scrub" -> ((s, d) => operators.Scrub.piiScrub(s, d)),
    "boilerplate_stats" -> ((s, d) => operators.Scrub.boilerplateStats(s, d)),
    // the rewrite counterpart: drop cross-document repeated chunks and
    // hash-check the reassembled text (digest-only shuffles)
    "strip_boilerplate" -> ((s, d) => operators.Scrub.stripBoilerplate(s, d)),
    "chunk_dedup_keepfirst" -> ((s, d) => operators.Scrub.chunkDedupKeepFirst(s, d)),
    // cluster-aware split: near-dup families never straddle train/val
    "leakage_safe_split" -> ((s, d) => operators.Corpus.leakageSafeSplit(s, d)),
    // event analytics
    "hourly_rollup" -> ((s, d) => operators.Events.hourlyRollup(s, d)),
    "sessionize" -> ((s, d) => operators.Events.sessionize(s, d)),
    "sessionize_scalable" -> ((s, d) => operators.Events.sessionizeScalable(s, d)),
    "json_stats" -> ((s, d) => operators.Events.jsonStats(s, d)),
    "top_users" -> ((s, d) => operators.Events.topUsers(s, d)),
    "daily_active" -> ((s, d) => operators.Events.dailyActive(s, d)),
    "funnel_stages" -> ((s, d) => operators.Events.funnelStages(s, d)),
    "cohort_retention" -> ((s, d) => operators.Events.cohortRetention(s, d)),
    "topk_per_user" -> ((s, d) => operators.Events.topValuesPerUser(s, d)),
    "q_daily_kmv" -> ((s, d) => operators.Events.dailyDistinctKmv(s, d)),
    // range join: bin-bucketized interval join (no nested-loop cross
    // product) — clicks inside each user's 2h purchase windows
    "range_join" -> ((s, d) => ext.RangeJoin.clickInPurchaseWindow(s, d)),
    "layout_zorder" -> ((s, d) => ext.Layout.zorderKeys(s, d)),
    // zone-map data skipping over the z-clustered copy: the grouped box
    // aggregate is answered from a file-PRUNED read, so the full-scan
    // oracle checks the pruning logic end to end
    "skipping_scan" -> ((s, d) => ext.Skipping.skippingScan(s, d)),
    // as-of join: each click picks up the user's most recent purchase
    "asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("p_value"))
      ext.AsOfJoin.asofJoin(clicks, purchases, "user_id", "ts")
        .orderBy("event_id")
    }),
  )

  private val stopwordList = operators.TextAnalysis.stopwordSqlList

  private def langScoreSql(code: String): String = {
    val words = operators.TextAnalysis.langProfiles(code).map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($words))) AS INTEGER) AS score_$code"
  }

  /** events with ts truncated ns->us, mirroring [[graft.Tables.events]]. */
  private val eventsCte: String =
    """WITH ev AS (
      |  SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
      |         user_id, event_type, value, props
      |  FROM events
      |)""".stripMargin

  /** One SQL serves both sessionize variants: the skew-safe two-phase
    * implementation must be OUTPUT-identical to the single-window one. */
  private val sessionizeOracle: String =
    s"""$eventsCte, marked AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      |  FROM marked
      |)
      |SELECT user_id, session_seq, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
      |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin

  private val opsOracles: Map[String, String] = Map(
    "sessionize" -> sessionizeOracle,
    "sessionize_scalable" -> sessionizeOracle,
    "substring_dedup" -> operators.Dedup.substringDedupOracleSql(corpusCte),
    "minhash_pairs" -> operators.Dedup.minhashOracleSql(corpusCte),
    "simhash_pairs" -> operators.Dedup.simhashOracleSql(corpusCte),
    "ngram_jaccard" -> operators.Dedup.ngramJaccardOracleSql(corpusCte),
    "dup_clusters" -> operators.Dedup.dupClustersOracleSql(corpusCte),
    "exact_dedup" ->
      s"""$corpusCte SELECT keep_id, n_copies FROM (
         |  SELECT md5(text) AS digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         |  FROM corpus GROUP BY 1)
         | ORDER BY keep_id""".stripMargin,
    "token_stats" ->
      s"""SELECT doc_id,
         | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         | CAST(length(text) AS INTEGER) AS n_chars,
         | CAST(length(replace(text, ' ', '')) AS INTEGER) AS n_alpha,
         | CAST(len(regexp_extract_all(text, '${operators.TextAnalysis.subwordPattern}')) AS INTEGER) AS n_subwords,
         | CAST(ceil(length(text) / 4.0) AS INTEGER) AS n_bpe_est
         | FROM documents ORDER BY doc_id""".stripMargin,
    "quality_score" ->
      s"""SELECT doc_id, n_tokens, n_stopwords, n_chars,
         | (${operators.TextAnalysis.qualityGateSql}) AS quality_pass
         | FROM (SELECT doc_id,
         |   CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |   CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopwordList))) AS INTEGER) AS n_stopwords,
         |   CAST(length(text) AS INTEGER) AS n_chars
         |   FROM documents)
         | ORDER BY doc_id""".stripMargin,
    "language_id" ->
      s"""SELECT doc_id, labeled_lang,
         | CASE WHEN m <= 0 THEN 'und'
         |      WHEN score_fr = m THEN 'fr'
         |      WHEN score_es = m THEN 'es'
         |      WHEN score_en = m THEN 'en'
         |      ELSE 'de' END AS detected_lang,
         | m AS lang_score
         | FROM (SELECT *, greatest(score_de, score_en, score_es, score_fr) AS m
         |   FROM (SELECT doc_id, lang AS labeled_lang,
         |     ${langScoreSql("de")}, ${langScoreSql("en")},
         |     ${langScoreSql("es")}, ${langScoreSql("fr")}
         |     FROM documents))
         | ORDER BY doc_id""".stripMargin,
    "term_stats" ->
      """SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
        | CAST(COUNT(*) AS BIGINT) AS total_tf
        | FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        | GROUP BY term HAVING COUNT(DISTINCT doc_id) >= 5
        | ORDER BY term""".stripMargin,
    "bm25_topk" -> operators.TextAnalysis.bm25OracleSql(),
    "tokenize_ids" -> operators.TextAnalysis.tokenizeIdsOracleSql,
    "repetition_stats" -> operators.TextAnalysis.repetitionStatsOracleSql,
    "tokenize_ids_50k" -> operators.TextAnalysis.tokenizeIdsOracleSqlAt(50000),
    // media_meta's outputs are defined by formulas over (doc_id, text), so
    // the oracle replays the formulas — verifying the binary encode ->
    // slice -> decode roundtrip end to end
    "media_meta" ->
      """SELECT doc_id, 'GRFT' AS magic,
        | CAST(16 + doc_id % 64 AS INTEGER) AS width,
        | CAST(16 + (doc_id * 7) % 64 AS INTEGER) AS height,
        | CAST(1 + doc_id % 3 AS INTEGER) AS channels,
        | CAST(length(text) AS INTEGER) AS payload_bytes
        | FROM documents ORDER BY doc_id""".stripMargin,
    "media_features" -> operators.Multimodal.decodeFeaturesOracleSql(),
    // identical SQL to media_features: the file roundtrip must preserve
    // the decoded statistics exactly
    "media_binary_roundtrip" -> operators.Multimodal.decodeFeaturesOracleSql(),
    "media_resize" -> operators.Multimodal.resizeFeaturesOracleSql(),
    "media_frames" -> operators.Multimodal.frameSampleOracleSql(),
    "fingerprint" ->
      """SELECT doc_id,
        | list_reduce(
        |   list_prepend(CAST(7 AS BIGINT),
        |     list_transform(string_split(text, ' '), w -> CAST(length(w) AS BIGINT))),
        |   (acc, x) -> (acc * 31 + x + 1) % 1000000007) AS fingerprint
        | FROM documents ORDER BY doc_id""".stripMargin,
    "train_split" -> operators.Corpus.trainSplitOracleSql,
    "epoch_order" -> operators.Corpus.epochOrderOracleSql(),
    "interleave_sources" -> operators.Corpus.interleaveSourcesOracleSql(),
    "pack_documents" -> operators.Corpus.packDocumentsOracleSql(),
    "clean_corpus" -> operators.Corpus.cleanCorpusOracleSql,
    "decontaminate" -> operators.Corpus.decontaminateOracleSql(corpusCte),
    "decontaminate_bloom" -> operators.Corpus.decontaminateOracleSql(corpusCte),
    "stratified_sample" -> operators.Corpus.stratifiedSampleOracleSql,
    "temperature_mix" -> operators.Corpus.temperatureMixOracleSql,
    "corpus_append" -> operators.Corpus.appendBatchOracleSql,
    "append_near_dups" -> operators.Corpus.appendNearDupsOracleSql(corpusCte),
    "corpus_run_summary" -> operators.CorpusPipeline.runSummaryOracleSql,
    "pii_scrub" -> operators.Scrub.piiScrubOracleSql,
    "boilerplate_stats" -> operators.Scrub.boilerplateOracleSql(corpusCte),
    "strip_boilerplate" -> operators.Scrub.stripBoilerplateOracleSql(corpusCte),
    "chunk_dedup_keepfirst" -> operators.Scrub.chunkDedupKeepFirstOracleSql(corpusCte),
    "leakage_safe_split" -> operators.Corpus.leakageSafeSplitOracleSql(corpusCte),
    "similarity_topk" -> operators.Similarity.bruteForceOracleSql(),
    "ann_topk" -> operators.Similarity.annOracleSql(),
    "embedding_near_dups" -> operators.Similarity.nearDupsOracleSql(),
    "near_dups_topk" -> operators.Similarity.nearDupsTopKOracleSql(),
    "append_embedding_near_dups" ->
      operators.Similarity.appendEmbeddingNearDupsOracleSql(),
    "ivf_topk" -> operators.Similarity.ivfOracleSql(),
    "semantic_dedup" -> operators.Similarity.semanticDedupOracleSql(),
    "q8_codes" -> operators.Similarity.quantizeCodesOracleSql,
    "q8_topk" -> operators.Similarity.quantizedTopKOracleSql(),
    "pq_codes" -> operators.Similarity.pqCodesOracleSql,
    "ivfpq_topk" -> operators.Similarity.ivfpqOracleSql(),
    "ivfpq_rerank_topk" -> operators.Similarity.ivfpqRerankOracleSql(),
    "pq_residual_codes" -> operators.Similarity.pqResidualCodesOracleSql,
    "ivfpq_residual_topk" -> operators.Similarity.ivfpqResidualOracleSql(),
    "hourly_rollup" ->
      s"""$eventsCte SELECT date_trunc('hour', ts) AS hour, event_type,
         | COUNT(*) AS n_events,
         | CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
         | FROM ev GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "json_stats" ->
      """SELECT event_type, COUNT(*) AS n_events,
        | CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
        | FROM (SELECT event_type,
        |   CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS INTEGER) AS k
        |   FROM events)
        | GROUP BY event_type ORDER BY event_type""".stripMargin,
    "top_users" ->
      """SELECT user_id, COUNT(*) AS n_events,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
        | FROM events GROUP BY user_id
        | ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin,
    "daily_active" ->
      s"""$eventsCte SELECT CAST(ts AS DATE) AS day,
         | COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
         | FROM ev GROUP BY 1 ORDER BY day""".stripMargin,
    "range_join" -> ext.RangeJoin.clickInPurchaseWindowOracleSql,
    "layout_zorder" -> ext.Layout.zorderKeysOracleSql,
    "skipping_scan" -> ext.Skipping.skippingScanOracleSql,
    "funnel_stages" -> operators.Events.funnelOracleSql(eventsCte),
    "cohort_retention" -> operators.Events.cohortOracleSql(eventsCte),
    "topk_per_user" -> operators.Events.topValuesOracleSql(eventsCte),
    "q_daily_kmv" -> operators.Events.dailyKmvOracleSql(eventsCte),
    "asof_join" ->
      s"""$eventsCte,
         | clicks AS (SELECT user_id, ts, event_id, value FROM ev WHERE event_type = 'click'),
         | purch AS (SELECT user_id, ts AS p_ts, MAX(value) AS p_value
         |           FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2)
         | SELECT c.user_id, c.ts, c.event_id, c.value, p.p_value
         | FROM clicks c ASOF LEFT JOIN purch p
         |   ON c.user_id = p.user_id AND c.ts >= p.p_ts
         | ORDER BY event_id""".stripMargin,
  )

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.5). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    etlQueries ++ qualityQueries ++ opsQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted only for genuinely non-replayable ops
    * (seeded ANN indexes, approximate sketches) — see ContractSpec. */
  def oracleSql: Map[String, String] =
    etlOracles ++ qualityOracles ++ opsOracles
}
