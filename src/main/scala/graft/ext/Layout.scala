package graft.ext

import graft.Tables
import graft.functions.ZOrderExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order clustering for the write path
  * (the OPTIMIZE ZORDER BY of Delta/Iceberg, rebuilt on plain parquet).
  *
  * Single-column sorting prunes one predicate dimension; a 100 TB fact
  * table is filtered on several. Sorting the write by the Morton
  * interleave of two key columns ([[graft.functions.ZOrder2]]) places
  * rows that are close in BOTH dimensions into the same range partition,
  * so every output file covers a compact rectangle-set of the key space
  * and parquet footer min/max stats let a 2-D box predicate skip most
  * files — LayoutSpec measures files-touched directly.
  *
  * Scale shape: the clustering write is one `repartitionByRange` over the
  * 64-bit z-key (a single range shuffle, the same cost as any sorted
  * write) + an in-partition sort; reads stay plain parquet scans with
  * pushdown. The z-key itself is branch-free codegen'd bit math.
  */
object Layout {

  /** 16-bit coordinates for the lineitem clustering demo: the two
    * most-filtered fact foreign keys. */
  private def withZKey(df: DataFrame): DataFrame = {
    ZOrderExprs.register(df.sparkSession)
    df.withColumn("zkey",
      expr("z_order2(cast(l_partkey % 65536 as int), cast(l_suppkey % 65536 as int))"))
  }

  /** Registered query: the z-key of every lineitem row — pins the full
    * bit-interleave contract against the Σ-form oracle. */
  def zorderKeys(spark: SparkSession, dir: String): DataFrame =
    withZKey(Tables.lineitem(spark, dir))
      .select(col("l_orderkey"), col("l_linenumber"), col("zkey"))
      .orderBy("l_orderkey", "l_linenumber")

  def zorderKeysOracleSql: String = {
    val z = graft.functions.ZOrder2.interleaveSql(
      "CAST(l_partkey % 65536 AS INTEGER)", "CAST(l_suppkey % 65536 AS INTEGER)")
    s"""SELECT l_orderkey, l_linenumber, $z AS zkey
       |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  /** Write `lineitem` clustered by z-order of (partkey, suppkey) into
    * `nFiles` range partitions; returns the path written. */
  def writeClustered(spark: SparkSession, dir: String, outPath: String,
      nFiles: Int = 8): String = {
    withZKey(Tables.lineitem(spark, dir))
      .repartitionByRange(nFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(outPath)
    outPath
  }

  /** The naive comparison layout: same file count, hash-scattered rows. */
  def writeScattered(spark: SparkSession, dir: String, outPath: String,
      nFiles: Int = 8): String = {
    withZKey(Tables.lineitem(spark, dir))
      .repartition(nFiles, col("l_orderkey"))
      .write.mode("overwrite").parquet(outPath)
    outPath
  }

  /** Small-file compaction — the standard nightly job on any
    * streamed-into table: many tiny part files (one per micro-batch or
    * task) become few target-sized ones. At 100 TB the small-file
    * problem is a metadata and open()-per-file tax on EVERY subsequent
    * read; compaction pays one rewrite to remove it. Content is
    * preserved row-exactly (the oracle-checked roundtrip proves
    * compacted == original), and the rewrite lands as a NEW directory so
    * it can publish through [[Snapshots]] atomically rather than
    * mutating in place. `targetFiles` in a real deployment derives from
    * total-bytes / desired-file-size. Returns (files before, after). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFiles: Int): (Long, Long) = {
    val before = countParts(spark, inPath)
    spark.read.parquet(inPath)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(outPath)
    (before, countParts(spark, outPath))
  }

  private def countParts(spark: SparkSession, path: String): Long =
    Dfs.dataFiles(spark, path).size.toLong

  /** Distinct files containing rows matching a 2-D box predicate — the
    * files a stats-pruning reader must touch. */
  def filesTouched(spark: SparkSession, path: String,
      partMax: Long, suppMax: Long): Long =
    spark.read.parquet(path)
      .filter(col("l_partkey") % 65536 < partMax && col("l_suppkey") % 65536 < suppMax)
      .select(input_file_name().as("f"))
      .distinct().count()
}
