package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Surgical row deletion on plain parquet — the right-to-be-forgotten
  * operation every retained dataset eventually needs, done the way a
  * 100 TB table can afford: rewrite ONLY the files that contain matching
  * rows and leave every other file byte-untouched.
  *
  * A naive DELETE is a full-table rewrite (read 100 TB, write ~100 TB).
  * Here the rewrite set is discovered with one scan that costs almost
  * nothing when the delete key is clustered (partition pruning /
  * [[Layout]] z-order / footer stats narrow the scan; worst case it is a
  * key-column-only scan), and the rewrite touches `|affected files|`
  * only — for a clustered key that is a handful of files regardless of
  * table size. Affected files are rewritten CONCURRENTLY (one Spark job
  * per file, submitted from a bounded driver pool — Spark's scheduler
  * interleaves them across executors), so a scattered predicate touching
  * many files costs ~max-file wall, not sum-of-files. All file
  * manipulation goes through the Hadoop [[Dfs]] layer: the table may
  * live on `hdfs:`/`s3a:`, not just the driver's disk.
  *
  * Atomicity: each file swap is rename-based (park original under a
  * hidden `.trash_` name, rename the replacement in, clear the trash) —
  * a crash at any point leaves the survivors recoverable and never
  * leaves a truncated visible file. A directory reader racing the swap
  * can transiently miss the in-flight file's rows; when readers must
  * never observe a partial delete, use [[Manifests.deleteWhere]]
  * instead — the same affected-files-only rewrite, published as an
  * atomic manifest swap with the pre-delete version kept readable
  * (in-place mutation cannot be made atomic table-wide without a
  * manifest log, which is exactly what Manifests provides). This
  * in-place variant remains for plain directories no protocol owns.
  *
  * DeletesSpec proves the two contracts: (1) survivors are exactly
  * `NOT predicate` (null predicate values SURVIVE), (2) files without
  * matches are NOT rewritten (same path, same bytes). */
object Deletes {

  /** Files under `path` containing at least one row matching `pred` —
    * the minimal rewrite set. */
  def affectedFiles(spark: SparkSession, path: String, pred: Column): Seq[String] =
    spark.read.parquet(path)
      .filter(pred)
      .select(input_file_name().as("f"))
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSeq

  /** How many rewrite jobs run at once. Each is a small one-file read→
    * filter→write; the pool bounds DRIVER-side job submission, the
    * cluster scheduler does the real interleaving. */
  private val rewriteParallelism = 8

  /** Delete matching rows in place: rewrite each affected file without
    * its matching rows (into a sibling replacement), swap it over the
    * original. Untouched files are not opened for write. Returns
    * (affected, total) file counts. */
  def deleteWhere(spark: SparkSession, path: String, pred: Column): (Int, Int) = {
    val total = Dfs.dataFiles(spark, path).size
    val affected = affectedFiles(spark, path, pred)
    // survivors are rows where pred is NOT TRUE — a null predicate value
    // (e.g. a null delete key) must SURVIVE, matching affectedFiles'
    // filter(pred) which treats null as no-match; a bare !pred would
    // silently drop null-key rows from rewritten files only
    val survivorPred = !coalesce(pred, lit(false))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(rewriteParallelism, affected.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val jobs = affected.map { f => scala.concurrent.Future {
        // input_file_name() yields a URI; Path(URI) keeps the scheme so
        // the swap lands on the same filesystem the table lives on
        val orig = new Path(new java.net.URI(f))
        val dir = orig.getParent
        val tmp = new Path(dir, s".rewrite_${orig.getName}").toString
        spark.read.parquet(orig.toString).filter(survivorPred)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = Dfs.list(spark, tmp).map(_.getPath)
          .find(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("."))
        // crash-safe order: park the original under a hidden .trash name
        // FIRST (readers ignore dotfiles; a crash here leaves the trash
        // recoverable), then move the replacement in, then clear the
        // trash — at no point are the surviving rows only in a location
        // a crash would orphan alongside a deleted original. Hadoop
        // renames carry the local-FS checksum shadow with the file, so
        // no stale .crc can outlive its original.
        val trash = new Path(dir, s".trash_${orig.getName}")
        Dfs.rename(spark, orig.toString, trash.toString)
        part.foreach(p => Dfs.rename(spark, p.toString, orig.toString))
        Dfs.delete(spark, trash.toString)
        Dfs.delete(spark, tmp, recursive = true)
      }}
      import scala.concurrent.duration.Duration
      scala.concurrent.Await.result(scala.concurrent.Future.sequence(jobs), Duration.Inf)
    } finally pool.shutdown()
    (affected.size, total)
  }
}
