package graft.ext

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
  * table size. Deletion is atomic per file (write replacement, then
  * swap); a version-directory wrapper ([[Snapshots]]) turns the whole
  * delete into one atomic publish when readers must never see a partial
  * delete.
  *
  * DeletesSpec proves the two contracts: (1) survivors are exactly
  * `NOT predicate`, (2) files without matches are NOT rewritten
  * (same path, same bytes). */
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

  /** Delete matching rows in place: rewrite each affected file without
    * its matching rows (into a sibling replacement), delete the
    * original. Untouched files are not opened for write. Returns
    * (affected, total) file counts. */
  def deleteWhere(spark: SparkSession, path: String, pred: Column): (Int, Int) = {
    val all = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(_.toString)
    val affected = affectedFiles(spark, path, pred)
    // survivors are rows where pred is NOT TRUE — a null predicate value
    // (e.g. a null delete key) must SURVIVE, matching affectedFiles'
    // filter(pred) which treats null as no-match; a bare !pred would
    // silently drop null-key rows from rewritten files only
    val survivorPred = !coalesce(pred, lit(false))
    affected.foreach { f =>
      val local = f.stripPrefix("file:").stripPrefix("//")
      val tmp = s"$path/.rewrite_${new java.io.File(local).getName}"
      spark.read.parquet(local).filter(survivorPred)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("."))
      // crash-safe order: park the original under a hidden .trash name
      // FIRST (readers ignore dotfiles; a crash here leaves the trash
      // recoverable), then move the replacement in, then clear the trash
      // — at no point are the surviving rows only in a location a crash
      // would orphan alongside a deleted original
      val orig = new java.io.File(local)
      val trash = orig.getParentFile.toPath.resolve(".trash_" + orig.getName)
      java.nio.file.Files.move(orig.toPath, trash)
      // the original writer's Hadoop-local-FS checksum shadow must not
      // outlive it — a same-name replacement with different bytes would
      // fail ChecksumException on read
      java.nio.file.Files.deleteIfExists(
        orig.getParentFile.toPath.resolve("." + orig.getName + ".crc"))
      part.foreach { p =>
        java.nio.file.Files.move(p.toPath, java.nio.file.Paths.get(local))
      }
      java.nio.file.Files.delete(trash)
      // clear the scratch dir (marker + crc files)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      java.nio.file.Files.delete(java.nio.file.Paths.get(tmp))
    }
    (affected.size, all.length)
  }
}
