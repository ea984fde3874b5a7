package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Version-directory snapshot protocol — the minimal Delta-style commit
  * contract the incremental modules ([[graft.etl.Mv]],
  * [[graft.streaming.Streams.commitMvVersion]]) already follow, exposed
  * as a first-class reader/writer so ANY table can get atomic publishes
  * and time travel on plain parquet:
  *
  *  - a version is a complete directory `base/v<i>`; it EXISTS only once
  *    its `_SUCCESS` marker does (Spark writes the marker last), so
  *    readers never observe a partial write — the commit is the marker
  *    rename, not the data copy;
  *  - [[latestVersion]] ignores marker-less directories, which is what
  *    makes a crashed writer invisible and a re-run (overwriting the
  *    same version) a no-op for readers;
  *  - [[readAt]] is time travel: historical versions are immutable, so
  *    an auditor pins `v0` while production reads latest;
  *  - CONCURRENT writers coordinate through a compare-and-swap claim:
  *    [[commit]] first wins `base/_claims/v<i>` with an atomic
  *    create-if-absent ([[Dfs.createExclusive]]); a loser observes the
  *    taken claim and retries at the next version, so two simultaneous
  *    committers land as v_i and v_{i+1} — neither overwrites the other
  *    (SnapshotsSpec interleaves two and proves both survive). A claim
  *    whose writer crashed before `_SUCCESS` burns a version number and
  *    nothing else — readers skip it.
  *
  * At 100 TB the protocol costs one directory listing per read and
  * nothing per row — the data files are ordinary parquet with full
  * pushdown/pruning, and all protocol I/O goes through the Hadoop
  * [[Dfs]] layer so the base may live on `hdfs:`/`s3a:`/`viewfs:`
  * alongside the data. */
object Snapshots {

  private val vPattern = "v(\\d+)".r

  def latestVersion(spark: SparkSession, base: String): Option[Int] =
    Dfs.list(spark, base)
      .flatMap(s => s.getPath.getName match {
        case vPattern(n) if Dfs.exists(spark, s"${s.getPath}/_SUCCESS") => Some(n.toInt)
        case _ => None
      }) match {
      case Seq() => None
      case vs => Some(vs.max)
    }

  /** Publish `df` as the next version; returns the version written.
    * Safe under concurrent committers: the version number is WON via
    * the `_claims` CAS before any data is written. */
  def commit(df: DataFrame, base: String): Int = {
    val spark = df.sparkSession
    var v = latestVersion(spark, base).map(_ + 1).getOrElse(0)
    while (!Dfs.createExclusive(spark, s"$base/_claims/v$v")) v += 1
    df.write.mode("overwrite").parquet(s"$base/v$v")
    v
  }

  def readAt(spark: SparkSession, base: String, version: Int): DataFrame = {
    require(Dfs.exists(spark, s"$base/v$version/_SUCCESS"),
      s"version $version was never committed under $base")
    spark.read.parquet(s"$base/v$version")
  }

  def readLatest(spark: SparkSession, base: String): DataFrame =
    readAt(spark, base, latestVersion(spark, base)
      .getOrElse(sys.error(s"no committed version under $base")))

  /** Retention: delete every version older than the newest `keepLast`
    * committed ones — the VACUUM every versioned table eventually
    * needs, because time travel otherwise retains one full table copy
    * per commit forever. Also sweeps marker-less (crashed-writer)
    * directories and burned claims below the retention floor; claims
    * at or above it stay, so the CAS ordering of in-flight committers
    * is untouched. New commits always claim above the retained latest,
    * so vacuuming can never resurrect a version number.
    *
    * This DEFINES the time-travel horizon: a reader pinned below it
    * fails loudly in [[readAt]]'s committed-version check rather than
    * seeing partial data. Cost is pure metadata + deletes of the
    * dropped copies; retained versions are untouched (immutability
    * contract preserved). Returns the vacuumed version numbers. */
  def vacuum(spark: SparkSession, base: String, keepLast: Int = 2): Seq[Int] = {
    require(keepLast >= 1, s"keepLast must retain at least the latest ($keepLast)")
    val committed = Dfs.list(spark, base)
      .flatMap(_.getPath.getName match {
        case vPattern(n) if Dfs.exists(spark, s"$base/v$n/_SUCCESS") => Some(n.toInt)
        case _ => None
      }).sorted
    if (committed.isEmpty) return Seq.empty
    val floor = committed.takeRight(keepLast).head
    // any v-dir below the floor — committed (expired) or marker-less
    // (crashed before _SUCCESS) — is garbage now
    val dropDirs = Dfs.list(spark, base)
      .flatMap(_.getPath.getName match {
        case vPattern(n) if n.toInt < floor => Some(n.toInt)
        case _ => None
      }).sorted
    dropDirs.foreach(v => Dfs.delete(spark, s"$base/v$v", recursive = true))
    Dfs.list(spark, s"$base/_claims")
      .foreach(_.getPath.getName match {
        case vPattern(n) if n.toInt < floor =>
          Dfs.delete(spark, s"$base/_claims/v$n")
        case _ => ()
      })
    dropDirs.toSeq
  }
}
