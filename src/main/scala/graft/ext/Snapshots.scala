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
  *    an auditor pins `v0` while production reads latest.
  *
  * At 100 TB the protocol costs one directory listing per read and
  * nothing per row — the data files are ordinary parquet with full
  * pushdown/pruning. (What it deliberately does NOT provide: concurrent
  * WRITER coordination — that needs a log with compare-and-swap, the one
  * piece plain object storage cannot express.) */
object Snapshots {

  private val vPattern = "v(\\d+)".r

  def latestVersion(base: String): Option[Int] =
    Option(new java.io.File(base).listFiles()).toSeq.flatten
      .flatMap(f => f.getName match {
        case vPattern(n) if new java.io.File(f, "_SUCCESS").exists() => Some(n.toInt)
        case _ => None
      }) match {
      case Seq() => None
      case vs => Some(vs.max)
    }

  /** Publish `df` as the next version; returns the version written. */
  def commit(df: DataFrame, base: String): Int = {
    val v = latestVersion(base).map(_ + 1).getOrElse(0)
    df.write.mode("overwrite").parquet(s"$base/v$v")
    v
  }

  def readAt(spark: SparkSession, base: String, version: Int): DataFrame = {
    require(new java.io.File(s"$base/v$version/_SUCCESS").exists(),
      s"version $version was never committed under $base")
    spark.read.parquet(s"$base/v$version")
  }

  def readLatest(spark: SparkSession, base: String): DataFrame =
    readAt(spark, base,
      latestVersion(base).getOrElse(sys.error(s"no committed version under $base")))
}
