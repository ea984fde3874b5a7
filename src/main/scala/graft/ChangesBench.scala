package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the DECADE CHECK on the `.changes` DSv2 stream — a 100×
  * mirror relay over the change feed, the scale evidence StreamsSpec's
  * fixture-sized mirror cannot give.
  *
  * Sequence (the production CDC-consumer shape):
  *  - v0 snapshot (~half the 100× rows), served as batch 0;
  *  - three live APPENDS drained one batch each;
  *  - a merge-on-read DELETE of one country (DV churn batch — no data
  *    file changed, the feed reads churned positions only);
  *  - stop, metadata-only TYPE WIDENING (int→bigint), one more append
  *    under the wide schema, restart from the same checkpoint — the
  *    catch-up batch casts narrow-era rows up (the StreamsSpec
  *    contract, here at 100×).
  *
  * The consumer maintains SIGNED RUNNING TOTALS (rows and quantity,
  * +insert/−delete) — a relay that must see every change exactly once;
  * at the end the totals must equal the source's own aggregate, and
  * the materialized feed dirs under the checkpoint must stay purged
  * (≤2, Delta-CDF-bounded). Reported per batch: wall seconds, rows,
  * feed-dir count and bytes after the drain.
  *
  * `sbt "runMain graft.ChangesBench <inDir> [factor=100]"` — one JSON
  * line LAST. */
object ChangesBench {

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val spark = BenchHarness.session()
    val root = BenchHarness.workRoot(s"graft_chbench_${factor}x")
    BenchHarness.manifestCatalog(spark, s"$root/wh")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.cb")
    val base = s"$root/wh/cb/src"
    val ckpt = s"$root/ckpt"

    def t[A](body: => A): (A, Double) = BenchHarness.timed(body)

    // ---- source: cleaned × factor, country-clustered; half as v0,
    // the rest in four append slices
    val (slices, buildSec) = t {
      val cleaned = etl.Warehouse(spark, inDir).cleaned
      val copies = spark.range(factor).select(col("id").as("_copy"))
      val big = cleaned.crossJoin(copies)
        .withColumn("invoice_no",
          concat(col("invoice_no"), lit("#"), col("_copy")))
        .withColumn("_slice",
          when(col("_copy") < factor / 2, 0)
            .otherwise(pmod(col("_copy"), lit(4)) + 1))
        .drop("_copy")
        .persist()
      big.count()
      (0 to 4).map(i => big.filter(col("_slice") === i).drop("_slice"))
    }
    slices(0).repartitionByRange(64, col("country"))
      .createOrReplaceTempView("chbench_seed")
    spark.sql("CREATE TABLE graft.cb.src AS SELECT * FROM chbench_seed") // v0
    val srcT = "graft.cb.src"

    // ---- the relay consumer: signed running totals
    val totRows = new java.util.concurrent.atomic.AtomicLong(0)
    val totQty = new java.util.concurrent.atomic.AtomicLong(0)
    val applied = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    def apply(b: DataFrame, batchId: Long): Unit = {
      if (applied.contains(batchId)) return
      val agg = b.select(
        sum(when(col("_change_type") === "insert", 1L).otherwise(-1L))
          .as("n"),
        sum(when(col("_change_type") === "insert",
          col("quantity").cast("long"))
          .otherwise(-col("quantity").cast("long"))).as("q")).head
      totRows.addAndGet(if (agg.isNullAt(0)) 0L else agg.getLong(0))
      totQty.addAndGet(if (agg.isNullAt(1)) 0L else agg.getLong(1))
      applied(batchId) = if (agg.isNullAt(0)) 0L else agg.getLong(0)
    }
    def start() = spark.readStream.table(s"$srcT.changes")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(apply _).start()

    def findCdfRoot(p: String): Option[String] =
      ext.Dfs.list(spark, p).filter(_.isDirectory).flatMap { s =>
        if (s.getPath.getName == "graft_cdf") Seq(s.getPath.toString)
        else findCdfRoot(s.getPath.toString).toSeq
      }.headOption
    def feedState(): (Int, Long) = findCdfRoot(ckpt).map { r =>
      val dirs = ext.Dfs.list(spark, r).filter(_.isDirectory)
      (dirs.length, dirs.map(d =>
        ext.Dfs.list(spark, d.getPath.toString).map(_.getLen).sum).sum)
    }.getOrElse((0, 0L))

    val batches = scala.collection.mutable.Buffer
      .empty[(String, Double, Int, Long)]
    def drain(label: String, q: org.apache.spark.sql.streaming.StreamingQuery)
        : Unit = {
      val (_, sec) = t(q.processAllAvailable())
      val (dirs, bytes) = feedState()
      batches += ((label, sec, dirs, bytes))
    }

    // ---- phase A: live relay
    val q1 = start()
    drain("snapshot_50x", q1)
    (1 to 3).foreach { i =>
      slices(i).writeTo(srcT).append()
      drain(s"append_$i", q1)
    }
    ext.Manifests.deleteWhereMor(spark, base, col("country") === "NATION_6")
    drain("mor_delete", q1)
    q1.stop()

    // ---- phase B: widen + catch-up from the same checkpoint
    spark.sql(s"ALTER TABLE $srcT ALTER COLUMN quantity TYPE BIGINT")
    slices(4).withColumn("quantity", col("quantity").cast("long") +
        4000000000L) // values only BIGINT can hold
      .writeTo(srcT).append()
    val q2 = start()
    drain("widen_catchup", q2)
    q2.stop()

    // ---- correctness: the relay saw exactly the live content
    val src = spark.table(srcT)
      .agg(count(lit(1)).as("n"),
        sum(col("quantity").cast("long")).as("q")).head
    val ok = src.getLong(0) == totRows.get() && src.getLong(1) == totQty.get()
    val (finalDirs, _) = feedState()
    val bounded = finalDirs <= 2
    if (!ok || !bounded)
      sys.error(s"RELAY MISMATCH: src=(${src.getLong(0)},${src.getLong(1)}) " +
        s"relay=(${totRows.get()},${totQty.get()}) feedDirs=$finalDirs")

    println(
      s"""{"metric":"changes_stream_${factor}x","value":${
        batches.map(_._2).sum},"unit":"sec","build_sec":$buildSec,""" +
        s""""src_rows":${src.getLong(0)},"relay_ok":$ok,""" +
        s""""feed_dirs_final":$finalDirs,"batches":{${
          batches.map { case (l, s, d, b) =>
            s""""$l":{"sec":$s,"feed_dirs":$d,"feed_bytes":$b}"""
          }.mkString(",")}}}""")
    spark.stop()
  }
}
