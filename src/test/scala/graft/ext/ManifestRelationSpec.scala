package graft.ext

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Catalyst-integrated manifest scan: `spark.read.format(
  * "graft.sources.manifest")` plans a committed version through
  * [[ManifestFileIndex]], so pushed-down filters prune FILES from the
  * manifest's zone-map stats inside the planner — no engine-specific
  * read API, no caller-supplied box. */
class ManifestRelationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def base(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rel(b: String): DataFrame =
    spark.read.format("graft.sources.manifest").load(b)

  /** Files the executed plan actually scanned (post-pruning). */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect() // force execution so the lazy listing is resolved
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec in the plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  /** A 200-row table range-clustered on k (0..9) into 5 files, with
    * zone maps on k recorded in the manifest. */
  private def clustered(): String = {
    import spark.implicits._
    val b = base("graft_rel_clu")
    Manifests.commitData(
      (1 to 200).map(i => (i.toLong, i % 10, s"s$i")).toDF("id", "k", "s")
        .repartitionByRange(5, col("k")), b)
    Manifests.analyze(spark, b, Seq("k"))
    b
  }

  test("relation read equals readAt; schema from the manifest") {
    val b = clustered()
    val viaRel = rel(b).orderBy("id").collect()
    val viaApi = Manifests.readLatest(spark, b).orderBy("id").collect()
    assert(viaRel.toSeq === viaApi.toSeq)
    assert(rel(b).schema.fieldNames.toSeq === Seq("id", "k", "s"))
  }

  test("pushed filter on the stat key prunes files inside the planner; result exact") {
    val b = clustered()
    val all = scannedFiles(rel(b))
    val pruned = rel(b).filter(col("k") === 3)
    assert(scannedFiles(pruned) < all,
      "a selective filter on the clustered stat key must scan fewer files")
    assert(pruned.count() === 20)
    // parquet pushdown still happens below the pruning
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan.take(500))
  }

  test("range, IN, and null-test filters prune; OR with undecidable branch stays conservative") {
    val b = clustered()
    val all = scannedFiles(rel(b))
    assert(scannedFiles(rel(b).filter(col("k") >= 8)) < all)
    assert(rel(b).filter(col("k") >= 8).count() === 40)
    assert(scannedFiles(rel(b).filter(col("k").isin(0, 1))) < all)
    assert(rel(b).filter(col("k").isin(0, 1)).count() === 40)
    // no nulls in k: IsNull prunes everything, result is empty but exact
    assert(rel(b).filter(col("k").isNull).count() === 0)
    // an OR whose other branch references a non-stat column cannot prune
    val cons = rel(b).filter(col("k") === 3 || col("s") === "s1")
    assert(scannedFiles(cons) === all)
    assert(cons.count() === 21)
  }

  test("filters on non-stat columns and stat-less tables scan everything, correctly") {
    import spark.implicits._
    val b = clustered()
    val q = rel(b).filter(col("s") === "s7")
    assert(scannedFiles(q) === scannedFiles(rel(b)))
    assert(q.count() === 1)
    // a table with no recorded stats: no pruning, full correctness
    val nb = base("graft_rel_nostats")
    Manifests.commitData((1 to 50).map(i => (i, i % 5)).toDF("id", "k"), nb)
    assert(rel(nb).filter(col("k") === 2).count() === 10)
  }

  test("versionAsOf and timestampAsOf resolve history; DV versions refuse") {
    import spark.implicits._
    val b = clustered()
    Manifests.deleteWhere(spark, b, col("k") === 3)
    val latest = rel(b)
    assert(latest.count() === 180)
    val v0 = spark.read.format("graft.sources.manifest")
      .option("versionAsOf", "1").load(b) // v1 = analyze republish of v0
    assert(v0.count() === 200)
    val ts = Dfs.mtime(spark, s"$b/v1/_SUCCESS")
    val asOf = spark.read.format("graft.sources.manifest")
      .option("timestampAsOf", ts.toString).load(b)
    assert(asOf.count() === 200)
    // a deletion-vector version is not expressible as a pure file scan
    Manifests.deleteWhereMor(spark, b, col("k") === 5)
    val e = intercept[IllegalArgumentException](rel(b).count())
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("bucketed tables: join and aggregation on the bucket keys plan with zero exchange") {
    import spark.implicits._
    def exchanges(df: DataFrame): Int = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }.size
    }
    val ba = base("graft_rel_bka")
    val bb = base("graft_rel_bkb")
    val facts = (1 to 1000).map(i => (i.toLong % 50, s"f$i")).toDF("k", "payload")
    val dim = (0L until 50L).map(k => (k, s"name$k")).toDF("k", "name")
    Manifests.commitDataBucketed(facts, ba, Seq("k"), 8)
    Manifests.commitDataBucketed(dim, bb, Seq("k"), 8)
    // content survives the bucketed write bit-exact
    assert(rel(ba).orderBy("payload").collect().toSeq ===
      facts.orderBy("payload").collect().toSeq)
    // co-bucketed join: no shuffle on either side
    val joined = rel(ba).join(rel(bb), "k")
    assert(exchanges(joined) === 0,
      joined.queryExecution.executedPlan.toString.take(800))
    assert(joined.count() === 1000)
    // grouping on the bucket key rides the same partitioning
    val agg = rel(ba).groupBy("k").count()
    assert(exchanges(agg) === 0)
    assert(agg.count() === 50)
    // correctness against the unbucketed plan
    val plain = facts.join(dim, "k").groupBy("name").count()
      .orderBy("name").collect().toSeq
    val viaBuckets = rel(ba).join(rel(bb), "k").groupBy("name").count()
      .orderBy("name").collect().toSeq
    assert(viaBuckets === plain)
  }

  test("sorted buckets: the merge join plans without exchanges AND without sorts") {
    import spark.implicits._
    val ba = base("graft_rel_sba")
    val bb = base("graft_rel_sbb")
    val facts = (1 to 1000).map(i => (i.toLong % 50, i)).toDF("k", "v")
    val dim = (0L until 50L).map(k => (k, s"name$k")).toDF("k", "name")
    Manifests.commitDataBucketed(facts, ba, Seq("k"), 8, sortBy = Seq("k"))
    Manifests.commitDataBucketed(dim, bb, Seq("k"), 8, sortBy = Seq("k"))
    // force a sort-merge join (a broadcast would hide the property)
    val smj = rel(ba).hint("merge").join(rel(bb).hint("merge"), "k")
    smj.collect()
    val plan = smj.queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.isEmpty, plan.toString.take(800))
    assert(plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.isEmpty, "sorted buckets must satisfy the join's ordering:\n" + plan.toString.take(800))
    assert(smj.count() === 1000)
  }

  test("a rewrite drops the bucket spec: reads stay correct, just re-shuffled") {
    import spark.implicits._
    val b = base("graft_rel_bkrw")
    Manifests.commitDataBucketed(
      (1 to 100).map(i => (i.toLong % 10, i)).toDF("k", "v"), b, Seq("k"), 4)
    assert(Manifests.bucketSpecOf(spark, b, 0).isDefined)
    Manifests.deleteWhere(spark, b, col("k") === 3)
    val v1 = Manifests.latestVersion(spark, b).get
    assert(Manifests.bucketSpecOf(spark, b, v1).isEmpty,
      "a rewrite's output files are not bucket-shaped — spec must not survive")
    assert(rel(b).count() === 90)
    // the old bucketed version still time-travels with its spec
    val agg = spark.read.format("graft.sources.manifest")
      .option("versionAsOf", "0").load(b).groupBy("k").count()
    agg.collect()
    assert(agg.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.isEmpty)
  }

  test("pruning survives an append: incremental stats cover the new files") {
    import spark.implicits._
    val b = clustered()
    // k=50 lands in a brand-new file, statted incrementally by appendBatch
    Manifests.appendBatch(
      Seq((9001L, 50, "new1"), (9002L, 50, "new2")).toDF("id", "k", "s"),
      b, batchId = 0L)
    val q = rel(b).filter(col("k") === 50)
    assert(q.count() === 2)
    assert(scannedFiles(q) < scannedFiles(rel(b)),
      "the append's own zone should confine k=50 to the new file")
    assert(rel(b).filter(col("k") === 3).count() === 20)
  }
}
