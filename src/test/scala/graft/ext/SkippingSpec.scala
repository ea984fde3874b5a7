package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("pruned read equals full scan exactly under the box predicate") {
    import spark.implicits._
    val base = tmp("graft_skip_eq")
    graft.Tables.lineitem(spark, sf)
      .withColumn("pkm", pmod(col("l_partkey"), lit(65536L)))
      .repartitionByRange(8, col("pkm"))
      .write.mode("overwrite").parquet(base)
    val df = spark.read.parquet(base)
    val stats = Skipping.buildStats(df, Seq("pk" -> col("pkm")))
    val files = Skipping.candidateFiles(stats, Seq(("pk", 100L, 5000L)))
    val exact = col("pkm") >= 100L && col("pkm") <= 5000L
    val pruned = Skipping.prunedRead(spark, base, files, exact)
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().sorted
    val full = df.filter(exact)
      .select("l_orderkey", "l_linenumber").as[(Long, Int)].collect().sorted
    assert(full.nonEmpty)
    assert(pruned.toSeq === full.toSeq)
  }

  test("range-clustered layout prunes files; hash-scattered layout cannot (the contrast)") {
    val clustered = tmp("graft_skip_clu")
    val scattered = tmp("graft_skip_sca")
    val li = graft.Tables.lineitem(spark, sf)
      .withColumn("pkm", pmod(col("l_partkey"), lit(65536L)))
    li.repartitionByRange(8, col("pkm")).write.mode("overwrite").parquet(clustered)
    li.repartition(8, col("l_orderkey")).write.mode("overwrite").parquet(scattered)
    // the bottom eighth of the observed domain: selective at any SF
    val hi = li.agg(max(col("pkm"))).head.getLong(0) / 8
    def candidates(path: String): (Int, Int) = {
      val df = spark.read.parquet(path)
      val stats = Skipping.buildStats(df, Seq("pk" -> col("pkm")))
      (Skipping.candidateFiles(stats, Seq(("pk", 0L, hi))).size,
        Dfs.dataFiles(spark, path).size)
    }
    val (cluCand, cluTotal) = candidates(clustered)
    val (scaCand, scaTotal) = candidates(scattered)
    // a narrow range over the clustering key touches few range files;
    // every hash-scattered file spans the whole domain
    assert(cluCand < cluTotal,
      s"clustered layout must prune ($cluCand/$cluTotal)")
    assert(scaCand === scaTotal,
      s"scattered layout has nothing to prune ($scaCand/$scaTotal)")
  }

  test("all-null zones are pruned for range predicates; mixed-null files keep their rows") {
    import spark.implicits._
    val base = tmp("graft_skip_null")
    // file A: all-null key; file B: mixed nulls; file C: in-range values
    Seq[(java.lang.Long, String)]((null, "a1"), (null, "a2")).toDF("k", "tag")
      .coalesce(1).write.parquet(s"$base/p=0")
    Seq[(java.lang.Long, String)]((5L, "b1"), (null, "b2")).toDF("k", "tag")
      .coalesce(1).write.parquet(s"$base/p=1")
    Seq[(java.lang.Long, String)]((100L, "c1")).toDF("k", "tag")
      .coalesce(1).write.parquet(s"$base/p=2")
    val df = spark.read.parquet(s"$base/p=0", s"$base/p=1", s"$base/p=2")
    val stats = Skipping.buildStats(df, Seq("k" -> col("k")))
    val files = Skipping.candidateFiles(stats, Seq(("k", 0L, 10L)))
    assert(files.size === 1, s"only the mixed file zone overlaps [0,10]: $files")
    val out = Skipping.prunedRead(spark, s"$base/p=1", files,
      col("k") >= 0L && col("k") <= 10L)
      .select("tag").as[String].collect().toSeq
    assert(out === Seq("b1"))
  }

  test("empty candidate set yields an empty frame with the data schema") {
    val base = tmp("graft_skip_none")
    import spark.implicits._
    Seq((1L, "x")).toDF("k", "tag").write.parquet(s"$base/d")
    val df = spark.read.parquet(s"$base/d")
    val stats = Skipping.buildStats(df, Seq("k" -> col("k")))
    val files = Skipping.candidateFiles(stats, Seq(("k", 100L, 200L)))
    assert(files.isEmpty)
    val out = Skipping.prunedRead(spark, s"$base/d", files, col("k") >= 100L)
    assert(out.columns.toSeq === Seq("k", "tag") && out.count() === 0L)
  }

  test("refreshStats: appended files indexed, vanished files dropped, full rebuild equivalence") {
    import spark.implicits._
    val dataDir = tmp("graft_skip_inc") + "/t"
    val statsBase = tmp("graft_skip_incs") + "/zones"
    val keys = Seq("k" -> col("k"))
    (1 to 100).map(i => (i.toLong, i % 10)).toDF("id", "k")
      .repartitionByRange(4, col("k")).write.mode("overwrite").parquet(dataDir)
    Snapshots.commit(Skipping.buildStats(spark.read.parquet(dataDir), keys), statsBase)
    // append a batch with a NEW key range (k in 20..29)
    (1 to 50).map(i => (1000L + i, 20 + i % 10)).toDF("id", "k")
      .repartitionByRange(2, col("k")).write.mode("append").parquet(dataDir)
    val v1 = Skipping.refreshStats(spark, dataDir, statsBase, keys)
    assert(v1 === 1)
    val stats1 = Snapshots.readAt(spark, statsBase, 1)
    // equivalent to a from-scratch rebuild (same rows, any order)
    val scratch = Skipping.buildStats(spark.read.parquet(dataDir), keys)
    assert(stats1.collect().map(_.toSeq.toString).sorted.toSeq ===
      scratch.collect().map(_.toSeq.toString).sorted.toSeq)
    // and pruning over the refreshed stats answers the new range
    val files = Skipping.candidateFiles(stats1, Seq(("k", 25L, 29L)))
    assert(files.nonEmpty && files.size < Dfs.dataFiles(spark, dataDir).size)
    val got = Skipping.prunedRead(spark, dataDir, files, col("k").between(25L, 29L))
      .count()
    val want = spark.read.parquet(dataDir).filter(col("k").between(25L, 29L)).count()
    assert(got === want && want === 25L)
    // compaction: vanished originals drop out of the index
    val all = spark.read.parquet(dataDir)
    val compacted = tmp("graft_skip_cmp") + "/t"
    all.repartition(2).write.mode("overwrite").parquet(compacted)
    Snapshots.commit(Skipping.buildStats(spark.read.parquet(dataDir), keys),
      s"${statsBase}2")
    val v = Skipping.refreshStats(spark, compacted, s"${statsBase}2", keys)
    val after = Snapshots.readAt(spark, s"${statsBase}2", v)
    assert(after.count() === 2, "only the compacted files may remain indexed")
  }

  test("registered skipping_scan: stats versioned via Snapshots, result matches direct scan") {
    import spark.implicits._
    val got = Skipping.skippingScan(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    val (pkHi, skHi) = Skipping.boxBounds(spark, sf)
    val expect = graft.Tables.lineitem(spark, sf)
      .filter(pmod(col("l_partkey"), lit(65536L)) <= pkHi &&
        pmod(col("l_suppkey"), lit(65536L)) <= skHi)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy("l_returnflag")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("string zone bounds truncate with widening semantics: bounded width, pruning stays exact, metadata MIN/MAX refuses") {
    import spark.implicits._
    // truncator invariants: lower <= value <= upper, bounded width
    assert(Skipping.truncLower("short") === "short")
    val long = "prefix_prefix_prefix_AAAA"
    assert(Skipping.truncLower(long) === "prefix_prefix_pr")
    for (s <- Seq(long, "a" * 30, "zz_" + "y" * 40, "omega_" + "pi_" * 20)) {
      assert(Skipping.truncLower(s) <= s && s <= Skipping.truncUpper(s))
      assert(Skipping.truncLower(s).length <= Skipping.stringBoundLen)
      assert(Skipping.truncUpper(s).length <= Skipping.stringBoundLen)
    }
    // a prefix of all-unincrementable chars keeps the exact full value
    val weird = "\uffff" * 20
    assert(Skipping.truncUpper(weird) === weird)

    // end to end: long-string key, two clustered files
    val dir = tmp("graft_skip_trunc")
    val rows = (0 until 100).map { i =>
      val bucket = if (i < 50) "alpha_alpha_alpha_alpha" else "zeta_zeta_zeta_zeta"
      (s"${bucket}_$i", i)
    }
    rows.toDF("s", "v").repartitionByRange(2, col("s"))
      .write.mode("overwrite").parquet(dir)
    val st = Skipping.buildStats(spark.read.parquet(dir),
      Seq("s" -> col("s"), "v" -> col("v")))
    val collected = st.collect()
    val mi = st.schema.fieldIndex("s_min")
    val ma = st.schema.fieldIndex("s_max")
    val tr = st.schema.fieldIndex("s_trunc")
    collected.foreach { r =>
      // the sidecar row stays bounded no matter how long the values are
      assert(r.getString(mi).length <= Skipping.stringBoundLen)
      assert(r.getString(ma).length <= Skipping.stringBoundLen)
      assert(r.getBoolean(tr), "bounds longer than the limit must flag")
    }
    // pruning with widened bounds: a probe in the zeta range keeps only
    // the zeta file, and the pruned read loses no rows
    val probe = "zeta_zeta_zeta_zeta_60"
    val cand = Skipping.candidateFiles(st, Seq(("s", probe, probe)))
    assert(cand.size === 1, s"expected one candidate file, got $cand")
    val got = Skipping.prunedRead(spark, dir, cand, col("s") === probe)
      .collect()
    assert(got.length === 1 && got.head.getInt(1) === 60)

    // the metadata MIN/MAX fold REFUSES widened string bounds (they are
    // bounds, not values) while the integer key keeps folding
    val b = tmp("graft_skip_trunc_man") + "/t"
    Manifests.commitData(
      rows.toDF("s", "v").repartitionByRange(2, col("s")), b)
    Manifests.analyze(spark, b, Seq("s", "v"))
    val rel = spark.read.format("manifest").load(b)
    val mnS = rel.agg(min(col("s")))
    assert(mnS.head.getString(0) === rows.map(_._1).min)
    assert(mnS.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isEmpty, "truncated string bounds must not answer MIN from metadata")
    val mnV = rel.agg(min(col("v")), max(col("v")))
    assert(mnV.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.nonEmpty, "the untruncated integer key still folds from metadata")
    assert(mnV.head.getInt(0) === 0 && mnV.head.getInt(1) === 99)
  }
}
