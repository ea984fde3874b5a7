package graft.ext

import graft.TestSpark
import graft.functions.ZOrder2
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("interleave: magic-number spread equals the bit-sum definition, bijective on the grid") {
    def reference(x: Int, y: Int): Long =
      (0 until 16).map(k =>
        (((x >> k) & 1).toLong << (2 * k)) | (((y >> k) & 1).toLong << (2 * k + 1))).sum
    val samples = for (x <- 0 to 300 by 7; y <- 0 to 300 by 11) yield (x, y)
    samples.foreach { case (x, y) =>
      assert(ZOrder2.interleave(x, y) === reference(x, y), s"($x, $y)")
    }
    // corner cases: masking keeps only the low 16 bits
    assert(ZOrder2.interleave(0xFFFF, 0xFFFF) === 0xFFFFFFFFL)
    assert(ZOrder2.interleave(0x10000, 0) === 0L)
    // bijective over a 256x256 grid
    val grid = for (x <- 0 until 256; y <- 0 until 256) yield ZOrder2.interleave(x, y)
    assert(grid.distinct.size === 256 * 256)
  }

  test("codegen'd z_order2 agrees with the Scala implementation on real keys") {
    // (l_orderkey, l_linenumber) is NOT unique in the fixture — compare
    // the full (key..., zkey) multisets instead of a keyed lookup
    val got = Layout.zorderKeys(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val expect = graft.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        ZOrder2.interleave((r.getLong(2) % 65536).toInt, (r.getLong(3) % 65536).toInt)))
      .sorted.toSeq
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("compact: file count drops to target, content row-exact") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    graft.Tables.lineitem(spark, sf).repartition(32)
      .write.mode("overwrite").parquet(s"$base/frag")
    val (before, after) = Layout.compact(spark, s"$base/frag", s"$base/out", 4)
    assert(before === 32L && after === 4L)
    val a = spark.read.parquet(s"$base/frag").collect().map(_.toSeq.toString).sorted
    val b = spark.read.parquet(s"$base/out").collect().map(_.toSeq.toString).sorted
    assert(a.toSeq === b.toSeq, "compaction must preserve content row-exactly")
  }

  test("z-order clustering: a 2-D box predicate touches few files; scattered layout touches all") {
    val base = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val nFiles = 8
    Layout.writeClustered(spark, sf, s"$base/clustered", nFiles)
    Layout.writeScattered(spark, sf, s"$base/scattered", nFiles)
    // box: the low 1/4 of each key dimension (~1/16 of rows)
    val li = graft.Tables.lineitem(spark, sf)
    val partMax = li.agg(max(col("l_partkey") % 65536)).head().getLong(0) / 4
    val suppMax = li.agg(max(col("l_suppkey") % 65536)).head().getLong(0) / 4
    val clustered = Layout.filesTouched(spark, s"$base/clustered", partMax, suppMax)
    val scattered = Layout.filesTouched(spark, s"$base/scattered", partMax, suppMax)
    assert(scattered === nFiles.toLong,
      s"hash-scattered rows should appear in every file, touched $scattered")
    assert(clustered <= nFiles / 2,
      s"z-clustered box rows should concentrate in few files, touched $clustered")
    assert(clustered < scattered)
    // sanity: both layouts hold the same matching rows
    def matches(p: String) = spark.read.parquet(p)
      .filter(col("l_partkey") % 65536 < partMax && col("l_suppkey") % 65536 < suppMax).count()
    assert(matches(s"$base/clustered") === matches(s"$base/scattered"))
  }
}
