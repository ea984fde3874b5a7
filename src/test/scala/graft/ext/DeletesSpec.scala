package graft.ext

import graft.{TestSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DeletesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def md5Of(path: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      .map("%02x".format(_)).mkString
  }

  test("deleteWhere: survivors exact, untouched files byte-identical, matches gone") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del").toString + "/t"
    // cluster by the delete key so matches concentrate in few files —
    // the layout that makes surgical deletes cheap
    Tables.lineitem(spark, sf)
      .repartitionByRange(8, col("l_partkey"))
      .write.mode("overwrite").parquet(dir)
    val pred = col("l_partkey") < 20
    val before = spark.read.parquet(dir)
    val expectSurvivors = before.filter(!pred).count()
    val expectDead = before.filter(pred).count()
    assert(expectDead > 0, "predicate must match something")
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    val hashesBefore = files.map(f => f.getName -> md5Of(f.toString)).toMap
    val affectedBefore = Deletes.affectedFiles(spark, dir, pred).size

    val (affected, total) = Deletes.deleteWhere(spark, dir, pred)
    assert(affected === affectedBefore && total === files.length)
    // range-clustered: the matching keys live in a strict subset of files
    assert(affected < total, s"delete rewrote every file ($affected/$total)")

    val after = spark.read.parquet(dir)
    assert(after.filter(pred).count() === 0, "matching rows must be gone")
    assert(after.count() === expectSurvivors, "non-matching rows must all survive")
    // every file the delete did not need to touch is BYTE-identical
    val untouched = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .filter(f => md5Of(f.toString) == hashesBefore(f.getName))
    assert(untouched.length === total - affected,
      s"expected ${total - affected} untouched files, found ${untouched.length}")
  }

  test("null delete keys survive regardless of which file holds them") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_del_null").toString
    // two plain part files in ONE directory: nulls co-located with a
    // match (file a) AND in a file the delete never touches (file b)
    def writeAsFile(rows: Seq[(Int, String)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_del_null_w").toString
      rows.toDF("id", "k").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dir, name))
    }
    writeAsFile(Seq((1, "X"), (2, null), (3, "keep")), "a.parquet")
    writeAsFile(Seq((4, null), (5, "keep")), "b.parquet")
    val (affected, total) = Deletes.deleteWhere(spark, dir, col("k") === "X")
    assert(affected === 1 && total === 2)
    val ids = spark.read.parquet(dir).select("id").collect().map(_.getInt(0)).sorted
    assert(ids.toSeq === Seq(2, 3, 4, 5),
      "null-key rows must survive in rewritten AND untouched files alike")
  }

  test("deleteWhere on a scattered layout still correct, but touches every file (the contrast)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_del_scatter").toString + "/t"
    Tables.lineitem(spark, sf)
      .repartition(8, col("l_orderkey"))
      .write.mode("overwrite").parquet(dir)
    val pred = col("l_partkey") < 20
    val survivors = spark.read.parquet(dir).filter(!pred).count()
    val (affected, total) = Deletes.deleteWhere(spark, dir, pred)
    assert(affected === total, "hash-scattered keys land in every file")
    val after = spark.read.parquet(dir)
    assert(after.filter(pred).count() === 0 && after.count() === survivors)
  }
}
