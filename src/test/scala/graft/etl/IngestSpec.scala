package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CSV roundtrip preserves every staging row, null-for-null (S1-S3)") {
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/stage"
    Ingest.dumpCsv(spark, TestSpark.sf, out)
    val back = Ingest.readCsv(spark, out)
    val staging = Warehouse(spark, TestSpark.sf).staging
    assert(back.count() === staging.count())
    for (c <- Staging.columns) {
      val a = back.filter(col(c).isNull).count()
      val b = staging.filter(col(c).isNull).count()
      assert(a === b, s"null count mismatch on $c: csv=$a parquet=$b")
    }
    assert(back.columns.contains("loaded_at"), "E9 audit column present")
  }

  test("unparseable timestamps coerce to null instead of failing (S2, errors='coerce')") {
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv")
    val csv = dir.resolve("bad.csv")
    java.nio.file.Files.writeString(csv,
      """invoice_no,stock_code,description,quantity,invoice_date,unit_price,customer_id,country
        |1,A,thing,2,2024-01-01 10:00:00,3.50,7,France
        |2,B,thing,1,NOT A DATE,4.25,nan,Spain
        |""".stripMargin)
    val df = Ingest.readCsv(spark, csv.toString)
    val rows = df.orderBy("invoice_no").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[java.sql.Timestamp]("invoice_date") != null)
    assert(rows(1).getAs[java.sql.Timestamp]("invoice_date") == null)
    assert(rows(1).getAs[String]("customer_id") == null, "'nan' normalizes to null (S3)")
    assert(rows(0).getAs[String]("customer_id") === "7")
  }
}
