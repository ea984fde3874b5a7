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

  test("quoted fields with embedded commas, quotes, and newlines survive the CSV reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_quotecsv")
    java.nio.file.Files.writeString(dir.resolve("q.csv"),
      "invoice_no,stock_code,description,quantity,invoice_date,unit_price,customer_id,country\n" +
        "1,A,\"red, large, boxed\",2,2024-01-01 10:00:00,3.50,7,France\n" +
        "2,B,\"says \"\"fragile\"\"\",1,2024-01-02 11:00:00,4.25,8,Spain\n" +
        "3,C,\"line one\nline two\",5,2024-01-03 12:00:00,1.10,9,Italy\n")
    // multiLine: quoted newlines span physical lines (trade-off: such files
    // are not arbitrarily splittable — keep them out of the 100 TB path).
    // escape=": RFC-4180 doubled quotes (Spark's default escape is \).
    val df = spark.read.option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .schema(Ingest.csvSchema).csv(dir.toString + "/q.csv")
      .orderBy("invoice_no").collect()
    assert(df.length === 3)
    assert(df(0).getAs[String]("description") === "red, large, boxed")
    assert(df(1).getAs[String]("description") === "says \"fragile\"")
    assert(df(2).getAs[String]("description") === "line one\nline two")
    assert(df(2).getAs[Int]("quantity") === 5)
  }

  test("malformed numeric/timestamp rows coerce to null and flow to the F1 drop (PERMISSIVE)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_malcsv")
    java.nio.file.Files.writeString(dir.resolve("m.csv"),
      """invoice_no,stock_code,description,quantity,invoice_date,unit_price,customer_id,country
        |1,A,ok,2,2024-01-01 10:00:00,3.50,7,France
        |2,B,bad qty,many,2024-01-02 10:00:00,4.25,8,Spain
        |3,C,bad price,1,2024-01-03 10:00:00,cheap,9,Italy
        |4,D,bad date,1,31/12/2024,2.00,10,Malta
        |""".stripMargin)
    val back = Ingest.readCsv(spark, dir.toString + "/m.csv")
    assert(back.count() === 4, "PERMISSIVE mode keeps every row")
    val byInv = back.collect().map(r => r.getAs[String]("invoice_no") -> r).toMap
    assert(byInv("2").getAs[Integer]("quantity") == null)
    assert(byInv("3").getAs[java.math.BigDecimal]("unit_price") == null)
    assert(byInv("4").getAs[java.sql.Timestamp]("invoice_date") == null)
    // and the F1 null-drop removes exactly the coerced rows
    assert(Clean.dropNulls(back).count() === 1)
  }

  test("an empty CSV (header only) and a zero-byte file yield zero rows, not a failure") {
    val dir = java.nio.file.Files.createTempDirectory("graft_emptycsv")
    java.nio.file.Files.writeString(dir.resolve("header_only.csv"),
      "invoice_no,stock_code,description,quantity,invoice_date,unit_price,customer_id,country\n")
    java.nio.file.Files.writeString(dir.resolve("zero_byte.csv"), "")
    assert(Ingest.readCsv(spark, dir.toString).count() === 0)
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

  test("corrupt file among good parquet: strict mode fails loudly, ignoreCorruptFiles skips it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt")
    val good = Warehouse(spark, TestSpark.sf).staging.limit(100)
    good.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    // a truncated/garbage file wearing the .parquet extension — the
    // 100 TB reality of a partially-written or bit-rotted object
    java.nio.file.Files.write(dir.resolve("part-corrupt.parquet"),
      "not a parquet file at all".getBytes("UTF-8"))
    val strict = intercept[Exception] {
      spark.read.parquet(dir.toString).count()
    }
    assert(strict != null, "strict mode must fail on a corrupt file")
    try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      assert(spark.read.parquet(dir.toString).count() === 100,
        "tolerant mode must read every good row and skip the corrupt file")
    } finally spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
  }

  test("schema evolution: mergeSchema unifies batches, missing columns surface as NULL") {
    val out = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    val merged = Ingest.evolvedRoundtrip(spark, TestSpark.sf, out)
    val cols = merged.columns.toSet
    assert(cols.contains("country") && cols.contains("channel"),
      s"unified schema missing evolved columns: $cols")
    val staging = Warehouse(spark, TestSpark.sf).staging
    assert(merged.count() === staging.count(), "evolution must not lose rows")
    import org.apache.spark.sql.functions._
    val even = merged.filter(col("stock_code").cast("int") % 2 === 0)
    val odd = merged.filter(col("stock_code").cast("int") % 2 === 1)
    assert(even.count() > 0 && odd.count() > 0)
    // batch 1 predates country and never saw channel
    assert(even.filter(col("country").isNotNull || col("channel").isNotNull).count() === 0)
    // batch 2 carries both; channel follows the deterministic formula
    assert(odd.filter(col("channel").isNull).count() === 0)
    assert(odd.filter(col("channel") =!=
      concat(lit("web-"), (col("stock_code").cast("int") % 3).cast("string"))).count() === 0)
  }
}
