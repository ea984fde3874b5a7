package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltSpec extends AnyFunSuite {

  test("salted join equals the unsalted join on a skewed key distribution") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 90% of rows share one hot key — the shape salting exists for
    val big = (1 to 2000).map(i => (if (i % 10 == 0) s"k$i" else "HOT", i.toLong))
      .toDF("k", "payload")
    val small = (Seq("HOT") ++ (10 to 2000 by 10).map(i => s"k$i"))
      .zipWithIndex.map { case (k, v) => (k, s"v$v") }.toDF("k", "dim")
    val plain = big.join(small, Seq("k"))
      .select("k", "payload", "dim").collect().map(_.toSeq).toSet
    val salted = Salt.saltedJoin(big, small, "k", col("payload"), k = 8)
      .select("k", "payload", "dim").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 2000)
  }

  test("salts are deterministic (stable under recomputation/retries)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 500).map(_.toLong).toDF("id")
    val a = Salt.withSalt(df, col("id"), 8).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = Salt.withSalt(df, col("id"), 8).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a === b)
    assert(a.map(_._2).forall(s => s >= 0 && s < 8))
  }
}
