package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("tokenizeIds: counts within bounds, low unknown rate, deterministic") {
    val rows = TextAnalysis.tokenizeIds(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, unk, fp) =>
      assert(n > 0 && unk >= 0 && unk <= n, s"doc $id bounds")
      assert(fp >= 0 && fp < 1000000007L, s"doc $id fingerprint range")
    }
    // the fixture vocabulary is small, so the top-64 vocab covers most
    // tokens: corpus-wide unknown rate must be low
    val totalTokens = rows.map(_._2.toLong).sum
    val totalUnk = rows.map(_._3.toLong).sum
    assert(totalUnk * 10 < totalTokens, s"unk rate ${totalUnk.toDouble / totalTokens}")
    // deterministic across invocations (vocab build + encode)
    val again = TextAnalysis.tokenizeIds(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(rows.sameElements(again))
  }
}
