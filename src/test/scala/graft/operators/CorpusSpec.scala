package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("trainSplit: every doc assigned once, ratios near 80/10/10, assignment stable") {
    val s = Corpus.trainSplit(spark, sf)
    val n = graft.Tables.documents(spark, sf).count()
    assert(s.count() === n)
    val frac = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08, s"train frac ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.05 && math.abs(frac("test") - 0.1) < 0.05)
    // growth stability: the same doc keeps its split when the corpus halves
    val half = Corpus.trainSplit(spark, sf).filter(col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val full = s.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(half.forall { case (id, sp) => full(id) == sp })
  }

  test("packDocuments: packs respect the budget except single oversized docs") {
    val packs = Corpus.packDocuments(spark, sf)
      .groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("pack_tokens"), count(lit(1)).as("n_docs"))
    val over = packs.filter(col("pack_tokens") > Corpus.defaultPackBudget)
    // a pack may exceed the budget only because its LAST doc straddles the
    // boundary (contiguous fill): each overfull pack must still be start-
    // aligned, i.e. dropping its last doc fits the budget. Conservative
    // proxy: overfull packs have >= 1 doc and the overflow is < one doc.
    assert(over.filter(col("n_docs") === 0).count() === 0)
    // every doc appears exactly once
    assert(packs.agg(sum("n_docs")).head().getLong(0) ===
      graft.Tables.documents(spark, sf).count())
    // pack ids are dense non-negative within each shard
    val bad = Corpus.packDocuments(spark, sf).filter(col("pack_id") < 0)
    assert(bad.count() === 0)
  }

  test("cleanCorpus is a subset of documents: deduped and quality-gated") {
    val clean = Corpus.cleanCorpus(spark, sf)
    val total = graft.Tables.documents(spark, sf).count()
    val n = clean.count()
    assert(n > 0 && n <= total)
    // no surviving doc violates the gates
    val bad = clean.filter(col("n_chars") < 40 || col("n_tokens") < 8)
    assert(bad.count() === 0)
    // fixture corpus has unique texts, so dedup keeps everything the
    // quality gate keeps; quality_score's pass set must agree
    val passSet = TextAnalysis.qualityScore(spark, sf)
      .filter(col("quality_pass")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val cleanSet = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleanSet === passSet)
  }
}
