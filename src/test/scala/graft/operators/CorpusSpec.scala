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

  test("interleaveSources: exact stride fairness and per-source order preservation") {
    val rows = Corpus.interleaveSources(spark, sf).collect()
    assert(rows.length === graft.Tables.documents(spark, sf).count())
    // stride property: priorities < 1 are exactly ranks r <= weight, so the
    // first sum(weights) positions contain each source exactly weight times
    val weights = rows.map(r => r.getString(1) -> r.getInt(2)).toMap
    val totalW = weights.values.sum
    val prefix = rows.sortBy(_.getInt(0)).take(totalW)
    val bySource = prefix.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    weights.foreach { case (s, w) =>
      assert(bySource.getOrElse(s, 0) === w, s"source $s: expected $w in first $totalW")
    }
    // per-source document order is preserved along the global position
    rows.groupBy(_.getString(1)).foreach { case (s, rs) =>
      val ids = rs.sortBy(_.getInt(0)).map(_.getLong(3))
      assert(ids.sameElements(ids.sorted), s"source $s order broken")
    }
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
