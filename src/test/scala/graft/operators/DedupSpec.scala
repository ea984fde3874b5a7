package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-pair recovery for the fuzzy dedup paths ([[Dedup.corpusWithDups]]
  * plants exact copies at id+100000 for id%10==0 and padded near-copies at
  * id+200000 for id%10==5). */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val plantedExact: Set[(Long, Long)] =
    graft.Tables.documents(spark, sf).filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(r => (r.getLong(0), r.getLong(0) + 100000L)).toSet
  private lazy val plantedNear: Set[(Long, Long)] =
    graft.Tables.documents(spark, sf).filter(col("doc_id") % 10 === 5)
      .select("doc_id").collect().map(r => (r.getLong(0), r.getLong(0) + 200000L)).toSet

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exactDedup collapses every planted exact copy to the smaller id") {
    val kept = Dedup.exactDedup(spark, sf)
    val twoCopies = kept.filter(col("n_copies") === 2).select("keep_id")
      .collect().map(_.getLong(0)).toSet
    assert(plantedExact.map(_._1).subsetOf(twoCopies))
    // no planted copy id survives as its own group
    val keepIds = kept.select("keep_id").collect().map(_.getLong(0)).toSet
    assert(plantedExact.map(_._2).intersect(keepIds).isEmpty)
  }

  test("minhashPairs recovers the planted pairs (exact copies always; near-dups w.h.p.)") {
    val found = pairs(Dedup.minhashPairs(spark, sf))
    assert(plantedExact.subsetOf(found), "exact copies have identical signatures")
    val nearRecall = plantedNear.count(found.contains).toDouble / plantedNear.size
    assert(nearRecall >= 0.9, s"near-dup recall $nearRecall < 0.9")
  }

  test("simhashPairs recovers the planted pairs") {
    val found = pairs(Dedup.simhashPairs(spark, sf))
    assert(plantedExact.subsetOf(found), "exact copies have hamming distance 0")
    // the trailing pad shifts several token votes on short docs, so a few
    // near-copies exceed hamming 12 — substantial-but-partial recall is the
    // operator's honest contract at this threshold
    val nearRecall = plantedNear.count(found.contains).toDouble / plantedNear.size
    assert(nearRecall >= 0.7, s"near-dup recall $nearRecall < 0.7")
  }

  test("ngramJaccard verifies planted pairs with high exact overlap") {
    val verified = Dedup.ngramJaccard(spark, sf)
    val found = pairs(verified)
    assert(plantedExact.subsetOf(found))
    // exact copies (doc_b == doc_a + 100000) have identical shingle sets
    val exactRows = verified
      .filter(col("doc_b") === col("doc_a") + 100000L)
      .filter(col("n_inter") =!= col("n_union"))
    assert(exactRows.count() === 0)
  }
}
