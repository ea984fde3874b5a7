package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("piiScrub: injected PII is counted and fully redacted") {
    val stats = Scrub.piiScrub(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    // every doc_id % 7 == 1 has exactly one email, % 7 == 3 exactly one phone
    stats.foreach { case (id, emails, phones) =>
      assert(emails === (if (id % 7 == 1) 1 else 0), s"doc $id emails")
      assert(phones === (if (id % 7 == 3) 1 else 0), s"doc $id phones")
    }
    assert(stats.exists(_._2 > 0) && stats.exists(_._3 > 0), "injection non-vacuous")
    // after redaction, NO pattern matches remain anywhere
    val residue = Scrub.corpusWithPii(spark, sf)
      .select(regexp_replace(regexp_replace(col("text"), Scrub.emailPattern, "<EMAIL>"),
        Scrub.phonePattern, "<PHONE>").as("scrubbed"))
      .filter(col("scrubbed").rlike(Scrub.emailPattern) ||
        col("scrubbed").rlike(Scrub.phonePattern))
    assert(residue.count() === 0)
  }

  test("boilerplateStats: planted duplicate docs are ~100% boilerplate, originals follow") {
    val rows = Scrub.boilerplateStats(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    // an exact planted copy (id + 100000) shares every chunk with its
    // original -> both sides are 100% boilerplate
    val exactCopies = rows.keys.filter(_ >= 100000L).filter(_ < 200000L)
    assert(exactCopies.nonEmpty)
    exactCopies.foreach { id =>
      assert(rows(id)._3 === 100, s"copy $id boiler_pct")
      assert(rows(id - 100000)._3 === 100, s"original of $id boiler_pct")
    }
    // near-copies (id + 200000: trailing pad) share all but the last chunk
    val nearCopies = rows.keys.filter(_ >= 200000L)
    assert(nearCopies.nonEmpty)
    nearCopies.foreach { id =>
      val (n, boiler, pct) = rows(id)
      assert(boiler >= n - 1, s"near copy $id should share all but the padded chunk")
      assert(pct >= 50, s"near copy $id boiler_pct $pct")
    }
    // every doc is counted once with sane bounds
    rows.values.foreach { case (n, b, pct) =>
      assert(n > 0 && b >= 0 && b <= n && pct >= 0 && pct <= 100)
    }
  }
}
