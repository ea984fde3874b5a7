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

  test("stripBoilerplate: planted copies strip to nothing, unique docs keep everything") {
    val stripped = Scrub.stripBoilerplate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(stripped.nonEmpty)
    val byId = stripped.map(r => r._1 -> r).toMap
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("".getBytes("UTF-8")).map("%02x".format(_)).mkString
    stripped.foreach { case (id, total, kept, md5) =>
      assert(kept <= total, s"doc $id kept > total")
      if (kept == 0) assert(md5 === emptyMd5, s"doc $id empty-strip md5")
    }
    // an exact copy shares EVERY chunk with its original -> both strip to 0
    val copied = stripped.filter(r => byId.contains(r._1 + 100000L))
    assert(copied.nonEmpty)
    copied.foreach { case (id, _, kept, _) =>
      assert(kept === 0, s"duplicated doc $id kept $kept chunks")
      assert(byId(id + 100000L)._3 === 0, s"copy of $id kept chunks")
    }
    // docs with no planted copy mostly survive: whole-document uniqueness
    // doesn't make every CHUNK unique (the fixture's 31-token vocabulary
    // produces incidental cross-doc chunk collisions), but the bulk of
    // their text must remain, and some docs must survive fully intact
    val untouched = stripped.filter(r =>
      r._1 < 100000L && r._1 % 10 != 0 && r._1 % 10 != 5)
    assert(untouched.nonEmpty)
    val keptFrac = untouched.map(_._3.toLong).sum.toDouble / untouched.map(_._2.toLong).sum
    assert(keptFrac >= 0.5, s"non-copied docs kept only $keptFrac of their chunks")
    assert(untouched.exists(r => r._3 === r._2), "no doc survived fully intact")
  }

  test("chunkDedupKeepFirst: every distinct chunk survives exactly once, first occurrence wins") {
    val rows = Scrub.chunkDedupKeepFirst(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rows.nonEmpty)
    val byId = rows.map(r => r._1 -> r).toMap
    // global invariant: total kept chunks == number of DISTINCT chunk digests
    val distinctChunks = {
      import org.apache.spark.sql.functions._
      val docs = Dedup.corpusWithDups(spark, sf)
      docs.select(explode(expr(
        s"""transform(
           |  sequence(0, greatest(cast(ceil(size(split(text, ' ')) / ${Scrub.chunkTokens}.0) as int) - 1, 0)),
           |  i -> concat_ws(' ', slice(split(text, ' '), i * ${Scrub.chunkTokens} + 1, ${Scrub.chunkTokens})))""".stripMargin))
        .as("chunk")).distinct().count()
    }
    assert(rows.map(_._3.toLong).sum === distinctChunks)
    // an exact planted copy (id + 100000) repeats every chunk of its
    // original, and the original has the smaller doc_id -> the copy keeps 0
    // and the original keeps its whole text (it precedes all repeats of
    // its own chunks: originals < 100000 come first in (doc_id, pos) order
    // unless an earlier small-id doc shares the chunk)
    val copies = rows.filter(r => r._1 >= 100000L && r._1 < 200000L)
    assert(copies.nonEmpty)
    copies.foreach { case (id, _, kept, _) => assert(kept === 0, s"copy $id kept $kept") }
    // keep-first is strictly more preserving than strip: stripBoilerplate
    // drops ALL occurrences of repeated chunks, keep-first retains one
    val strip = Scrub.stripBoilerplate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    rows.foreach { case (id, _, kept, _) =>
      assert(kept >= strip(id), s"doc $id keep-first kept less than strip")
    }
    assert(rows.map(_._3.toLong).sum > strip.values.map(_.toLong).sum,
      "keep-first must preserve strictly more than stripping on a corpus with repeats")
  }
}
