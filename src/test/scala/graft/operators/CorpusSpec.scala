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

  test("packDocuments: overflow is bounded by the straddling last doc") {
    val packs = Corpus.packDocuments(spark, sf)
      .groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("pack_tokens"), count(lit(1)).as("n_docs"),
        expr("max_by(n_tokens, doc_id)").as("last_doc_tokens"))
    // packs are fixed budget-sized windows of the cumulative token line:
    // a pack may exceed the budget only by its LAST (straddling) doc, so
    // pack_tokens - last_doc_tokens < budget must hold for EVERY pack
    val unbounded = packs.filter(
      col("pack_tokens") - col("last_doc_tokens") >= Corpus.defaultPackBudget)
    assert(unbounded.count() === 0)
    // and overfull packs genuinely exist in the fixture, so the bound is
    // exercised, not vacuous
    assert(packs.filter(col("pack_tokens") > Corpus.defaultPackBudget).count() > 0)
    // every doc appears exactly once
    assert(packs.agg(sum("n_docs")).head().getLong(0) ===
      graft.Tables.documents(spark, sf).count())
    // pack ids are dense non-negative within each shard
    val bad = Corpus.packDocuments(spark, sf).filter(col("pack_id") < 0)
    assert(bad.count() === 0)
  }

  test("interleaveSources: per-shard stride fairness and per-source order preservation") {
    // columns: shard, pos, source, weight, doc_id
    val rows = Corpus.interleaveSources(spark, sf).collect()
    assert(rows.length === graft.Tables.documents(spark, sf).count())
    rows.groupBy(_.getLong(0)).foreach { case (shard, shardRows) =>
      // stride property within a shard: priorities < 1 are exactly ranks
      // r <= weight, so the first sum_s min(w_s, n_s) positions contain
      // each source exactly min(w_s, n_s) times (n_s = docs of s in shard)
      val bySourceAll = shardRows.groupBy(_.getString(2))
      val expected = bySourceAll.map { case (s, rs) =>
        s -> math.min(rs.head.getInt(3), rs.length)
      }
      val prefixLen = expected.values.sum
      val prefix = shardRows.sortBy(_.getInt(1)).take(prefixLen)
      val bySource = prefix.groupBy(_.getString(2)).view.mapValues(_.length).toMap
      expected.foreach { case (s, w) =>
        assert(bySource.getOrElse(s, 0) === w,
          s"shard $shard source $s: expected $w in first $prefixLen")
      }
      // per-source document order is preserved along the shard position
      bySourceAll.foreach { case (s, rs) =>
        val ids = rs.sortBy(_.getInt(1)).map(_.getLong(4))
        assert(ids.sameElements(ids.sorted), s"shard $shard source $s order broken")
      }
      // positions are dense 1..n within the shard
      assert(shardRows.map(_.getInt(1)).sorted.sameElements(1 to shardRows.length))
    }
  }

  test("decontaminate flags every planted copy of an eval doc") {
    val flagged = Corpus.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // exact copies of eval docs (id%10==0, id<evalN -> id+100000) and
    // near copies (id%10==5, id<evalN -> id+200000) must all be flagged
    val evalIds = (0L until Corpus.evalN.toLong)
    val exact = evalIds.filter(_ % 10 == 0).map(_ + 100000L)
    val near = evalIds.filter(_ % 10 == 5).map(_ + 200000L)
    exact.foreach(id => assert(flagged.contains(id), s"exact copy $id not flagged"))
    near.foreach(id => assert(flagged.contains(id), s"near copy $id not flagged"))
    // an exact copy shares EVERY eval 8-gram of its original
    assert(exact.forall(flagged(_) > 10), "exact copies share many n-grams")
    // no eval doc flags itself (corpus side excludes doc_id < evalN)
    assert(flagged.keys.forall(_ >= Corpus.evalN))
  }

  test("decontaminateBloom: bit-identical to the exact path; the prefilter actually prunes") {
    val exact = Corpus.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    val bloom = Corpus.decontaminateBloom(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(exact.nonEmpty)
    // false positives are killed by the exact re-verify join; false
    // negatives are impossible by the bloom contract — so EQUAL
    assert(bloom === exact)
    // and the scan-stage probe must do real work: bloom hits are a
    // small fraction of the training grams (fp rate ~1% + true hits)
    graft.functions.BloomExprs.register(spark)
    val corpus = Dedup.corpusWithDups(spark, sf)
    val evalDigests = Corpus.ngramDigests(
      corpus.filter(col("doc_id") < Corpus.evalN), Corpus.contamN)
      .select(col("digest")).distinct()
    val bytes = Corpus.evalBloomBytes(spark, evalDigests)
    val train = Corpus.ngramDigests(
      corpus.filter(col("doc_id") >= Corpus.evalN), Corpus.contamN)
    val total = train.count()
    val hits = train.filter(call_function("bloom_might_contain",
      lit(bytes), xxhash64(col("digest")))).count()
    assert(hits < total / 2,
      s"bloom prefilter should prune most training grams ($hits/$total survived)")
  }

  test("stratifiedSample: per-source rates near nominal, decisions growth-stable") {
    val docs = graft.Tables.documents(spark, sf)
    val sampled = Corpus.stratifiedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // empirical rate per source within a loose binomial tolerance
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sampled.groupBy(_._2).foreach { case (src, rows) =>
      val nominal = rows.head._3 / 100.0
      val actual = rows.length.toDouble / perSource(src)
      assert(math.abs(actual - nominal) < 0.2 + nominal,
        s"source $src: actual $actual vs nominal $nominal")
    }
    // growth stability: restricting the corpus never flips a decision
    val kept = sampled.map(_._1).toSet
    val keptEven = Corpus.stratifiedSample(spark, sf)
      .filter(col("doc_id") % 2 === 0).collect().map(_.getLong(0)).toSet
    assert(keptEven.subsetOf(kept))
  }

  test("appendBatch: verbatim resubmissions rejected, revised docs admitted") {
    val admitted = Corpus.appendBatch(spark, sf).collect().map(_.getLong(0)).toSet
    val ids = graft.Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val resubmitted = ids.filter(_ % 13 == 2).map(_ + 300000L)
    val revised = ids.filter(_ % 13 == 6).map(_ + 300000L)
    resubmitted.foreach(id => assert(!admitted.contains(id), s"duplicate $id admitted"))
    revised.foreach(id => assert(admitted.contains(id), s"revision $id rejected"))
    assert(admitted === revised.toSet)
  }

  test("admitAndCommit: each committed batch rejects against corpus + all prior batches") {
    val spark0 = spark
    import spark0.implicits._
    // private index seeded from a 3-doc corpus
    val indexDir = java.nio.file.Files.createTempDirectory("graft_idx_spec").toString
    Seq("alpha body", "beta body", "gamma body").toDF("text")
      .select(md5(col("text")).as("digest"))
      .write.mode("overwrite").parquet(indexDir)

    // batch 1: one dupe of the corpus, two new docs, and an IN-BATCH dupe
    // (13 repeats 11's text — keep-first admits the smaller id only)
    val b1 = Seq((10L, "alpha body"), (11L, "delta body"),
      (12L, "epsilon body"), (13L, "delta body"))
      .toDF("doc_id", "text")
    val a1 = Corpus.admitAndCommit(spark, indexDir, b1)
      .collect().map(_.getLong(0)).toSet
    assert(a1 === Set(11L, 12L), s"batch 1 admitted $a1")

    // batch 2: resubmits a batch-1 doc (must now be rejected WITHOUT any
    // corpus rescan — the index carries batch 1's digests) + one new doc
    val b2 = Seq((20L, "delta body"), (21L, "zeta body")).toDF("doc_id", "text")
    val a2 = Corpus.admitAndCommit(spark, indexDir, b2)
      .collect().map(_.getLong(0)).toSet
    assert(a2 === Set(21L), s"batch 2 admitted $a2")

    // batch 3: everything seen so far → nothing admitted
    val b3 = Seq((30L, "alpha body"), (31L, "delta body"), (32L, "zeta body"))
      .toDF("doc_id", "text")
    assert(Corpus.admitAndCommit(spark, indexDir, b3).count() === 0)

    // the index now holds exactly corpus + admitted digests, each once
    val idx = spark.read.parquet(indexDir)
    assert(idx.count() === idx.distinct().count())
    assert(idx.count() === 6)
  }

  test("admitNearDupsAndCommit: each batch verifies against corpus + all prior batches, no recluster") {
    val spark0 = spark
    import spark0.implicits._
    // distinct 60-token bodies: long enough that a 1-2 token revision
    // keeps shingle Jaccard (and signature agreement) high
    def body(tag: String) = (0 until 60).map(j => s"$tag$j").mkString(" ")
    val indexDir = java.nio.file.Files.createTempDirectory("graft_band_idx_spec").toString
    val corpus = Seq((1L, body("a")), (2L, body("b"))).toDF("doc_id", "text")
    Dedup.minhashSignatures(corpus).write.mode("overwrite").parquet(s"$indexDir/sigs")
    // bootstrap corpus has no duplicates: empty rep index (schema only)
    corpus.select(col("doc_id"), col("doc_id").as("cluster_rep")).limit(0)
      .write.mode("overwrite").parquet(s"$indexDir/reps")

    // batch 1: a near-dup of corpus doc 1 + a genuinely new doc
    val b1 = Seq((10L, body("a") + " tail"), (11L, body("x"))).toDF("doc_id", "text")
    val r1 = Corpus.admitNearDupsAndCommit(spark, indexDir, b1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(r1(10L) === ((1L, 1)), s"batch-1 near-dup: ${r1(10L)}")
    assert(r1(11L) === ((11L, 0)), s"batch-1 new doc: ${r1(11L)}")

    // batch 2: a near-dup of BATCH-1 doc 11 (only the extended index can
    // flag it) + another revision of corpus doc 1 (now matches 1 AND 10,
    // both resolving to representative 1)
    val b2 = Seq((20L, body("x") + " tail"), (21L, body("a") + " other tail"))
      .toDF("doc_id", "text")
    val r2 = Corpus.admitNearDupsAndCommit(spark, indexDir, b2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(r2(20L)._1 === 11L, s"batch-2 near-dup of a batch-1 doc: ${r2(20L)}")
    assert(r2(20L)._2 >= 1)
    assert(r2(21L)._1 === 1L, s"batch-2 family attach: ${r2(21L)}")
    assert(r2(21L)._2 >= 2, "matches both the original and batch 1's revision")

    // the index grew by exactly the batch rows — signatures and reps
    assert(spark.read.parquet(s"$indexDir/sigs").count() === 6)
    assert(spark.read.parquet(s"$indexDir/reps").count() === 4)
  }

  test("leakageSafeSplit: no near-dup family straddles a split; doc-id hashing provably would") {
    val rows = Corpus.leakageSafeSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val splitOf = rows.map(r => r._1 -> r._3).toMap
    // every family (shared group_id) lands in exactly one split
    rows.groupBy(_._2).foreach { case (group, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"family $group straddles splits: ${members.map(m => (m._1, m._3)).take(4)}")
    }
    // the planted exact copies (id -> id+100000) share a family and a split
    val families = Dedup.dupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val copyPairs = families.keys.filter(id => families.contains(id + 100000L))
      .map(id => (id, id + 100000L)).toSeq
    assert(copyPairs.nonEmpty)
    copyPairs.foreach { case (a, b) =>
      assert(splitOf(a) === splitOf(b), s"copies ($a,$b) split apart") }
    // non-vacuous: per-DOC-id hashing (the trainSplit rule applied to
    // each member independently) diverges on at least one planted pair —
    // exactly the leakage this operator exists to prevent
    def docIdSplit(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val bk = java.lang.Long.parseLong(hex, 16) % 100
      if (bk < 80) "train" else if (bk < 90) "val" else "test"
    }
    assert(copyPairs.exists { case (a, b) => docIdSplit(a) != docIdSplit(b) },
      "fixture never splits a family under doc-id hashing (vacuous test)")
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

  test("temperatureMix: sqrt upsampling per source, largest source untouched, deterministic") {
    val mix = Corpus.temperatureMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(mix.nonEmpty)
    val perDoc = mix.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // epochs are dense 1..n per doc
    perDoc.foreach { case (id, es) => assert(es === (1 to es.length), s"doc $id epochs") }
    val srcOf = mix.groupBy(_._1).view.mapValues(_.head._2).toMap
    val counts = srcOf.groupBy(_._2).view.mapValues(_.size).toMap
    val nMax = counts.values.max
    counts.foreach { case (src, n) =>
      val e = math.sqrt(nMax.toDouble / n)
      val copies = mix.count(_._2 == src)
      // every doc appears at least floor(e) and at most ceil(e) times
      val byDoc = mix.filter(_._2 == src).groupBy(_._1).view.mapValues(_.size)
      byDoc.foreach { case (id, c) =>
        assert(c >= e.floor.toInt && c <= e.ceil.toInt, s"doc $id of $src has $c copies")
      }
      // realized copy total tracks e * n within binomial noise
      val expect = e * n
      assert(math.abs(copies - expect) <= math.max(5.0, 4 * math.sqrt(n.toDouble)),
        s"source $src copies $copies vs expected $expect")
      if (n == nMax)
        assert(copies === n, s"largest source $src must stay at exactly 1 epoch")
    }
    val again = Corpus.temperatureMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(again.toSeq === mix.toSeq)
  }

  test("epochOrder: each epoch is a full 1..N permutation, epochs decorrelate, order deterministic") {
    val rows = Corpus.epochOrder(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val ids = graft.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet === (1 to Corpus.defaultEpochs).toSet)
    byEpoch.foreach { case (e, rs) =>
      assert(rs.map(_._2).toSet === ids, s"epoch $e must cover the corpus once")
      assert(rs.map(_._3).sorted.toSeq === (1L to ids.size).toSeq,
        s"epoch $e positions must be a 1..N permutation")
    }
    // different epochs are independent hash draws: their orders differ
    def order(e: Int) = byEpoch(e).sortBy(_._3).map(_._2).toSeq
    assert(order(1) !== order(2))
    assert(order(2) !== order(3))
    // reproducible from the tag alone — no stored permutation table
    val again = Corpus.epochOrder(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq)
  }
}
