package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("mediaMeta parses the header fields back to their defining formulas") {
    val bad = Multimodal.mediaMeta(spark, sf).filter(
      col("magic") =!= Multimodal.magic ||
        col("width") =!= (lit(16) + col("doc_id") % 64) ||
        col("height") =!= (lit(16) + (col("doc_id") * 7) % 64) ||
        col("channels") =!= (lit(1) + col("doc_id") % 3) ||
        col("payload_bytes") <= 0)
    assert(bad.count() === 0)
  }

  test("payload length equals the source text length (binary fidelity)") {
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), length(col("text")).as("n"))
    val meta = Multimodal.mediaMeta(spark, sf).select("doc_id", "payload_bytes")
    val bad = meta.join(docs, "doc_id").filter(col("payload_bytes") =!= col("n"))
    assert(bad.count() === 0)
  }

  test("frameSample covers the payload at the sampling stride") {
    val frames = Multimodal.frameSample(spark, sf)
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() === 0)
    assert(frames.filter(col("frame_bytes") > 64 || col("frame_bytes") <= 0).count() === 0)
    // every doc contributes at least frame 0
    val docsWithFrames = frames.select("doc_id").distinct().count()
    assert(docsWithFrames === graft.Tables.documents(spark, sf).count())
  }

  test("decodeFeatures is deterministic and consistent with payload size") {
    val a = Multimodal.decodeFeatures(spark, sf).collect().map(f => (f.doc_id, f.checksum)).toSet
    val b = Multimodal.decodeFeatures(spark, sf).collect().map(f => (f.doc_id, f.checksum)).toSet
    assert(a === b)
    val meta = Multimodal.mediaMeta(spark, sf).select("doc_id", "payload_bytes")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    Multimodal.decodeFeatures(spark, sf).collect().foreach { f =>
      assert(f.n_bytes === meta(f.doc_id) + Multimodal.headerBytes)
    }
  }
}
