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

  test("syntheticImages emits genuine PNG bytes") {
    val pngMagic = Array(0x89, 'P', 'N', 'G').map(_.toByte)
    Multimodal.syntheticImages(spark, sf).take(20).foreach { case (id, bytes) =>
      assert(bytes.take(4).sameElements(pngMagic), s"doc $id: not a PNG")
      assert(bytes.length > 50, s"doc $id: implausibly small PNG")
    }
  }

  test("decodeFeatures really decodes: dimensions and pixel sums match the formulas") {
    val feats = Multimodal.decodeFeatures(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.width === Multimodal.imgWidth(f.doc_id))
      assert(f.height === Multimodal.imgHeight(f.doc_id))
      assert(f.n_pixels === f.width * f.height)
      val expected = (for {
        y <- 0 until f.height; x <- 0 until f.width
      } yield Multimodal.pixelValue(f.doc_id, x, y).toLong).sum
      assert(f.px_sum === expected,
        s"doc ${f.doc_id}: decoded pixel sum ${f.px_sum} != formula $expected")
    }
  }

  test("binaryFile ingestion roundtrips: file-source decode equals the in-engine decode") {
    val viaFiles = Multimodal.binaryIngestFeatures(spark, sf).collect()
      .map(f => f.doc_id -> f).toMap
    val direct = Multimodal.decodeFeatures(spark, sf).collect()
    assert(direct.nonEmpty && viaFiles.size === direct.length)
    direct.foreach(f => assert(viaFiles(f.doc_id) === f,
      s"doc ${f.doc_id}: file roundtrip diverged"))
  }

  test("resizeFeatures: nearest-neighbor samples match the source-pixel formula") {
    val k = Multimodal.resizeTo
    val rows = Multimodal.resizeFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(25).foreach { f =>
      assert(f.out_w === k && f.out_h === k)
      val (w, h) = (Multimodal.imgWidth(f.doc_id), Multimodal.imgHeight(f.doc_id))
      val expected = (for {
        y <- 0 until k
        x <- 0 until k
      } yield Multimodal.pixelValue(f.doc_id, x * w / k, y * h / k).toLong).sum
      assert(f.px_sum === expected,
        s"doc ${f.doc_id}: resized pixel sum ${f.px_sum} != formula $expected")
    }
  }
}
