package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `BINARY` columns with typed metadata, and per-item work
  * (decode / feature-extract / frame-sample) runs as narrow per-row or
  * per-partition transforms — never a shuffle of the payload bytes.
  *
  * The container ships no media codecs and no multimodal fixture table, so
  * the corpus is SYNTHESIZED deterministically from `documents`
  * ([[syntheticMedia]]: a GRFT header + dimension fields + the text bytes
  * as payload) and the decode step is a DETERMINISTIC FAKE — see the
  * clearly marked stub in [[decodeFeatures]], which is where a real codec
  * (JNI libjpeg, javax.imageio, ffmpeg pipe) plugs into the partition
  * iterator. Everything around the stub — schema, binary slicing, batch
  * shape, partition-iterator plumbing — is real and tested
  * (MultimodalSpec).
  *
  * Scale notes: payload bytes stay columnar in parquet and are only
  * materialized inside the map task that consumes them; metadata-only
  * queries ([[mediaMeta]]) never read the payload column thanks to parquet
  * column pruning. Frame sampling is `sequence`+`transform` HOFs — codegen,
  * no UDF — and feature extraction is `mapPartitions` (one iterator per
  * partition, the Scala analogue of `mapInPandas` batch processing).
  */
object Multimodal {

  val magic = "GRFT"
  val headerBytes = 16 // "GRFT" + 4-digit width + 4-digit height + 4-digit channels

  /** Deterministic fake media corpus: one binary blob per document. */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      concat(
        lit(magic),
        lpad((lit(16) + col("doc_id") % 64).cast("string"), 4, "0"),
        lpad((lit(16) + (col("doc_id") * 7) % 64).cast("string"), 4, "0"),
        lpad((lit(1) + col("doc_id") % 3).cast("string"), 4, "0"),
        col("text")).cast(BinaryType).as("media"))

  /** Metadata extraction: header-only binary slicing — the payload column
    * is never touched, so a parquet-backed corpus prunes it from the scan. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    syntheticMedia(spark, dir).select(
      col("doc_id"),
      substring(col("media"), 1, 4).cast("string").as("magic"),
      substring(col("media"), 5, 4).cast("string").cast("int").as("width"),
      substring(col("media"), 9, 4).cast("string").cast("int").as("height"),
      substring(col("media"), 13, 4).cast("string").cast("int").as("channels"),
      (length(col("media")) - headerBytes).as("payload_bytes"))
      .orderBy("doc_id")

  /** Frame sampling: split the payload into fixed-size frames, keep every
    * `every`-th, fingerprint each with crc32. HOFs only — stays in
    * whole-stage codegen. */
  def frameSample(spark: SparkSession, dir: String,
      frameBytes: Int = 64, every: Int = 4): DataFrame =
    syntheticMedia(spark, dir)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0, (length(media) - ${headerBytes + 1}) div $frameBytes),
             |  i -> substring(media, ${headerBytes + 1} + i * $frameBytes, $frameBytes))""".stripMargin)))
      .toDF("doc_id", "frame_idx", "frame")
      .filter(col("frame_idx") % every === 0)
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).as("frame_bytes"),
        crc32(col("frame")).as("frame_crc"))
      .orderBy("doc_id", "frame_idx")

  final case class MediaFeature(doc_id: Long, n_bytes: Int, checksum: Long)

  /** Per-partition decode/feature-extract plumbing. The iterator shape is
    * the real contract (batch in, batch out, no driver round-trip). */
  def decodeFeatures(spark: SparkSession, dir: String): Dataset[MediaFeature] = {
    import spark.implicits._
    syntheticMedia(spark, dir).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        // STUB: a real pipeline hands `bytes` to a codec here (decode,
        // resize, spectrogram, ...). No media libs ship in this container,
        // so a deterministic rolling checksum stands in for the extracted
        // feature — same signature, same batch shape.
        val checksum = bytes.foldLeft(7L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
        MediaFeature(id, bytes.length, checksum)
      }
    }
  }
}
