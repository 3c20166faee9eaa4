package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque BINARY
  * content plus a typed metadata struct. The Spark-side machinery — schema,
  * partitioning, batched per-partition processing, feature schema — is real
  * and tested; the actual codec step is a clearly marked DETERMINISTIC STUB
  * (`decodeStub`) because no image/audio libraries exist in this
  * environment. Swapping the stub for a real decoder changes one function.
  *
  * Scale: content bytes never hit the driver; decode runs as mapPartitions
  * with bounded-size batches (the shape a vectorized/batched decoder wants),
  * and downstream feature columns are ordinary pruned/pushed-down columns.
  */
object Multimodal {

  /** media row: opaque payload + typed metadata */
  final case class MediaRow(media_id: Long, content: Array[Byte], format: String,
      width: Int, height: Int)
  /** extracted features: fixed-size vector + shape info */
  final case class MediaFeatures(media_id: Long, byte_len: Int, format: String,
      frames_sampled: Int, features: Array[Float])

  /** Build a deterministic media table from the documents fixture: the text
    * bytes stand in for an encoded payload. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      // fake-but-typed metadata derived from content size
      when(col("n_chars") % 3 === 0, "png")
        .when(col("n_chars") % 3 === 1, "jpg")
        .otherwise("webp").as("format"),
      (col("n_chars") % 640 + 1).cast("int").as("width"),
      (col("n_chars") % 480 + 1).cast("int").as("height"))

  /** DETERMINISTIC STUB for the codec: "decodes" content into a fixed-width
    * feature vector from byte statistics. A real implementation would call
    * the image/audio library here — same signature, same batch shape. */
  def decodeStub(content: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    if (content.isEmpty) return out
    var i = 0
    while (i < content.length) {
      out(i % dim) += (content(i) & 0xff) / 255.0f
      i += 1
    }
    out.map(v => v / content.length * dim)
  }

  /** Sample every `stride`-th byte — the frame-sampling shape (a video
    * decoder would pull every k-th frame the same way). */
  def sampleFrames(content: Array[Byte], stride: Int): Array[Byte] =
    content.indices.collect { case i if i % stride == 0 => content(i) }.toArray

  /** Batched per-partition decode: processes `batchSize` rows at a time so a
    * real vectorized decoder amortizes setup per batch, not per row. */
  def extractFeatures(media: Dataset[MediaRow], frameStride: Int = 16,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // real codec: decode the whole batch here in one native call
        batch.map { m =>
          val frames = sampleFrames(m.content, frameStride)
          MediaFeatures(m.media_id, m.content.length, m.format,
            frames.length, decodeStub(m.content))
        }
      }
    }
  }

  def mediaDataset(docs: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    mediaFromDocuments(docs).as[MediaRow]
  }
}
