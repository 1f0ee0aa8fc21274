package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star ops): image/audio/video as
  * opaque `binary` payloads with typed metadata, decode / feature /
  * frame-sample stages.
  *
  * The container has no image/audio codecs, so the *decode* itself is a
  * clearly-marked deterministic STUB (metadata derived from the payload
  * bytes); everything around it — the binary column, schema, batch shape,
  * partition-parallel transforms — is real Spark and is what matters at
  * 100 TB: payloads stay opaque byte arrays, metadata travels in narrow
  * typed columns, and nothing ever collects to the driver.
  */
object MultiModal {

  /** Attach a synthetic binary payload derived from a text column (in a
    * real pipeline this is the raw image/audio bytes read from the
    * lake). */
  def attachPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", unhex(md5(col(textCol))))
      .withColumn("payload_len", length(col("payload")).cast("long"))

  /** STUB DECODE — stands in for an image decoder. Derives
    * width/height/channels deterministically from the payload bytes
    * (hex-prefix arithmetic). A real deployment swaps this for a
    * codec-backed decode over the same binary column; the schema and
    * the per-partition execution shape stay identical. */
  def decodeImageMetaStub(df: DataFrame): DataFrame = {
    val hx = hex(col("payload")) // hex round-trip of the binary payload
    df.withColumn("width",
        (conv(substring(hx, 1, 4), 16, 10).cast("long") % 1024 + 16))
      .withColumn("height",
        (conv(substring(hx, 5, 4), 16, 10).cast("long") % 1024 + 16))
      .withColumn("channels", lit(3L))
  }

  /** STUB frame index for a "video": frame count from the payload, frame
    * ids as an array column — the real decoder would emit one binary per
    * frame; the plumbing (array of frames, sampling) is identical. */
  def frameIndexStub(df: DataFrame): DataFrame =
    df.withColumn("n_frames",
        (conv(substring(hex(col("payload")), 9, 4), 16, 10)
          .cast("long") % 30 + 1))
      .withColumn("frame_ids",
        sequence(lit(0L), col("n_frames") - 1))

  /** Every-nth frame sampling over the frame array (higher-order filter,
    * no explode). */
  def sampleFrames(df: DataFrame, every: Int): DataFrame =
    df.withColumn("sampled_frames",
        filter(col("frame_ids"), f => f % every === 0))
      .withColumn("n_sampled", size(col("sampled_frames")).cast("long"))

  /** Decoded-and-resized record emitted by the batched decode stage. */
  final case class DecodedImage(doc_id: Long, width: Long, height: Long,
      resized_w: Long, resized_h: Long, thumb_bytes: Long)

  /** Batched decode + resize over partitions — the Scala analogue of a
    * `mapInPandas` stage: rows stream per partition, are grouped into
    * fixed-size batches, and each batch goes through ONE stubbed
    * vectorized-codec call (real codecs amortize setup per batch, which
    * is exactly why the batch shape matters at 100 TB). The decode body
    * is a deterministic STUB (no codecs in this container); swapping in
    * a real decoder changes only `decodeBatch`, not the plumbing.
    *
    * Input needs (doc_id, payload, width, height) — see
    * [[decodeImageMetaStub]]. Resize clamps the long edge to `maxEdge`
    * preserving aspect ratio.
    */
  def decodeResizeBatched(df: DataFrame, maxEdge: Long = 256,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // STUB of a vectorized codec call: one invocation per batch.
    def decodeBatch(batch: Seq[(Long, Array[Byte], Long, Long)]): Seq[DecodedImage] =
      batch.map { case (id, payload, w, h) =>
        val scale = math.min(1.0, maxEdge.toDouble / math.max(w, h))
        val rw = math.max(1L, math.round(w * scale))
        val rh = math.max(1L, math.round(h * scale))
        // fake thumbnail size derived from payload + target dims
        DecodedImage(id, w, h, rw, rh, rw * rh * 3 + payload.length)
      }

    df.select(col("doc_id").cast("long"), col("payload"),
        col("width").cast("long"), col("height").cast("long"))
      .as[(Long, Array[Byte], Long, Long)]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
      .toDF()
  }
}
