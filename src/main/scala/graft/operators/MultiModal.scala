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
}
