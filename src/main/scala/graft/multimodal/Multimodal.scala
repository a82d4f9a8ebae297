package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines.
  *
  * Media ride as opaque `binary` columns with typed metadata structs —
  * the Spark-side contract (schema, partitioning, batch shape) is real
  * and tested; the actual codec work is STUBBED behind
  * [[MediaCodec.decodeStub]] (this container ships no image/audio
  * libraries) with a deterministic fake so tests are reproducible. A
  * real deployment swaps the stub for a JNI/FFI codec inside the same
  * `mapPartitions` batch loop — the plumbing does not change.
  */
object Multimodal {

  final case class MediaRow(
      mediaId: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      format: String,
      widthPx: Int,
      heightPx: Int,
      durationMs: Long)

  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      nBytes: Int,
      contentSha: String,
      // stubbed decode outputs:
      meanLuma: Double,
      frameCount: Int)

  object MediaCodec {
    /** STUB — deterministic fake decode. Real implementation would
      * decode `bytes` with an image/audio codec; the container has
      * none, so features derive from the bytes deterministically
      * (mean byte value stands in for mean luma; frame count from
      * duration at 1 fps).
      */
    def decodeStub(row: MediaRow): MediaFeatures = {
      val sha = java.security.MessageDigest.getInstance("SHA-256")
        .digest(row.bytes).map("%02x".format(_)).mkString
      val mean =
        if (row.bytes.isEmpty) 0.0
        else row.bytes.map(b => (b & 0xff).toDouble).sum / row.bytes.length
      MediaFeatures(row.mediaId, row.kind, row.bytes.length, sha,
        meanLuma = mean, frameCount = math.max(1, (row.durationMs / 1000).toInt))
    }
  }

  /** Feature extraction over partitions: one codec context per
    * partition (the expensive part of real codecs), rows streamed
    * through it — the batch shape a Pandas-UDF/mapInPandas pipeline
    * would use, expressed Dataset-native.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codec: initialize decoder context here, once per partition
      rows.map(MediaCodec.decodeStub)
    }
  }

  /** Frame sampling plumbing: byte-range slices standing in for frame
    * extraction (every `everyMs` milliseconds). Partition-parallel, no
    * shuffle; output explodes one row per sampled frame.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    val m = media.toDF()
    m.filter(col("kind") === "video" && col("durationMs") > 0)
      .select(col("mediaId"),
        explode(sequence(lit(0L), col("durationMs") - 1, lit(everyMs)))
          .as("frame_ms"))
      .withColumn("frame_idx",
        (col("frame_ms") / lit(everyMs)).cast("int"))
  }

  /** Synthesize a deterministic media table from `documents` (text
    * bytes as payload) so the plumbing is testable at every SF.
    */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("mediaId"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      lit("raw").as("format"),
      (col("n_chars") % 640).cast("int").as("widthPx"),
      (col("n_chars") % 480).cast("int").as("heightPx"),
      (col("n_chars") * 10).cast("long").as("durationMs"))
}
