package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A multimodal row: opaque binary payload + typed metadata (SURVEY.md
  * §2.3 #36). The payload is an opaque `binary` column — at 100 TB this
  * is the image/audio/video bytes column of a training-data lakehouse
  * table; here it is the UTF-8 bytes of the document text so every
  * byte-level feature stays deterministic and oracle-checkable.
  */
case class MediaRecord(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    payload: Array[Byte])

/** Decoded per-record features (the output schema of the decode stage). */
case class MediaFeatures(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    payload_len: Long,
    payload_md5: String,
    byte_sum: Long)

/** Output of the frame-sampling stage. */
case class FrameStats(
    doc_id: Long,
    n_frames: Long,
    n_sampled: Long,
    sampled_byte_sum: Long)

/** Multimodal column plumbing: typed metadata + binary payload +
  * a partition-batched decode/feature-extract stage.
  *
  * Scale notes: the media table keeps payloads as parquet binary — scans
  * that don't touch `payload` never read those pages (column pruning).
  * The decode stage is `mapPartitions` over a typed Dataset: one
  * decoder instantiation per partition (NOT per row — the shape a real
  * codec needs), streaming through the partition iterator without
  * materializing it. Partition count = upstream parquet splits, so
  * decode parallelism scales with the data.
  */
object Multimodal {

  /** documents → media table: deterministic typed metadata + payload
    * bytes. Formats/dimensions derive from doc_id so the DuckDB oracle
    * reproduces them exactly.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (lit(32) * (col("doc_id") % 16 + 1)).cast("int").as("width"),
        (lit(32) * (col("doc_id") % 9 + 1)).cast("int").as("height"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Decode / feature-extract over partition-sized batches.
    *
    * STUB: a real deployment decodes image/audio bytes here with a
    * codec (libs not present in this environment). The per-partition
    * "decoder" below computes deterministic byte-level features
    * instead, so the plumbing — typed schema, per-partition decoder
    * lifecycle, iterator batch shape — is real and tested while the
    * codec call is the only fake.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // Per-partition decoder instantiation (a real codec context would
      // be created once here, not per record).
      val md = java.security.MessageDigest.getInstance("MD5")
      records.map { r =>
        md.reset()
        val digest = md.digest(r.payload)
        val hex = digest.map(b => f"${b & 0xff}%02x").mkString
        var sum = 0L
        var i = 0
        while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
        MediaFeatures(r.doc_id, r.format, r.width, r.height,
          r.payload.length.toLong, hex, sum)
      }
    }
  }

  /** #36 gate query — metadata + byte-level features of the decode
    * stage, ordered by doc_id. byte_sum is excluded from the oracle
    * columns (DuckDB cannot fold over blob bytes) but is asserted
    * deterministic in the spec.
    */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaTable(spark, dir))
      .toDF()
      .select("doc_id", "format", "width", "height", "payload_len", "payload_md5")
      .orderBy("doc_id")

  /** Frame-sampling stage: chunk the payload into fixed 64-byte
    * "frames" (stand-in for video frame boundaries) and keep every
    * 4th — the decimation a vision pipeline applies before feature
    * extraction. Same partition-batched shape as [[decodeFeatures]];
    * the per-frame byte work is the stubbed codec step.
    */
  def frameSample(media: Dataset[MediaRecord],
      frameBytes: Int = 64, every: Int = 4): Dataset[FrameStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
        var sampled = 0L
        var byteSum = 0L
        var f = 0
        while (f < nFrames) {
          if (f % every == 0) {
            sampled += 1
            var i = f * frameBytes
            val end = math.min(i + frameBytes, r.payload.length)
            while (i < end) { byteSum += r.payload(i) & 0xff; i += 1 }
          }
          f += 1
        }
        FrameStats(r.doc_id, nFrames.toLong, sampled, byteSum)
      }
    }
  }

  /** #36b gate query — frame/sample counts are oracle-checkable from
    * the payload length alone; sampled_byte_sum is spec-verified
    * (DuckDB cannot fold over blob bytes).
    */
  def qMultimodalFrames(spark: SparkSession, dir: String): DataFrame =
    frameSample(mediaTable(spark, dir))
      .toDF()
      .select("doc_id", "n_frames", "n_sampled")
      .orderBy("doc_id")

  val qMultimodalFramesSql: String =
    """SELECT doc_id,
      |  CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames,
      |  CAST(ceil(ceil(octet_length(encode(text)) / 64.0) / 4.0) AS BIGINT) AS n_sampled
      |FROM documents ORDER BY doc_id""".stripMargin

  val qMultimodalMetaSql: String =
    """SELECT doc_id,
      |  (['png', 'jpeg', 'wav'])[CAST(doc_id % 3 + 1 AS INT)] AS format,
      |  CAST(32 * (doc_id % 16 + 1) AS INT) AS width,
      |  CAST(32 * (doc_id % 9 + 1) AS INT) AS height,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
      |  md5(text) AS payload_md5
      |FROM documents ORDER BY doc_id""".stripMargin
}
