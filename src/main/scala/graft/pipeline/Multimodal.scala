package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video travel as opaque `binary`
 * columns with typed metadata. The Spark-side shape — schema, partition-
 * preserving batch transform, deterministic stub decoder — is real and
 * tested; the actual codec call is the single stub point
 * ([[StubDecoder.decode]]) since no media libraries ship in this
 * environment. On a real cluster the stub is replaced by a JNI/Pandas-UDF
 * decoder with the identical batch signature.
 */
object Multimodal {

  /** Typed media record (binary payload + metadata). */
  final case class MediaRecord(doc_id: Long, media_type: String, bytes: Array[Byte])

  /** Typed decode output (what a real image decode would yield). */
  final case class DecodedMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      content_hash: String)

  /** The one stubbed call: a real implementation would invoke an image
    * codec here. The stub derives deterministic pseudo-dimensions from the
    * payload so the pipeline shape is fully testable. */
  object StubDecoder {
    def decode(r: MediaRecord): DecodedMeta = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(r.bytes).map("%02x".format(_)).mkString
      DecodedMeta(
        doc_id = r.doc_id,
        media_type = r.media_type,
        n_bytes = r.bytes.length.toLong,
        width = 64 + (math.floorMod(r.bytes.length, 64)),
        height = 64 + (math.floorMod(r.bytes.length / 7, 64)),
        content_hash = hash)
    }
  }

  /** Attach a binary media column (payload = utf-8 bytes of the text in
    * tests; on a real pipeline this is the raw image/audio blob). */
  def withMediaColumn(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("media_bytes", encode(col(textCol), "UTF-8").cast("binary"))
      .withColumn("media_type",
        when(length(col(textCol)) % 3 === 0, "image/jpeg")
          .when(length(col(textCol)) % 3 === 1, "image/png")
          .otherwise("audio/wav"))

  /** Batch decode: partition-preserving `mapPartitions` (the Scala analog
    * of `mapInPandas`) — no shuffle, codec state amortized per partition. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("media_bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec handles, etc.)
        it.map { case (id, mt, bytes) =>
          StubDecoder.decode(MediaRecord(id, mt, bytes))
        }
      }
  }

  /** Typed resize output: source dims, target dims, scale factors, and a
    * content hash of the (stubbed) resized payload. */
  final case class ResizedMeta(
      doc_id: Long,
      src_w: Int, src_h: Int,
      dst_w: Int, dst_h: Int,
      scale_x: Double, scale_y: Double,
      resized_hash: String)

  /** Scalar feature extraction output (a real extractor yields an
    * embedding; scalars here keep the result oracle-hashable). */
  final case class MediaFeatures(
      doc_id: Long,
      f_bytes: Long,
      f_aspect: Double,
      f_fill: Double,
      feat_hash: String)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Batch resize: same partition-preserving `mapPartitions` shape as
    * [[decodeMeta]] — a real implementation swaps the stub for an image
    * library call with the identical (bytes → bytes + dims) signature. */
  def resizeStub(spark: SparkSession, media: DataFrame,
      dstW: Int = 224, dstH: Int = 224): Dataset[ResizedMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val w = 64 + math.floorMod(n, 64)
          val h = 64 + math.floorMod(n / 7, 64)
          ResizedMeta(id, w, h, dstW, dstH,
            round6(dstW.toDouble / w), round6(dstH.toDouble / h),
            md5hex(s"$id:${dstW}x$dstH"))
        }
      }
  }

  /** Batch feature extraction: per-partition extractor state (a model
    * handle in a real pipeline), deterministic stub features here. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val w = 64 + math.floorMod(n, 64)
          val h = 64 + math.floorMod(n / 7, 64)
          MediaFeatures(id, n.toLong,
            round6(w.toDouble / h),
            round6((n % 255).toDouble / 255.0),
            md5hex(s"$id:$n"))
        }
      }
  }

  /** Frame sampling: one row per sampled frame index, stub frame hash.
    * Pure generate (explode) — distributes with the documents. */
  def sampleFrames(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
        explode(sequence(lit(0L), (octet_length(col("media_bytes")) % 5).cast("long")))
          .as("frame_idx"))
      .withColumn("frame_hash",
        md5(concat(col("doc_id").cast("string"), lit(":"),
          col("frame_idx").cast("string"))))
}
