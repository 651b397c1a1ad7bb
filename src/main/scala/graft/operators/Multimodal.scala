package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata. The decode step is STUBBED with a
  * deterministic fake (this container ships no image/audio codecs — see
  * the builder brief); everything around it — schema, binary casting,
  * partition-parallel batch iteration via mapPartitions, typed Encoders —
  * is the real Spark plumbing a production decode would use, and is
  * oracle-tested.
  */
object Multimodal {

  /** Byte-level stats over the payload read as binary — the "is this blob
    * sane" pre-decode filter. */
  def bytesStats(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      ascii(substring(col("text"), 1, 1)).cast("long").as("header_byte"))
      .orderBy("doc_id")

  /** Frame sampling: every 16th byte of the fake "video" payload,
    * reassembled as a preview string — the shape of a frame-subsample
    * pass (stride read, no shuffle). Null payloads stay null and empty
    * payloads sample to empty — `sequence(1, 0)` is an error, and a
    * 100 TB corpus WILL contain empty/missing blobs. */
  def frameSample(documents: DataFrame, stride: Int = 16): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("text").isNull, lit(null).cast("string"))
        .when(length(col("text")) < 1, lit(""))
        .otherwise(expr(
          s"array_join(transform(sequence(1, length(text), $stride), i -> substring(text, i, 1)), '')"))
        .as("frames"))
      .orderBy("doc_id")

  /** Typed output of the stubbed decoder. */
  final case class MediaMeta(doc_id: Long, width: Long, height: Long, media_format: String)

  private val Formats = Array("jpeg", "png", "webp")

  /** Deterministic fake decode: md5 the payload, derive dimensions/format
    * from the first nibbles. A real decoder would parse the binary header
    * here; the signature (partition iterator in, typed rows out, no
    * driver-side collection) is exactly what it would look like. */
  def fakeDecode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    // a missing blob decodes like an empty one — never an executor NPE
    val bytes = if (payload == null) Array.emptyByteArray else payload
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    def nib(i: Int): Int = Integer.parseInt(hex.substring(i, i + 1), 16)
    MediaMeta(docId, 32L * (1 + nib(0)), 32L * (1 + nib(1)), Formats(nib(2) % 3))
  }

  /** Typed output of the stubbed feature extractor. */
  final case class MediaFeatures(doc_id: Long, features: Array[Float])

  /** Stubbed per-payload FEATURE EXTRACTION — the embed-the-image step of
    * a multimodal pipeline. A real extractor would run a vision encoder
    * over the decoded pixels; the fake derives a 16-dim float vector from
    * the payload's md5 (deterministic, engine-reproducible), and the
    * plumbing — per-partition extractor init, streamed batches, fixed
    * fixed-length float-array column out — is exactly the production
    * shape. The output column is ANN-ready: it feeds
    * [[Similarity.bruteForceTopK]] unchanged (see `media_feature_ann`). */
  def featureExtract(spark: SparkSession, documents: DataFrame, dim: Int = 16): DataFrame = {
    require(dim <= 16, "fake features are derived from 32 md5 nibbles")
    val binary: Dataset[(Long, Array[Byte])] = documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    binary
      .mapPartitions { it =>
        // per-partition init point for a real encoder (model load, device
        // handle); the md5 stand-in keeps the same lifecycle
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, payload) =>
          val bytes = if (payload == null) Array.emptyByteArray else payload
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          val fs = Array.tabulate(dim) { j =>
            val b = Integer.parseInt(hex.substring(2 * j, 2 * j + 2), 16)
            (b / 255.0 - 0.5).toFloat
          }
          MediaFeatures(id, fs)
        }
      }(Encoders.product[MediaFeatures])
      .toDF()
  }

  /** Decode metadata for every document via mapPartitions — one decoder
    * instance per partition (the expensive-init pattern for real codecs),
    * rows streamed, nothing collected to the driver. */
  def imageMeta(spark: SparkSession, documents: DataFrame): DataFrame = {
    val binary: Dataset[(Long, Array[Byte])] = documents
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    binary
      .mapPartitions { it =>
        // per-partition init point for a real codec; md5 digest is cheap
        it.map { case (id, payload) => fakeDecode(id, payload) }
      }(Encoders.product[MediaMeta])
      .toDF()
      .orderBy("doc_id")
  }
}
