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

  /** Stubbed 64-bit perceptual hash of the media payload, banded 4×16 bit
    * for the hamming join below. The STUB derives the signature from the
    * payload md5 (this container ships no image codecs); a production
    * pipeline swaps in a DCT pHash / aHash over decoded pixels, and
    * NOTHING downstream changes — banding, pigeonhole recall, hot-bucket
    * cap and the exact hamming verify operate on any 4×16-bit signature.
    * The signature is carried as a 4-element long array (each ≤ 0xffff),
    * never as one 64-bit value, so both engines stay in safe signed
    * arithmetic with no sign-bit gymnastics. */
  def phashSignatures(documents: DataFrame): DataFrame = {
    val m = md5(col("text").cast("binary"))
    documents.select(
      col("doc_id"),
      array((0 until 4).map(b =>
        conv(substring(m, 4 * b + 1, 4), 16, 10).cast("long")): _*).as("ph"))
  }

  /** Near-duplicate media detection over the banded perceptual hashes —
    * the media-payload member of the dedup family (the text twin is
    * `Dedup.simhashPairs`, whose banding/cap design this mirrors):
    * candidates from a 4×16-bit band equi-join (pigeonhole: hamming ≤ 3
    * ⇒ at least one band equal, recall 1 within capped buckets), buckets
    * above `maxBucket` dropped disclosed (near-constant payloads —
    * blank images, tracking pixels — are exact-dedup's population), then
    * an exact hamming ≤ `maxHamming` verify summed per band with
    * codegen'd `bit_count(xor)`. On the md5 STUB only identical payloads
    * actually collide (uniform bits); with a real pHash the same plan
    * finds re-encoded/resized variants — the spec drives the band+verify
    * machinery with synthetic near signatures to pin that behavior. */
  def phashPairs(signatures: DataFrame, maxHamming: Int = 3,
                 maxBucket: Int = 1000): DataFrame = {
    val bands = signatures.select(col("doc_id"), col("ph"), posexplode(col("ph")))
      .toDF("doc_id", "ph", "band_idx", "band_key")
    val keep = bands.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket)
      .select(col("band_idx"), col("band_key"))
    val kept = bands.join(keep, Seq("band_idx", "band_key"))
    val ham = (1 to 4).map(i =>
      bit_count(element_at(col("pa"), i)
        .bitwiseXOR(element_at(col("pb"), i)))).reduce(_ + _)
    // dedupe candidate PAIRS before the hamming verify: a 4-band
    // collision otherwise shuffles four identical rows and evaluates
    // the verify expression four times
    kept.as("a")
      .join(kept.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.ph").as("pa"), col("b.ph").as("pb"))
      .distinct()
      .select(col("doc_a"), col("doc_b"), ham.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** [[phashSignatures]] ∘ [[phashPairs]] — the registered composition. */
  def phashDedup(documents: DataFrame): DataFrame =
    phashPairs(phashSignatures(documents))

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
