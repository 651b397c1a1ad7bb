package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata. The metadata-decode and
  * feature-extract steps are STUBBED with deterministic fakes (this
  * container ships no image/audio codecs — see the builder brief);
  * everything around them — schema, binary casting, partition-parallel
  * batch iteration via mapPartitions, typed Encoders — is the real Spark
  * plumbing a production decode would use, and is oracle-tested. The
  * perceptual-hash dedup is NOT stubbed: [[phashOf]] is a real
  * fixed-point 2D-DCT pHash over the payload bytes (only the
  * pixels-from-decode step is a byte-plane read).
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

  /** Fixed-point 8×32 DCT-II weight table shared by the JVM transform
    * and the generated DuckDB oracle (the oracle inlines THIS table as a
    * VALUES CTE, so the two engines cannot drift):
    * W[u][x] = round(2^14 · cos(π·(2x+1)·u / 64)), u ∈ 0..7, x ∈ 0..31.
    * StrictMath keeps the rounding platform-identical; everything after
    * the table is pure long arithmetic. */
  private[graft] val DctW: Array[Array[Long]] =
    Array.tabulate(8, 32)((u, x) =>
      math.round(16384.0 * StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / 64.0)))

  /** REAL 2D-DCT perceptual hash of a payload, 64 bits as 4×16-bit
    * bands. The classic pHash recipe with the decode step replaced by a
    * deterministic byte-plane read (no codecs in this container; a real
    * decoder changes only how the 32×32 grid is filled):
    *  1. resample the payload to a 32×32 "pixel" grid — pixel i reads
    *     byte (i·len) div 1024, so every byte region contributes and a
    *     single-byte change moves only ~1024/len pixels;
    *  2. exact integer 2D DCT-II: keep the 8×8 LOW-FREQUENCY block of
    *     F[u][v] = Σ p(r,c)·W[u][r]·W[v][c] — separable (row pass then
    *     column pass), no intermediate truncation, so F is an EXACT
    *     integer both engines reproduce bit-for-bit (|F| ≤
    *     255·1024·2^28 < 2^63);
    *  3. threshold each of the 63 non-DC coefficients against their
    *     lower median (the 32nd smallest): bit k = F_k > med. Small
    *     payload perturbations move coefficients a little and flip few
    *     bits — the property that makes near-identical payloads land at
    *     small hamming distance (spec-pinned with a byte-perturbed
    *     payload).
    * The DC term is excluded (it is the global byte sum — pure
    * brightness/length, no structure) and its bit stays 0. */
  private[graft] def phashOf(payload: Array[Byte]): Array[Long] = {
    val bytes = if (payload == null) Array.emptyByteArray else payload
    val len = bytes.length
    val px = new Array[Long](1024)
    var i = 0
    while (i < 1024) {
      px(i) = if (len == 0) 0L else (bytes(i * len / 1024) & 0xFF).toLong
      i += 1
    }
    // row pass: t[u][c] = Σ_r W[u][r] · p[r][c]
    val t = Array.ofDim[Long](8, 32)
    var u = 0
    while (u < 8) {
      var c = 0
      while (c < 32) {
        var s = 0L; var r = 0
        while (r < 32) { s += DctW(u)(r) * px(r * 32 + c); r += 1 }
        t(u)(c) = s; c += 1
      }
      u += 1
    }
    // column pass: f[u][v] = Σ_c t[u][c] · W[v][c]
    val f = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L; var c = 0
        while (c < 32) { s += t(u)(c) * DctW(v)(c); c += 1 }
        f(u * 8 + v) = s; v += 1
      }
      u += 1
    }
    val nonDc = java.util.Arrays.copyOfRange(f, 1, 64)
    java.util.Arrays.sort(nonDc)
    val med = nonDc(31) // lower median of 63 = 32nd smallest
    val bands = new Array[Long](4)
    var k = 1
    while (k < 64) {
      if (f(k) > med) bands(k / 16) |= 1L << (k % 16)
      k += 1
    }
    bands
  }

  /** Typed signature row for the mapPartitions encoder. */
  final case class PhashSig(doc_id: Long, ph: Array[Long])

  /** Per-document [[phashOf]] signatures, banded 4×16 bit for the
    * hamming join below — computed payload-local via mapPartitions (the
    * per-partition codec-init pattern: zero shuffle, the transform cost
    * scales embarrassingly with partitions). The signature is carried as
    * a 4-element long array (each ≤ 0xffff), never as one 64-bit value,
    * so both engines stay in safe signed arithmetic with no sign-bit
    * gymnastics. */
  def phashSignatures(documents: DataFrame): DataFrame =
    phashSignaturesOf(
      documents.select(col("doc_id"), col("text").cast("binary").as("payload")))

  /** Signature pass over an arbitrary `(doc_id, payload)` relation —
    * the shared core of [[phashSignatures]] (table-carried payloads) and
    * the [[ingestBinaryDir]] file-ingestion path: one mapPartitions
    * scan, no shuffle, identical signatures whichever way the bytes
    * arrived. */
  def phashSignaturesOf(binaryRel: DataFrame): DataFrame = {
    val binary: Dataset[(Long, Array[Byte])] = binaryRel
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    binary
      .mapPartitions { it =>
        it.map { case (id, payload) => PhashSig(id, phashOf(payload)) }
      }(Encoders.product[PhashSig])
      .toDF()
  }

  /** Ingest a directory of raw media files as `(doc_id, n_bytes,
    * payload)` via Spark's builtin `binaryFile` source — the real-world
    * media entry point: payload files land in object storage, the scan
    * yields one row per file with the bytes as a binary column, and
    * every downstream payload operator ([[bytesStats]]-style stats,
    * [[phashSignaturesOf]], feature extraction) runs unchanged on
    * ingested or table-carried payloads. doc_id parses from the file
    * name stem. At 100 TB the per-file row model is the right grain for
    * media (files are the unit of decode); Spark distributes files
    * across tasks and `spark.sql.sources.binaryFile.maxLength` guards
    * against a single pathological blob. */
  def ingestBinaryDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        col("content").as("payload"))

  /** Near-duplicate media detection over the banded perceptual hashes —
    * the media-payload member of the dedup family (the text twin is
    * `Dedup.simhashPairs`, whose banding/cap design this mirrors):
    * candidates from a 4×16-bit band equi-join (pigeonhole: hamming ≤ 3
    * ⇒ at least one band equal, recall 1 within capped buckets), buckets
    * above `maxBucket` dropped disclosed (near-constant payloads —
    * blank images, tracking pixels — are exact-dedup's population), then
    * an exact hamming ≤ `maxHamming` verify summed per band with
    * codegen'd `bit_count(xor)`. The signatures are the REAL 2D-DCT
    * pHash ([[phashOf]]), so byte-perturbed ("re-encoded") payloads land
    * at small hamming distance and pair — spec-pinned with a perturbed
    * payload, plus synthetic near signatures for the band/verify edge
    * cases. */
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
