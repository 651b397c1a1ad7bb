package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.normText
import graft.functions.VectorFunctions

/** Deduplication operators for a large-scale training-data pipeline:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale stance: nothing here is all-pairs over the corpus. Every near-dup
  * path is (cheap per-doc sketch) → (band/bucket shuffle on a small key) →
  * (verify only within buckets). At 100 TB the candidate-pair join is the
  * only quadratic-risk step, and it is bounded by band-collision
  * probability, not corpus size.
  *
  * Oracle stance: all hashing is md5 (bit-identical in Spark and DuckDB),
  * MinHash takes the lexicographic min of salted md5 hex digests, and
  * Jaccard thresholds are integer cross-multiplications — no
  * floating-point anywhere except the embedding path, which accumulates
  * in double in a fixed left-to-right order in both engines.
  */
object Dedup {

  /** Distinct whitespace tokens of the normalized text, one row per
    * (doc_id, token). */
  def tokens(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      explode(array_distinct(split(normText(col("text")), " "))).as("tok"))

  /** Exact dedup: keep the smallest doc_id per identical text. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
      .orderBy("doc_id")

  /** Exact dedup after normalization (lower/trim/collapse-ws), keyed by
    * md5 fingerprint — the form that scales: the shuffle key is 16 bytes,
    * not the document. */
  def exactNormalized(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(normText(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_count"))
      .select(col("doc_id"), col("dup_count"))
      .orderBy("doc_id")

  /** MinHash signature hashes: h_i(doc) = min over tokens of
    * md5(i ":" token) — lexicographic min of hex digests, which is a valid
    * minwise hash family and reproducible in any engine with md5. */
  val MinhashSeeds = 8
  val MinhashBands = 4 // 2 rows per band

  def minhashSignatures(documents: DataFrame): DataFrame = {
    val aggs = (0 until MinhashSeeds).map { i =>
      min(md5(concat_ws(":", lit(i.toString), col("tok")))).as(s"h$i")
    }
    tokens(documents).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH near-dup pairs, with an exact-Jaccard verify step.
    * Banding: 4 bands × 2 rows; a pair is a candidate if any band's
    * concatenated digest collides. Candidates are then verified at
    * Jaccard >= 1/2 via integer math (3*shared >= |A|+|B|). */
  def minhashLsh(documents: DataFrame): DataFrame = {
    val sig = minhashSignatures(documents)
    val bandCols = array((0 until MinhashBands).map { b =>
      md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}")))
    }: _*)
    val bands = sig.select(col("doc_id"), posexplode(bandCols))
      .toDF("doc_id", "band_idx", "band_key")
    val candidates = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    val toks = tokens(documents)
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    val shared = candidates
      .join(toks.as("ta"), col("doc_a") === col("ta.doc_id"))
      .join(toks.as("tb"), col("doc_b") === col("tb.doc_id") && col("ta.tok") === col("tb.tok"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .filter(col("shared") * 3 >= col("sa.n_tok") + col("sb.n_tok"))
      .select(col("doc_a"), col("doc_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash from the first 32 md5 nibbles of each distinct token:
    * bit j is the sign of the sum of (+1/-1) votes from nibble j's low bit. */
  def simhashSignatures(documents: DataFrame): DataFrame = {
    val toks = tokens(documents).withColumn("m", md5(col("tok")))
    def nibble(j: Int): Column =
      conv(substring(col("m"), j + 1, 1), 16, 10).cast("int")
    val votes = (0 until 32).map { j =>
      sum(when((nibble(j).bitwiseAND(lit(1))) === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val summed = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sim = (0 until 32)
      .map(j => when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    summed.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: band the 32-bit signature into 4 bytes
    * (pigeonhole: hamming<=3 ⇒ at least one byte equal), join per band,
    * verify hamming distance <= 3. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhashSignatures(documents)
    val bandCols = array((0 until 4).map { b =>
      shiftright(col("simhash"), 8 * b).bitwiseAND(lit(255L))
    }: _*)
    val bands = sig.select(col("doc_id"), col("simhash"), posexplode(bandCols))
      .toDF("doc_id", "simhash", "band_idx", "band_key")
    bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Word 3-gram shingles per document (distinct). */
  def shingles(documents: DataFrame): DataFrame = {
    val toks = split(normText(col("text")), " ")
    val sh = when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i, lit(3))))))
      .otherwise(array())
    documents.select(col("doc_id"), col("source"), explode(sh).as("g"))
  }

  /** N-gram Jaccard dedup, blocked by `source` (the blocking key a real
    * pipeline would have: crawl/shard/domain). Emits pairs with
    * jaccard >= 1/2 plus an exact integer jaccard percentage
    * ((100*shared) div union — no floats). */
  def ngramJaccard(documents: DataFrame): DataFrame = {
    val sh = shingles(documents)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_g"))
    val shared = sh.as("a")
      .join(sh.as("b"),
        col("a.source") === col("b.source") &&
          col("a.g") === col("b.g") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("union_n", col("sa.n_g") + col("sb.n_g") - col("shared"))
      .filter(col("shared") * 2 >= col("union_n"))
      .select(col("doc_a"), col("doc_b"),
        expr("(shared * 100) div union_n").cast("long").as("jaccard_pct"))
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup pairs (threshold on double-accumulated
    * cosine). Local form is all-pairs; the bucketed scale path is
    * Similarity.lshBuckets — this operator is the verify kernel. */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.5): DataFrame = {
    val a = embeddings.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", VectorFunctions.cosine(col("ea"), col("eb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 4).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }
}
