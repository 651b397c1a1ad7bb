package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.normText
import graft.plans.CosineSimilarity

/** Deduplication operators for a large-scale training-data pipeline:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * All content sketches are built over DISTINCT WORD-3-GRAM SHINGLES, not
  * unigram tokens: over a small vocabulary, unigram token sets of any two
  * documents overlap heavily (measured J ≈ 0.65 on the synthetic corpus —
  * every pair became a "near-dup" candidate and the LSH join degenerated
  * toward all-pairs). Shingle space is |vocab|^3, so unrelated docs share
  * ~3% of shingles while true near-dups stay at J ≥ 0.9.
  *
  * Scale stance: nothing here is all-pairs over the corpus. Every near-dup
  * path is (cheap per-doc sketch) → (band/bucket shuffle on a small key) →
  * (verify only within buckets). The shingle arrays and their sizes are
  * computed once per document and carried through the explode, so the
  * verify step never re-joins a separate sizes aggregation.
  *
  * Oracle stance: all hashing is md5 (bit-identical in Spark and DuckDB),
  * MinHash takes the lexicographic min of salted md5 hex digests, and
  * Jaccard thresholds are integer cross-multiplications — no
  * floating-point anywhere except the embedding path, whose codegen'd
  * cosine accumulates in double in the same left-to-right order as the
  * oracle SQL.
  */
object Dedup {

  /** Distinct whitespace tokens of the normalized text, one row per
    * (doc_id, token) — the unigram view (used by text-level ops, NOT by
    * the sketches; see class doc). */
  def tokens(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      explode(array_distinct(split(normText(col("text")), " "))).as("tok"))

  /** Per-doc distinct word-3-gram shingle array + its size, computed once
    * (native WordShingles expression — see graft.plans.WordShingles for
    * why not the higher-order-function chain). */
  def shingleArrays(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("source"),
        graft.plans.WordShingles.shingles(normText(col("text"))).as("gs"))
      .select(col("doc_id"), col("source"), size(col("gs")).as("n_g"), col("gs"))

  /** Exploded shingle rows: (doc_id, source, n_g, g). */
  def shingles(documents: DataFrame): DataFrame =
    shingleArrays(documents)
      .select(col("doc_id"), col("source"), col("n_g"), explode(col("gs")).as("g"))

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

  /** MinHash signature hashes: h_i(doc) = min over shingles of
    * md5(i ":" shingle) — lexicographic min of hex digests, a valid
    * minwise hash family reproducible in any engine with md5. */
  val MinhashSeeds = 8
  val MinhashBands = 4 // 2 rows per band

  def minhashSignatures(documents: DataFrame): DataFrame = {
    val aggs = (0 until MinhashSeeds).map { i =>
      min(md5(concat_ws(":", lit(i.toString), col("g")))).as(s"h$i")
    }
    shingles(documents).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
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

    val ex = shingles(documents)
    candidates
      .join(ex.as("ta"), col("doc_a") === col("ta.doc_id"))
      .join(ex.as("tb"), col("doc_b") === col("tb.doc_id") && col("ta.g") === col("tb.g"))
      .groupBy(col("doc_a"), col("doc_b"), col("ta.n_g").as("na"), col("tb.n_g").as("nb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") * 3 >= col("na") + col("nb"))
      .select(col("doc_a"), col("doc_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash from the first 32 md5 nibbles of each distinct
    * shingle: bit j is the sign of the sum of (+1/-1) votes from nibble
    * j's low bit. */
  def simhashSignatures(documents: DataFrame): DataFrame = {
    val sh = shingles(documents).withColumn("m", md5(col("g")))
    def nibble(j: Int): Column =
      conv(substring(col("m"), j + 1, 1), 16, 10).cast("int")
    val votes = (0 until 32).map { j =>
      sum(when((nibble(j).bitwiseAND(lit(1))) === 1, 1).otherwise(-1)).as(s"s$j")
    }
    val summed = sh.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
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

  /** N-gram Jaccard dedup, blocked by `source` (the blocking key a real
    * pipeline would have: crawl/shard/domain). Emits pairs with
    * jaccard >= 1/2 plus an exact integer jaccard percentage
    * ((100*shared) div union — no floats). */
  def ngramJaccard(documents: DataFrame): DataFrame = {
    val sh = shingles(documents)
    sh.as("a")
      .join(sh.as("b"),
        col("a.source") === col("b.source") &&
          col("a.g") === col("b.g") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_g").as("na"), col("b.n_g").as("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("union_n", col("na") + col("nb") - col("shared"))
      .filter(col("shared") * 2 >= col("union_n"))
      .select(col("doc_a"), col("doc_b"),
        expr("(shared * 100) div union_n").cast("long").as("jaccard_pct"))
      .orderBy("doc_a", "doc_b")
  }

  /** Edit-distance near-dup: Levenshtein over normalized 40-char prefixes,
    * blocked by `source`. The prefix bound caps per-pair cost at 40×40
    * cells (full-document edit distance is quadratic in length — never do
    * that corpus-wide); the blocking key caps the pair count. Distance is
    * an exact integer, so engine-portable. */
  def levenshteinPrefix(documents: DataFrame, prefixLen: Int = 40, maxDist: Int = 5): DataFrame = {
    val n = documents.select(col("doc_id"), col("source"),
      substring(normText(col("text")), 1, prefixLen).as("p"))
    n.as("a")
      .join(n.as("b"),
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("lev_dist", levenshtein(col("a.p"), col("b.p")).cast("long"))
      .filter(col("lev_dist") <= maxDist)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("lev_dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding-cosine near-dup pairs (codegen'd fused cosine, double
    * accumulation). Local form is all-pairs; the bucketed scale path is
    * Similarity.lshTopK — this operator is the verify kernel. */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.5): DataFrame = {
    import graft.plans.DotProduct.dot
    // norms hoisted out of the O(n²) join: one array pass per pair, not 3
    // the pair loop's parallelism = left-side partition count; a small
    // corpus arrives as one split, so spread it (harmless at scale — AQE
    // coalesces, and a 100 TB scan already has thousands of splits)
    val a = embeddings.repartition(32)
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        dot(col("embedding"), col("embedding")).as("na"))
    val b = embeddings.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      dot(col("embedding"), col("embedding")).as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", dot(col("ea"), col("eb")) / sqrt(col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 4).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }
}
