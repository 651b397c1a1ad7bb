package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{normText, qualityScore}
import graft.plans.DotProduct.dot

/** TRAINED quality classifier — the learned form of the heuristic quality
  * gate, the way production LLM pipelines actually run it (a linear /
  * fastText-style scorer distilled from labeled exemplars, then applied
  * to the whole corpus). Here the label source is the engine's own
  * heuristic gate (distillation keeps the demo self-contained and
  * deterministic); swapping in human/LLM labels is a one-column change.
  *
  * Everything around the (driver-side, sample-sized) model fit is
  * engine-exact by construction, the same contract as the IVF family:
  *
  *  - FEATURES are hashed-unigram fractions: bucket = first 4 hex nibbles
  *    of md5(token) mod [[FeatureDim]] (the stratified-sample hash — md5
  *    is bit-identical in DuckDB), value = count/doc_len as one IEEE
  *    double division. No murmur, no engine-private hash.
  *  - SCORING is the raw margin w·x + b: a strict left-to-right double
  *    dot product over ascending buckets (the codegen'd [[DotProduct]]),
  *    NOT the sigmoid — libm `exp` is not cross-engine exact, and the
  *    keep/drop decision is monotone in the margin anyway.
  *  - The fitted coefficients are INLINED into the DuckDB oracle post-run
  *    ([[lastModel]], same replicate-the-internals pattern as the IVF
  *    centroid inlining), so the oracle recomputes features AND margin
  *    bit-for-bit.
  *
  * Scale shape: featurization is explode → (doc, bucket) count → bounded
  * [[FeatureDim]]-wide array rebuild — the shuffle carries integer
  * (doc_id, bucket, count) rows, never text. The fit runs on a BOUNDED
  * deterministic sample ([[TrainSample]] smallest doc_ids — at 100 TB a
  * quality model is fit on thousands of labeled docs, not the corpus);
  * scoring the corpus is one broadcast-coefficients codegen map pass.
  * Fit cost is memoized per (corpus plan, dim) like the IVF quantizer.
  */
object QualityModel {

  /** Hashed feature buckets (collisions are part of the contract — the
    * hashing-trick dimension, disclosed). */
  val FeatureDim = 64

  /** Deterministic training-sample bound: the TrainSample smallest
    * doc_ids (TakeOrdered, partitioning-stable), mirroring
    * [[Similarity.quantizerFor]]'s IvfTrainSample stance. */
  val TrainSample = 10000

  /** bucket = (first 4 md5 hex nibbles) mod FeatureDim — the same
    * engine-portable hash the stratified sampler uses on doc keys. */
  private def bucket(tok: org.apache.spark.sql.Column) =
    (conv(substring(md5(tok), 1, 4), 16, 10).cast("long") % FeatureDim).cast("int")

  /** (doc_id, heur_keep, dl, features array<double>[FeatureDim]):
    * hashed-unigram count fractions; token-less docs have no feature
    * rows and are excluded by contract (the heuristic gate owns them —
    * same stance as tokenRarityAgainst). */
  private def featurize(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        explode(split(normText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val counts = toks
      .groupBy(col("doc_id"), bucket(col("tok")).as("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val asMap = counts
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bkt"), col("cnt")))).as("m"),
        sum(col("cnt")).as("dl"))
    val featArr = transform(sequence(lit(0), lit(FeatureDim - 1)),
      i => coalesce(element_at(col("m"), i), lit(0L)).cast("double") / col("dl").cast("double"))
    val labels = documents.select(col("doc_id"),
      (qualityScore(col("text")) >= 0.5).as("heur_keep"))
    asMap.join(labels, "doc_id")
      .select(col("doc_id"), col("heur_keep"), featArr.as("features"))
  }

  /** Memoized fits per (canonicalized corpus plan, dim) + the
    * single-model oracle slot, with the same two-models-trained
    * ambiguity guard as [[Similarity.lastQuantizer]]. */
  private val modelCache =
    scala.collection.concurrent.TrieMap.empty[Any, (Array[Double], Double)]
  @volatile private var lastFit: (Array[Double], Double) = (Array.empty, 0.0)
  @volatile private var fitKeys: Set[Any] = Set.empty
  def lastModel: (Array[Double], Double) =
    if (fitKeys.size > 1) (Array.empty, 0.0) else lastFit
  def clearSessionState(): Unit = synchronized {
    modelCache.clear(); fitKeys = Set.empty; lastFit = (Array.empty, 0.0)
  }

  private def fit(documents: DataFrame): (Array[Double], Double) = {
    val planKey = (documents.queryExecution.analyzed.canonicalized, FeatureDim)
    val m = modelCache.getOrElseUpdate(planKey, graft.CacheBuild.timed {
      // prune to the sample BEFORE featurizing: at 100 TB the fit must
      // not pay a corpus-wide featurize pass for a 10k-doc sample
      val train = featurize(documents.orderBy(col("doc_id")).limit(TrainSample))
        .select(col("heur_keep").cast("double").as("label"),
          array_to_vector(col("features")).as("fv"))
      val lr = new LogisticRegression()
        .setFeaturesCol("fv").setLabelCol("label")
        .setMaxIter(50).setRegParam(0.01).setTol(1e-9)
      val fitted = lr.fit(train)
      (fitted.coefficients.toArray, fitted.intercept)
    })
    if (m._1.nonEmpty) synchronized { fitKeys += planKey; lastFit = m }
    m
  }

  /** Score the corpus with the distilled classifier: (doc_id, margin,
    * model_keep, heur_keep) — margin is the raw linear score (keep ⇔
    * margin ≥ 0), heur_keep rides along so the query doubles as the
    * model-vs-teacher agreement view. */
  def trainedQualityScores(documents: DataFrame): DataFrame = {
    val (coef, intercept) = fit(documents)
    val feats = featurize(documents)
    if (coef.isEmpty) {
      // degenerate corpus (no tokens anywhere): nothing to score
      return feats.select(col("doc_id"), lit(0.0).as("margin"),
        lit(false).as("model_keep"), col("heur_keep")).limit(0)
    }
    val margin = dot(col("features"), typedLit(coef.toSeq)) + lit(intercept)
    feats
      .withColumn("margin_raw", margin)
      .select(col("doc_id"), round(col("margin_raw"), 4).as("margin"),
        (col("margin_raw") >= 0).as("model_keep"), col("heur_keep"))
      .orderBy("doc_id")
  }
}
