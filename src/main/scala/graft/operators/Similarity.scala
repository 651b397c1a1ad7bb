package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.CosineSimilarity

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - brute-force top-k: exact baseline. The query set is broadcast, so the
  *    corpus is scanned once with no shuffle of the embedding column — at
  *    100 TB this is one map stage + a per-query top-k (TakeOrdered-style).
  *  - LSH-bucketed: sign-bucket on the first 8 dimensions (axis-aligned
  *    hyperplanes — deterministic, engine-portable), then search only the
  *    query's bucket. The bucket key is 1 byte: the join shuffles only
  *    (bucket, id), never pairs the full corpus.
  */
object Similarity {

  /** Exact brute-force cosine top-k for a small query set
    * (vec_id < nQueries), excluding self. */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val corpus = embeddings.repartition(32) // single-split local file → spread the scan side
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim_raw").desc, col("neighbor_id"))
    corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim_raw", CosineSimilarity.cosineFast(col("qe"), col("ne")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos_sim_raw"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Sign-LSH bucket key: bit j set iff embedding[j] >= 0, j < 8. */
  private def bucketKey(emb: org.apache.spark.sql.Column) =
    (0 until 8)
      .map(j => when(element_at(emb, j + 1) >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** LSH-bucketed ANN: candidates limited to the query's sign-bucket,
    * then exact cosine top-k within the bucket. Recall < 1 by design;
    * deterministic, so oracle-checkable. */
  def lshTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 3): DataFrame = {
    val bucketed = embeddings.select(
      col("vec_id"), col("embedding"), bucketKey(col("embedding")).as("bucket"))
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim_raw").desc, col("vec_id"))
    bucketed.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim_raw", CosineSimilarity.cosineFast(col("qe"), col("embedding")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos_sim_raw"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into cells; each query probes only its `nProbe` nearest cells,
    * then scores candidates exactly. THE standard billion-vector layout:
    * at 100 TB the corpus is partitioned (and can be stored bucketed) by
    * cell, so a query touches nProbe/nCells of the data. Centroids are a
    * model artifact (tiny, broadcast); training is one MLlib pass.
    * Not oracle-checkable (k-means float sums are parallelism-dependent) —
    * covered by rows-only check + the subset test in OperatorSpec. */
  def ivfTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 3,
              nCells: Int = 16, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val vecs = embeddings
      .withColumn("fv", array_to_vector(col("embedding")))
    val model = new KMeans()
      .setK(nCells).setSeed(42L).setFeaturesCol("fv").setPredictionCol("cell")
      .fit(vecs)
    val assigned = model.transform(vecs)
      .select(col("vec_id"), col("embedding"), col("cell"))

    // nProbe nearest cells per query, by cosine to the centroids
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }.toSeq
    val spark = embeddings.sparkSession
    import spark.implicits._
    val centDf = centroids.toDF("cell", "centroid")
    val queries = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cell"))
    val probed = queries.crossJoin(broadcast(centDf))
      .withColumn("cdist", CosineSimilarity.cosineFast(col("qe"), col("centroid")))
      .withColumn("crk", row_number().over(wCell))
      .filter(col("crk") <= nProbe)
      .select(col("query_id"), col("qe"), col("cell"))

    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim_raw").desc, col("vec_id"))
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim_raw", CosineSimilarity.cosineFast(col("qe"), col("embedding")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos_sim_raw"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Per-bucket occupancy — the sanity/skew view a pipeline operator
    * watches before trusting an LSH layout. */
  def bucketStats(embeddings: DataFrame): DataFrame =
    embeddings
      .groupBy(bucketKey(col("embedding")).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
}
