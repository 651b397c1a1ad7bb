package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Pin.PinnedOps

import graft.plans.CosineSimilarity

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three paths:
  *  - brute-force top-k: exact baseline. The query set is broadcast, so the
  *    corpus is scanned once with no shuffle of the embedding column — at
  *    100 TB this is one map stage + a per-query top-k.
  *  - LSH-bucketed: sign-bucket on the first 8 dimensions (axis-aligned
  *    hyperplanes — deterministic, engine-portable), then search only the
  *    query's bucket. The bucket key is 1 byte: the join shuffles only
  *    (bucket, id), never pairs the full corpus.
  *  - IVF: k-means coarse quantizer (trained once on a bounded sample,
  *    memoized as a model artifact), probe nProbe nearest cells.
  *
  * All three end in a per-query top-k. That top-k is NEVER a single window
  * over the raw scored rows partitioned by query_id — with a handful of
  * queries the whole scored corpus would sort in a handful of tasks.
  * Instead [[topKPerQuery]] pre-reduces to a local top-k inside
  * deterministic hash-salt buckets, then runs the global window over the
  * ≤ salts×k survivors per query.
  */
object Similarity {

  /** Exact per-query top-k of `scored` (query_id, neighbor_id,
    * cos_sim_raw): stage 1 keeps the top k within each of `salts`
    * deterministic hash buckets of neighbor_id (the global top-k is a
    * subset of the union of bucket top-ks — each global winner ranks ≤ k
    * in its own bucket); stage 2 ranks the ≤ salts×k survivors per query.
    * Stage 1's window has queries×salts partitions and bounded output, so
    * no task ever sorts a corpus-sized partition; the salt is
    * crc32(neighbor_id), not spark_partition_id, so results are
    * partitioning-independent and oracle-checkable. */
  private def topKPerQuery(scored: DataFrame, k: Int, salts: Int = 64): DataFrame = {
    val wLocal = Window
      .partitionBy(col("query_id"), pmod(crc32(col("neighbor_id").cast("string")), lit(salts)))
      .orderBy(col("cos_sim_raw").desc, col("neighbor_id"))
    val wGlobal = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim_raw").desc, col("neighbor_id"))
    scored
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= k)
      .withColumn("rank", row_number().over(wGlobal).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos_sim_raw"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Estimated scan width of `df`, read off the OPTIMIZED LOGICAL leaves —
    * deliberately not `df.rdd.getNumPartitions`, which builds a second
    * physical lineage and, under AQE (default-on in Spark 4), finalizing
    * that plan can eagerly execute upstream shuffle stages for non-scan
    * inputs. File relations estimate split count with FilePartition's own
    * arithmetic — (bytes + files·openCost) / maxPartitionBytes — so a
    * many-small-files corpus (whose per-file open cost is what forces
    * extra splits) is not misread as narrow. Range carries its slice
    * count. Only leaves PROVEN driver-local (LocalRelation,
    * OneRowRelation) count as narrow; any unrecognized leaf
    * (InMemoryRelation from .persist, DataSourceV2, stream relations) is
    * assumed WIDE, so no exchange is ever added on a guess — the caller's
    * contract is "never collapse an already-parallel input". */
  private def inputWidthEstimate(df: DataFrame, wideAt: Long): Long = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val conf = df.sparkSession.sessionState.conf
    df.queryExecution.optimizedPlan.collectLeaves().map {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          // bytes/maxPartitionBytes is a LOWER bound on the split count
          // (per-file open cost only adds splits), so a relation already
          // wide on bytes alone never touches the file listing — the
          // full-listing probe at a many-small-files 100 TB corpus is
          // exactly the case this short-circuit removes. Only a
          // small-on-bytes relation (≤ wideAt·maxPartitionBytes — a few
          // GB at defaults) pays the per-file arithmetic, and its listing
          // is already cached in the relation's FileIndex.
          val maxPB = math.max(1L, conf.filesMaxPartitionBytes)
          val bytesOnly = math.max(1L, fs.location.sizeInBytes / maxPB)
          if (bytesOnly >= wideAt) bytesOnly
          else {
            val nFiles = fs.location.inputFiles.length.toLong
            math.max(1L, (fs.location.sizeInBytes + nFiles * conf.filesOpenCostInBytes) / maxPB)
          }
        case _ => Long.MaxValue // non-file relation: assume wide, add no exchange
      }
      case r: org.apache.spark.sql.catalyst.plans.logical.Range =>
        r.numSlices.getOrElse(df.sparkSession.sparkContext.defaultParallelism).toLong
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => 1L
      case _: org.apache.spark.sql.catalyst.plans.logical.OneRowRelation => 1L
      case _ => Long.MaxValue // unknown leaf: assume wide, add no exchange
    }.maxOption.getOrElse(1L)
  }

  /** Spread a narrow input across the session's parallelism WITHOUT
    * collapsing an already-parallel scan: repartition only when the
    * input arrives with fewer partitions than
    * `sparkContext.defaultParallelism`. A 100 TB corpus scan arrives
    * with far more splits than cores, so no exchange is added and the
    * embedding column is never shuffled; a single-split local test file
    * widens so the broadcast-probe stage isn't single-threaded. */
  private def spreadToParallelism(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (inputWidthEstimate(df, wideAt = target) < target) df.repartition(target) else df
  }

  /** Exact brute-force cosine top-k for a small query set
    * (vec_id < nQueries), excluding self. */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val corpus = spreadToParallelism(embeddings)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sim_raw", CosineSimilarity.cosineFast(col("qe"), col("ne")))
    topKPerQuery(scored, k)
  }

  /** Sign-LSH bucket key: bit j set iff embedding[j] >= 0, j < 8.
    * try_element_at: a vector shorter than 8 dims (or a null element)
    * contributes no bit instead of an ANSI index error — degenerate rows
    * land in a bucket, they don't kill the scan. */
  private def bucketKey(emb: Column) =
    (0 until 8)
      .map(j => when(try_element_at(emb, lit(j + 1)) >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** LSH-bucketed ANN: candidates limited to the query's sign-bucket,
    * then exact cosine top-k within the bucket. Recall < 1 by design;
    * deterministic, so oracle-checkable. */
  def lshTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 3): DataFrame = {
    val bucketed = embeddings.select(
      col("vec_id"), col("embedding"), bucketKey(col("embedding")).as("bucket"))
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val scored = bucketed.join(broadcast(queries), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim_raw", CosineSimilarity.cosineFast(col("qe"), col("embedding")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim_raw"))
    topKPerQuery(scored, k)
  }

  /** Multi-probe LSH ANN: beyond the query's own sign-bucket, probe every
    * bucket at Hamming distance 1 (each of the 8 sign bits flipped). The
    * standard recall lever for bucketed LSH: a true neighbor that fell
    * just across ONE hyperplane is retrieved from the adjacent bucket, at
    * 9× bucket-scan cost instead of maintaining more hash tables.
    * Deterministic (bucket XOR 2^j), so fully oracle-checkable; candidate
    * volume stays ~9/256 of the corpus per query. */
  def lshMultiProbeTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 3): DataFrame = {
    val bucketed = embeddings.select(
      col("vec_id"), col("embedding"), bucketKey(col("embedding")).as("bucket"))
    val probeCols = array((lit(0L) +: (0 until 8).map(j => lit(1L << j))).map(m =>
      col("bucket").bitwiseXOR(m)): _*)
    val queries = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(probeCols).as("pb"))
    val scored = bucketed.join(broadcast(queries), col("bucket") === col("pb"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim_raw", CosineSimilarity.cosineFast(col("qe"), col("embedding")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim_raw"))
    topKPerQuery(scored, k)
  }

  /** Cap on the number of vectors the IVF quantizer trains on. An IVF
    * coarse quantizer needs a representative sample, not the corpus: at
    * 100 TB a full-corpus multi-pass k-means inside every query would
    * dominate the runtime (and did, in round 1's bench). */
  val IvfTrainSample = 10000

  /** Trained quantizers keyed by (canonicalized corpus plan, k): the
    * model is a tiny artifact (nCells × dim floats) reused across query
    * invocations in the same session — the batch analogue of persisting
    * the quantizer alongside the index. Keyed by the canonicalized plan
    * OBJECT (structural equality, data included) — a 32-bit plan hash
    * could collide and silently search with another corpus's centroids,
    * and a plan string under-distinguishes (LocalRelation.toString prints
    * only the schema). (Plain float arrays carry no session state, so
    * unlike the cluster cache no session scoping is needed.) */
  private val ivfModelCache =
    TrieMap[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), Array[Array[Float]]]()

  /** Spherical k-means, trained where a tiny model belongs: on the
    * driver, over a BOUNDED collected sample (≤ [[IvfTrainSample]] rows,
    * a few MB — this is a sample-sized model fit, not a driver-side loop
    * over the corpus). Round 1 ran distributed k-means over the full
    * corpus inside every query call: a dozen multi-pass cluster jobs for
    * arithmetic a single core finishes in milliseconds. Deterministic:
    * strided-sample init, fixed iteration count, sequential accumulation.
    * Cells are assigned by max cosine (spherical variant — the right
    * metric when the search scores by cosine); empty cells keep their
    * previous centroid. */
  private def trainQuantizer(embeddings: DataFrame, nCells: Int, iters: Int = 10): Array[Array[Float]] = {
    // deterministic sample: the smallest IvfTrainSample vec_ids (a
    // TakeOrderedAndProject — top-n, never a full sort). A bare
    // limit().collect() depends on partitioning/split order, making the
    // centroids (and every ivf_topk answer) run-to-run unstable.
    val sample: Array[Array[Double]] = embeddings
      .select(col("vec_id"), col("embedding"))
      // degenerate rows (null / empty vectors) carry no geometry — train
      // on the real ones instead of NPEing on Row.getSeq(null)
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .orderBy(col("vec_id")).limit(IvfTrainSample)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    if (sample.isEmpty) return Array.empty
    val n = sample.length
    val dim = sample.head.length
    val k = math.min(nCells, n)
    def cosArg(v: Array[Double], cents: Array[Array[Double]]): Int = {
      var best = 0; var bestScore = Double.MinValue
      var c = 0
      while (c < cents.length) {
        // ragged sample: vectors (and therefore centroids, which start as
        // cloned sample vectors) shorter than the head's dim contribute
        // zeros for their missing dimensions instead of indexing past the end
        val m = math.min(math.min(dim, v.length), cents(c).length)
        var dot = 0.0; var nc = 0.0; var nv = 0.0; var j = 0
        while (j < m) { dot += v(j) * cents(c)(j); nc += cents(c)(j) * cents(c)(j); nv += v(j) * v(j); j += 1 }
        val s = if (nc == 0 || nv == 0) -2.0 else dot / math.sqrt(nc * nv)
        if (s > bestScore) { bestScore = s; best = c }
        c += 1
      }
      best
    }
    var cents = Array.tabulate(k)(i => sample(((i.toLong * n) / k).toInt).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, dim)(0.0)
      val counts = Array.fill(k)(0L)
      sample.foreach { v =>
        val c = cosArg(v, cents)
        var j = 0; val m = math.min(dim, v.length)
        while (j < m) { sums(c)(j) += v(j); j += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(dim)(j => sums(c)(j) / counts(c))
      }
    }
    cents.map(_.map(_.toFloat))
  }

  /** Drop the memoized quantizers AND the oracle model slots
    * (benchmark hygiene — see [[graft.operators.Dedup.clearSessionState]]).
    * Resetting the slot maps lets a cleared session re-establish a
    * single-model state per slot and regain the full IVF oracle —
    * previously two trainings ever in a session degraded [[lastQuantizer]]
    * permanently, even across a full clear and retrain. Verify never
    * clears mid-run, so oracle generation still reads exactly the model
    * its queries searched with. */
  def clearSessionState(): Unit = synchronized {
    ivfModelCache.clear()
    quantSlots.clear()
    pqModelCache.clear()
    pqSlots.clear()
  }

  /** Oracle model slots, NAMED per corpus family: the quantizer (and PQ
    * books below) that a given slot's queries searched with this session.
    * Verify runs every query BEFORE dumping oracle SQL, so by the time
    * SparkEntry's oracle generators read a slot, it holds exactly the
    * model its queries searched with — letting the DuckDB oracle inline
    * the model and replicate assignment + probing bit-for-bit. Slots are
    * named so DISTINCT corpus families (the embeddings table vs the
    * hashed-TF document vectors) each keep a usable oracle — a single
    * global slot degraded to empty the moment a second corpus trained.
    * Within one slot the old guards hold: empty-corpus training never
    * overwrites a real model, and two distinct (corpus, nCells) keys in
    * the SAME slot report empty — the oracle then degrades to the
    * rows-only check instead of silently verifying against the wrong
    * centroids. */
  val DefaultSlot = "embeddings"
  private val quantSlots =
    TrieMap[String, (Set[Any], Array[Array[Float]])]()
  private val pqSlots =
    TrieMap[String, (Set[Any], Array[Array[Array[Float]]])]()

  def slotQuantizer(slot: String): Array[Array[Float]] =
    quantSlots.get(slot) match {
      case Some((keys, m)) if keys.size == 1 => m
      case _ => Array.empty
    }
  def lastQuantizer: Array[Array[Float]] = slotQuantizer(DefaultSlot)

  /** Train (or reuse the memoized) coarse quantizer for a corpus,
    * recording it in the named oracle slot. */
  def quantizerFor(embeddings: DataFrame, nCells: Int = 16,
                   slot: String = DefaultSlot): Array[Array[Float]] = {
    val planKey = embeddings.queryExecution.analyzed.canonicalized
    val m = ivfModelCache.getOrElseUpdate((planKey, nCells),
      graft.CacheBuild.timed(trainQuantizer(embeddings, nCells)))
    if (m.nonEmpty) synchronized {
      val keys = quantSlots.get(slot).map(_._1).getOrElse(Set.empty[Any])
      quantSlots(slot) = (keys + ((planKey, nCells)), m)
    }
    m
  }

  /** Persist the quantizer as a model ARTIFACT — a tiny (cell, centroid)
    * parquet table. At 100 TB the quantizer is trained once per corpus
    * snapshot and shipped with the index; search jobs load it instead of
    * retraining. Deterministic round-trip: cells keep their index and
    * floats travel as exact float32. */
  def saveQuantizer(embeddings: DataFrame, path: String, nCells: Int = 16,
                    slot: String = DefaultSlot): Unit = {
    val model = quantizerFor(embeddings, nCells, slot)
    val spark = embeddings.sparkSession
    import spark.implicits._
    model.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadQuantizer(spark: org.apache.spark.sql.SparkSession, path: String): Array[Array[Float]] =
    spark.read.parquet(path).orderBy("cell").collect()
      .map(_.getSeq[Float](1).toArray)

  /** IVF (inverted-file) ANN: a coarse quantizer partitions the corpus
    * into cells; each query probes only its `nProbe` nearest cells, then
    * scores candidates exactly. THE standard billion-vector layout: at
    * 100 TB the corpus is partitioned (and can be stored bucketed) by
    * cell, so a query touches nProbe/nCells of the data. The quantizer is
    * sample-trained and memoized ([[trainQuantizer]]); cell assignment is
    * one broadcast-centroid codegen map pass over the corpus — no
    * training jobs, no shuffle.
    * Oracle-checked: SparkEntry's ann_ivf_topk oracle inlines the
    * session-trained centroid table ([[lastQuantizer]]) into DuckDB SQL
    * that replicates assignment, probing, and top-k bit-for-bit; the
    * brute-force score-agreement test in OperatorSpec covers recall. */
  def ivfTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 3,
              nCells: Int = 16, nProbe: Int = 2): DataFrame =
    ivfTopKWith(embeddings, quantizerFor(embeddings, nCells), nQueries, k, nProbe)

  /** IVF search against a SUPPLIED quantizer (e.g. one loaded via
    * [[loadQuantizer]]) — the deployment path where the model artifact is
    * an input, not a per-query training job. */
  def ivfTopKWith(embeddings: DataFrame, model: Array[Array[Float]],
                  nQueries: Int = 5, k: Int = 3, nProbe: Int = 2): DataFrame = {
    if (model.isEmpty) {
      // empty corpus: nothing to index — emit the empty result with the
      // output schema instead of failing centroid construction
      import org.apache.spark.sql.types._
      return embeddings.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("query_id", LongType), StructField("neighbor_id", LongType),
          StructField("rank", LongType), StructField("cos_sim", DoubleType))))
    }

    // assignment: argmax cosine over the broadcast centroids, fully inside
    // whole-stage codegen (array of fused-cosine expressions + array_max)
    val assigned = assignCells(embeddings, model)
    val queries = embeddings.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val scored = assigned.join(broadcast(probedCells(queries, model, nProbe)), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim_raw", CosineSimilarity.cosineFast(col("qe"), col("embedding")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim_raw"))
    topKPerQuery(scored, k)
  }

  /** Adds the argmax-cosine quantizer `cell` column, preserving every
    * existing column — one broadcast-centroid codegen map pass, no
    * shuffle. Shared by the IVF family here and by
    * [[graft.operators.Dedup.semanticDedup]]'s cluster-scoped blocking. */
  private[operators] def withCell(df: DataFrame, model: Array[Array[Float]]): DataFrame = {
    val cosArr = array(model.map(c =>
      CosineSimilarity.cosineFast(col("embedding"), typedLit(c.toSeq))): _*)
    df.withColumn("cs__arr", cosArr)
      .withColumn("cell", (array_position(col("cs__arr"), array_max(col("cs__arr"))) - 1).cast("int"))
      .drop("cs__arr")
  }

  /** (vec_id, embedding, cell): each vector labeled with its argmax-cosine
    * quantizer cell. */
  private def assignCells(embeddings: DataFrame, model: Array[Array[Float]]): DataFrame =
    withCell(embeddings, model).select(col("vec_id"), col("embedding"), col("cell"))

  /** (query_id, qe, cell): each query paired with its `nProbe` nearest
    * quantizer cells by centroid cosine. */
  private def probedCells(queries: DataFrame, model: Array[Array[Float]], nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val centDf = model.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid")
    val wCell = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cell"))
    queries.crossJoin(broadcast(centDf))
      .withColumn("cdist", CosineSimilarity.cosineFast(col("qe"), col("centroid")))
      .withColumn("crk", row_number().over(wCell))
      .filter(col("crk") <= nProbe)
      .select(col("query_id"), col("qe"), col("cell"))
  }

  /** Materialize the full IVF index LAYOUT on storage: the quantizer
    * artifact (`<path>/quantizer`) plus the corpus parquet-PARTITIONED BY
    * assigned cell (`<path>/cells/cell=N/`). This is the billion-vector
    * layout the ivfTopK plan implies, made physical: once the corpus
    * lives partitioned by cell, a search probing nProbe of nCells reads
    * nProbe/nCells of the BYTES (directory-level partition pruning), not
    * just of the rows — at 100 TB the difference between scanning the
    * corpus per query batch and scanning a few percent of it. Write cost
    * is one assignment map pass + one shuffle-free partitioned write. */
  def saveIvfIndex(embeddings: DataFrame, path: String, nCells: Int = 16,
                   slot: String = DefaultSlot): Unit = {
    val model = quantizerFor(embeddings, nCells, slot)
    saveQuantizer(embeddings, s"$path/quantizer", nCells, slot)
    // one hash repartition on cell → one file per cell directory (the
    // compacted shape compactIvfIndex restores), instead of every input
    // task writing a sliver into every cell — tasks × nCells tiny files
    // whose commit cost dominated the fresh save
    assignCells(embeddings, model)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Grow the persisted IVF layout with NEW vectors — ingestion-time
    * index maintenance, the ANN mirror of
    * [[Dedup.appendToDedupIndex]]: assign each new vector to its cell
    * with the index's OWN quantizer artifact (never retrained — cell
    * geometry must stay fixed or the existing partitions lie) and append
    * into the cell partition tree. Each append costs one broadcast-
    * centroid map pass over the batch plus a partitioned write of the
    * batch — the corpus is never rewritten. Quantizer drift (a reference
    * distribution that moved) is a re-index decision, visible via
    * [[bucketStats]]-style cell occupancy, not something an append
    * should silently paper over.
    *
    * Schema evolution (see [[IndexSchemaException]]): the batch must
    * carry `vec_id` and `embedding`; added columns are ignored
    * (assignCells projects the canonical (vec_id, embedding, cell), so
    * the cell tree's file schemas never drift), a missing required
    * column throws the named contract error before any file lands. */
  def appendToIvfIndex(newVectors: DataFrame, path: String): Unit = {
    IndexSchema.requireColumns(newVectors, "ivf", Seq("vec_id", "embedding"))
    val model = loadQuantizer(newVectors.sparkSession, s"$path/quantizer")
    healPartialCells(newVectors.sparkSession, path) // see healPartialCells: appends heal first
    assignCells(newVectors, model)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("cell").parquet(s"$path/cells")
  }

  /** Compact the persisted IVF cell tree: every [[appendToIvfIndex]]
    * adds one file set per touched cell partition, so a long append
    * history turns each `cell=N/` directory into a pile of batch-sized
    * files and probed-cell scans pay per-file open cost instead of
    * sequential reads. One hash repartition on `cell` (each output task
    * then holds whole cells, so the partitioned write emits one file per
    * cell) rewrites the tree into a staging directory; the swap is two
    * filesystem renames, so a crash mid-compaction leaves the live tree
    * untouched. Also folds replayed-append duplicates (one row per
    * vec_id — replay rows are identical): unlike the dedup index, where
    * an anti-join can't see multiplicity, a duplicated vector RETURNS
    * TWICE in top-k, so at-least-once ingestion needs either an
    * idempotent (batchId-keyed) writer or a compaction before the next
    * search is trusted — compaction is the repair step, not just the
    * byte reclaim (spec-pinned in OperatorSpec). The quantizer artifact
    * is NOT touched: compaction reorganizes bytes, never geometry. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    rewriteCellTree(spark, path, identity)

  /** Consolidate shard-local vector indexes INTO `target` — the third
    * index family's member of the shard-merge story
    * ([[Dedup.mergeDedupIndexes]] documents the deployment shape). The
    * vector family is the one that does NOT row-merge: each shard
    * trains its own quantizer (and codebooks), so shard B's stored
    * cells/codes mean nothing under target's geometry. The correct
    * merge is RE-ENCODE-THROUGH-THE-TARGET: every source's stored raw
    * vectors (the cell tree carries (vec_id, embedding) precisely so
    * refine and rewrites never re-read the corpus) append through the
    * target's FROZEN quantizer — the frozen-geometry contract every
    * append already lives by — then one compaction restores
    * one-file-per-cell and folds duplicate vec_ids. Contract
    * (spec-pinned): merge(target ← sources) searches identically to the
    * target index with the sources' corpora appended batch-wise —
    * target geometry preserved, NEVER a retrain (re-indexing under new
    * geometry is an explicit decision, same rule as the appends).
    * Same doc_id discipline as the dedup merge: a vec_id two shards
    * both carry folds to one arbitrary row at the compaction, so shard
    * by vec_id (or accept the fold for identical vectors). Sources stay
    * untouched and readable throughout. */
  def mergeIvfIndexes(spark: org.apache.spark.sql.SparkSession, sources: Seq[String],
                      target: String): Unit =
    mergeCellTrees(spark, sources, target, appendToIvfIndex)

  /** PQ edition of [[mergeIvfIndexes]]: identical mechanics, with each
    * source's raw vectors re-encoded through the target's frozen
    * quantizer AND codebooks ([[appendToPqIndex]]). */
  def mergePqIndexes(spark: org.apache.spark.sql.SparkSession, sources: Seq[String],
                     target: String): Unit =
    mergeCellTrees(spark, sources, target, appendToPqIndex)

  private def mergeCellTrees(spark: org.apache.spark.sql.SparkSession, sources: Seq[String],
                             target: String, append: (DataFrame, String) => Unit): Unit = {
    require(sources.nonEmpty, "merge needs at least one source index")
    require(!sources.contains(target),
      s"merge target '$target' must not be a source — sources stay readable during the merge")
    sources.foreach { src =>
      healPartialCells(spark, src)
      append(spark.read.parquet(s"$src/cells").select(col("vec_id"), col("embedding")), target)
    }
    // fold cross-shard/replay duplicate vec_ids and restore the
    // one-file-per-cell layout in one rewrite
    compactIvfIndex(spark, target)
  }

  /** DELTA-MERGE removals into a persisted cell tree ([[saveIvfIndex]] /
    * [[savePqIndex]] — schema-agnostic like the compaction it rides):
    * drop every row whose vec_id appears in `removed` and rewrite the
    * tree. The vector half of [[Dedup.applyCorpusDiff]]'s contract — a
    * removed document's vectors must stop being returnable by ANY search
    * the moment the diff lands, not linger until a re-index. CHANGED
    * vectors are remove + [[appendToIvfIndex]]/[[appendToPqIndex]] of the
    * new rows (the frozen-geometry contract means a changed vector is
    * just a remove plus an ordinary append). Cost: one cell-tree rewrite
    * — identical to a compaction, whose replay-fold it also performs
    * (rows are anti-joined against a diff-sized relation, never paired).
    * The quantizer/codebook artifacts are untouched: removal changes
    * occupancy, never geometry. */
  def removeFromIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                         removed: DataFrame): Unit = {
    val gone = removed.select(col("vec_id")).distinct().pinned()
    healPartialCells(spark, path)
    val live = new org.apache.hadoop.fs.Path(s"$path/cells")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nCells =
      if (!fs.exists(live)) 0
      else fs.listStatus(live).count(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
    val goneCount = gone.count()
    // TOUCHED-CELL pruning (the IVF edition of the bucketed tables'
    // touched-bucket swap): locate the cells actually holding doomed
    // vectors with one column-pruned (vec_id, cell) scan, then rewrite
    // ONLY those cell directories — the rest of the tree is never read
    // or written. Same coupon-collector gate as the other families: a
    // doomed set much larger than the cell count touches everything.
    val affected: Option[Set[String]] =
      if (nCells == 0 || goneCount >= nCells.toLong * 16) None
      else {
        val a = spark.read.parquet(live.toString)
          .join(broadcast(gone), Seq("vec_id"), "left_semi")
          .select(col("cell").cast("string")).distinct()
          .collect().map(r => s"cell=${r.getString(0)}").toSet
        if (a.size >= nCells) None else Some(a)
      }
    affected match {
      case Some(a) if a.isEmpty => () // nothing present: replay / absent ids
      case Some(a) =>
        partialRewriteCells(spark, path, a, _.join(gone, Seq("vec_id"), "left_anti"))
      case None =>
        rewriteCellTree(spark, path, _.join(gone, Seq("vec_id"), "left_anti"))
    }
  }

  /** Marker a partial cell rewrite writes into its staged tree AFTER the
    * staged write completes and BEFORE any live directory moves: one
    * `<dirName>:<1|0>` line per affected cell (0 = the cell emptied, its
    * removal IS the swap). Heal resumes FORWARD from it. */
  private[graft] val CellMarker = "_GRAFT_PARTIAL_CELLS"

  /** Resume (or clear) a crashed partial cell swap. Called at every
    * cell-tree verb entry — rewrites, removals, appends: an append that
    * recreated a mid-swap cell directory before heal ran would lose its
    * rows to the resumed move, so append verbs heal first too. */
  private[graft] def healPartialCells(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$path/cells")
    val staged = new org.apache.hadoop.fs.Path(s"$path/cells__pstaged")
    val pold = new org.apache.hadoop.fs.Path(s"$path/cells__pold")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(staged, CellMarker)
    if (fs.exists(marker)) {
      // marker present ⇒ the staged content is complete: finish the
      // per-cell swaps exactly as the crashed run would have (idempotent
      // — already-moved cells are simply absent from their source)
      val in = fs.open(marker)
      val entries =
        try scala.io.Source.fromInputStream(in).getLines()
          .filter(_.nonEmpty).map { l =>
            val i = l.lastIndexOf(':'); (l.substring(0, i), l.substring(i + 1) == "1")
          }.toSeq
        finally in.close()
      finishCellMoves(fs, live, staged, pold, entries)
    }
    // debris without (or after) a marker: a crash before the marker never
    // touched the live tree; a finished resume leaves only empty shells
    fs.delete(staged, true)
    fs.delete(pold, true)
    ()
  }

  private def finishCellMoves(fs: org.apache.hadoop.fs.FileSystem,
                              live: org.apache.hadoop.fs.Path,
                              staged: org.apache.hadoop.fs.Path,
                              pold: org.apache.hadoop.fs.Path,
                              entries: Seq[(String, Boolean)]): Unit = {
    fs.mkdirs(pold)
    for ((dirName, hasStaged) <- entries) {
      val liveDir = new org.apache.hadoop.fs.Path(live, dirName)
      val stagedDir = new org.apache.hadoop.fs.Path(staged, dirName)
      if (hasStaged) {
        if (fs.exists(stagedDir)) { // not yet swapped in
          if (fs.exists(liveDir) &&
              !fs.rename(liveDir, new org.apache.hadoop.fs.Path(pold, dirName)))
            sys.error(s"partial cell swap: could not stage out $liveDir")
          if (!fs.rename(stagedDir, liveDir))
            sys.error(s"partial cell swap: could not swap in $stagedDir")
        } // else: this cell's swap already completed
      } else {
        // the cell emptied: staging it out IS the swap
        if (fs.exists(liveDir) &&
            !fs.rename(liveDir, new org.apache.hadoop.fs.Path(pold, dirName)))
          sys.error(s"partial cell swap: could not remove emptied $liveDir")
      }
    }
  }

  /** TOUCHED-CELL staged rewrite: rewrite only `affectedDirs`
    * (`cell=<v>` directory names); every other cell directory is never
    * read, written, or moved. Per-cell swap via a resumable marker
    * protocol ([[healPartialCells]]): the staged tree is written
    * completely first, so a crash anywhere in the move window heals
    * FORWARD at the next verb entry. */
  private[graft] def partialRewriteCells(spark: org.apache.spark.sql.SparkSession, path: String,
                                  affectedDirs: Set[String],
                                  canon: DataFrame => DataFrame): Unit = {
    val live = new org.apache.hadoop.fs.Path(s"$path/cells")
    val staged = new org.apache.hadoop.fs.Path(s"$path/cells__pstaged")
    val pold = new org.apache.hadoop.fs.Path(s"$path/cells__pold")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(staged, true)
    fs.delete(pold, true)
    // read ONLY the affected cell directories (basePath keeps the cell
    // partition column); replay-fold + canon exactly like the full path
    val dirs = affectedDirs.toSeq.sorted.map(d => s"$live/$d")
    canon(spark.read.option("basePath", live.toString).parquet(dirs: _*)
        .dropDuplicates("vec_id"))
      .repartition(col("cell"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cell").parquet(staged.toString)
    val entries = affectedDirs.toSeq.sorted.map { d =>
      d -> fs.exists(new org.apache.hadoop.fs.Path(staged, d))
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(staged, CellMarker), true)
    try out.write(entries.map { case (d, h) => s"$d:${if (h) 1 else 0}" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    finishCellMoves(fs, live, staged, pold, entries)
    fs.delete(staged, true)
    fs.delete(pold, true)
    spark.catalog.refreshByPath(live.toString)
  }

  /** The staged rewrite-and-swap [[compactIvfIndex]] and
    * [[removeFromIvfIndex]] share: dedupe replayed appends, apply the
    * caller's transform, rewrite one file per cell, then swap via two
    * filesystem renames so a crash mid-rewrite leaves the live tree
    * untouched. */
  private def rewriteCellTree(spark: org.apache.spark.sql.SparkSession, path: String,
                              canon: DataFrame => DataFrame): Unit = {
    healPartialCells(spark, path) // a crashed partial swap leaves moved-out cells
    val live = new org.apache.hadoop.fs.Path(s"$path/cells")
    val staged = new org.apache.hadoop.fs.Path(s"$path/cells__compact")
    val old = new org.apache.hadoop.fs.Path(s"$path/cells__old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    canon(spark.read.parquet(live.toString).dropDuplicates("vec_id"))
      .repartition(col("cell"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cell").parquet(staged.toString)
    fs.delete(old, true)
    if (!fs.rename(live, old)) sys.error(s"rewriteCellTree: could not stage out $live")
    if (!fs.rename(staged, live)) {
      fs.rename(old, live) // roll back: the un-rewritten tree is still valid
      sys.error(s"rewriteCellTree: could not swap in $staged")
    }
    fs.delete(old, true)
    // drop any session-cached file listing for the live path: the shared
    // FileStatusCache keys by path, and the swap changed every file under it
    spark.catalog.refreshByPath(live.toString)
  }

  /** Per-cell occupancy of a corpus under a quantizer: vector count and
    * integer-ppm share per assigned cell. THE quantizer-drift /
    * skew monitor for an IVF layout: a cell whose share balloons means
    * the reference distribution moved since training (searches probing
    * that cell degrade toward brute force — the signal to re-index), and
    * at write time it is the partition-size forecast for
    * [[saveIvfIndex]]. Assignment is the same broadcast-centroid codegen
    * map pass the search paths use — one scan, nCells-bounded output, no
    * shuffle beyond the final tiny aggregate. Deterministic given the
    * centroids, so fully oracle-checkable (the DuckDB twin inlines the
    * session's quantizer and replicates argmax assignment bit-for-bit,
    * like ann_ivf_topk). */
  def cellStats(embeddings: DataFrame, nCells: Int = 16): DataFrame =
    cellStatsWith(embeddings, quantizerFor(embeddings, nCells))

  def cellStatsWith(embeddings: DataFrame, model: Array[Array[Float]]): DataFrame = {
    if (model.isEmpty) {
      import org.apache.spark.sql.types._
      return embeddings.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("cell", LongType), StructField("n", LongType),
          StructField("share_ppm", LongType))))
    }
    // the share window runs over the AGGREGATED rows — ≤ nCells of them,
    // a model-sized relation, so the single-partition window is bounded
    // by construction (same class as the probed-cell collect)
    assignCells(embeddings, model)
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over())
      .select(col("cell"), col("n").cast("long").as("n"),
        expr("(n * 1000000) div total").as("share_ppm"))
      .orderBy("cell")
  }

  /** [[cellStats]] read off a PERSISTED index ([[saveIvfIndex]]) — the
    * deployed drift monitor [[appendToIvfIndex]]'s contract promises:
    * occupancy comes from the cell tree's own partition column (a
    * column-pruned scan of the partition value only — no embedding bytes
    * read, no re-assignment), so it prices exactly what searches will
    * touch, appends included. */
  def ivfIndexCellStats(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/cells")
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over())
      .select(col("cell"), col("n").cast("long").as("n"),
        expr("(n * 1000000) div total").as("share_ppm"))
      .orderBy("cell")

  /** IVF search against the PERSISTED index layout ([[saveIvfIndex]]):
    * loads the quantizer artifact, probes each query's `nProbe` cells,
    * and scans ONLY those cells' partitions — the probed cell set (≤
    * nCells ints, a model-sized value, not a corpus collect) becomes a
    * static partition filter, so pruning happens at the file-listing
    * level (asserted in OperatorSpec). `queries` needs
    * (query_id, embedding). */
  def ivfSearchIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, k: Int = 3, nProbe: Int = 2): DataFrame = {
    val model = loadQuantizer(spark, s"$path/quantizer")
    val corpus = spark.read.parquet(s"$path/cells")
    val q = queries.select(col("query_id"), col("embedding").as("qe"))
    val probed = probedCells(q, model, nProbe)
    val cellsToRead = probed.select(col("cell")).distinct().collect().map(_.getInt(0)).sorted
    val scored = corpus.filter(col("cell").isin(cellsToRead.map(Integer.valueOf): _*))
      .join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim_raw", CosineSimilarity.cosineFast(col("qe"), col("embedding")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim_raw"))
    topKPerQuery(scored, k)
  }

  // ------------------------------------------------------------------
  // Product quantization (IVF-PQ): the memory side of billion-vector ANN
  // ------------------------------------------------------------------

  /** PQ geometry: `PqSubspaces` subvectors of `PqSubDim` dims each (8×8
    * over the 64-dim embeddings), `PqCodes` centroids per subspace — one
    * byte-sized code per subspace, so a vector compresses 64×4 B →
    * `PqSubspaces` B (32×). At 100 TB of embeddings this is the
    * difference between an index that fits in cluster memory and one
    * that lives on disk: IVF prunes which vectors a query LOOKS AT,
    * PQ shrinks what looking at a vector COSTS (a scan of 8-byte code
    * rows, not 256-byte float rows; the full-precision vectors are only
    * touched to re-rank the top `PqRefine` ADC candidates). */
  val PqSubspaces = 8
  val PqSubDim = 8
  val PqCodes = 16

  /** Exact re-ranks per query: the PQ quality dial. ADC ranks by a
    * LOSSY score, so the refine cut must be generously wider than k —
    * at 16-point codebooks over near-isotropic synthetic vectors the
    * ADC ordering is noisy enough that an 8-wide cut measurably lost
    * true top-3 neighbors (recall@3 0.53 on the sf corpus); 32 (≈10×k,
    * the conventional IVF-PQ re-rank ratio) restores it while still
    * touching a bounded full-precision row set. */
  val PqRefine = 32

  /** Trained PQ codebooks keyed by canonicalized corpus plan —
    * `[subspace][code][dim]`, a 8×16×8-float model. Same caching/oracle
    * discipline as the coarse quantizer ([[ivfModelCache]] /
    * [[quantSlots]]): plan-object keys, named oracle slots, and a slot
    * degrades to empty the moment two distinct corpora train into it. */
  private val pqModelCache =
    TrieMap[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Array[Array[Array[Float]]]]()
  def slotPqBooks(slot: String): Array[Array[Array[Float]]] =
    pqSlots.get(slot) match {
      case Some((keys, m)) if keys.size == 1 => m
      case _ => Array.empty
    }
  def lastPqBooks: Array[Array[Array[Float]]] = slotPqBooks(DefaultSlot)

  /** Per-subspace Euclidean k-means on the driver over the same bounded
    * deterministic sample as [[trainQuantizer]] (strided init, fixed
    * iterations, sequential accumulation — a model-sized fit, not a
    * corpus job). Euclidean, not spherical: PQ approximates the DOT
    * CONTRIBUTION of each subvector, and squared-L2 reconstruction error
    * is the standard (and here sufficient) codebook objective. */
  private def trainPqBooks(embeddings: DataFrame): Array[Array[Array[Float]]] = {
    val dim = PqSubspaces * PqSubDim
    val sample: Array[Array[Double]] = embeddings
      .select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull && size(col("embedding")) === dim)
      .orderBy(col("vec_id")).limit(IvfTrainSample)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    if (sample.isEmpty) return Array.empty
    val n = sample.length
    val k = math.min(PqCodes, n)
    Array.tabulate(PqSubspaces) { m =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, m * PqSubDim, (m + 1) * PqSubDim))
      var cents = Array.tabulate(k)(i => sub(((i.toLong * n) / k).toInt).clone())
      def nearest(v: Array[Double]): Int = {
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cents.length) {
          var d = 0.0; var j = 0
          while (j < PqSubDim) { val t = v(j) - cents(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
      for (_ <- 0 until 10) {
        val sums = Array.fill(k, PqSubDim)(0.0)
        val counts = Array.fill(k)(0L)
        sub.foreach { v =>
          val c = nearest(v)
          var j = 0; while (j < PqSubDim) { sums(c)(j) += v(j); j += 1 }
          counts(c) += 1
        }
        cents = Array.tabulate(k) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(PqSubDim)(j => sums(c)(j) / counts(c))
        }
      }
      cents.map(_.map(_.toFloat))
    }
  }

  def pqBooksFor(embeddings: DataFrame,
                 slot: String = DefaultSlot): Array[Array[Array[Float]]] = {
    val planKey = embeddings.queryExecution.analyzed.canonicalized
    val m = pqModelCache.getOrElseUpdate(planKey,
      graft.CacheBuild.timed(trainPqBooks(embeddings)))
    if (m.nonEmpty) synchronized {
      val keys = pqSlots.get(slot).map(_._1).getOrElse(Set.empty[Any])
      pqSlots(slot) = (keys + planKey, m)
    }
    m
  }

  /** `array<int>` of per-subspace codes for the `embedding` column —
    * the native [[graft.plans.PqEncode]] expression (argmin squared-L2,
    * ties to the LOWEST code, matching the oracle's row_number). The
    * pure-builtin array/array_min/array_position formulation this
    * replaced expanded to ~1024 expression leaves per row and measured
    * 21 s where the IVF sibling runs 2 s — see PqEncode's scaladoc. */
  private def pqCodesCol(books: Array[Array[Array[Float]]]): Column =
    graft.plans.PqEncode.codes(col("embedding"), books)

  /** Probe cells + ADC/norm lookup tables for a BOUNDED query set,
    * computed on the DRIVER — the query-side twin of the
    * [[graft.plans.PqEncode]] lesson. The per-query ADC tables are
    * model-derived lookup values (8 subspaces × 16 codes × 8-term dot
    * chains); expressed as Column arithmetic they expand to a ~2k-node
    * expression forest whose Janino compile dominated the whole search
    * (pqSearchIndexed measured 6.5 s on a 5000-row index — nearly all
    * fixed plan cost, none of it data). The query set is broadcast-sized
    * by contract (it rides a broadcast join either way), so collecting
    * it and building the tables host-side — exactly where FAISS computes
    * ADC tables — replaces the forest AND the probe-window job with
    * (nQueries × nCells) floating-point ops.
    *
    * Numeric contract unchanged: every sum below is the same strict
    * left-to-right double chain as the Column expressions it replaces
    * (and as the oracle's ordered list_sum); probing replicates
    * [[CosineSimilarity]]'s single-pass accumulator and the
    * `ORDER BY cd DESC, cell` tie-break (Double.compare — NaN greatest,
    * like both engines; −0.0 normalized). Degenerate query rows (null /
    * wrong-dim vectors) are DROPPED — the same stance the corpus side
    * takes with its full-dim filter.
    *
    * Returns the (query_id, qe, cell, t, nt) relation to broadcast-join
    * on `cell`, plus the sorted probed-cell list for partition pruning
    * (no extra distinct-collect job). */
  private def pqQueryTables(spark: org.apache.spark.sql.SparkSession,
                            queries: DataFrame,
                            model: Array[Array[Float]],
                            books: Array[Array[Array[Float]]],
                            nProbe: Int): (DataFrame, Array[Int]) = {
    import org.apache.spark.sql.types._
    val dim = PqSubspaces * PqSubDim
    val qRows = queries.collect()
      .filter(r => !r.isNullAt(1) && r.getSeq[Float](1) != null)
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .filter(_._2.length == dim)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      // CosineSimilarity.nullSafeEval's exact loop
      val n = math.min(a.length, b.length)
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dp += x * y; na += x * x; nb += y * y; i += 1
      }
      dp / math.sqrt(na * nb)
    }
    val nt: Seq[Seq[Double]] = books.toSeq.map(_.toSeq.map(c =>
      (0 until PqSubDim).map { d => val v = c(d).toDouble; v * v }.reduce(_ + _)))
    val rows = qRows.flatMap { case (qid, qe) =>
      val cds = model.map { c => val cd = cos(qe, c); if (cd == 0.0) 0.0 else cd }
      val probes = model.indices.toArray.sortWith { (a, b) =>
        val cmp = java.lang.Double.compare(cds(a), cds(b))
        if (cmp != 0) cmp > 0 else a < b
      }.take(nProbe)
      val t: Seq[Seq[Double]] = books.indices.map(m => books(m).indices.map(j =>
        (0 until PqSubDim).map(d =>
          qe(m * PqSubDim + d).toDouble * books(m)(j)(d).toDouble).reduce(_ + _)))
      probes.map(c => org.apache.spark.sql.Row(qid, qe.toSeq, c, t, nt))
    }
    val schema = StructType(Seq(
      StructField("query_id", LongType),
      StructField("qe", ArrayType(FloatType)),
      StructField("cell", IntegerType),
      StructField("t", ArrayType(ArrayType(DoubleType))),
      StructField("nt", ArrayType(ArrayType(DoubleType)))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    (df, rows.map(_.getInt(2)).distinct.sorted)
  }

  /** ADC approximate-cosine columns over a [[pqQueryTables]] join: the
    * candidate's stored code indexes each subspace's table — two
    * element_at lookups per subspace, left-to-right sum (the bit-exact
    * successor of the inline table expressions). */
  private def adcDotCol: Column =
    (0 until PqSubspaces).map(m =>
      element_at(element_at(col("t"), m + 1), element_at(col("codes"), m + 1) + 1))
      .reduce(_ + _)
  private def adcNormCol: Column =
    (0 until PqSubspaces).map(m =>
      element_at(element_at(col("nt"), m + 1), element_at(col("codes"), m + 1) + 1))
      .reduce(_ + _)

  /** IVF-PQ ANN: coarse-quantizer cell probing (identical to
    * [[ivfTopK]] — SAME memoized quantizer, so adding PQ to a session
    * never degrades the IVF oracle) + product-quantized asymmetric
    * scoring + exact re-rank of the top [[PqRefine]] ADC candidates.
    * The approximate score of candidate x for query q is
    * Σ_m dot(q_m, codebook_m[code_m(x)]) — an 8-entry table lookup per
    * subspace instead of a 64-dim float scan, computed here with
    * element_at over the broadcast per-query ADC tables (all codegen'd
    * builtins, no UDF). Refine then scores ONLY `refine` candidates per
    * query with the exact fused cosine, so full-precision vectors leave
    * storage for a bounded row set. Both stages use the salted two-stage
    * top-k, so no window ever spans a whole cell's candidates in one
    * partition. Deterministic end to end (codes, tables, and tie-breaks
    * are pure arithmetic) — the DuckDB oracle inlines quantizer AND
    * codebooks and replicates encoding, ADC, refine, and re-rank
    * bit-for-bit. Recall vs exact brute force is property-tested in
    * OperatorSpec, not assumed. */
  def pqTopK(embeddings: DataFrame, nQueries: Int = 5, k: Int = 3,
             nCells: Int = 16, nProbe: Int = 2, refine: Int = PqRefine): DataFrame = {
    val dim = PqSubspaces * PqSubDim
    val model = quantizerFor(embeddings, nCells)
    val books = pqBooksFor(embeddings)
    if (model.isEmpty || books.isEmpty) {
      import org.apache.spark.sql.types._
      return embeddings.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("query_id", LongType), StructField("neighbor_id", LongType),
          StructField("rank", LongType), StructField("cos_sim", DoubleType))))
    }
    // full-dim vectors only: a short/degenerate vector has no meaningful
    // PQ code (the oracle applies the identical len filter)
    val full = embeddings.filter(size(col("embedding")) === dim)
    val coded = withCell(full, model)
      .select(col("vec_id"), col("embedding"), col("cell"),
        pqCodesCol(books).as("codes"))
    val queries = full.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val (qTabs, _) = pqQueryTables(embeddings.sparkSession, queries, model, books, nProbe)
    val wLocal = Window
      .partitionBy(col("query_id"), pmod(crc32(col("vec_id").cast("string")), lit(64)))
      .orderBy(col("adc").desc, col("vec_id"))
    val wGlobal = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    val refined = coded.join(broadcast(qTabs), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      // approximate COSINE: all-zero reconstructions rank last (-2, the
      // same sentinel the quantizer's cosArg uses), never divide by zero
      .withColumn("adc",
        when(adcNormCol > 0, adcDotCol / sqrt(adcNormCol)).otherwise(lit(-2.0)))
      .withColumn("lrk", row_number().over(wLocal)).filter(col("lrk") <= refine)
      .withColumn("ark", row_number().over(wGlobal)).filter(col("ark") <= refine)
      .withColumn("cos_sim_raw", CosineSimilarity.cosineFast(col("qe"), col("embedding")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim_raw"))
    topKPerQuery(refined, k)
  }

  /** Materialize the PQ index LAYOUT: quantizer + codebooks as model
    * artifacts, and the corpus cell-PARTITIONED with its PQ codes stored
    * NEXT TO the full-precision vectors in one parquet table. Parquet is
    * columnar, so the two access patterns each read only their bytes:
    * the ADC scoring scan projects (vec_id, codes) — ~9 bytes of row
    * instead of 256+ (the 32× compression realized as scanned bytes, not
    * just as a number in a docstring; plan-asserted in OperatorSpec) —
    * and the refine fetch projects (vec_id, embedding) for ONLY the
    * bounded refine cut's rows inside probed cells. Same cell-tree
    * mechanics as [[saveIvfIndex]], so [[compactIvfIndex]] compacts this
    * layout unchanged (schema-agnostic: it rewrites whole cells). */
  def savePqIndex(embeddings: DataFrame, path: String, nCells: Int = 16,
                  slot: String = DefaultSlot): Unit = {
    val dim = PqSubspaces * PqSubDim
    val model = quantizerFor(embeddings, nCells, slot)
    val books = pqBooksFor(embeddings, slot)
    saveQuantizer(embeddings, s"$path/quantizer", nCells, slot)
    savePqBooks(embeddings.sparkSession, books, s"$path/books")
    withCell(embeddings.filter(size(col("embedding")) === dim), model)
      .select(col("vec_id"), col("embedding"),
        pqCodesCol(books).as("codes"),
        col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  def savePqBooks(spark: org.apache.spark.sql.SparkSession,
                  books: Array[Array[Array[Float]]], path: String): Unit = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (b, m) =>
      b.zipWithIndex.map { case (c, j) => (m, j, c.toSeq) }
    }.toSeq.toDF("subspace", "code", "sub")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPqBooks(spark: org.apache.spark.sql.SparkSession, path: String): Array[Array[Array[Float]]] = {
    val rows = spark.read.parquet(path).orderBy("subspace", "code").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toArray).toArray
  }

  /** Ingestion-time growth of the persisted PQ layout: encode the batch
    * with the index's OWN frozen quantizer AND codebooks (retraining
    * either would invalidate every stored code/cell — the same geometry
    * contract as [[appendToIvfIndex]]) and append into the cell tree.
    * Distribution drift shows up in [[pqCodeStats]]-style occupancy, and
    * re-indexing is an explicit decision, never an implicit retrain.
    * Same schema-evolution contract as [[appendToIvfIndex]]
    * ([[IndexSchemaException]]): requires `vec_id` + `embedding`,
    * ignores added columns via the canonical projection below. */
  def appendToPqIndex(newVectors: DataFrame, path: String): Unit = {
    IndexSchema.requireColumns(newVectors, "ivf-pq", Seq("vec_id", "embedding"))
    val dim = PqSubspaces * PqSubDim
    val spark = newVectors.sparkSession
    val model = loadQuantizer(spark, s"$path/quantizer")
    val books = loadPqBooks(spark, s"$path/books")
    healPartialCells(spark, path) // see healPartialCells: appends heal first
    withCell(newVectors.filter(size(col("embedding")) === dim), model)
      .select(col("vec_id"), col("embedding"),
        pqCodesCol(books).as("codes"),
        col("cell"))
      // one file per touched cell per append, not tasks × cells (the
      // dedup/postings appends' small-file discipline, cell-tree edition)
      .repartition(col("cell"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("cell").parquet(s"$path/cells")
  }

  /** IVF-PQ search against the PERSISTED layout ([[savePqIndex]]):
    * probed-cell partition pruning (static isin filter, like
    * [[ivfSearchIndexed]]) + stored-code ADC scoring on a scan that
    * projects NO embedding bytes + exact re-rank that fetches
    * full-precision vectors only for the refine cut. `queries` needs
    * (query_id, embedding). Result-identical to [[pqTopK]] over the same
    * corpus and models (spec-pinned). */
  def pqSearchIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, k: Int = 3, nProbe: Int = 2,
                      refine: Int = PqRefine): DataFrame = {
    val model = loadQuantizer(spark, s"$path/quantizer")
    val books = loadPqBooks(spark, s"$path/books")
    val corpus = spark.read.parquet(s"$path/cells")
    val q = queries.select(col("query_id"), col("embedding").as("qe"))
    val (qTabs, cellsToRead) = pqQueryTables(spark, q, model, books, nProbe)
    val pruned = corpus.filter(col("cell").isin(cellsToRead.map(Integer.valueOf): _*))
    val wLocal = Window
      .partitionBy(col("query_id"), pmod(crc32(col("vec_id").cast("string")), lit(64)))
      .orderBy(col("adc").desc, col("vec_id"))
    val wGlobal = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    // ADC stage: codes only — the scan this plan pays for the whole cell
    val cut = pruned.select(col("vec_id"), col("codes"), col("cell"))
      .join(broadcast(qTabs), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc",
        when(adcNormCol > 0, adcDotCol / sqrt(adcNormCol)).otherwise(lit(-2.0)))
      .withColumn("lrk", row_number().over(wLocal)).filter(col("lrk") <= refine)
      .withColumn("ark", row_number().over(wGlobal)).filter(col("ark") <= refine)
      .select(col("query_id"), col("qe"), col("vec_id"))
    // refine fetch: full vectors for the bounded cut only (broadcast the
    // cut, scan stays pruned to probed cells)
    val refined = pruned.select(col("vec_id"), col("embedding"))
      .join(broadcast(cut), Seq("vec_id"))
      .withColumn("cos_sim_raw", CosineSimilarity.cosineFast(col("qe"), col("embedding")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim_raw"))
    topKPerQuery(refined, k)
  }

  /** Per-(subspace, code) occupancy of the PQ codebooks over a corpus —
    * the PQ mirror of [[cellStats]]: a code whose share collapses to
    * zero (dead centroid) or balloons (distribution drift since
    * training) is the re-train signal for that subspace's book. One
    * encode map pass, 8×16-bounded output. */
  def pqCodeStats(embeddings: DataFrame): DataFrame = {
    val dim = PqSubspaces * PqSubDim
    val books = pqBooksFor(embeddings)
    if (books.isEmpty) {
      import org.apache.spark.sql.types._
      return embeddings.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("subspace", LongType), StructField("code", LongType),
          StructField("n", LongType), StructField("share_ppm", LongType))))
    }
    embeddings.filter(size(col("embedding")) === dim)
      .select(posexplode(pqCodesCol(books))
        .as(Seq("subspace", "code")))
      .groupBy(col("subspace").cast("long").as("subspace"), col("code").cast("long").as("code"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy(col("subspace"))))
      .select(col("subspace"), col("code"), col("n").cast("long").as("n"),
        expr("(n * 1000000) div total").as("share_ppm"))
      .orderBy("subspace", "code")
  }

  /** Per-bucket norm statistics: vector count plus min/max L2 norm per
    * sign-bucket — the embedding-health view (zero/degenerate vectors,
    * norm drift across buckets) a pipeline checks before trusting cosine
    * scores. min/max over per-vector rounded norms are order-independent,
    * so the result is exact and engine-portable; one scan, one bounded
    * aggregation, the 100 TB shape. */
  def normStats(embeddings: DataFrame): DataFrame =
    embeddings
      .select(bucketKey(col("embedding")).as("bucket"),
        round(sqrt(graft.plans.DotProduct.dot(col("embedding"), col("embedding"))), 4).as("nrm"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"))
      .orderBy("bucket")

  /** INT8 scalar quantization audit — the memory half of the vector
    * story BETWEEN full floats and [[pqTopK]]'s product quantization:
    * per-dimension min/max affine uint8 codes give 4× scan-byte
    * compression with near-zero ranking loss, and this operator reports
    * exactly how much loss ("near-zero" is a claim; the per-label
    * reconstruction-error table is the measurement a deployment gates
    * on before switching its re-rank tier to codes).
    *
    * Determinism discipline: the per-ELEMENT error is rounded to integer
    * micro-units FIRST and only integers are ever summed — per-element
    * IEEE double arithmetic is bit-identical in any engine, and integer
    * sums are order-independent, so the result is exact cross-engine
    * with no ordered-float-sum machinery (the [[pqTopK]] oracles need
    * left-to-right list folds; this metric is DEFINED to not).
    *
    * Scale shape: one posexplode pass to the per-dimension min/max (a
    * dim-sized MODEL aggregate, collected like the IVF centroid table),
    * then one scan computing codes + errors entirely inside per-row
    * expressions (no shuffle), and a label-bounded final aggregate. */
  def int8QuantStats(embeddings: DataFrame): DataFrame = {
    val dims = embeddings
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy("pos")
      .collect()  // dim rows — a bounded model artifact, never corpus-sized
    val minsL = typedLit(dims.map(_.getDouble(1)).toSeq)
    val maxsL = typedLit(dims.map(_.getDouble(2)).toSeq)
    val errs = zip_with(
      col("embedding").cast("array<double>"),
      typedLit(dims.indices.toList),
      (x, i) => {
        val mn = element_at(minsL, i + 1)
        val mx = element_at(maxsL, i + 1)
        val span = mx - mn
        val code = when(span === 0d, lit(0L))
          .otherwise(floor((x - mn) * lit(255.0) / span + lit(0.5)))
        val recon = mn + code * span / lit(255.0)
        floor(abs(x - recon) * lit(1000000.0) + lit(0.5)).cast("long")
      })
    embeddings
      .select(col("label"), aggregate(errs, lit(0L), (acc, e) => acc + e).as("err_micro"))
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).cast("long").as("n_vecs"),
        sum(col("err_micro")).cast("long").as("sum_err_micro"),
        max(col("err_micro")).cast("long").as("max_err_micro"))
      .orderBy("label")
  }

  /** Per-bucket occupancy — the sanity/skew view a pipeline operator
    * watches before trusting an LSH layout. */
  def bucketStats(embeddings: DataFrame): DataFrame =
    embeddings
      .groupBy(bucketKey(col("embedding")).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** Recall of `approx` against `exact` per query: how many of the
    * exact top-k survive in the approximate top-k. Both inputs are
    * `topKPerQuery`-shaped (query_id, neighbor_id, rank, …); output is
    * all-integer (hits + recall ppm), so the gate hashes cross-engine
    * even where the underlying scores are floats. */
  private def recallAgainst(exact: DataFrame, approx: DataFrame, k: Int): DataFrame =
    exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id").as("aq"), col("neighbor_id").as("an")),
        col("query_id") === col("aq") && col("neighbor_id") === col("an"), "left_outer")
      .groupBy(col("query_id"))
      .agg(sum(when(col("an").isNotNull, lit(1L)).otherwise(lit(0L))).as("hits"))
      .select(col("query_id"), col("hits").cast("long").as(s"hits_at_$k"),
        expr(s"hits * 1000000 div $k").cast("long").as("recall_ppm"))
      .orderBy("query_id")

  /** Matryoshka-style truncation check: can the FIRST `dims` of the
    * 64-dim embedding serve as a cheap prefilter? Scores the exact
    * top-k under full-dimension cosine against the top-k under
    * truncated cosine (both brute force, same deterministic
    * tie-break), reporting per-query hits@k — the measurement that
    * decides whether a 4× narrower scan (16 of 64 dims) is safe as a
    * first-pass ranker at 100 TB, BEFORE anyone builds the truncated
    * index. Integer output; the oracle replays both rankings with
    * sliced list arithmetic. */
  def truncationRecall(embeddings: DataFrame, nQueries: Int = 5,
                       k: Int = 10, dims: Int = 16): DataFrame = {
    val full = bruteForceTopK(embeddings, nQueries, k)
    val trunc = bruteForceTopK(
      embeddings.select(col("vec_id"), slice(col("embedding"), 1, dims).as("embedding")),
      nQueries, k)
    recallAgainst(full, trunc, k)
  }

  /** Sign-LSH recall audit, both probe strategies side by side: hits of
    * each bucketed top-k inside the exact brute-force top-k, per query —
    * the ops dashboard that says whether the 8-bit bucket layout is
    * still trustworthy as the corpus drifts, and what the 9× candidate
    * cost of multiprobe actually buys. (On a low-correlation corpus the
    * single-probe row honestly reads ~0 — the number that tells an
    * operator to probe wider or rebuild, which is the audit's job.) */
  def lshRecall(embeddings: DataFrame, nQueries: Int = 5, k: Int = 3): DataFrame = {
    // nQueries×k rows, materialized once — both variants' recall joins
    // would otherwise re-run the whole brute-force corpus scan
    val exact = bruteForceTopK(embeddings, nQueries, k).pinned()
    val single = recallAgainst(exact, lshTopK(embeddings, nQueries, k), k)
      .withColumn("variant", lit("lsh_single"))
    val multi = recallAgainst(exact, lshMultiProbeTopK(embeddings, nQueries, k), k)
      .withColumn("variant", lit("lsh_multiprobe"))
    single.unionByName(multi)
      .select(col("variant"), col("query_id"), col(s"hits_at_$k"), col("recall_ppm"))
      .orderBy("variant", "query_id")
  }
}
