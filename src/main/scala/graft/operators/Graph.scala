package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Pin.PinnedOps

/** Iterative graph analytics over relational edge lists — the Pregel
  * message-passing pattern expressed as join + re-aggregate rounds, the
  * way a Spark deployment actually runs PageRank-class algorithms at
  * scale (one shuffle on the destination key per superstep; the edge
  * relation is materialized once and reused every round).
  *
  * Joins the connected-components contraction ([[Dedup.starContract]]) as
  * the second member of the iterative-graph family: that one converges a
  * partition, this one converges a SCORE.
  */
object Graph {

  /** Co-purchase part pair set — THE shared relation of the co-purchase
    * graph family: parts (u < v) adjacent when they co-occur in ≥
    * `minSupport` baskets. [[triangleStats]], [[labelPropagation]],
    * [[linkPrediction]] and the recursive-reachability SQL surface
    * (graft.GraftSql) all start from exactly this build (basket
    * self-join + support aggregate — the family's most expensive
    * stage), so it is memoized per (session, corpus plan, minSupport)
    * and pinned ONCE, the same session-scoped discipline as
    * Dedup.minhashPairs' pair-graph cache: at 100 TB this is the edge
    * list a pipeline materializes to storage once per corpus snapshot
    * and every graph job reads. Cleared by [[clearSessionState]]
    * (wired into Bench/ScaleAudit retry clears, so re-timed queries
    * re-pay the build honestly). */
  private val pairCache = scala.collection.concurrent.TrieMap[
    (org.apache.spark.sql.SparkSession,
     org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long), DataFrame]()
  private val pairLocks = scala.collection.concurrent.TrieMap[
    (org.apache.spark.sql.SparkSession,
     org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long), AnyRef]()

  def coPurchasePairs(lineitem: DataFrame, minSupport: Long = 2): DataFrame = {
    val key = (lineitem.sparkSession,
      lineitem.queryExecution.analyzed.canonicalized, minSupport)
    // build-once per key with per-key serialization (graft.Memo): a
    // doubly-run eager build strands the loser's checkpoint blocks, and
    // a global lock would convoy unrelated corpora behind one build
    graft.Memo.buildOnce(pairCache, pairLocks, key) {
      val baskets = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()
      baskets.as("a")
        .join(baskets.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .agg(count(lit(1)).as("nb"))
        .filter(col("nb") >= minSupport)
        .select("u", "v")
        .pinned()
    }
  }

  /** Drop the memoized pair sets (bench/audit retry hygiene). Dropping
    * the map reference is what un-leaks the SparkSession keys; the
    * pinned localCheckpoint BLOCKS free lazily via GC + ContextCleaner,
    * so a retry's "cold" rebuild can briefly overlap the stale blocks in
    * executor storage — acceptable at bench scale, and at cluster scale
    * the reliable-checkpoint switch (Pin.scala) moves the blocks off
    * executors entirely. */
  def clearSessionState(): Unit = graft.Memo.clear(pairCache, pairLocks)

  /** Test seam: entry count currently memoized for `session` (asserts
    * both cache identity and that clears drop session references). */
  private[graft] def cachedEntriesFor(session: org.apache.spark.sql.SparkSession): Int =
    pairCache.keys.count(_._1 eq session)

  /** Both edge directions from an undirected (u, v) pair relation in ONE
    * pass via explode — the pair relation appears exactly once in the
    * plan, so it needs no materialization pin (the union-of-two-selects
    * shape this replaced scanned its input twice and pinned it to
    * compensate; A/B-profiled in tools/ProfileGraphAB). Shared by
    * [[pagerank]], [[labelPropagation]], and the recursive-reachability
    * SQL surface's edge-view prep (graft.GraftSql). */
  def bothDirections(pairs: DataFrame, u: String = "u", v: String = "v"): DataFrame =
    pairs
      .select(explode(array(
        struct(col(u).as("src"), col(v).as("dst")),
        struct(col(v).as("src"), col(u).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** Triangle census of the co-purchase graph (parts adjacent when they
    * co-occur in ≥ `minSupport` baskets), via DEGREE-ORDERED edge
    * orientation — the trick that makes distributed triangle counting
    * tractable: orient every edge from its lower-(degree, id) endpoint
    * to the higher, enumerate wedges only among each node's OUT-edges,
    * and close them against oriented edges. Each triangle is then
    * counted exactly once (at its lowest-ranked vertex), and — the scale
    * point — max out-degree after this orientation is O(√m) on ANY
    * degree distribution, so the wedge join's fan-out is bounded even
    * when a hub part touches everything (the naive neighbor join
    * explodes as deg² on exactly those hubs).
    *
    * Output is ONE integer row: nodes/edges, unoriented wedge count
    * Σ C(deg,2), triangles, and the global clustering coefficient as
    * ppm (3·triangles·10⁶ div wedges) — all exact integers. */
  def triangleStats(lineitem: DataFrame, minSupport: Long = 2): DataFrame = {
    val edges = coPurchasePairs(lineitem, minSupport)
    val deg = edges.select(col("u").as("x")).unionAll(edges.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    // the total order is LEXICOGRAPHIC (degree, id) carried as two
    // columns — never packed into one integer, which would silently
    // collide once ids outgrow the packing base (the 100 TB landmine a
    // d*BASE+id encoding plants). Lower (d, id) originates the edge.
    val lower = (col("du") < col("dv")) ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = edges
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(
        when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t"),
        when(lower, col("dv")).otherwise(col("du")).as("dt"))
      .pinned()
    val wedgeOrder = (col("a.dt") < col("b.dt")) ||
      (col("a.dt") === col("b.dt") && col("a.t") < col("b.t"))
    val wedges = oriented.as("a")
      .join(oriented.as("b"), col("a.s") === col("b.s") && wedgeOrder)
      .select(col("a.t").as("wv"), col("b.t").as("ww"))
    val triangles = wedges
      .join(oriented.select(col("s"), col("t")),
        col("wv") === col("s") && col("ww") === col("t"))
      .agg(count(lit(1)).as("n_triangles"))
    val sums = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("coalesce(sum(d) div 2, 0L)").as("n_edges"),
      expr("coalesce(sum((d * (d - 1)) div 2), 0L)").as("n_wedges"))
    sums.crossJoin(broadcast(triangles))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles").cast("long").as("n_triangles"),
        expr("(3 * n_triangles * 1000000) div greatest(n_wedges, 1)")
          .cast("long").as("clustering_ppm"))
  }

  /** Integer-lattice PageRank over the customer–supplier graph (an edge
    * per DISTINCT (customer, supplier) trading pair from orders ⋈
    * lineitem, both directions, so the bipartite walk has no dangling
    * sinks). Centrality here reads as "breadth of trading
    * relationships, weighted by partners' own breadth".
    *
    * All arithmetic is on an INTEGER lattice so every engine lands on
    * identical scores: mass starts at 1,000,000 milli-ppm per node, each
    * superstep transfers `floor(pr / outdeg)` along every out-edge and
    * re-bases as `150,000 + floor(85 · inbound / 100)` — the d=0.85
    * damped update with floor-division mass transfer. The floors leak
    * O(outdeg) milli-units per node per round versus real-valued
    * PageRank — a deliberate trade: exact float PageRank is not
    * reproducible across engines or partitionings (float sum order),
    * while this lattice form is bit-stable everywhere and preserves the
    * ranking structure at 10⁶× the quantization.
    *
    * Scale shape: the edge list (with out-degrees attached) is built and
    * localCheckpointed ONCE; each of the `iters` supersteps is exactly
    * one hash join on the current scores plus one shuffle-bounded
    * aggregate on the destination — the plan a 10⁹-edge deployment wants
    * (checkpointing per round keeps lineage flat, the batch analogue of
    * Pregel's superstep barrier). Output is the top-k TakeOrdered slice,
    * never a full-graph sort. */
  def pagerank(orders: DataFrame, lineitem: DataFrame,
               iters: Int = 5, k: Int = 100): DataFrame = {
    // both edge directions come from ONE pass over the distinct pair set
    // ([[bothDirections]]) — the pair relation appears exactly once in
    // the plan, so it needs no materialization pin (the
    // union-of-two-selects shape this replaced scanned the distinct
    // twice and needed an eager localCheckpoint of the pair set to
    // avoid re-running its final aggregation per branch)
    val edges = bothDirections(
      orders.select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct(),
      u = "c", v = "s")
    // pre-partition the loop-INVARIANT edge relation on the join key and
    // PERSIST it (not localCheckpoint: the checkpoint's ExistingRDD scan
    // drops outputPartitioning — probed — while InMemoryRelation keeps
    // it). Every superstep's join then sees the big side already
    // clustered on src and only the node-sized score relation shuffles
    // per round — without this the 2|E|-row edge relation re-shuffles
    // every iteration (the dominant per-round cost at 10⁹ edges, where
    // the score side is |V| and never broadcastable). The cache entry is
    // canonical-plan-keyed, so repeat invocations share one copy.
    // SINGLE cache fill (A/B-profiled, tools/ProfileGraphAB): the degree
    // aggregate and the back-join both consume the SAME repartition
    // exchange (ReuseExchange), co-partitioned on src with no further
    // shuffle, and only the joined withDeg relation is cached — staging
    // the bare edge list in a second cache first was a full extra 2|E|
    // write+scan for nothing.
    val edgesP = edges.repartition(col("src"))
    val deg = edgesP.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = edgesP.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize once, outside the first round's timing; clocked as an
    // artifact build for Bench's query_cache_build_sec disclosure
    graft.CacheBuild.timed { withDeg.count(); () }

    // seed scores FROM the cached edge relation (same node set: every
    // deg src survives the join) — seeding from `deg` would re-run the
    // whole pairs derivation once more inside round 1
    var pr = withDeg.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(1000000L))
    for (i <- 1 to iters) {
      pr = withDeg.join(pr, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("pr div outdeg")).as("in_mass"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * in_mass) div 100")).as("pr"))
      // pin every SECOND superstep (and always the last): each pin is an
      // eager job whose fixed dispatch cost dominated the round tax at
      // bench scale (r12 verdict: 5 serial jobs for a node-sized
      // relation). Two chained join+agg rounds per job keep lineage
      // depth at 2 — flat enough for any iters — while halving the job
      // count; the big join side is the one cached src-clustered
      // relation in every round either way.
      if (i % 2 == 0 || i == iters) pr = pr.pinned()
    }
    // the final round is materialized (last pin), so the edge cache has
    // no remaining consumer in the returned plan
    withDeg.unpersist()
    pr.select(
      when(pmod(col("node"), lit(2)) === 0, lit("customer"))
        .otherwise(lit("supplier")).as("kind"),
      expr("node div 2").cast("long").as("entity_id"),
      col("pr").cast("long").as("pr_milli"))
      .orderBy(col("pr_milli").desc, col("kind"), col("entity_id"))
      .limit(k)
  }

  /** Community detection via SYNCHRONOUS label propagation over the
    * co-purchase graph (same ≥`minSupport`-baskets edge relation as
    * [[triangleStats]]) — the third member of the iterative-graph family:
    * [[Dedup.starContract]] converges a partition, [[pagerank]] a score,
    * this one a LABEL. Labels start as node ids; each superstep every
    * node adopts its neighborhood's MODE label with ties broken by the
    * smaller label — fully deterministic, so both engines land on
    * identical communities (asynchronous LPA's update-order randomness is
    * exactly what a cross-engine gate cannot have). Fixed `iters`
    * supersteps rather than convergence detection: sync LPA can 2-cycle
    * on bipartite-ish regions, and a fixed horizon is the reproducible
    * contract (label cores stabilize in a few rounds; the census below is
    * of the labeling AT the horizon).
    *
    * Scale shape, per superstep: one hash join of the checkpointed edge
    * list against the current labels, one two-phase (dst, label) count —
    * shuffle bounded by Σ-degree like PageRank's mass transfer — and one
    * `max_by`-shaped agg to the per-node winner (struct-max of
    * (count, −label): no per-node window, partial aggregation collapses
    * map-side). localCheckpoint per round keeps lineage flat. Output is
    * the bounded community census (top-k by size), never a full node
    * dump. */
  def labelPropagation(lineitem: DataFrame, iters: Int = 4,
                       minSupport: Long = 2, k: Int = 50): DataFrame = {
    // both directions in ONE explode pass over the SHARED memoized pair
    // set ([[coPurchasePairs]] — already pinned, so this is one cheap
    // scan of a materialized RDD, amortized across the whole co-purchase
    // family), then the same src-clustered persisted form as
    // [[pagerank]]: the loop joins on src every round, so only the
    // label relation shuffles per step (persist, not checkpoint —
    // partitioning survives)
    val edges = bothDirections(coPurchasePairs(lineitem, minSupport))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var lab = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (i <- 1 to iters) {
      lab = edges.join(lab, col("src") === col("node"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("w"))
        .select(col("dst").as("node"), (-col("w.nl")).as("label"))
      // every-second-round pin, same as [[pagerank]]: halve the serial
      // job count, keep lineage depth at 2, always pin the last round
      if (i % 2 == 0 || i == iters) lab = lab.pinned()
    }
    edges.unpersist() // the last round is materialized; no consumer remains
    lab.groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("n_nodes"),
        min(col("node")).cast("long").as("min_node"))
      .select(col("label").cast("long").as("community"), col("n_nodes"), col("min_node"))
      .orderBy(col("n_nodes").desc, col("community"))
      .limit(k)
  }

  /** Link prediction by common neighbors over the co-purchase graph
    * (same ≥`minSupport` edge relation as [[triangleStats]]): for every
    * NON-adjacent part pair sharing at least one neighbor, the
    * common-neighbor count and the integer Jaccard ppm
    * `cn·10⁶ div (du + dv − cn)`; top-k predicted links.
    *
    * The scale hazard is the wedge fan-out: pairs mediated by a hub
    * node are genuinely deg² — no orientation trick removes them,
    * because unlike triangle counting every one of those pairs is a
    * distinct candidate. The standard cut (Adamic–Adar's insight made
    * structural) is to drop HUB MEDIATORS: a common neighbor of degree
    * 10⁴ carries ~no link signal but 10⁸ pairs, so wedge centers are
    * capped at `maxMediatorDeg` (the capped share is observable via
    * [[Dedup]]-style monitors; per-center fan-out is then ≤ C(cap, 2)).
    * Pair generation enumerates each center's neighbor list once
    * (self-join on the center key, u < v), aggregates per pair —
    * shuffle bounded by centers · C(cap,2) — and anti-joins the edge
    * relation so only NEW links surface. Output is TakeOrdered-bounded,
    * never a full pair dump. */
  def linkPrediction(lineitem: DataFrame, minSupport: Long = 2,
                     maxMediatorDeg: Long = 64, k: Int = 50): DataFrame = {
    val und = coPurchasePairs(lineitem, minSupport)
    val adj = und.select(col("u").as("ctr"), col("v").as("nbr"))
      .unionAll(und.select(col("v").as("ctr"), col("u").as("nbr")))
    val deg = adj.groupBy(col("nbr").as("x")).agg(count(lit(1)).as("d"))
    val centers = adj
      .join(deg.select(col("x").as("ctr"), col("d").as("dc")), "ctr")
      .filter(col("dc") <= maxMediatorDeg)
    val pairs = centers.as("a")
      .join(centers.as("b"),
        col("a.ctr") === col("b.ctr") && col("a.nbr") < col("b.nbr"))
      .groupBy(col("a.nbr").as("pu"), col("b.nbr").as("pv"))
      .agg(count(lit(1)).as("cn"))
    pairs
      .join(und, col("pu") === col("u") && col("pv") === col("v"), "left_anti")
      .join(deg.select(col("x").as("pu"), col("d").as("du")), "pu")
      .join(deg.select(col("x").as("pv"), col("d").as("dv")), "pv")
      .select(col("pu").cast("long").as("u"), col("pv").cast("long").as("v"),
        col("cn").cast("long").as("common_neighbors"),
        expr("cn * 1000000 div (du + dv - cn)").cast("long").as("jaccard_ppm"))
      .orderBy(col("common_neighbors").desc, col("jaccard_ppm").desc, col("u"), col("v"))
      .limit(k)
  }
}
