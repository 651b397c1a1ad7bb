package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    val pairs = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = edges.join(deg, "src").localCheckpoint()

    var pr = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to iters) {
      pr = withDeg.join(pr, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("pr div outdeg")).as("in_mass"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * in_mass) div 100")).as("pr"))
        .localCheckpoint()
    }
    pr.select(
      when(pmod(col("node"), lit(2)) === 0, lit("customer"))
        .otherwise(lit("supplier")).as("kind"),
      expr("node div 2").cast("long").as("entity_id"),
      col("pr").cast("long").as("pr_milli"))
      .orderBy(col("pr_milli").desc, col("kind"), col("entity_id"))
      .limit(k)
  }
}
