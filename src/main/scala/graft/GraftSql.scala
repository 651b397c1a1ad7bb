package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Pin.PinnedOps

/** SQL front end: register the driver tables as temp views so queries can
  * be written as ANSI SQL through `spark.sql` — the query-surface the
  * reference never had (its "query" is a hard-coded topology,
  * /root/reference/.../UniqueUsersCounter.java:63-93). Catalyst plans SQL
  * and DataFrame identically, so both surfaces share every optimization.
  */
object GraftSql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    TableNames.foreach { n =>
      val df = if (n == "events") Tables.events(spark, sfDir) else Tables.load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  /** The flagship query through the SQL surface. */
  def uuPerMinuteSql(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(
      """SELECT unix_timestamp(w.start) AS minute, unique_users FROM (
        |  SELECT window(ts, '1 minute') AS w, count(DISTINCT user_id) AS unique_users
        |  FROM events GROUP BY window(ts, '1 minute'))
        |ORDER BY minute""".stripMargin)
  }

  /** A pipeline north-star operator through the SQL surface: brute-force
    * cosine ANN spelled entirely in `spark.sql`, scoring with the native
    * codegen'd `cosine_similarity` expression
    * ([[graft.plans.CosineSimilarity]], registered via
    * [[graft.plans.GraftExtensions.registerOn]]) and ranking with the same
    * salted two-stage top-k as the DataFrame operator
    * ([[graft.operators.Similarity.bruteForceTopK]]): stage 1 ranks inside
    * 64 crc32 hash buckets of neighbor_id so no task ever sorts a
    * corpus-sized partition, stage 2 ranks the ≤ 64×k survivors. Row-equal
    * to the DataFrame path (asserted in OperatorSpec) and shares its
    * DuckDB oracle. */
  def annBruteForceSql(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.GraftExtensions.registerOn(spark)
    registerAll(spark, sfDir)
    spark.sql(
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS ARRAY<DOUBLE>) AS qe
        |           FROM embeddings WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.query_id, c.vec_id AS neighbor_id,
        |         cosine_similarity(q.qe, CAST(c.embedding AS ARRAY<DOUBLE>)) AS cs
        |  FROM embeddings c JOIN q ON q.query_id != c.vec_id),
        |loc AS (
        |  SELECT query_id, neighbor_id, cs,
        |         row_number() OVER (
        |           PARTITION BY query_id, pmod(crc32(CAST(neighbor_id AS STRING)), 64)
        |           ORDER BY cs DESC, neighbor_id) AS lrk
        |  FROM scored),
        |rk AS (
        |  SELECT query_id, neighbor_id, cs,
        |         CAST(row_number() OVER (
        |           PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS LONG) AS rank
        |  FROM loc WHERE lrk <= 10)
        |SELECT query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
        |FROM rk WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin)
  }

  /** A dedup operator through the pure-SQL surface: normalized-fingerprint
    * exact dedup spelled entirely in `spark.sql` — the 16-byte-shuffle-key
    * form of [[graft.operators.Dedup.exactNormalized]], row-equal to it
    * (asserted in OperatorSpec) and sharing its DuckDB oracle. Catalyst
    * plans this identically to the DataFrame operator: same partial
    * aggregate on md5 fingerprints, document text never shuffles. */
  def dedupExactNormSql(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_count
        |FROM (SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ')) AS fp
        |      FROM documents)
        |GROUP BY fp
        |ORDER BY doc_id""".stripMargin)
  }

  /** MinHash+LSH near-dup detection spelled entirely in `spark.sql`,
    * driven by the NATIVE `word_shingles` expression registered through
    * [[graft.plans.GraftExtensions]] — the demonstration that the
    * engine's custom Catalyst expressions are first-class SQL citizens,
    * not DataFrame-only. Mirrors [[graft.operators.Dedup.minhashLsh]]
    * stage for stage (signature mins, digest band keys, band equi-join,
    * exact array_intersect verify at Jaccard >= 1/2) and is row-equal to
    * it (asserted in OperatorSpec), sharing its DuckDB oracle.
    *
    * Scale note: Spark inlines CTEs, so the `sh` shingle relation here is
    * computed once per reference (three times) — this SQL form
    * demonstrates the expressions are SQL-complete; the DataFrame
    * operator remains the production path, riding the session-cached
    * shingle arrays and the memoized pair graph. */
  def dedupMinhashSql(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.GraftExtensions.registerOn(spark)
    registerAll(spark, sfDir)
    val sigCols = (0 until graft.operators.Dedup.MinhashSeeds)
      .map(i => s"min(md5(concat_ws(':', '$i', g))) AS h$i").mkString(", ")
    val bandKeys = (0 until graft.operators.Dedup.MinhashBands)
      .map(b => s"md5(concat(h${2 * b}, h${2 * b + 1}))").mkString(", ")
    spark.sql(
      s"""WITH sh AS (
         |  SELECT doc_id, word_shingles(regexp_replace(trim(lower(text)), '\\\\s+', ' ')) AS gs
         |  FROM documents),
         |ex AS (SELECT doc_id, explode(gs) AS g FROM sh),
         |sig AS (SELECT doc_id, $sigCols FROM ex GROUP BY doc_id),
         |bands AS (SELECT doc_id, posexplode(array($bandKeys)) AS (band_idx, band_key) FROM sig),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |v AS (
         |  SELECT doc_a, doc_b,
         |         size(array_intersect(sa.gs, sb.gs)) AS shared,
         |         size(sa.gs) AS na, size(sb.gs) AS nb
         |  FROM cand JOIN sh sa ON doc_a = sa.doc_id JOIN sh sb ON doc_b = sb.doc_id)
         |SELECT doc_a, doc_b FROM v
         |WHERE shared * 3 >= na + nb
         |ORDER BY doc_a, doc_b""".stripMargin)
  }

  /** Explicit GROUPING SETS (the general form rollup/cube specialize) with
    * grouping_id() disambiguating aggregation level from data NULLs —
    * plans as one Expand + a single shuffle, like rollup/cube. */
  def salesGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(count(*) AS LONG) AS n,
        |       CAST(sum(l_quantity) AS LONG) AS sum_qty,
        |       CAST(grouping_id() AS LONG) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  /** LISTAGG (new in Spark 4) with a WITHIN GROUP order: per order
    * priority, the top-5 orders by value as an ordered comma string —
    * the report-rendering aggregate BI layers ask for. Determinism is
    * the whole game for an ordered string aggregate: the top-5 cut is
    * the salted-window TakeOrdered shape on (value desc, orderkey) — a
    * TOTAL order, so ties cannot reshuffle the string — and LISTAGG
    * re-sorts WITHIN GROUP by the same keys. Output is
    * |priority-domain| rows; the oracle is DuckDB's ordered
    * string_agg. */
  def priorityTopOrdersListagg(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(
      """WITH v AS (SELECT o_orderpriority AS pri, o_orderkey AS k,
        |    CAST(round(o_totalprice * 100) AS LONG) AS cents FROM orders),
        |top5 AS (SELECT pri, k, cents FROM (
        |    SELECT pri, k, cents,
        |      row_number() OVER (PARTITION BY pri ORDER BY cents DESC, k) AS rn FROM v)
        |  WHERE rn <= 5)
        |SELECT pri AS o_orderpriority,
        |  CAST(count(*) AS LONG) AS n,
        |  CAST(sum(cents) AS LONG) AS top5_cents,
        |  listagg(CAST(k AS STRING), ',') WITHIN GROUP (ORDER BY cents DESC, k) AS top5_keys
        |FROM top5 GROUP BY pri ORDER BY pri""".stripMargin)
  }

  /** Recursive CTE (Spark 4's `WITH RECURSIVE`): min-hop reachability
    * within 3 hops of the seed parts (partkey < 50) over the
    * ≥2-basket co-purchase graph — the iterative-graph family's FOURTH
    * member, this time expressed declaratively and executed by the
    * engine's own fixpoint operator instead of a driver loop. The
    * recursion is depth-BOUNDED (`hop < 3`) and the per-hop frontier is
    * a hash join on the edge key, so each iteration is the same
    * bounded-shuffle superstep PageRank/LPA pay; min(hop) collapses the
    * revisit paths afterward. For UNBOUNDED closure at 100 TB use the
    * O(log n)-round star-contraction ([[graft.operators.Dedup]]) — a
    * linear-depth recursive CTE walks the graph's diameter in
    * supersteps. The DuckDB oracle is the SAME recursive SQL, making
    * this a cross-engine fixpoint-semantics gate. */
  def reachabilityRecursiveSql(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark, sfDir)
    // per-INVOCATION view name: a fixed session-global name lets two
    // concurrent callers on one session cross-wire (one recursion
    // reading the other's freshly swapped edge relation mid-query);
    // the unique name also drops the only reference to this call's
    // checkpoint blocks once the returned plan is released
    val edgesView = s"graft_reach_edges_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // materialize the loop-INVARIANT edge relation ONCE (the same
    // localCheckpoint discipline the PageRank/LPA supersteps use): a
    // CTE referenced inside the recursive member is re-evaluated every
    // iteration, so leaving the basket self-join inline multiplies the
    // most expensive stage by the recursion depth (measured 14.5 s →
    // 5.0 s cold at sf0.1 from this change alone — the remainder was the
    // one-time edge build, which now comes from the co-purchase family's
    // SHARED memoized pair set (graft.operators.Graph.coPurchasePairs —
    // triangles/communities/link-prediction amortize the same build;
    // only the both-directions explode is this query's own). The
    // recursion itself stays pure SQL below; pinning stays EAGER, not
    // persist — the engine-owned recursion does not reliably route
    // per-step scans through a lazily-registered cache entry (measured
    // 3× slower with persist: the co-purchase join re-ran inside the
    // recursion). The checkpoint blocks are reclaimed by the
    // ContextCleaner when the plan's RDD references drop; the view name
    // is namespaced to this query so no other operator can cross-wire
    // with it
    graft.operators.Graph.bothDirections(
      graft.operators.Graph.coPurchasePairs(graft.Tables.lineitem(spark, sfDir)))
      .pinned()
      .createOrReplaceTempView(edgesView)
    // named parameter markers (Spark 4 parameterized SQL): the literals
    // bind server-side instead of being spliced into the text — the
    // SQL-injection-proof form a query service exposes
    val out = spark.sql(
      s"""WITH RECURSIVE reach AS (
        |  SELECT DISTINCT src AS part, 0 AS hop FROM $edgesView WHERE src < :seedCap
        |  UNION ALL
        |  SELECT e.dst AS part, r.hop + 1 AS hop
        |  FROM reach r JOIN $edgesView e ON e.src = r.part WHERE r.hop < :maxHop)
        |SELECT CAST(part AS LONG) AS part, CAST(min(hop) AS LONG) AS hops
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
      Map("seedCap" -> 50, "maxHop" -> 3))
    // the view is INLINED into `out`'s analyzed plan above — drop it now
    // so the catalog holds no reference and the checkpointed edge blocks
    // free with the returned plan (a per-invocation view that outlives
    // the call would pin one edge relation per invocation forever)
    spark.catalog.dropTempView(edgesView)
    out
  }
}
