package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Dedup, Relational, Sessionize, Similarity}
import graft.plans.CosineSimilarity

/** Relational / session / vector operator behavior on hand-built fixtures. */
class OperatorSpec extends SparkSpec {

  import spark.implicits._

  test("codegen cosine is bit-identical to the higher-order-function fold") {
    val vecs = Tables.embeddings(spark, Sf0001).limit(50)
    val pairs = vecs.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(vecs.select(col("vec_id").as("b"), col("embedding").as("eb")))
    val diffs = pairs.select(
      CosineSimilarity.cosineFast(col("ea"), col("eb")).as("fast"),
      VectorFunctions.cosine(col("ea"), col("eb")).as("hof"))
      .filter(col("fast") =!= col("hof")) // exact double equality
      .count()
    assert(diffs === 0L)
  }

  test("sessionization merges within gap, splits beyond it") {
    val ev = Seq(
      (1L, 10L, "2024-01-01 00:00:00"),
      (2L, 10L, "2024-01-01 00:10:00"), // same session (10 min gap)
      (3L, 10L, "2024-01-01 01:00:00"), // 50 min after -> new session
      (4L, 20L, "2024-01-01 00:05:00")  // other user
    ).toDF("event_id", "user_id", "s")
      .selectExpr("event_id", "user_id", "CAST(s AS TIMESTAMP) AS ts")
    val got = Sessionize.userSessions(ev).collect()
      .map { case Row(u: Long, st: Long, n: Long, d: Long) => (u, st, n, d) }
    assert(got.toSeq === Seq(
      (10L, 1704067200L, 2L, 600L),
      (10L, 1704070800L, 1L, 0L),
      (20L, 1704067500L, 1L, 0L)))
  }

  test("sweep-line concurrency: carry across hours, starts-before-ends at ties") {
    val ev = Seq(
      (1L, 10L, "2024-01-01 00:10:00"),
      (2L, 10L, "2024-01-01 00:20:00"), // u10 session [00:10, 00:20]
      (3L, 20L, "2024-01-01 00:15:00"), // u20 point session at 00:15
      (4L, 30L, "2024-01-01 00:50:00"),
      (5L, 30L, "2024-01-01 01:10:00"), // u30 session spans the hour boundary
      (6L, 40L, "2024-01-01 01:05:00")  // u40 point session at 01:05
    ).toDF("event_id", "user_id", "s")
      .selectExpr("event_id", "user_id", "CAST(s AS TIMESTAMP) AS ts")
    val got = Sessionize.sessionConcurrency(ev).collect()
      .map { case Row(h: Long, st: Long, en: Long, open: Long, pk: Long) => (h, st, en, open, pk) }
    assert(got.toSeq === Seq(
      // hour 0: peak 2 (u10 open while u20's point session fires); u30 stays open
      (1704067200L, 3L, 2L, 0L, 2L),
      // hour 1: opens with u30 carried in, peak 2 when u40 fires inside it
      (1704070800L, 1L, 2L, 1L, 2L)))
  }

  test("as-of join picks latest at-or-before, ties to highest orderkey") {
    val orders = Seq(
      (100L, 1L, "2024-01-01 00:00:00", 10.0),
      (101L, 1L, "2024-01-02 00:00:00", 10.0), // tie on date with 102
      (102L, 1L, "2024-01-02 00:00:00", 10.0),
      (103L, 2L, "2024-06-01 00:00:00", 10.0)  // after user 2's event
    ).toDF("o_orderkey", "o_custkey", "s", "o_totalprice")
      .selectExpr("o_orderkey", "o_custkey", "CAST(s AS TIMESTAMP) AS o_orderdate", "o_totalprice")
    val events = Seq(
      (1000L, 1L, "2024-01-03 12:00:00"),
      (1001L, 1L, "2024-01-01 12:00:00"),
      (1002L, 2L, "2024-01-05 00:00:00"),
      (1003L, 3L, "2024-01-05 00:00:00") // no orders at all
    ).toDF("event_id", "user_id", "s")
      .selectExpr("event_id", "user_id", "CAST(s AS TIMESTAMP) AS ts")
    val got = Sessionize.asofJoinOrders(events, orders).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got === Map(1000L -> 102L, 1001L -> 100L, 1002L -> -1L, 1003L -> -1L))
  }

  test("part co-occurrence: support filter, integer lift, dup lines collapse") {
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 20L), // dup (order,part) line must not double-count
      (3L, 10L), (3L, 20L)
    ).toDF("l_orderkey", "l_partkey")
    val got = Relational.partCooccurrence(li).collect()
      .map { case Row(a: Long, b: Long, n: Long, na: Long, nb: Long, l: Long) =>
        (a, b, n, na, nb, l) }
    // (10,20) in all 3 baskets: lift = 3*3*1e6/(3*3) = 1e6 (independence)
    assert(got.toSeq === Seq((10L, 20L, 3L, 3L, 3L, 1000000L)))
  }

  test("triangle census: degree-ordered orientation counts each triangle once") {
    // baskets 10,11: {1,2,3} twice -> all three edges at support 2 -> one
    // triangle; baskets 12,13: {1,4} -> edge (1,4), no triangle.
    // deg: 1->3, 2->2, 3->2, 4->1; wedges = C(3,2)+1+1+0 = 5
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 1L), (12L, 4L),
      (13L, 1L), (13L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val got = graft.operators.Graph.triangleStats(li).collect()
      .map { case Row(n: Long, e: Long, w: Long, t: Long, c: Long) => (n, e, w, t, c) }
    assert(got.toSeq === Seq((4L, 4L, 5L, 1L, 600000L)))
  }

  test("integer-lattice pagerank: hand-computed two-superstep scores") {
    // graph: customer 1 trades with suppliers 1 and 2 (node ids 2,3,5).
    // round 1: pr(c1)=150000+85%*(1e6+1e6)=1,850,000; pr(s*)=150000+85%*(1e6 div 2)=575,000
    // round 2: pr(c1)=150000+85%*(575000*2)=1,127,500; pr(s*)=150000+85%*(1850000 div 2)=936,250
    val orders = Seq((10L, 1L), (11L, 1L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1L), (11L, 2L), (11L, 2L)) // dup edge must not double mass
      .toDF("l_orderkey", "l_suppkey")
    val got = graft.operators.Graph.pagerank(orders, lineitem, iters = 2, k = 10)
      .collect()
      .map { case Row(kind: String, id: Long, pr: Long) => (kind, id, pr) }
    assert(got.toSeq === Seq(
      ("customer", 1L, 1127500L),
      ("supplier", 1L, 936250L),
      ("supplier", 2L, 936250L)))
  }

  test("label propagation: two cliques converge to their min-label communities") {
    // two support-2 triangles {1,2,3} and {4,5,6}, no bridge. Sync LPA
    // with (count desc, label asc) tie-break: round 1 sends each node its
    // neighborhood minimum-ish label, round 2 floods the clique minimum
    // (1 and 4); rounds 3-4 are stable — a deterministic fixture for the
    // mode/tie-break contract.
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (11L, 1L), (11L, 2L), (11L, 3L),
      (12L, 4L), (12L, 5L), (12L, 6L),
      (13L, 4L), (13L, 5L), (13L, 6L)
    ).toDF("l_orderkey", "l_partkey")
    val got = graft.operators.Graph.labelPropagation(li).collect()
      .map { case Row(c: Long, n: Long, m: Long) => (c, n, m) }
    assert(got.toSeq === Seq((1L, 3L, 1L), (4L, 3L, 4L)))
  }

  test("int8 quantization: exact code points cost zero, interior points pay the grid") {
    // dim0 spans [0,255] (codes = values, lossless); dim1 spans [0,1].
    // label 0 vectors sit exactly on code points -> err 0; label 1's
    // (127.25, 0.5) pays |127.25-127| = 0.25 on dim0 (250000 micro) and
    // |0.5 - 128/255| on dim1 (1961 micro after the per-element round)
    val emb = Seq(
      (1L, Array(0.0f, 0.0f), 0),
      (2L, Array(255.0f, 1.0f), 0),
      (3L, Array(127.25f, 0.5f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity.int8QuantStats(emb).collect()
      .map { case Row(l: Long, n: Long, s: Long, m: Long) => (l, n, s, m) }
    assert(got.toSeq === Seq((0L, 2L, 0L, 0L), (1L, 1L, 251961L, 251961L)))
  }

  test("latest-per-key keeps exactly one row per customer") {
    val orders = Tables.orders(spark, Sf0001)
    val got = Relational.latestOrderPerCustomer(orders)
    assert(got.count() === orders.select("o_custkey").distinct().count())
  }

  test("pivot row sums equal plain counts per day") {
    val ev = Tables.events(spark, Sf0001)
    val pivoted = Relational.eventsPivot(ev)
    val rowSums = pivoted.select(
      col("day"),
      Relational.EventTypes.map(col).reduce(_ + _).as("total"))
      .collect().map { case Row(d: Long, t: Long) => d -> t }.toMap
    val plain = ev.groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .count().collect().map { case Row(d: Long, n: Long) => d -> n }.toMap
    assert(rowSums === plain)
  }

  test("cube contains rollup plus the linestatus-only slices") {
    val li = Tables.lineitem(spark, Sf0001)
    val cube = Relational.salesCube(li).count()
    val rollup = Relational.salesRollup(li).count()
    val statuses = li.select("l_linestatus").distinct().count()
    assert(cube === rollup + statuses)
  }

  test("ivf probe search agrees with brute-force scores on returned pairs") {
    val emb = Tables.embeddings(spark, Sf0001)
    val brute = Similarity.bruteForceTopK(emb, nQueries = 3, k = 499).collect()
      .map { case Row(q: Long, n: Long, _, c: Double) => (q, n) -> c }.toMap
    val ivf = Similarity.ivfTopK(emb, nQueries = 3, k = 3).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case Row(q: Long, n: Long, _, c: Double) =>
      assert(brute((q, n)) === c, s"pair ($q,$n)")
    }
  }

  test("SQL-surface ANN (ann_bruteforce_sql) is row-equal to the DataFrame operator") {
    val viaSql = GraftSql.annBruteForceSql(spark, Sf0001).collect().toSeq
    val viaDf = Similarity.bruteForceTopK(Tables.embeddings(spark, Sf0001)).collect().toSeq
    assert(viaSql === viaDf)
  }

  test("SQL-surface dedup (dedup_exact_norm_sql) is row-equal to the DataFrame operator") {
    val viaSql = GraftSql.dedupExactNormSql(spark, Sf0001).collect().toSeq
    val viaDf = Dedup.exactNormalized(Tables.documents(spark, Sf0001)).collect().toSeq
    assert(viaSql === viaDf)
  }

  test("SQL-surface MinHash (dedup_minhash_sql, native word_shingles) is row-equal") {
    val viaSql = GraftSql.dedupMinhashSql(spark, Sf0001).collect().toSeq
    val viaDf = Dedup.minhashLsh(Tables.documents(spark, Sf0001)).collect().toSeq
    assert(viaSql === viaDf)
  }

  test("IVF index layout: cell-partitioned corpus, pruned search equals in-memory IVF") {
    val emb = Tables.embeddings(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    Similarity.saveIvfIndex(emb, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val viaIndex = Similarity.ivfSearchIndexed(spark, dir, queries)
    val inMemory = Similarity.ivfTopK(emb)
    assert(viaIndex.collect().toSeq === inMemory.collect().toSeq,
      "search over the persisted layout must equal the in-memory IVF result")
    // the probed cells became a STATIC partition filter: the cells scan
    // lists only those directories
    val planStr = viaIndex.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters: [cell#") ||
      planStr.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      s"cells scan must carry a cell partition filter:\n$planStr")
  }

  test("IVF index append: an index grown in batches searches like one built at once") {
    val emb = Tables.embeddings(spark, Sf0001)
    // both layouts share ONE quantizer (trained on the full corpus plan —
    // the same memoized model every other test uses): the appended index
    // assigns each batch with the index's own fixed artifact
    val atOnce = java.nio.file.Files.createTempDirectory("graft-ivf-once").toString
    Similarity.saveIvfIndex(emb, atOnce)
    val grown = java.nio.file.Files.createTempDirectory("graft-ivf-grown").toString
    Similarity.saveQuantizer(emb, s"$grown/quantizer")
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 2 === 0), grown)
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") % 2 === 1), grown)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val viaAppends = Similarity.ivfSearchIndexed(spark, grown, queries).collect().toSeq
    val allAtOnce = Similarity.ivfSearchIndexed(spark, atOnce, queries).collect().toSeq
    assert(viaAppends === allAtOnce,
      "an index built by appends must search identically to one built at once")
  }

  test("mergeIvfIndexes/mergePqIndexes: merge == target grown by the sources' corpora, geometry frozen") {
    val emb = Tables.embeddings(spark, Sf0001)
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def dir(tag: String) = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    // IVF: target and reference share ONE geometry (same corpus, same
    // slot → same memoized quantizer); the shard index trains its OWN
    val (tgt, shard, ref) = (dir("ivfm-t"), dir("ivfm-s"), dir("ivfm-r"))
    Similarity.saveIvfIndex(half1, tgt, slot = "ivfMergeA")
    Similarity.saveIvfIndex(half2, shard, slot = "ivfMergeB")
    Similarity.saveIvfIndex(half1, ref, slot = "ivfMergeA")
    Similarity.appendToIvfIndex(half2, ref)
    Similarity.mergeIvfIndexes(spark, Seq(shard), tgt)
    assert(Similarity.ivfSearchIndexed(spark, tgt, queries).collect().toSeq ===
      Similarity.ivfSearchIndexed(spark, ref, queries).collect().toSeq,
      "a merged IVF index must search exactly like the target grown by the source's corpus")
    // the source stayed readable and untouched
    assert(Similarity.ivfSearchIndexed(spark, shard, queries).collect().nonEmpty)
    // PQ edition: same contract through frozen quantizer AND codebooks
    val (tgtP, shardP, refP) = (dir("pqm-t"), dir("pqm-s"), dir("pqm-r"))
    Similarity.savePqIndex(half1, tgtP, slot = "pqMergeA")
    Similarity.savePqIndex(half2, shardP, slot = "pqMergeB")
    Similarity.savePqIndex(half1, refP, slot = "pqMergeA")
    Similarity.appendToPqIndex(half2, refP)
    Similarity.mergePqIndexes(spark, Seq(shardP), tgtP)
    assert(Similarity.pqSearchIndexed(spark, tgtP, queries).collect().toSeq ===
      Similarity.pqSearchIndexed(spark, refP, queries).collect().toSeq,
      "a merged PQ index must search exactly like the target grown by the source's corpus")
    // contract errors fail loudly before any write
    intercept[IllegalArgumentException] {
      Similarity.mergeIvfIndexes(spark, Seq(tgt, shard), tgt)
    }
    intercept[IllegalArgumentException] {
      Similarity.mergePqIndexes(spark, Seq.empty, tgtP)
    }
  }

  test("IVF compaction: an append-grown tree shrinks its files, searches identically, keeps stats honest") {
    val emb = Tables.embeddings(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-compact").toString
    Similarity.saveQuantizer(emb, s"$dir/quantizer")
    val even = emb.filter(col("vec_id") % 2 === 0)
    val odd = emb.filter(col("vec_id") % 2 === 1)
    Similarity.appendToIvfIndex(even, dir)
    Similarity.appendToIvfIndex(odd, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def files(): Long = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(dir, "cells"))
      try st.filter(p => p.getFileName.toString.startsWith("part-")).count()
      finally st.close()
    }
    // the clean-tree answer BEFORE any replay: a replayed append visibly
    // corrupts top-k (the duplicated vector returns at two ranks) — IVF
    // appends are NOT replay-tolerant the way dedup-index appends are,
    // and compaction is the documented repair
    val clean = Similarity.ivfSearchIndexed(spark, dir, queries).collect().toSeq
    Similarity.appendToIvfIndex(odd, dir) // replayed micro-batch
    val corrupted = Similarity.ivfSearchIndexed(spark, dir, queries).collect().toSeq
    assert(corrupted !== clean, "a replayed append should perturb top-k (duplicate ranks)")
    val filesBefore = files()
    Similarity.compactIvfIndex(spark, dir)
    assert(files() < filesBefore, s"compaction must shrink the cell tree (before: $filesBefore)")
    assert(Similarity.ivfSearchIndexed(spark, dir, queries).collect().toSeq === clean,
      "compaction must fold replay duplicates and restore the clean-tree answer")
    // replay rows folded: persisted-index occupancy now equals a fresh
    // assignment of the corpus under the same quantizer
    val loaded = Similarity.loadQuantizer(spark, s"$dir/quantizer")
    assert(Similarity.ivfIndexCellStats(spark, dir).collect().toSeq ===
      Similarity.cellStatsWith(emb, loaded).collect().toSeq,
      "post-compaction cell stats must match in-memory assignment stats")
    // the tree still grows after compaction
    Similarity.appendToIvfIndex(emb.filter(col("vec_id") === 0), dir)
    assert(spark.read.parquet(s"$dir/cells").filter(col("vec_id") === 0).count() === 2)
    // the persisted-index monitor prices occupancy from the partition
    // column ALONE — the scan must read zero data columns (no embedding
    // bytes), which is what makes it free at 100 TB
    val monitorPlan = Similarity.ivfIndexCellStats(spark, dir)
      .queryExecution.executedPlan.toString
    assert(monitorPlan.contains("ReadSchema: struct<>"),
      s"cell-stats scan must be partition-column-only:\n$monitorPlan")
  }

  test("removeFromIvfIndex: removed vectors never return; remove+append equals a fresh remainder tree") {
    val emb = Tables.embeddings(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-rm").toString
    Similarity.saveIvfIndex(emb, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val before = Similarity.ivfSearchIndexed(spark, dir, queries).collect()
    // take every neighbor the searches currently return as the takedown set
    val gone = before.map(_.getLong(1)).toSet
    assert(gone.nonEmpty)
    import spark.implicits._
    Similarity.removeFromIvfIndex(spark, dir, gone.toSeq.toDF("vec_id"))
    val after = Similarity.ivfSearchIndexed(spark, dir, queries).collect()
    assert(after.nonEmpty, "searches must still answer from the remaining tree")
    assert(after.map(_.getLong(1)).toSet.intersect(gone) === Set.empty,
      "a removed vector must never be returned by any search")
    // remainder tree built fresh under the SAME frozen quantizer answers
    // identically, and holds exactly the same (vec_id, cell) rows
    val fresh = java.nio.file.Files.createTempDirectory("graft-ivf-rm-fresh").toString
    Similarity.saveQuantizer(emb, s"$fresh/quantizer")
    Similarity.appendToIvfIndex(
      emb.filter(!col("vec_id").isin(gone.toSeq.map(java.lang.Long.valueOf): _*)), fresh)
    assert(Similarity.ivfSearchIndexed(spark, fresh, queries).collect().toSeq === after.toSeq,
      "remove-then-search must equal a fresh-save of the remaining corpus")
    def rows(p: String) = spark.read.parquet(s"$p/cells")
      .select(col("vec_id"), col("cell")).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows(dir) === rows(fresh),
      "the rewritten cell tree must hold exactly the remainder's rows")
  }

  test("ivf_cell_stats: shares sum to ~1e6 ppm and counts cover the corpus") {
    val emb = Tables.embeddings(spark, Sf0001)
    val stats = Similarity.cellStats(emb).collect()
    assert(stats.nonEmpty)
    val n = stats.map(_.getLong(1)).sum
    assert(n === emb.count())
    val ppm = stats.map(_.getLong(2)).sum
    assert(ppm <= 1000000L && ppm > 1000000L - stats.length,
      s"integer-floor shares must sum to just under 1e6 ppm, got $ppm")
  }

  test("eventFunnel: a step counts only when present AND in first-occurrence order") {
    def ev(u: Long, t: String, hour: Int) =
      (u, t, java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00"))
    val events = Seq(
      ev(1, "signup", 0), ev(1, "view", 1), ev(1, "click", 2), ev(1, "purchase", 3),
      ev(2, "signup", 0), ev(2, "view", 1),
      ev(3, "view", 0), ev(3, "signup", 1), // out of order: view precedes signup
      ev(4, "click", 5), // no signup at all: reaches nothing
      ev(1, "error", 4) // non-step types are ignored
    ).toDF("user_id", "event_type", "ts")
    val got = Relational.eventFunnel(events).collect()
      .map { case Row(s: Long, n: String, u: Long, p: Long) => (s, n, u, p) }
    assert(got.toSeq === Seq(
      (1L, "signup", 3L, 1000000L),
      (2L, "view", 2L, 666666L),
      (3L, "click", 1L, 333333L),
      (4L, "purchase", 1L, 333333L)))
  }

  test("eventFunnel: an empty stream reports an honest 0-user funnel, not nulls") {
    val empty = Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("user_id", "event_type", "ts")
    val got = Relational.eventFunnel(empty).collect()
      .map { case Row(s: Long, _: String, u: Long, p: Long) => (s, u, p) }
    assert(got.toSeq === (1L to 4L).map(s => (s, 0L, 0L)))
  }

  test("eventFunnelWindowed: transitions expire past the horizon; chain is greedy-earliest") {
    def ev(u: Long, t: String, hm: String) =
      (u, t, java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00"))
    val events = Seq(
      // u1: full chain until purchase misses its window (click 01:15 →
      // purchase 02:20 is 65 min > the 60-min horizon)
      ev(1, "signup", "00:00"), ev(1, "view", "00:30"),
      ev(1, "click", "01:15"), ev(1, "purchase", "02:20"),
      // u2: view arrives 2 h after signup — transition expired
      ev(2, "signup", "00:00"), ev(2, "view", "02:00"),
      // u3: a view BEFORE signup doesn't count; the one after does
      ev(3, "view", "00:00"), ev(3, "signup", "01:00"), ev(3, "view", "01:30"),
      // u5: greedy-earliest — t1 pins to the 00:10 view, so the 01:40
      // click (90 min later) misses even though the 01:30 view would
      // have allowed it; the operator never re-matches a later step-i
      ev(5, "signup", "00:00"), ev(5, "view", "00:10"),
      ev(5, "view", "01:30"), ev(5, "click", "01:40")
    ).toDF("user_id", "event_type", "ts")
    val got = Relational.eventFunnelWindowed(events, horizonSec = 3600L).collect()
      .map { case Row(s: Long, n: String, u: Long, p: Long) => (s, n, u, p) }
    assert(got.toSeq === Seq(
      (1L, "signup", 4L, 1000000L),
      (2L, "view", 3L, 750000L),
      (3L, "click", 1L, 250000L),
      (4L, "purchase", 0L, 0L)))
  }

  test("eventFunnelSessionized: conversion counts only within one inactivity session; best session wins") {
    def ev(u: Long, t: String, hm: String) =
      (u, t, java.sql.Timestamp.valueOf(s"2024-01-01 $hm:00"))
    val events = Seq(
      // u1: full funnel inside one session
      ev(1, "signup", "00:00"), ev(1, "view", "00:10"),
      ev(1, "click", "00:20"), ev(1, "purchase", "00:30"),
      // u2: the view lands 2 h later — a NEW session with no signup
      ev(2, "signup", "00:00"), ev(2, "view", "02:00"),
      // u3: session 1 reaches view; session 2 (after a 2.5 h gap)
      // reaches click — the user's best session counts
      ev(3, "signup", "00:00"), ev(3, "view", "00:10"),
      ev(3, "signup", "03:00"), ev(3, "view", "03:10"), ev(3, "click", "03:20"),
      // u4: never signs up
      ev(4, "click", "01:00")
    ).toDF("user_id", "event_type", "ts")
    val got = Relational.eventFunnelSessionized(events).collect()
      .map { case Row(s: Long, n: String, u: Long, p: Long) => (s, n, u, p) }
    assert(got.toSeq === Seq(
      (1L, "signup", 3L, 1000000L),
      (2L, "view", 2L, 666666L),
      (3L, "click", 2L, 666666L),
      (4L, "purchase", 1L, 333333L)))
  }

  test("eventFunnelWindowed: an empty stream reports an honest 0-user funnel") {
    val empty = Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("user_id", "event_type", "ts")
    val got = Relational.eventFunnelWindowed(empty).collect()
      .map { case Row(s: Long, _: String, u: Long, p: Long) => (s, u, p) }
    assert(got.toSeq === (1L to 4L).map(s => (s, 0L, 0L)))
  }

  test("ordersUpsertApply: matched keys replaced once, inserts added, untouched rows preserved") {
    val orders = Tables.orders(spark, Sf0001)
    val base = orders.agg(count(lit(1)), sum(round(col("o_totalprice") * 100)).cast("long")).head()
    val nUpd = orders.filter(col("o_orderkey") % 10 === 0).count()
    val ins = orders.filter(col("o_orderkey") % 1000 === 1)
      .agg(count(lit(1)), coalesce(sum(round(col("o_totalprice") * 100)), lit(0L)).cast("long")).head()
    val got = Relational.ordersUpsertApply(orders).collect()
    val (gotN, gotCents) = (got.map(_.getLong(1)).sum, got.map(_.getLong(2)).sum)
    // row count: every update REPLACES (no growth), every insert adds
    assert(gotN === base.getLong(0) + ins.getLong(0))
    // checksum: +$1000 per updated row, plus the inserted rows' own sum
    assert(gotCents === base.getLong(1) + nUpd * 100000L + ins.getLong(1))
  }

  test("scd2FromOrders: versions chain per customer — valid_to + 1 = next valid_from, current version open") {
    val rows = Relational.scd2FromOrders(Tables.orders(spark, Sf0001)).collect()
      .map(r => (r.getLong(0), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.length === Tables.orders(spark, Sf0001).count())
    for ((_, versions) <- rows.groupBy(_._1)) {
      val chain = versions.sortBy(v => (v._2, v._3.getOrElse(Long.MaxValue)))
      // exactly one open-ended current version per key
      assert(chain.count(_._3.isEmpty) === 1)
      assert(chain.last._3.isEmpty)
      // each closed version ends immediately before its successor starts
      chain.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from, _)) => assert(to + 1 === from)
        case _ => ()
      }
    }
  }

  test("eventsResampleGapfill: missing buckets appear zero-filled and LOCF carries the last observation") {
    val ev = Seq(
      // type A: events in bucket 0 and bucket 2 of a 15-min grid — bucket 1 is a GAP
      (1L, "2024-01-01 00:05:00", 10L, "a", 2.0),
      (2L, "2024-01-01 00:40:00", 11L, "a", 5.0),
      // type B: only bucket 1 — buckets 0 and 2 exist via the global grid
      (3L, "2024-01-01 00:20:00", 12L, "b", 3.0))
      .toDF("event_id", "s", "user_id", "event_type", "value")
      .select(col("event_id"), col("s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val out = Relational.eventsResampleGapfill(ev).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val b0 = out.keys.map(_._2).min
    // dense grid: 3 buckets x 2 types, nothing missing
    assert(out.size === 6)
    // the gap bucket is materialized with zero count and LOCF of bucket 0's value
    assert(out(("a", b0 + 900)) === ((0L, 0L, 200L)))
    // observed buckets report their own sums; LOCF equals the current value there
    assert(out(("a", b0)) === ((1L, 200L, 200L)))
    assert(out(("a", b0 + 1800)) === ((1L, 500L, 500L)))
    // a type with no observation yet LOCFs 0, then carries its first one forward
    assert(out(("b", b0)) === ((0L, 0L, 0L)))
    assert(out(("b", b0 + 900)) === ((1L, 300L, 300L)))
    assert(out(("b", b0 + 1800)) === ((0L, 0L, 300L)))
  }

  test("tableColumnStats: one row per column with consistent bounds") {
    val rows = Relational.tableColumnStats(Tables.orders(spark, Sf0001)).collect()
    assert(rows.length === 6)
    val n = rows.head.getLong(1)
    for (r <- rows) {
      assert(r.getLong(1) === n, "every row reports the same row count")
      assert(r.getLong(2) === 0L, s"${r.getString(0)}: unexpected nulls in testdata")
      assert(r.getLong(3) >= 1L && r.getLong(3) <= n, s"${r.getString(0)}: ndv out of range")
      if (!r.isNullAt(4)) assert(r.getLong(4) <= r.getLong(5), s"${r.getString(0)}: min_num > max_num")
      else assert(r.getString(6) <= r.getString(7), s"${r.getString(0)}: min_str > max_str")
    }
    // the key column is unique: ndv == row count
    val okey = rows.find(_.getString(0) == "o_orderkey").get
    assert(okey.getLong(3) === n)
  }

  test("retentionCohorts: cohort = first-active week, cells share of cohort size") {
    def ev(u: Long, day: String) =
      (u, "view", java.sql.Timestamp.valueOf(s"2024-01-$day 12:00:00"))
    // weeks (Mondays): w0=01-01, w1=01-08, w2=01-15, w3=01-22
    val events = Seq(
      ev(1, "01"), ev(1, "09"), ev(1, "23"),  // cohort w0, offsets 0,1,3
      ev(2, "03"),                            // cohort w0, offset 0 only
      ev(3, "10"), ev(3, "16")                // cohort w1, offsets 0,1
    ).toDF("user_id", "event_type", "ts")
    val w0 = java.time.LocalDate.parse("2024-01-01")
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val w1 = w0 + 7 * 86400L
    val got = Relational.retentionCohorts(events).collect()
      .map { case Row(c: Long, o: Long, n: Long, p: Long) => (c, o, n, p) }
    assert(got.toSeq === Seq(
      (w0, 0L, 2L, 1000000L), (w0, 1L, 1L, 500000L), (w0, 3L, 1L, 500000L),
      (w1, 0L, 1L, 1000000L), (w1, 1L, 1L, 1000000L)))
  }

  test("PQ index layout: pruned, codes-only ADC search equals in-memory IVF-PQ") {
    val emb = Tables.embeddings(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-idx").toString
    Similarity.savePqIndex(emb, dir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val viaIndex = Similarity.pqSearchIndexed(spark, dir, queries)
    assert(viaIndex.collect().toSeq === Similarity.pqTopK(emb).collect().toSeq,
      "search over the persisted PQ layout must equal the in-memory result")
    val planStr = viaIndex.queryExecution.executedPlan.toString
    assert(planStr.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      s"cells scans must carry a cell partition filter:\n$planStr")
    // the ADC scan is the one that touches every row of the probed
    // cells — it must project codes WITHOUT embedding bytes (the 32×
    // read saving the layout exists for); the embedding scan only feeds
    // the broadcast-joined refine cut
    assert(planStr.contains("ReadSchema: struct<vec_id:bigint,codes:array<int>>"),
      s"ADC scan must read codes only, no embedding column:\n$planStr")
  }

  test("PQ index append: a grown tree searches like one built at once; compaction folds replays") {
    val emb = Tables.embeddings(spark, Sf0001)
    val atOnce = java.nio.file.Files.createTempDirectory("graft-pq-once").toString
    Similarity.savePqIndex(emb, atOnce)
    // grown: quantizer AND codebooks frozen from the full corpus first,
    // batches encoded with the index's own artifacts (geometry contract)
    val grown = java.nio.file.Files.createTempDirectory("graft-pq-grown").toString
    Similarity.saveQuantizer(emb, s"$grown/quantizer")
    Similarity.savePqBooks(spark, Similarity.pqBooksFor(emb), s"$grown/books")
    Similarity.appendToPqIndex(emb.filter(col("vec_id") % 2 === 0), grown)
    Similarity.appendToPqIndex(emb.filter(col("vec_id") % 2 === 1), grown)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val clean = Similarity.pqSearchIndexed(spark, grown, queries).collect().toSeq
    assert(clean === Similarity.pqSearchIndexed(spark, atOnce, queries).collect().toSeq,
      "a PQ index built by appends must search identically to one built at once")
    // replayed append corrupts top-k; the shared cell-tree compaction is
    // the repair (schema-agnostic: it rewrites whole cells, codes included)
    Similarity.appendToPqIndex(emb.filter(col("vec_id") % 2 === 1), grown)
    assert(Similarity.pqSearchIndexed(spark, grown, queries).collect().toSeq !== clean)
    Similarity.compactIvfIndex(spark, grown)
    assert(Similarity.pqSearchIndexed(spark, grown, queries).collect().toSeq === clean,
      "compaction must fold replay duplicates and restore the clean answer")
    // the delta-merge works on the PQ layout unchanged (the cell-tree
    // rewrite is schema-agnostic): take down every neighbor the current
    // searches return and none may surface again
    val gone = clean.map(_.getLong(1)).toSet
    Similarity.removeFromIvfIndex(spark, grown, gone.toSeq.toDF("vec_id"))
    val after = Similarity.pqSearchIndexed(spark, grown, queries).collect()
    assert(after.nonEmpty && after.map(_.getLong(1)).toSet.intersect(gone) === Set.empty,
      "a removed vector must never be returned by a PQ search")
  }

  test("doc_lexical_ann_pq: text vectors through the persisted PQ layout — pruned, codes-only, exact vs in-memory") {
    // pqTopK below trains the doc-vector models into the DEFAULT slot —
    // a second model key there (by design) trips the ambiguity guard, so
    // clear at the end like the semanticDedup test does
    try lexicalAnnPqBody()
    finally graft.operators.Similarity.clearSessionState()
  }

  private def lexicalAnnPqBody(): Unit = {
    val docs = Tables.documents(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-lexpq").toString
    val viaIndex = graft.operators.TextAnalysis.lexicalAnnPq(docs, dir)
    // the same plan guarantees as the embeddings-table PQ layout carry
    // over to the text composition: probed-cell partition pruning, and an
    // ADC scan that projects codes WITHOUT the (here 256-byte) vector
    val planStr = viaIndex.queryExecution.executedPlan.toString
    assert(planStr.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      s"lexical PQ cells scans must carry a cell partition filter:\n$planStr")
    assert(planStr.contains("ReadSchema: struct<vec_id:bigint,codes:array<int>>"),
      s"lexical ADC scan must read codes only, no embedding column:\n$planStr")
    // end-to-end equality: the persisted composition answers exactly like
    // the in-memory IVF-PQ over the same derived vectors (same models —
    // the plan-keyed caches make pqTopK reuse the composition's fit)
    val vecs = graft.operators.TextAnalysis.lexicalVectors(docs)
    assert(viaIndex.collect().toSeq === Similarity.pqTopK(vecs).collect().toSeq,
      "lexicalAnnPq must equal in-memory pqTopK over the hashed-TF vectors")
  }

  test("ann_ivfpq_topk: returned scores are exact, and PQ recall tracks the exact IVF top-3") {
    val emb = Tables.embeddings(spark, Sf0001)
    // re-ranked scores must BE brute-force scores (the refine stage is exact)
    val brute = Similarity.bruteForceTopK(emb, nQueries = 5, k = 499).collect()
      .map { case Row(q: Long, n: Long, _, c: Double) => (q, n) -> c }.toMap
    val pq = Similarity.pqTopK(emb).collect()
      .map { case Row(q: Long, n: Long, _, c: Double) => (q, n) -> c }
    assert(pq.nonEmpty)
    pq.foreach { case ((q, n), c) => assert(brute((q, n)) === c, s"pair ($q,$n)") }
    // recall: the cosine-normalized ADC + 32-wide refine cut recovers the
    // exact-scored IVF top-3 (same probed cells) — measured 15/15 on this
    // corpus; pinned at ≥80% so codebook-training jitter can't flake it
    val ivf = Similarity.ivfTopK(emb).collect()
      .map { case Row(q: Long, n: Long, _, _) => (q, n) }.toSet
    val hit = pq.map(_._1).count(ivf.contains)
    assert(hit * 10 >= ivf.size * 8, s"PQ recall too low: $hit of ${ivf.size}")
  }

  test("pq_code_stats: per-subspace shares sum to ~1e6 ppm and every vector is coded") {
    val emb = Tables.embeddings(spark, Sf0001)
    val stats = Similarity.pqCodeStats(emb).collect()
      .map { case Row(m: Long, code: Long, n: Long, ppm: Long) => (m, code, n, ppm) }
    assert(stats.map(_._1).distinct.sorted.toSeq === (0L until Similarity.PqSubspaces))
    assert(stats.forall(s => s._2 >= 0 && s._2 < Similarity.PqCodes))
    val full = emb.filter(size(col("embedding")) === 64).count()
    stats.groupBy(_._1).foreach { case (m, rows) =>
      assert(rows.map(_._3).sum === full, s"subspace $m must code the whole corpus")
      val ppm = rows.map(_._4).sum
      assert(ppm <= 1000000L && ppm > 1000000L - rows.length,
        s"subspace $m integer-floor shares must sum to just under 1e6 ppm, got $ppm")
    }
  }

  test("ann_ivfpq_topk oracle is wired: after the query runs, oracleSql embeds the codebooks") {
    Similarity.clearSessionState()
    assert(SparkEntry.queries("ann_ivfpq_topk")(spark, Sf0001).count() > 0)
    val sql = SparkEntry.oracleSql.get("ann_ivfpq_topk")
    assert(sql.nonEmpty, "oracleSql must contain ann_ivfpq_topk once books are trained")
    assert(sql.get.contains("'::DOUBLE"), "oracle SQL must inline codebook float literals")
    assert(SparkEntry.oracleSql.contains("pq_code_stats"))
  }

  test("ann_ivf_topk oracle is wired: after the query runs, oracleSql embeds the centroids") {
    // regression guard for the round-5 dead-code bug: the oracle generator
    // existed but was never merged into oracleSql, so the driver silently
    // downgraded ann_ivf_topk to a rows-only check.
    // clear first: a prior suite may have trained a synthetic-corpus
    // quantizer, and two keys (correctly) blank the oracle slot — this
    // test asserts the RE-ESTABLISHMENT path the docstring promises
    Similarity.clearSessionState()
    assert(SparkEntry.queries("ann_ivf_topk")(spark, Sf0001).count() > 0)
    val sql = SparkEntry.oracleSql.get("ann_ivf_topk")
    assert(sql.nonEmpty, "oracleSql must contain ann_ivf_topk once a quantizer is trained")
    assert(sql.get.contains("'::DOUBLE"), "oracle SQL must inline centroid float literals")
  }

  test("quantizer artifact round-trips through parquet and searches identically") {
    val emb = Tables.embeddings(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-model").toString
    Similarity.saveQuantizer(emb, dir)
    val loaded = Similarity.loadQuantizer(spark, dir)
    val inSession = Similarity.quantizerFor(emb)
    assert(loaded.length === inSession.length)
    loaded.zip(inSession).foreach { case (a, b) => assert(a.sameElements(b)) }
    val direct = Similarity.ivfTopK(emb, nQueries = 3, k = 3).collect().toSeq
    val viaArtifact = Similarity.ivfTopKWith(emb, loaded, nQueries = 3, k = 3).collect().toSeq
    assert(direct === viaArtifact)
  }

  test("percentile bound gate: every (segment, p) verdict is 1 with a real bracket") {
    val o = Tables.orders(spark, Sf0001)
    val c = Tables.customer(spark, Sf0001)
    val rows = Relational.percentilesBySegmentApproxCheck(o, c).collect()
    assert(rows.length === 20) // 5 segments × 4 percentiles
    rows.foreach { case Row(_, _, lo: Long, hi: Long, w: Long) =>
      assert(lo <= hi, "the p±1 bracket must be ordered")
      assert(w === 1L, "the sketch must land inside its p±1-percent bracket")
    }
  }

  test("approx percentiles stay within 2% relative error of the exact two-pass") {
    val o = Tables.orders(spark, Sf0001)
    val c = Tables.customer(spark, Sf0001)
    val exact = Relational.percentilesBySegment(o, c).collect()
      .map { case Row(s: String, p: Long, v: Long) => (s, p) -> v }.toMap
    val approx = Relational.percentilesBySegmentApprox(o, c).collect()
    assert(approx.nonEmpty)
    approx.foreach { case Row(s: String, p: Long, v: Long) =>
      val e = exact((s, p))
      assert(math.abs(v - e).toDouble <= 0.02 * e, s"($s, p$p): approx $v vs exact $e")
    }
  }

  test("ivf on an empty corpus returns the empty result, not a training crash") {
    val emb = Tables.embeddings(spark, Sf0001).filter(col("vec_id") < 0)
    val got = Similarity.ivfTopK(emb)
    assert(got.columns.toSeq === Seq("query_id", "neighbor_id", "rank", "cos_sim"))
    assert(got.count() === 0L)
  }

  test("lsh bucket search returns a subset of brute-force candidates' scores") {
    val emb = Tables.embeddings(spark, Sf0001)
    val brute = Similarity.bruteForceTopK(emb, nQueries = 3, k = 200).collect()
      .map { case Row(q: Long, n: Long, _, c: Double) => (q, n) -> c }.toMap
    val lsh = Similarity.lshTopK(emb, nQueries = 3, k = 3).collect()
    lsh.foreach { case Row(q: Long, n: Long, _, c: Double) =>
      assert(brute.get((q, n)).forall(_ === c), s"pair ($q,$n)")
    }
  }

  // LAST in the suite on purpose: training on this second corpus puts a
  // second key in the quantizer slot, which (correctly) degrades the IVF
  // oracle for the rest of the session — the oracle-wired test above must
  // run before it.
  test("degenerate embedding rows (null/empty/zero/short) never kill a similarity operator") {
    val vecs = Seq(
      (0L, Array(1f, 2f, 3f, 4f, 1f, 2f, 3f, 4f)),
      (1L, null.asInstanceOf[Array[Float]]),
      (2L, Array.empty[Float]),
      (3L, Array(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (4L, Array(1f, 2f)) // ragged: shorter than the corpus dim
    ).toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(vecs, nQueries = 1, k = 3).count() >= 1)
    assert(Similarity.lshTopK(vecs, nQueries = 1, k = 3).count() >= 0)
    assert(Similarity.lshMultiProbeTopK(vecs, nQueries = 1, k = 3).count() >= 0)
    assert(Similarity.ivfTopK(vecs, nQueries = 1, k = 3).count() >= 1)
    assert(Similarity.bucketStats(vecs).count() >= 1)
    assert(Similarity.normStats(vecs).count() >= 1)
    // zero/null/empty vectors have no direction: excluded, not fatal
    assert(graft.operators.Dedup.embeddingNearDup(vecs).count() === 0)
  }

  test("clickPurchaseRangeJoin: inclusive start, exclusive end, cross-bucket matches, per-click attribution") {
    val ev = Seq(
      // user 1: one purchase BEFORE any click — never attributed
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 1.0),
      (10L, "2024-01-01 00:30:00", 1L, "click", 0.0),
      (2L, "2024-01-01 00:30:00", 1L, "purchase", 2.0),  // gap 0 (inclusive)
      (3L, "2024-01-01 01:29:59", 1L, "purchase", 3.0),  // gap 3599; lands in C1's SECOND hour bucket
      (4L, "2024-01-01 01:30:00", 1L, "purchase", 4.0),  // gap 3600 — exclusive end, not C1's
      (11L, "2024-01-01 01:00:00", 1L, "click", 0.0),    // window [01:00, 02:00): matches 3 and 4
      (12L, "2024-01-01 05:00:00", 2L, "click", 0.0),    // no purchases: absent (inner join)
      (5L, "2024-01-01 00:45:00", 3L, "purchase", 9.0)   // no click for user 3: absent
    ).toDF("event_id", "s", "user_id", "event_type", "value")
      .select(col("event_id"), col("s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val got = Sessionize.clickPurchaseRangeJoin(ev).collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(
      10L -> ((2L, 500L, 0L)),     // purchases 2 + 3; first gap 0
      11L -> ((2L, 700L, 1799L)))) // purchases 3 + 4; first gap 29:59
  }

  test("ordersPriceHistogram: 100 distinct $100-values split into 20 buckets of exactly 5") {
    val orders = (1 to 100).map(i => (i.toLong, 1L, "1995-01-01", i * 100.0))
      .toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        col("d").cast("timestamp").as("o_orderdate"), col("o_totalprice"))
    val got = Relational.ordersPriceHistogram(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 20)
    assert(got.forall(_._2 === 5L))                 // equi-depth: 5 orders per bucket
    assert(got.map(_._1).toSeq === (1L to 20L))     // dense bucket ids
    // bucket bounds tile the domain without overlap
    got.sliding(2).foreach { case Array(a, b) => assert(a._4 < b._3); case _ => }
  }

  test("dailyRevenueRankStats: four days rank into four quartiles with integer percent ranks") {
    val orders = Seq(
      (1L, 1L, "2024-01-01", 40.0), (2L, 1L, "2024-01-02", 30.0),
      (3L, 1L, "2024-01-03", 20.0), (4L, 1L, "2024-01-04", 10.0)
    ).toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        col("d").cast("timestamp").as("o_orderdate"), col("o_totalprice"))
    val got = Relational.dailyRevenueRankStats(orders).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    // days ordered by date = revenue descending in this fixture
    assert(got.toSeq === Seq(
      (4000L, 1L, 1L, 0L), (3000L, 2L, 2L, 333L),
      (2000L, 3L, 3L, 666L), (1000L, 4L, 4L, 1000L)))
  }

  test("joinSizeEstimate equals the materialized join's exact cardinality") {
    val left = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "pay")
    val right = Seq((1L, "a"), (3L, "b"), (3L, "c")).toDF("j", "pay2")
    val est = graft.operators.Skew.joinSizeEstimate(left, "k", right, "j").head()
    val actual = left.join(right, col("k") === col("j")).count()
    assert(est.getLong(1) === actual)            // join_rows is EXACT, not an estimate
    assert((est.getLong(0), est.getLong(2)) === ((1L, 2L))) // one matching key, contributing 2 rows
  }

  test("clusterSizeHistogram counts near-dup families by size; singletons are absent") {
    val text = "one two three four five six seven eight"
    val docs = Seq(
      (0L, text, "s"), (1L, text, "s"), (2L, text, "s"),         // family of 3
      (10L, "red green blue yellow purple orange pink", "s"),
      (11L, "red green blue yellow purple orange pink", "s"),     // family of 2
      (20L, "totally different words here entirely unrelated", "s") // singleton
    ).toDF("doc_id", "text", "source")
    val got = Dedup.clusterSizeHistogram(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(2L -> 1L, 3L -> 1L))
    Dedup.clearSessionState()
  }

  test("lastTouchAttribution: latest in-horizon touch wins, stale/no-touch goes 'direct', conservation holds") {
    val t0 = 1704067200L
    def ev(id: Long, u: Long, sec: Long, tpe: String, v: Double) =
      (id, u, new java.sql.Timestamp(sec * 1000L), tpe, v)
    val events = Seq(
      ev(10L, 1L, t0, "view", 0.0),
      ev(11L, 1L, t0 + 100, "click", 0.0),
      ev(12L, 1L, t0 + 200, "purchase", 1.0),     // latest touch: click
      ev(20L, 2L, t0, "click", 0.0),
      ev(21L, 2L, t0 + 86401, "purchase", 2.0),   // touch outside 24h: direct
      ev(30L, 3L, t0 + 50, "purchase", 3.0),      // no touch at all: direct
      ev(40L, 4L, t0, "view", 0.0),
      ev(41L, 4L, t0, "click", 0.0),
      ev(42L, 4L, t0, "purchase", 4.0)            // same-second: highest-id touch (click) wins
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Sessionize.lastTouchAttribution(events).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map("click" -> ((2L, 500L)), "direct" -> ((2L, 500L))))
    // conservation: attributed conversions sum to the purchase count
    assert(got.values.map(_._1).sum === 4L)
  }

  test("customerTrailingFeatures: strictly-before RANGE frame, same-day peers excluded, 90-day horizon") {
    val orders = Seq(
      (1L, 1L, "2024-01-01", 10.0),
      (2L, 1L, "2024-01-15", 20.0), // trailing: order 1 only (14 days back)
      (3L, 1L, "2024-01-15", 30.0), // same day as 2: peer EXCLUDED by the value frame
      (4L, 1L, "2024-06-01", 40.0), // > 90 days since Jan 15: trailing window empty
      (5L, 2L, "2024-01-10", 50.0)  // first order of its customer
    ).toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        col("d").cast("timestamp").as("o_orderdate"), col("o_totalprice"))
    val got = Relational.customerTrailingFeatures(orders).collect()
      .map(r => (r.getLong(0),
        (r.getLong(3), r.getLong(4), if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(got === Map(
      1L -> ((0L, 0L, -1L)),
      2L -> ((1L, 1000L, 14L)),
      3L -> ((1L, 1000L, 0L)),   // same-day peer invisible; gap to prev row is 0 days
      4L -> ((0L, 0L, 138L)),    // leakage-free: nothing older than 90 days leaks in
      5L -> ((0L, 0L, -1L))))
  }

  test("daily-revenue materialized aggregate: N deltas equal the full recompute; replays are ledgered no-ops") {
    val orders = Tables.orders(spark, Sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inc = java.nio.file.Files.createTempDirectory("dailyrev_inc").toString
    Relational.saveDailyRevenue(orders.filter("o_orderkey % 3 = 0"), inc)
    Relational.applyDailyRevenueDelta(spark, inc, orders.filter("o_orderkey % 3 = 1"), 1L)
    Relational.applyDailyRevenueDelta(spark, inc, orders.filter("o_orderkey % 3 = 2"), 2L)
    // re-delivery of batch 1: the ledger must make this a no-op
    Relational.applyDailyRevenueDelta(spark, inc, orders.filter("o_orderkey % 3 = 1"), 1L)
    val full = java.nio.file.Files.createTempDirectory("dailyrev_full").toString
    Relational.saveDailyRevenue(orders, full)
    assert(rows(Relational.loadDailyRevenue(spark, inc)) ===
      rows(Relational.loadDailyRevenue(spark, full)))
  }

  test("daily-revenue swap crash window: a missing live tree recovers from old on the next load/apply") {
    val orders = Tables.orders(spark, Sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val path = java.nio.file.Files.createTempDirectory("dailyrev_crash").toString
    Relational.saveDailyRevenue(orders.filter("o_orderkey % 2 = 0"), path)
    val committed = rows(Relational.loadDailyRevenue(spark, path))
    // simulate a crash BETWEEN the two renames: live was staged out to
    // old, stage never swapped in — readers see no live tree at all
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$path/live"),
      new org.apache.hadoop.fs.Path(s"$path/old")))
    // load recovers the last committed state instead of failing
    assert(rows(Relational.loadDailyRevenue(spark, path)) === committed)
    // and a re-delivered apply lands on the recovered tree cleanly
    Relational.applyDailyRevenueDelta(spark, path, orders.filter("o_orderkey % 2 = 1"), 7L)
    val full = java.nio.file.Files.createTempDirectory("dailyrev_crash_full").toString
    Relational.saveDailyRevenue(orders, full)
    assert(rows(Relational.loadDailyRevenue(spark, path)) ===
      rows(Relational.loadDailyRevenue(spark, full)))
  }

  test("rfmSegments: nearest-rank fences put four distinct spenders in four monetary quartiles") {
    val orders = Seq(
      (1L, 1L, "2024-01-01", 1000.0),
      (2L, 2L, "2024-01-01", 2000.0),
      (3L, 3L, "2024-01-01", 3000.0),
      (4L, 4L, "2024-01-01", 4000.0)
    ).toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        col("d").cast("timestamp").as("o_orderdate"), col("o_totalprice"))
    val got = Relational.rfmSegments(orders).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    // identical recency/frequency collapse to quartile 1; monetary spreads 1..4
    assert(got === Map(
      (1L, 1L, 1L) -> 1L, (1L, 1L, 2L) -> 1L, (1L, 1L, 3L) -> 1L, (1L, 1L, 4L) -> 1L))
  }

  test("scd2TemporalJoin equals the as-of join on every matched event (interval ≡ most-recent-at-or-before)") {
    val orders = Tables.orders(spark, Sf0001)
    val events = Tables.events(spark, Sf0001)
    val viaInterval = Relational.scd2TemporalJoin(orders, events)
      .select(col("event_id"), col("version_orderkey"))
    val viaAsof = Sessionize.asofJoinOrders(events, orders)
      .filter(col("asof_orderkey").isNotNull)
      .select(col("event_id"), col("asof_orderkey").as("version_orderkey"))
    assert(viaInterval.except(viaAsof).count() === 0L)
    assert(viaAsof.except(viaInterval).count() === 0L)
    assert(viaInterval.count() > 0L)
    // intervals partition time per key: at most one version per event
    assert(viaInterval.groupBy("event_id").count().filter(col("count") > 1).count() === 0L)
  }

  test("cdcApplyChanges: highest-seq op wins — a key updated then deleted is gone") {
    def o(k: Long, status: String, price: Double) =
      (k, 1L, status, price, java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), "x")
    // key 70: divisible by 10 AND 7 → gets U (seq 2) and D (seq 3); D wins
    // key 10: U only → survives with +1000; key 3: untouched
    val orders = Seq(o(70, "A", 100.0), o(10, "A", 200.0), o(3, "B", 50.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    val got = Relational.cdcApplyChanges(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "A" -> ((1L, 120000L)),  // key 70 deleted; key 10 updated to $1200
      "B" -> ((1L, 5000L))))   // key 3 untouched
  }

  test("funnelTimeToConvert: delays ride the greedy chain; counts agree with the windowed funnel") {
    def ev(id: Long, sec: Long, u: Long, t: String) =
      (id, new java.sql.Timestamp(sec * 1000L), u, t)
    val events = Seq(
      ev(1, 0, 1, "signup"), ev(2, 100, 1, "view"), ev(3, 700, 1, "click"),
      ev(4, 700 + 85600, 1, "purchase"),       // within horizon of the click
      ev(5, 0, 2, "signup"), ev(6, 50, 2, "view"),
      ev(7, 10, 3, "view")                     // no signup: never enters
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Relational.funnelTimeToConvert(events).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      (1L, "signup->view") -> ((2L, 50L, 100L)),       // delays {100, 50}: p50 rank-1 = 50
      (2L, "view->click") -> ((1L, 600L, 600L)),
      (3L, "click->purchase") -> ((1L, 85600L, 85600L))))
    // the two reports derive from the SAME completion chain: transition
    // counts equal the windowed funnel's step populations
    val funnel = Relational.eventFunnelWindowed(events).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got((1L, "signup->view"))._1 === funnel(2L))
    assert(got((3L, "click->purchase"))._1 === funnel(4L))
  }

  test("lineitemMetricsUnpivot: melt is the exact UNION-ALL relation, per (flag, metric)") {
    val li = Seq(
      ("A", 5.0, 100.50, 0.05, 0.02),
      ("A", 3.0, 200.25, 0.10, 0.04),
      ("R", 1.0, 50.00, 0.00, 0.08)
    ).toDF("l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = Relational.lineitemMetricsUnpivot(li).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size === 8) // 2 flags × 4 metrics
    assert(got(("A", "l_quantity")) === ((2L, 800L, 300L, 500L)))
    assert(got(("A", "l_extendedprice")) === ((2L, 30075L, 10050L, 20025L)))
    assert(got(("A", "l_discount")) === ((2L, 15L, 5L, 10L)))
    assert(got(("R", "l_tax")) === ((1L, 8L, 8L, 8L)))
  }

  test("userStickinessDaily: a pair serves exactly its 7 trailing windows; clip at max day") {
    // user 1 active on day 0 only; user 2 active on days 0 and 9; max day = 9
    def ev(id: Long, day: Long, u: Long) =
      (id, new java.sql.Timestamp(day * 86400000L), u)
    val events = Seq(ev(1, 0, 1), ev(2, 0, 2), ev(3, 9, 2))
      .toDF("event_id", "ts", "user_id")
    val got = Relational.userStickinessDaily(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // windows 0..6 carry both day-0 users; days 7-8 have no window membership
    // (day-0 pairs expired, day-9 not yet); day 9 carries only user 2
    assert(got.keySet === (0L to 6L).toSet + 9L)
    assert(got(0L) === ((2L, 2L, 1000000L))) // dau 2, wau 2
    assert(got(6L) === ((0L, 2L, 0L)))       // no activity, window still alive
    assert(got(9L) === ((1L, 1L, 1000000L))) // fresh window, clip kept day ≤ 9
  }

  test("orderValueWinsorized: fences clamp exactly the outliers, sums reflect the clamp") {
    // segment S: 20 orders at $100..$2000 (quantized buckets 1..20);
    // p5 fence = bucket 1 → $100, p95 = bucket 19 → $1900: exactly one
    // order clamps high, none low (min is the fence itself)
    val orders = (1 to 20).map(i => (i.toLong, i.toLong, "1995-01-01", i * 100.0))
      .toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"),
        col("d").cast("timestamp").as("o_orderdate"), col("o_totalprice"))
    val customer = (1 to 20).map(i => (i.toLong, "S")).toDF("c_custkey", "c_mktsegment")
    val r = Relational.orderValueWinsorized(orders, customer).collect()
    assert(r.length === 1)
    val Row(_, n, sumC, sumW, nLo, nHi, lo, hi) = r.head
    assert(n === 20L)
    assert(lo === 10000L && hi === 190000L)
    assert(nLo === 0L && nHi === 1L) // only the $2000 order exceeds the p95 fence
    assert(sumC === (1 to 20).map(_ * 10000L).sum)
    assert(sumW === sumC.asInstanceOf[Long] - 10000L) // $2000 clamped to $1900
  }

  test("anomalySessionImpact: a session spanning an hour boundary reports in both flagged hours") {
    import graft.operators.Audit
    // background: 9 quiet hours × 1 event for type 'click' establish a
    // median of 1/hour; hour 10 gets a 50-event burst → flagged. The
    // bursty hour's only sessions: user 1 (entirely inside hour 10) and
    // user 2 (starts hour 9, ends hour 10 — overlap counts it too).
    val bg = (0 until 9).map(h =>
      (100L + h, new java.sql.Timestamp(h * 3600000L), 99L, "click"))
    val burst = (0 until 50).map(i =>
      (200L + i, new java.sql.Timestamp(10L * 3600000L + i * 1000L), 1L, "click"))
    val spanner = Seq(
      (300L, new java.sql.Timestamp(9L * 3600000L + 3500 * 1000L), 2L, "click"),
      (301L, new java.sql.Timestamp(10L * 3600000L + 100 * 1000L), 2L, "click"))
    val events = (bg ++ burst ++ spanner)
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Audit.anomalySessionImpact(events).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val h10 = 10L * 3600L
    assert(got.contains(h10), s"burst hour missing from ${got.keySet}")
    // hour 10: user 1's 50-event session + user 2's spanning 2-event session
    assert(got(h10) === ((2L, 2L, 52L)))
    // the quiet background hours are not flagged
    assert(!got.contains(0L) && !got.contains(3600L))
  }

  // ---- correlated-subquery suite: each decorrelated shape pinned on a
  // fixture where the subtle boundary (strict >, exactly-one, zero-match
  // row) is exercised by hand-computed values ----

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("latePriorityDistribution: semi join counts an order once; +30 days exactly is NOT late") {
    val orders = Seq(
      (1L, ts("2020-01-01"), "1-URGENT"), // two late lines -> counted ONCE
      (2L, ts("2020-01-01"), "1-URGENT"), // on time
      (3L, ts("2020-01-01"), "2-HIGH"),   // +30 days exactly: strict > excludes
      (4L, ts("2020-01-01"), "2-HIGH")    // +31 days: late
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, ts("2020-02-15")), (1L, ts("2020-03-01")),
      (2L, ts("2020-01-20")),
      (3L, ts("2020-01-31")),
      (4L, ts("2020-02-01"))
    ).toDF("l_orderkey", "l_shipdate")
    val got = Relational.latePriorityDistribution(orders, li).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1-URGENT" -> 1L, "2-HIGH" -> 1L))
  }

  test("brandRevenueAboveAverage: strict above-average by integer cross-multiply; exact-average brand excluded") {
    val part = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("p_partkey", "p_brand")
    val li = Seq(
      (1L, 300.0), (2L, 100.0), (3L, 200.0) // avg = $200: C sits EXACTLY on it
    ).toDF("l_partkey", "l_extendedprice")
    val got = Relational.brandRevenueAboveAverage(li, part).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("A", 30000L, 500000L))) // 30000/60000 cents = 500000 ppm
  }

  test("customerOrderDistribution: zero-order customers land in the 0 bucket, not the 1 bucket") {
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq((1L, 11L), (1L, 12L), (2L, 21L)).toDF("o_custkey", "o_orderkey")
    val got = Relational.customerOrderDistribution(cust, orders).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("smallQuantityRevenue: below half the part's OWN average, never the global one") {
    val part = Seq((1L, "X"), (2L, "Y")).toDF("p_partkey", "p_brand")
    val li = Seq(
      (1L, 1.0, 10.00), (1L, 10.0, 99.0), (1L, 10.0, 99.0), // part avg 7: qty 1 < 3.5
      (2L, 5.0, 50.0), (2L, 5.0, 50.0)                      // part avg 5: nothing below 2.5
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val got = Relational.smallQuantityRevenue(li, part).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("X", 1L, 1000L)))
  }

  test("soleLateSupplier: blamed only when late-count is EXACTLY 1 in a multi-supplier F order") {
    val orders = Seq(
      (1L, "F", ts("2020-01-01")), // supp 10 late, supp 20 on time -> blame 10
      (2L, "F", ts("2020-01-01")), // both late -> nobody sole
      (3L, "F", ts("2020-01-01")), // single-supplier order -> excluded
      (4L, "O", ts("2020-01-01"))  // not finished -> excluded
    ).toDF("o_orderkey", "o_orderstatus", "o_orderdate")
    val li = Seq(
      (1L, 10L, ts("2020-02-15")), (1L, 20L, ts("2020-01-05")),
      (2L, 10L, ts("2020-02-15")), (2L, 20L, ts("2020-02-15")),
      (3L, 10L, ts("2020-02-15")),
      (4L, 20L, ts("2020-02-15")), (4L, 30L, ts("2020-01-02"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supplier = Seq((10L, "S10"), (20L, "S20"), (30L, "S30"))
      .toDF("s_suppkey", "s_name")
    val got = Relational.soleLateSupplier(orders, li, supplier).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((10L, "S10", 1L)))
  }

  test("discountBandRevenue: band edges inclusive, quantity cap strict, year half-open") {
    val li = Seq(
      (ts("1996-06-01"), 0.05, 10.0, 100.0), // lower band edge: in (+500 cents)
      (ts("1996-06-01"), 0.07, 23.0, 100.0), // upper band edge: in (+700)
      (ts("1996-06-01"), 0.08, 10.0, 100.0), // above band: out
      (ts("1996-06-01"), 0.06, 24.0, 100.0), // qty 24: strict < excludes
      (ts("1995-12-31"), 0.06, 10.0, 100.0)  // prior year: out
    ).toDF("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
    val got = Relational.discountBandRevenue(li).collect().head
    assert((got.getLong(0), got.getLong(1)) === ((2L, 1200L)))
  }

  test("nationTradeMatrix: intra-nation trade excluded; supplier/customer legs labeled correctly") {
    val nation = Seq((0, "N0"), (1, "N1")).toDF("n_nationkey", "n_name")
    val cust = Seq((1L, 0)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((10L, 0), (11L, 1)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq((100L, 1L)).toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (100L, 10L, ts("1996-05-01"), 999.0, 0.0), // supp nation == cust nation: out
      (100L, 11L, ts("1996-05-01"), 100.0, 0.0)
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val got = Relational.nationTradeMatrix(nation, cust, orders, li, supp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("N1", "N0", 1996L, 10000L)))
  }

  test("nationMarketShare: integer ppm of the target nation's supply within the region-year") {
    val region = Seq((0, "R0")).toDF("r_regionkey", "r_name")
    val nation = Seq((0, "NATION_0", 0), (1, "NATION_1", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val cust = Seq((1L, 0)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((10L, 0), (11L, 1)).toDF("s_suppkey", "s_nationkey")
    val orders = Seq((100L, 1L, ts("1996-03-01"))).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (100L, 10L, 100.0, 0.0), // NATION_0 supplier: 10000 cents of 40000
      (100L, 11L, 300.0, 0.0)
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val got = Relational.nationMarketShare(region, nation, cust, orders, li, supp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("R0", 1996L, 40000L, 250000L)))
  }

  test("returnedItemCustomers: only 'R' lines count; ranked by returned revenue") {
    val cust = Seq((1L, "A"), (2L, "B")).toDF("c_custkey", "c_mktsegment")
    val orders = Seq((100L, 1L), (200L, 2L)).toDF("o_orderkey", "o_custkey")
    val li = Seq(
      (100L, "R", 100.0, 0.0), (100L, "N", 999.0, 0.0),
      (200L, "R", 50.0, 0.0)
    ).toDF("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount")
    val got = Relational.returnedItemCustomers(cust, orders, li).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 10000L), (2L, 5000L)))
  }

  test("promoRevenueShare: promo numerator and total ride one aggregate; ppm is integer") {
    val part = Seq((1L, "PROMO"), (2L, "STANDARD")).toDF("p_partkey", "p_type")
    val li = Seq(
      (1L, ts("1997-02-01"), 100.0, 0.0),
      (2L, ts("1997-08-01"), 300.0, 0.0)
    ).toDF("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    val got = Relational.promoRevenueShare(li, part).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1997L, 10000L, 40000L, 250000L)))
  }

  test("bracketRevenue: the residual bracket test rejects envelope-passing mismatches") {
    val part = Seq((1L, "Brand#1", 3), (2L, "Brand#2", 8), (3L, "Brand#1", 10))
      .toDF("p_partkey", "p_brand", "p_size")
    val li = Seq(
      (1L, 5.0, 100.0, 0.0),  // bracket 1: in
      (1L, 20.0, 50.0, 0.0),  // qty inside the ENVELOPE but outside Brand#1's band
      (2L, 15.0, 200.0, 0.1), // bracket 2: in (180.00)
      (3L, 5.0, 999.0, 0.0),  // Brand#1 size 10: size band rejects
      (2L, 35.0, 999.0, 0.0)  // outside the quantity envelope entirely
    ).toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val got = Relational.bracketRevenue(li, part).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("Brand#1", 1L, 10000L), ("Brand#2", 1L, 18000L)))
  }

  test("linkPrediction: a shared neighbor predicts the missing link; closed triangles predict nothing") {
    import graft.operators.Graph
    // open wedge: 2-1-3 (each edge in 2 baskets) -> predict (2,3), jaccard 1.0
    val wedge = Seq((101L, 1L), (101L, 2L), (102L, 1L), (102L, 2L),
      (103L, 1L), (103L, 3L), (104L, 1L), (104L, 3L))
    // closed triangle 4-5-6: every candidate pair is already an edge
    val tri = Seq(201L -> (4L, 5L), 202L -> (4L, 5L), 203L -> (4L, 6L),
      204L -> (4L, 6L), 205L -> (5L, 6L), 206L -> (5L, 6L))
      .flatMap { case (o, (a, b)) => Seq((o, a), (o, b)) }
    val li = (wedge ++ tri).toDF("l_orderkey", "l_partkey")
    val got = Graph.linkPrediction(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((2L, 3L, 1L, 1000000L)))
  }

  test("aqp estimate: HT scale-up is exactly 16x the sample; constant values tie the two gates together") {
    import graft.operators.Approx
    // constant $100 orders: the revenue estimate must be EXACTLY 100x the
    // count estimate, and both gates reduce to the same inequality
    val orders = (1L to 2000L).map(k => (k, 100.0))
      .toDF("o_orderkey", "o_totalprice")
    val r = Approx.revenueEstimateCheck(orders).collect().head
    val (nExact, nEst) = (r.getLong(0), r.getLong(1))
    assert(nExact === 2000L)
    assert(nEst % 16 === 0L) // integer HT factor, never a float blow-up
    assert(r.getLong(5) === nEst * 100) // rev_est = 100 * n_est
    assert(r.getLong(2) === r.getLong(6)) // identical err ppm
    assert(r.getLong(3) === 1L && r.getLong(7) === 1L) // both gates pass
    // the deterministic sample: same input -> bit-identical output
    val again = Approx.revenueEstimateCheck(orders).collect().head
    assert(r === again)
  }

  test("aqp per-segment estimate exposes its own sample size and gate") {
    import graft.operators.Approx
    val orders = (1L to 2000L).map(k => (k, k, 100.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = (1L to 2000L).map(k => (k, if (k % 2 == 0) "EVEN" else "ODD"))
      .toDF("c_custkey", "c_mktsegment")
    val got = Approx.segmentRevenueEstimateCheck(orders, cust).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("EVEN", "ODD"))
    got.foreach { r =>
      assert(r.getLong(1) === 100000L) // 1000 orders x $100 exact
      assert(r.getLong(2) === r.getLong(4) * 1600) // est = 16 * n_sampled * $100
      assert(r.getLong(5) === 1L)
    }
  }

  test("paretoDays: within-count losers, cross-count dominated, and ties resolve correctly") {
    def o(day: String, price: Double) = (ts(day), price)
    val orders = (
      Seq.fill(3)(o("2020-01-01", 100.0)) ++             // (3, 300): frontier
      Seq(o("2020-01-02", 150.0), o("2020-01-02", 250.0)) ++ // (2, 400): frontier
      Seq(o("2020-01-03", 100.0), o("2020-01-03", 250.0)) ++ // (2, 350): beaten at n=2
      Seq(o("2020-01-04", 100.0)) ++                     // (1, 100): dominated by (2,400)
      Seq(o("2020-01-05", 50.0), o("2020-01-05", 100.0), o("2020-01-05", 100.0)) ++ // (3,250): beaten at n=3
      Seq(o("2020-01-06", 200.0), o("2020-01-06", 200.0))    // (2, 400) tie: neither dominates
    ).toDF("o_orderdate", "o_totalprice")
    val got = graft.operators.Approx.paretoDays(orders).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((3L, 300L), (2L, 400L), (2L, 400L)))
  }

  test("truncationRecall: recall is 1.0 when all signal lives in the kept prefix") {
    // suffix dims are zero -> the truncated ranking IS the full ranking
    def vec(seed: Int): Array[Float] =
      (Array.tabulate(16)(j => ((seed * 31 + j * 7) % 97 - 48).toFloat / 10f)
        ++ Array.fill(48)(0f))
    val emb = (0L to 4L).map(q => (q, vec(q.toInt)))
      .++((10L to 24L).map(i => (i, vec(i.toInt))))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.truncationRecall(emb).collect()
    assert(got.length === 5)
    got.foreach(r => assert(r.getLong(2) === 1000000L, s"query ${r.getLong(0)}"))
  }

  test("lshRecall: a one-bit bucket miss zeroes single-probe recall; multiprobe recovers it") {
    // query 0's true neighbors differ in exactly ONE sign bit (dim 1),
    // so they land one bucket away: invisible to single-probe, found by
    // the xor-probe. Decoys share the query's bucket but point the
    // other way.
    def v(dim1: Float, tail: Float): Array[Float] =
      Array(dim1) ++ Array.fill(7)(1f) ++ Array(tail) ++ Array.fill(55)(0f)
    val emb = (Seq(
      (0L, v(1f, 100f))) ++                       // the query
      (10L to 12L).map(i => (i, v(-1f, 100f + i))) ++ // near neighbors, bit-0 flipped
      (13L to 20L).map(i => (i, v(1f, -100f - i)))    // same-bucket decoys, anti-aligned
    ).toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.lshRecall(emb).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("lsh_single", 0L)) === 0L)
    assert(got(("lsh_multiprobe", 0L)) === 3L)
  }

  test("VARIANT extraction agrees row-for-row with the string-path JSON surface") {
    import graft.operators.UniqueUsers
    val ev = Tables.events(spark, Sf0001)
    val v = UniqueUsers.variantExtractStats(ev)
    val j = UniqueUsers.jsonExtractStats(ev)
    val vCore = v.drop("n_missing")
    assert(vCore.except(j).count() === 0L && j.except(vCore).count() === 0L)
    // the lenient accessor: a path absent from every record reads NULL
    // on every row, never an error
    v.collect().foreach(r => assert(r.getLong(5) === r.getLong(1)))
  }

  test("recursive-CTE reachability equals an independent driver-side BFS") {
    val got = GraftSql.reachabilityRecursiveSql(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent implementation: collect the (tiny at sf0.001) edge
    // relation and run a literal breadth-first search
    val baskets = Tables.lineitem(spark, Sf0001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = baskets.groupBy(_._1).values.toSeq
      .flatMap(b => b.map(_._2).sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(p => p).filter(_._2.size >= 2).keys.toSeq
    val adj = (und ++ und.map { case (u, v) => (v, u) })
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    var frontier = adj.keySet.filter(_ < 50)
    val hops = collection.mutable.Map(frontier.toSeq.map(_ -> 0L): _*)
    for (h <- 1 to 3) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)).filterNot(hops.contains)
      frontier.foreach(hops(_) = h.toLong)
    }
    assert(got === hops.toMap)
  }

  test("topQuarterSupplier: revenue ties BOTH win; out-of-quarter shipments excluded") {
    val supp = Seq((1L, "S1"), (2L, "S2"), (3L, "S3")).toDF("s_suppkey", "s_name")
    val li = Seq(
      (1L, ts("1996-02-01"), 100.0, 0.0), (1L, ts("1996-03-01"), 100.0, 0.0),
      (2L, ts("1996-01-15"), 200.0, 0.0), // exact tie with supplier 1
      (3L, ts("1996-02-01"), 150.0, 0.0),
      (3L, ts("1995-06-01"), 999.0, 0.0)  // outside the quarter: ignored
    ).toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val got = Relational.topQuarterSupplier(supp, li).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, "S1", 20000L), (2L, "S2", 20000L)))
  }

  test("largeVolumeOrders: HAVING is strict — an order at exactly the threshold is out") {
    val cust = Seq((1L, "A"), (2L, "B")).toDF("c_custkey", "c_mktsegment")
    val orders = Seq((10L, 1L, ts("1997-01-01")), (20L, 2L, ts("1997-02-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq(
      (10L, 100.0), (10L, 60.0), // 160 > 150: in
      (20L, 150.0)               // exactly 150: strict > excludes
    ).toDF("l_orderkey", "l_quantity")
    val got = Relational.largeVolumeOrders(cust, orders, li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq === Seq((10L, 1L, "A", 160L)))
  }

  test("Lifecycle.forget: doomed ids vanish from all three families; a crash-recovery re-run is a no-op") {
    import graft.operators.{Dedup, Lifecycle, Search, Similarity, TextAnalysis}
    val docs = Tables.documents(spark, Sf0001)
    val ivfPath = s"${System.getProperty("java.io.tmpdir")}/graft_fgtspec_ivf"
    Dedup.dropDedupIndex(spark, "fgt_t")
    Search.dropSearchIndex(spark, "fgt_ts")
    Dedup.saveDedupIndex(docs, "fgt_t")
    Search.saveSearchIndex(docs, "fgt_ts")
    Similarity.saveIvfIndex(TextAnalysis.lexicalVectors(docs), ivfPath, slot = "fgtspec")
    val doomed = docs.filter("doc_id % 7 = 2")
    Lifecycle.forget(spark, doomed, "fgt_t", "fgt_ts", ivfPath)
    def stateCounts() = (
      spark.table("fgt_t_fp").select("doc_id").distinct().count(),
      spark.table("fgt_ts_postings").select("doc_id").distinct().count(),
      spark.read.parquet(s"$ivfPath/cells").count())
    val afterFirst = stateCounts()
    // the recovery story for a crash between families: run it again
    Lifecycle.forget(spark, doomed, "fgt_t", "fgt_ts", ivfPath)
    assert(stateCounts() === afterFirst)
    val ids = doomed.select("doc_id")
    assert(spark.table("fgt_t_fp").join(ids, "doc_id").count() === 0L)
    assert(spark.table("fgt_ts_postings").join(ids, "doc_id").count() === 0L)
    assert(spark.read.parquet(s"$ivfPath/cells")
      .join(ids.withColumnRenamed("doc_id", "vec_id"), "vec_id").count() === 0L)
    // survivors intact: nothing over-deleted
    val expected = docs.count() - doomed.count()
    assert(afterFirst._1 === expected && afterFirst._2 === expected && afterFirst._3 === expected)
  }

  test("benfordAudit: hand-computed digit histogram; zero amounts excluded") {
    import graft.operators.Audit
    // cents: 100, 250, 19, 999, and a 0.0 that must not count
    val orders = Seq(1.00, 2.50, 0.19, 9.99, 0.0).map(Tuple1(_)).toDF("o_totalprice")
    val got = Audit.benfordAudit(orders).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got.size === 9) // all nine digits reported even when unobserved
    assert(got(1L) === ((2L, 500000L, 198971L))) // 100 and 19 lead with 1
    assert(got(2L) === ((1L, 250000L, 73909L)))
    assert(got(9L) === ((1L, 250000L, 204243L)))
    assert(got(5L)._1 === 0L && got(5L)._2 === 0L)
  }

  test("abSplitCheck: planted arm difference fires the gate; an all-convert corpus cannot (variance guard)") {
    import graft.operators.Audit
    // resolve each user's arm with the operator's own hash, then give
    // purchases only to arm A -> the difference is real and must read
    // significant
    val userArm = (1L to 400L).toDF("user_id")
      .selectExpr("user_id",
        "conv(substring(md5(concat_ws(':', 'ab', user_id)), 1, 4), 16, 10) % 2 = 0 AS isA")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    def ev(id: Long, u: Long, t: String, v: Double) =
      (id, new java.sql.Timestamp(id * 1000L), u, t, v)
    val planted = userArm.toSeq.zipWithIndex.flatMap { case ((u, isA), i) =>
      Seq(ev(i * 2L, u, "view", 1.0)) ++
        (if (isA) Seq(ev(i * 2L + 1, u, "purchase", 200.0)) else Seq.empty)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val fired = Audit.abSplitCheck(planted).collect().head
    assert(fired.getLong(2) === 1000000L) // rate A
    assert(fired.getLong(5) === 0L)       // rate B
    assert(fired.getLong(8) === 1L, "a real difference must be significant")
    // degenerate: EVERY user converts -> zero variance, equal rates; the
    // guard keeps 0 >= 0 from reading as significance
    val allConvert = (1L to 100L).map(u => ev(u, u, "purchase", 200.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(Audit.abSplitCheck(allConvert).collect().head.getLong(8) === 0L)
  }

  test("segmentTargetEncoding: each fold's encoding excludes exactly its own rows") {
    // resolve folds with the operator's own hash, then hand-compute the
    // out-of-fold means and compare
    val orders = (1L to 200L).map(k => (k, k % 2 + 1, if (k <= 100) 10.0 else 50.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Seq((1L, "SEG_A"), (2L, "SEG_B")).toDF("c_custkey", "c_mktsegment")
    val fold = orders
      .selectExpr("o_orderkey",
        "CAST(conv(substring(md5(concat_ws(':', 'fold', o_orderkey)), 1, 4), 16, 10) AS LONG) % 5 AS fold")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = (1L to 200L).map(k =>
      (if (k % 2 == 0) "SEG_A" else "SEG_B", fold(k), if (k <= 100) 1000L else 5000L))
    val expected = rows.groupBy(r => (r._1, r._2)).map { case ((cat, f), in) =>
      val all = rows.filter(_._1 == cat)
      val out = all.filterNot(_._2 == f)
      (cat, f) -> ((in.size.toLong, out.map(_._3).sum / out.size))
    }
    val got = Relational.segmentTargetEncoding(orders, cust).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
  }

  test("eventLagCorrelation: the scaled covariance matches hand arithmetic per lag") {
    def day(d: Int, t: String, n: Int) = (0 until n).map(_ =>
      (new java.sql.Timestamp(d * 86400000L), t))
    // clicks [5, 1, 4]; purchases are yesterday's clicks [_, 5, 1]
    val ev = (day(0, "click", 5) ++ day(1, "click", 1) ++ day(2, "click", 4) ++
      day(1, "purchase", 5) ++ day(2, "purchase", 1))
      .toDF("ts", "event_type")
    val got = Relational.eventLagCorrelation(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      -2L -> ((1L, 0L)), -1L -> ((2L, 15L)), 0L -> ((3L, -33L)),
      1L -> ((2L, 16L)), 2L -> ((1L, 0L))))
  }

  test("dormantRichCustomers: above the positive-balance average AND no recent order") {
    val cust = Seq(
      (1L, 100.0, "A"),  // below average
      (2L, 500.0, "A"),  // above; old order only -> dormant
      (3L, -50.0, "B"),  // negative: excluded from the average AND the result
      (4L, 200.0, "B"),  // below average (avg = $450)
      (5L, 1000.0, "B")  // above; recent order -> anti-joined away
    ).toDF("c_custkey", "c_acctbal", "c_mktsegment")
    val orders = Seq(
      (2L, ts("2000-06-01")), // predates the 2001-01-01 cutoff: still dormant
      (5L, ts("2001-05-01"))
    ).toDF("o_custkey", "o_orderdate")
    val got = Relational.dormantRichCustomers(cust, orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("A", 1L, 50000L)))
  }

  test("Md5Nibble5 is bit-identical to the conv(substring(md5)) column algebra") {
    val keys = Tables.lineitem(spark, Sf0001)
      .select(concat_ws(":", lit("psa"), col("l_partkey"), col("l_suppkey")).as("s"))
      .unionAll(Seq("", ":", "x", "psa:0:0", "a b c").toDF("s"))
    val diffs = keys.select(
      graft.plans.Md5Nibble5.md5Nibble5(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 5), 16, 10).cast("long").as("algebra"))
      .filter(col("native") =!= col("algebra"))
      .count()
    assert(diffs === 0L)
  }

  test("derivedPartsupp: one row per distinct pair, ranged values, deterministic") {
    val li = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("l_partkey", "l_suppkey")
    val ps = Relational.derivedPartsupp(li).collect()
    assert(ps.length === 3) // duplicates collapse
    ps.foreach { r =>
      val (aq, sc) = (r.getAs[Long]("ps_availqty"), r.getAs[Long]("ps_supplycost_cents"))
      assert(aq >= 1 && aq <= 10000)
      assert(sc >= 100 && sc <= 100000)
    }
    // key-derived, not row-derived: a second build yields identical values
    val again = Relational.derivedPartsupp(li).collect()
    assert(ps.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
  }

  test("supplierCountByPart: flagged (negative-balance) suppliers never counted") {
    val li = Seq((1L, 10L), (1L, 11L), (1L, 12L)).toDF("l_partkey", "l_suppkey")
    val part = Seq((1L, "Brand#2", "LARGE", 5)).toDF("p_partkey", "p_brand", "p_type", "p_size")
    val supp = Seq((10L, 50.0), (11L, -5.0), (12L, 0.0))
      .toDF("s_suppkey", "s_acctbal")
    val got = Relational.supplierCountByPart(part, supp, li).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("supplier_cnt") === 2L) // 11 anti-joined away
  }

  test("shipmodePriority: derived modes confined to MAIL/SHIP; date algebra honored") {
    val li = Tables.lineitem(spark, Sf0001)
    val orders = Tables.orders(spark, Sf0001)
    val got = Relational.shipmodePriority(orders, li).collect()
    assert(got.nonEmpty && got.length <= 2)
    got.foreach { r =>
      assert(Set("MAIL", "SHIP").contains(r.getString(0)))
      assert(r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count") > 0)
    }
  }

  test("minCostSupplier: every emitted (part, supplier) cost is that part's regional min, ties included") {
    val got = Relational.minCostSupplier(
      Tables.part(spark, Sf0001), Tables.supplier(spark, Sf0001),
      Tables.nation(spark, Sf0001), Tables.region(spark, Sf0001),
      Tables.lineitem(spark, Sf0001), k = 1000)
    val rows = got.collect()
    assert(rows.nonEmpty)
    // within the emitted relation every part appears only at one cost: its min
    val byPart = rows.groupBy(_.getAs[Long]("p_partkey"))
    byPart.values.foreach { g =>
      assert(g.map(_.getAs[Long]("ps_supplycost_cents")).distinct.length === 1)
    }
  }
}
