package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup-family behavior on planted duplicates (self-contained fixtures —
  * the sf tables' planted near-dups are covered by the DuckDB oracle). */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  // d0/d1: identical after normalization; d2/d3: near-dup (1 word of 30
  // differs); d4: unrelated.
  private val base = (1 to 30).map(i => s"w$i").mkString(" ")
  private val fixture = Seq(
    (0L, base, "s0"),
    (1L, "  " + base.toUpperCase + "  ", "s0"),
    (2L, base + " extraA", "s0"),
    (3L, base + " extraB", "s0"),
    (4L, (100 to 140).map(i => s"x$i").mkString(" "), "s0")
  ).toDF("doc_id", "text", "source")

  test("exactNormalized folds case/whitespace variants") {
    val got = Dedup.exactNormalized(fixture).collect()
      .map { case Row(id: Long, n: Long) => id -> n }.toMap
    assert(got(0L) === 2L) // d0+d1 folded
    assert(got.keySet === Set(0L, 2L, 3L, 4L))
  }

  test("minhashLsh finds the near-dup pair and nothing unrelated") {
    val pairs = Dedup.minhashLsh(fixture).collect()
      .map { case Row(a: Long, b: Long) => (a, b) }.toSet
    assert(pairs.contains((0L, 1L))) // identical post-norm
    assert(pairs.contains((2L, 3L))) // 30/32 shared tokens, J≈0.94
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: identical texts distance 0; near-dups within band reach") {
    val sigs = Dedup.simhashSignatures(fixture).collect()
      .map { case Row(id: Long, s: Long) => id -> s }.toMap
    assert(sigs(0L) === sigs(1L))
    val pairs = Dedup.simhashPairs(fixture).collect()
      .map { case Row(a: Long, b: Long, h: Long) => ((a, b), h) }.toMap
    assert(pairs((0L, 1L)) === 0L)
  }

  test("simhash banding: 4×16-bit keyspace, disclosed hot-bucket cap") {
    // keyspace: every band key fits in 16 bits — 4 × 65536 join keys, not
    // the quadratic-at-scale 4 × 256 of the old 8-bit banding
    val bands = Dedup.simhashBandStats(fixture, k = 1000).collect()
    bands.foreach { case Row(bi: Long, bk: Long, _) =>
      assert(bi >= 0 && bi < Dedup.SimhashBands)
      assert(bk >= 0 && bk < (1L << Dedup.SimhashBandBits), s"band key $bk exceeds 16 bits")
    }
    // hot-bucket cap: at maxBucket = 1 every colliding bucket (≥ 2 docs)
    // is dropped from candidate generation, so no pair survives — the
    // drop is disclosed, not silent, via simhashBandStats
    assert(Dedup.simhashPairs(fixture, maxBucket = 1).count() === 0L)
    // the default cap leaves a small corpus untouched
    val pairs = Dedup.simhashPairs(fixture).collect()
      .map { case Row(a: Long, b: Long, h: Long) => ((a, b), h) }.toMap
    assert(pairs((0L, 1L)) === 0L)
  }

  test("ngramJaccard scores the near-dup pair high and respects blocking") {
    val scored = Dedup.ngramJaccard(fixture).collect()
      .map { case Row(a: Long, b: Long, j: Long) => ((a, b), j) }.toMap
    assert(scored((0L, 1L)) === 100L)
    assert(scored.contains((2L, 3L)))
    assert(scored((2L, 3L)) >= 85L)
    // different source blocks the comparison entirely
    val otherSource = fixture.withColumn("source",
      when(col("doc_id") === 1L, lit("s9")).otherwise(col("source")))
    val blocked = Dedup.ngramJaccard(otherSource).collect()
      .map { case Row(a: Long, b: Long, _) => (a, b) }.toSet
    assert(!blocked.contains((0L, 1L)))
  }

  test("sparseCosine: integer 25·dot² >= 16·na2·nb2 gate, df=1 terms weight norms only") {
    val docs = Seq(
      (1L, "a a b"),     // tf {a:2,b:1}, n2=5
      (2L, "a a b"),     // identical -> cos 1 with doc 1
      (3L, "a c c c"),   // c is df=1: in the norm (n2=10), never in the index
      (4L, "x"),         // df=1 only -> no pairs at all
      (5L, "a b")        // vs doc 1: dot=3, cos²=9/10 -> pair at 0.8
    ).toDF("doc_id", "text")
    val got = Dedup.sparseCosine(docs).collect()
      .map { case Row(a: Long, b: Long, d: Long, na: Long, nb: Long, p: Long) =>
        (a, b, d, na, nb, p) }
    assert(got.toSeq === Seq(
      (1L, 2L, 5L, 5L, 5L, 100L),
      (1L, 5L, 3L, 5L, 2L, 90L),
      (2L, 5L, 3L, 5L, 2L, 90L)))
    // the df cut drops a term from the SPACE entirely (norms shrink too)
    assert(Dedup.sparseCosine(docs, maxDf = 1).count() === 0L)
  }

  test("dedupClusters collapses transitive pairs to one representative") {
    // chain: d10~d11 and d11~d12 are near-dups, d10~d12 may or may not pair
    // directly — the cluster must still merge all three under rep 10
    val long = (1 to 30).map(i => s"c$i").mkString(" ")
    val chain = Seq(
      (10L, long + " tailA", "s0"),
      (11L, long + " tailB", "s0"),
      (12L, long + " tailC", "s0"),
      (20L, base, "s0"),
      (21L, base.toUpperCase, "s0"),
      (30L, (200 to 240).map(i => s"z$i").mkString(" "), "s0")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.dedupClusters(chain).collect()
      .map { case Row(id: Long, rep: Long) => id -> rep }.toMap
    assert(got(10L) === 10L && got(11L) === 10L && got(12L) === 10L)
    assert(got(20L) === 20L && got(21L) === 20L)
    assert(!got.contains(30L)) // unpaired docs aren't in any cluster
  }

  test("substringDup: finds verbatim runs, ignores scattered shared grams") {
    def words(tag: String, n: Int) = (0 until n).map(i => s"$tag$i")
    val passage = words("p", 20) // a 20-token verbatim passage
    val docs = Seq(
      // docs 0 and 1: globally DISSIMILAR (40 unique tokens each) but
      // share the 20-token passage verbatim → overlap = 20
      (0L, (words("a", 40) ++ passage).mkString(" "), "s0"),
      (1L, (passage ++ words("b", 40)).mkString(" "), "s0"),
      // doc 2 shares the passage's TOKENS with doc 0 but scrambled in
      // pairs of 4 (every 8-gram spans a seam) → no gram matches, no row
      (2L, (words("c", 40) ++ passage.grouped(4).toSeq.reverse.flatten).mkString(" "), "s0"),
      // doc 3: unrelated
      (3L, words("z", 60).mkString(" "), "s0")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.substringDup(docs).collect()
      .map { case Row(a: Long, b: Long, t: Long) => (a, b) -> t }.toMap
    assert(got.keySet === Set((0L, 1L)), s"only the verbatim pair may appear, got $got")
    // 20-token run = 13 grams of 8 tokens; span 13 → 13 + 7 = 20 tokens
    assert(got((0L, 1L)) === 20L)
    // below the 12-token minimum (5 grams): an 11-token shared run is silent
    val short = Seq(
      (0L, (words("a", 30) ++ words("q", 11)).mkString(" "), "s0"),
      (1L, (words("q", 11) ++ words("b", 30)).mkString(" "), "s0")
    ).toDF("doc_id", "text", "source")
    assert(Dedup.substringDup(short).count() === 0L)
  }

  test("starContract: a 128-node path converges in O(log n) rounds, not O(diameter)") {
    // the worst shape for one-hop label propagation: a chain-shaped pair
    // graph (boilerplate gradients — doc i near-dups only i±1) has
    // diameter 127; star contraction must collapse it logarithmically
    val path = (0L until 127L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.starContract(path, maxRounds = 50).collect()
      .map { case Row(id: Long, rep: Long) => id -> rep }.toMap
    assert(got.size === 128)
    assert(got.values.forall(_ === 0L), "every path node must land on the component min")
    assert(Dedup.lastClusterRounds <= 12,
      s"a 128-path must converge logarithmically, took ${Dedup.lastClusterRounds} rounds")
    // shape mix: two cliques + a bridge + an isolated pair, scrambled ids
    val messy = Seq((9L, 4L), (4L, 7L), (7L, 9L), // clique {4,7,9}
      (7L, 2L),                                   // bridge to {2,3,8}
      (3L, 2L), (8L, 3L), (8L, 2L),
      (101L, 100L)                                // separate component
    ).toDF("doc_a", "doc_b")
    val reps = Dedup.starContract(messy, maxRounds = 50).collect()
      .map { case Row(id: Long, rep: Long) => id -> rep }.toMap
    assert(Seq(2L, 3L, 4L, 7L, 8L, 9L).forall(reps(_) === 2L))
    assert(reps(100L) === 100L && reps(101L) === 100L)
  }

  test("embeddingNearDup flags parallel vectors, not orthogonal ones") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.14f, 0f, 0f)), // cos ≈ 0.99
      (2L, Array(0f, 1f, 0f, 0f))        // orthogonal to 0
    ).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDup(vecs, 0.9).collect()
      .map { case Row(a: Long, b: Long, _) => (a, b) }.toSet
    assert(got === Set((0L, 1L)))
  }

  test("dedupClusters on a dup-free corpus is empty (no NPE on empty pair graph)") {
    val distinctDocs = Seq(
      (0L, (1 to 40).map(i => s"aa$i").mkString(" "), "s0"),
      (1L, (1 to 40).map(i => s"bb$i").mkString(" "), "s0"),
      (2L, (1 to 40).map(i => s"cc$i").mkString(" "), "s0")
    ).toDF("doc_id", "text", "source")
    assert(Dedup.minhashLsh(distinctDocs).count() === 0L)
    assert(Dedup.dedupClusters(distinctDocs).count() === 0L)
  }

  test("incrementalDedup admits only new docs that duplicate nothing in the existing corpus") {
    val base2 = (50 to 80).map(i => s"v$i").mkString(" ")
    val existing = Seq(
      (0L, base, "s0"),            // exact-dup target
      (2L, base2 + " extraA", "s0") // near-dup target
    ).toDF("doc_id", "text", "source")
    val newBatch = Seq(
      (1L, "  " + base.toUpperCase + " ", "s1"), // exact dup of 0 after normalization
      (3L, base2 + " extraB", "s1"),             // near-dup of 2 (J ≈ 0.94)
      (5L, (300 to 340).map(i => s"q$i").mkString(" "), "s1") // genuinely new
    ).toDF("doc_id", "text", "source")
    val admitted = Dedup.incrementalDedup(newBatch, existing).collect()
      .map(_.getLong(0)).toSeq
    assert(admitted === Seq(5L))
    // and the batch is never deduped against itself: two copies of a NEW
    // doc both pass (intra-batch dedup is the plain dedup ops' job)
    val twins = Seq(
      (7L, "brand new thing entirely", "s1"),
      (9L, "brand new thing entirely", "s1")
    ).toDF("doc_id", "text", "source")
    assert(Dedup.incrementalDedup(twins, existing).count() === 2L)
  }

  test("incrementalDedup production path admits unordered: no global sort in the plan") {
    val existing = Seq((0L, base, "s0")).toDF("doc_id", "text", "source")
    val newBatch = Seq((1L, "fresh text here", "s1")).toDF("doc_id", "text", "source")
    val plan = Dedup.incrementalDedup(newBatch, existing).queryExecution.optimizedPlan
    val hasGlobalSort = plan.exists {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.global
      case _ => false
    }
    assert(!hasGlobalSort, "production incrementalDedup must not pay a total-order exchange")
  }

  test("dedup index round-trip: loaded-index result equals recompute, no re-shingling of the corpus") {
    val existing = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
      .filter("doc_id % 2 = 0")
    val newBatch = Seq(
      (10001L, existing.orderBy("doc_id").select("text").head.getString(0), "sX"), // dup of an indexed doc
      (10003L, (700 to 740).map(i => s"nw$i").mkString(" "), "sX")                 // genuinely new
    ).toDF("doc_id", "text", "source")
    Dedup.saveDedupIndex(existing, "dix_rt")
    val idx = Dedup.loadDedupIndex(spark, "dix_rt")
    val fromLoaded = Dedup.incrementalDedup(newBatch, idx)
    val recomputed = Dedup.incrementalDedup(newBatch, existing)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(asSet(fromLoaded) === asSet(recomputed))
    assert(asSet(fromLoaded) === Set((10003L, "sX")))
    // plan lint on the ANALYZED plan (the optimizer hides shingling
    // inside InMemoryRelation once the shingle cache substitutes in):
    // the loaded path shingles the new batch — WordShingles is present —
    // and NEVER re-reads the existing corpus: every leaf is either the
    // batch's LocalRelation or one of the index's catalog tables, so
    // re-shingling `existing` is impossible by construction (the corpus
    // parquet is not even scanned).
    val plan = fromLoaded.queryExecution.analyzed
    val hasShingles = plan.exists(
      _.expressions.exists(_.exists(_.isInstanceOf[graft.plans.WordShingles])))
    assert(hasShingles, "the new batch must still be shingled")
    plan.collectLeaves().foreach {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => ()
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        val tbl = l.catalogTable.map(_.identifier.table).getOrElse("")
        assert(tbl.startsWith("dix_rt"),
          s"loaded-index path reads a non-index relation (corpus re-read): $l")
      case other => fail(s"unexpected leaf in loaded-index plan: $other")
    }
  }

  test("null / empty / whitespace-only text neither crashes nor corrupts the dedup family") {
    // real corpora carry nulls and junk rows; pin the semantics:
    //  - sketch paths (minhash/simhash/ngram/levenshtein): a null-text doc
    //    has no shingles, so it silently drops out of pair generation;
    //  - exact paths: empty and whitespace-only normalize to "" and fold
    //    together; null texts form their own group (md5(null) = null);
    //  - curation: a null text scores null, which the quality filter drops
    val messy = Seq(
      (0L, null.asInstanceOf[String], "s0"),
      (1L, "", "s0"),
      (2L, "   ", "s0"),
      (3L, base, "s0"),
      (4L, base.toUpperCase, "s0"),
      (5L, null.asInstanceOf[String], "s0")
    ).toDF("doc_id", "text", "source")
    val norm = Dedup.exactNormalized(messy).collect()
      .map { case Row(id: Long, n: Long) => id -> n }.toMap
    assert(norm(1L) === 2L) // "" and "   " fold
    assert(norm(3L) === 2L) // base and BASE fold
    assert(norm(0L) === 2L) // the null group folds to its smallest id
    val mh = Dedup.minhashLsh(messy).collect().map { case Row(a: Long, b: Long) => (a, b) }.toSet
    assert(mh === Set((3L, 4L)), "sketch pairs must come only from shingled docs")
    val sh = Dedup.simhashPairs(messy).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh === Set((3L, 4L)))
    assert(Dedup.ngramJaccard(messy).collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((3L, 4L)))
    // "" and "   " normalize to the SAME string, so the edit-distance
    // operator correctly reports them as a distance-0 pair (its contract
    // is the normalized prefix); null docs never appear in any pair
    val lev = Dedup.levenshteinPrefix(messy).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lev === Set((1L, 2L, 0L), (3L, 4L, 0L)))
    // curation drops null/junk rows instead of NPEing
    val curated = graft.operators.TextAnalysis.curatedCorpus(messy).collect().map(_.getLong(0))
    assert(!curated.exists(Set(0L, 1L, 2L, 5L)))
    // incremental: a null-text batch doc has no fingerprint and no
    // shingles — it is ADMITTED (nothing to match on), never a crash
    val admitted = Dedup.incrementalDedup(
      Seq((9L, null.asInstanceOf[String], "s1")).toDF("doc_id", "text", "source"),
      messy.filter("text IS NOT NULL")).collect().map(_.getLong(0))
    assert(admitted.toSeq === Seq(9L))
    // bloom path, same contract: null fps probe as misses (never NPE),
    // nulls on the existing side stay out of the filter build, and the
    // exact-dup batch doc is still caught
    val bloomBatch = Seq(
      (9L, null.asInstanceOf[String], "s1"), (10L, base, "s1")
    ).toDF("doc_id", "text", "source")
    val bloomAdmitted = Dedup.bloomedExactDedup(bloomBatch, messy)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(bloomAdmitted === Set(9L), "null-fp admitted, exact dup dropped")
    val chk = Dedup.bloomCheck(bloomBatch, messy).collect().head
    assert(chk.getAs[Long]("n_new") === 2L && chk.getAs[Long]("n_dup_exact") === 1L)
    assert(chk.getAs[Boolean]("no_false_negatives") && chk.getAs[Boolean]("fp_rate_ok"))
    // keep-best: families come only from shingled docs; null/junk rows
    // never join a family and never crash the quality ranking
    val kept = Dedup.keepBestPerCluster(messy).collect()
      .map { case Row(rep: Long, k: Long, _: Double, n: Long) => (rep, k, n) }
    assert(kept.toSeq === Seq((3L, 3L, 2L)), "the base/BASE family keeps one doc")
  }

  test("appendToDedupIndex: the index grows with admitted batches") {
    val fresh1 = (400 to 440).map(i => s"g$i").mkString(" ")
    val fresh2 = (500 to 540).map(i => s"h$i").mkString(" ")
    val existing = Seq((0L, base, "s0")).toDF("doc_id", "text", "source")
    Dedup.saveDedupIndex(existing, "dix_grow")
    val b1 = Seq((1L, fresh1, "s1")).toDF("doc_id", "text", "source")
    val admitted1 = Dedup.incrementalDedup(b1, Dedup.loadDedupIndex(spark, "dix_grow"))
    assert(admitted1.collect().map(_.getLong(0)).toSeq === Seq(1L))
    Dedup.appendToDedupIndex(b1, "dix_grow")
    // next batch: a NEAR dup of the appended doc (band join + shingle
    // verify must see b1's appended sketches) and a genuinely new doc
    val b2 = Seq(
      (2L, fresh1 + " extraZ", "s2"),
      (3L, fresh2, "s2")
    ).toDF("doc_id", "text", "source")
    val admitted2 = Dedup.incrementalDedup(b2, Dedup.loadDedupIndex(spark, "dix_grow"))
    assert(admitted2.collect().map(_.getLong(0)).toSet === Set(3L),
      "the appended batch must reject its near-dups in the next batch")
  }

  test("compactDedupIndex: an N-append index shrinks its files and stays result-identical") {
    def docsOf(ids: Range, tag: String) =
      ids.map(i => (i.toLong, (0 to 40).map(j => s"$tag${i}w$j").mkString(" "), s"s$tag"))
        .toDF("doc_id", "text", "source")
    val existing = docsOf(0 to 9, "a")
    Dedup.saveDedupIndex(existing, "dix_cmp")
    val batches = Seq(docsOf(100 to 104, "b"), docsOf(200 to 204, "c"), docsOf(300 to 304, "d"))
    batches.foreach(Dedup.appendToDedupIndex(_, "dix_cmp"))
    // the fresh-save reference: the same corpus indexed in one shot
    Dedup.saveDedupIndex(existing.union(batches.reduce(_ union _)), "dix_cmp_fresh")
    // probe batch: one near-dup of an appended doc, one genuinely new
    val probe = Seq(
      (9001L, (0 to 40).map(j => s"c202w$j").mkString(" ") + " tailZ", "sP"),
      (9002L, (600 to 640).map(i => s"z$i").mkString(" "), "sP")
    ).toDF("doc_id", "text", "source")
    def admitted(ix: String): Set[Long] =
      Dedup.incrementalDedup(probe, Dedup.loadDedupIndex(spark, ix))
        .collect().map(_.getLong(0)).toSet
    def dataFiles(name: String): Long = {
      val cat = spark.sessionState.catalog
      Seq("_fp", "_bands", "_shingles").map { s =>
        val loc = java.nio.file.Paths.get(cat.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(name + s)).location)
        val st = java.nio.file.Files.walk(loc)
        try st.filter(p => p.getFileName.toString.startsWith("part-")).count()
        finally st.close()
      }.sum
    }
    val before = admitted("dix_cmp")
    val filesBefore = dataFiles("dix_cmp")
    Dedup.compactDedupIndex(spark, "dix_cmp")
    assert(dataFiles("dix_cmp") < filesBefore,
      s"compaction must shrink the file count (before: $filesBefore)")
    assert(admitted("dix_cmp") === before, "compaction must not change dedup results")
    assert(admitted("dix_cmp") === admitted("dix_cmp_fresh"),
      "an N-append compacted index must dedup exactly like a fresh-save index")
    assert(admitted("dix_cmp") === Set(9002L))
    // the compacted tables keep their bucket spec: the next append still works
    Dedup.appendToDedupIndex(probe, "dix_cmp")
    assert(admitted("dix_cmp") === Set.empty,
      "post-compaction appends must keep maintaining the index")
  }

  test("applyCorpusDiff: removals re-admit, shared-text survivors still block, diff+compact ≡ fresh-save") {
    def words(tag: String, i: Int) = (0 to 40).map(j => s"$tag${i}w$j").mkString(" ")
    val shared = (0 to 40).map(j => s"shared$j").mkString(" ")
    val existing = ((0 to 7).map(i => (i.toLong, words("e", i), "se")) ++
      Seq((8L, shared, "se"), (9L, shared, "se"))) // 8 and 9: identical text
      .toDF("doc_id", "text", "source")
    Dedup.saveDedupIndex(existing, "dix_diff")
    val batch = (100 to 104).map(i => (i.toLong, words("f", i), "sf"))
      .toDF("doc_id", "text", "source")
    Dedup.appendToDedupIndex(batch, "dix_diff")
    // the diff: docs 2 and 8 removed; doc 3's content replaced
    val removed = Seq(2L, 8L).toDF("doc_id")
    val changed = Seq((3L, words("n", 3), "se")).toDF("doc_id", "text", "source")
    Dedup.applyCorpusDiff(spark, "dix_diff", removed, changed)
    Dedup.compactDedupIndex(spark, "dix_diff")
    // fresh-save reference: the remaining corpus indexed in one shot
    val remaining = existing.filter("doc_id NOT IN (2, 3, 8)")
      .union(changed).union(batch)
    Dedup.saveDedupIndex(remaining, "dix_diff_fresh")
    val probe = Seq(
      (9101L, words("e", 2), "sp"),          // removed doc's exact text → re-admitted
      (9102L, shared, "sp"),                 // doc 9 survives with this text → still blocked
      (9103L, words("e", 3), "sp"),          // changed doc's OLD text → admitted
      (9104L, words("n", 3), "sp"),          // changed doc's NEW text → blocked
      (9105L, words("e", 2) + " tailQ", "sp"), // near-dup of a REMOVED doc → admitted
      (9106L, words("f", 102) + " tailQ", "sp") // near-dup of a kept appended doc → blocked
    ).toDF("doc_id", "text", "source")
    def admitted(ix: String): Set[Long] =
      Dedup.incrementalDedup(probe, Dedup.loadDedupIndex(spark, ix))
        .collect().map(_.getLong(0)).toSet
    assert(admitted("dix_diff") === Set(9101L, 9103L, 9105L),
      "removals must re-admit, survivors and changed content must block")
    assert(admitted("dix_diff") === admitted("dix_diff_fresh"),
      "a diff-merged index must dedup exactly like a fresh-save of the remaining corpus")
    // exact fp-table equality with the fresh-save (doc_id-carrying rows
    // make removal per-document, so the two sets must coincide)
    def fpRows(ix: String) = spark.table(s"${ix}_fp").collect()
      .map(r => (r.getAs[String]("fp"), r.getAs[Long]("doc_id"))).toSet
    assert(fpRows("dix_diff") === fpRows("dix_diff_fresh"),
      "diff+compact must leave exactly the fresh-save fingerprint rows")
  }

  test("clearSessionState unpersists the shingle cache (CacheManager empty after clear)") {
    spark.catalog.clearCache() // normalize: drop anything earlier suites cached
    Dedup.shingleArraysCached(fixture).count()
    assert(!spark.sharedState.cacheManager.isEmpty,
      "shingleArraysCached must register a CacheManager entry")
    Dedup.clearSessionState()
    assert(spark.sharedState.cacheManager.isEmpty,
      "clearSessionState must unpersist every DataFrame Dedup persisted")
  }

  /** JVM-side replica of [[Dedup.embBandKey]] — same arithmetic, same
    * missing-element semantics (index past the vector contributes no bit). */
  private def bandKeys(v: Array[Double], bands: Int, bits: Int): Seq[Long] =
    (0 until bands).map { b =>
      (0 until bits).map { j =>
        val idx = b * bits + j
        if (idx < v.length && v(idx) >= 0) 1L << j else 0L
      }.sum
    }
  private def bandCollide(a: Array[Double], b: Array[Double], bands: Int, bits: Int): Boolean =
    bandKeys(a, bands, bits).zip(bandKeys(b, bands, bits)).exists { case (x, y) => x == y }

  private val rnd = new scala.util.Random(12345)
  private def unit(): Array[Double] = {
    val v = Array.fill(64)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }
  private def pairAtCos(c: Double): (Array[Double], Array[Double]) = {
    val u = unit()
    val r = unit()
    val d = u.zip(r).map { case (x, y) => x * y }.sum
    val perp = r.zip(u).map { case (y, x) => y - d * x }
    val pn = math.sqrt(perp.map(x => x * x).sum)
    val p = perp.map(_ / pn)
    (u, u.zip(p).map { case (x, y) => c * x + math.sqrt(1 - c * c) * y })
  }

  /** The banding recall claim, enforced instead of corpus-luck: pairs
    * planted at the worst spot of the contract (cos barely over the
    * threshold) must band-collide at the rate the sign-LSH math predicts
    * (per-bit 1-θ/π, per-band p^bits, recall 1-(1-p^bits)^bands), and
    * unrelated isotropic pairs must NOT degenerate into near-all-pairs. */
  private def bandRecallCheck(bands: Int, bits: Int, cosLo: Double,
                              recallLo: Double, recallHi: Double, unrelatedMax: Double): Unit = {
    val n = 500
    val boundary = (1 to n).count { _ =>
      val (a, b) = pairAtCos(cosLo + 0.03 * rnd.nextDouble())
      bandCollide(a, b, bands, bits)
    }.toDouble / n
    assert(boundary >= recallLo && boundary <= recallHi,
      s"$bands×$bits boundary recall $boundary at cos≈$cosLo outside [$recallLo, $recallHi]")
    val unrelated = (1 to n).count(_ => bandCollide(unit(), unit(), bands, bits)).toDouble / n
    assert(unrelated <= unrelatedMax,
      s"$bands×$bits unrelated candidate rate $unrelated — banding degenerated toward all-pairs")
  }

  test("sign-LSH banding recall: default 12×5 measures ≈81% just above cos 0.5") {
    // per-bit 1-θ/π ≈ 2/3 at θ=60°, per-band (2/3)^5 ≈ 0.13,
    // 1-(1-0.13)^12 ≈ 0.81; unrelated expectation 1-(31/32)^12 ≈ 0.32
    bandRecallCheck(Dedup.EmbBands, Dedup.EmbBandBits, 0.5,
      recallLo = 0.70, recallHi = 0.93, unrelatedMax = 0.45)
  }

  test("sign-LSH banding recall: production 8×8 measures ≈93% just above cos 0.9") {
    // per-bit 1-θ/π ≈ 0.856 at θ≈26°, per-band 0.856^8 ≈ 0.29,
    // 1-(1-0.29)^8 ≈ 0.93; unrelated expectation 1-(255/256)^8 ≈ 0.03
    bandRecallCheck(8, 8, 0.9,
      recallLo = 0.85, recallHi = 0.99, unrelatedMax = 0.10)
  }

  test("embGeometryFor ladder: rung thresholds, 64-dim budget, and adaptive == pinned on a rung-1 corpus") {
    import Dedup.{EmbAxisGeometry, EmbHyperGeometry}
    // exact rung boundaries (the oracle's count-gated branches mirror
    // these integers — a drift here is a cross-engine hash mismatch)
    assert(Dedup.embGeometryFor(0L) === EmbAxisGeometry(12, 5))
    assert(Dedup.embGeometryFor(6400L) === EmbAxisGeometry(12, 5))
    assert(Dedup.embGeometryFor(6401L) === EmbAxisGeometry(10, 6))
    assert(Dedup.embGeometryFor(12800L) === EmbAxisGeometry(10, 6))
    assert(Dedup.embGeometryFor(12801L) === EmbAxisGeometry(9, 7))
    assert(Dedup.embGeometryFor(25600L) === EmbAxisGeometry(9, 7))
    assert(Dedup.embGeometryFor(25601L) === EmbHyperGeometry(12, 8))
    // every AXIS rung fits the 64-dim sign-bit budget and grows the keyspace
    val rungs = Seq(0L, 10000L, 20000L).map(Dedup.embGeometryFor)
    assert(rungs.forall { g => g.bands * g.bits <= 64 })
    assert(rungs.map(_.bits).sliding(2).forall { case Seq(a, b) => b > a })
    // a small corpus resolves to rung 1: the adaptive default is
    // bit-identical to the pinned 12×5 call (the driver-gated decades)
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(64)(d => math.sin(i * 17.0 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val adaptive = Dedup.embeddingNearDup(vecs, 0.3).collect().map(_.toSeq).toSet
    val pinned = Dedup.embeddingNearDup(vecs, 0.3, bands = 12, bits = 5)
      .collect().map(_.toSeq).toSet
    assert(adaptive === pinned)
  }

  test("embHyperBitsFor: occupancy-target thresholds, monotone, bounded occupancy forever") {
    // smallest bits ≥ 8 with n ≤ EmbHyperTarget · 2^bits
    assert(Dedup.embHyperBitsFor(25601L) === 8)
    assert(Dedup.embHyperBitsFor(51200L) === 8)
    assert(Dedup.embHyperBitsFor(51201L) === 9)
    assert(Dedup.embHyperBitsFor(102400L) === 9)
    assert(Dedup.embHyperBitsFor(102401L) === 10)
    // expected per-band occupancy n / 2^bits stays ≤ target at any scale
    Seq(3e4, 1e6, 1e9, 1e12).map(_.toLong).foreach { n =>
      val bits = Dedup.embHyperBitsFor(n)
      assert(n.toDouble / (1L << bits) <= Dedup.EmbHyperTarget.toDouble,
        s"n=$n bits=$bits occupancy over target")
    }
  }

  test("embeddingNearDup: half-pinned geometry fails loudly, hyperplane flag needs a pinned geometry") {
    val vecs = Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] { Dedup.embeddingNearDup(vecs, 0.5, bands = 8) }
    intercept[IllegalArgumentException] { Dedup.embeddingNearDup(vecs, 0.5, bits = 8) }
    intercept[IllegalArgumentException] { Dedup.embeddingNearDup(vecs, 0.5, hyperplane = true) }
  }

  /** JVM-side replica of [[Dedup.embHyperKey]]: quantize to the integer
    * lattice (floor(x·1024)), project on ±1 hyperplanes from
    * [[Dedup.embHyperSign]], take sign bits. Pure Long arithmetic —
    * exactly what Spark and the DuckDB oracle both evaluate. */
  private def hyperKeys(v: Array[Double], bands: Int, bits: Int): Seq[Long] = {
    val q = v.map(x => math.floor(x * Dedup.EmbQuantScale).toLong)
    (0 until bands).map { b =>
      (0 until bits).map { j =>
        val proj = (0 until Dedup.EmbDim).map { d =>
          (if (d < q.length) q(d) else 0L) * Dedup.embHyperSign(b, j, d)
        }.sum
        if (proj >= 0) 1L << j else 0L
      }.sum
    }
  }
  private def hyperCollide(a: Array[Double], b: Array[Double], bands: Int, bits: Int): Boolean =
    hyperKeys(a, bands, bits).zip(hyperKeys(b, bands, bits)).exists { case (x, y) => x == y }

  test("hyperplane banding recall: 12×8 measures ≈98% just above cos 0.9, ≈38% boundary at cos 0.5") {
    // per-bit sign-agreement 1-θ/π ≈ 0.856 at θ≈26°, per-band 0.856^8 ≈
    // 0.29, 1-(1-0.29)^12 ≈ 0.98; at cos 0.5 per-band (2/3)^8 ≈ 0.039 →
    // ≈0.38 — better than the retired axis 8×8 rung's 27% at the same
    // occupancy, and the keyspace keeps growing past 64 bits
    val n = 500
    val nearDup = (1 to n).count { _ =>
      val (a, b) = pairAtCos(0.9 + 0.03 * rnd.nextDouble())
      hyperCollide(a, b, 12, 8)
    }.toDouble / n
    assert(nearDup >= 0.93 && nearDup <= 1.0, s"12×8 hyperplane near-dup recall $nearDup")
    val boundary = (1 to n).count { _ =>
      val (a, b) = pairAtCos(0.5 + 0.03 * rnd.nextDouble())
      hyperCollide(a, b, 12, 8)
    }.toDouble / n
    assert(boundary >= 0.25 && boundary <= 0.55, s"12×8 hyperplane boundary recall $boundary")
    val unrelated = (1 to n).count(_ => hyperCollide(unit(), unit(), 12, 8)).toDouble / n
    assert(unrelated <= 0.15, s"12×8 hyperplane unrelated candidate rate $unrelated")
  }

  test("embeddingNearDup hyperplane path finds near-parallel vectors and agrees with the JVM replica on candidates") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.14f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDup(vecs, 0.9, bands = 12, bits = 8, hyperplane = true)
      .collect().map { case Row(a: Long, b: Long, _) => (a, b) }.toSet
    val replica = for {
      (ia, va) <- Seq(0L -> Array(1.0, 0, 0, 0), 1L -> Array(0.99, 0.14, 0, 0), 2L -> Array(0.0, 1, 0, 0))
      (ib, vb) <- Seq(0L -> Array(1.0, 0, 0, 0), 1L -> Array(0.99, 0.14, 0, 0), 2L -> Array(0.0, 1, 0, 0))
      if ia < ib && hyperCollide(va.map(_.toFloat.toDouble), vb.map(_.toFloat.toDouble), 12, 8)
      cos = {
        val dp = va.zip(vb).map { case (x, y) => x.toFloat.toDouble * y.toFloat.toDouble }.sum
        val na = va.map(x => x.toFloat.toDouble).map(x => x * x).sum
        val nb = vb.map(x => x.toFloat.toDouble).map(x => x * x).sum
        dp / math.sqrt(na * nb)
      }
      if cos >= 0.9
    } yield (ia, ib)
    assert(got === replica.toSet)
    assert(got === Set((0L, 1L)))
  }

  test("embeddingNearDup with 8×8 bands finds parallel vectors at threshold 0.9") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.14f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.embeddingNearDup(vecs, 0.9, bands = 8, bits = 8).collect()
      .map { case Row(a: Long, b: Long, _) => (a, b) }.toSet
    assert(got === Set((0L, 1L)))
  }

  test("semanticDedup: in-cell keepers, cross-cell blindness, and the hot-cell cap") {
    // this test trains a quantizer on a synthetic corpus — a SECOND model
    // key in the JVM-wide session, which (by design) trips lastQuantizer's
    // ambiguity guard; clear at the end so later suites re-establish the
    // single-model oracle state the wired-oracle test asserts
    try semanticDedupBody()
    finally graft.operators.Similarity.clearSessionState()
  }

  private def semanticDedupBody(): Unit = {
    // two tight modes far apart; nCells=2 k-means must split them
    def jig(main: Int, j: Float) = Array.tabulate(4)(i =>
      if (i == main) 1f else if (i == (main + 1) % 4) j else 0f)
    val vecs = Seq(
      (0L, jig(0, 0.01f)), (1L, jig(0, 0.02f)), (2L, jig(0, 0.03f)), (3L, jig(0, 0.04f)),
      (10L, jig(2, 0.01f)), (11L, jig(2, 0.02f)), (12L, jig(2, 0.03f)),
      (20L, Array(0f, 0f, 0f, 0f)) // directionless: excluded by contract
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(vecs, nCells = 2, threshold = 0.9).collect()
      .map { case Row(v: Long, d: Long, _, c: Double) => (v, d, c) }
    // every non-minimum member of a mode drops, dup_of = the mode's
    // smallest id; no cross-mode pair is ever compared (cos ≈ 0 anyway)
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq((1L, 0L), (2L, 0L), (3L, 0L), (11L, 10L), (12L, 10L)))
    assert(got.forall(_._3 >= 0.9))
    // cap=2: only the first two ids per cell participate in pairing
    val capped = Dedup.semanticDedup(vecs, nCells = 2, threshold = 0.9, maxCell = 2)
      .collect().map { case Row(v: Long, d: Long, _, _) => (v, d) }.toSeq
    assert(capped === Seq((1L, 0L), (11L, 10L)))
    // empty corpus: empty result with the right schema, not a crash
    val empty = Dedup.semanticDedup(vecs.filter("vec_id < 0"), nCells = 2)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq === Seq("vec_id", "dup_of", "cell", "cos_sim"))
  }

  test("keepBestPerCluster keeps the max-quality member of every family (ties → min doc_id)") {
    val docs = Tables.documents(spark, Sf0001)
    val fams = docs.join(Dedup.dedupClusters(docs), Seq("doc_id"))
      .select(col("cluster_rep"), col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(fams.nonEmpty) // the sf corpus plants near-dups; a dry fixture would vacuously pass
    val best = fams.groupBy(_._1).map { case (rep, ms) =>
      rep -> ms.maxBy(m => (m._3, -m._2))._2 // highest q; tie broken toward LOWER doc_id
    }
    val sizes = fams.groupBy(_._1).map { case (rep, ms) => rep -> ms.length.toLong }
    val got = Dedup.keepBestPerCluster(docs).collect()
      .map { case Row(rep: Long, kept: Long, _: Double, n: Long) => (rep, kept, n) }
    assert(got.map(_._1).toSet === best.keySet)
    got.foreach { case (rep, kept, n) =>
      assert(kept === best(rep), s"family $rep kept $kept, brute force says ${best(rep)}")
      assert(n === sizes(rep))
    }
  }

  test("bloomedExactDedup is result-identical to the plain fingerprint anti-join") {
    // sf corpus for volume (bloom sized over hundreds of fps) + planted
    // cross-side dups so the gate provably has something to remove: odd
    // ids 9001/9003 duplicate even-side texts (one via case/whitespace)
    val docs = Tables.documents(spark, Sf0001)
    val evenTexts = docs.filter("doc_id % 2 = 0").select("doc_id", "text", "source")
    val t0 = evenTexts.orderBy("doc_id").limit(2).collect().map(_.getString(1))
    val planted = Seq(
      (9001L, t0(0), "s0"), (9003L, "  " + t0(1).toUpperCase + " ", "s0")
    ).toDF("doc_id", "text", "source")
    val nw = docs.filter("doc_id % 2 = 1").select("doc_id", "text", "source")
      .unionByName(planted)
    val ex = evenTexts
    val viaBloom = Dedup.bloomedExactDedup(nw, ex)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val direct = nw
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .join(ex.select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp")).distinct(),
        Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(viaBloom.toSeq === direct.toSeq)
    assert(!viaBloom.contains(9001L) && !viaBloom.contains(9003L)) // the gate bites
  }

  test("bloomCheck: exact counts add up and both acceptance booleans hold") {
    val docs = Tables.documents(spark, Sf0001)
    val ex = docs.filter("doc_id % 2 = 0").select("doc_id", "text", "source")
    val dupTexts = ex.orderBy("doc_id").limit(3).collect().map(_.getString(1))
    val nw = docs.filter("doc_id % 2 = 1").select("doc_id", "text", "source")
      .unionByName(dupTexts.zipWithIndex
        .map { case (t, i) => (9100L + i, t, "s0") }.toSeq.toDF("doc_id", "text", "source"))
    val r = Dedup.bloomCheck(nw, ex).collect().head
    assert(r.getAs[Long]("n_new") === nw.count())
    assert(r.getAs[Long]("n_new") ===
      r.getAs[Long]("n_dup_exact") + r.getAs[Long]("n_clean"))
    assert(r.getAs[Long]("n_dup_exact") >= 3L) // the planted dups are seen
    assert(r.getAs[Boolean]("no_false_negatives"))
    assert(r.getAs[Boolean]("fp_rate_ok"))
  }

  test("repeat same-JVM invocations of the diff-merge query do not pin stale file listings") {
    // regression: drop → rebuild → staged-swap leaves a canonically-equal
    // plan whose tracked shingle-cache handle pinned the PREVIOUS build's
    // file listing; re-persisting that stale handle replayed
    // FileNotFound on every invocation after the first (Bench masked it
    // by clearing session state between retries — a long-lived query
    // service does not get that luxury)
    val fn = SparkEntry.queries("incremental_dedup_after_diff")
    val r1 = fn(spark, Sf0001).collect().map(_.getLong(0)).toSet
    val r2 = fn(spark, Sf0001).collect().map(_.getLong(0)).toSet
    assert(r1.nonEmpty && r1 === r2)
  }

  test("PositionalGramHashes is hex-for-hex the HOF chain it replaced (real docs + edges)") {
    import spark.implicits._
    val gramLen = Dedup.SubstringGramLen
    val edges = Seq(
      (90001L, "one two three four five six seven eight nine"), // 2 grams
      (90002L, "exactly eight tokens in this doc right here"),  // 1 gram
      (90003L, "too short"),                                    // 0 grams
      (90004L, ""),                                             // empty text
      (90005L, "repeat repeat repeat repeat repeat repeat repeat repeat repeat")
    ).toDF("doc_id", "text")
    val docs = Tables.documents(spark, Sf0001).select("doc_id", "text")
      .unionAll(edges)
      .withColumn("t", graft.functions.TextFunctions.normText(col("text")))
    val native = docs.select(col("doc_id"),
      graft.plans.PositionalGramHashes.grams(col("t"), gramLen).as("gs"))
    val hof = docs
      .select(col("doc_id"), split(col("t"), " ").as("toks"))
      .select(col("doc_id"), when(size(col("toks")) >= gramLen, expr(
        s"transform(sequence(1, size(toks) - ${gramLen - 1})," +
          s" i -> md5(array_join(slice(toks, i, $gramLen), ' ')))"))
        .otherwise(array()).as("gs"))
    val diffs = native.as("a")
      .join(hof.as("b"), col("a.doc_id") === col("b.doc_id"))
      .filter(not(col("a.gs") <=> col("b.gs")))
      .count()
    assert(diffs === 0L)
  }

  test("mergeDedupIndexes: shard merge is row-identical to a fresh save over the union corpus") {
    def words(tag: String, i: Int) = (0 to 40).map(j => s"$tag${i}w$j").mkString(" ")
    // two shard corpora with disjoint ids, plus ONE doc both shards
    // ingested (identical id + text — the canonicalization fold case)
    val common = Seq((500L, words("mc", 0), "sc")).toDF("doc_id", "text", "source")
    val shardA = (0 to 9).map(i => (i.toLong, words("ma", i), "sa"))
      .toDF("doc_id", "text", "source").union(common)
    val shardB = (100 to 109).map(i => (i.toLong, words("mb", i), "sb"))
      .toDF("doc_id", "text", "source").union(common)
    Seq("dix_ma", "dix_mb", "dix_mrg", "dix_mrg_fresh").foreach(Dedup.dropDedupIndex(spark, _))
    Dedup.saveDedupIndex(shardA, "dix_ma")
    Dedup.saveDedupIndex(shardB, "dix_mb")
    Dedup.mergeDedupIndexes(spark, Seq("dix_ma", "dix_mb"), "dix_mrg")
    Dedup.saveDedupIndex(shardA.union(shardB).distinct(), "dix_mrg_fresh")
    // row-level identity of all three tables with the fresh save
    def rows(ix: String, suffix: String): Set[String] =
      spark.table(ix + suffix).collect()
        .map(_.toSeq.map {
          case a: scala.collection.Seq[_] => a.mkString("[", ",", "]")
          case v => String.valueOf(v)
        }.mkString("|")).toSet
    for (s <- Seq("_fp", "_bands", "_shingles"))
      assert(rows("dix_mrg", s) === rows("dix_mrg_fresh", s),
        s"merged $s must carry exactly the fresh-save rows")
    // downstream single-index behavior: dups of EITHER shard block, new admits
    val probe = Seq(
      (9201L, words("ma", 3), "sp"),            // shard-A exact dup → blocked
      (9202L, words("mb", 104) + " tailZ", "sp"), // shard-B near-dup → blocked
      (9203L, words("mc", 0), "sp"),            // both-shards doc → blocked once
      (9204L, (700 to 740).map(i => s"q$i").mkString(" "), "sp") // new → admitted
    ).toDF("doc_id", "text", "source")
    def admitted(ix: String): Set[Long] =
      Dedup.incrementalDedup(probe, Dedup.loadDedupIndex(spark, ix))
        .collect().map(_.getLong(0)).toSet
    assert(admitted("dix_mrg") === Set(9204L))
    assert(admitted("dix_mrg") === admitted("dix_mrg_fresh"),
      "a merged index must dedup exactly like a fresh save over the union corpus")
    // the merged tables carry a real bucket spec: maintenance appends keep working
    Dedup.appendToDedupIndex(probe, "dix_mrg")
    assert(admitted("dix_mrg") === Set.empty,
      "post-merge appends must keep maintaining the index")
    // sources stayed untouched and readable
    assert(Dedup.incrementalDedup(probe, Dedup.loadDedupIndex(spark, "dix_ma"))
      .collect().map(_.getLong(0)).toSet === Set(9202L, 9204L),
      "merge must leave source indexes intact")
    // contract errors fail loudly before any write
    intercept[IllegalArgumentException] {
      Dedup.mergeDedupIndexes(spark, Seq("dix_ma", "dix_mrg2"), "dix_ma")
    }
    intercept[IllegalArgumentException] {
      Dedup.mergeDedupIndexes(spark, Seq.empty, "dix_mrg3")
    }
  }
}
