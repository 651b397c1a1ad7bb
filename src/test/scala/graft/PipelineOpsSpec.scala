package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Dedup, Search, Similarity, TextAnalysis}

/** Round-3 training-pipeline operators: PII scrubbing, repetition
  * signals, distinctive terms, length-moment outliers, cross-source dup
  * matrix, embedding norm stats. */
class PipelineOpsSpec extends SparkSpec {

  import spark.implicits._

  test("batchPaddingStats: exact padded-token arithmetic; bucketing beats shuffle order on mixed lengths") {
    // 32 short docs (1 token) + 32 long docs (31 tokens): same len bucket
    // boundary (bucket 32 tokens, all in bucket 0)? No — short=1 → bucket 0,
    // long=31 → bucket 0 too. Use 40-token longs (bucket 1) so bucketing
    // fully separates lengths while shuffle order mixes them.
    val docs = ((0L until 32L).map(i => (i, "w")) ++
      (100L until 132L).map(i => (i, Seq.fill(40)("w").mkString(" "))))
      .toDF("doc_id", "text")
    val got = TextAnalysis.batchPaddingStats(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val (nB, totB, padB) = got("length_bucketed")
    val (nN, totN, padN) = got("shuffle_order")
    assert(nB === 64L && nN === 64L)
    assert(totB === 32L * 1 + 32L * 40 && totB === totN)
    // bucketed batches are length-homogeneous → zero padding
    assert(padB === 0L)
    // shuffle order mixes 1s and 40s into common batches → real padding
    assert(padN > 0L)
  }

  test("tokenHeavyHitters: sketch-propose/exact-verify finds exactly the above-threshold tokens under a saturated cap") {
    // vocabulary (62 tokens) >> cap (8): the sketch MUST decrement, yet
    // the composition still returns exactly the exact-count answer
    val words =
      Seq.fill(40)("alpha") ++ Seq.fill(30)("beta") ++
        (0 until 30).map(i => "noise" + i) // 30 singletons
    // one doc per word, shuffled deterministically so partitions interleave
    val docs = new scala.util.Random(7).shuffle(words)
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = TextAnalysis.tokenHeavyHitters(docs, denom = 4, cap = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // N=100; threshold freq*4 > 100 => freq > 25: alpha(40), beta(30)
    assert(got.toSeq === Seq(("alpha", 40L, 100L), ("beta", 30L, 100L)))
  }

  test("perplexityBuckets: per-source terciles are ordered, cover the scored docs, and respect tie fences") {
    val out = TextAnalysis.perplexityBuckets(Tables.documents(spark, Sf0001)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(out.nonEmpty)
    for ((_, bySrc) <- out.groupBy(_._2)) {
      val n = bySrc.length
      val (t1, t2) = (bySrc.head._4, bySrc.head._5)
      assert(t1 <= t2)
      val head = bySrc.filter(_._6 == "head")
      val middle = bySrc.filter(_._6 == "middle")
      val tail = bySrc.filter(_._6 == "tail")
      assert(head.length + middle.length + tail.length === n)
      // cumulative coverage: head >= ceil(n/3), head+middle >= ceil(2n/3)
      assert(head.length >= (n + 2) / 3)
      assert(head.length + middle.length >= (2 * n + 2) / 3)
      // bucket assignment is monotone in surprisal: no middle doc scores
      // below a head doc's fence, no tail doc below the middle fence
      assert(head.forall(_._3 <= t1))
      assert(middle.forall(d => d._3 > t1 && d._3 <= t2))
      assert(tail.forall(_._3 > t2))
    }
  }

  test("winnowing: any shared run of >= w+k-1 tokens shares a selected fingerprint value") {
    // the winnowing theorem (Schleimer et al.): a 7-token run (= w+k-1)
    // contains w consecutive k-gram hashes, so one selection window lies
    // fully inside it and both docs select ITS minimum — same value,
    // whatever surrounds the run
    val run = (0 until 7).map(i => s"run$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma delta $run tail1 tail2", "s0"),
      (2L, s"zeta eta theta $run omega psi chi phi", "s0"),
      (3L, (0 until 20).map(i => s"other$i").mkString(" "), "s0")
    ).toDF("doc_id", "text", "source")
    val rows = TextAnalysis.winnowFingerprintRows(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    def fps(d: Long) = rows.filter(_._1 == d).map(_._2).toSet
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "shared >= w+k-1 run must yield a shared fingerprint value")
    assert(fps(1L).intersect(fps(3L)).isEmpty && fps(2L).intersect(fps(3L)).isEmpty,
      "token-disjoint docs must share no fingerprints")
    // a doc shorter than w+k-1 tokens has no full window: no row
    val short = Seq((9L, "a b c d e f", "s0")).toDF("doc_id", "text", "source")
    assert(TextAnalysis.winnowFingerprints(short).collect().isEmpty)
  }

  test("piiRedact replaces every planted PII class and nothing else") {
    val df = Seq(
      (0L, "reach bob@example.com or 555-123-4567 via 192.168.0.1 ref 123456", "s0"),
      (1L, "clean text with no identifiers at all", "s0")
    ).toDF("doc_id", "text", "source")
    val got = df.select(TextFunctions.piiRedact(col("text"))).as[String].collect()
    assert(got(0) === "reach [EMAIL] or [PHONE] via [IP] ref [NUM]")
    assert(got(1) === "clean text with no identifiers at all")
  }

  test("piiScrubStats counts hits per field and proves no-op on clean text") {
    val docs = Seq(
      (0L, "mail a@b.io and c@d.org now", "s0"),
      (1L, "nothing here", "s0")
    ).toDF("doc_id", "text", "source")
    val events = Seq((0L, """{"k": 69}""")).toDF("event_id", "props")
    val got = TextAnalysis.piiScrubStats(docs, events).collect()
      .map { case Row(f: String, n: Long, em: Long, ip: Long, ph: Long, dg: Long, ch: Long, cr: Long) =>
        f -> ((n, em, ip, ph, dg, ch, cr)) }.toMap
    val (n, em, _, _, _, ch, cr) = got("documents.text")
    assert(n === 2L && em === 2L)
    assert(cr === ch - "a@b.io".length - "c@d.org".length + 2 * "[EMAIL]".length)
    val (_, _, _, _, dg, chp, crp) = got("events.props")
    assert(dg === 0L && chp === crp) // 2-digit value: no ≥4 digit-run, scrub is a no-op
  }

  test("repetitionSignals: exact integer shares on a known doc") {
    val df = Seq(
      (0L, "a a a b", "s0"),
      (1L, "w x y z", "s0")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.repetitionSignals(df).collect()
      .map { case Row(id: Long, n: Long, d: Long, rep: Long, top: Long) => id -> ((n, d, rep, top)) }
      .toMap
    assert(got(0L) === ((4L, 2L, 50L, 75L)))
    assert(got(1L) === ((4L, 4L, 0L, 25L)))
  }

  test("distinctiveTerms ranks source-specific tokens above shared ones") {
    val df = Seq(
      (0L, "xray xray xray common", "s0"),
      (1L, "yankee common", "s1")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.distinctiveTerms(df, k = 1).collect()
      .map { case Row(src: String, _, tok: String, _, _, _) => src -> tok }.toMap
    assert(got === Map("s0" -> "xray", "s1" -> "yankee"))
  }

  test("lengthOutlierStats: integer moments and a planted 2-sigma outlier") {
    val docs = Seq(10, 10, 10, 10, 10, 200).zipWithIndex.map { case (len, i) =>
      (i.toLong, "x" * len, "s0", len.toLong)
    }.toDF("doc_id", "text", "source", "n_chars")
    val Row(_, n: Long, mean: Long, v: Long, over: Long, under: Long) =
      TextAnalysis.lengthOutlierStats(docs).head()
    assert(n === 6L)
    assert(mean === (1000L * 250) / 6)            // μ = 250/6
    assert(v === (1000L * (6 * 40500 - 250 * 250)) / 36) // σ² from exact sums
    assert(over === 1L && under === 0L)
  }

  test("crossSourceDupMatrix attributes the near-dup pair to its source pair") {
    val base = (1 to 30).map(i => s"m$i").mkString(" ")
    val df = Seq(
      (0L, base + " tailA", "srcA"),
      (1L, base + " tailB", "srcB"),
      (2L, (50 to 90).map(i => s"q$i").mkString(" "), "srcA")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDupMatrix(df).collect()
      .map { case Row(a: String, b: String, c: Long) => (a, b, c) }
    assert(got.toSeq === Seq(("srcA", "srcB", 1L)))
  }

  test("featureExtract derives the documented md5 features, ANN-composable") {
    val docs = Seq((7L, "hello", "s0")).toDF("doc_id", "text", "source")
    val got = graft.operators.Multimodal.featureExtract(spark, docs).collect()
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = Array.tabulate(16) { j =>
      (Integer.parseInt(hex.substring(2 * j, 2 * j + 2), 16) / 255.0 - 0.5).toFloat
    }
    assert(got.length === 1 && got(0).getLong(0) === 7L)
    assert(got(0).getSeq[Float](1).toArray.sameElements(expect))
    // composition: the feature column feeds the ANN operator unchanged
    val corpus = Tables.documents(spark, Sf0001).limit(50)
    val ann = Similarity.bruteForceTopK(
      graft.operators.Multimodal.featureExtract(spark, corpus)
        .selectExpr("doc_id AS vec_id", "features AS embedding"),
      nQueries = 2, k = 3)
    assert(ann.count() === 6L)
  }

  test("benchmarkContamination flags train docs overlapping the eval set") {
    val evalText = (1 to 30).map(i => s"e$i").mkString(" ")
    val df = Seq(
      (0L, evalText, "s0"),                                   // eval doc
      (10L, evalText + " leak tail", "s0"),                   // contaminated
      (11L, (50 to 90).map(i => s"u$i").mkString(" "), "s0")  // clean
    ).toDF("doc_id", "text", "source")
    val got = Dedup.benchmarkContamination(df).collect()
      .map { case Row(d: Long, e: Long, s: Long) => (d, e, s) }
    assert(got.map(t => (t._1, t._2)).toSeq === Seq((10L, 0L)))
    assert(got.head._3 >= 25L) // nearly all eval shingles leaked
  }

  test("mixtureWeights: integer equal-contribution weights per source") {
    val df = (1 to 3).map(i => (i.toLong, s"doc a$i", "s0")) :+ ((9L, "doc b", "s1"))
    val got = TextAnalysis.mixtureWeights(df.toDF("doc_id", "text", "source")).collect()
      .map { case Row(s: String, n: Long, a: Long, w: Long) => s -> ((n, a, w)) }.toMap
    assert(got("s0") === ((3L, 750000L, 666L)))  // 4*1000 div (2*3)
    assert(got("s1") === ((1L, 250000L, 2000L))) // 4*1000 div (2*1)
  }

  test("temperatureSample: α=0.5 rates — scarce source keeps all, head source halves") {
    // n_a=100, n_b=400 → w_milli 10000:20000 → shares 333333:666666 ppm;
    // m_total = min(100e6/333333, 400e6/666666) = min(300, 600) = 300
    // → k_a = 99 (floor), k_b = 199 → rate_a = 990000, rate_b = 497500.
    // Every step is the integer arithmetic above — asserted EXACTLY, so
    // any drift in the share/rate math (or a float sum sneaking in)
    // fails loudly rather than shifting a hash boundary silently.
    val df = ((1 to 100).map(i => (i.toLong, s"doc a$i", "sa")) ++
      (101 to 500).map(i => (i.toLong, s"doc b$i", "sb"))).toDF("doc_id", "text", "source")
    val got = TextAnalysis.temperatureSample(df)
    val rates = got.select("source", "rate_ppm").distinct().collect()
      .map { case Row(s: String, r: Long) => s -> r }.toMap
    assert(rates === Map("sa" -> 990000L, "sb" -> 497500L))
    // realized counts are the binomial draw of the rates; the tail source
    // must keep a strictly larger FRACTION than the head (the α-mix's
    // whole point), and membership is deterministic (re-run identical)
    val byS = got.groupBy("source").count().collect()
      .map { case Row(s: String, n: Long) => s -> n }.toMap
    assert(byS("sa") * 4L > byS("sb"),
      s"tail source must keep a higher fraction: $byS")
    assert(got.collect().toSeq === TextAnalysis.temperatureSample(df).collect().toSeq)
  }

  test("sourceCap: caps a heavy source at cap in hash order, keeps small sources whole") {
    val df = ((1 to 300).map(i => (i.toLong, s"doc a$i", "sa")) ++
      (301 to 305).map(i => (i.toLong, s"doc b$i", "sb"))).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceCap(df, cap = 10).collect()
      .map { case Row(d: Long, s: String, rk: Long) => (d, s, rk) }
    val (a, b) = got.partition(_._2 == "sa")
    assert(a.length === 10 && a.map(_._3).sorted.toSeq === (1L to 10L),
      "heavy source must contribute exactly cap docs, ranks 1..cap")
    assert(b.length === 5 && b.map(_._1).sorted.toSeq === (301L to 305L),
      "a source under the cap keeps every doc")
  }

  test("topRepeatedShingles returns only df>1 shingles, highest first") {
    val shared = (1 to 10).map(i => s"r$i").mkString(" ")
    val df = Seq(
      (0L, shared, "s0"), (1L, shared, "s0"),
      (2L, (50 to 60).map(i => s"q$i").mkString(" "), "s0")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.topRepeatedShingles(df).collect()
      .map { case Row(g: String, n: Long) => g -> n }
    assert(got.nonEmpty && got.forall(_._2 === 2L))
    assert(got.length === 8) // 10 tokens → 8 trigram shingles, all shared
  }

  test("minhashBandStats surfaces colliding band buckets only") {
    val base = (1 to 30).map(i => s"k$i").mkString(" ")
    val df = Seq(
      (0L, base, "s0"),
      (1L, base, "s0"),                                     // identical → all 4 bands collide
      (2L, (50 to 90).map(i => s"z$i").mkString(" "), "s0") // unrelated → no collision
    ).toDF("doc_id", "text", "source")
    val got = Dedup.minhashBandStats(df).collect()
      .map { case Row(bi: Long, _, n: Long) => (bi, n) }
    assert(got.length === graft.operators.Dedup.MinhashBands)
    assert(got.forall(_._2 === 2L))
  }

  test("operators survive null, empty, and whitespace-only documents") {
    // a 100 TB corpus WILL contain degenerate rows; none of these may
    // throw (sequence(1,0) and digest(null) both did before round 3)
    val df = Seq(
      (0L, "normal doc with some words here", "s0"),
      (1L, null.asInstanceOf[String], "s0"),
      (2L, "", "s0"),
      (3L, "   ", "s0")
    ).toDF("doc_id", "text", "source")
    assert(Dedup.minhashLsh(df).count() === 0L)
    assert(Dedup.exactNormalized(df).count() === 3L) // "" and "   " normalize together
    assert(TextAnalysis.repetitionSignals(df).count() === 1L)
    val frames = graft.operators.Multimodal.frameSample(df).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(frames(1L).isEmpty && frames(2L).contains("") && frames(3L).contains(" "))
    assert(graft.operators.Multimodal.imageMeta(spark, df).count() === 4L)
    assert(graft.operators.Multimodal.featureExtract(spark, df).count() === 4L)
  }

  test("splitAssign is deterministic, covers every doc, and lands near 10/10/80") {
    val docs = Tables.documents(spark, Sf0001)
    val a = TextAnalysis.splitAssign(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextAnalysis.splitAssign(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b) // hash-based: identical across runs
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac("test") > 0.04 && frac("test") < 0.16)
    assert(frac("valid") > 0.04 && frac("valid") < 0.16)
    // growth stability: a doc's split never changes when the corpus grows
    val grown = TextAnalysis.splitAssign(docs.limit(100)).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    grown.foreach { case (id, s) => assert(a(id) === s) }
  }

  test("packShards: shards partition each block's docs contiguously under the budget rule") {
    val docs = Tables.documents(spark, Sf0001)
    val shards = TextAnalysis.packShards(docs).collect()
      .map { case Row(src: String, blk: Long, sh: Long, n: Long, tok: Long, f: Long, l: Long) =>
        (src, blk, sh, n, tok, f, l) }
    assert(shards.nonEmpty)
    // per (source, block): shard ids contiguous from 0 and token totals conserved
    shards.groupBy(t => (t._1, t._2)).foreach { case ((src, blk), rows) =>
      val ids = rows.map(_._3).sorted.toSeq
      assert(ids === (0L until ids.length).toSeq, s"($src,$blk) shard ids not contiguous")
      // next-fit budget rule: shard s+1 exists only because the running
      // offset crossed (s+1)·budget, so cumulative tokens through each
      // non-final shard must reach (shard_id+1)·budget
      val byId = rows.sortBy(_._3)
      val cumTok = byId.map(_._5).scanLeft(0L)(_ + _).tail
      byId.init.zip(cumTok).foreach { case (r, cum) =>
        assert(r._5 >= 1L, s"($src,$blk) empty shard")
        assert(cum >= (r._3 + 1) * TextAnalysis.PackBudgetTokens,
          s"($src,$blk) shard ${r._3} closed at $cum tokens, before crossing the budget")
      }
      // doc ranges don't overlap across consecutive shards
      byId.sliding(2).foreach {
        case Array(x, y) => assert(x._7 < y._6, s"($src,$blk) shard ranges overlap")
        case _ => ()
      }
    }
    // token conservation: sum of shard tokens == corpus token total
    val total = docs.select(sum(TextFunctions.tokenCount(col("text")).cast("long")))
      .head().getLong(0)
    assert(shards.map(_._5).sum === total)
  }

  test("null text flows through text analysis as null metrics, never an exception") {
    val messy = Seq(
      (0L, null.asInstanceOf[String], "s0", "en"),
      (1L, "some real text right here", "s0", "en")
    ).toDF("doc_id", "text", "source", "lang")
    // per-doc metric ops keep the row (metrics null) rather than dropping
    // or crashing — a pipeline sees its nulls instead of losing them
    assert(TextAnalysis.stats(messy).count() === 2)
    assert(TextAnalysis.tokenCounts(messy).count() === 2)
    assert(TextAnalysis.langId(messy).count() === 2)
    assert(TextAnalysis.quality(messy).count() === 2)
    assert(TextAnalysis.fingerprints(messy).count() === 2)
    // token-level ops exclude the token-less doc
    assert(TextAnalysis.tokenRarity(messy).collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(TextAnalysis.packShards(messy).count() >= 1)
    assert(TextAnalysis.tokenizerFertility(messy).count() === 1)
  }

  test("quality classifier separates clean prose from punctuation soup and matches its teacher") {
    try {
      val clean = (0L until 30L).map(i =>
        (i, ("alpha beta gamma delta epsilon zeta eta theta " * 3) + s"word$i tail", "s"))
      val junk = (100L until 130L).map(i =>
        (i, "!!! ### $$$ %%% ^^^ &&& *** ((( ))) " + ("@@@ " * 5), "s"))
      val docs = (clean ++ junk).toDF("doc_id", "text", "source")
      val got = graft.operators.QualityModel.trainedQualityScores(docs).collect()
        .map { case Row(id: Long, m: Double, mk: Boolean, hk: Boolean) => (id, m, mk, hk) }
      val byId = got.map(r => r._1 -> r).toMap
      assert(clean.forall(c => byId(c._1)._4), "clean docs must carry keep teacher labels")
      assert(junk.forall(j => !byId(j._1)._4), "junk docs must carry drop teacher labels")
      // linearly separable hashed features: the distilled model must agree
      // with its teacher everywhere, with a real margin gap between classes
      assert(got.forall(r => r._3 === r._4))
      assert(clean.map(c => byId(c._1)._2).min > junk.map(j => byId(j._1)._2).max)
    } finally graft.operators.QualityModel.clearSessionState()
  }

  test("quality_classifier oracle is wired: post-run oracleSql inlines the fitted coefficients") {
    try {
      graft.operators.QualityModel.clearSessionState()
      assert(SparkEntry.queries("quality_classifier")(spark, Sf0001).count() > 0)
      val sql = SparkEntry.oracleSql.get("quality_classifier")
      assert(sql.nonEmpty, "oracleSql must contain quality_classifier once a model is fit")
      assert(sql.get.contains("'::DOUBLE"), "oracle SQL must inline coefficient literals")
      // ambiguity guard: a second distinct fit blanks the slot (rows-only
      // degradation beats silently checking against the wrong model)
      val other = Seq((1L, "some words here", "s")).toDF("doc_id", "text", "source")
      graft.operators.QualityModel.trainedQualityScores(other).count()
      assert(SparkEntry.oracleSql.get("quality_classifier").isEmpty)
    } finally graft.operators.QualityModel.clearSessionState()
  }

  test("bm25TopK: coordination, saturation, and length normalization rank as BM25 demands") {
    val docs = Seq(
      (1L, "spark stream window join extras words here", "s"),       // all 4 terms
      (2L, "spark spark spark spark spark pad pad pad", "s"),        // 1 term, saturated tf
      (3L, "spark " + ("pad " * 200), "s"),                          // 1 term, long doc
      (4L, "spark pad pad pad pad pad pad", "s"),                    // 1 term, short doc
      (5L, "nothing relevant at all", "s")                           // no terms
    ).toDF("doc_id", "text", "source")
    val rows = Search.bm25TopK(docs, query = "spark stream window join", k = 10)
      .collect().map { case Row(id: Long, s: Long, n: Long) => (id, s, n) }
    val byId = rows.map(r => r._1 -> r).toMap
    assert(!byId.contains(5L), "a doc matching no query term must not be retrieved")
    assert(byId(1L)._3 === 4L, "coordination count = distinct matched terms")
    // four distinct terms (three of them rare, idf-heavy) beat one
    // saturated term: k1 caps what repetition alone can earn
    assert(byId(1L)._2 > byId(2L)._2)
    // same term, same tf: the 201-token doc pays the b-length penalty
    assert(byId(4L)._2 > byId(3L)._2)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq, "descending score order")
  }

  test("persisted BM25 index: indexed == from-scratch, append == fresh-save, buckets prune") {
    val docs = Seq(
      (1L, "spark stream window join extras words here", "s"),
      (2L, "spark spark spark spark spark pad pad pad", "s"),
      (3L, "spark " + ("pad " * 200), "s"),
      (4L, "spark pad pad pad pad pad pad", "s"),
      (5L, "nothing relevant at all", "s")
    ).toDF("doc_id", "text", "source")
    try {
      Search.dropSearchIndex(spark, "srch_t")
      Search.saveSearchIndex(docs, "srch_t")
      val fromScratch = Search.bm25TopK(docs).collect().toSeq
      val indexed = Search.bm25Indexed(spark, "srch_t").collect().toSeq
      assert(indexed === fromScratch, "shared scoring tail: identical by construction")
      // term IN-filter prunes to matching buckets of the postings table
      val plan = Search.bm25Indexed(spark, "srch_t").queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount"), "postings lookup must bucket-prune")
      // append half the corpus later == saving it all at once
      Search.dropSearchIndex(spark, "srch_t2")
      Search.saveSearchIndex(docs.filter(col("doc_id") <= 2), "srch_t2")
      Search.appendToSearchIndex(docs.filter(col("doc_id") > 2), "srch_t2", Some(7L))
      val appended = Search.bm25Indexed(spark, "srch_t2").collect().toSeq
      assert(appended === fromScratch, "append must merge totals and postings losslessly")
      // REPLAY: re-delivering the same ledgered batch id is a no-op
      Search.appendToSearchIndex(docs.filter(col("doc_id") > 2), "srch_t2", Some(7L))
      assert(Search.bm25Indexed(spark, "srch_t2").collect().toSeq === fromScratch,
        "a re-delivered batch id must not double tf/df")
      // ORPHAN: postings landed but the crash beat the ledger row — the
      // un-ledgered batch must stay invisible to search...
      spark.table("srch_t2_postings").filter(col("batch_id") === 7L)
        .withColumn("batch_id", lit(99L))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .bucketBy(8, "tok").sortBy("tok").saveAsTable("srch_t2_postings")
      spark.catalog.refreshTable("srch_t2_postings")
      assert(Search.bm25Indexed(spark, "srch_t2").collect().toSeq === fromScratch,
        "orphaned postings from a crashed append must stay dark")
      // ...and compaction physically folds it out (fresh-save shape)
      Search.compactSearchIndex(spark, "srch_t2")
      assert(Search.bm25Indexed(spark, "srch_t2").collect().toSeq === fromScratch,
        "compaction must preserve results while dropping orphans")
      assert(spark.table("srch_t2_postings")
        .filter(col("batch_id") =!= Search.BaseSegment).count() === 0L,
        "compaction folds every surviving row to the base segment")
    } finally {
      Search.dropSearchIndex(spark, "srch_t")
      Search.dropSearchIndex(spark, "srch_t2")
    }
  }

  test("mergeSearchIndexes: shard merge == fresh-save over the union, orphans dark, overlap rejected") {
    val docs = Seq(
      (1L, "spark stream window join extras words here", "s"),
      (2L, "spark spark spark spark spark pad pad pad", "s"),
      (3L, "spark " + ("pad " * 200), "s"),
      (4L, "spark pad pad pad pad pad pad", "s"),
      (5L, "nothing relevant at all", "s")
    ).toDF("doc_id", "text", "source")
    try {
      Seq("srch_ma", "srch_mb", "srch_mm").foreach(Search.dropSearchIndex(spark, _))
      // shard A saved in one shot; shard B save + append (a multi-batch
      // ledger) + a planted ORPHAN batch (postings landed, ledger row
      // didn't) — the merge must fold A ∪ B's COMMITTED batches only
      Search.saveSearchIndex(docs.filter(col("doc_id") <= 2), "srch_ma")
      Search.saveSearchIndex(docs.filter(col("doc_id") === 3), "srch_mb")
      Search.appendToSearchIndex(docs.filter(col("doc_id") > 3), "srch_mb", Some(7L))
      spark.table("srch_mb_postings").filter(col("batch_id") === 7L)
        .withColumn("batch_id", lit(99L))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .bucketBy(8, "tok").sortBy("tok").saveAsTable("srch_mb_postings")
      spark.catalog.refreshTable("srch_mb_postings")
      Search.mergeSearchIndexes(spark, Seq("srch_ma", "srch_mb"), "srch_mm")
      val fromScratch = Search.bm25TopK(docs).collect().toSeq
      assert(Search.bm25Indexed(spark, "srch_mm").collect().toSeq === fromScratch,
        "a merged index must score exactly like a fresh save over the union corpus")
      // fresh-save shape: every row on the base segment, one totals row
      assert(spark.table("srch_mm_postings")
        .filter(col("batch_id") =!= Search.BaseSegment).count() === 0L,
        "merge folds every committed row to the base segment (orphans stay out)")
      assert(spark.table("srch_mm_totals").count() === 1L)
      // post-merge maintenance keeps working on the merged index
      Search.appendToSearchIndex(
        Seq((6L, "spark joins another appended document", "s"))
          .toDF("doc_id", "text", "source"), "srch_mm", Some(1L))
      assert(spark.table("srch_mm_postings")
        .filter(col("doc_id") === 6L).count() > 0L)
      // sources untouched and readable
      assert(Search.bm25Indexed(spark, "srch_ma").collect().nonEmpty)
      // overlapping doc sets would double tf/df — rejected loudly
      intercept[IllegalArgumentException] {
        Search.mergeSearchIndexes(spark, Seq("srch_ma", "srch_ma"), "srch_mm2")
      }
      Search.dropSearchIndex(spark, "srch_mo")
      Search.saveSearchIndex(docs.filter(col("doc_id") === 2), "srch_mo") // doc 2 also in srch_ma
      intercept[IllegalArgumentException] {
        Search.mergeSearchIndexes(spark, Seq("srch_ma", "srch_mo"), "srch_mm2")
      }
    } finally {
      Seq("srch_ma", "srch_mb", "srch_mm", "srch_mo", "srch_mm2")
        .foreach(Search.dropSearchIndex(spark, _))
    }
  }

  test("search-index takedown: remove == fresh-save over the remainder, replay subtracts nothing") {
    val docs = Seq(
      (1L, "spark stream window join extras words here", "s"),
      (2L, "spark spark spark spark spark pad pad pad", "s"),
      (3L, "spark " + ("pad " * 200), "s"),
      (4L, "spark pad pad pad pad pad pad", "s"),
      (5L, "nothing relevant at all", "s")
    ).toDF("doc_id", "text", "source")
    val keep = docs.filter(col("doc_id") =!= 2L && col("doc_id") =!= 3L)
    val gone = docs.filter(col("doc_id") === 2L || col("doc_id") === 3L)
    try {
      Search.dropSearchIndex(spark, "srch_rm")
      Search.saveSearchIndex(docs, "srch_rm")
      Search.removeFromSearchIndex(spark, "srch_rm", gone)
      val after = Search.bm25Indexed(spark, "srch_rm").collect().toSeq
      // exact equivalence with never having indexed the removed docs:
      // scores shift too (idf/avgdl recomputed), not just membership
      assert(after === Search.bm25TopK(keep).collect().toSeq,
        "takedown must equal fresh BM25 over the remaining corpus")
      assert(!after.map(_.getLong(0)).contains(2L) && !after.map(_.getLong(0)).contains(3L))
      // replayed removal: presence guard subtracts nothing
      Search.removeFromSearchIndex(spark, "srch_rm", gone)
      assert(Search.bm25Indexed(spark, "srch_rm").collect().toSeq === after,
        "a replayed removal must be a no-op for docs with postings")
    } finally Search.dropSearchIndex(spark, "srch_rm")
  }

  test("tokenRarity: integer unigram probabilities and hapax counts") {
    val df = Seq(
      (0L, "common common common", "s0"),
      (1L, "common unique", "s0")
    ).toDF("doc_id", "text", "source")
    // corpus tf: common=4, unique=1, total=5 → p_ppm: common 800000, unique 200000
    val got = TextAnalysis.tokenRarity(df).collect()
      .map { case Row(id: Long, n: Long, p: Long, h: Long) => id -> ((n, p, h)) }.toMap
    assert(got(0L) === ((3L, 800000L, 0L)))
    assert(got(1L) === ((2L, 500000L, 1L))) // (800000+200000) div 2; one hapax
  }

  test("tokenRarityAgainst: reference scoring flags unseen-vocabulary docs, integer-exact") {
    val reference = Seq(
      (0L, "the cat sat on the mat", "s0"),
      (2L, "the dog sat on the rug", "s0")
    ).toDF("doc_id", "text", "source")
    val freqs = TextAnalysis.tokenFreqs(reference) // 12 tokens: the×4, sat×2, on×2, ...
    val batch = Seq(
      (1L, "the cat sat", "s1"), // every token in the reference
      (3L, "zz qq ww", "s1")     // pure gibberish: all unseen
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.tokenRarityAgainst(batch, freqs).collect()
      .map { case Row(id: Long, n: Long, p: Long, u: Long) => id -> ((n, p, u)) }.toMap
    assert(got(3L) === ((3L, 0L, 3L)), "unseen vocabulary must score 0 ppm")
    // the=4/12 → 333333 ppm, cat=1/12 → 83333, sat=2/12 → 166666
    assert(got(1L) === ((3L, (333333L + 83333L + 166666L) / 3, 0L)))
    // the persisted-model round trip scores identically
    TextAnalysis.saveTokenFreqs(reference, "rfreq_rt")
    val (lf, lt) = TextAnalysis.loadTokenFreqs(spark, "rfreq_rt")
    val viaModel = TextAnalysis.tokenRarityAgainst(batch, lf, lt).collect()
      .map { case Row(id: Long, n: Long, p: Long, u: Long) => id -> ((n, p, u)) }.toMap
    assert(viaModel === got)
  }

  test("bigramSurprisal: integer floor-log2 surprisal, hand-checked") {
    val df = Seq(
      (0L, "a b a b", "s0"), // bigrams: "a b" ×2, "b a"
      (1L, "a b c", "s0"),   // bigrams: "a b", "b c"
      (2L, "a", "s0")        // single token: no bigram, absent from output
    ).toDF("doc_id", "text", "source")
    // c2: "a b"=3, "b a"=1, "b c"=1; c1: a=3, b=2; V=3
    // bits("a b") = floor(log2((3+3) div (3+1))) = floor(log2(1)) = 0
    // bits("b a") = floor(log2((2+3) div 2)) = floor(log2(2)) = 1
    // bits("b c") = floor(log2((2+3) div 2)) = 1
    val got = TextAnalysis.bigramSurprisal(df).collect()
      .map { case Row(id: Long, n: Long, t: Long, m: Long) => id -> ((n, t, m)) }.toMap
    assert(got === Map(
      0L -> ((3L, 1L, 333L)), // 0+1+0 bits over 3 bigrams
      1L -> ((2L, 1L, 500L))))
  }

  test("bigramSurprisalAgainst: the unseen fallback chain, and the persisted round trip") {
    val reference = Seq(
      (0L, "a b a b", "s0"),
      (1L, "a b c", "s0")
    ).toDF("doc_id", "text", "source")
    // LM as above: bits("a b")=0, "b a"=1, "b c"=1; c1: a=3, b=2; V=3
    val batch = Seq(
      (10L, "a b c", "s1"),  // both bigrams seen: 0+1 bits
      (11L, "a c b", "s1"),  // "a c" unseen, prev a seen → floor(log2(3+3))=2
                             // "c b" prev c never a prefix → floor(log2(V=3))=1
      (12L, "zz qq", "s1")   // prev zz unseen → 1
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.bigramSurprisalAgainst(batch, reference).collect()
      .map { case Row(id: Long, n: Long, t: Long, m: Long, u: Long) => id -> ((n, t, m, u)) }.toMap
    assert(got === Map(
      10L -> ((2L, 1L, 500L, 0L)),
      11L -> ((2L, 3L, 1500L, 2L)),
      12L -> ((1L, 1L, 1000L, 1L))))
    // persisted-model round trip scores identically
    TextAnalysis.saveBigramLm(reference, "blm_rt")
    val (bg, prev, meta) = TextAnalysis.loadBigramLm(spark, "blm_rt")
    val viaModel = TextAnalysis.bigramSurprisalAgainst(batch, bg, prev, meta).collect()
      .map { case Row(id: Long, n: Long, t: Long, m: Long, u: Long) => id -> ((n, t, m, u)) }.toMap
    assert(viaModel === got)
  }

  test("bigram LM catches common-word token salad that unigram rarity scores normal") {
    // the motivating case: every TOKEN is head vocabulary, every
    // TRANSITION is improbable — a unigram gate passes it, the LM flags it
    val reference = Seq.tabulate(20)(i =>
      (i.toLong, "the cat sat on the mat and the dog ran to the rug", "s0"))
      .toDF("doc_id", "text", "source")
    val fluent = (100L, "the cat sat on the mat", "s1")
    val salad = (101L, "the the mat cat on sat the", "s1") // same vocab, shuffled
    val batch = Seq(fluent, salad).toDF("doc_id", "text", "source")
    val rarity = TextAnalysis.tokenRarityAgainst(batch, TextAnalysis.tokenFreqs(reference))
      .collect().map { case Row(id: Long, _, p: Long, u: Long) => id -> ((p, u)) }.toMap
    assert(rarity(101L)._2 === 0L, "unigram gate: no unseen tokens in the salad")
    val lm = TextAnalysis.bigramSurprisalAgainst(batch, reference).collect()
      .map { case Row(id: Long, _, _, m: Long, _) => id -> m }.toMap
    assert(lm(101L) > 2 * lm(100L),
      s"salad must score well above fluent text (got ${lm(101L)} vs ${lm(100L)})")
  }

  test("saveTokenFreqs minTf: the vocab cut changes n_unseen only, never a probability") {
    // the cut is probability-free only when n_total/1e6 > minTf-1 (the
    // docstring's own precondition): build a reference past a million
    // occurrences so tf=1 genuinely floors to 0 ppm
    val reference = Seq((0L, "", "s0"), (1L, "rare2 rare3", "s0"))
      .toDF("doc_id", "ignored", "source")
      .withColumn("text", when(col("doc_id") === 0L,
        concat(expr("repeat('filler ', 1100000)"), lit("rare1")))
        .otherwise(col("ignored")))
      .select(col("doc_id"), col("text"), col("source"))
    val batch = Seq((10L, "filler rare1 zz", "s1")).toDF("doc_id", "text", "source")
    TextAnalysis.saveTokenFreqs(reference, "rfreq_full")
    TextAnalysis.saveTokenFreqs(reference, "rfreq_cut", minTf = 2L)
    def score(name: String) = {
      val (f, t) = TextAnalysis.loadTokenFreqs(spark, name)
      TextAnalysis.tokenRarityAgainst(batch, f, t).collect()
        .map { case Row(id: Long, n: Long, p: Long, u: Long) => id -> ((n, p, u)) }.toMap
    }
    val full = score("rfreq_full")
    val cut = score("rfreq_cut")
    // n_total is over ALL 1,100,003 occurrences either way, so rare1's
    // single occurrence is 0 ppm seen OR unseen — mean identical
    assert(full(10L)._2 === cut(10L)._2, "the cut must not move any probability")
    assert(full(10L)._3 === 1L, "full model: only zz unseen")
    assert(cut(10L)._3 === 2L, "cut model: rare1 reclassified to unseen")
    // and the cut artifact is genuinely smaller
    assert(spark.table("rfreq_cut_freq").count() < spark.table("rfreq_full_freq").count())
  }

  test("trainOrderShuffle: a reproducible permutation, re-drawn per epoch salt") {
    val docs = (0L until 300L).map(i => (i, s"text $i", "s0")).toDF("doc_id", "text", "source")
    val e0 = TextAnalysis.trainOrderShuffle(docs).collect()
      .map { case Row(b: String, p: Long, id: Long) => (b, p, id) }
    // a permutation: every doc exactly once, positions contiguous per bucket
    assert(e0.map(_._3).sorted === (0L until 300L))
    e0.groupBy(_._1).values.foreach { bucket =>
      assert(bucket.map(_._2).sorted === (1L to bucket.length))
    }
    // decorrelated from id order: the per-bucket sequences are not just
    // sorted doc_ids (md5 scatters them)
    assert(e0.sortBy(t => (t._1, t._2)).map(_._3).toSeq !== (0L until 300L).toSeq)
    // reproducible within an epoch, fresh permutation for the next one
    val e0again = TextAnalysis.trainOrderShuffle(docs).collect()
      .map { case Row(b: String, p: Long, id: Long) => (b, p, id) }
    assert(e0again === e0)
    val e1 = TextAnalysis.trainOrderShuffle(docs, salt = "epoch-1").collect()
      .map { case Row(b: String, p: Long, id: Long) => (b, p, id) }
    assert(e1.sortBy(t => (t._1, t._2)).map(_._3) !== e0.sortBy(t => (t._1, t._2)).map(_._3),
      "a new epoch salt must draw a different permutation")
    assert(e1.map(_._3).sorted === (0L until 300L))
  }

  test("dedupRateBySource: planted duplicates yield the exact integer rate") {
    val df = Seq(
      (0L, "same doc", "s0"), (1L, "same doc", "s0"),
      (2L, "SAME   DOC", "s0"), (3L, "unique here", "s0"),
      (4L, "all different", "s1"), (5L, "totally other", "s1")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.dedupRateBySource(df).collect()
      .map { case Row(s: String, n: Long, d: Long, p: Long) => s -> ((n, d, p)) }.toMap
    assert(got("s0") === ((4L, 2L, 50L))) // 0,1,2 share one normalized fp
    assert(got("s1") === ((2L, 2L, 0L)))
  }

  test("dsirWeights ranks target-domain-like docs above off-domain docs") {
    // target domain: feline sentences; base pool: felines + finance.
    // A held-out feline doc must out-weight a held-out finance doc —
    // that separation IS the DSIR selection signal.
    val target = Seq(
      (100L, "the cat sat on the mat", "t"),
      (101L, "the cat ate the fish", "t"),
      (102L, "a cat sat on a rug", "t")
    ).toDF("doc_id", "text", "source")
    val pool = Seq(
      (0L, "the cat sat on the rug", "p"),    // target-like
      (1L, "market rates rose again today", "p") // off-domain
    ).toDF("doc_id", "text", "source")
    val base = pool.unionByName(target)
    val got = TextAnalysis.dsirWeights(pool, target, base).collect()
      .map { case Row(id: Long, n: Long, tb: Long, bb: Long, w: Long) => id -> ((n, tb, bb, w)) }
      .toMap
    assert(got(0L)._4 > got(1L)._4,
      s"feline doc should out-weight finance doc: $got")
    // off-domain doc: every bigram unseen by the target LM, so its
    // target surprisal can only exceed its base surprisal → weight < 0
    assert(got(1L)._4 < 0L)
  }

  test("qualityCalibrated admits at least the top pct per source with boundary ties") {
    val docs = Tables.documents(spark, Sf0001)
    val got = TextAnalysis.qualityCalibrated(docs).collect()
    val bySrc = got.groupBy(_.getString(1))
    for ((src, rows) <- bySrc) {
      val n = rows.length
      val k = (n * TextAnalysis.QualityCalibratedTopPct + 99) / 100
      val thr = rows.head.getLong(3)
      val kept = rows.filter(_.getBoolean(4))
      assert(kept.length >= k, s"$src kept ${kept.length} < k=$k")
      // threshold is the k-th largest score: fewer than k docs STRICTLY above it
      assert(rows.count(_.getLong(2) > thr) < k, s"$src threshold too low")
      // keep == score >= threshold, for every doc
      assert(rows.forall(r => r.getBoolean(4) === (r.getLong(2) >= thr)))
    }
  }

  test("vocabGrowth is monotone and lands exactly on the corpus vocabulary") {
    val docs = Tables.documents(spark, Sf0001)
    val got = TextAnalysis.vocabGrowth(docs).collect()
    val vocab = docs
      .select(explode(split(TextFunctions.normText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .agg(countDistinct(col("tok"))).head.getLong(0)
    val tot = docs
      .select(explode(split(TextFunctions.normText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0).count()
    assert(got.last.getLong(3) === vocab, "final cum_vocab must equal distinct tokens")
    assert(got.last.getLong(2) === tot, "final cum_tokens must equal total occurrences")
    val vs = got.map(_.getLong(3)).toSeq
    assert(vs === vs.sorted, "cum_vocab must be nondecreasing")
  }

  test("shingleNovelty: verbatim copies score 0, unique text scores 1000") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon", "s0"),
      (1L, "alpha beta gamma delta epsilon", "s0"), // exact copy of 0
      (2L, "one two three four five six", "s1")     // fully novel
    ).toDF("doc_id", "text", "source")
    val got = Dedup.shingleNovelty(docs).collect()
      .map { case Row(id: Long, n: Long, sh: Long, nov: Long) => id -> ((n, sh, nov)) }.toMap
    assert(got(0L) === ((3L, 3L, 0L)))   // 3 shingles, all shared with doc 1
    assert(got(1L) === ((3L, 3L, 0L)))
    assert(got(2L) === ((4L, 0L, 1000L)))
  }

  test("normStats reports exact rounded min/max norms per sign bucket") {
    val vecs = Seq(
      (0L, Array(3f, 4f) ++ Array.fill(6)(0f)),   // norm 5, bucket bits 1,1 → 3
      (1L, Array(6f, 8f) ++ Array.fill(6)(0f)),   // norm 10, same bucket
      (2L, Array(-1f, 2f) ++ Array.fill(6)(0f))   // norm √5, bucket bit0=0
    ).toDF("vec_id", "embedding")
    val got = Similarity.normStats(vecs).collect()
      .map { case Row(b: Long, n: Long, mn: Double, mx: Double) => b -> ((n, mn, mx)) }.toMap
    assert(got(255L) === ((2L, 5.0, 10.0))) // zeros count as >= 0 sign bits
    assert(got(254L) === ((1L, 2.2361, 2.2361)))
  }

  test("chunkDocuments: window starts/sizes follow width+stride; fp is md5 of the window") {
    val toks150 = (1 to 150).map(i => s"t$i")
    val docs = Seq(
      (0L, toks150.mkString(" "), "s0"),
      (1L, "one two three", "s0"),  // shorter than one window → a single short chunk
      (2L, "", "s0"),               // empty → no chunks
      (3L, "   \t  ", "s0"),        // whitespace-only → no chunks
      (4L, null.asInstanceOf[String], "s0") // null → no chunks, no crash
    ).toDF("doc_id", "text", "source")
    val chunks = TextAnalysis.chunkDocuments(docs).collect()
      .map { case Row(d: Long, c: Long, n: Long, fp: String) => (d, c, n, fp) }
    val byDoc = chunks.groupBy(_._1)
    assert(!byDoc.contains(2L) && !byDoc.contains(3L) && !byDoc.contains(4L))
    assert(byDoc(1L).map(x => (x._2, x._3)).toSeq === Seq((0L, 3L)))
    // 150 tokens, stride 48, width 64 → starts 0/48/96/144, sizes 64/64/54/6;
    // consecutive windows overlap by width − stride = 16 and no token is dropped
    assert(byDoc(0L).sortBy(_._2).map(x => (x._2, x._3)).toSeq ===
      Seq((0L, 64L), (1L, 64L), (2L, 54L), (3L, 6L)))
    val w1 = toks150.slice(48, 112).mkString(" ")
    val fp1 = java.security.MessageDigest.getInstance("MD5")
      .digest(w1.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(byDoc(0L).find(_._2 == 1L).get._4 === fp1)
  }

  test("hashedTfCounts + lexicalAnn: a verbatim copy ranks first at cosine 1.0") {
    val docs = Seq(
      (0L, "spark shuffles the hashed tokens into buckets", "s0"),
      (1L, "a completely different sentence about nothing shared", "s0"),
      (2L, "spark shuffles the hashed tokens into buckets", "s0"), // copy of 0
      (3L, "spark shuffles some hashed tokens", "s0"),             // partial overlap
      (4L, "", "s0"), (5L, null.asInstanceOf[String], "s0")        // token-less: no vector
    ).toDF("doc_id", "text", "source")
    val counts = TextAnalysis.hashedTfCounts(docs).collect()
      .map { case Row(d: Long, b: Long, c: Long) => (d, b, c) }
    assert(!counts.exists(r => r._1 == 4L || r._1 == 5L), "token-less docs have no rows")
    assert(counts.filter(_._1 == 0L).toSet === counts.filter(_._1 == 2L)
      .map(r => (0L, r._2, r._3)).toSet, "verbatim copies hash identically")
    val ann = TextAnalysis.lexicalAnn(docs).collect()
      .map { case Row(q: Long, n: Long, rk: Long, cs: Double) => (q, rk) -> ((n, cs)) }.toMap
    assert(ann((0L, 1L)) === ((2L, 1.0)), "the copy is doc 0's top neighbor at cos 1.0")
    assert(ann((2L, 1L)) === ((0L, 1.0)))
    assert(ann((0L, 2L))._1 === 3L, "the partial overlap ranks second")
  }

  test("corpusDiff: planted add/remove/change transitions; null text is present, not removed") {
    val oldSnap = Seq(
      (1L, "alpha", "s0"), (2L, "beta", "s0"), (3L, "gamma", "s0"),
      (4L, null.asInstanceOf[String], "s0")
    ).toDF("doc_id", "text", "source")
    val newSnap = Seq(
      (2L, "beta", "s0"),                      // unchanged
      (3L, "gamma edited", "s0"),              // changed
      (4L, null.asInstanceOf[String], "s0"),   // null in both: unchanged (null-safe fp compare)
      (5L, "delta", "s0")                      // added; doc 1 removed
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.corpusDiff(oldSnap, newSnap).collect()
    assert(got.length === 1)
    val Row(src: String, add: Long, rem: Long, chg: Long, same: Long) = got.head
    assert(src === "s0")
    assert((add, rem, chg, same) === ((1L, 1L, 1L, 2L)))
  }

  test("leakageSafeSplit: planted families move atomically to their rep's split") {
    // 6 planted exact-dup pairs with disjoint vocabularies: each pair is
    // one near-dup family {p·100, p·100+1}, rep = p·100
    val docs = (0 until 6).flatMap { p =>
      val txt = (1 to 12).map(i => s"w${p}x$i").mkString(" ")
      Seq((p * 100L, txt, "s0"), (p * 100L + 1L, txt, "s0"))
    }.toDF("doc_id", "text", "source")
    Dedup.clearSessionState() // fixture corpus — don't let sf cluster maps collide
    val roll = TextAnalysis.leakageSafeSplit(docs).collect()
      .map { case Row(sp: String, _: String, n: Long, _: Long, cl: Long, mv: Long) =>
        (sp, n, cl, mv) }
    // the brute-force ground truth, recomputed with plain JVM md5
    def bucket(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(4), 16) % 100
    }
    def splitOf(b: Long) = if (b < TextAnalysis.TestPct) "test"
      else if (b < TextAnalysis.TestPct + TextAnalysis.ValidPct) "valid" else "train"
    // every member takes its REP's split; moved = members whose naive split differs
    val expSplits = (0 until 6).flatMap { p =>
      Seq(splitOf(bucket(p * 100L)), splitOf(bucket(p * 100L))) }
    val expMoved = (0 until 6).map { p =>
      if (splitOf(bucket(p * 100L + 1L)) != splitOf(bucket(p * 100L))) 1L else 0L }.sum
    assert(roll.map(_._3).sum === 12L) // all docs are clustered in this fixture
    assert(roll.map(_._4).sum === expMoved)
    val expCounts = expSplits.groupBy(identity).view.mapValues(_.size.toLong).toMap
    roll.foreach { case (sp, n, _, _) => assert(n === expCounts.getOrElse(sp, -1L)) }
    Dedup.clearSessionState() // leave no fixture-keyed cluster map behind
  }

  test("docTopicClusters: disjoint-vocabulary doc groups land in disjoint clusters with their own top tokens") {
    val docs = (0L until 3L).map(i => (i, "apple apple apple", "s")) ++
      (3L until 6L).map(i => (i, "zebra zebra zebra", "s"))
    val out = TextAnalysis.docTopicClusters(docs.toDF("doc_id", "text", "source")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // identical docs share a vector, so each group occupies exactly one
    // cluster: two non-empty cells of size 3, each topped by its own token
    val cells = out.map(_._1).distinct
    assert(cells.length === 2)
    val byCell = out.groupBy(_._1)
    byCell.values.foreach { rows =>
      assert(rows.head._2 === 3L)                   // n_docs
      assert(rows.map(_._4).distinct.length === 1)  // one token family per cell
    }
    assert(out.map(_._4).distinct.sorted.toSeq === Seq("apple", "zebra"))
    graft.operators.Similarity.clearSessionState() // fixture model out of the topic slot
  }

  test("mixtureBudgetRates: equal targets, capped rates, and a disclosed deficit for the scarce source") {
    // srcA: 30 tokens, srcB: 10 -> total 40, budget 20, target 10 each
    val docs = Seq(
      (0L, Seq.fill(30)("w").mkString(" "), "srcA"),
      (1L, Seq.fill(10)("w").mkString(" "), "srcB")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.mixtureBudgetRates(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // srcA downsamples: 10M/30 = 333333 ppm -> 9 expected (floor), deficit 1 disclosed
    assert(got("srcA") === ((30L, 10L, 333333L, 9L, 1L)))
    // srcB can exactly fill its slot at the 1e6 ppm cap
    assert(got("srcB") === ((10L, 10L, 1000000L, 10L, 0L)))
  }

  test("tokenDistributionShift: identical sources score identically, a disjoint-vocab source scores higher") {
    val docs = Seq(
      (0L, "x x y", "srcA"), (1L, "y x", "srcA"),
      (2L, "x x y", "srcB"), (3L, "y x", "srcB"), // same multiset as srcA
      (4L, "z z z", "srcC"), (5L, "z z", "srcC")  // vocabulary disjoint from the corpus bulk
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.tokenDistributionShift(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got("srcA") === got("srcB")) // the metric is a pure function of the distribution
    assert(got.keySet === Set("srcA", "srcB", "srcC"))
    // the drifted source stands out on the normalized reading
    assert(got("srcC")._4 > got("srcA")._4)
    // sanity on the components: totals and vocab are plain counts
    assert(got("srcA")._1 === 5L && got("srcA")._2 === 2L)
    assert(got("srcC")._1 === 5L && got("srcC")._2 === 1L)
  }

  test("curationKillReasons: first failing gate wins — a low-quality dup dies as 'quality', never 'exact_dup'") {
    val good = "the quick brown fox jumps over the lazy dog again and then runs far away to find more food"
    val gibberish = "zog blarg frumple quix zanter bloop krell vanta morp dazzle " +
      "fenwick groll hapt jinder klome lurn mivvy norp quell rost"
    val docs = Seq(
      (0L, good, "s"),      // admitted
      (1L, good, "s"),      // exact dup of 0 -> exact_dup (keeper = min doc_id)
      (2L, "!!!", "s"),     // fails quality
      (3L, "!!!", "s"),     // dup of 2 AND low quality: the quality gate fires FIRST
      (4L, gibberish, "s")  // passes quality, fails language id
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.curationKillReasons(docs).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      "admitted" -> ((1L, 5L, 200000L)),
      "exact_dup" -> ((1L, 5L, 200000L)),
      "lang" -> ((1L, 5L, 200000L)),
      "quality" -> ((2L, 5L, 400000L))))
  }
}
