package graft

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Dedup, UniqueUsers}
import graft.plans.CosineSimilarity

/** Property-based invariants (SURVEY.md §5.3). Each property runs Spark
  * jobs, so the case count is kept small. */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val eventGen: Gen[List[(Int, Int)]] = // (minuteOffset, uid)
    Gen.listOfN(60, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 10)))

  property("windowed distinct == collections brute force") = forAll(eventGen) { evs =>
    val base = 1700000040L
    val df = evs.zipWithIndex
      .map { case ((m, u), i) => (base + m * 60L + i % 60, u.toLong) }
      .toDF("sec", "user_id")
      .selectExpr("CAST(sec AS TIMESTAMP) AS ts", "user_id")
    val got = UniqueUsers.perMinute(df).collect()
      .map { case Row(m: Long, n: Long) => m -> n }.toMap
    val expected = evs.zipWithIndex
      .map { case ((m, u), i) => ((base + m * 60L + i % 60) / 60 * 60, u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    got == expected
  }

  property("exact variants agree pairwise") = forAll(eventGen) { evs =>
    val base = 1700000040L
    val df = evs.map { case (m, u) => (base + m * 60L, u.toLong) }
      .toDF("sec", "user_id")
      .selectExpr("CAST(sec AS TIMESTAMP) AS ts", "user_id")
    val a = UniqueUsers.perMinute(df).collect().toSeq
    val b = UniqueUsers.perMinuteTwoPhase(df).collect().toSeq
    val c = UniqueUsers.perMinuteCollectSet(df).collect().toSeq
    a == b && b == c
  }

  // random funnel streams: (user, step-type index or noise, minute)
  private val funnelGen: Gen[List[(Int, Int, Int)]] =
    Gen.listOfN(50, Gen.zip(Gen.choose(0, 6), Gen.choose(0, 5), Gen.choose(0, 600)))

  property("funnel semantics order: unbounded and sessionized never exceed the infinite-horizon chain") =
    forAll(funnelGen) { evs =>
      import graft.operators.Relational
      val types = Relational.FunnelSteps ++ Seq("noise", "error")
      val base = 1700000000L
      val df = evs.map { case (u, t, m) => (u.toLong, types(t), base + m * 60L) }
        .toDF("user_id", "event_type", "sec")
        .selectExpr("user_id", "event_type", "CAST(sec AS TIMESTAMP) AS ts")
      def counts(r: Array[Row]) = r.sortBy(_.getLong(0)).map(_.getLong(2)).toSeq
      // THEOREMS (proved in the operators' scaladoc reasoning):
      //  - unbounded reached ⇒ the greedy chain with an infinite horizon
      //    reaches too (greedy picks t'_j <= t_j by induction);
      //  - a sessionized conversion is itself a valid infinite-horizon
      //    greedy witness. Neither holds vs a FINITE horizon, and
      //    windowed vs unbounded are incomparable in general — only
      //    these two orderings are laws.
      val inf = counts(Relational.eventFunnelWindowed(df, horizonSec = Long.MaxValue / 4).collect())
      val unb = counts(Relational.eventFunnel(df).collect())
      val ses = counts(Relational.eventFunnelSessionized(df).collect())
      unb.zip(inf).forall { case (u, i) => u <= i } &&
        ses.zip(inf).forall { case (s, i) => s <= i }
    }

  private val docsGen: Gen[List[String]] =
    Gen.listOfN(8, Gen.listOfN(12, Gen.oneOf("alpha", "beta", "Gamma", "DELTA", "eps"))
      .map(_.mkString(" ")))

  property("normalized dedup partitions the corpus") = forAll(docsGen) { texts =>
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.exactNormalized(df).collect()
      .map { case Row(_, n: Long) => n }
    got.sum == texts.size.toLong && got.forall(_ >= 1)
  }

  /** Reference Levenshtein (full DP) for the blocking-exactness oracle. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val editedPairGen: Gen[(String, String)] = for {
    base <- Gen.listOfN(44, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    nEdits <- Gen.choose(0, 7) // straddles the maxDist=5 boundary
    edits <- Gen.listOfN(nEdits, Gen.zip(Gen.choose(0, 39), Gen.choose(0, 2), Gen.oneOf('a', 'b', 'c', 'd')))
  } yield {
    val other = edits.foldLeft(base) { case (s, (pos, kind, ch)) =>
      val p = math.min(pos, math.max(s.length - 1, 0))
      kind match {
        case 0 => s.updated(p, ch)                       // substitute
        case 1 => s.substring(0, p) + ch + s.substring(p) // insert
        case _ if s.length > 1 => s.substring(0, p) + s.substring(p + 1) // delete
        case _ => s
      }
    }
    (base, other)
  }

  /** The PassJoin-style pigeonhole blocking in Dedup.levenshteinPrefix is
    * EXACT: for any pair, the blocked+verified result contains the pair
    * iff the 40-char-prefix distance is <= 5, with the exact distance —
    * never a missed candidate. Also throws in far pairs (independent
    * strings) so both sides of the threshold are exercised. */
  property("levenshtein segment blocking is exact") = forAll(editedPairGen, editedPairGen) {
    case ((a1, a2), (b1, _)) =>
      val df = Seq((0L, a1, "s0"), (1L, a2, "s0"), (2L, b1.reverse, "s0"))
        .toDF("doc_id", "text", "source")
      val got = Dedup.levenshteinPrefix(df).collect()
        .map { case Row(x: Long, y: Long, d: Long) => (x, y) -> d }.toMap
      val docs = Map(0L -> a1.take(40), 1L -> a2.take(40), 2L -> b1.reverse.take(40))
      val expected = (for {
        x <- docs.keys; y <- docs.keys if x < y
        d = lev(docs(x), docs(y)) if d <= 5
      } yield (x, y) -> d.toLong).toMap
      got == expected
  }

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(8, Gen.choose(-5f, 5f)).suchThat(v => v.exists(math.abs(_) > 0.01f))

  property("cosine is symmetric and self-similarity ~ 1") = forAll(vecGen, vecGen) { (a, b) =>
    val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
    val Row(ab: Double, ba: Double, aa: Double) = df.select(
      CosineSimilarity.cosineFast($"a", $"b"),
      CosineSimilarity.cosineFast($"b", $"a"),
      CosineSimilarity.cosineFast($"a", $"a")).head()
    ab == ba && math.abs(aa - 1.0) < 1e-12 && ab >= -1.0000001 && ab <= 1.0000001
  }

  private val shardDocsGen: Gen[List[(Long, Int)]] = // (doc_id, nTokens)
    Gen.listOfN(20, Gen.zip(Gen.choose(0L, 2500L), Gen.choose(1, 60)))
      .map(_.distinctBy(_._1))
      .suchThat(_.nonEmpty)

  /** Packing invariants on arbitrary doc-id/size mixes straddling block
    * boundaries: token totals conserve, every doc lands in exactly one
    * shard, shard ids are contiguous from 0 within each block, and every
    * doc's block respects the doc-range bound. */
  property("shard packing conserves tokens and respects block bounds") = forAll(shardDocsGen) { docs =>
    import graft.operators.TextAnalysis
    val df = docs.map { case (id, n) => (id, List.fill(n)("w").mkString(" "), "s0") }
      .toDF("doc_id", "text", "source")
    val shards = TextAnalysis.packShards(df, budget = 100).collect()
      .map { case Row(_, blk: Long, sh: Long, nd: Long, tok: Long, f: Long, l: Long) =>
        (blk, sh, nd, tok, f, l) }
    val conserve = shards.map(_._4).sum == docs.map(_._2.toLong).sum &&
      shards.map(_._3).sum == docs.size.toLong
    val contiguous = shards.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._2).sorted.toSeq == (0L until rows.length).toSeq }
    val blockOk = shards.forall { case (blk, _, _, _, f, l) =>
      f / TextAnalysis.PackBlockDocs == blk && l / TextAnalysis.PackBlockDocs == blk }
    conserve && contiguous && blockOk
  }

  private val sigFlipGen: Gen[(Long, Set[Int])] = for {
    sig <- Gen.long
    n <- Gen.choose(0, 3)
    bits <- Gen.listOfN(n, Gen.choose(0, 63)).map(_.toSet)
  } yield (sig, bits)

  /** The simhash banding recall guarantee is STRUCTURAL, not statistical:
    * hamming ≤ 3 damages at most 3 of the 4 16-bit bands, so at least one
    * band key collides — for ANY signature and ANY choice of ≤ 3 flipped
    * bits, including bit 63 (the signed two's-complement bit). JVM
    * replica of Dedup.simhashBandTable's shift+mask; also pins every
    * band key inside the 16-bit keyspace. Pure JVM — no Spark job. */
  property("simhash 4x16 banding: any hamming<=3 pair shares a band") = forAll(sigFlipGen) {
    case (sig, bits) =>
      val other = bits.foldLeft(sig)((s, b) => s ^ (1L << b))
      def bands(x: Long): Seq[Long] = (0 until Dedup.SimhashBands)
        .map(b => (x >> (Dedup.SimhashBandBits * b)) & ((1L << Dedup.SimhashBandBits) - 1))
      bands(sig).zip(bands(other)).exists { case (a, b) => a == b } &&
        bands(sig).forall(k => k >= 0 && k < (1L << Dedup.SimhashBandBits))
  }

  private val piiTextGen: Gen[String] = {
    val word = Gen.oneOf("the", "fox", "ran", "mot", "Xy9", "a1b2c3d4", "12345")
    val pii = Gen.oneOf("bob@example.com", "555-123-4567", "10.0.0.1", "98765432",
      "x.y_z%q+1@sub.domain.org")
    Gen.listOfN(12, Gen.frequency(4 -> word, 1 -> pii)).map(_.mkString(" "))
  }

  /** Scrubbing is IDEMPOTENT: the replacement tags contain no digits or
    * '@', so a second pass can never find a new match — the property a
    * pipeline relies on when a re-run re-scrubs already-clean shards. */
  /** Random undirected edge lists: up to 24 nodes, up to 40 edges
    * (self-loops and parallel/reversed duplicates included on purpose —
    * the contraction must canonicalize them away). */
  private val edgesGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0L, 23L), Gen.choose(0L, 23L)))

  property("star contraction == reference union-find on random graphs") = forAll(edgesGen) { es =>
    val pairs = es.toDF("doc_a", "doc_b")
    val got = Dedup.starContract(pairs, maxRounds = 50).collect()
      .map { case Row(id: Long, rep: Long) => id -> rep }.toMap
    // reference: textbook union-find with path compression
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // expected rep = component MIN; nodes only appear if they touch an edge
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.toSet
    val expected = nodes.groupBy(find).flatMap { case (_, comp) =>
      val m = comp.min; comp.map(_ -> m)
    }
    got == expected
  }

  property("piiRedact is idempotent") = forAll(piiTextGen) { text =>
    import graft.functions.TextFunctions.piiRedact
    val df = Seq(Tuple1(text)).toDF("t")
    val Row(once: String, twice: String) =
      df.select(piiRedact($"t"), piiRedact(piiRedact($"t"))).head()
    once == twice && !once.contains("@example.com")
  }

  // Zipf-ish stream over a vocabulary far above the sketch cap, chopped
  // into arbitrary partitions — exercises BOTH saturation paths (the
  // per-item decrement epoch and the merge's (cap+1)-th-largest cut),
  // which the near-uniform 31-token testdata corpus never triggers.
  private val mgStreamGen: Gen[(List[String], Int)] = for {
    n <- Gen.choose(300, 1200)
    toks <- Gen.listOfN(n, Gen.frequency(
      40 -> Gen.const("hh1"), 25 -> Gen.const("hh2"),
      35 -> Gen.choose(0, 199).map("t" + _)))
    parts <- Gen.choose(1, 7)
  } yield (toks, parts)

  property("misra-gries containment: merged summary keeps every item above N/(cap+1)") =
    forAll(mgStreamGen) { case (toks, parts) =>
      val cap = 16
      val agg = new graft.functions.MisraGriesAggregator(cap)
      val buffers = toks.grouped(math.max(1, toks.size / parts))
        .map(_.foldLeft(agg.zero)(agg.reduce)).toList
      val merged = buffers.reduce(agg.merge)
      val n = toks.size.toLong
      val freq = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val mustKeep = freq.filter(_._2 > n / (cap + 1)).keySet
      val kept = agg.finish(merged).toSet
      merged.size <= cap && mustKeep.subsetOf(kept)
    }

  // small random corpora over a tiny vocabulary so near-dup pairs exist
  private val sparseDocGen: Gen[List[String]] = Gen.listOfN(8,
    Gen.listOfN(12, Gen.frequency(
      5 -> Gen.const("alpha"), 4 -> Gen.const("beta"), 3 -> Gen.const("gamma"),
      2 -> Gen.const("delta"), 1 -> Gen.choose(0, 30).map("w" + _)))
      .map(_.mkString(" ")))

  property("sparseCosine == BigInt brute force over the df-cut space") =
    forAll(sparseDocGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.sparseCosine(docs, maxDf = 6).collect()
        .map { case Row(a: Long, b: Long, d: Long, na: Long, nb: Long, p: Long) =>
          (a, b) -> ((d, na, nb, p)) }.toMap
      // reference: exact rational cosine over the same df-cut space
      val tf = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split("\\s+").filter(_.nonEmpty)
          .groupBy(_.toLowerCase).view.mapValues(_.length.toLong).toMap }
      val df = tf.flatMap(_._2.keys).groupBy(identity).view.mapValues(_.size).toMap
      val space = tf.map { case (id, m) => id -> m.filter { case (k, _) => df(k) <= 6 } }.toMap
      val exp = (for {
        a <- space.keys; b <- space.keys if a < b
        dot = space(a).keysIterator.filter(space(b).contains)
          .map(k => BigInt(space(a)(k)) * space(b)(k)).sum
        na2 = space(a).values.map(v => BigInt(v) * v).sum
        nb2 = space(b).values.map(v => BigInt(v) * v).sum
        // a pair exists only via a shared posting (dot > 0) — also what
        // keeps the cos2_pct denominator nonzero
        if dot > 0 && dot * dot * 25 >= na2 * nb2 * 16
      } yield (a, b) -> ((dot.toLong, na2.toLong, nb2.toLong,
        (dot * dot * 100 / (na2 * nb2)).toLong))).toMap
      got == exp
    }

  // CUSUM's relational closed form (prefix sum minus clamped running min)
  // must equal the textbook recursion s_i = max(0, s_{i-1} + dev_i) on any
  // integer series — the algebraic identity dailyRevenueCusum rests on
  private val revenueGen: Gen[List[Int]] =
    Gen.listOfN(30, Gen.choose(1, 500))

  property("CUSUM closed form == direct recursion") = forAll(revenueGen) { xs =>
    val orders = xs.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).atStartOfDay()), v.toDouble)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val got = graft.operators.Audit.dailyRevenueCusum(orders).collect()
      .map(_.getLong(4)).toList
    // reference recursion on the same doubled deviations
    val cents = xs.map(_.toLong * 100)
    val sorted = cents.sorted
    val n = sorted.length
    val med2 = // 2 * median, integer (even n averages the middle pair)
      if (n % 2 == 1) 2 * sorted(n / 2) else sorted(n / 2 - 1) + sorted(n / 2)
    val devs = cents.map(2 * _ - med2)
    val exp = devs.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
    got == exp
  }

  // equi-depth histogram invariants on any value multiset: bucket counts
  // sum to n, ids stay in range and strictly ascend, bounds are ordered
  // and non-overlapping
  private val priceGen: Gen[List[Int]] =
    Gen.listOfN(60, Gen.choose(1, 40))

  property("equi-depth histogram partitions the multiset") = forAll(priceGen) { vs =>
    val orders = vs.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).atStartOfDay()), v * 100.0)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val rows = graft.operators.Relational.ordersPriceHistogram(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sumOk = rows.map(_._2).sum == vs.length
    val idsOk = rows.map(_._1).forall(b => b >= 1 && b <= 20) &&
      rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted
    val boundsOk = rows.forall(r => r._3 <= r._4) &&
      rows.sliding(2).forall { case Array(a, b) => a._4 < b._3; case _ => true }
    sumOk && idsOk && boundsOk
  }

  // random per-day order sets: the sort-sweep skyline must equal the
  // quadratic dominance filter (the oracle's NOT EXISTS form) exactly,
  // ties and within-count losers included
  private val skyOrdersGen: Gen[List[(Int, Int)]] = // (dayIdx, dollars)
    Gen.listOfN(40, Gen.zip(Gen.choose(0, 9), Gen.choose(1, 20)))

  property("pareto skyline == brute-force dominance filter") = forAll(skyOrdersGen) { os =>
    def ts(d: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(2024, 1, 1 + d).atStartOfDay())
    val orders = os.map { case (d, p) => (ts(d), p.toDouble) }
      .toDF("o_orderdate", "o_totalprice")
    val got = graft.operators.Approx.paretoDays(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val agg = os.groupBy(_._1).map { case (d, rows) =>
      (ts(d).getTime / 1000L, rows.size.toLong, rows.map(_._2.toLong).sum)
    }.toSeq
    val sky = agg.filter(a => !agg.exists(b =>
      b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3))).toSet
    got == sky
  }

  // random basket sets: link prediction must equal the literal
  // common-neighbor scan (cap wide open, k above any candidate count)
  private val lpBasketsGen: Gen[List[(Int, Int)]] = // (orderId, partId)
    Gen.listOfN(60, Gen.zip(Gen.choose(0, 14), Gen.choose(0, 11)))

  property("link prediction == brute-force common-neighbor scan") = forAll(lpBasketsGen) { bs =>
    val li = bs.map { case (o, p) => (o.toLong, p.toLong) }
      .toDF("l_orderkey", "l_partkey")
    val got = graft.operators.Graph.linkPrediction(li, k = 10000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val und = bs.distinct.map { case (o, p) => (o.toLong, p.toLong) }
      .groupBy(_._1).values.toSeq
      .flatMap(b => b.map(_._2).distinct.sorted.combinations(2).map(s => (s(0), s(1))))
      .groupBy(p => p).filter(_._2.size >= 2).keys.toSet
    val adj = (und.toSeq ++ und.toSeq.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val cn = adj.toSeq
      .filter { case (c, _) => deg(c) <= 64 }
      .flatMap { case (_, nbrs) => nbrs.toSeq.sorted.combinations(2).map(s => (s(0), s(1))) }
      .groupBy(p => p).view.mapValues(_.size.toLong).toMap
    val expect = cn.collect { case ((u, v), c) if !und.contains((u, v)) =>
      (u, v, c, c * 1000000L / (deg(u) + deg(v) - c)) }.toSet
    got == expect
  }

  // cross-correlation antisymmetry: swapping the two series mirrors the
  // lag axis exactly — cov(x, y, +k) == cov(y, x, -k) at identical n
  private val lagEvGen: Gen[List[(Int, Boolean)]] = // (dayIdx, isClick)
    Gen.listOfN(40, Gen.zip(Gen.choose(0, 6), Gen.oneOf(true, false)))

  property("lag correlation mirrors under series swap") = forAll(lagEvGen) { evs =>
    def df(swap: Boolean) = evs.map { case (d, isClick) =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1 + d).atStartOfDay()),
        if (isClick ^ swap) "click" else "purchase")
    }.toDF("ts", "event_type")
    def table(swap: Boolean) =
      graft.operators.Relational.eventLagCorrelation(df(swap)).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val fwd = table(swap = false)
    val rev = table(swap = true)
    fwd.keySet.map(-_) == rev.keySet &&
      fwd.forall { case (k, v) => rev(-k) == v }
  }

  // arbitrary uids (unicode, empties, quotes) and full-range second
  // timestamps — the Avro wire serde must round-trip EVERY row the
  // filter admits, through the vendored native expressions, and agree
  // byte-for-byte with the independent avro-1.12 mapPartitions writer
  private val avroEventGen: Gen[List[(String, Long)]] =
    Gen.listOfN(20, Gen.zip(
      Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr,
        Gen.listOfN(5, Gen.choose('Ā', '퟿')).map(_.mkString)),
      Gen.choose(0L, 4102444800L))) // 1970..2100 in seconds

  property("avro wire serde round-trips arbitrary events; native == independent writer bytes") =
    forAll(avroEventGen) { evs =>
      import graft.streaming.StreamingUniqueUsers
      val df = evs.toDF("uid", "sec")
        .selectExpr("uid", "CAST(sec AS TIMESTAMP) AS ts")
      val back = StreamingUniqueUsers.parseAvroEvents(
        StreamingUniqueUsers.toAvroRecords(df))
        .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000)).sorted.toSeq
      def hex(df2: org.apache.spark.sql.DataFrame): Seq[String] = df2
        .collect().map(_.getAs[Array[Byte]](0).map("%02x".format(_)).mkString).sorted.toSeq
      val nativeBytes = hex(StreamingUniqueUsers.toAvroRecords(df))
      val mpBytes = hex(StreamingUniqueUsers.toAvroRecordsViaMapPartitions(df))
      back == evs.map { case (u, s) => (u, s) }.sorted && nativeBytes == mpBytes
    }

  // corpora with heavy shared-text structure (identical-text survivors
  // are the subtle removal case) and arbitrary doomed subsets — small
  // ones ride the touched-bucket partial path, big ones the full swap;
  // the property must hold on BOTH
  private val textPool: Seq[String] = Seq(
    "the quick brown fox", "lorem ipsum dolor sit", "pack my box with jugs",
    "sphinx of black quartz", "the quick brown fox", "data quality at scale",
    "spark shuffles the keys", "bucketed tables move files", "a b c d e",
    "tiny", "repeated repeated repeated", "final text of the pool")
  private val takedownGen: Gen[(List[(Long, String)], Set[Long])] = for {
    n <- Gen.choose(8, 30)
    texts <- Gen.listOfN(n, Gen.oneOf(textPool))
    k <- Gen.choose(0, n)
    doomed <- Gen.pick(k, 0 until n)
  } yield ((0L until n.toLong).map(i => (i, texts(i.toInt))).toList,
    doomed.map(_.toLong).toSet)

  property("takedown rewrite (partial OR full path) == fresh-save of the remaining corpus") =
    forAll(takedownGen) { case (docs, doomed) =>
      import org.apache.spark.sql.functions.{col, lit}
      val df = docs.toDF("doc_id", "text").withColumn("source", lit("p"))
      val remaining = df.filter(!col("doc_id").isin(doomed.toSeq: _*))
      Dedup.dropDedupIndex(spark, "prop_tb")
      Dedup.dropDedupIndex(spark, "prop_tb_ref")
      Dedup.saveDedupIndex(df, "prop_tb")
      Dedup.applyCorpusDiff(spark, "prop_tb",
        df.filter(col("doc_id").isin(doomed.toSeq: _*)), df.filter(lit(false)))
      Dedup.saveDedupIndex(remaining, "prop_tb_ref")
      def fpRows(t: String): Set[(String, Long)] = spark.table(t)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      def ids(t: String): Set[Long] = spark.table(t)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      val ok =
        fpRows("prop_tb_fp") == fpRows("prop_tb_ref_fp") &&
          ids("prop_tb_bands") == ids("prop_tb_ref_bands") &&
          ids("prop_tb_shingles") == ids("prop_tb_ref_shingles") &&
          spark.table("prop_tb_bands").count() == spark.table("prop_tb_ref_bands").count()
      Dedup.dropDedupIndex(spark, "prop_tb")
      Dedup.dropDedupIndex(spark, "prop_tb_ref")
      ok
    }

  // ---- native-expression references (driver-side, no Spark jobs) ----

  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** normText-shaped strings: single-space-separated lowercase words
    * (possibly empty) — the precondition the gram expressions document. */
  private val normedGen: Gen[String] =
    Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
      .map(_.mkString(" "))

  property("Md5Nibble5.compute == hex-parse reference on arbitrary strings") =
    forAll(Gen.asciiPrintableStr) { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      graft.plans.Md5Nibble5.compute(UTF8String.fromString(s)) ==
        java.lang.Long.parseLong(hex.take(5), 16)
    }

  property("PositionalGramHashes.compute == slice-join-md5 reference") =
    forAll(normedGen, Gen.choose(1, 5)) { (t, n) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val toks = t.split(" ", -1) // split-at-every-space (spaces+1 tokens)
      val expect =
        if (toks.length < n) Seq.empty
        else (0 to toks.length - n).map { i =>
          md.digest(toks.slice(i, i + n).mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
        }
      val got = graft.plans.PositionalGramHashes
        .compute(UTF8String.fromString(t), n)
      (0 until got.numElements()).map(got.getUTF8String(_).toString) == expect
    }

  property("sorted-hash merge count == exact set-intersection of xxhash64 values") =
    forAll(Gen.listOf(Gen.identifier), Gen.listOf(Gen.identifier)) { (a, b) =>
      def arr(xs: List[String]) = new GenericArrayData(
        xs.map(x => UTF8String.fromString(x): Any).toArray)
      def hset(xs: List[String]): Set[Long] = xs.map { x =>
        val u = UTF8String.fromString(x)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes,
            graft.plans.ShingleHashes.Seed)
      }.toSet
      val ha = graft.plans.ShingleHashes.sortedHashes(arr(a))
      val hb = graft.plans.ShingleHashes.sortedHashes(arr(b))
      graft.plans.ShingleHashes.intersectCount(ha, hb) ==
        (hset(a) intersect hset(b)).size.toLong
    }
}
