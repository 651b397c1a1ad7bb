package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The deterministic synthetic doc-stream fixture shared by
  * [[StreamBench]] (one pipeline, the round-over-round comparable
  * recording) and [[StreamShardBench]] (N concurrent pipelines over
  * disjoint input shards — the scale-out axis STREAMSCALE_r16's verdict
  * prescribes). Extracted verbatim from StreamBench so both benches
  * drive the exact same doc mix and gate-threshold discipline; the only
  * generalization is `seedOffset`, which shifts every text-generating
  * seed so distinct shards draw DISJOINT documents while preserving the
  * per-shard class mix (and therefore the per-shard deterministic
  * admitted count) exactly. `seedOffset = 0` reproduces StreamBench's
  * historical corpus byte-for-byte.
  *
  * Doc mix by `g % 25` (g = the shard-local running id): junk (curation
  * kill), gibberish (rarity-gate kill), seed-corpus dup (persisted-index
  * kill), cross-batch dup (online-maintained-index kill; batch-0 roots
  * fall through to unique good text), common-word token salad (LM-gate
  * kill), remainder unique well-formed text that must clear all gates. */
object StreamFixture {
  val stops: Array[String] = Array("the", "a", "an", "and", "of", "to", "in", "is", "it")
  val vocabN = 2000
  /** seed-corpus text seeds, disjoint from stream ids */
  val SeedBase = 5000000

  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** good text must clear ALL THREE online gates: every 4th token is an
    * English stopword (25% density ≫ the 5% langid bar); each 3-token
    * content block starts at a hard-power-skewed (r^6) vocabulary index
    * and then walks SEQUENTIALLY (w_k, w_k+1, w_k+2) — the Zipf head
    * still dominates the unigram marginal (rarity gate passes) AND the
    * in-block transitions are deterministic successors, so the
    * reference bigram LM attests them densely (LM gate passes). */
  def goodText(seed: Int): String = {
    val r = new scala.util.Random(seed)
    var w = 0
    (0 until 60).map { j =>
      if (j % 4 == 0) stops(r.nextInt(stops.length))
      else {
        if (j % 4 == 1) w = math.min(vocabN - 3, (math.pow(r.nextDouble(), 6) * vocabN).toInt)
        else w += 1
        s"w$w"
      }
    }.mkString(" ")
  }

  /** common-word token salad the LM gate (and only it) must kill: the
    * same skewed marginal and stopword density as good text, but every
    * token drawn independently — transitions are noise */
  def saladText(seed: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until 60).map { j =>
      if (j % 4 == 0) stops(r.nextInt(stops.length))
      else s"w${math.min(vocabN - 1, (math.pow(r.nextDouble(), 6) * vocabN).toInt)}"
    }.mkString(" ")
  }

  /** gibberish that the rarity gate (not curation) must kill: enough
    * stopwords to pass langid, every other token unseen in the reference */
  def gibberish(g: Int): String =
    (0 until 60).map(j => if (j % 12 == 0) stops(j % stops.length) else s"xq${g}z$j")
      .mkString(" ")

  /** One stream doc: (local id, text, source). `seedOffset` shifts every
    * text seed (shard disjointness); the returned id stays LOCAL — the
    * caller adds its shard's id offset (must be ≡ 0 mod 25 so the class
    * encoding `doc_id % 25` survives the shift). */
  def streamDoc(g: Int, batchRows: Int, seedOffset: Int = 0): (Long, String, String) = {
    val text = (g % 25) match {
      case 0 => "!!! ??? *** %%% ((( ))) @@@"                              // curation kill
      case 1 => gibberish(seedOffset + g)                                  // rarity kill
      case 2 => goodText(seedOffset + SeedBase + (g % 1000))               // seed-corpus dup
      // cross-batch dup of the batch-0 ROOT at the same position (the
      // root fell through to unique good text, so every later case-3
      // doc is a true duplicate of an ADMITTED doc — by the time batch
      // b >= 2 arrives the root's watermark state has evicted, so the
      // kill exercises the online-maintained index, not stream state)
      case 3 if g >= batchRows => goodText(seedOffset + (g % batchRows))
      case 4 => saladText(seedOffset + g)                                  // LM-gate kill
      case _ => goodText(seedOffset + g)
    }
    (g.toLong, text, s"s${g % 4}")
  }

  /** Writes the stream's input: one JSONL file per micro-batch under
    * `dir`, ids offset by `idOffset` (≡ 0 mod 25), text seeds by
    * `seedOffset`. */
  def writeBatchFiles(dir: String, nBatches: Int, batchRows: Int,
                      seedOffset: Int = 0, idOffset: Long = 0L): Unit = {
    require(idOffset % 25 == 0, s"idOffset $idOffset would scramble the class encoding doc_id % 25")
    val base = 1700000000L
    for (b <- 0 until nBatches) {
      val lines = (0 until batchRows).map { i =>
        val g = b * batchRows + i
        val (id, text, src) = streamDoc(g, batchRows, seedOffset)
        s"""{"doc_id": ${idOffset + id}, "text": "${jsonEscape(text)}", "source": "$src", "ts_sec": ${base + g / 10}}"""
      }
      java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, f"f$b%03d.jsonl"),
        lines.mkString("", "\n", "\n"))
    }
  }

  val streamSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")

  /** The mix's exact answer: classes 0,1,2,4 die entirely (4 of every
    * 25), class 3 dies except its batch-0 roots (which fall through to
    * unique good text). */
  def expectedAdmitted(rowsTotal: Long, batchRows: Int): Long =
    rowsTotal - 4 * (rowsTotal / 25) - (rowsTotal / 25 - batchRows / 25)

  /** min/max of a gate's score per class — both gate thresholds are
    * midpoints of the MEASURED class separation (deterministic: fixed
    * seeds), so a mix regression shows up as a non-positive separation,
    * never a silently mistuned constant. Returns ((kill min, kill max),
    * (pass min, pass max)). */
  def classMinMax(scores: DataFrame, valueCol: String,
                  kill: Column, noise: Column): ((Long, Long), (Long, Long)) = {
    val m = scores
      .withColumn("k", when(kill, "kill").when(noise, "noise").otherwise("pass"))
      .groupBy(col("k"))
      .agg(min(valueCol).as("mn"), max(valueCol).as("mx"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (m("kill"), m("pass"))
  }
}
