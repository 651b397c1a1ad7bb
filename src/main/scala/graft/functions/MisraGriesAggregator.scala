package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitter summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Tracks at most `cap` (token, count) pairs. Inserting an untracked
  * token into a full summary decrements every tracked count by one
  * (vacating zeros) — the classic generalized-majority step. Merging two
  * summaries sums counts and, if the union exceeds `cap`, subtracts the
  * (cap+1)-th largest count from everything and keeps the positives; the
  * PODS'12 result is that this preserves the Misra-Gries error bound, so
  * the combined undercount stays ≤ N/(cap+1) no matter how Spark
  * partitions the data or orders the partial-aggregate merges.
  *
  * Containment guarantee (what the exact-verify composition relies on):
  * every token with true frequency > N/(cap+1) survives in the summary.
  * The surviving SET beyond those is partitioning-dependent — callers
  * must treat it as a candidate superset and re-count exactly, never as
  * an answer. `finish` therefore returns just the candidate keys.
  *
  * This is the bounded-memory half of heavy-hitters at 100 TB: the
  * map-side state is O(cap) per task regardless of vocabulary size,
  * where an exact groupBy shuffles the full vocabulary. The buffer is a
  * kryo-encoded mutable map (same pattern as [[DistinctSetAggregator]]);
  * reduce/merge mutate in place, which Spark's typed-Aggregator contract
  * permits.
  */
class MisraGriesAggregator(cap: Int)
  extends Aggregator[String, mutable.HashMap[String, Long], Array[String]] {

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(b: mutable.HashMap[String, Long], tok: String): mutable.HashMap[String, Long] = {
    if (tok != null) {
      b.get(tok) match {
        case Some(c) => b(tok) = c + 1L
        case None if b.size < cap => b(tok) = 1L
        case None =>
          // decrement epoch: every tracked count drops by one, zeros vacate
          val dead = mutable.ArrayBuffer.empty[String]
          for ((k, v) <- b) if (v == 1L) dead += k else b(k) = v - 1L
          dead.foreach(b.remove)
      }
    }
    b
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    for ((k, v) <- b2) b1(k) = b1.getOrElse(k, 0L) + v
    if (b1.size > cap) {
      val cut = b1.values.toArray.sorted(Ordering[Long].reverse).apply(cap)
      val keys = b1.keys.toArray
      for (k <- keys) {
        val v = b1(k) - cut
        if (v > 0L) b1(k) = v else b1.remove(k)
      }
    }
    b1
  }

  override def finish(b: mutable.HashMap[String, Long]): Array[String] = b.keys.toArray.sorted

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Array[String]] = ExpressionEncoder[Array[String]]()
}
