package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact-parity re-expression of the reference's aggregation mechanism:
  * `aggregate(HashSet::new, (k, v, set) -> { set.add(v); return set; })`
  * with `HashSet::size` finalization
  * (/root/reference/src/main/java/com/isidora/kafka/UniqueUsersCounter.java:80-88).
  *
  * As a typed Spark `Aggregator[IN, BUF, OUT]` the same state machine gets
  * what the reference lacked: Tungsten-encoded buffers instead of
  * java-serialized blobs (the reference's 1 MiB RecordTooLargeException
  * wall, README.md:27-31), and map-side partial aggregation with set-union
  * `merge` — the reference's Kafka Streams runtime has no partial-agg
  * concept at all.
  *
  * Used for parity demonstration; the scale paths remain `countDistinct`
  * (exact) and `approx_count_distinct` (sketch).
  */
object DistinctSetAggregator extends Aggregator[String, Set[String], Long] {
  override def zero: Set[String] = Set.empty
  override def reduce(b: Set[String], a: String): Set[String] =
    if (a == null) b else b + a
  override def merge(b1: Set[String], b2: Set[String]): Set[String] = b1 union b2
  override def finish(r: Set[String]): Long = r.size.toLong
  override def bufferEncoder: Encoder[Set[String]] = Encoders.kryo[Set[String]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Untyped-DataFrame form (the reference takes string uids). */
  val asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction = udaf(this)

  def distinctCount(c: Column): Column = asUdaf(c)
}
