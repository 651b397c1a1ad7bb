package graft

import org.apache.spark.sql.DataFrame

/** Lineage pinning with a cluster-deployment switch.
  *
  * Iterative operators (PageRank/LPA supersteps, star-contraction rounds)
  * and materialize-once sweep sites flatten lineage by eagerly
  * checkpointing — every such site in this codebase routes through
  * [[Pin.pin]]. The LOCAL default is `localCheckpoint()`: eager, no disk
  * round-trip, blocks in executor storage — exactly right for `local[n]`
  * and single-node bench runs.
  *
  * CLUSTER CAVEAT (the reason this switch exists): `localCheckpoint` is
  * NOT fault-tolerant. Its blocks live only on the executors that
  * computed them and the truncated lineage cannot be recomputed, so on a
  * real multi-executor cluster ONE lost executor fails the whole job
  * mid-iteration. For cluster deployment set
  * `SPARK_GRAFT_RELIABLE_CHECKPOINT=<dir>` (or the
  * `spark.graft.reliableCheckpointDir` system property, which takes
  * precedence — the in-JVM override tests use): every pin site then uses
  * reliable `checkpoint()` against that directory (HDFS / object store),
  * which survives executor loss at the cost of a write+read round-trip
  * per pin. One flag flips the whole engine; no call site changes.
  *
  * Two behaviors shared by both modes that callers rely on:
  *   - pinning is EAGER — the upstream pipeline executes at pin time, so
  *     query BUILDERS that pin (graph pair sets, sessionize, audit
  *     scoring, the exact-top-k recall baseline) do real work at
  *     DataFrame-construction time, and plan inspection of the returned
  *     frame shows a scan of the materialized relation, not the lineage;
  *   - the pinned blocks/files live until the wrapping DataFrame is
  *     GC'd (local mode) or the context stops — a builder invoked
  *     repeatedly in one session leaks one pinned copy per call unless
  *     the caller scopes it (fine for bench-style single invocations;
  *     loop bodies unpersist or let each round's pin supersede the last).
  */
object Pin {
  private[graft] def reliableDir: Option[String] =
    sys.props.get("spark.graft.reliableCheckpointDir")
      .orElse(sys.env.get("SPARK_GRAFT_RELIABLE_CHECKPOINT"))

  /** Eagerly materialize `df` and flatten its lineage — localCheckpoint
    * by default, reliable checkpoint under the deployment flag. */
  def pin(df: DataFrame): DataFrame = reliableDir match {
    case Some(dir) =>
      val sc = df.sparkSession.sparkContext
      // set once per context, first pin wins; re-pointing the checkpoint
      // dir mid-JVM is not a supported configuration
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
      df.checkpoint()
    case None => df.localCheckpoint()
  }

  implicit final class PinnedOps(private val df: DataFrame) extends AnyVal {
    /** Chainable form of [[Pin.pin]]. */
    def pinned(): DataFrame = pin(df)
  }
}
