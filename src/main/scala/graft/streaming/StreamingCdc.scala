package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC snapshot maintenance — the ONLINE half of
  * [[graft.operators.Relational.cdcApplyChanges]]: a keyed snapshot
  * table maintained from a change STREAM (`op` ∈ {I, U, D}, monotone
  * `seq` within a key), one idempotent ledgered apply per micro-batch.
  * This is the "streaming upsert sink" a warehouse without a table
  * format still needs: Spark's file sinks are append-only, so keyed
  * upserts ride `foreachBatch` + the same staged-rename swap the
  * materialized-view lifecycle uses
  * ([[graft.operators.Relational.applyDailyRevenueDelta]]) — new
  * snapshot and extended batch ledger land in ONE directory rename, a
  * re-delivered batch id is a no-op, and a crash between the two
  * renames rolls back from `old` on the next load/apply.
  *
  * Contract mirrors the batch operator exactly: within a batch the
  * highest (seq, op) row wins per key and a winning D removes the key;
  * ACROSS batches later batches apply on top (the stream's batch order
  * IS the change order — Kafka-partition-style per-key ordering is the
  * producer's contract, as in any CDC pipeline).
  *
  * Scale shape: per batch, one rank-1 window over the CHANGELOG BATCH
  * (batch-sized, never the snapshot), one anti-join ∪ survivors against
  * the live snapshot, one staged write. The snapshot rewrite per batch
  * is the no-table-format price — at a deployment the same `foreachBatch`
  * body targets a MERGE-capable table format and the swap disappears;
  * everything upstream (latest-per-key, ledger idempotence) is
  * unchanged. Schemas: snapshot `(k, payload…)`, changes
  * `(k, op, seq, payload…)`.
  */
object StreamingCdc {

  private def hfs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Initialize the snapshot tree: `live/snap` + a ledger whose base
    * entry is -1 (below the micro-batch id space, same convention as
    * the search-index ledger). */
  def saveSnapshot(base: DataFrame, path: String): Unit = {
    val spark = base.sparkSession
    import spark.implicits._
    val fs = hfs(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    base.write.parquet(s"$path/live/snap")
    Seq(-1L).toDF("batch_id").write.parquet(s"$path/live/ledger")
  }

  /** Crash recovery for the two-rename swap — no-op when `live` exists
    * (same contract as `recoverDailyRevenue`). */
  def recoverSnapshot(spark: SparkSession, path: String): Unit = {
    val fs = hfs(spark, path)
    val live = new org.apache.hadoop.fs.Path(s"$path/live")
    val old = new org.apache.hadoop.fs.Path(s"$path/old")
    if (!fs.exists(live) && fs.exists(old)) {
      if (!fs.rename(old, live))
        sys.error(s"recoverSnapshot: could not restore $old to $live")
      spark.catalog.refreshByPath(live.toString)
    }
  }

  def loadSnapshot(spark: SparkSession, path: String): DataFrame = {
    recoverSnapshot(spark, path)
    spark.read.parquet(s"$path/live/snap")
  }

  private def ledgerMax(spark: SparkSession, dir: String): Long =
    spark.read.parquet(s"$dir/ledger").agg(max(col("batch_id"))).head.getLong(0)

  /** Versioned mode only: move a superseded `old` tree into
    * `versions/v=<its ledger max>` instead of deleting it. Idempotent —
    * an already-archived version id drops the duplicate — and called
    * both after a swap and at apply/load start, so the crash window
    * between swap and archive loses nothing. */
  private def archiveOld(spark: SparkSession, path: String): Unit = {
    val fs = hfs(spark, path)
    val old = new org.apache.hadoop.fs.Path(s"$path/old")
    if (!fs.exists(old)) return
    val v = ledgerMax(spark, s"$path/old")
    val dst = new org.apache.hadoop.fs.Path(s"$path/versions/v=$v")
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/versions"))
    if (fs.exists(dst)) fs.delete(old, true)
    else if (!fs.rename(old, dst)) sys.error(s"archiveOld: could not archive $old to $dst")
  }

  /** Apply one micro-batch of changes. Idempotent by `batchId`; within
    * the batch the highest (seq, op) wins per key; a winning D removes
    * the key from the snapshot. With `retainVersions` the superseded
    * snapshot is ARCHIVED under `versions/v=<batch>` instead of deleted
    * — the poor-man's time travel a table format gives for free, at the
    * disclosed cost of one full snapshot copy per applied batch
    * ([[expireSnapshots]] bounds it). */
  def applyCdcBatch(spark: SparkSession, path: String, batch: DataFrame,
                    batchId: Long, retainVersions: Boolean = false): Unit = {
    import spark.implicits._
    recoverSnapshot(spark, path)
    val applied = spark.read.parquet(s"$path/live/ledger")
      .filter(col("batch_id") === batchId).limit(1).count() > 0
    if (applied) return
    val wk = Window.partitionBy(col("k")).orderBy(col("seq").desc, col("op"))
    val latest = batch
      .withColumn("rn", row_number().over(wk)).filter(col("rn") === 1).drop("rn")
    val snap = spark.read.parquet(s"$path/live/snap")
    val merged = snap
      .join(latest.select(col("k")), Seq("k"), "left_anti")
      .unionByName(latest.filter(col("op") =!= "D").drop("op", "seq"))
    val fs = hfs(spark, path)
    val live = new org.apache.hadoop.fs.Path(s"$path/live")
    val stage = new org.apache.hadoop.fs.Path(s"$path/stage")
    val old = new org.apache.hadoop.fs.Path(s"$path/old")
    fs.delete(stage, true)
    merged.write.parquet(s"$path/stage/snap")
    spark.read.parquet(s"$path/live/ledger")
      .unionByName(Seq(batchId).toDF("batch_id"))
      .write.parquet(s"$path/stage/ledger")
    if (retainVersions) archiveOld(spark, path) else fs.delete(old, true)
    if (!fs.rename(live, old)) sys.error(s"applyCdcBatch: could not stage out $live")
    if (!fs.rename(stage, live)) {
      fs.rename(old, live)
      sys.error(s"applyCdcBatch: could not swap in $stage")
    }
    if (retainVersions) archiveOld(spark, path) else fs.delete(old, true)
    spark.catalog.refreshByPath(live.toString)
  }

  /** Time travel over a versioned snapshot tree: the state AS OF
    * `asOfBatch` — live when at-or-past the newest applied batch, else
    * the archived version with the largest id ≤ `asOfBatch` (version id
    * = the highest batch applied INTO that snapshot; the base snapshot
    * is v=-1). Errors when history below the ask was expired — silent
    * nearest-neighbor would misreport audits. */
  def loadSnapshotAsOf(spark: SparkSession, path: String, asOfBatch: Long): DataFrame = {
    recoverSnapshot(spark, path)
    archiveOld(spark, path)
    if (asOfBatch >= ledgerMax(spark, s"$path/live"))
      return spark.read.parquet(s"$path/live/snap")
    val fs = hfs(spark, path)
    val vdir = new org.apache.hadoop.fs.Path(s"$path/versions")
    val vs =
      if (fs.exists(vdir)) fs.listStatus(vdir).toSeq.map(_.getPath.getName)
        .collect { case s if s.startsWith("v=") => s.stripPrefix("v=").toLong }
      else Seq.empty[Long]
    val at = vs.filter(_ <= asOfBatch)
    require(at.nonEmpty,
      s"loadSnapshotAsOf: no snapshot at or before batch $asOfBatch (expired or never retained)")
    spark.read.parquet(s"$path/versions/v=${at.max}/snap")
  }

  /** Retention: keep the newest `keepLast` archived versions, delete the
    * rest (live is never touched). */
  def expireSnapshots(spark: SparkSession, path: String, keepLast: Int): Unit = {
    val fs = hfs(spark, path)
    val vdir = new org.apache.hadoop.fs.Path(s"$path/versions")
    if (!fs.exists(vdir)) return
    val vs = fs.listStatus(vdir).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.stripPrefix("v=").toLong }
      .sorted.reverse
    vs.drop(keepLast).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/versions/v=$v"), true)
    }
  }

  /** The streaming sink: every micro-batch of the change stream lands
    * via [[applyCdcBatch]] — checkpoint-restart re-delivers the batch,
    * the ledger makes it a no-op. `retainVersions` turns the sink into a
    * versioned (time-travelable) snapshot tree. */
  def sink(changes: DataFrame, path: String, checkpoint: String,
           retainVersions: Boolean = false): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyCdcBatch(b.sparkSession, path, b, id, retainVersions)
      }
      .start()
}
