package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File source/sink surface beyond the driver parquet: schema-enforced
  * JSONL and CSV readers, and the two writer layouts that matter at
  * 100 TB — partitioned parquet (partition pruning) and sorted bucketed
  * tables (shuffle-free co-located joins).
  *
  * Reader stance: ALWAYS an explicit schema. `inferSchema`/sampling reads
  * the data twice and can silently widen types between runs; a pipeline
  * ingesting 100 TB declares its schema once and treats mismatches as
  * corrupt records (PERMISSIVE + corrupt-record column, counted, never
  * dropped silently).
  */
object FileFormats {

  /** JSON-lines reader with declared schema and a corrupt-record escape
    * hatch: malformed lines land in `_corrupt` instead of vanishing. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** CSV reader with declared schema — header validated, no inference. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("enforceSchema", "false") // fail fast if the header disagrees
      .csv(path)

  /** Write partitioned parquet: one directory per `partitionCol` value.
    * The layout that makes `WHERE source = 'src7'` a partition-pruned
    * read of 1/N of the data instead of a full scan. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** Write a sorted bucketed table: `buckets` files per bucket key hash,
    * rows sorted by `key` within each bucket. The shuffle is paid ONCE at
    * write time; every later equi-join on `key` between tables bucketed
    * the same way (same key, same bucket count) sort-merge joins with
    * ZERO exchanges — the layout for repeated fact ⋈ fact joins at 100 TB
    * where neither side broadcasts (BucketingSpec asserts the
    * exchange-free plan). Registered as a catalog table because bucket
    * metadata lives in the catalog, not in the parquet footers. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    // repartition to the bucket count ON the bucket key first: without
    // it every input task writes a sliver into every bucket (tasks ×
    // buckets files — ~500 files for an 8-bucket index written at 32
    // shuffle partitions), and both the write commit and every later
    // scan pay per-file open cost. Hash-repartitioning on the bucket key
    // puts exactly one bucket's rows in each task → one file per bucket,
    // the compacted shape, at the cost of one shuffle the fresh save can
    // afford (production bucket counts are sized to the cluster width,
    // so this is also the right write parallelism at scale — the same
    // discipline appendToSearchIndex documents).
    df.repartition(buckets, col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Drop a table AND its managed location, even when the current
    * session's catalog no longer knows the table (a crashed prior JVM's
    * leftovers under a shared warehouse dir — `saveAsTable` refuses to
    * reuse such a location). Best-effort by design. */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    try spark.sql(s"DROP TABLE IF EXISTS `$table`")
    catch { case _: Throwable => () }
    try {
      // the leftover-location path must account for the session's
      // CURRENT database: a managed table outside `default` lives under
      // <warehouse>/<db>.db/<table>, and deleting <warehouse>/<table>
      // would both miss the orphan and risk an unrelated default-db dir
      val db = spark.sessionState.catalog.getCurrentDatabase
        .toLowerCase(java.util.Locale.ROOT)
      val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
      val parent = if (db == "default") wh else new org.apache.hadoop.fs.Path(wh, s"$db.db")
      val loc = new org.apache.hadoop.fs.Path(parent, table.toLowerCase(java.util.Locale.ROOT))
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    } catch { case _: Throwable => () }
  }

  /** Rewrite a bucketed table's content by STAGED SWAP: write the new
    * content once (to `<table>__staged`), then swap it into place with
    * catalog renames — a managed-table rename MOVES the directory, so
    * the swap is metadata + one filesystem move instead of the second
    * full write the copy-back form paid (rewrites cost 1× IO, not 2×).
    * On object stores without atomic rename, back these tables with a
    * rename-capable store or a table format; the compaction/removal IO
    * argument holds regardless.
    *
    * Torn-swap recovery is built in at entry: a crash between the two
    * renames leaves `<table>` missing and `<table>__old` present — the
    * next rewrite (the documented "run it again" recovery of every
    * index lifecycle verb) restores the old table first, re-deriving
    * from exactly the pre-swap state. Readers racing the swap see the
    * same window the Overwrite copy-back form had; index rewrites here
    * are single-writer by contract (ledgered batches / lifecycle
    * verbs). */
  /** Restore `table` from `<table>__old` if a prior [[writeBucketedSwap]]
    * crashed between its two renames. Rewrite verbs call this BEFORE
    * reading the table they are about to rewrite — the torn state has
    * the table name missing, so a caller that builds its rewrite input
    * from `spark.table(table)` would otherwise fail ahead of the
    * in-swap heal. Idempotent no-op when the table is healthy. */
  // Per-table-name monitors serializing swap+heal WITHIN this process:
  // between writeBucketedSwap's two renames the table is absent from the
  // catalog, and a concurrently running verb's entry-time healTornSwap
  // (e.g. a query racing a streaming cadence compaction in one JVM)
  // would read that window as a torn swap and rename `__old` back into
  // place, failing the writer's staged→table rename and discarding the
  // completed staged rewrite. Cross-verb concurrency on ONE table is
  // excluded by taking the table's monitor around both the full swap and
  // the heal; disjoint tables keep distinct monitors, so Par fan-out
  // across index families is unaffected. (The monitor is reentrant, so
  // the swap's own in-line heal call is fine.)
  private val tableLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(table: String): Object =
    tableLocks.computeIfAbsent(table, _ => new Object)

  // ---- touched-bucket (partial) staged swap machinery ----

  /** Marker file a partial swap writes into the staged location BEFORE
    * its first rename, holding the affected bucket ids. Its presence is
    * how [[healTornSwap]] tells a partial swap's move window (resume
    * FORWARD: staged content is complete) from the full swap's rename
    * window (roll BACK to `__old`). Underscore-prefixed, so parquet
    * readers ignore it if observed mid-protocol. */
  private[graft] val PartialMarker = "_GRAFT_PARTIAL"

  private[graft] def tableLocation(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table)).location)

  /** Bucket id from a Spark bucketed-table file name
    * (`part-00000-<uuid>_00003.c000.snappy.parquet` → 3). */
  private[graft] def bucketIdOfFile(fileName: String): Option[Int] =
    "_([0-9]{5})\\.c000".r.findFirstMatchIn(fileName).map(_.group(1).toInt)

  /** The bucket id Spark's bucketed writer assigns a key — bucketing uses
    * `HashPartitioning.partitionIdExpression` = pmod(murmur3(key), n),
    * and `functions.hash` IS that murmur3 (seed 42). Spec-pinned against
    * actual file placement in BucketingSpec. */
  def bucketIdCol(key: org.apache.spark.sql.Column, buckets: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.pmod(org.apache.spark.sql.functions.hash(key),
      org.apache.spark.sql.functions.lit(buckets))

  /** Read ONLY the named buckets' files of a bucketed table — the scan
    * half of a touched-bucket rewrite: IO proportional to the affected
    * buckets, not the table. (Bucket metadata is lost on a raw file
    * read; callers rewrite/shuffle the rows anyway.) */
  private[graft] def readBuckets(spark: SparkSession, table: String,
                                 affected: Set[Int]): DataFrame = {
    val loc = tableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(loc).toSeq
      .filter(_.isFile)
      .filter(st => bucketIdOfFile(st.getPath.getName).exists(affected.contains))
      .map(_.getPath.toString)
    if (files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        spark.table(table).schema)
    else spark.read.schema(spark.table(table).schema).parquet(files: _*)
  }

  private def moveUntouched(fs: org.apache.hadoop.fs.FileSystem,
                            from: org.apache.hadoop.fs.Path,
                            to: org.apache.hadoop.fs.Path,
                            affected: Set[Int]): Unit =
    fs.listStatus(from).foreach { st =>
      if (st.isFile) bucketIdOfFile(st.getPath.getName) match {
        case Some(b) if !affected.contains(b) =>
          if (!fs.rename(st.getPath, new org.apache.hadoop.fs.Path(to, st.getPath.getName)))
            sys.error(s"partial swap: could not move ${st.getPath} to $to")
        case _ => ()
      }
    }

  private def readMarker(fs: org.apache.hadoop.fs.FileSystem,
                         marker: org.apache.hadoop.fs.Path): Set[Int] = {
    val in = fs.open(marker)
    try scala.io.Source.fromInputStream(in).mkString.split(",").filter(_.nonEmpty)
      .map(_.trim.toInt).toSet
    finally in.close()
  }

  def healTornSwap(spark: SparkSession, table: String): Unit = lockFor(table).synchronized {
    val staged = s"${table}__staged"
    val old = s"${table}__old"
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(old)) {
      // a PARTIAL swap's move window (staged table complete + marker
      // present) resumes FORWARD: finish moving the untouched buckets'
      // files and swap the staged table in — rolling back would discard
      // files already moved out of __old. Every other torn state rolls
      // back to __old (the full swap's documented recovery).
      val resumed = spark.catalog.tableExists(staged) && {
        val stagedLoc = tableLocation(spark, staged)
        val fs = stagedLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val marker = new org.apache.hadoop.fs.Path(stagedLoc, PartialMarker)
        fs.exists(marker) && {
          moveUntouched(fs, tableLocation(spark, old), stagedLoc, readMarker(fs, marker))
          spark.sql(s"ALTER TABLE `$staged` RENAME TO `$table`")
          fs.delete(new org.apache.hadoop.fs.Path(tableLocation(spark, table), PartialMarker), false)
          spark.sql(s"DROP TABLE `$old`")
          refreshAfterSwap(spark, table)
          true
        }
      }
      if (!resumed) spark.sql(s"ALTER TABLE `$old` RENAME TO `$table`")
    } else if (spark.catalog.tableExists(table) && spark.catalog.tableExists(old)) {
      // crash AFTER a swap-in but before cleanup: the live table is
      // correct; __old holds stale bucket files (and the marker may
      // still sit in the table location). Best-effort debris removal.
      try {
        val loc = tableLocation(spark, table)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(loc, PartialMarker), false)
      } catch { case _: Throwable => () }
      try spark.sql(s"DROP TABLE `$old`") catch { case _: Throwable => () }
      ()
    }
  }

  private def refreshAfterSwap(spark: SparkSession, table: String): Unit = {
    val sessions = (Seq(spark) ++
      org.apache.spark.sql.SparkSession.getDefaultSession.toSeq ++
      org.apache.spark.sql.SparkSession.getActiveSession.toSeq).distinct
    for (s <- sessions)
      try s.catalog.refreshTable(table)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    spark.catalog.refreshByPath(tableLocation(spark, table).toString)
  }

  /** TOUCHED-BUCKET staged swap: rewrite only `affected` buckets' content
    * (`df` must hold exactly the new rows of those buckets — every row's
    * [[bucketIdCol]] in `affected` — and nothing else); every other
    * bucket's files MOVE from the old directory into the staged one
    * (per-file rename — no read, no decode, no shuffle, no write), so a
    * takedown touching k of N buckets costs IO ∝ k/N of the table
    * instead of a full rewrite. At 100 TB with per-bucket files this is
    * the difference between a bounded maintenance op and re-writing the
    * corpus for every takedown.
    *
    * Crash contract (the marker protocol): the affected-bucket content
    * is staged COMPLETELY and the marker (affected ids) written before
    * the first rename, so the move window is resumable — a crash
    * anywhere between the renames heals FORWARD at the next verb entry
    * ([[healTornSwap]] finishes the move and swaps in); a crash before
    * the first rename leaves the live table untouched (staged debris is
    * dropped at the next swap's entry). File moves are idempotent
    * (a moved file is simply absent from `__old` on resume). */
  def writeBucketedSwapPartial(df: DataFrame, table: String, key: String, buckets: Int,
                               affected: Set[Int]): Unit = lockFor(table).synchronized {
    val spark = df.sparkSession
    require(affected.nonEmpty && affected.forall(b => b >= 0 && b < buckets),
      s"affected bucket ids must be within [0, $buckets): $affected")
    val staged = s"${table}__staged"
    val old = s"${table}__old"
    healTornSwap(spark, table)
    dropTableAndLocation(spark, staged)
    dropTableAndLocation(spark, old)
    writeBucketed(df, staged, key, buckets)
    val stagedLoc = tableLocation(spark, staged)
    val fs = stagedLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(stagedLoc, PartialMarker), true)
    try out.write(affected.toSeq.sorted.mkString(",").getBytes("UTF-8")) finally out.close()
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
    moveUntouched(fs, tableLocation(spark, old), tableLocation(spark, staged), affected)
    spark.sql(s"ALTER TABLE `$staged` RENAME TO `$table`")
    fs.delete(new org.apache.hadoop.fs.Path(tableLocation(spark, table), PartialMarker), false)
    spark.sql(s"DROP TABLE `$old`")
    refreshAfterSwap(spark, table)
  }

  def writeBucketedSwap(df: DataFrame, table: String, key: String, buckets: Int): Unit = lockFor(table).synchronized {
    val spark = df.sparkSession
    val staged = s"${table}__staged"
    val old = s"${table}__old"
    healTornSwap(spark, table) // a torn prior swap (also guarded at verb entry)
    dropTableAndLocation(spark, staged) // crashed-run leftovers
    dropTableAndLocation(spark, old)
    writeBucketed(df, staged, key, buckets)
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$staged` RENAME TO `$table`")
    spark.sql(s"DROP TABLE `$old`")
    // refreshTable alone is NOT enough after a rename swap: persisted
    // plans READING this table are cache-keyed on the old relation
    // instance and survive it, still pinning the pre-swap file listing
    // (an Overwrite write invalidated them by PATH as a side effect —
    // the rename path must do so explicitly or replay FileNotFound).
    // The table-name relation cache is PER SESSION, so refresh every
    // session this process exposes (a foreachBatch clone compacting an
    // index must not leave the parent session scanning moved files);
    // the path refresh hits the SHARED CacheManager once.
    refreshAfterSwap(spark, table)
  }

  /** End-to-end training-data EXPORT: assign every doc its token-budget
    * shard ([[graft.operators.TextAnalysis.shardAssign]] — one bounded
    * window, text carried through so no second corpus join) and write
    * parquet partitioned by (source, block, shard). The resulting
    * directory tree IS the training manifest: each shard directory holds
    * ≈ budget tokens of contiguous docs, trainers consume shards as
    * units, and partition pruning serves any (source, block, shard)
    * subset without scanning the rest. */
  /** `writerTasks`: optional pre-write repartition ON THE PARTITION
    * COLUMNS for SMALL exports (a streaming micro-batch writes thousands
    * of rows across dozens of (source, block, shard) directories). Each
    * directory's rows land in exactly one of `writerTasks` tasks, so the
    * tree gets ONE file per directory written by parallel workers —
    * measured 3.3× faster than a single coalesced writer at micro-batch
    * size, same file count. Unset = keep the packing shuffle's width
    * (the large-batch default; at 100 TB the export IS the parallel
    * write, and the packing window already co-locates each (source,
    * block) group on one task). */
  def writeTrainingShards(documents: DataFrame, path: String,
                          budget: Long = graft.operators.TextAnalysis.PackBudgetTokens,
                          writerTasks: Option[Int] = None): Unit = {
    val assigned = graft.operators.TextAnalysis.shardAssign(documents, budget)
    writerTasks.fold(assigned)(n =>
      assigned.repartition(n, col("source"), col("block_id"), col("shard_id")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("source", "block_id", "shard_id")
      .parquet(path)
  }

  /** Consolidate a streaming export's per-batch shard trees
    * (`<dir>/batch_id=N/source=…/block_id=…/shard_id=…`) into the
    * canonical single tree [[writeTrainingShards]] would have written
    * over the union — the shard-layer member of the compaction family
    * (dedup/BM25/IVF indexes each have one). A long-running pipeline
    * accumulates one subtree per micro-batch; trainers want ONE
    * manifest tree, and at 100 TB the per-batch trees are also a
    * small-file problem (every batch re-starts shard packing at
    * offset 0, so per-batch shards run well under budget). Re-packing
    * from the union restores the exact fresh-export layout: shard ids
    * are deterministic in (source, block, doc_id) order, so
    * consolidation is idempotent and its output is byte-comparable to
    * a from-scratch export (spec-pinned). Reads ride partition
    * discovery — no listing collected to the driver. */
  def consolidateShardTrees(spark: SparkSession, streamOutDir: String, finalDir: String,
                            budget: Long = graft.operators.TextAnalysis.PackBudgetTokens,
                            writerTasks: Option[Int] = None): Unit =
    writeTrainingShards(
      spark.read.parquet(streamOutDir).select("doc_id", "text", "source"),
      finalDir, budget, writerTasks)

  /** ORC writer — the OTHER columnar warehouse format Spark ships
    * natively (no extra jars): same predicate-pushdown / column-pruning
    * contract as parquet, preferred by Hive-lineage warehouses. Exposed
    * so a user migrating an ORC lake onto this engine keeps their layout;
    * zlib is ORC's widely-supported default codec. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "zlib").orc(path)

  /** ORC reader with declared schema — same no-inference stance as the
    * JSONL/CSV readers (ORC carries its own schema; declaring it makes a
    * layout drift a loud AnalysisException at read time, not a silent
    * type widening downstream). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Avro sink — the row-oriented interchange format of the Kafka
    * ecosystem the reference lives in (a Kafka wire record is
    * conventionally Avro + schema registry; the file form is the batch
    * archive of the same records). This distribution bundles the full
    * Avro connector classes inside spark-sql but omits the `avro` alias
    * from DataSourceRegister, so the format is addressed by its
    * fully-qualified class name — same connector, explicit spelling. */
  private val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).format(AvroFormat).save(path)

  /** Avro reader with declared schema — the same no-inference stance as
    * the JSONL/CSV/ORC readers: Avro files carry a writer schema, and
    * declaring the reader schema turns layout drift into a loud error at
    * read time instead of a silent widening downstream. Timestamps
    * round-trip as Avro timestamp-micros logical types. */
  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).format(AvroFormat).load(path)

  /** XML sink — Spark 4 ships the XML connector in core (the spark-xml
    * lineage); one element per row under `rowTag`. The interchange
    * format of legacy enterprise feeds — the corpus-ingestion surface
    * should read it natively rather than through a pre-conversion. */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode(SaveMode.Overwrite).option("rowTag", rowTag).format("xml").save(path)

  /** XML reader with declared schema — same no-inference stance as every
    * other reader here. */
  def readXml(spark: SparkSession, path: String, schema: StructType,
              rowTag: String = "row"): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag).format("xml").load(path)

  /** Round-trip helpers for the events table (the reference's native
    * record stream): JSONL out and back with identical rows. Timestamps
    * travel as epoch micros (a long) — ISO strings lose sub-second
    * precision and timezone stability across engines. */
  def writeEventsJsonl(events: DataFrame, path: String): Unit =
    events
      .withColumn("ts_us", unix_micros(col("ts")))
      .drop("ts")
      .write.mode(SaveMode.Overwrite).json(path)

  def readEventsJsonl(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType.fromDDL(
      "event_id BIGINT, ts_us BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
    readJsonl(spark, path, schema)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .drop("ts_us", "_corrupt")
  }
}
