package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.FileFormats

/** Source/sink surface: schema-enforced JSONL/CSV readers, corrupt-record
  * accounting, partitioned-write pruning, and the events round-trip. */
class FileFormatsSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("events JSONL round-trip preserves every row and the timestamp exactly") {
    val events = Tables.events(spark, Sf0001)
    val dir = tmp("graft-jsonl")
    FileFormats.writeEventsJsonl(events, dir)
    val back = FileFormats.readEventsJsonl(spark, dir)
    assert(back.schema.fieldNames.sorted === events.schema.fieldNames.sorted)
    val cols = events.columns.sorted.map(col).toSeq
    assert(back.select(cols: _*).except(events.select(cols: _*)).count() === 0L)
    assert(events.select(cols: _*).except(back.select(cols: _*)).count() === 0L)
  }

  test("ORC round-trip preserves rows exactly and pushes filters to the scan") {
    val docs = Tables.documents(spark, Sf0001)
    val dir = tmp("graft-orc")
    FileFormats.writeOrc(docs, dir)
    val back = FileFormats.readOrc(spark, dir, docs.schema)
    assert(back.count() === docs.count())
    assert(back.except(docs).count() === 0L && docs.except(back).count() === 0L)
    // same pushdown contract as parquet: the predicate must reach the scan
    val plan = back.filter(col("doc_id") === 7L).select("doc_id", "source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]"),
      s"ORC scan did not receive the pushed filter:\n$plan")
  }

  test("Avro round-trip preserves rows and timestamps exactly; reader schema prunes columns") {
    val events = Tables.events(spark, Sf0001)
    val dir = tmp("graft-avro")
    FileFormats.writeAvro(events, dir)
    val back = FileFormats.readAvro(spark, dir, events.schema)
    assert(back.count() === events.count())
    // timestamp-micros logical type must survive the round-trip bit-exactly
    val cols = events.columns.sorted.map(col).toSeq
    assert(back.select(cols: _*).except(events.select(cols: _*)).count() === 0L)
    assert(events.select(cols: _*).except(back.select(cols: _*)).count() === 0L)
    // declared-schema projection: a 2-column reader schema reads clean
    val narrow = FileFormats.readAvro(spark, dir,
      org.apache.spark.sql.types.StructType(events.schema.filter(f =>
        f.name == "event_id" || f.name == "user_id")))
    assert(narrow.columns.toSet === Set("event_id", "user_id"))
    assert(narrow.count() === events.count())
  }

  test("binaryFile ingestion: payload files yield the same phash signatures as table-carried bytes") {
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, Sf0001).limit(8)
      .select(col("doc_id"), col("text")).collect()
    val dir = Files.createTempDirectory("graft-media")
    docs.foreach { r =>
      Files.write(dir.resolve(s"${r.getLong(0)}.bin"), r.getString(1).getBytes("UTF-8"))
    }
    val ingested = Multimodal.ingestBinaryDir(spark, dir.toString)
    // one row per file, byte counts exact
    val sizes = ingested.select("doc_id", "n_bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes === docs.map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length.toLong).toMap)
    // the file-ingested payloads hash identically to the table-carried path
    val viaFiles = Multimodal.phashSignaturesOf(ingested).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaTable = Multimodal.phashSignatures(
      Tables.documents(spark, Sf0001).limit(8)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaFiles === viaTable)
  }

  test("XML round-trip preserves the documents table exactly (escaping included)") {
    val docs = Tables.documents(spark, Sf0001).limit(200)
    val dir = tmp("graft-xml")
    FileFormats.writeXml(docs, dir, rowTag = "doc")
    val back = FileFormats.readXml(spark, dir, docs.schema, rowTag = "doc")
    assert(back.count() === docs.count())
    assert(back.except(docs).count() === 0L && docs.except(back).count() === 0L)
  }

  test("Avro wire serde: to_avro -> from_avro round-trips event records exactly, same rows as JSON") {
    import graft.streaming.StreamingUniqueUsers
    val ev = Tables.events(spark, Sf0001).limit(500)
      .select(col("user_id").cast("string").as("uid"),
        org.apache.spark.sql.functions.date_trunc("second", col("ts")).as("ts"))
    val viaAvro = StreamingUniqueUsers.parseAvroEvents(StreamingUniqueUsers.toAvroRecords(ev))
    val viaJson = StreamingUniqueUsers.parseEvents(
      ev.select(to_json(struct(col("uid"), unix_timestamp(col("ts")).as("ts"))).as("value")))
    assert(viaAvro.except(ev).count() === 0L && ev.except(viaAvro).count() === 0L)
    assert(viaAvro.except(viaJson).count() === 0L && viaJson.except(viaAvro).count() === 0L)
    // corrupt-record policy: an undecodable payload drops, never crashes
    val corrupt = Seq(Array[Byte](1, 2, 3), Array[Byte]()).toDF("value")
    assert(StreamingUniqueUsers.parseAvroEvents(corrupt).count() === 0L)
  }

  test("Avro native/mapPartitions serde interop: each implementation decodes the other's bytes") {
    import graft.streaming.StreamingUniqueUsers
    val ev = Tables.events(spark, Sf0001).limit(300)
      .select(col("user_id").cast("string").as("uid"),
        org.apache.spark.sql.functions.date_trunc("second", col("ts")).as("ts"))
    // native to_avro bytes read by the independent avro-1.12 reader…
    val nativeBytes = StreamingUniqueUsers.toAvroRecords(ev)
    val crossA = StreamingUniqueUsers.parseAvroEventsViaMapPartitions(nativeBytes)
    assert(crossA.except(ev).count() === 0L && ev.except(crossA).count() === 0L)
    // …and mapPartitions bytes read by the native from_avro expression
    val mpBytes = StreamingUniqueUsers.toAvroRecordsViaMapPartitions(ev)
    val crossB = StreamingUniqueUsers.parseAvroEvents(mpBytes)
    assert(crossB.except(ev).count() === 0L && ev.except(crossB).count() === 0L)
    // the wire form is identical byte-for-byte, not merely inter-readable
    assert(nativeBytes.except(mpBytes).count() === 0L &&
      mpBytes.except(nativeBytes).count() === 0L)
    // the native serde is an EXPRESSION: encode+decode stays inside one
    // WholeStageCodegen span (the mapPartitions stand-in broke the span —
    // the reason the native path is the primary)
    val plan = StreamingUniqueUsers.parseAvroEvents(nativeBytes)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions"),
      s"native avro serde plan unexpectedly contains MapPartitions:\n$plan")
  }

  test("native from_avro/to_avro work through the SQL function surface too") {
    import graft.streaming.StreamingUniqueUsers
    val schemaSql = StreamingUniqueUsers.EventAvroSchemaJson.replace("\n", " ")
    Seq(("u1", 100L), ("u2", 200L)).toDF("uid", "ts")
      .createOrReplaceTempView("avro_sql_in")
    val out = spark.sql(
      s"""SELECT from_avro(to_avro(struct(uid, ts), '$schemaSql'), '$schemaSql', map()).uid AS uid
         |FROM avro_sql_in""".stripMargin).collect().map(_.getString(0)).sorted
    assert(out.toSeq === Seq("u1", "u2"))
  }

  test("Avro schema evolution: reader/writer mismatch via actualSchema (added + dropped fields)") {
    // production Avro pipelines live on reader != writer schema: the
    // public connector contract (SPARK-27506) is that jsonFormatSchema is
    // the READER's schema and the `actualSchema` option carries the
    // WRITER's — Avro resolution fills added-with-default fields and
    // drops removed ones during decode
    import org.apache.spark.sql.avro.functions.{from_avro, to_avro}
    val writerSchema =
      """{"type":"record","name":"ev","fields":[
        |{"name":"uid","type":"string"},{"name":"ts","type":"long"}]}""".stripMargin
    val bytes = Seq(("u1", 100L), ("u2", 200L)).toDF("uid", "ts")
      .select(col("uid"),
        to_avro(struct(col("uid"), col("ts")), writerSchema).as("value"))
    // v2 reader ADDS a nullable field with a default: v1 bytes decode to
    // the new shape with the default filled in
    val readerAdded =
      """{"type":"record","name":"ev","fields":[
        |{"name":"uid","type":"string"},{"name":"ts","type":"long"},
        |{"name":"region","type":["null","string"],"default":null}]}""".stripMargin
    val opts = new java.util.HashMap[String, String]()
    opts.put("actualSchema", writerSchema)
    val added = bytes.select(from_avro(col("value"), readerAdded, opts).as("r"))
      .select(col("r.uid"), col("r.ts"), col("r.region"))
    val addedRows = added.collect().map(r => (r.getString(0), r.getLong(1), r.isNullAt(2))).sorted
    assert(addedRows.toSeq === Seq(("u1", 100L, true), ("u2", 200L, true)))
    // v2 reader DROPS a field: v1 bytes decode to the narrower shape
    val readerDropped =
      """{"type":"record","name":"ev","fields":[{"name":"uid","type":"string"}]}""".stripMargin
    val dropped = bytes.select(from_avro(col("value"), readerDropped, opts).as("r"))
      .select(col("r.uid"))
    assert(dropped.collect().map(_.getString(0)).sorted.toSeq === Seq("u1", "u2"))
    // and absent the option the original single-schema behavior holds
    val same = bytes.select(from_avro(col("value"), writerSchema,
      new java.util.HashMap[String, String]()).as("r")).select(col("r.uid"), col("r.ts"))
    assert(same.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ===
      Seq(("u1", 100L), ("u2", 200L)))
  }

  test("Avro parse modes: FAILFAST throws on undecodable bytes, PERMISSIVE emits the null row") {
    import org.apache.spark.sql.avro.functions.from_avro
    val schema =
      """{"type":"record","name":"ev","fields":[
        |{"name":"uid","type":"string"},{"name":"ts","type":"long"}]}""".stripMargin
    val garbage = Seq(Array[Byte](9, 9, 9)).toDF("value")
    val ff = new java.util.HashMap[String, String](); ff.put("mode", "FAILFAST")
    val thrown = intercept[Throwable] {
      garbage.select(from_avro(col("value"), schema, ff).as("r")).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(String.valueOf(_)).toSeq
    assert(chain(thrown).exists(_.contains("Malformed Avro")),
      s"FAILFAST must surface the malformed-record error, got: ${chain(thrown).mkString(" | ")}")
    val pm = new java.util.HashMap[String, String](); pm.put("mode", "PERMISSIVE")
    val rows = garbage.select(from_avro(col("value"), schema, pm).as("r"))
      .select(col("r.uid"), col("r.ts")).collect()
    assert(rows.length === 1 && rows(0).isNullAt(0) && rows(0).isNullAt(1),
      "PERMISSIVE must emit an all-null row for an undecodable payload")
  }

  test("JSONL reader routes malformed lines to the corrupt column, never drops them") {
    val dir = tmp("graft-corrupt")
    Seq("""{"a": 1, "b": "x"}""", """{"a": oops""", """{"a": 3, "b": "y"}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    // Spark disallows queries that reference ONLY the corrupt column over
    // raw files (SPARK-21610) — materialize full rows before inspecting it
    val got = FileFormats.readJsonl(spark, dir, StructType.fromDDL("a BIGINT, b STRING"))
      .collect()
    assert(got.length === 3)
    assert(got.count(!_.isNullAt(2)) === 1)
    assert(got.filter(_.isNullAt(2)).map(_.getLong(0)).sum === 4L)
  }

  test("CSV reader with declared schema reads typed columns") {
    val dir = tmp("graft-csv")
    Seq("id,name", "1,alpha", "2,beta").toDF("value")
      .coalesce(1).write.mode("overwrite").text(dir)
    val got = FileFormats.readCsv(spark, dir, StructType.fromDDL("id BIGINT, name STRING"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "alpha"), (2L, "beta")))
  }

  test("training-shard export round-trips and its tree matches the packing stats") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    FileFormats.writeTrainingShards(docs, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count()) // every doc in exactly one shard
    // the written tree's per-shard token totals equal the stats query's
    val fromTree = back
      .groupBy(col("source"), col("block_id"), col("shard_id"))
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long")).as("t"))
      .collect()
      // partition-dir columns read back via partition inference as int
      .map(r => (r.getString(0), r.getAs[Number](1).longValue(),
        r.getAs[Number](2).longValue()) -> r.getLong(3)).toMap
    val fromStats = TextAnalysis.packShards(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(4)).toMap
    assert(fromTree === fromStats)
    // and the layout is the partition tree a trainer prunes by
    val shardDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
    assert(shardDirs.nonEmpty && shardDirs.forall(_.getName.startsWith("source=")))
  }

  test("consolidateShardTrees: per-batch trees re-pack to exactly the fresh-export layout") {
    val docs = Tables.documents(spark, Sf0001)
    val streamed = java.nio.file.Files.createTempDirectory("shards_batches").toString
    // a streamed export: two micro-batches, each its own batch_id tree
    // (each re-starts packing at offset 0 — the small-shard pileup)
    FileFormats.writeTrainingShards(
      docs.filter("doc_id % 2 = 0"), s"$streamed/batch_id=0")
    FileFormats.writeTrainingShards(
      docs.filter("doc_id % 2 = 1"), s"$streamed/batch_id=1")
    val fin = java.nio.file.Files.createTempDirectory("shards_final").toString
    FileFormats.consolidateShardTrees(spark, streamed, fin)
    // the consolidated tree IS the from-scratch export: same rows, same
    // deterministic (source, block, shard) assignment per doc
    val direct = java.nio.file.Files.createTempDirectory("shards_direct").toString
    FileFormats.writeTrainingShards(docs, direct)
    def layout(dir: String) = spark.read.parquet(dir)
      .select(col("doc_id"), col("source"),
        col("block_id").cast("long"), col("shard_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(layout(fin) === layout(direct))
    // idempotent: consolidating the consolidated tree is a no-op layout
    val fin2 = java.nio.file.Files.createTempDirectory("shards_final2").toString
    FileFormats.consolidateShardTrees(spark, fin, fin2)
    assert(layout(fin2) === layout(direct))
  }

  test("partitioned write prunes to one partition directory on a source filter") {
    val docs = Tables.documents(spark, Sf0001)
    val dir = tmp("graft-part")
    FileFormats.writePartitioned(docs, dir, "source")
    val back = spark.read.parquet(dir).filter(col("source") === "src1")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(source"), plan.take(500))
    assert(back.count() === docs.filter(col("source") === "src1").count())
  }

  test("Z-ordered write: per-file bounding boxes beat a single-column sort on the off-sort dimension") {
    import graft.operators.Layout
    val orders = Tables.orders(spark, Sf0001)
    val day = (unix_timestamp(col("o_orderdate")) / lit(86400L)).cast("long")
    val nFiles = 8

    def perFileBoxes(dir: String): Seq[(Long, Long)] = {
      val files = new java.io.File(dir).listFiles
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString).toSeq
      assert(files.size > 1, s"expected multiple files in $dir")
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max(col("o_custkey")) - min(col("o_custkey")),
            max((unix_timestamp(col("o_orderdate")) / lit(86400L)).cast("long")) -
              min((unix_timestamp(col("o_orderdate")) / lit(86400L)).cast("long")))
          .head()
        (r.getLong(0), r.getLong(1))
      }
    }

    val zDir = tmp("graft-zorder")
    Layout.writeZOrdered(orders, col("o_custkey"), day, zDir, nFiles)
    val linDir = tmp("graft-linear")
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(linDir)

    // layout must not lose rows
    assert(spark.read.parquet(zDir).count() === orders.count())

    val zBoxes = perFileBoxes(zDir)
    val linBoxes = perFileBoxes(linDir)
    val Row(gCk: Long, gDay: Long) = orders
      .agg(max(col("o_custkey")) - min(col("o_custkey")), max(day) - min(day)).head()
    // single-column sort: every file still spans ~the whole day domain —
    // a date predicate can prune NOTHING
    assert(linBoxes.forall(_._2 > gDay / 2), s"linear layout unexpectedly clustered days: $linBoxes")
    // Z-order: file boxes are sub-rectangles on BOTH dimensions — that's
    // what makes predicates on either column skip files. Range
    // boundaries are sample-based (not bit-aligned), so a boundary file
    // may straddle a top-level split; assert the claim statistically:
    // at least 3/4 of the files are compact on both dims.
    val compact = zBoxes.count { case (ckSpan, daySpan) =>
      ckSpan <= gCk * 3 / 4 && daySpan <= gDay * 3 / 4
    }
    assert(compact * 4 >= zBoxes.size * 3,
      s"only $compact/${zBoxes.size} z boxes compact on both dims: $zBoxes vs global ($gCk x $gDay)")
    // and a date-point predicate overlaps at most half the z files
    val midDay = orders.agg((min(day) + (max(day) - min(day)) / 2).cast("long")).head().getLong(0)
    val zFilesHit = {
      val files = new java.io.File(zDir).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
      files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min((unix_timestamp(col("o_orderdate")) / lit(86400L)).cast("long")),
            max((unix_timestamp(col("o_orderdate")) / lit(86400L)).cast("long"))).head()
        r.getLong(0) <= midDay && midDay <= r.getLong(1)
      }
    }
    assert(zFilesHit * 2 <= zBoxes.size,
      s"a mid-domain day hits $zFilesHit of ${zBoxes.size} z files — no pruning win")
  }

  test("writeBucketedSwap: rewrite keeps location + bucket spec, 1x IO, old readers healed") {
    import spark.implicits._
    val t = "ffs_swap_t"
    FileFormats.dropTableAndLocation(spark, t)
    FileFormats.writeBucketed(
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("k", "v"), t, "k", 4)
    val locBefore = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(t)).location
    // self-read rewrite (the compaction shape): drop odd keys
    FileFormats.writeBucketedSwap(
      spark.table(t).filter(col("k") % 2 === 0), t, "k", 4)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(t))
    assert(meta.location === locBefore, "swap must land at the table's own location")
    assert(meta.bucketSpec.map(_.numBuckets) === Some(4), "bucket spec must survive the swap")
    assert(spark.table(t).count() === 50)
    // no leftover staged/old tables
    assert(!spark.catalog.tableExists(s"${t}__staged"))
    assert(!spark.catalog.tableExists(s"${t}__old"))
  }

  test("healTornSwap restores a table stranded between the swap's two renames") {
    import spark.implicits._
    val t = "ffs_torn_t"
    FileFormats.dropTableAndLocation(spark, t)
    FileFormats.dropTableAndLocation(spark, s"${t}__old")
    FileFormats.writeBucketed(
      (0 until 40).map(i => (i.toLong, s"v$i")).toDF("k", "v"), t, "k", 4)
    // simulate the crash window: first rename done, second never ran
    spark.sql(s"ALTER TABLE `$t` RENAME TO `${t}__old`")
    assert(!spark.catalog.tableExists(t))
    FileFormats.healTornSwap(spark, t)
    assert(spark.catalog.tableExists(t) && !spark.catalog.tableExists(s"${t}__old"))
    assert(spark.table(t).count() === 40)
    FileFormats.healTornSwap(spark, t) // healthy-table no-op
    assert(spark.table(t).count() === 40)
  }
}
