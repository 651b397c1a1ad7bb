package graft

import graft.tools.StreamFixture

/** Pins the [[graft.tools.StreamFixture]] contract both stream benches
  * build on: the class mix's structure, the cross-batch-dup root
  * identity (the property the online-index kill depends on), the
  * seedOffset shard-disjointness [[graft.tools.StreamShardBench]] needs
  * for its per-shard determinism asserts, and the exact-admitted
  * formula. seedOffset = 0 must keep reproducing StreamBench's
  * historical corpus, so these are regression pins for the extraction,
  * not just documentation. */
class StreamFixtureSpec extends SparkSpec {

  private val batchRows = 100 // divisible by 25, 2 batches in play below

  test("class mix by g % 25: junk, gibberish, seed-dup, cross-batch dup, salad, good") {
    val (_, junk, _) = StreamFixture.streamDoc(0, batchRows)
    assert(junk.startsWith("!!!"), "class 0 is the curation-kill punctuation doc")
    val (_, gib, _) = StreamFixture.streamDoc(1, batchRows)
    assert(gib.contains("xq1z"), "class 1 is reference-unseen gibberish")
    val (_, seedDup, _) = StreamFixture.streamDoc(2, batchRows)
    assert(seedDup == StreamFixture.goodText(StreamFixture.SeedBase + 2),
      "class 2 duplicates the persisted seed corpus")
    val (_, salad, _) = StreamFixture.streamDoc(4, batchRows)
    assert(salad == StreamFixture.saladText(4), "class 4 is LM-kill token salad")
    // batch-0 class-3 ROOT falls through to unique good text...
    val root = StreamFixture.streamDoc(3, batchRows)._2
    assert(root == StreamFixture.goodText(3))
    // ...and every later class-3 doc is an exact duplicate of that root
    // (the kill that exercises the ONLINE-maintained index, not state)
    val dup = StreamFixture.streamDoc(batchRows + 3, batchRows)._2
    assert(dup == root, "cross-batch dup must reproduce its batch-0 root byte-for-byte")
  }

  test("seedOffset makes shards text-disjoint while preserving the per-shard mix") {
    val stride = 20000000
    val shard0 = (0 until 200).map(g => StreamFixture.streamDoc(g, batchRows, 0))
    val shard1 = (0 until 200).map(g => StreamFixture.streamDoc(g, batchRows, stride))
    // same mix: class structure identical position by position
    shard0.zip(shard1).zipWithIndex.foreach { case (((_, t0, s0), (_, t1, s1)), g) =>
      assert(s0 == s1, s"source label must not depend on seedOffset (g=$g)")
      assert((t0.startsWith("!!!")) == (t1.startsWith("!!!")), s"junk class moved (g=$g)")
    }
    // disjoint texts: no non-junk doc of shard 0 appears in shard 1
    val texts1 = shard1.map(_._2).toSet
    val overlap = shard0.filterNot(_._2.startsWith("!!!")).count(d => texts1.contains(d._2))
    assert(overlap == 0, "shards with distinct seedOffsets must share zero non-junk docs")
  }

  test("expectedAdmitted equals the brute-force class census") {
    for (nBatches <- Seq(2, 8)) {
      val rowsTotal = (nBatches * batchRows).toLong
      // classes 0,1,2,4 all die; class 3 dies except batch-0 roots
      val brute = (0 until nBatches * batchRows).count { g =>
        (g % 25) match {
          case 0 | 1 | 2 | 4 => false
          case 3             => g < batchRows // batch-0 roots are admitted good text
          case _             => true
        }
      }
      assert(StreamFixture.expectedAdmitted(rowsTotal, batchRows) == brute,
        s"formula vs census at nBatches=$nBatches")
    }
  }

  test("writeBatchFiles rejects an idOffset that would scramble the class encoding") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sfix").toString
    intercept[IllegalArgumentException] {
      StreamFixture.writeBatchFiles(dir, 1, 25, idOffset = 7L)
    }
    // a conforming offset writes ids shifted and classes intact
    StreamFixture.writeBatchFiles(dir, 1, 25, seedOffset = 0, idOffset = 50L)
    val docs = spark.read.schema(StreamFixture.streamSchema)
      .json(dir).collect()
    assert(docs.length == 25)
    assert(docs.map(_.getLong(0)).min == 50L)
  }
}
