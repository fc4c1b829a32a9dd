package graft

import java.nio.file.Files

import graft.streaming.NearDupStream

/** Sustained-load soak for the streaming near-dup lake: 50 micro-batches
  * with periodic [[NearDupStream.maintain]], asserting the properties
  * that only show up under accumulation — band-index file counts stay
  * BOUNDED (compaction actually wins the race against per-batch
  * appends), the `_batches`/`_idbloom` ledgers actually prune, the bloom
  * capacity rebuild fires mid-soak without disturbing admission, and the
  * final lake holds exactly the unique documents with zero duplicates.
  * Texts share NO tokens across ids, so banding can never produce a
  * false candidate pair; every batch re-sends one already-admitted doc
  * to keep the id guard (bloom hit → exact confirm) on the hot path. */
class NearDupSoakSpec extends SparkSpec {
  import spark.implicits._

  // ten fully id-disjoint tokens per doc: zero shared shingles anywhere
  private def text(i: Int): String =
    (0 until 10).map(j => s"w${i}x$j").mkString(" ")

  test("50-batch soak: bounded files, pruned ledgers, mid-soak bloom rebuild") {
    val lake = Files.createTempDirectory("neardupsoak").toString
    def parquetFiles(p: String): Int = {
      val d = new java.io.File(p)
      if (!d.exists()) 0 else d.listFiles().count(_.getName.endsWith(".parquet"))
    }
    def ledgerFiles(p: String): Int =
      new java.io.File(p).listFiles().count(!_.getName.startsWith("."))

    var maxBandFiles = 0
    for (b <- 0 until 50) {
      // two new docs per batch + one redelivery of doc 0 (id-guard path)
      val rows = Seq((2L * b, text(2 * b)), (2L * b + 1, text(2 * b + 1))) ++
        (if (b > 0) Seq((0L, text(0))) else Nil)
      NearDupStream.processBatch(rows.toDF("doc_id", "text"), lake, batchId = b,
        bloomItems = 32, bloomFpp = 0.01)
      if (b % 10 == 9)
        NearDupStream.maintain(spark, lake,
          targetRowsPerFile = 1000000L, maxFiles = 4, keepBatches = 8)
      maxBandFiles = math.max(maxBandFiles, parquetFiles(s"$lake/bands"))
    }

    // file growth stays bounded by the maintain cadence: ≤ maxFiles at
    // each compaction point + the ≤10 appends since (each append lands
    // up to one file per non-empty partition — 4 at local[4]) — never
    // the unbounded accumulation an uncompacted lake would carry
    assert(maxBandFiles <= 4 + 10 * 4, s"band index grew to $maxBandFiles files")
    NearDupStream.maintain(spark, lake,
      targetRowsPerFile = 1000000L, maxFiles = 4, keepBatches = 8)
    assert(parquetFiles(s"$lake/bands") == 1, "final compaction must squash the band index")
    assert(parquetFiles(s"$lake/docs") == 1)
    assert(parquetFiles(s"$lake/shingles") == 1)

    // ledgers pruned to the retention window — ids in (maxDone-keep,
    // maxDone] = keep+1 ids, two marker files each (plus _writer/_sizing)
    assert(ledgerFiles(s"$lake/_batches") <= 2 * (8 + 1) + 1,
      s"marker ledger kept ${ledgerFiles(s"$lake/_batches")} files")
    assert(ledgerFiles(s"$lake/_idbloom") <= (8 + 1) + 1,
      s"bloom ledger kept ${ledgerFiles(s"$lake/_idbloom")} files")

    // the tiny 32-item bloom MUST have been rebuilt mid-soak (100 docs
    // admitted); growth quadruples from 32 past the final count
    val sizing = scala.io.Source.fromFile(s"$lake/_idbloom/_sizing").mkString
      .trim.split("\\s+")
    assert(sizing(0).toLong >= 128L, s"bloom never grew: ${sizing.mkString(" ")}")
    assert(sizing(2).toLong == 100L, s"backfilled count: ${sizing.mkString(" ")}")

    // admission stayed exact through rebuilds + compactions: every
    // unique id exactly once, the per-batch redelivery never re-admitted
    val docs = spark.read.parquet(s"$lake/docs")
    assert(docs.count() == 100L)
    val ids = docs.select("doc_id").as[Long].collect().toSet
    assert(ids == (0L until 100L).toSet)
    assert(spark.read.parquet(s"$lake/bands").count() == 100L * 8)
    assert(spark.read.parquet(s"$lake/shingles").count() == 100L)
  }

  test("forced shard split: guard goes range-sharded past shardMaxItems, admission exact") {
    val lake = Files.createTempDirectory("neardupshard").toString
    def batch(ids: Seq[Long]) = ids.map(i => (i, text(i.toInt))).toDF("doc_id", "text")
    def run(b: org.apache.spark.sql.DataFrame, id: Long): Unit =
      NearDupStream.processBatch(b, lake, batchId = id,
        bloomItems = 8, bloomFpp = 0.01, shardMaxItems = 16)
    def sizing: Array[String] =
      scala.io.Source.fromFile(s"$lake/_idbloom/_sizing").mkString.trim.split("\\s+")
    def shardDirs: Set[String] = Option(new java.io.File(s"$lake/_idbloom").listFiles())
      .toSeq.flatten.filter(f => f.isDirectory && f.getName.startsWith("s"))
      .map(_.getName).toSet
    def admitted: Set[Long] =
      spark.read.parquet(s"$lake/docs").select("doc_id").as[Long].collect().toSet

    // b0 stays a flat monolith (count 2, capacity 8)
    run(batch(Seq(0L, 1L)), 0)
    assert(sizing(3).toLong == 0L && shardDirs.isEmpty, "no split yet")

    // b1 crosses half capacity; the 4× rebuild target (32) exceeds
    // shardMaxItems (16) → SPLIT into power-of-two id-range shards
    run(batch(Seq(2L, 3L)) unionAll batch(Seq(0L)), 1)
    assert(sizing(0).toLong == 16L, s"per-shard items: ${sizing.mkString(" ")}")
    assert(sizing(2).toLong == 4L, s"count: ${sizing.mkString(" ")}")
    val width1 = sizing(3).toLong
    assert(width1 > 0 && java.lang.Long.bitCount(width1) == 1,
      s"split must set a power-of-two width: ${sizing.mkString(" ")}")
    assert(shardDirs.nonEmpty, "shard generation dirs must exist after the split")

    // post-split admission across existing + brand-new shards; the
    // redelivered id 0 still drops via its shard's bloom → exact confirm
    run(batch(Seq(4L, 5L)) unionAll batch(Seq(0L)), 2)
    assert(admitted == (0L to 5L).toSet)

    // a large batch re-triggers the capacity rule while ALREADY sharded →
    // re-split (width recomputed over the grown span; count rebuilt)
    run(batch(6L to 35L), 3)
    assert(sizing(2).toLong == 36L, s"count after re-split: ${sizing.mkString(" ")}")
    assert(java.lang.Long.bitCount(sizing(3).toLong) == 1)
    assert(admitted == (0L to 35L).toSet)

    // id collision against a mid-range shard resolves first-write-wins
    run(Seq((7L, "completely new text for an already admitted id here today"))
      .toDF("doc_id", "text") unionAll batch(Seq(36L)), 4)
    assert(admitted == (0L to 36L).toSet, "id 7 must not re-admit")

    // maintain on the sharded layout: prunes old generations but KEEPS
    // each shard's newest (an untouched shard's only bloom), backfills
    // the exact count, preserves the width
    val widthBefore = sizing(3).toLong
    NearDupStream.maintain(spark, lake, targetRowsPerFile = 1000000L,
      maxFiles = 2, keepBatches = 2)
    assert(sizing(2).toLong == 37L, s"backfill: ${sizing.mkString(" ")}")
    assert(sizing(3).toLong == widthBefore, "width must survive the backfill")
    shardDirs.foreach { d =>
      val gens = new java.io.File(s"$lake/_idbloom/$d").listFiles()
        .count(f => !f.getName.startsWith("."))
      assert(gens >= 1, s"shard $d lost its newest generation to pruning")
    }
    run(batch(Seq(37L)) unionAll batch(Seq(0L)), 5)
    assert(admitted == (0L to 37L).toSet, "post-maintain admission diverged")

    // fast-path I/O on the SHARDED lake: an all-new batch into a
    // brand-new shard reads no docs relation at all (the unreadable-file
    // trick from NearDupStreamSpec)
    val poison = new java.io.FileOutputStream(s"$lake/docs/part-poison.parquet")
    poison.write("not parquet".getBytes); poison.close()
    run(batch(Seq(1000L, 1001L)), 6)
    assert(spark.read.parquet(s"$lake/shingles").count() == 40L)
    assert(new java.io.File(s"$lake/docs/part-poison.parquet").delete())
    assert(admitted == (0L to 37L).toSet ++ Set(1000L, 1001L))
    assert(spark.read.parquet(s"$lake/bands").count() == 40L * 8)
  }
}
