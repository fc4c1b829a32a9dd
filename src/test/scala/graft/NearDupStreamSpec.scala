package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.streaming.NearDupStream

/** Streaming near-dup admission: in-batch greedy dedup, cross-batch
  * lake shadowing, batchId-keyed idempotent re-runs, the bounded-I/O
  * fast path, and the AvailableNow wrapper. */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  // ≥10-token texts so 3-token shingle sets are rich enough for a
  // verified Jaccard ≥ 0.5 between the near-dup pairs (deterministic:
  // md5-based MinHash, no RNG anywhere)
  private val base =
    "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val nearDup = // one tail word changed → most shingles shared
    "the quick brown fox jumps over the lazy dog near the quiet river bank tonight"
  private val distinct1 =
    "completely different subject matter entirely about compiler design and type systems theory"
  private val distinct2 =
    "yet another unrelated document discussing ocean currents weather patterns and marine life"

  test("in-batch greedy + cross-batch lake shadowing + idempotent re-run") {
    val lake = Files.createTempDirectory("neardup").toString
    def admitted: Set[Long] =
      spark.read.parquet(s"$lake/docs").select("doc_id").as[Long].collect().toSet

    // batch 0: 1 and 2 are near-dups (greedy keeps the smaller id), 3 distinct
    val b1 = Seq((1L, base), (2L, nearDup), (3L, distinct1)).toDF("doc_id", "text")
    NearDupStream.processBatch(b1, lake, batchId = 0)
    assert(admitted == Set(1L, 3L))

    // batch 1: 4 near-dups the admitted 1 → shadowed by the lake; 5 is new
    val b2 = Seq((4L, nearDup), (5L, distinct2)).toDF("doc_id", "text")
    NearDupStream.processBatch(b2, lake, batchId = 1)
    assert(admitted == Set(1L, 3L, 5L))

    // crash-retry: the same batchId replays as a no-op (done marker)
    NearDupStream.processBatch(b2, lake, batchId = 1)
    assert(admitted == Set(1L, 3L, 5L))
    // and the index relations stay doc-aligned (8 band rows, 1 shingle row per doc)
    assert(spark.read.parquet(s"$lake/bands").count() == 3 * 8)
    assert(spark.read.parquet(s"$lake/shingles").count() == 3)
    // a doc_id redelivered INSIDE one batch is admitted exactly once
    val novel = "volcanic islands form long archipelagos as tectonic plates drift over stationary hotspots"
    val b3 = Seq((6L, novel), (6L, novel)).toDF("doc_id", "text")
    NearDupStream.processBatch(b3, lake, batchId = 2)
    assert(admitted == Set(1L, 3L, 5L, 6L))
    assert(spark.read.parquet(s"$lake/docs").count() == 4, "no duplicate doc rows")

    // a doc_id redelivered in a LATER batch is dropped by the
    // first-write-wins id guard (bloom hit → exact confirm) — whatever
    // the text says: same-text redelivery and an upstream id collision
    // both resolve in favor of the first admission
    NearDupStream.processBatch(Seq((6L, novel)).toDF("doc_id", "text"), lake, batchId = 3)
    assert(admitted == Set(1L, 3L, 5L, 6L))
    assert(spark.read.parquet(s"$lake/docs").count() == 4, "redelivery must not re-admit")
    NearDupStream.processBatch(
      Seq((6L, distinct2 + " reworded beyond any near dup threshold entirely"))
        .toDF("doc_id", "text"), lake, batchId = 4)
    assert(spark.read.parquet(s"$lake/docs").count() == 4,
      "an id collision (same id, different text) must resolve first-write-wins")
    // and the index relations carry no orphan rows for the dropped text
    assert(spark.read.parquet(s"$lake/shingles").count() == 4)
  }

  test("short docs (< one 3-shingle) still dedup exactly via the singleton shingle") {
    val lake = Files.createTempDirectory("neardupshort").toString
    NearDupStream.processBatch(
      Seq((1L, "hello world"), (2L, "tiny doc")).toDF("doc_id", "text"), lake, batchId = 0)
    // identical short text under a DIFFERENT id: the shingles() clamp
    // gives sub-3-token docs a singleton whole-text shingle, so the copy
    // band-matches at Jaccard 1 and drops as a content dup; a redelivered
    // id drops via the id guard; a different short text is admitted
    NearDupStream.processBatch(
      Seq((1L, "hello world"), (3L, "other words"), (4L, "tiny doc"))
        .toDF("doc_id", "text"), lake, batchId = 1)
    val ids = spark.read.parquet(s"$lake/docs").select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L))
    assert(spark.read.parquet(s"$lake/docs").count() == 3, "no duplicate short-doc rows")
  }

  test("fast path reads NO lake docs column (bounded per-batch I/O)") {
    val lake = Files.createTempDirectory("neardupio").toString
    NearDupStream.processBatch(
      Seq((1L, base), (2L, distinct1)).toDF("doc_id", "text"), lake, batchId = 0)
    // plant an unreadable file in the docs relation: any attempt to READ
    // the docs relation now fails loudly, while appends (write-only)
    // succeed — so this batch passing proves the fast path's admission
    // and appends never scan the lake's docs relation
    val poison = new java.io.FileOutputStream(s"$lake/docs/part-poison.parquet")
    poison.write("not parquet".getBytes); poison.close()
    intercept[Exception] { spark.read.parquet(s"$lake/docs").count() }
    NearDupStream.processBatch(
      Seq((7L, distinct2)).toDF("doc_id", "text"), lake, batchId = 1)
    // bands/shingles (the designed hot path) grew by the admitted doc
    assert(spark.read.parquet(s"$lake/bands").count() == 3 * 8)
    assert(spark.read.parquet(s"$lake/shingles").count() == 3)
  }

  test("crash between appends converges on replay (index written, docs not)") {
    // build a complete reference lake, then reconstruct the worst-case
    // crash point: band + shingle indexes written, docs append never ran,
    // and the batch's `started` marker in place (what a real crash leaves
    // — the marker lands before any append)
    val ref = Files.createTempDirectory("neardupref").toString
    val b1 = Seq((1L, base), (2L, nearDup), (3L, distinct1)).toDF("doc_id", "text")
    NearDupStream.processBatch(b1, ref, batchId = 0)
    val crashed = Files.createTempDirectory("neardupcrash").toString
    spark.read.parquet(s"$ref/bands").write.parquet(s"$crashed/bands")
    spark.read.parquet(s"$ref/shingles").write.parquet(s"$crashed/shingles")
    assert(new java.io.File(s"$crashed/_batches").mkdirs())
    assert(new java.io.File(s"$crashed/_batches/0.started").createNewFile())
    // replay the same batch against the half-appended lake
    NearDupStream.processBatch(b1, crashed, batchId = 0)
    val docs = spark.read.parquet(s"$crashed/docs").select("doc_id").as[Long].collect().toSet
    assert(docs == Set(1L, 3L),
      s"replay must converge to the reference survivors, got $docs " +
        "(1 self-shadowed or 2 re-admitted would be the docs-first corruption)")
    assert(spark.read.parquet(s"$crashed/bands").count() == 2 * 8)
    assert(spark.read.parquet(s"$crashed/shingles").count() == 2)
    // the converged replay stamps its done marker: a second replay no-ops
    NearDupStream.processBatch(b1, crashed, batchId = 0)
    assert(spark.read.parquet(s"$crashed/docs").count() == 2)
  }

  test("maintain compacts the per-batch small files and admission still works") {
    val lake = Files.createTempDirectory("neardupmaint").toString
    // five single-doc batches of genuinely distinct texts (a shared
    // prefix would make them near-dups of each other — correctly dropped)
    val texts = Seq(
      "alpine meadows bloom with wildflowers every spring as snow melts from high peaks",
      "quantum computing relies on superposition and entanglement of fragile qubit states",
      "ancient roman aqueducts carried fresh water across valleys using gravity alone",
      "deep sea vents host chemosynthetic bacteria feeding entire ecosystems without sunlight",
      "jazz improvisation builds on chord changes while drummers push the rhythm forward")
    for (i <- 0 until 5)
      NearDupStream.processBatch(
        Seq((100L + i, texts(i))).toDF("doc_id", "text"), lake, batchId = i)
    def nFiles(p: String): Int =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles(s"$lake/bands") >= 5)
    NearDupStream.maintain(spark, lake, targetRowsPerFile = 1000000L, maxFiles = 2,
      keepBatches = 2)
    assert(nFiles(s"$lake/bands") == 1, "band index must compact to one file")
    assert(nFiles(s"$lake/docs") == 1)
    // ledger pruning: markers and bloom generations below maxDone-keep go
    // (skip the local FS's hidden .crc sidecars)
    val markerIds = new java.io.File(s"$lake/_batches").listFiles()
      .filterNot(_.getName.startsWith("."))
      .map(_.getName.stripSuffix(".done").stripSuffix(".started")).map(_.toLong).toSet
    assert(markerIds == Set(2L, 3L, 4L), s"pruned ledger was $markerIds")
    val bloomIds = new java.io.File(s"$lake/_idbloom").listFiles()
      .filterNot(f => f.getName.startsWith(".") || f.getName.startsWith("_"))
      .map(_.getName.toLong).toSet
    assert(bloomIds == Set(2L, 3L, 4L), s"pruned blooms were $bloomIds")
    // the admitted-count backfill reset the ledger to the exact docs count
    val sizing = scala.io.Source.fromFile(s"$lake/_idbloom/_sizing").mkString.trim.split("\\s+")
    assert(sizing(2).toLong == 5L, s"backfilled count was ${sizing.mkString(" ")}")
    // the compacted lake still shadows near-dups and admits novel docs
    NearDupStream.processBatch(
      Seq((200L, texts(3).replace("sunlight", "daylight")), (201L, base))
        .toDF("doc_id", "text"), lake, batchId = 5)
    val ids = spark.read.parquet(s"$lake/docs").select("doc_id").as[Long].collect().toSet
    assert(ids == (100L until 105L).toSet + 201L, ids.toSeq.sorted.mkString(","))
  }

  test("a foreign writer fails loudly instead of silently no-opping") {
    val lake = Files.createTempDirectory("neardupwriter").toString
    val b1 = Seq((1L, base), (2L, distinct1)).toDF("doc_id", "text")
    NearDupStream.processBatch(b1, lake, batchId = 0, writerId = Some("stream-A"))
    assert(spark.read.parquet(s"$lake/docs").count() == 2)
    // the SAME writer replaying its batch is the normal done-marker no-op
    NearDupStream.processBatch(b1, lake, batchId = 0, writerId = Some("stream-A"))
    assert(spark.read.parquet(s"$lake/docs").count() == 2)
    // a reset/foreign checkpoint restarts batchIds at 0 — without the
    // stamp its first batch would match the old done marker and be
    // silently dropped; with it, the mismatch must throw BEFORE the
    // done-marker check
    val foreign = Seq((9L, distinct2)).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      NearDupStream.processBatch(foreign, lake, batchId = 0, writerId = Some("stream-B"))
    }
    assert(e.getMessage.contains("stream-A"), e.getMessage)
    assert(spark.read.parquet(s"$lake/docs").count() == 2, "foreign batch must not land")
    // direct callers that manage their own batchIds (no writer id) keep working
    NearDupStream.processBatch(foreign, lake, batchId = 1)
    assert(spark.read.parquet(s"$lake/docs").count() == 3)
  }

  test("a torn newest bloom generation falls back to the previous one") {
    val lake = Files.createTempDirectory("nearduptorn").toString
    NearDupStream.processBatch(
      Seq((1L, base), (2L, distinct1)).toDF("doc_id", "text"), lake, batchId = 0)
    NearDupStream.processBatch(
      Seq((3L, distinct2)).toDF("doc_id", "text"), lake, batchId = 1)
    // reconstruct a non-atomic-FS crash: generation 1's bytes torn AND
    // batch 1 not marked done (the only state in which a torn newest
    // generation can exist — the done marker lands after the bloom)
    val gen1 = new java.io.FileOutputStream(s"$lake/_idbloom/1")
    gen1.write("torn bloom bytes".getBytes); gen1.close()
    assert(new java.io.File(s"$lake/_batches/1.done").delete())
    assert(new java.io.File(s"$lake/_batches/1.started").exists(),
      "the started marker from the real run is what a crash leaves behind")
    // the replay must read generation 0 (fall back past the torn file),
    // converge, and rewrite generation 1 — not throw on readFrom
    NearDupStream.processBatch(
      Seq((3L, distinct2)).toDF("doc_id", "text"), lake, batchId = 1)
    val ids = spark.read.parquet(s"$lake/docs").select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L), s"replay after torn bloom diverged: $ids")
    assert(spark.read.parquet(s"$lake/docs").count() == 3)
    // and the id guard still works off the rewritten generation
    NearDupStream.processBatch(
      Seq((3L, "totally new text for an already admitted id collision case here"))
        .toDF("doc_id", "text"), lake, batchId = 2)
    assert(spark.read.parquet(s"$lake/docs").count() == 3, "first write wins")
  }

  test("bloom capacity rebuild at half-full grows the sizing, admission stays exact") {
    val lake = Files.createTempDirectory("neardupgrow").toString
    val novel = "volcanic islands form long archipelagos as tectonic plates drift over hotspots"
    // items=4: the 3 admitted docs hit half capacity immediately → the
    // batch rebuilds at 4×max(4,3)=16 from the docs relation
    NearDupStream.processBatch(
      Seq((1L, base), (2L, distinct1), (3L, distinct2)).toDF("doc_id", "text"),
      lake, batchId = 0, bloomItems = 4, bloomFpp = 0.01)
    def sizing: Array[String] =
      scala.io.Source.fromFile(s"$lake/_idbloom/_sizing").mkString.trim.split("\\s+")
    assert(sizing(0).toLong == 16L, s"sizing after rebuild: ${sizing.mkString(" ")}")
    assert(sizing(2).toLong == 3L)
    // the next batch adopts the LEDGER sizing (its own default is
    // ignored), merges compatibly, and the guard still first-write-wins
    NearDupStream.processBatch(
      Seq((1L, base), (50L, novel)).toDF("doc_id", "text"),
      lake, batchId = 1, bloomItems = 4, bloomFpp = 0.01)
    val ids = spark.read.parquet(s"$lake/docs").select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 50L), s"post-rebuild admission diverged: $ids")
    assert(spark.read.parquet(s"$lake/docs").count() == 4)
    assert(sizing(2).toLong == 4L, s"count after batch 1: ${sizing.mkString(" ")}")
  }

  test("torn gen/sizing pair (crash inside a capacity rebuild) heals instead of wedging") {
    import spark.implicits._
    // unique, shingle-rich texts — every doc clears the near-dup gate
    def doc(i: Long) = (i, s"document number $i discusses entirely unique topic $i " +
      s"with vocabulary token$i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i")
    val lake = Files.createTempDirectory("neardupTorn").toString
    def admitted: Set[Long] =
      spark.read.parquet(s"$lake/docs").select("doc_id").as[Long].collect().toSet
    // batch 0 at tiny capacity (16): 6 admissions → merge branch, gen(16)
    NearDupStream.processBatch((1L to 6L).map(doc).toDF("doc_id", "text"),
      lake, batchId = 0, bloomItems = 16L, bloomFpp = 0.01)
    val sizingAfter0 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$lake/_idbloom/_sizing"))
    // batch 1: count 9 crosses items/2 → REBUILD writes gen(64), then
    // sizing. Reconstruct the crash BETWEEN those writes: done marker
    // gone, sizing rolled back — the newest generation's geometry (64)
    // no longer matches the ledger (16).
    NearDupStream.processBatch((7L to 9L).map(doc).toDF("doc_id", "text"),
      lake, batchId = 1, bloomItems = 16L, bloomFpp = 0.01)
    assert(new java.io.File(s"$lake/_batches/1.done").delete())
    new java.io.File(s"$lake/_idbloom/._sizing.crc").delete()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$lake/_idbloom/_sizing"), sizingAfter0)
    // replay of batch 1: zero survivors → the rebuild trigger does NOT
    // re-fire (newCount stays at the stale ledger count) — the protocol
    // completes but the torn generation stays newest
    NearDupStream.processBatch((7L to 9L).map(doc).toDF("doc_id", "text"),
      lake, batchId = 1, bloomItems = 16L, bloomFpp = 0.01)
    assert(admitted == (1L to 9L).toSet)
    // batch 2: one survivor lands in the MERGE branch — a ledger-sized
    // mergeInPlace against the torn gen(64) used to throw
    // IncompatibleMergeException on every attempt (a permanently wedged
    // stream); IdBloom.mergeOrRebuild heals it from the docs relation
    NearDupStream.processBatch(Seq(doc(10L)).toDF("doc_id", "text"),
      lake, batchId = 2, bloomItems = 16L, bloomFpp = 0.01)
    assert(admitted == (1L to 10L).toSet)
    // and the healed guard still drops redeliveries exactly
    NearDupStream.processBatch((1L to 10L).map(doc).toDF("doc_id", "text"),
      lake, batchId = 3, bloomItems = 16L, bloomFpp = 0.01)
    assert(admitted == (1L to 10L).toSet)
    assert(spark.read.parquet(s"$lake/docs").count() == 10)
  }

  test("AvailableNow wrapper drains a file source through the same admission") {
    val work = Files.createTempDirectory("neardupstream").toString
    val src = s"$work/src"; val lake = s"$work/lake"; val ckpt = s"$work/ckpt"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    Seq((10L, base), (11L, nearDup), (12L, distinct1)).toDF("doc_id", "text")
      .write.parquet(src)
    NearDupStream.run(spark, src, schema, lake, ckpt)
    val ids = spark.read.parquet(s"$lake/docs").select("doc_id").as[Long].collect().toSet
    assert(ids == Set(10L, 12L))
    // second drain with the same checkpoint: no files left → lake unchanged
    NearDupStream.run(spark, src, schema, lake, ckpt)
    assert(spark.read.parquet(s"$lake/docs").count() == 2)
  }
}
