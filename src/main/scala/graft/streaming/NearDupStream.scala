package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.TextFunctions._

/** Streaming NEAR-dup admission control — the Structured-Streaming twin of
  * `q_dedup_incremental_lsh` (and the near-dup complement of
  * [[IngestPipeline.streamingDedup]]'s exact-key dedup): each micro-batch
  * of documents is MinHash-banded, joined batch-bands ⋈ lake-bands (never
  * lake × lake), candidate pairs verified with exact shingle Jaccard, and
  * only novel documents are admitted to the lake together with their band
  * index and shingle store.
  *
  * Reference relation: the reference's ingest dedups on exact payload
  * identity only (`redpanda_to_parquet_collector.py:468-530` anti-join);
  * near-dup admission at ingest time is the LLM-corpus extension — the
  * same banded no-all-pairs discipline as the batch LSH family
  * (DedupQueries), run continuously.
  *
  * Identity contract — FIRST WRITE WINS per doc_id: a redelivered doc_id
  * is dropped whatever its text says (an upstream producer that reuses an
  * id with new content is an id collision, resolved deterministically in
  * favor of the first admission). The guard is a PERSISTED Bloom filter
  * over admitted ids (`_idbloom/<batchId>`, a constant few MB read per
  * batch): bloom misses are definitely-new and skip every lake read;
  * only bloom hits — true redeliveries plus the configured false-positive
  * sliver — pay one exact column-pruned anti-join against the docs
  * relation. A false positive can therefore never drop a new document,
  * and the normal all-new batch touches no lake-proportional state at
  * all. Blooms must keep one (items, fpp) sizing per lake — a mismatched
  * merge fails loudly.
  *
  * Scale shape per batch:
  *   - batch bands ⋈ lake band index is an equi-join on (band, bkey) —
  *     AQE broadcasts the (small) batch side here, degrading to a
  *     shuffled equi-join when batches are large; the lake side is NEVER
  *     self-joined.
  *   - exact-Jaccard verification touches only candidate pairs, joining
  *     the shingle store on doc_id (candidate-proportional, not
  *     corpus-proportional).
  *   - in-batch duplicates use the same band self-join restricted to the
  *     batch (bounded by batch size, not lake size).
  *   - the lake keeps three append-only parquet relations: admitted docs,
  *     their (doc_id, band, bkey) index rows, and their shingle sets. At
  *     100 TB the band index is the only relation the hot join reads, and
  *     it carries 8 rows × ~24 bytes per admitted doc.
  *
  * Exactly-once, batchId-keyed (the cheap guard): `foreachBatch` may
  * re-run a batch after a crash, so idempotence is keyed on the
  * checkpoint's batchId through a tiny `_batches` marker ledger —
  * `<id>.started` lands (hsync'd best-effort) before any append,
  * `<id>.done` after the last — and three cases fall out:
  *   - done marker present → the batch fully landed; the replay returns
  *     immediately (two file-exists probes, ZERO lake scans).
  *   - neither marker → a genuinely new batch: the lake cannot contain
  *     any of this batch's rows, so every append is a plain append and
  *     NO append anti-joins its target — beyond the id-bloom probe the
  *     fast path never reads the lake's docs relation
  *     (NearDupStreamSpec proves it against a deliberately unreadable
  *     docs file). This is what bounds per-batch I/O: the old design
  *     re-read the full lake doc_id column four times per micro-batch —
  *     gigabytes per batch at a billion-doc lake.
  *   - started without done → a genuine crash replay, the RARE path: the
  *     lake may hold this batch's partial appends, so the replay runs
  *     per-target anti-joined appends, and candidate self-pair exclusion
  *     so partially appended index rows cannot shadow their own
  *     documents. Survivor selection is deterministic (min-doc_id
  *     greedy) and the id guard is the SAME first-write-wins bloom probe
  *     as the fast path, so the re-derived survivors are identical and
  *     the lake converges from any crash point; the appends run
  *     index-first / docs-LAST, then the bloom update, then the done
  *     marker — each step's replay is covered by the step after it. The
  *     spec replays the worst case (index rows written, docs not).
  *
  * Durability assumption, stated: the `.started` marker is created with a
  * best-effort hsync before the first append. On a filesystem that loses
  * the unsynced marker in a crash WHILE retaining later-written parquet
  * appends (no ordering guarantee at all), a replay could take the fast
  * path over a partially appended batch; HDFS/object-store semantics and
  * any POSIX fs with ordered metadata satisfy the requirement.
  *
  * One writer per lake: batchIds are unique per CHECKPOINT, so two
  * streams with different checkpoints must not share a lakeDir.
  *
  * In-batch policy: a document is dropped when a VERIFIED near-dup with a
  * smaller doc_id exists in the same batch — the pessimistic greedy (a
  * chain a~b, b~c with a≁c drops both b and c). This matches the
  * cross-batch rule (an earlier admitted copy shadows later ones) and
  * needs no connected-components pass inside the hot loop; the offline
  * `q_dedup_clusters` pipeline is the exact-clustering counterpart.
  */
object NearDupStream {

  private val MinhashK = 16
  private val Bands = 8

  /** doc-id'd shingle sets with the batch LSH family's exact recipe
    * (3-token shingles — the `shingled` frame of DedupQueries). The
    * shingles() helper clamps to at least ONE shingle — a document too
    * short for a 3-shingle carries its whole text as a singleton — so
    * even sub-3-token docs band-match their content duplicates instead
    * of vanishing from the index with an empty signature. */
  private def withShingles(docs: DataFrame): DataFrame =
    docs.withColumn("toks", tokens("text"))
      .select(col("doc_id"), shingles("toks", 3).as("sh"))

  private def bandRows(sh: DataFrame): DataFrame =
    sh.withColumn("mh", minhashSignature("sh", MinhashK))
      .select(col("doc_id"), posexplode(bandKeys("mh", Bands)).as(Seq("band", "bkey")))

  private def readOr(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(path))) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Latest persisted id-bloom (highest batchId file under `_idbloom`),
    * or None on a fresh lake. Crash-safe by construction: a new bloom is
    * a NEW file, so a torn write can only lose the newest generation —
    * which the batch replay (no done marker) rewrites. */
  private def latestBloom(fs: FileSystem, lakeDir: String): Option[BloomFilter] = {
    val dir = new Path(s"$lakeDir/_idbloom")
    if (!fs.exists(dir)) return None
    val latest = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.forall(_.isDigit))
      .sortBy(_.getName.toLong)
    latest.lastOption.map { p =>
      val in = fs.open(p)
      try BloomFilter.readFrom(in) finally in.close()
    }
  }

  private def bloomBytes(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out); out.toByteArray
  }

  /** Verified near-dup pairs (left_id, right_id) given candidate pairs and
    * a shingle lookup per side. */
  private def verified(cand: DataFrame, leftSh: DataFrame, rightSh: DataFrame,
                       threshold: Double): DataFrame = {
    val sa = leftSh.select(col("doc_id").as("left_id"), col("sh").as("sha"))
    val sb = rightSh.select(col("doc_id").as("right_id"), col("sh").as("shb"))
    cand.join(sa, "left_id").join(sb, "right_id")
      .withColumn("inter", expr("size(array_intersect(sha, shb))"))
      .withColumn("jac",
        col("inter").cast("double") / (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("left_id"), col("right_id"))
  }

  /** One micro-batch of near-dup admission against `lakeDir` (exposed for
    * deterministic spec replay; `run` wires it into foreachBatch with the
    * checkpoint's batchId). Idempotent per batchId — see the marker-ledger
    * and first-write-wins contracts in the object scaladoc. */
  def processBatch(batch: DataFrame, lakeDir: String, batchId: Long,
                   threshold: Double = 0.5,
                   bloomItems: Long = 1L << 22, bloomFpp: Double = 0.001): Unit = {
    val spark = batch.sparkSession
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val started = new Path(s"$lakeDir/_batches/$batchId.started")
    val done = new Path(s"$lakeDir/_batches/$batchId.done")
    if (fs.exists(done)) return // fully landed — replay is a no-op
    val crashReplay = fs.exists(started)
    if (!crashReplay) {
      val out = fs.create(started, true)
      try out.hsync() catch { case _: UnsupportedOperationException => () }
      out.close()
    }

    val docsPath = s"$lakeDir/docs"
    val bandsPath = s"$lakeDir/bands"
    val shPath = s"$lakeDir/shingles"

    // a redelivered doc_id INSIDE one micro-batch would otherwise ride
    // through as two rows (the in-batch self-join below is strict <, so
    // equal ids never pair) and be admitted twice — keep one
    // deterministically
    val docs0 = graft.ingest.Dedup.dedupKeepFirst(
      batch.select(col("doc_id").cast("long"), col("text")),
      Seq(col("doc_id")), col("text"))

    // FIRST-WRITE-WINS id guard (both paths): probe the persisted bloom;
    // misses are definitely new (no false negatives); only hits pay the
    // exact column-pruned confirm against the docs relation — the rare,
    // redelivery-proportional lake read
    val loadedBloom = latestBloom(fs, lakeDir)
    val docs = (loadedBloom match {
      case None => docs0
      case Some(bf) =>
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.classic.{GraftExpressionBridge => Bridge}
        import org.apache.spark.sql.types.BinaryType
        val mightContain = coalesce(Bridge.column(BloomFilterMightContain(
          Literal(bloomBytes(bf), BinaryType), Bridge.expression(col("doc_id")))), lit(false))
        val hits = docs0.filter(mightContain)
        if (hits.isEmpty) docs0
        else {
          val lakeIds = readOr(spark, docsPath, docs0.schema)
            .select(col("doc_id").as("x_id"))
          docs0.filter(!mightContain).unionByName(
            hits.join(lakeIds, col("doc_id") === col("x_id"), "left_anti"))
        }
    }).persist()
    val persisted = scala.collection.mutable.ArrayBuffer[DataFrame](docs)
    var checkpointed: Option[DataFrame] = None
    try {
      val freshSh = withShingles(docs).persist()
      val freshBands = bandRows(freshSh).persist()
      persisted += freshSh; persisted += freshBands

      // batch ⋈ lake candidates — the lake side is only ever equi-joined.
      // The self-pair exclusion (left ≠ right) applies ONLY on crash
      // replay, where a partial append can place the batch's OWN band
      // rows in the index — without the filter every such doc would match
      // itself (Jaccard 1) and be dropped as "already in the lake" before
      // its docs row ever lands. On the fast path the id guard above has
      // already removed every id the lake knows, so equal-id matches
      // cannot occur at all.
      val lakeBands = readOr(spark, bandsPath, freshBands.schema)
      val idGuard =
        if (crashReplay) col("left_id") =!= col("right_id") else lit(true)
      val candLake = freshBands.select(col("doc_id").as("left_id"), col("band"), col("bkey"))
        .join(lakeBands.select(col("doc_id").as("right_id"),
          col("band").as("l_band"), col("bkey").as("l_bkey")),
          col("band") === col("l_band") && col("bkey") === col("l_bkey") && idGuard)
        .select(col("left_id"), col("right_id")).distinct()
      val lakeSh = readOr(spark, shPath, freshSh.schema)
      val dupVsLake = verified(candLake, freshSh, lakeSh, threshold)
        .select(col("left_id").as("doc_id")).distinct()

      // in-batch candidates: same banding, batch-bounded self-join
      val a = freshBands.select(col("doc_id").as("right_id"), col("band"), col("bkey"))
      val b = freshBands.select(col("doc_id").as("left_id"),
        col("band").as("b_band"), col("bkey").as("b_bkey"))
      val candBatch = b.join(a,
          col("b_band") === col("band") && col("b_bkey") === col("bkey")
            && col("left_id") > col("right_id"))
        .select(col("left_id"), col("right_id")).distinct()
      val dupInBatch = verified(candBatch, freshSh, freshSh, threshold)
        .select(col("left_id").as("doc_id")).distinct()

      // Each append below triggers recacheByPath on every cached plan
      // whose lineage reads the written path — survivors' derivation
      // reads the band/shingle relations (and docs, on a bloom-hit
      // guard) — so a persist() here would silently RECOMPUTE against
      // the half-appended lake mid-sequence and hand later appends a
      // different (even empty) frame. A localCheckpoint severs the
      // lineage: all three appends see the same materialized survivor
      // set no matter what the appends do to the paths underneath.
      val survivors = docs
        .join(dupVsLake.unionByName(dupInBatch).distinct(), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      checkpointed = Some(survivors)

      // Three appends. ORDER IS LOAD-BEARING: docs goes LAST — a crash
      // anywhere before the docs append leaves the full batch in play on
      // replay, which re-derives the SAME survivors (the replay-only
      // self-pair exclusion keeps partially appended index rows from
      // shadowing their own docs) and fills only the missing relations;
      // a crash after the docs append replays as no-op appends. Docs-first
      // was the confirmed corruption: the replay would skip the
      // already-admitted docs, never write their index rows, and admit
      // in-batch near-dups that no longer saw their keeper. Target
      // anti-joins run ONLY on crash replay — a fresh batch's appends are
      // plain writes.
      def appendNew(df: DataFrame, path: String): Unit = {
        val out =
          if (crashReplay) {
            val existing = readOr(spark, path, df.schema).select(col("doc_id").as("x_id"))
            df.join(existing, col("doc_id") === col("x_id"), "left_anti")
          } else df
        out.write.mode("append").option("compression", "zstd").parquet(path)
      }
      // cached: both index appends read it, and its lineage sits on the
      // checkpoint blocks (no path reads), so recacheByPath can't touch it
      val survSh = withShingles(survivors).persist()
      persisted += survSh
      appendNew(bandRows(survSh), bandsPath)
      appendNew(survSh, shPath)
      appendNew(survivors, docsPath)
      // bloom update AFTER the docs append, BEFORE the done marker: a
      // crash in between replays the batch (guarded path, no-op appends)
      // and rewrites the bloom; distributed build + merge, no collect.
      // stat.bloomFilter NPEs on an EMPTY frame (null aggregation
      // buffer), so an all-duplicate batch carries the loaded bloom
      // forward unchanged
      val survBloom =
        if (survivors.isEmpty)
          loadedBloom.getOrElse(BloomFilter.create(bloomItems, bloomFpp))
        else {
          val b = survivors.stat.bloomFilter("doc_id", bloomItems, bloomFpp)
          loadedBloom.foreach(b.mergeInPlace) // same sizing or fail loudly
          b
        }
      val bp = new Path(s"$lakeDir/_idbloom/$batchId")
      val bout = fs.create(bp, true)
      try survBloom.writeTo(bout) finally bout.close()
      fs.create(done, true).close()
    } finally {
      persisted.foreach(_.unpersist()) // only this batch's blocks — not the session cache
      // checkpoint blocks are RDD-level: Dataset.unpersist can't see them
      checkpointed.foreach(graft.functions.Checkpoints.releaseNow)
    }
  }

  /** Small-file maintenance for the three lake relations, plus ledger
    * pruning: every micro-batch append lands a fresh file set, and the
    * hot-path band index degrades fastest (one file group per batch, 8
    * rows per doc). Compacts any relation whose parquet file count
    * exceeds `maxFiles`, clustering the band index by (band, bkey) — so
    * the per-batch candidate lookup benefits from parquet min/max
    * pruning on the very keys it joins — and the doc-keyed relations by
    * doc_id. Also prunes the `_batches` marker ledger and `_idbloom`
    * generations: only the newest `keepBatches` done ids can ever be
    * replayed (foreachBatch replays at most the last uncommitted batch),
    * so older markers and blooms are dead weight that would otherwise
    * accumulate two tiny files per batch forever. Run this BETWEEN
    * drains (or from a scheduled maintenance job), never inside a
    * running query: `LakeWriter.compact` stages and swaps atomically,
    * and the next batch lists the directory fresh. */
  def maintain(spark: SparkSession, lakeDir: String,
               targetRowsPerFile: Long = 4L * 1024 * 1024, maxFiles: Int = 16,
               keepBatches: Int = 16): Unit = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def nFiles(p: String): Int = {
      val path = new Path(p)
      if (!fs.exists(path)) 0
      else fs.listStatus(path).count(_.getPath.getName.endsWith(".parquet"))
    }
    def maybe(p: String, clusterBy: Seq[String]): Unit =
      if (nFiles(p) > maxFiles)
        graft.sources.LakeWriter.compact(spark, p, targetRowsPerFile, clusterBy)
    maybe(s"$lakeDir/docs", Seq("doc_id"))
    maybe(s"$lakeDir/bands", Seq("band", "bkey"))
    maybe(s"$lakeDir/shingles", Seq("doc_id"))
    // ledger pruning: markers strictly below the retention floor go, as
    // do bloom generations below it (the latest bloom is a superset of
    // every earlier one, so only the newest is ever read)
    val markers = new Path(s"$lakeDir/_batches")
    if (fs.exists(markers)) {
      val done = fs.listStatus(markers).map(_.getPath.getName)
        .filter(_.endsWith(".done")).map(_.stripSuffix(".done").toLong)
      if (done.nonEmpty) {
        val floor = done.max - keepBatches
        fs.listStatus(markers).map(_.getPath).foreach { p =>
          val id = p.getName.stripSuffix(".done").stripSuffix(".started")
          if (id.forall(_.isDigit) && id.toLong < floor) fs.delete(p, false)
        }
        val blooms = new Path(s"$lakeDir/_idbloom")
        if (fs.exists(blooms))
          fs.listStatus(blooms).map(_.getPath)
            .filter(p => p.getName.forall(_.isDigit) && p.getName.toLong < floor)
            .foreach(fs.delete(_, false))
      }
    }
  }

  /** File-source streaming wrapper: drain `srcDir` with AvailableNow,
    * running [[processBatch]] per micro-batch under the checkpoint's
    * batchId (the idempotence key). The Kafka variant swaps the source
    * exactly as [[IngestPipeline.kafkaSource]] documents. */
  def run(spark: SparkSession, srcDir: String, schema: StructType,
          lakeDir: String, checkpoint: String, threshold: Double = 0.5): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, lakeDir, batchId, threshold)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
