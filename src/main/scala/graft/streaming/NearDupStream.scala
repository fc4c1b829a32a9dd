package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

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
  * Exactly-once: `foreachBatch` may re-run a batch after a crash, so every
  * append first anti-joins its TARGET's existing doc_ids, the docs append
  * runs LAST (the re-run guard keys on it — a crash before it leaves the
  * whole batch in play on replay, which re-derives identical survivors
  * and fills only the missing relations; a crash after it replays as a
  * no-op), and lake candidates exclude self-pairs so partially appended
  * index rows cannot shadow their own documents. Survivor selection is
  * deterministic (min-doc_id greedy), so re-derived survivors are
  * identical and the lake converges from any crash point — the spec
  * replays the worst case (index rows written, docs not).
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
    * (3-token shingles — the `shingled` frame of DedupQueries). */
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
    * deterministic spec replay; `run` wires it into foreachBatch).
    * Idempotent — re-processing the same batch appends nothing new. */
  def processBatch(batch: DataFrame, lakeDir: String, threshold: Double = 0.5): Unit = {
    val spark = batch.sparkSession
    val docsPath = s"$lakeDir/docs"
    val bandsPath = s"$lakeDir/bands"
    val shPath = s"$lakeDir/shingles"

    // a redelivered doc_id INSIDE one micro-batch would otherwise ride
    // through as two rows (the id self-join below is strict <, so equal
    // ids never pair) and be admitted twice — keep one deterministically
    val docs = graft.ingest.Dedup.dedupKeepFirst(
      batch.select(col("doc_id").cast("long"), col("text")),
      Seq(col("doc_id")), col("text")).persist()
    val persisted = scala.collection.mutable.ArrayBuffer[DataFrame](docs)
    var checkpointed: Option[DataFrame] = None
    try {
      // re-run guard: anything already admitted is not re-considered
      val admittedIds = readOr(spark, docsPath, docs.schema).select(col("doc_id"))
      val fresh = docs.join(admittedIds, Seq("doc_id"), "left_anti").persist()
      persisted += fresh
      val freshSh = withShingles(fresh).persist()
      val freshBands = bandRows(freshSh).persist()
      persisted += freshSh; persisted += freshBands

      // batch ⋈ lake candidates — the lake side is only ever equi-joined.
      // The self-pair exclusion (left ≠ right) is crash-replay
      // load-bearing: a replay after a partial append can find the
      // batch's OWN band rows already in the index, and without the
      // filter every such doc would match itself (Jaccard 1) and be
      // dropped as "already in the lake" before its docs row ever lands.
      val lakeBands = readOr(spark, bandsPath, freshBands.schema)
      val candLake = freshBands.select(col("doc_id").as("left_id"), col("band"), col("bkey"))
        .join(lakeBands.select(col("doc_id").as("right_id"),
          col("band").as("l_band"), col("bkey").as("l_bkey")),
          col("band") === col("l_band") && col("bkey") === col("l_bkey")
            && col("left_id") =!= col("right_id"))
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
      // reads ALL THREE (docs for the re-run guard, bands/shingles for
      // the lake candidates) — so a persist() here would silently
      // RECOMPUTE against the half-appended lake mid-sequence and hand
      // later appends a different (even empty) frame. A localCheckpoint
      // severs the lineage: all three appends see the same materialized
      // survivor set no matter what the appends do to the paths
      // underneath.
      val survivors = fresh
        .join(dupVsLake.unionByName(dupInBatch).distinct(), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      checkpointed = Some(survivors)

      // Three idempotent appends, each anti-joined against its own
      // target. ORDER IS LOAD-BEARING: docs goes LAST because the re-run
      // guard keys on docsPath — a crash anywhere before the docs append
      // leaves the full batch in `fresh` on replay, which re-derives the
      // SAME survivors (the self-pair exclusion above keeps partially
      // appended index rows from shadowing their own docs) and fills only
      // the missing relations; a crash after the docs append means
      // everything else is already written and the replay is a no-op.
      // Docs-first was the confirmed corruption: the replay would skip
      // the already-admitted docs, never write their index rows, and
      // admit in-batch near-dups that no longer saw their keeper.
      def appendNew(df: DataFrame, path: String): Unit = {
        val existing = readOr(spark, path, df.schema).select(col("doc_id").as("x_id"))
        df.join(existing, col("doc_id") === col("x_id"), "left_anti")
          .write.mode("append").option("compression", "zstd").parquet(path)
      }
      // cached: both index appends read it, and its lineage sits on the
      // checkpoint blocks (no path reads), so recacheByPath can't touch it
      val survSh = withShingles(survivors).persist()
      persisted += survSh
      appendNew(bandRows(survSh), bandsPath)
      appendNew(survSh, shPath)
      appendNew(survivors, docsPath)
    } finally {
      persisted.foreach(_.unpersist()) // only this batch's blocks — not the session cache
      // checkpoint blocks are RDD-level: Dataset.unpersist can't see them
      checkpointed.foreach(graft.functions.Checkpoints.releaseNow)
    }
  }

  /** Small-file maintenance for the three lake relations: every
    * micro-batch append lands a fresh file set, and the hot-path band
    * index degrades fastest (one file group per batch, 8 rows per doc).
    * Compacts any relation whose parquet file count exceeds `maxFiles`,
    * clustering the band index by (band, bkey) — so the per-batch
    * candidate lookup benefits from parquet min/max pruning on the very
    * keys it joins — and the doc-keyed relations by doc_id. Run this
    * BETWEEN drains (or from a scheduled maintenance job), never inside
    * a running query: `LakeWriter.compact` stages and swaps atomically,
    * and the next batch lists the directory fresh. */
  def maintain(spark: SparkSession, lakeDir: String,
               targetRowsPerFile: Long = 4L * 1024 * 1024, maxFiles: Int = 16): Unit = {
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
  }

  /** File-source streaming wrapper: drain `srcDir` with AvailableNow,
    * running [[processBatch]] per micro-batch. The Kafka variant swaps the
    * source exactly as [[IngestPipeline.kafkaSource]] documents. */
  def run(spark: SparkSession, srcDir: String, schema: StructType,
          lakeDir: String, checkpoint: String, threshold: Double = 0.5): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, lakeDir, threshold)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
