package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ingest.{GraftConfig, JsonDecode, OffsetLedger}
import graft.streaming.IngestPipeline

/** The runnable collector — the Spark equivalent of the reference's
  * `python redpanda_to_parquet_collector.py` entry point: read
  * [[graft.ingest.GraftConfig]] from the environment, drain the source
  * once (AvailableNow), land decoded/flattened date-partitioned zstd
  * parquet, and run the post-drain count validation.
  *
  * Source selection via `GRAFT_SOURCE`:
  *  - `file` (default, and the only mode this container can run): a
  *    parquet directory at `GRAFT_SOURCE_DIR` stands in for the broker —
  *    the same downstream the reference's consumer feeds. The payload
  *    schema is SAMPLED once per run ([[JsonDecode.inferSchema]], the
  *    reference's one-shot per-topic detection `:172-220`), then the full
  *    stream decodes through codegen'd `from_json`.
  *  - `kafka`: `IngestPipeline.kafkaSource` with the config's brokers and
  *    fetch tuning; identical downstream. Needs a live broker.
  *
  * Knob wiring (see GraftConfig's scaladoc for the full table):
  * compression confs land on the session; `SKIP_VALIDATION` gates the
  * count check; `SKIP_EXISTING_CHECK=false` mines the lake's offset
  * ledger first and reports what a resume would skip;
  * `KAFKA_CLEANUP_ENABLED` is file-mode inert (documented — the KafkaTrim
  * binding needs a broker).
  *
  * Scale notes: every stage is a narrow map or a partitioned sink —
  * the only aggregates are the bounded ledger/validation summaries; the
  * drain itself is exactly-once under the checkpoint, so re-running after
  * a crash resumes instead of duplicating (the reference needs its
  * anti-join dedup for this; with a checkpoint the lake stays clean even
  * with `SKIP_DEDUPLICATION=true`).
  */
object CollectorMain {
  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromEnv()
    val srcMode = sys.env.getOrElse("GRAFT_SOURCE", "file")
    val srcDir = sys.env.getOrElse("GRAFT_SOURCE_DIR", "")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", cfg.maxWorkers.toString)
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    cfg.sparkConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, cfg, srcMode, srcDir)
    finally spark.stop()
  }

  /** Deferred (post-drain) dedup: one merge pass over the landed lake,
    * keep-first by (event_id, ts), stage-and-swap preserving the date
    * partitioning — the reference's staging+merge step; at scale this is
    * one key-partitioned shuffle of the NEW drain's partitions.
    *
    * Two failure posures the swap must survive:
    *  - `FileSystem.rename` reports failure by RETURNING FALSE, not by
    *    throwing — every rename result is checked, and a failed second
    *    rename rolls the original lake back before aborting, so no
    *    ordering of failures can delete the only copy of the data.
    *  - The rewrite replaces every part file, which makes the streaming
    *    file sink's `_spark_metadata` log stale BY CONSTRUCTION (it lists
    *    the old names). The drain's checkpoint survives the swap, so a
    *    later incremental drain would recreate the log holding only its
    *    own batch — and every `spark.read.parquet(lake)` thereafter
    *    resolves through the log and silently hides the pre-swap files.
    *    We therefore REBUILD the log over the rewritten files, replaying
    *    batch ids 0..latest (empty deltas + the full listing at the
    *    latest id) through Spark's own `FileStreamSinkLog`, so readers
    *    and subsequent drains both see the whole lake. */
  private def dedupLakeInPlace(spark: SparkSession, dest: String, compression: String,
                               keys: Seq[String] = Seq("event_id"),
                               tsCol: String = "ts"): Unit = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.execution.streaming.sinks.FileStreamSinkLog
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val destPath = new Path(dest)
    val tmp = new Path(dest + ".rewrite")
    val old = new Path(dest + ".old")
    val cur = spark.read.parquet(dest)
    // skip the rewrite when the lake is already clean: the common resume
    // path then never touches the files or the sink metadata log
    if (cur.count() == cur.select(keys.map(col): _*).distinct().count()) return
    // capture the sink log's latest batch id BEFORE the swap moves it
    val metaDir = new Path(destPath, "_spark_metadata")
    val latestBatch: Option[Long] =
      if (fs.exists(metaDir))
        new FileStreamSinkLog(FileStreamSinkLog.VERSION, spark, metaDir.toString, None)
          .getLatestBatchId()
      else None
    graft.ingest.Dedup.dedupKeepFirst(cur, keys.map(col), col(tsCol))
      .write.mode("overwrite").option("compression", compression)
      .partitionBy("date_path").parquet(tmp.toString)
    if (!fs.rename(destPath, old))
      throw new IllegalStateException(
        s"dedup swap aborted: rename $dest -> $old returned false; " +
          s"lake untouched, rewrite left at $tmp for inspection")
    if (!fs.rename(tmp, destPath)) {
      val rolledBack = fs.rename(old, destPath)
      throw new IllegalStateException(
        s"dedup swap failed: rename $tmp -> $dest returned false; " +
          (if (rolledBack) "original lake restored"
           else s"MANUAL ACTION REQUIRED: the lake is intact at $old"))
    }
    // rebuild the sink metadata log over the rewritten files (see
    // scaladoc; shared with the inline keeper's reconciliation)
    latestBatch.foreach(id =>
      graft.sources.LakeWriter.rebuildSinkLog(spark, dest, id))
    // only discard the backup once the swapped lake is verifiably there
    if (!fs.exists(destPath))
      throw new IllegalStateException(
        s"post-swap check failed: $dest missing; backup retained at $old")
    // the swap replaced the whole directory: carry the schema-lineage
    // registry over from the pre-swap lake (the rewrite changes FILES,
    // never the payload schema history). FileSystem.rename reports
    // failure by RETURNING FALSE — checked like every other rename in
    // this swap, and ordered AFTER the sink-log rebuild so a failed
    // move aborts with the lake fully readable: deleting `old` on a
    // failed move would destroy the only copy of the lineage registry
    // and silently demote readers to the mergeSchema fallback
    val oldSchema = new Path(old, "_schema")
    if (fs.exists(oldSchema) && !fs.rename(oldSchema, new Path(destPath, "_schema")))
      throw new IllegalStateException(
        s"dedup swap: moving the schema-lineage registry $oldSchema -> " +
          s"$destPath/_schema returned false; backup retained at $old " +
          "(the swapped lake is intact and readable)")
    fs.delete(old, true)
  }

  /** The landed lake's payload-bearing schema, for the never-narrowing
    * union: the schema-lineage registry when this lake has one (O(versions)
    * tiny file reads, newest version's types win), else a `mergeSchema`
    * footer pass for legacy lakes (the standard distributed footer merge,
    * once per drain), else None for a fresh dest. */
  private def landedSchema(spark: SparkSession,
                           dest: String): Option[org.apache.spark.sql.types.StructType] = {
    val lineage = graft.sources.LakeWriter.schemaLineage(spark, dest)
    if (lineage.nonEmpty)
      lineage.map(_._3).foldLeft(
          Option.empty[org.apache.spark.sql.types.StructType]) { (acc, s) =>
        Some(graft.ingest.JsonDecode.unionPayloadSchema(s, acc, Set.empty))
      }
    else {
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(dest)))
        scala.util.Try(
          spark.read.option("mergeSchema", "true").parquet(dest).schema).toOption
      else None
    }
  }

  /** The whole drain as a function of (session, config, source) — the
    * main above is just env plumbing, so the spec can run the identical
    * path in-process. */
  def run(spark: SparkSession, cfg: GraftConfig, srcMode: String, srcDir: String): Unit = {
    require(srcMode == "file" || srcMode == "kafka", s"GRAFT_SOURCE=$srcMode (file|kafka)")
    require(srcMode == "kafka" || srcDir.nonEmpty, "file mode needs GRAFT_SOURCE_DIR")
    val dest = s"${cfg.outputDir}/lake"
    val checkpoint = s"${cfg.outputDir}/_checkpoint"

    if (!cfg.skipExistingCheck) {
      // lake-mined resume parity: report what a ledger-based resume would
      // start from (informational in the Spark engine — the checkpoint
      // owns resume offsets)
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(dest))) {
        val lake = spark.read.parquet(dest)
        if (lake.columns.contains("kafka_partition") && lake.columns.contains("kafka_offset")) {
          val ledger = OffsetLedger.collectLedger(lake)
          println(s"[collector] existing lake: resume watermarks $ledger")
        } else
          println(s"[collector] existing lake: ${lake.count()} rows (checkpoint governs resume)")
      } else println("[collector] no existing lake")
    }

    // one source read for guard + branches (the footer/listing work is
    // not free on large sources); envelope routing needs the full
    // 5-column envelope SHAPE, not just any binary `value` column — a
    // generic source with a raw-bytes column must keep draining through
    // the props path it always used
    val srcBatch: Option[org.apache.spark.sql.DataFrame] =
      if (srcMode == "file") Some(spark.read.parquet(srcDir)) else None
    def isEnvelope(df: org.apache.spark.sql.DataFrame): Boolean = {
      val cols = df.schema.fields.map(f => f.name -> f.dataType).toMap
      // ALL FIVE envelope columns, kafka_key included: decodeEnvelope
      // selects kafka_key unconditionally, so a near-envelope source
      // carrying only the four metadata columns must fall through to the
      // props path it always used instead of crashing the drain
      cols.get("value").contains(org.apache.spark.sql.types.BinaryType) &&
        Seq("kafka_topic", "kafka_partition", "kafka_offset", "kafka_timestamp",
          "kafka_key").forall(cols.contains)
    }
    val usedPayloadSchema: org.apache.spark.sql.types.StructType = srcMode match {
      case "file" if isEnvelope(srcBatch.get) =>
        // KAFKA-ENVELOPE source: binary payloads under the 5-column
        // metadata envelope (the shape IngestPipeline.kafkaSource emits —
        // this file twin exercises the broker downstream byte-for-byte).
        // Per-topic codec detection runs ONCE over a deterministic
        // bounded sample, then the payload JSON schema is inferred from
        // the SAME decoded sample — the reference's one-shot per-topic
        // detection (:172-220) at Spark scale: bounded jobs before the
        // drain, zero per-row python-style try/except during it.
        //
        // Sample coverage is GUARANTEED per (topic, partition): the
        // offset stride alone (every 101st) misses topics whose live
        // offset range contains no multiple of 101 — e.g. a
        // retention-trimmed topic holding offsets 10050-10099 — which
        // would mis-classify msgpack topics as JSON (full degrade to
        // raw_value) and, on an empty global sample, crash the decode.
        // So the stride unions with each (topic, partition)'s HEAD — the
        // 64 rows at its min offset: one column-pruned map-side-combined
        // aggregation plus a broadcast range join against it, both
        // bounded by the topic-partition count, never the data. 64 rows
        // per partition (not 1): a single-row sample also under-types the
        // payload — msgpack renders the integral double 0.0 as "0", so a
        // lone head row would infer a fractional field as long and every
        // fractional row after it would degrade to raw_value.
        val batch = srcBatch.get
        val bounds = batch.groupBy(col("kafka_topic"), col("kafka_partition"))
          .agg(min(col("kafka_offset")).as("_min_off"),
            max(col("kafka_offset")).as("_max_off"))
        // heads AND tails (64 each): heads guarantee detection/typing for
        // trimmed topics; tails see the NEWEST rows, where an evolved
        // payload's new field first appears — a small incremental append
        // can sit entirely between stride multiples
        val edges = batch
          .join(broadcast(bounds), Seq("kafka_topic", "kafka_partition"))
          .where(col("kafka_offset") < col("_min_off") + 64 ||
            col("kafka_offset") > col("_max_off") - 64)
          .drop("_min_off", "_max_off")
        val strided = batch.where(pmod(col("kafka_offset"), lit(101L)) === 0)
        val sample = strided.unionByName(edges)
        val formats = IngestPipeline.detectTopicFormats(sample)
        println(s"[collector] detected topic formats: $formats")
        // never-narrowing across incremental drains: widen this run's
        // inferred schema with every payload field the lake already
        // landed (the envelope/derived columns are not payload).
        // Inference bounds the STRIDE side BEFORE the union (the
        // inferSchemaSpread shape): a post-union limit fills from the
        // union's first partitions — the stride — so on sources with
        // ≥1000 stride hits the per-(topic, partition) head/tail rows
        // would be starved out and a field first appearing in a recent
        // high-offset append silently dropped forever. The edge side is
        // already bounded by the topic-partition count. The limit applies
        // to DECODED non-null payload texts, not raw envelope rows: a
        // topic whose stride is mostly undecodable binary would otherwise
        // spend the whole budget on rows inference's na.drop discards,
        // shrinking the effective sample to the edges. Codec detection
        // above deliberately keeps the UNBOUNDED sample (one distributed
        // aggregation; more evidence never hurts it).
        val strideTexts = IngestPipeline.envelopeJsonText(strided, formats)
          .na.drop.limit(1000)
        val edgeTexts = IngestPipeline.envelopeJsonText(edges, formats)
        val payloadSchema = JsonDecode.unionPayloadSchema(
          JsonDecode.inferSchemaOver(spark,
            strideTexts.unionByName(edgeTexts), "_json"),
          landedSchema(spark, dest),
          batch.columns.toSet ++ Seq("date_path", "raw_value"))
        // the reference's dedup key for broker streams is the message
        // identity itself — offsets scoped per topic AND partition
        // (`:468-530`, `:741-748`; a bare (partition, offset) pair
        // collides across topics); same WHEN-not-IF contract as the
        // events path below: false = inline keeper during the drain,
        // true = one deferred merge pass
        val envKeys = Seq("kafka_topic", "kafka_partition", "kafka_offset")
        if (!cfg.skipDeduplication)
          IngestPipeline.runFileIngestKeeper(spark, srcDir, batch.schema,
            payloadSchema, dest, checkpoint,
            compression = cfg.parquetCompression,
            keys = envKeys, tsCol = "kafka_timestamp",
            decode = Some(IngestPipeline.decodeEnvelope(_, formats, payloadSchema)))
        else {
          IngestPipeline.runFileIngest(spark, srcDir, batch.schema, payloadSchema,
            dest, checkpoint, compression = cfg.parquetCompression,
            decode = Some(IngestPipeline.decodeEnvelope(_, formats, payloadSchema)))
          dedupLakeInPlace(spark, dest, cfg.parquetCompression,
            envKeys, "kafka_timestamp")
        }
        payloadSchema
      case "file" =>
        val batch = srcBatch.get
        // spread-sampled (a head-only sample misses fields that first
        // appear in later-appended files) and never-narrowing vs the lake
        val payloadSchema = JsonDecode.unionPayloadSchema(
          JsonDecode.inferSchemaSpread(spark, batch, "props"),
          landedSchema(spark, dest),
          batch.columns.toSet ++ Seq("date_path", "raw_value"))
        val hasEventId = batch.columns.contains("event_id")
        // SKIP_DEDUPLICATION is WHEN dedup happens, not IF (the
        // reference's `:87` semantics): false = inline during the drain,
        // true = deferred to one post-drain merge pass — either way the
        // lake never carries duplicate event_ids. KEEPER CONTRACT:
        // inline mode now applies the SAME min-ts keeper as the
        // deferred rewrite WITHIN each micro-batch
        // (IngestPipeline.runFileIngestKeeper — dedupKeepFirst per
        // batch + a persisted id-bloom guard whose misses skip the lake
        // entirely and whose hits pay one column-pruned anti-join), so
        // the two modes pick identical representatives for every
        // within-batch duplicate (CollectorMainSpec pins the equality)
        // and inline mode stays O(batch) per trigger even on a
        // forever-running stream. The residual
        // divergence is cross-batch only: an append-only sink cannot
        // retract a landed row when a smaller-ts duplicate arrives in a
        // LATER batch, while deferred re-arbitrates globally. For
        // broker redelivery (byte-identical duplicates, the reference's
        // actual failure mode) the modes are indistinguishable; when
        // producers may re-stamp retries ACROSS batches, run deferred
        // mode — it remains the keeper authority.
        if (hasEventId && !cfg.skipDeduplication)
          IngestPipeline.runFileIngestKeeper(spark, srcDir, batch.schema,
            payloadSchema, dest, checkpoint,
            compression = cfg.parquetCompression, keys = Seq("event_id"))
        else {
          // the writer option overrides the session conf, so the knob
          // must reach the sink explicitly — a session conf alone is
          // ignored
          IngestPipeline.runFileIngest(spark, srcDir, batch.schema, payloadSchema,
            dest, checkpoint, compression = cfg.parquetCompression)
          if (hasEventId && cfg.skipDeduplication)
            dedupLakeInPlace(spark, dest, cfg.parquetCompression)
        }
        payloadSchema
      case "kafka" =>
        // the source swap is IngestPipeline.kafkaSource(cfg.bootstrapServers,
        // GRAFT_TOPICS) with value.cast("string") as the payload column;
        // downstream (decode → flatten → partitioned sink) is identical —
        // KafkaIntegrationSpec carries the live-broker recipe
        throw new IllegalStateException(
          "kafka mode needs a live broker — this environment runs file mode")
    }

    // schema lineage: record this drain's payload schema (idempotent per
    // hash — the reference's md5 version-on-change, `:414-432, :435-465`);
    // lineage > 1 tells readers the lake spans schema versions and a
    // mergeSchema read reconciles them
    val schemaV = graft.sources.LakeWriter.recordSchemaVersion(
      spark, dest, usedPayloadSchema)
    val lineage = graft.sources.LakeWriter.schemaLineage(spark, dest)
    println(s"[collector] payload schema v$schemaV " +
      s"(${graft.sources.LakeWriter.schemaHash(usedPayloadSchema)}); " +
      s"lineage: ${lineage.map(e => s"v${e._1}_${e._2}").mkString(", ")}" +
      (if (lineage.size > 1) " — read the lake with mergeSchema=true" else ""))

    if (!cfg.skipValidation) {
      // the reference's post-run count validation (`q_count_validation`
      // shape): landed rows vs source rows, plus duplicate detection on
      // the event key when present
      val landed = spark.read.parquet(dest)
      val src = spark.read.parquet(srcDir)
      val nLanded = landed.count()
      val nSrc = src.count()
      // dedup runs in BOTH modes (inline or deferred), so the lake must
      // hold exactly the source's DISTINCT events and zero duplicate keys
      // — keyed on the message identity for Kafka-envelope SOURCES
      // (checked first: an envelope payload may itself carry an event_id
      // field, which lands hoisted in the lake but does not exist as a
      // source column), on event_id for payload-keyed sources
      val keyCols: Seq[String] =
        if (srcBatch.exists(isEnvelope))
          Seq("kafka_topic", "kafka_partition", "kafka_offset")
        else if (landed.columns.contains("event_id") &&
            src.columns.contains("event_id")) Seq("event_id")
        else Nil
      val hasKey = keyCols.nonEmpty
      val expected =
        if (hasKey) src.select(keyCols.map(col): _*).distinct().count() else nSrc
      val dup =
        if (hasKey) nLanded - landed.select(keyCols.map(col): _*).distinct().count()
        else 0L
      val status = if (nLanded == expected && dup == 0L) "OK" else "MISMATCH"
      println(s"[collector] validation: landed=$nLanded expected=$expected " +
        s"source_rows=$nSrc duplicates=$dup $status")
      if (status != "OK")
        throw new IllegalStateException(
          s"count validation failed: landed=$nLanded expected=$expected (dup=$dup)")
    }
  }
}
