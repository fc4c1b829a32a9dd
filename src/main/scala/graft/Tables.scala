package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated testdata lake (see `TESTDATA.md`).
  *
  * In the reference, table discovery is an `os.walk` over the lake directory
  * (`app/redpanda_to_parquet_collector.py:476-488`,
  * `app/parquet_to_polars.py:544-574`); here the lake is flat
  * `<sfDir>/<name>.parquet` and Spark's Parquet source provides footer-driven
  * schema, column pruning and row-group predicate pushdown for free.
  *
  * `events` needs special handling: the driver has shipped its `ts` column
  * in two encodings across testdata generations — INT64 TIMESTAMP(NANOS)
  * (which Spark's schema converter rejects outright, PARQUET_TYPE_ILLEGAL)
  * and plain TIMESTAMP(MICROS) (which Spark reads as TIMESTAMP_NTZ). We
  * sniff the footer's TIMESTAMP logical-type ANNOTATION once per lake
  * directory (a driver-side footer read via parquet-hadoop, no data scan —
  * never inferred from Spark's converted type, and failing loudly when the
  * annotation is absent), then read the
  * physical INT64 pages with an explicit LongType schema and convert to a
  * microsecond TimestampType with integer arithmetic (`DIV 1000` only for
  * the nanos generation) — exact, no double rounding, and one
  * session-TZ-independent type (the session is pinned UTC everywhere)
  * instead of a mixed NTZ/TZ comparison surface. Supplying the schema also
  * skips the footer-merge inference job, which at 100 TB is one less full
  * file-listing pass per query.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events read schema: ns-timestamp as raw Long (see above). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Footer-declared `ts` TIMESTAMP unit per lake dir ("NANOS" | "MICROS" |
    * "MILLIS"), read straight from the parquet logical-type annotation —
    * NOT inferred from Spark's converted type, which would silently treat a
    * plain unannotated INT64 (a plausible third testdata generation) as
    * nanos and divide valid timestamps by 1000. An absent or non-TIMESTAMP
    * annotation fails loudly instead of guessing. Cached: the sniff is a
    * one-footer read, but there is no reason to repeat it for every query
    * in a 150-query bench run. */
  private val eventsTsUnit = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def sniffTsUnit(spark: SparkSession, dir: String): String = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(s"$dir/events.parquet")
    val fs = root.getFileSystem(conf)
    // a sink may have written events.parquet as a part-file directory —
    // possibly PARTITIONED (only `key=value/` subdirs at the top level,
    // e.g. this repo's own date-partitioned sink), so walk recursively
    // and fail loudly when no footer exists instead of `empty.minBy`
    def firstParquet(p: Path): Option[Path] = {
      val entries = fs.listStatus(p) // Hadoop hidden convention: '_' AND '.' (.spark-staging-*)
        .filter(st => !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
        .sortBy(_.getPath.getName)
      entries.collectFirst {
        case s if !s.isDirectory && s.getPath.getName.endsWith(".parquet") => s.getPath
      }.orElse(entries.filter(_.isDirectory).iterator
        .map(s => firstParquet(s.getPath)).collectFirst { case Some(f) => f })
    }
    val file =
      if (fs.getFileStatus(root).isDirectory)
        firstParquet(root).getOrElse(sys.error(
          s"no parquet part files found under $root — cannot sniff the " +
            "events.ts timestamp unit from an empty or non-parquet directory"))
      else root
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFileMetaData.getSchema
      val annotation = schema.getType(schema.getFieldIndex("ts"))
        .asPrimitiveType().getLogicalTypeAnnotation
      annotation match {
        case ts: TimestampLogicalTypeAnnotation => ts.getUnit.name
        case other => sys.error(
          s"events.ts at $file carries no TIMESTAMP logical annotation " +
            s"(found: $other) — refusing to guess the epoch unit; annotate " +
            "the column or extend Tables.sniffTsUnit for the new generation")
      }
    } finally reader.close()
  }

  /** Resolved-relation cache, per (session, lake dir, table). A plain
    * `spark.read.parquet` pays a driver-side file listing plus a footer
    * schema-inference read on EVERY call — a fixed ~10-100 ms tax each of
    * the 167 bench/verify queries repaid up to several times per query.
    * The returned DataFrame is an immutable logical plan over a resolved
    * `InMemoryFileIndex`, so reusing it across queries changes no
    * semantics (and `clearCache` between queries doesn't touch it — it is
    * a plan, not cached data). Keyed on the session so tests, Bench and
    * Verify sessions never share relations; the strong session reference
    * is bounded by the handful of sessions a JVM ever creates here. The
    * trade, stated: a table REWRITTEN in place mid-session keeps serving
    * the old file list — call [[invalidate]] after in-place rewrites
    * (LakeWriterSpec's rewrite path does its own fresh reads). */
  private val relations = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  /** Drop cached relations (all, or one lake dir) — required after
    * rewriting files under a dir this session already read. */
  def invalidate(dir: Option[String] = None): Unit = dir match {
    case None    => relations.clear()
    case Some(d) => relations.keySet.removeIf(_._2 == d)
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    relations.computeIfAbsent((spark, dir, name), _ => name match {
      case "events" =>
        val toMicros = eventsTsUnit.computeIfAbsent(dir, _ => sniffTsUnit(spark, dir)) match {
          case "NANOS"  => expr("timestamp_micros(ts DIV 1000)") // INT64 pages hold epoch-ns
          case "MICROS" => expr("timestamp_micros(ts)")          // INT64 pages hold epoch-µs
          case "MILLIS" => expr("timestamp_millis(ts)")          // INT64 pages hold epoch-ms
          case u        => sys.error(s"events.ts TIMESTAMP($u): unsupported unit")
        }
        spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
          .withColumn("ts", toMicros)
      case _ => spark.read.parquet(s"$dir/$name.parquet")
    })

  /** Conditional corpus spread — replaces the former UNCONDITIONAL
    * `repartition(defaultParallelism, keys…)` at every corpus-scan site.
    * The sf testdata is a single parquet file, so a raw scan yields a
    * handful of input splits and every per-document map (shingling,
    * regex passes, vector hashing) would run on one core; at production
    * scale the same scan already yields thousands of splits and the
    * unconditional repartition becomes a full shuffle of the widest
    * columns in the lake (text/embedding) ahead of aggregates that
    * would shuffle only their reduced frames — pure wasted I/O. So:
    * count the incoming plan's partitions and repartition ONLY when the
    * scan under-fills the session parallelism; a plan already at or
    * above it passes through untouched (SpreadSpec pins both arms).
    *
    * The count comes from the PRE-adaptive physical plan
    * (`queryExecution.sparkPlan`): building its RDD lineage is
    * driver-side planning only — no job runs, and no AQE stage
    * materialization can trigger. Call it where the old crutch sat: on
    * scan-rooted (scan + narrow maps) frames. */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // the partition count must come WITHOUT running plan fragments: when
    // the plan declares its partitioning (an already-repartitioned /
    // bucketed input), read the count off outputPartitioning — zero RDD
    // construction. Only the UnknownPartitioning case falls back to
    // execute(), and THAT path now guards the scan-rooted contract
    // instead of trusting the comment: SparkPlan.execute() runs
    // prepare(), which submits subquery jobs — and on the PRE-
    // EnsureRequirements sparkPlan a join's build side has no exchange
    // at all, so execute() outright throws doExecuteBroadcast. The
    // guard is logical (exchanges only appear physically later): every
    // node must be a leaf or a narrow map, with no subquery
    // expressions. Misuse fails loudly instead of executing fragments.
    val plan = df.queryExecution.sparkPlan
    val declared = plan.outputPartitioning.numPartitions
    val parts =
      if (declared > 0) declared
      else {
        import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LeafNode, Project}
        val logical = df.queryExecution.optimizedPlan
        val offending = logical.exists {
          case _: LeafNode | _: Project | _: Filter | _: Generate => false
          case _ => true
        } || logical.exists(_.expressions.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression])))
        require(!offending,
          "Tables.spread requires a scan-rooted frame (scan + narrow maps only); " +
            s"got:\n${logical.treeString}")
        plan.execute().getNumPartitions
      }
    if (parts >= target) df
    else if (keys.isEmpty) df.repartition(target)
    else df.repartition(target, keys: _*)
  }

  /** Ingest-order EIGHTH bucketing shared by the drift monitors
    * (`q_mixture_drift`, `q_emb_norm_drift`): adds an `eighth` column
    * `id·8 DIV (max(id)+1)` ∈ 0..7 — the cross-multiplied integer form
    * both DuckDB oracles replay verbatim, kept in ONE place so the
    * constant and the DIV shape cannot drift between the twins. The
    * 1-row max aggregate broadcasts; the scan it reads is column-pruned
    * to the id. */
  def withIngestEighth(df: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, expr, max}
    val m = df.agg((max(col(idCol)) + 1).as("_mm"))
    df.crossJoin(broadcast(m))
      .withColumn("eighth", expr(s"$idCol*8 DIV _mm"))
      .drop("_mm")
  }

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle's view of the same parquet files. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
