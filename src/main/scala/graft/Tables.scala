package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * sniff the footer-declared type once per lake directory (a driver-side
  * footer read, no data scan; the NANOS generation surfaces as the
  * inference throwing PARQUET_TYPE_ILLEGAL, which we catch), then read the
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

  /** Footer-declared `ts` unit per lake dir; true = epoch-nanos (needs the
    * DIV 1000). Cached: the sniff is a one-file footer read, but there is no
    * reason to repeat it for every query in a 150-query bench run. */
  private val eventsTsIsNanos = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      val nanos = eventsTsIsNanos.computeIfAbsent(dir, _ =>
        try spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == LongType
        catch { // TIMESTAMP(NANOS) footers fail schema conversion outright
          case e: Exception if e.getMessage != null && e.getMessage.contains("Illegal Parquet type") => true
        })
      val toMicros =
        if (nanos) expr("timestamp_micros(ts DIV 1000)") // INT64 nanos
        else expr("timestamp_micros(ts)") // TIMESTAMP(MICROS): INT64 pages hold epoch-µs
      spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
        .withColumn("ts", toMicros)
    case _ => spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle's view of the same parquet files. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
