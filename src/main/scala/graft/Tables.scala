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
  * `events` needs special handling: its `ts` column is INT64
  * TIMESTAMP(NANOS) parquet, which Spark's schema converter rejects
  * outright (PARQUET_TYPE_ILLEGAL). We read it with an explicit schema as
  * LongType (legal for the same physical INT64 pages) and convert to a
  * microsecond TimestampType with integer `DIV 1000` — exact, no double
  * rounding. Supplying the schema also skips the footer-merge inference job,
  * which at 100 TB is one less full file-listing pass.
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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    case _ => spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle's view of the same parquet files. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
