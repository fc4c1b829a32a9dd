package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata lake (see `TESTDATA.md`).
  *
  * In the reference, table discovery is an `os.walk` over the lake directory
  * (`app/redpanda_to_parquet_collector.py:476-488`,
  * `app/parquet_to_polars.py:544-574`); here the lake is flat
  * `<sfDir>/<name>.parquet` and Spark's Parquet source provides footer-driven
  * schema, column pruning and row-group predicate pushdown for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` mirrors the DuckDB
    * oracle's view of the same parquet files. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
