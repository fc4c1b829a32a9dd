package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All operator queries live in `graft.queries.*` modules as [[Entry]] values
  * (name, Spark impl, optional DuckDB oracle SQL); this object is just the
  * aggregation point the driver harness calls.
  */
object SparkEntry {

  /** Every registered operator entry, in registration order. */
  def allEntries: Seq[Entry] =
    RelationalQueries.entries ++
      FunctionQueries.entries ++
      IngestQueries.entries ++
      TextQueries.entries ++
      DedupQueries.entries ++
      SimilarityQueries.entries ++
      MultimodalQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * M0 slice (SURVEY §7.4): events → decode JSON props → flatten → derive
    * date → dedup on (user_id, event_id) → groupBy(date, event_type) agg. */
  def entry(spark: SparkSession): DataFrame =
    IngestQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map(e => e.name -> e.q).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allEntries.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
