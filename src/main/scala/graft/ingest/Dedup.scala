package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication primitives mirroring the reference's two dedup families:
  *
  *  1. key anti-join dedup — drop records already persisted in the lake,
  *     keyed on `(kafka_partition, kafka_offset)`
  *     (`app/redpanda_to_parquet_collector.py:741-748` inline,
  *     `:1003-1010` deferred merge);
  *  2. content-hash dedup — hash all non-metadata columns and keep one row
  *     per hash (`app/parquet_to_polars.py:596-618`, `:682`).
  *
  * Scale notes: the anti-join shuffles both sides on the key unless the
  * existing-key projection is small enough to broadcast — callers pass
  * `broadcastExisting = true` when the ledger side is a bounded key list
  * (offsets per partition), which is the common case even at 100 TB because
  * we only ship the two key columns, not the rows. Content dedup is a
  * hash-partitioned `dropDuplicates` (map-side partial dedup happens via
  * partial aggregation); the deterministic variant uses a window and is
  * reserved for oracle-compared queries.
  */
object Dedup {

  /** Rows of `incoming` whose key is NOT present in `existing` (J1/J2). */
  def antiJoinNew(incoming: DataFrame, existing: DataFrame, keys: Seq[String],
                  broadcastExisting: Boolean = false): DataFrame = {
    val keyProj0 = existing.select(keys.map(col): _*).dropDuplicates(keys)
    val keyProj = if (broadcastExisting) broadcast(keyProj0) else keyProj0
    incoming.join(keyProj, keys, "left_anti")
  }

  /** Add `_content_hash` over every column not matching `exclude`
    * (reference excludes `kafka_*`). xxhash64 replaces Polars' struct hash —
    * same contract (stable 64-bit content key), different bits. */
  def withContentHash(df: DataFrame, exclude: String => Boolean = _.startsWith("kafka_")): DataFrame = {
    val cols = df.columns.filterNot(exclude).sorted.map(col)
    df.withColumn("_content_hash", xxhash64(cols.toIndexedSeq: _*))
  }

  /** Non-deterministic-survivor content dedup (Polars `unique(keep="first")`
    * on unordered data is the same contract, `R:682`). */
  def dedupByContent(df: DataFrame, exclude: String => Boolean = _.startsWith("kafka_")): DataFrame =
    withContentHash(df, exclude).dropDuplicates("_content_hash").drop("_content_hash")

  /** Deterministic keep-first: one row per key, survivor = min(orderCol).
    * Used where results must be oracle-comparable. */
  def dedupKeepFirst(df: DataFrame, keys: Seq[Column], order: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order.asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}
