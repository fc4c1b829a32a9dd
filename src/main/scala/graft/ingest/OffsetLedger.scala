package graft.ingest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Incremental-resume offset ledger.
  *
  * The reference stores NO consumer-group state (unique UUID group per run,
  * `enable.auto.commit=False`, `app/redpanda_to_parquet_collector.py:105-107,
  * 328-331`); resume position is derived by scanning the lake for
  * `max(kafka_offset)` per `kafka_partition` (`:468-530`). Here that is a
  * projected parquet scan (two columns — column pruning reaches the reader)
  * plus a groupBy-max, whose shuffle is tiny (one row per Kafka partition).
  *
  * At 100 TB the scan cost is bounded by parquet footer stats: with
  * `filter(col >= x)` pushdown plus the small projection, Spark reads only
  * the offset/partition columns' pages; the idiomatic alternative (noted in
  * SURVEY §2.8) is a Structured Streaming checkpoint, implemented in
  * `graft.streaming.IngestPipeline`.
  */
object OffsetLedger {

  /** One row per partition: the highest offset persisted (A1). */
  def maxOffsets(lake: DataFrame,
                 partCol: String = "kafka_partition",
                 offCol: String = "kafka_offset"): DataFrame =
    lake.select(col(partCol), col(offCol)) // projection → parquet column pruning
      .groupBy(col(partCol))
      .agg(max(col(offCol)).as("max_offset"))

  /** Kafka `startingOffsets` JSON for a resume run: next offset = max + 1;
    * partitions never seen start at -2 (= "earliest"). */
  def startingOffsetsJson(topic: String, ledger: Map[Int, Long],
                          allPartitions: Seq[Int]): String = {
    val entries = allPartitions.sorted.map { p =>
      val next = ledger.get(p).map(_ + 1).getOrElse(-2L)
      s""""$p":$next"""
    }
    s"""{"$topic":{${entries.mkString(",")}}}"""
  }

  /** Driver-side collect of the (small) ledger. */
  def collectLedger(lake: DataFrame, partCol: String = "kafka_partition",
                    offCol: String = "kafka_offset"): Map[Int, Long] =
    maxOffsets(lake, partCol, offCol).collect().map { r: Row =>
      r.getAs[Number](0).intValue() -> r.getAs[Number](1).longValue()
    }.toMap

  /** Messages still to drain: Σ max(0, highWatermark − (current+1))
    * (reference `:1181-1184`; watermark is the NEXT offset to be produced). */
  def remaining(watermarks: Map[Int, Long], ledger: Map[Int, Long]): Long =
    watermarks.map { case (p, hw) =>
      math.max(0L, hw - (ledger.getOrElse(p, -1L) + 1))
    }.sum
}
