package graft.streaming

import scala.util.Try

/** S14 — Kafka log trim after a successful drain+validate run
  * (reference: `redpanda_to_parquet_collector.py:1098-1151`, which shells
  * out to `rpk topic trim --up-to-offset <maxOffset> --partitions <p>`
  * per partition).
  *
  * The OFFSET ARITHMETIC is the part that deletes data, so it lives here
  * as a pure function, unit-testable without a broker; the broker call is
  * behind the [[RecordsDeleter]] seam. `rpk topic trim --up-to-offset X`
  * advances the log start offset to X — records with offset < X are
  * deleted and X itself SURVIVES. The proper client API is identical:
  *
  * {{{
  * // the production binding, verbatim (kafka-clients):
  * //   val admin = AdminClient.create(props)
  * //   val req = targets.map { case (tp, off) =>
  * //     new TopicPartition(tp.topic, tp.partition) ->
  * //       RecordsToDelete.beforeOffset(off)
  * //   }
  * //   admin.deleteRecords(req.asJava).lowWatermarks() // per-partition futures
  * }}}
  *
  * Reference parity note: the reference passes the highest PROCESSED
  * offset as the trim point, so the final processed record of every
  * partition is retained (one redundant record per partition on the next
  * run — harmless under the pipeline's anti-join dedup, and a deliberate
  * safety margin against an off-by-one deleting unprocessed data).
  * `inclusive = true` reclaims that last record too (trim point
  * maxOffset + 1); the default mirrors the reference.
  */
object KafkaTrim {

  /** Minimal partition address — deliberately our own type so the module
    * compiles and tests without kafka-clients on the classpath; the
    * production adapter maps it 1:1 to `org.apache.kafka.common
    * .TopicPartition`. */
  final case class Partition(topic: String, partition: Int)

  /** The broker seam: delete everything below `beforeOffset` per
    * partition, returning the new log-start (low-watermark) offset or the
    * failure, per partition — the exact shape of
    * `AdminClient.deleteRecords(...).lowWatermarks()`. */
  trait RecordsDeleter {
    def deleteBefore(targets: Map[Partition, Long]): Map[Partition, Try[Long]]
  }

  /** Per-partition trim points from the offset ledger
    * ([[graft.ingest.OffsetLedger]]'s `(partition → max persisted
    * offset)` map): partitions that persisted nothing (offset < 0) are
    * never trimmed (`:1125` — "only trim if we have valid offsets").
    * Default `inclusive = false` retains the last processed record, the
    * reference's exact behavior. */
  def trimPoints(topic: String, ledger: Map[Int, Long],
                 inclusive: Boolean = false): Map[Partition, Long] =
    ledger.collect {
      case (p, maxOff) if maxOff >= 0L =>
        Partition(topic, p) -> (if (inclusive) maxOff + 1 else maxOff)
    }

  /** Result of a trim run: partitions trimmed (with their new log-start
    * offsets), partitions that failed (with the error message), and
    * partitions skipped for having no valid offset. */
  final case class TrimReport(trimmed: Map[Partition, Long],
                              failed: Map[Partition, String],
                              skipped: Seq[Int]) {
    def ok: Boolean = failed.isEmpty
  }

  /** Trim `topic` up to the ledger's processed offsets via `deleter`.
    * Mirrors the reference's error posture (`:1133-1141`): per-partition
    * failures are REPORTED, never thrown — a failed trim leaves extra
    * retained log, not data loss, so the run itself still succeeds. */
  def trimProcessed(deleter: RecordsDeleter, topic: String,
                    ledger: Map[Int, Long],
                    inclusive: Boolean = false): TrimReport = {
    val targets = trimPoints(topic, ledger, inclusive)
    val skipped = ledger.collect { case (p, off) if off < 0L => p }.toSeq.sorted
    if (targets.isEmpty) TrimReport(Map.empty, Map.empty, skipped)
    else {
      val results = deleter.deleteBefore(targets)
      TrimReport(
        trimmed = results.collect { case (tp, scala.util.Success(lw)) => tp -> lw },
        failed = results.collect { case (tp, scala.util.Failure(e)) =>
          tp -> Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
        },
        skipped = skipped)
    }
  }
}
