package graft

import scala.util.{Failure, Success, Try}

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.OffsetLedger
import graft.streaming.KafkaTrim
import graft.streaming.KafkaTrim.{Partition, RecordsDeleter, TrimReport}

/** Broker-free proof of the S14 trim seam: the offset arithmetic (the
  * part that deletes data) against the reference's rpk semantics
  * (`redpanda_to_parquet_collector.py:1098-1151`), with a fake deleter
  * standing in for AdminClient.deleteRecords. */
class KafkaTrimSpec extends AnyFunSuite {

  private class FakeDeleter(fail: Set[Int] = Set.empty) extends RecordsDeleter {
    var calls: List[Map[Partition, Long]] = Nil
    def deleteBefore(targets: Map[Partition, Long]): Map[Partition, Try[Long]] = {
      calls ::= targets
      targets.map { case (tp, off) =>
        tp -> (if (fail(tp.partition)) Failure(new RuntimeException("NOT_LEADER"))
        else Success(off)) // broker echoes the new log-start offset
      }
    }
  }

  test("trim points mirror rpk --up-to-offset: last processed record survives") {
    val pts = KafkaTrim.trimPoints("ticks", Map(0 -> 41L, 1 -> 0L, 2 -> 1999L))
    assert(pts === Map(
      Partition("ticks", 0) -> 41L, // deletes offsets < 41; 41 retained
      Partition("ticks", 1) -> 0L, // trims nothing (log start already 0)
      Partition("ticks", 2) -> 1999L))
  }

  test("inclusive variant reclaims the final processed record too") {
    val pts = KafkaTrim.trimPoints("ticks", Map(0 -> 41L), inclusive = true)
    assert(pts === Map(Partition("ticks", 0) -> 42L))
  }

  test("partitions that persisted nothing are never trimmed") {
    val pts = KafkaTrim.trimPoints("ticks", Map(0 -> -1L, 1 -> 7L, 2 -> -1L))
    assert(pts === Map(Partition("ticks", 1) -> 7L))
  }

  test("empty ledger is a no-op: the deleter is never called") {
    val d = new FakeDeleter
    val r = KafkaTrim.trimProcessed(d, "ticks", Map.empty)
    assert(r === TrimReport(Map.empty, Map.empty, Nil))
    assert(d.calls.isEmpty)
  }

  test("per-partition failures are reported, not thrown (reference posture)") {
    val d = new FakeDeleter(fail = Set(1))
    val r = KafkaTrim.trimProcessed(d, "ticks", Map(0 -> 10L, 1 -> 20L, 2 -> -1L))
    assert(r.trimmed === Map(Partition("ticks", 0) -> 10L))
    assert(r.failed.keySet === Set(Partition("ticks", 1)))
    assert(r.failed(Partition("ticks", 1)).contains("NOT_LEADER"))
    assert(r.skipped === Seq(2))
    assert(!r.ok)
    assert(d.calls.head === Map(
      Partition("ticks", 0) -> 10L, Partition("ticks", 1) -> 20L))
  }

  test("end-to-end with the ledger: drain, trim, and the remaining math agrees") {
    // lake says partitions persisted up to these offsets
    val ledger = Map(0 -> 99L, 1 -> 499L)
    val d = new FakeDeleter
    val r = KafkaTrim.trimProcessed(d, "ticks", ledger)
    assert(r.ok && r.trimmed.values.toSet === Set(99L, 499L))
    // after the trim, high watermarks unchanged — remaining() still counts
    // from the ledger, proving trim never touches unprocessed records
    val watermarks = Map(0 -> 150L, 1 -> 500L) // next offset to be produced
    assert(OffsetLedger.remaining(watermarks, ledger) === 50L)
  }
}
