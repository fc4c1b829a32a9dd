package graft

import org.apache.spark.sql.functions._

import graft.functions.{Checkpoints, Ranking}

/** The [[graft.functions.Checkpoints]] registry contract: releaseAll
  * actually drops the checkpoint blocks a Ranking-backed plan pinned
  * (clearCache alone cannot — they are RDD-level, not catalog cache),
  * and a REBUILT query after release produces identical results (the
  * harness contract: re-running means re-building, never re-saving a
  * stale plan object). */
class CheckpointsSpec extends SparkSpec {

  private def build() = Ranking.withGlobalRowNumber(
    Tables(spark, sf001, "documents").select(col("doc_id")),
    col("doc_id"), primaryAsc = true, Seq(col("doc_id")), "rn")

  test("releaseAll drops the pinned blocks and rebuilt queries are unaffected") {
    val a = build().orderBy(col("rn")).collect() // materializes the pinned checkpoint
    val before = spark.sparkContext.getPersistentRDDs.size
    assert(before > 0, "the ranking input checkpoint should be pinned")
    Checkpoints.releaseAll()
    // unpersist is non-blocking — poll for the drop
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.sparkContext.getPersistentRDDs.size >= before &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.size < before,
      s"releaseAll left all $before persistent RDDs in place")
    // a fresh build registers (and materializes) a fresh checkpoint
    val b = build().orderBy(col("rn")).collect()
    assert(a.toSeq == b.toSeq, "rebuild after release changed the result")
    Checkpoints.releaseAll()
  }
}
