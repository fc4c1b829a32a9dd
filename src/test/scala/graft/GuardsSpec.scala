package graft

import org.apache.spark.sql.functions._

import graft.functions.Guards

/** The checked forced-broadcast contract (functions.Guards): a frame
  * inside the bound broadcasts (the hint survives into the plan), a
  * frame OVER the bound aborts loudly at build time with both numbers —
  * the failure mode that replaces an executor OOM at scale. */
class GuardsSpec extends SparkSpec {
  import spark.implicits._

  test("within the bound: the hint survives and the join plans as broadcast") {
    val big = (1L to 1000L).toDF("k")
    val small = (1L to 50L).map(k => (k, s"v$k")).toDF("k", "v")
    val joined = big.join(Guards.boundedBroadcast(small, "test dim", maxRows = 100), "k")
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "bounded frame should still plan a broadcast join")
    assert(joined.count() == 50)
  }

  test("over the bound: fails loudly naming the frame and both counts") {
    val oversized = (1L to 500L).toDF("k")
    val e = intercept[IllegalArgumentException] {
      Guards.boundedBroadcast(oversized, "oversized eval suite", maxRows = 100)
    }
    assert(e.getMessage.contains("oversized eval suite"))
    assert(e.getMessage.contains("500"))
    assert(e.getMessage.contains("100"))
  }

  test("the gate queries run under the default bound at sf0.001") {
    // both decontamination queries build their eval side through the
    // guard — a run proves the %20 slice sits inside MaxBroadcastRows
    // at test scale (the bound's purpose is the 100 TB corpus change)
    assert(SparkEntry.queries("q_decontaminate")(spark, sf001).count() >= 0)
    assert(SparkEntry.queries("q_semantic_decontaminate")(spark, sf001).count() >= 0)
    graft.functions.Checkpoints.releaseAll()
    spark.catalog.clearCache()
  }
}
