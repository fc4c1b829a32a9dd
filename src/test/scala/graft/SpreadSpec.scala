package graft

import org.apache.spark.sql.functions._

/** `Tables.spread` — the CONDITIONAL corpus fan-out that replaced the
  * unconditional `repartition(defaultParallelism, …)` crutch at every
  * scan site. Both arms are pinned: a single-split sf scan must fan out
  * (otherwise every per-document map runs on one core), and an input
  * already at or above session parallelism must pass through untouched
  * (otherwise a 100 TB scan pays a full shuffle of its widest columns
  * for nothing). */
class SpreadSpec extends SparkSpec {

  test("a single-split scan fans out to session parallelism on the key") {
    val docs = Tables(spark, sf001, "documents")
    assume(docs.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val out = Tables.spread(docs, col("doc_id"))
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // and the fan-out is hash-keyed, not round-robin — co-located maps
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("doc_id"), plan)
  }

  test("keyless spread round-robins a narrow input") {
    val one = spark.range(100).coalesce(1).toDF("id")
    val out = Tables.spread(one)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("an input at/above parallelism passes through IDENTICALLY (no-op)") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(1000).toDF("doc_id").repartition(target + 3)
    val out = Tables.spread(wide, col("doc_id"))
    // reference equality: spread added nothing — no exchange, no projection
    assert(out eq wide, "spread must return the input frame unchanged")
    val exact = spark.range(1000).toDF("doc_id").repartition(target)
    assert(Tables.spread(exact, col("doc_id")) eq exact,
      "exactly-at-parallelism is already spread")
  }

  test("a non-scan-rooted frame with unknown partitioning fails loudly") {
    // a broadcast join's output partitioning is the streamed scan's
    // (unknown), so the count would need execute() — whose prepare()
    // would build the broadcast exchange at planning time. The guard
    // must reject it instead of silently doing driver work.
    val docs = Tables(spark, sf001, "documents")
    val dims = spark.range(10).toDF("doc_id")
    val joined = docs.join(broadcast(dims), "doc_id")
    val e = intercept[IllegalArgumentException](Tables.spread(joined, col("doc_id")))
    assert(e.getMessage.contains("scan-rooted"), e.getMessage)
  }

  test("a declared-partitioning input is counted without building its RDD") {
    // repartition output declares its count: spread must read it off
    // outputPartitioning (no execute(), no shuffle registration) and
    // pass the frame through untouched
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(1000).toDF("doc_id").repartition(target + 3)
    assert(wide.queryExecution.sparkPlan.outputPartitioning.numPartitions == target + 3)
    assert(Tables.spread(wide, col("doc_id")) eq wide)
  }

  test("spread never runs a job to decide") {
    // planning-only partition counting: nothing in the UI/job tracker
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Tables.spread(Tables(spark, sf001, "documents"), col("doc_id"))
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "spread must not trigger a Spark job")
  }
}
