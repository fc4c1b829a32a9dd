package graft

import java.nio.file.Files

import graft.ingest.GraftConfig

/** The runnable collector entry point: config-driven file-mode drain,
  * exactly-once re-run, post-run validation, and the failure posture. */
class CollectorMainSpec extends SparkSpec {

  test("file-mode collector drains, lands flattened partitions, validates, resumes") {
    val work = Files.createTempDirectory("collector").toString
    val src = s"$work/src"
    Tables(spark, sf001, "events").write.parquet(src)
    val nSrc = spark.read.parquet(src).count()
    val cfg = GraftConfig(outputDir = s"$work/out",
      skipValidation = false, skipExistingCheck = false)

    CollectorMain.run(spark, cfg, "file", src)
    val lake = spark.read.parquet(s"$work/out/lake")
    assert(lake.count() == nSrc)
    // payload decoded and hoisted: the sampled schema found props.k
    assert(lake.columns.contains("k") && lake.columns.contains("date_path"))
    assert(!lake.columns.contains("props"))

    // re-run with the same checkpoint: exactly-once (no new rows), and
    // the validation (landed == source, no duplicate event_ids) passes
    CollectorMain.run(spark, cfg, "file", src)
    assert(spark.read.parquet(s"$work/out/lake").count() == nSrc)
  }

  test("validation fails loudly when the lake disagrees with the source") {
    val work = Files.createTempDirectory("collector2").toString
    val src = s"$work/src"
    Tables(spark, sf001, "events").write.parquet(src)
    val cfg = GraftConfig(outputDir = s"$work/out", skipValidation = false)
    CollectorMain.run(spark, cfg, "file", src)
    // shrink the source after the drain: landed > source now
    Tables(spark, sf001, "events").limit(10).write
      .mode("overwrite").parquet(src)
    val e = intercept[IllegalStateException] {
      CollectorMain.run(spark, cfg, "file", src)
    }
    assert(e.getMessage.contains("count validation failed"))
  }

  test("source-borne duplicates dedup in BOTH modes (inline and deferred)") {
    // the reference's SKIP_DEDUPLICATION is WHEN dedup happens, not IF —
    // either mode must land exactly the distinct events and validate OK
    for (deferred <- Seq(true, false)) {
      val work = Files.createTempDirectory(s"collector3$deferred").toString
      val src = s"$work/src"
      val ev = Tables(spark, sf001, "events").limit(50)
      ev.unionAll(ev).write.parquet(src) // every event_id delivered twice
      val cfg = GraftConfig(outputDir = s"$work/out",
        skipValidation = false, skipDeduplication = deferred)
      CollectorMain.run(spark, cfg, "file", src)
      val lake = spark.read.parquet(s"$work/out/lake")
      assert(lake.count() == 50, s"deferred=$deferred")
      assert(lake.select("event_id").distinct().count() == 50, s"deferred=$deferred")
      assert(lake.columns.contains("date_path"), "deferred rewrite keeps the partitioning")
    }
  }

  test("kafka mode refuses without a broker; bad mode refuses") {
    val cfg = GraftConfig()
    assert(intercept[IllegalStateException] {
      CollectorMain.run(spark, cfg, "kafka", "")
    }.getMessage.contains("live broker"))
    intercept[IllegalArgumentException] {
      CollectorMain.run(spark, cfg, "nope", "")
    }
  }
}
