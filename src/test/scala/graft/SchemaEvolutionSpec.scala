package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.GraftConfig

/** Payload-schema evolution across incremental drains — the reference
  * versions schemas at write time (`:414-432`, `:435-465`); the streaming
  * drain's contract is (1) NEVER silently drop a payload field, in either
  * direction: a field that first appears in later-appended source files
  * must be decoded (spread-sampled inference — a head-only sample reads
  * only the oldest files), and a field the lake already landed must keep
  * decoding even when the new sample misses it (never-narrowing union);
  * (2) record the lineage in `<lake>/_schema` so readers know when a
  * mergeSchema read is needed. */
class SchemaEvolutionSpec extends SparkSpec {

  test("a field first appearing in appended files is decoded, lineage recorded") {
    val work = Files.createTempDirectory("evolve").toString
    val src = s"$work/src"
    // v1 source: 3000 rows, props {"k": n} — bulky enough that a
    // head-limit(1000) sample would see ONLY v1 rows
    spark.range(3000).select(
        col("id").as("event_id"),
        timestamp_millis(lit(1704067200000L) + col("id")).as("ts"),
        col("id").as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"),
        concat(lit("{\"k\": "), col("id"), lit("}")).as("props"))
      .coalesce(2).write.parquet(src)
    val cfg = GraftConfig(outputDir = s"$work/out", skipValidation = false)
    CollectorMain.run(spark, cfg, "file", src)
    assert(graft.sources.LakeWriter.schemaLineage(spark, s"$work/out/lake").size == 1)

    // v2 appends: a NEW field `extra` exists only in these rows
    spark.range(3000, 3600).select(
        col("id").as("event_id"),
        timestamp_millis(lit(1704067200000L) + col("id")).as("ts"),
        col("id").as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"),
        concat(lit("{\"k\": "), col("id"), lit(", \"extra\": \"x"), col("id"), lit("\"}")).as("props"))
      .coalesce(1).write.mode("append").parquet(src)
    CollectorMain.run(spark, cfg, "file", src)

    val lake = spark.read.option("mergeSchema", "true").parquet(s"$work/out/lake")
    assert(lake.count() == 3600)
    // the new field landed for exactly the new rows — not silently dropped
    assert(lake.columns.contains("extra"), s"extra missing: ${lake.columns.mkString(",")}")
    assert(lake.where(col("extra").isNotNull).count() == 600)
    // lineage recorded both versions, newest carries the new field
    val lineage = graft.sources.LakeWriter.schemaLineage(spark, s"$work/out/lake")
    assert(lineage.size == 2, lineage.map(_._2).toString)
    assert(lineage.last._3.fieldNames.contains("extra"))
  }

  test("evolution holds under the inline keeper too (skipDeduplication=false)") {
    val work = Files.createTempDirectory("evolvekeeper").toString
    val src = s"$work/src"
    spark.range(2000).select(
        col("id").as("event_id"),
        timestamp_millis(lit(1704067200000L) + col("id")).as("ts"),
        col("id").as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"),
        concat(lit("{\"k\": "), col("id"), lit("}")).as("props"))
      .coalesce(2).write.parquet(src)
    val cfg = GraftConfig(outputDir = s"$work/out",
      skipDeduplication = false, skipValidation = false)
    CollectorMain.run(spark, cfg, "file", src)

    spark.range(2000, 2400).select(
        col("id").as("event_id"),
        timestamp_millis(lit(1704067200000L) + col("id")).as("ts"),
        col("id").as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"),
        concat(lit("{\"k\": "), col("id"), lit(", \"extra\": \"x\"}")).as("props"))
      .coalesce(1).write.mode("append").parquet(src)
    CollectorMain.run(spark, cfg, "file", src)

    val lake = spark.read.option("mergeSchema", "true").parquet(s"$work/out/lake")
    assert(lake.count() == 2400)
    assert(lake.where(col("extra").isNotNull).count() == 400)
    assert(graft.sources.LakeWriter.schemaLineage(spark, s"$work/out/lake").size == 2)
  }

  test("a landed field missing from the new sample keeps decoding (never-narrowing)") {
    val work = Files.createTempDirectory("narrow").toString
    val src = s"$work/src"
    // v1: 200 rows WITH field `old_f`
    spark.range(200).select(
        col("id").as("event_id"),
        timestamp_millis(lit(1704067200000L) + col("id")).as("ts"),
        col("id").as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"),
        concat(lit("{\"k\": "), col("id"), lit(", \"old_f\": "), col("id"), lit("}")).as("props"))
      .coalesce(1).write.parquet(src)
    // validation off: this test DELETES drained source files below, so
    // landed > source-rows by design
    val cfg = GraftConfig(outputDir = s"$work/out", skipValidation = true)
    CollectorMain.run(spark, cfg, "file", src)

    // drop the drained v1 files from the SOURCE and append v2 rows whose
    // payloads lack old_f entirely — a re-drain's sample can only see v2,
    // yet a v2 row carrying a LATE old_f value must still decode; the
    // lake union supplies the field
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    spark.range(200, 400).select(
        col("id").as("event_id"),
        timestamp_millis(lit(1704067200000L) + col("id")).as("ts"),
        col("id").as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"),
        when(col("id") === 399,
            concat(lit("{\"k\": "), col("id"), lit(", \"old_f\": 777}")))
          .otherwise(concat(lit("{\"k\": "), col("id"), lit("}"))).as("props"))
      .coalesce(1).write.mode("append").parquet(src)
    // remove v1 source files so inference genuinely cannot see old_f
    val v1Files = fs.listStatus(new org.apache.hadoop.fs.Path(src))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getModificationTime).dropRight(1)
    // (keep only the newest file = the v2 append)
    v1Files.foreach(f => fs.delete(f.getPath, false))
    CollectorMain.run(spark, cfg, "file", src)

    val lake = spark.read.option("mergeSchema", "true").parquet(s"$work/out/lake")
    // the late straggler's old_f value decoded via the lake-union schema
    val straggler = lake.where(col("event_id") === 399)
      .select(col("old_f")).collect()
    assert(straggler.length == 1 && straggler.head.getLong(0) == 777L,
      straggler.mkString(","))
  }
}
