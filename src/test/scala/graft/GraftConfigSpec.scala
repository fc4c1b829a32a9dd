package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.GraftConfig

/** The reference env-var table round-trips with the reference's defaults
  * and truthiness rules (`redpanda_to_parquet_collector.py:80-103`). */
class GraftConfigSpec extends AnyFunSuite {

  test("empty env yields the reference defaults") {
    val c = GraftConfig.fromEnv(Map.empty)
    assert(c == GraftConfig())
    assert(c.batchSize == 1000000L && c.maxWorkers == 4)
    assert(c.skipExistingCheck && c.skipDeduplication && !c.skipValidation)
    assert(c.parquetCompression == "zstd" && c.compressionLevel == 3)
    assert(c.maxMessages.isEmpty)
  }

  test("truthiness matches the python rule: {true,1,yes} case-insensitive, else false") {
    for (t <- Seq("true", "TRUE", "1", "yes", "Yes"))
      assert(GraftConfig.fromEnv(Map("SKIP_VALIDATION" -> t)).skipValidation, t)
    for (f <- Seq("false", "0", "no", "on", "y", "true ")) // trailing space: false, like python
      assert(!GraftConfig.fromEnv(Map("SKIP_VALIDATION" -> f)).skipValidation, f)
  }

  test("MAX_MESSAGES: unset and empty are None (python empty-string falsiness), set parses") {
    assert(GraftConfig.fromEnv(Map.empty).maxMessages.isEmpty)
    assert(GraftConfig.fromEnv(Map("MAX_MESSAGES" -> "")).maxMessages.isEmpty)
    assert(GraftConfig.fromEnv(Map("MAX_MESSAGES" -> "500")).maxMessages.contains(500L))
  }

  test("derived spark confs and kafka options carry the tuned values") {
    val c = GraftConfig.fromEnv(Map(
      "BOOTSTRAP_SERVERS" -> "b:9092", "PARQUET_COMPRESSION" -> "snappy",
      "FETCH_MIN_BYTES" -> "1024"))
    assert(c.sparkConfs("spark.sql.parquet.compression.codec") == "snappy")
    assert(c.kafkaOptions == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "kafka.fetch.min.bytes" -> "1024",
      "kafka.max.partition.fetch.bytes" -> "52428800"))
  }
}
