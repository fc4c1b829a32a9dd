package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.Tag

import graft.streaming.IngestPipeline

/** Live-broker integration recipe for the one runtime seam the sandbox
  * cannot exercise (no broker, no connector jar in the container): the
  * Kafka-native consume → envelope → parquet-sink path of
  * [[graft.streaming.IngestPipeline.kafkaSource]].
  *
  * Gated twice, so the default `sbt test` run stays hermetic:
  *  - `assume(SPARK_GRAFT_KAFKA is set)` — without a broker address the
  *    test CANCELS (yellow, not green: the skip is visible in the report).
  *  - tagged [[KafkaIntegrationSpec.KafkaIntegration]] so CI can select or
  *    exclude it explicitly (`sbt "Test/testOnly -- -n graft.KafkaIntegration"`).
  *
  * Recipe (README "Kafka integration"): start a broker, produce a few
  * messages on `SPARK_GRAFT_KAFKA_TOPIC` (default `graft-it`), then run
  * with the matching connector on the classpath:
  *   spark-sql-kafka-0-10_2.13 + kafka-clients + commons-pool2
  * e.g. dropped into /opt/spark/jars or via `Test/unmanagedJars`.
  * Mirrors the reference's e2e smoke (`README.md:23-28`: compose up →
  * produce → collector drains to parquet).
  */
class KafkaIntegrationSpec extends SparkSpec {
  import KafkaIntegrationSpec.KafkaIntegration

  test("kafkaSource drains a live topic to parquet with the 5-column envelope",
      KafkaIntegration) {
    val brokers = sys.env.get("SPARK_GRAFT_KAFKA")
    assume(brokers.isDefined,
      "set SPARK_GRAFT_KAFKA=host:port (and produce to SPARK_GRAFT_KAFKA_TOPIC) to run")
    val topic = sys.env.getOrElse("SPARK_GRAFT_KAFKA_TOPIC", "graft-it")
    val out = Files.createTempDirectory("kafka_it_out").toString
    val ckpt = Files.createTempDirectory("kafka_it_ckpt").toString

    val q = IngestPipeline.kafkaSource(spark, brokers.get, topic)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val drained = spark.read.parquet(out)
    assert(drained.count() > 0, s"topic $topic produced no rows — produce first")
    assert(drained.columns.toSeq.sorted == Seq("kafka_key", "kafka_offset",
      "kafka_partition", "kafka_timestamp", "kafka_topic", "value"),
      "envelope drifted from the collector contract (collector :388-399)")

    // exactly-once across a resume: a second AvailableNow pass from the
    // same checkpoint must add nothing when the topic hasn't moved
    val q2 = IngestPipeline.kafkaSource(spark, brokers.get, topic)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == drained.count(),
      "re-drain from the same checkpoint duplicated rows")
  }
}

object KafkaIntegrationSpec {
  object KafkaIntegration extends Tag("graft.KafkaIntegration")
}
