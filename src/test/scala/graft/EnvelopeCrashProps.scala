package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.streaming.{IdBloom, IngestPipeline}

/** KeeperCrashProps' randomized kill-step search, re-run over the
  * ENVELOPE keeper configuration: the decode override
  * ([[IngestPipeline.decodeEnvelope]] — native msgpack inside the batch),
  * the 3-column message-identity key (topic, partition, offset), and the
  * broker timestamp as keeper order. The crash-replay path reads the
  * lake with the batch's own key schema; a 3-column key exercises the
  * multi-column `xxhash64` guard hash and anti-join where the events
  * search only covers a single key. Contracts are identical: no loss,
  * no duplicate identities, exact sizing ledger. */
object EnvelopeCrashProps extends Properties("graft.envelopecrash") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.getOrElse("SPARK_GRAFT_ENV_CRASH_CASES", "40").toInt)

  private lazy val spark = { val s = SparkSpec.session
    s.sparkContext.setLogLevel("WARN"); s }
  private lazy val fs = org.apache.hadoop.fs.FileSystem
    .get(spark.sparkContext.hadoopConfiguration)

  private val payloadSchema = StructType(Seq(StructField("k", LongType)))
  private val envSchema = StructType(Seq(
    StructField("kafka_topic", StringType),
    StructField("kafka_partition", LongType),
    StructField("kafka_offset", LongType),
    StructField("kafka_timestamp", TimestampType),
    StructField("kafka_key", StringType),
    StructField("value", BinaryType)))
  private val keys = Seq("kafka_topic", "kafka_partition", "kafka_offset")

  private final class InjectedCrash(step: String)
    extends RuntimeException(s"injected crash at $step")

  /** One msgpack message per identity: offset k on partition k % 2. */
  private def batchDf(ids: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.Row
    val rows = ids.map { k =>
      Row("ticks", k % 2, k, new Timestamp(1700000000000L + k * 1000), s"k$k",
        graft.functions.Msgpack.encodeFlatJson(s"""{"k": $k}"""))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), envSchema)
  }

  private val decode: DataFrame => DataFrame =
    IngestPipeline.decodeEnvelope(_, Map("ticks" -> "msgpack"), payloadSchema)

  private def runBatch(dest: String, ckpt: String, batchId: Long,
                       ids: Seq[Long], crashes: Seq[String]): Unit = {
    def call(): Unit = IngestPipeline.keeperBatch(spark, batchDf(ids), batchId,
      payloadSchema, dest, ckpt, "zstd", keys, "kafka_timestamp", 16L, 0.01,
      Some(decode))
    crashes.foreach { step =>
      var fired = false
      IngestPipeline.keeperStepHook = (d, s) =>
        if (d == dest && s == step && !fired) { fired = true; throw new InjectedCrash(step) }
      try {
        try call()
        catch { case _: InjectedCrash => () }
      } finally IngestPipeline.keeperStepHook = (_, _) => ()
    }
    call()
  }

  private val stepGen: Gen[String] = Gen.oneOf(
    "started", "appended", "gen-written", "sizing-written", "pruned")
  private val crashesGen: Gen[List[String]] =
    Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, stepGen))

  property("envelope keeper converges under any crash schedule") =
    Prop.forAllNoShrink(crashesGen, crashesGen, crashesGen) { (c0, c1, cr) =>
      val work = Files.createTempDirectory("envelopecrashprop").toString
      val dest = s"$work/lake"; val ckpt = s"$work/ckpt"
      try {
        runBatch(dest, ckpt, 0, 0L to 10L, c0)
        runBatch(dest, ckpt, 1, 6L to 15L, c1)
        runBatch(dest, ckpt, 2, 0L to 15L, cr) // full redelivery
        val lake = spark.read.parquet(dest)
        val n = lake.count()
        val nd = lake.select(keys.head, keys.tail: _*).distinct().count()
        val decoded = lake.where(org.apache.spark.sql.functions.col("k").isNotNull).count()
        val sizing = IdBloom.readSizing(fs, dest)
        val sizingOk = sizing.exists(_.count == 16L)
        val label = s"schedule=($c0|$c1|$cr) n=$n distinct=$nd decoded=$decoded sizing=$sizing"
        Prop(n == 16L && nd == 16L && decoded == 16L && sizingOk) :| label
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
      }
    }
}
