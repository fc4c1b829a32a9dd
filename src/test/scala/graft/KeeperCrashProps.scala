package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.streaming.{IdBloom, IngestPipeline}

/** Randomized crash-point search over the inline keeper's batch protocol
  * (started marker → append → bloom generation → sizing ledger → prune →
  * done marker): the hand-chosen crash states in KeeperGuardSpec pin the
  * windows we THOUGHT of — the round-13 "merge the whole batch's keys"
  * bloom bug, and the round-14 torn gen/sizing geometry wedge, are
  * exactly the class a random kill-step search finds first.
  *
  * Each case drains two overlapping batches, killing each attempt at a
  * GENERATED protocol step (up to two crashes per batch, including
  * crashes DURING a crash replay) via the [[IngestPipeline
  * .keeperStepHook]] seam, then replays clean and asserts the protocol's
  * three contracts:
  *  - NO LOSS:      every key of both batches is in the lake;
  *  - NO DUPS:      exactly once, and a full-redelivery batch admits 0;
  *  - LEDGER EXACT: the `_sizing` count equals the landed key count.
  *
  * The tiny bloom capacity (16) makes the first build ESCALATE its
  * geometry past the ledger default (4×cnt > 16), so crash points
  * around the generation write reconstruct the torn gen/sizing pair and
  * exercise [[IdBloom.mergeOrRebuild]]'s heal path organically. */
object KeeperCrashProps extends Properties("graft.keepercrash") {

  // ≥100 cases (the verdict's bar); raise locally with
  // SPARK_GRAFT_CRASH_CASES for a deeper one-off search
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(
      sys.env.getOrElse("SPARK_GRAFT_CRASH_CASES", "100").toInt)

  private lazy val spark = { val s = SparkSpec.session
    s.sparkContext.setLogLevel("WARN"); s }
  private lazy val fs = org.apache.hadoop.fs.FileSystem
    .get(spark.sparkContext.hadoopConfiguration)

  private val payloadSchema = StructType(Seq(StructField("k", LongType)))

  private final class InjectedCrash(step: String)
    extends RuntimeException(s"injected crash at $step")

  /** A minimal events-shaped batch: one row per key, key-derived ts and
    * JSON props (the decode/flatten path runs for real, cheaply). */
  private def batchDf(keys: Seq[Long]): DataFrame = {
    import spark.implicits._
    keys.map(k => (k, new Timestamp(1700000000000L + k * 1000), s"""{"k":$k}"""))
      .toDF("event_id", "ts", "props")
  }

  private def runBatch(dest: String, ckpt: String, batchId: Long,
                       keys: Seq[Long], crashes: Seq[String]): Unit = {
    def call(): Unit = IngestPipeline.keeperBatch(spark, batchDf(keys), batchId,
      payloadSchema, dest, ckpt, "zstd", Seq("event_id"), "ts", 16L, 0.01)
    crashes.foreach { step =>
      var fired = false
      IngestPipeline.keeperStepHook = (d, s) =>
        if (d == dest && s == step && !fired) { fired = true; throw new InjectedCrash(step) }
      try {
        try call()
        catch { case _: InjectedCrash => () } // the planned kill
      } finally IngestPipeline.keeperStepHook = (_, _) => ()
      // if the step never fired the batch simply completed — the
      // remaining crash plan degenerates to no-op replays, which is
      // itself a contract worth executing
    }
    call() // the clean (or no-op) final attempt
  }

  private val stepGen: Gen[String] = Gen.oneOf(
    "started", "appended", "gen-written", "sizing-written", "pruned")
  // 0..2 crashes per batch: two crashes make the SECOND kill land inside
  // a crash REPLAY, the regime where the r13 bloom-merge bug hid
  private val crashesGen: Gen[List[String]] =
    Gen.choose(0, 2).flatMap(n => Gen.listOfN(n, stepGen))

  // forAllNoShrink: a shrink pass re-executes the (expensive, Spark-job
  // heavy) property hundreds of times; the original schedules ARE the
  // diagnosis
  property("two overlapping batches converge under any crash schedule") =
    Prop.forAllNoShrink(crashesGen, crashesGen, crashesGen) { (c0, c1, cr) =>
      val work = Files.createTempDirectory("keepercrashprop").toString
      val dest = s"$work/lake"; val ckpt = s"$work/ckpt"
      try {
        // batch 0: keys 0..10 (11 keys ≥ 8 forces the first build to
        // escalate geometry past items=16 — the torn-pair regime);
        // batch 1: keys 6..15 (5 redelivered + 5 new)
        runBatch(dest, ckpt, 0, 0L to 10L, c0)
        runBatch(dest, ckpt, 1, 6L to 15L, c1)
        // full-redelivery batch: every key again, crash schedule applied
        // to the no-admission path too
        runBatch(dest, ckpt, 2, 0L to 15L, cr)

        val lake = spark.read.parquet(dest)
        val n = lake.count()
        val nd = lake.select("event_id").distinct().count()
        val sizing = IdBloom.readSizing(fs, dest)
        val sizingOk = sizing.exists(_.count == 16L)
        val label = s"schedule=($c0|$c1|$cr) n=$n distinct=$nd sizing=$sizing"
        Prop(n == 16L && nd == 16L && sizingOk) :| label
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
      }
    }
}
