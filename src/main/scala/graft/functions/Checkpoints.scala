package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{GraftExpressionBridge => Bridge}

/** RDD-level lifecycle for localCheckpoint'ed frames.
  *
  * The trap this module exists for: `Dataset.unpersist` goes through the
  * CacheManager, which only knows CATALOG-cached plans (`persist()`),
  * and is a silent NO-OP for the RDD-level blocks a `localCheckpoint`
  * pins — as is `spark.catalog.clearCache`. Without an `RDD.unpersist`
  * on the checkpoint's own `LogicalRDD.rdd`, every checkpointed frame
  * lives for the session and repeated query runs accumulate storage
  * (CheckpointsSpec proves both the leak and the fix).
  *
  * Two lifecycles:
  *  - [[releaseNow]] — immediate drop, for iteration-internal frames
  *    whose successor has already materialized ([[KMeans.fit]],
  *    [[BpeVocab.fit]], [[ConnectedComponents]] round state; the
  *    unpersist-after-child-materializes ordering those modules document
  *    is load-bearing here);
  *  - the REGISTRY ([[lazyLocal]] / [[register]] + [[releaseAll]]) — for
  *    frames a returned query PLAN retains past its builder (Ranking
  *    inputs, vocab frequency frames, fitted k-means outputs). The
  *    harness (Bench / Verify / Explain — any loop that fully
  *    materializes one query before building the next) calls
  *    [[releaseAll]] between queries. Releasing is safe exactly because
  *    materialization precedes it: a localCheckpoint's lineage is
  *    truncated, so a released frame must never be re-materialized —
  *    re-running a query means re-BUILDING it (registering fresh
  *    checkpoints), never re-saving a stale plan object.
  */
object Checkpoints {

  private val pinned = ArrayBuffer.empty[RDD[_]]

  /** Register an already-checkpointed frame's blocks for the next
    * [[releaseAll]]; returns the frame. */
  def register(df: DataFrame): DataFrame = synchronized {
    pinned ++= Bridge.checkpointRdds(df)
    df
  }

  /** Lazily localCheckpoint `df` and register it.
    *
    * Storage is MEMORY_AND_DISK_SER, not the deserialized default: the
    * checkpointed frames here are row-count-proportional intermediates
    * (tf aggregates, scored ANN pairs, graph round state), and
    * deserialized UnsafeRow storage pays ~16-24 bytes of object header
    * per row — at the sf100 gate the q_retrieval_eval tf frame
    * (~5×10⁸ rows) OOM'd a 16 GiB executor on headers alone.
    * Serialized blocks store one byte array per partition, unroll
    * incrementally, and degrade to disk instead of dying; the re-read
    * cost on UnsafeRows is a memcpy, not real deserialization. */
  def lazyLocal(df: DataFrame): DataFrame =
    register(df.localCheckpoint(eager = false,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))

  /** Immediately drop the checkpoint blocks under `df` (non-blocking).
    * Only call after every consumer of the frame has materialized.
    *
    * Contract: pass the CHECKPOINTED FRAME ITSELF, not a plan derived
    * from it — this collects every `LogicalRDD` leaf of the plan, so a
    * derived frame that also joins some OTHER live checkpoint would
    * unpersist that foreign frame's blocks too. (Every in-repo call
    * site passes the frame returned by `localCheckpoint`.) */
  def releaseNow(df: DataFrame): Unit =
    Bridge.checkpointRdds(df).foreach(_.unpersist(blocking = false))

  /** Drop every registered checkpoint and clear the registry. Call only
    * between fully-materialized queries. */
  def releaseAll(): Unit = synchronized {
    pinned.foreach(_.unpersist(blocking = false))
    pinned.clear()
  }
}
