package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Max-min fair (waterfill) integer allocation across groups — the
  * mixture-design primitive behind `q_token_waterfill`: give every group
  * the same water level L, let groups with less than L contribute
  * everything (capped), and spread the integer remainder +1 to the first
  * uncapped groups in (avail, key) order. The classic alternative —
  * proportional sampling — lets one giant crawl drown the small curated
  * sources; waterfill is the allocation that maximizes the minimum
  * per-group share subject to availability.
  *
  * EXACT integer end to end: per-boundary candidate levels
  * L_k = (target − prefix_k) DIV (n − k), the unique k validated by
  * avail_k ≤ L_k < avail_{k+1}, and Σ allocated == target by
  * construction (WaterfillProps proves it against a sequential Scala
  * reference over random instances). Precondition: 0 ≤ target < Σ avail
  * (at target ≥ total there is nothing to allocate away — callers take
  * everything); targets derived as a proper fraction of the total
  * satisfy it whenever the total is positive.
  *
  * Scale shape: the input is the ALREADY-REDUCED per-group frame (one
  * row per group — the caller's map-side aggregate), so every window
  * here runs on a configuration-bounded frame and the 1-row
  * level/remainder frame broadcasts. */
object Waterfill {

  /** Allocate `(tgtNum/tgtDen) · Σ avail` (integer-floored) across the
    * rows of `df` (columns: `key`, `avail`). Returns
    * `(key, avail_tokens, allocated, capped)` — the q_token_waterfill
    * output contract. */
  def allocate(df: DataFrame, key: String, avail: String,
               tgtNum: Int, tgtDen: Int): DataFrame = {
    require(tgtNum >= 0 && tgtDen > 0 && tgtNum < tgtDen,
      s"target fraction $tgtNum/$tgtDen must sit in [0, 1)")
    // normalize to FIXED internal names first: every expr() below then
    // parses only names this function owns, so a caller's column called
    // "avail tokens" (or any name needing backquotes) cannot break the
    // generated SQL or resolve to something else. Checkpoint the reduced
    // frame: `t`, `cand` (via r) and the final select each consume it,
    // and without the checkpoint the CALLER's corpus aggregate lineage
    // re-runs three times per allocation (registry-released by the
    // harness after the query; the frame is one row per group)
    val in = Checkpoints.lazyLocal(
      df.select(col(key).as("_wf_key"), col(avail).as("_wf_avail")))
    val byAvail = Window.orderBy(col("_wf_avail"), col("_wf_key"))
    val t = in.agg(count(lit(1)).as("n"),
      expr(s"(SUM(_wf_avail) * $tgtNum) DIV $tgtDen").as("tgt"))
    val r = in
      .withColumn("rn", row_number().over(byAvail))
      .withColumn("p", sum(col("_wf_avail")).over(byAvail))
    val cand = r.select((col("rn") - 1).as("k"),
        coalesce(lag(col("p"), 1).over(Window.orderBy(col("rn"))), lit(0L)).as("pk"),
        coalesce(lag(col("_wf_avail"), 1).over(Window.orderBy(col("rn"))), lit(0L)).as("ak"),
        col("_wf_avail").as("nxt"))
      .crossJoin(broadcast(t))
    val lvl = cand
      .withColumn("L", expr("(tgt - pk) DIV (n - k)"))
      .filter(col("ak") <= col("L") && col("L") < col("nxt"))
      .select(col("k"), col("pk"), col("L"),
        (col("tgt") - (col("pk") + col("L") * (col("n") - col("k")))).as("rem"))
    r.crossJoin(broadcast(lvl))
      .select(col("_wf_key").as(key), col("_wf_avail").as("avail_tokens"),
        when(col("rn") <= col("k"), col("_wf_avail"))
          .otherwise(col("L") +
            when(col("rn") - col("k") <= col("rem"), 1L).otherwise(0L))
          .as("allocated"),
        (col("rn") <= col("k")).as("capped"))
  }

  /** Sequential reference (driver-side) with identical semantics — the
    * property-test twin of [[allocate]]. */
  def reference(avails: Seq[(String, Long)], tgtNum: Int, tgtDen: Int): Map[String, Long] = {
    val target = avails.map(_._2).sum * tgtNum / tgtDen
    val sorted = avails.sortBy { case (k, a) => (a, k) }
    val n = sorted.length
    var remaining = target
    var level = 0L
    var capped = 0
    // walk the boundaries: cap groups whose avail fits under the level
    var done = false
    while (!done && capped < n) {
      val uncapped = n - capped
      val cand = remaining / uncapped
      if (cand >= sorted(capped)._2) {
        remaining -= sorted(capped)._2
        capped += 1
      } else { level = cand; done = true }
    }
    val rem = (remaining - level * (n - capped)).toInt
    sorted.zipWithIndex.map { case ((k, a), i) =>
      if (i < capped) k -> a
      else k -> (level + (if (i - capped < rem) 1L else 0L))
    }.toMap
  }
}
