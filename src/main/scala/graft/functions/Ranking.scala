package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — `row_number()` / `NTILE(k)` over a total
  * order WITHOUT the single-reducer `Window.orderBy(...)` funnel.
  *
  * An empty window `PARTITION BY` clause makes Spark (and every other
  * engine) pull ALL rows through one task — fine for a few thousand
  * post-aggregation rows, a scale-killer at 10⁹ keys. This helper is the
  * classic two-phase alternative:
  *
  *   1. bucket rows by VALUE — `approx_percentile` boundaries of the
  *      primary sort key, broadcast, bucket = #boundaries beyond the row
  *      (a pure function of the row, so every branch of the plan assigns
  *      identical buckets — no reliance on a sampled partitioner agreeing
  *      with itself across executions);
  *   2. rank locally inside each bucket (`row_number` over PARTITION BY
  *      bucket — B reducers, each holding ~1/B of the rows);
  *   3. add each bucket's global offset (the summed size of all lower
  *      buckets — a B×B triangle join over the B-row counts frame,
  *      broadcast back; NOT a cumulative window, so no unpartitioned
  *      WindowExec anywhere in the plan).
  *
  * Every remaining single-task structure is bounded by `buckets`
  * (default 32) — by configuration, not by data.
  * Cost shape: TWO passes over the input — a narrow boundary-sampling
  * aggregate (column-pruned to the primary key; the same extra pass
  * RangePartitioner's sampler pays) and the ranking pass, whose two
  * references (rank window, bucket counts) share their exchange via
  * AQE reuse. NTILE's total row count derives from the B-row counts
  * frame, never from a third aggregation of the input.
  *
  * Caveats: `primary` must be non-null; rows that tie on `primary` all
  * land in one bucket (bucketing can only see the primary key), so a key
  * with a billion identical values still needs the salting treatment —
  * same limitation as any range partitioner.
  */
object Ranking {

  /** Internal column names, deterministically renamed away from any
    * collision with the caller's columns (a fixed name would silently
    * overwrite and then drop a same-named user column). Deterministic —
    * not UUIDs — so plans and EXPLAIN dumps stay stable run to run. */
  private final case class Cols(bkt: String, li: String, cnt: String,
                                off: String, bnds: String, gi: String,
                                tot: String, q: String, r: String, th: String)

  private val baseNames = Seq("_graft_bkt", "_graft_li", "_graft_cnt",
    "_graft_off", "_graft_bounds", "_graft_gi", "_graft_n", "_graft_q",
    "_graft_r", "_graft_th")

  private def internalCols(df: DataFrame): Cols = {
    val taken = df.columns.toSet
    val sfx = Iterator.from(0)
      .map(i => if (i == 0) "" else s"_$i")
      .find(s => !baseNames.exists(n => taken(n + s) || taken(n + s + "_lo")))
      .get
    Cols(s"_graft_bkt$sfx", s"_graft_li$sfx", s"_graft_cnt$sfx",
      s"_graft_off$sfx", s"_graft_bounds$sfx", s"_graft_gi$sfx",
      s"_graft_n$sfx", s"_graft_q$sfx", s"_graft_r$sfx", s"_graft_th$sfx")
  }

  /** The shared two-pass core: (locally-ranked frame with bucket +
    * local-rank columns, B-row per-bucket (bkt, cnt, off) frame, the
    * internal names in use). Pass 1 is the narrow boundary-sampling
    * aggregate; pass 2 is the ranking itself. */
  private def rankedParts(df: DataFrame, primary: Column, primaryAsc: Boolean,
                          order: Seq[Column], buckets: Int): (DataFrame, DataFrame, Cols) = {
    require(buckets > 1, "buckets must exceed 1 — otherwise use Window.orderBy directly")
    val c = internalCols(df)
    val probs = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = df.agg(
      percentile_approx(primary, array(probs.map(lit): _*), lit(10000)).as(c.bnds))
    // bucket = how many boundaries the row has passed, counted in sort
    // direction — all ties on a boundary value collapse into one bucket
    // (strict comparison), which only affects balance, never rank.
    val cmp: Column => Column = b => if (primaryAsc) b < primary else b > primary
    val withB = df.crossJoin(broadcast(bounds))
      .withColumn(c.bkt, size(filter(col(c.bnds), cmp)))
      .drop(c.bnds)
    val local = withB.withColumn(c.li,
      row_number().over(Window.partitionBy(col(c.bkt)).orderBy(order: _*)).cast("long"))
    // bucket offsets: offset(b) = Σ counts of strictly-lower buckets,
    // computed as a B×B triangle join over the B-row counts frame (B =
    // `buckets` ≤ a few dozen) — deliberately NOT a cumulative window,
    // which would be the very unpartitioned single-reducer WindowExec
    // this helper exists to eliminate (Spark 4's
    // EliminateWindowPartitions folds away a constant PARTITION BY, so
    // there is no way to declare one bounded)
    val counts = withB.groupBy(col(c.bkt)).agg(count(lit(1)).as(c.cnt))
    val lower = counts.select(col(c.bkt).as(s"${c.bkt}_lo"), col(c.cnt).as(s"${c.cnt}_lo"))
    val offs = counts.join(lower, col(s"${c.bkt}_lo") < col(c.bkt), "left")
      .groupBy(col(c.bkt), col(c.cnt))
      .agg(coalesce(sum(col(s"${c.cnt}_lo")), lit(0L)).as(c.off))
    (local, offs, c)
  }

  /** Append a 1-based global `row_number` (long) over the total order
    * `order` (must include a unique tie-break). `primary` is the leading
    * sort expression of `order`, given separately (and direction via
    * `primaryAsc`) because bucket boundaries derive from it. */
  def withGlobalRowNumber(df: DataFrame, primary: Column, primaryAsc: Boolean,
                          order: Seq[Column], out: String,
                          buckets: Int = 32): DataFrame = {
    val (local, offs, c) = rankedParts(df, primary, primaryAsc, order, buckets)
    local.join(broadcast(offs.select(col(c.bkt), col(c.off))), c.bkt)
      .withColumn(out, col(c.li) + col(c.off))
      .drop(c.bkt, c.li, c.off)
  }

  /** Append a 1-based `NTILE(k)`-equivalent bucket (int) over the total
    * order, rebuilt arithmetically from the distributed global row number
    * (SQL NTILE: the first n mod k tiles get ⌈n/k⌉ rows, the rest ⌊n/k⌋).
    */
  def withGlobalNtile(df: DataFrame, k: Int, primary: Column, primaryAsc: Boolean,
                      order: Seq[Column], out: String,
                      buckets: Int = 32): DataFrame = {
    require(k > 0)
    val (local, offs, c) = rankedParts(df, primary, primaryAsc, order, buckets)
    val ranked = local.join(broadcast(offs.select(col(c.bkt), col(c.off))), c.bkt)
      .withColumn(c.gi, col(c.li) + col(c.off))
      .drop(c.bkt, c.li, c.off)
    // total row count comes from the B-row offsets frame — deriving it
    // from `df` again would re-aggregate the corpus under a different
    // column pruning (no exchange reuse): a third pass for one number
    val total = offs.agg(sum(col(c.cnt)).as(c.tot))
    // all-integer arithmetic (DIV, never `/` — Column./ is double division):
    // q = small-tile size, r = number of (q+1)-row large tiles, th = rows
    // covered by the large tiles; greatest(q,1) guards the n < k case
    // (where every row satisfies the first branch anyway).
    ranked.crossJoin(broadcast(total))
      .withColumn(c.q, expr(s"${c.tot} DIV $k"))
      .withColumn(c.r, col(c.tot) % k)
      .withColumn(c.th, (col(c.q) + 1) * col(c.r))
      .withColumn(out,
        when(col(c.gi) <= col(c.th),
          expr(s"(${c.gi} + ${c.q}) DIV (${c.q} + 1)"))
          .otherwise(col(c.r) +
            expr(s"(${c.gi} - ${c.th} + ${c.q} - 1) DIV greatest(${c.q}, 1)"))
          .cast("int"))
      .drop(c.gi, c.tot, c.q, c.r, c.th)
  }
}
