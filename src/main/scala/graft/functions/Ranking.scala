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

  private val bkt = "_graft_bkt"
  private val li = "_graft_li"
  private val cnt = "_graft_cnt"
  private val off = "_graft_off"

  /** The shared two-pass core: (locally-ranked frame with bucket +
    * local-rank columns, B-row per-bucket (bkt, cnt, off) frame).
    * Pass 1 is the narrow boundary-sampling aggregate (column-pruned to
    * the primary key — the same extra pass RangePartitioner's sampler
    * pays); pass 2 is the ranking itself. */
  private def rankedParts(df: DataFrame, primary: Column, primaryAsc: Boolean,
                          order: Seq[Column], buckets: Int): (DataFrame, DataFrame) = {
    require(buckets > 1, "buckets must exceed 1 — otherwise use Window.orderBy directly")
    val bnds = "_graft_bounds"
    val probs = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = df.agg(
      percentile_approx(primary, array(probs.map(lit): _*), lit(10000)).as(bnds))
    // bucket = how many boundaries the row has passed, counted in sort
    // direction — all ties on a boundary value collapse into one bucket
    // (strict comparison), which only affects balance, never rank.
    val cmp: Column => Column = b => if (primaryAsc) b < primary else b > primary
    val withB = df.crossJoin(broadcast(bounds))
      .withColumn(bkt, size(filter(col(bnds), cmp)))
      .drop(bnds)
    val local = withB.withColumn(li,
      row_number().over(Window.partitionBy(col(bkt)).orderBy(order: _*)).cast("long"))
    // bucket offsets: offset(b) = Σ counts of strictly-lower buckets,
    // computed as a B×B triangle join over the B-row counts frame (B =
    // `buckets` ≤ a few dozen) — deliberately NOT a cumulative window,
    // which would be the very unpartitioned single-reducer WindowExec
    // this helper exists to eliminate (Spark 4's
    // EliminateWindowPartitions folds away a constant PARTITION BY, so
    // there is no way to declare one bounded)
    val counts = withB.groupBy(col(bkt)).agg(count(lit(1)).as(cnt))
    val lower = counts.select(col(bkt).as(s"${bkt}_lo"), col(cnt).as(s"${cnt}_lo"))
    val offs = counts.join(lower, col(s"${bkt}_lo") < col(bkt), "left")
      .groupBy(col(bkt), col(cnt))
      .agg(coalesce(sum(col(s"${cnt}_lo")), lit(0L)).as(off))
    (local, offs)
  }

  /** Append a 1-based global `row_number` (long) over the total order
    * `order` (must include a unique tie-break). `primary` is the leading
    * sort expression of `order`, given separately (and direction via
    * `primaryAsc`) because bucket boundaries derive from it. */
  def withGlobalRowNumber(df: DataFrame, primary: Column, primaryAsc: Boolean,
                          order: Seq[Column], out: String,
                          buckets: Int = 32): DataFrame = {
    val (local, offs) = rankedParts(df, primary, primaryAsc, order, buckets)
    local.join(broadcast(offs.select(col(bkt), col(off))), bkt)
      .withColumn(out, col(li) + col(off))
      .drop(bkt, li, off)
  }

  /** Append a 1-based `NTILE(k)`-equivalent bucket (int) over the total
    * order, rebuilt arithmetically from the distributed global row number
    * (SQL NTILE: the first n mod k tiles get ⌈n/k⌉ rows, the rest ⌊n/k⌋).
    */
  def withGlobalNtile(df: DataFrame, k: Int, primary: Column, primaryAsc: Boolean,
                      order: Seq[Column], out: String,
                      buckets: Int = 32): DataFrame = {
    require(k > 0)
    val gi = "_graft_gi"
    val tot = "_graft_n"
    val (local, offs) = rankedParts(df, primary, primaryAsc, order, buckets)
    val ranked = local.join(broadcast(offs.select(col(bkt), col(off))), bkt)
      .withColumn(gi, col(li) + col(off))
      .drop(bkt, li, off)
    // total row count comes from the B-row offsets frame — deriving it
    // from `df` again would re-aggregate the corpus under a different
    // column pruning (no exchange reuse): a third pass for one number
    val total = offs.agg(sum(col(cnt)).as(tot))
    // all-integer arithmetic (DIV, never `/` — Column./ is double division):
    // q = small-tile size, r = number of (q+1)-row large tiles, th = rows
    // covered by the large tiles; greatest(q,1) guards the n < k case
    // (where every row satisfies the first branch anyway).
    ranked.crossJoin(broadcast(total))
      .withColumn("_graft_q", expr(s"$tot DIV $k"))
      .withColumn("_graft_r", col(tot) % k)
      .withColumn("_graft_th", (col("_graft_q") + 1) * col("_graft_r"))
      .withColumn(out,
        when(col(gi) <= col("_graft_th"),
          expr(s"($gi + _graft_q) DIV (_graft_q + 1)"))
          .otherwise(col("_graft_r") +
            expr(s"($gi - _graft_th + _graft_q - 1) DIV greatest(_graft_q, 1)"))
          .cast("int"))
      .drop(gi, tot, "_graft_q", "_graft_r", "_graft_th")
  }
}
