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
  *      primary sort key, collected to the driver and re-shipped as a
  *      LITERAL (the exact round-trip Spark's own RangePartitioner makes
  *      for its sampled bounds); bucket = #boundaries beyond the row, a
  *      pure function of the row, so every job sees identical buckets;
  *   2. rank locally inside each bucket (`row_number` over PARTITION BY
  *      bucket — B reducers, each holding ~1/B of the rows);
  *   3. add each bucket's global offset. The per-bucket counts frame is
  *      bounded BY CONFIGURATION (≤ B·(B+1) rows however big the data),
  *      so it too collects to the driver; offsets, and NTILE's total,
  *      come back as one literal map + constants — no triangle join, no
  *      broadcast exchanges, no second aggregation of the input.
  *
  * Every remaining single-task structure is bounded by `buckets`
  * (default 32) — by configuration, not by data.
  * Cost shape: the input subtree (typically itself a per-key aggregate of
  * the corpus) is LAZILY `localCheckpoint`ed, so the corpus-side work is
  * paid exactly once no matter how many jobs consume it — the boundary
  * sample, the counts pass, and the ranking pass all re-read the
  * checkpointed partitions. (Round-6 plans without the checkpoint
  * recomputed the aggregate 4×: 8 scans of the fact table for one
  * NTILE.) Note the builders are therefore EAGER — they run two bounded
  * driver actions while assembling the frame, the same contract as any
  * sampled-sort/RangePartitioner pipeline.
  *
  * Ties: `primary` must be non-null; rows that tie on `primary` all land
  * in one bucket (bucketing can only see the primary key). A key with a
  * dominant value — 90% constant, a billion identical primaries — would
  * funnel those rows through one reducer, the same failure mode as any
  * range partitioner. The escape hatch is `salt`: pass the SECOND sort
  * expression (which must be numeric, non-null, and ascending in `order`
  * immediately after `primary`) and every value detected as a REPEATED
  * quantile boundary is sub-bucketed by that expression's own quantile
  * boundaries — exact global ranks with bounded reducers. Detection is
  * guaranteed for values spanning ≥ 2/B of the distribution (two
  * boundary repeats); a value spanning between 1/B and 2/B may straddle
  * only one boundary and stay unsalted, costing at most a ~2×-balanced
  * bucket, never correctness. Correctness of the
  * composite blocks: a heavy value v occupies its boundary-count bucket
  * together only with rows strictly BEFORE it in sort order (rows past v
  * have passed ≥ 2 more boundaries — v's own repeats), so (bucket, 0) <
  * (bucket, 1..B) blocks stay contiguous in the global order, and two
  * heavy values can never share a bucket.
  */
object Ranking {

  /** Internal column names, deterministically renamed away from any
    * collision with the caller's columns (a fixed name would silently
    * overwrite and then drop a same-named user column). Deterministic —
    * not UUIDs — so plans and EXPLAIN dumps stay stable run to run. */
  private final case class Cols(bkt: String, sub: String, li: String, gi: String)

  private val baseNames = Seq("_graft_bkt", "_graft_sub", "_graft_li", "_graft_gi")

  private def internalCols(df: DataFrame): Cols = {
    val taken = df.columns.toSet
    val sfx = Iterator.from(0)
      .map(i => if (i == 0) "" else s"_$i")
      .find(s => !baseNames.exists(n => taken(n + s)))
      .get
    Cols(s"_graft_bkt$sfx", s"_graft_sub$sfx", s"_graft_li$sfx", s"_graft_gi$sfx")
  }

  /** The shared bucketing stage: the lazily-checkpointed input with the
    * bucket + sub-bucket columns attached (both pure functions of the
    * row, from driver-collected boundary literals). Runs one bounded
    * driver action (two with `salt` + detected heavy values). */
  private def bucketed(df: DataFrame, primary: Column, primaryAsc: Boolean,
                       buckets: Int, salt: Option[Column]): (DataFrame, Cols) = {
    require(buckets > 1, "buckets must exceed 1 — otherwise use Window.orderBy directly")
    val c = internalCols(df)
    // LAZY checkpoint (same discipline as KMeans.fit): materialized by
    // the first action below, then the counts job and the ranking job
    // re-read the stored partitions instead of re-running the input
    // lineage. Without it, round-6 plans evaluated the subtree 4×.
    // Registered with [[Checkpoints]] — the returned plan retains this
    // frame past the builder's return, so the harness releases it
    // between queries (clearCache alone never drops checkpoint blocks).
    val in = Checkpoints.lazyLocal(df)
    val probs = (1 until buckets).map(i => i.toDouble / buckets)
    // accuracy 2000: boundary precision only moves bucket BALANCE (±n/2000
    // rows per bucket), never a rank — the bucket test is a pure function
    // of the row; 10000 measurably slowed the summary merge for nothing
    val boundsRow = in.agg(
      percentile_approx(primary, array(probs.map(lit): _*), lit(2000))).head()
    val boundVals: Seq[Any] =
      if (boundsRow.isNullAt(0)) Seq.empty else boundsRow.getSeq[Any](0)
    // bucket = how many boundaries the row has passed, counted in sort
    // direction — all ties on a boundary value collapse into one bucket
    // (strict comparison), which only affects balance, never rank.
    val cmp: Column => Column = b => if (primaryAsc) b < primary else b > primary
    val bktExpr =
      if (boundVals.isEmpty) lit(0) // empty input (or 1 distinct value)
      else size(filter(array(boundVals.map(lit): _*), cmp))
    val base = in.withColumn(c.bkt, bktExpr)
    val withB = salt match {
      case None => base.withColumn(c.sub, lit(0))
      case Some(sc) =>
        // heavy values = repeated boundaries (each repeat ≈ 1/B of the
        // distribution); their rows sub-bucket by the salt expression's
        // own per-value quantile boundaries — one extra filtered sample
        // job over the checkpoint, only when heavy values exist.
        val heavy = boundVals.groupBy(identity)
          .collect { case (v, occ) if occ.size >= 2 => v }.toSeq
        if (heavy.isEmpty) base.withColumn(c.sub, lit(0))
        else {
          val sb = in.filter(primary.isin(heavy: _*))
            .groupBy(primary.as(c.bkt)) // name irrelevant, immediately collected
            .agg(percentile_approx(sc, array(probs.map(lit): _*), lit(2000)))
            .collect()
            // an all-NULL salt for a heavy value yields a NULL
            // percentile row — degrade to no sub-boundaries (one
            // sub-bucket) instead of an NPE at plan-build time
            .map(r => r.get(0) ->
              (if (r.isNullAt(1)) Seq.empty[Any] else r.getSeq[Any](1))).toMap
          val subExpr = heavy.foldLeft(lit(0): Column) { (acc, v) =>
            when(primary === lit(v),
              size(filter(array(sb.getOrElse(v, Seq.empty).map(lit): _*),
                b => b < sc)) + 1)
              .otherwise(acc)
          }
          base.withColumn(c.sub, subExpr)
        }
    }
    (withB, c)
  }

  /** The shared ranking core: (locally-ranked frame carrying bucket +
    * sub-bucket + local-rank columns, the global-offset expression for
    * those columns, the total row count, the internal names). Runs two
    * bounded driver actions (boundary sample; per-bucket counts) against
    * the lazily-checkpointed input. */
  private def rankedParts(df: DataFrame, primary: Column, primaryAsc: Boolean,
                          order: Seq[Column], buckets: Int,
                          salt: Option[Column]): (DataFrame, Column, Long, Cols) = {
    val (withB, c) = bucketed(df, primary, primaryAsc, buckets, salt)
    val local = withB.withColumn(c.li,
      row_number().over(
        Window.partitionBy(col(c.bkt), col(c.sub)).orderBy(order: _*)).cast("long"))
    val (offExpr, total) = driverOffsets(withB, c, buckets, count(lit(1)))
    (local, offExpr, total, c)
  }

  /** Driver-side offsets over the configuration-bounded (bucket, sub)
    * frame: collects `groupBy(bkt, sub).agg(aggCol)` (≤ B·(B+1) rows BY
    * CONFIGURATION, however big the data — the same driver round-trip
    * RangePartitioner makes for its sampled bounds), prefix-scans in
    * (bucket, sub) order, and returns the offset expression (one literal
    * map lookup) plus the grand total. Deliberately NOT a cumulative
    * window (the unpartitioned single-reducer WindowExec this module
    * exists to eliminate) and not a triangle join + broadcast chain.
    * `aggCol` must aggregate to a long (count, or sum of an integral
    * column); an all-NULL group reads as 0. */
  private def driverOffsets(withB: DataFrame, c: Cols, buckets: Int,
                            aggCol: Column): (Column, Long) = {
    val rows = withB.groupBy(col(c.bkt), col(c.sub))
      .agg(aggCol.as(c.li)).collect()
      .map(r => (r.getInt(0), r.getInt(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    var acc = 0L
    val offMap = rows.map { case (b, s, n) =>
      val off = acc; acc += n
      (b.toLong * (buckets + 1) + s) -> off
    }.toMap
    val offExpr =
      if (offMap.isEmpty) lit(0L)
      else element_at(typedLit(offMap),
        col(c.bkt).cast("long") * (buckets + 1) + col(c.sub))
    (offExpr, acc)
  }

  /** Append a 1-based global `row_number` (long) over the total order
    * `order` (must include a unique tie-break). `primary` is the leading
    * sort expression of `order`, given separately (and direction via
    * `primaryAsc`) because bucket boundaries derive from it. `salt`, if
    * given, must be the numeric ascending second sort expression — see
    * the tie discussion above. */
  def withGlobalRowNumber(df: DataFrame, primary: Column, primaryAsc: Boolean,
                          order: Seq[Column], out: String,
                          buckets: Int = 32,
                          salt: Option[Column] = None): DataFrame = {
    val (local, offExpr, _, c) = rankedParts(df, primary, primaryAsc, order, buckets, salt)
    local.withColumn(out, col(c.li) + offExpr)
      .drop(c.bkt, c.sub, c.li)
  }

  /** Append a running SUM of `value` (inclusive of the current row)
    * over the total order — `SUM(value) OVER (ORDER BY ...)` without
    * the single-reducer window. Same two-phase scheme as the global
    * row_number: per-bucket running sums locally, bucket offsets (the
    * summed `value` of all lower buckets) from the bounded counts pass
    * as one literal map. This is the distributed prefix-scan that
    * sequence-packing / token-budget pipelines need. `value` must be an
    * INTEGRAL non-null column (the repo-wide exactness contract — scale
    * doubles/decimals to integer units first); anything else is
    * rejected at build time rather than silently truncated. */
  def withGlobalRunningSum(df: DataFrame, value: Column,
                           primary: Column, primaryAsc: Boolean,
                           order: Seq[Column], out: String,
                           buckets: Int = 32,
                           salt: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val vt = df.select(value).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"withGlobalRunningSum requires an integral value column, got $vt — " +
        "scale to integer units first")
    val (withB, c) = bucketed(df, primary, primaryAsc, buckets, salt)
    val local = withB.withColumn(c.li,
      sum(value).over(
        Window.partitionBy(col(c.bkt), col(c.sub)).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
    val (offExpr, _) = driverOffsets(withB, c, buckets, sum(value))
    local.withColumn(out, col(c.li) + offExpr)
      .drop(c.bkt, c.sub, c.li)
  }

  /** Append a 1-based `NTILE(k)`-equivalent bucket (int) over the total
    * order, rebuilt arithmetically from the distributed global row number
    * (SQL NTILE: the first n mod k tiles get ⌈n/k⌉ rows, the rest ⌊n/k⌋).
    * The total row count is a driver constant (from the bounded counts
    * pass), so the tile formula is pure literal arithmetic — no extra
    * aggregation or broadcast anywhere.
    */
  def withGlobalNtile(df: DataFrame, k: Int, primary: Column, primaryAsc: Boolean,
                      order: Seq[Column], out: String,
                      buckets: Int = 32,
                      salt: Option[Column] = None): DataFrame = {
    require(k > 0)
    val (local, offExpr, total, c) = rankedParts(df, primary, primaryAsc, order, buckets, salt)
    // all-integer arithmetic (DIV, never `/` — Column./ is double
    // division): q = small-tile size, r = number of (q+1)-row large
    // tiles, th = rows covered by the large tiles; max(q,1) guards the
    // n < k case (where every row satisfies the first branch anyway).
    val q = total / k
    val r = total % k
    val th = (q + 1) * r
    local.withColumn(c.gi, col(c.li) + offExpr)
      .withColumn(out,
        when(col(c.gi) <= th, expr(s"(${c.gi} + $q) DIV ${q + 1}"))
          .otherwise(expr(s"$r + ((${c.gi} - $th + $q - 1) DIV ${math.max(q, 1L)})"))
          .cast("int"))
      .drop(c.bkt, c.sub, c.li, c.gi)
  }
}
