package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single front door for the exact/sketch robust-statistics pairs.
  *
  * Every exact-percentile operator in the suite ships as a PAIR: an exact
  * twin whose `percentile` reducer buffers a whole group's values (the
  * bounded-scale, oracle-gated contract) and a sketch twin that routes both
  * percentile passes through the mergeable
  * [[graft.functions.Sketches.QuantileSketch]] (O(k·log n) doubles of
  * aggregation state per group — the 100 TB path). Until now the caller
  * picked the twin by calling a different query; this object is the
  * documented library entry point that makes the choice explicit — or
  * automatic on a row-count threshold.
  *
  * Mode semantics:
  *  - [[Mode.Exact]]   — bit-exact, oracle comparable. r18: computed from
  *    the per-group VALUE DISTRIBUTION (`fencesFromCounts`), replicating
  *    `percentile`'s interpolation bit-for-bit without its
  *    whole-group-in-one-reducer buffering — the memory bound moved from
  *    rows per group to DISTINCT VALUES per group (safe whenever the
  *    value domain is bounded: integer mils, quantities, deviations).
  *  - [[Mode.Sketch]]  — mergeable quantile sketch fences, exact arithmetic
  *    inside the fences. The 100 TB default: no reducer ever buffers a
  *    group, partials combine map-side.
  *  - [[Mode.Auto]]    — one `df.count()` (cheap: parquet footer counts /
  *    a count-star aggregate, no wide materialization) then Exact iff the
  *    input is at or under `maxExactRows`. The count is of the whole
  *    input, a conservative upper bound on any group.
  *
  * All three modes return the SAME schema from each operator, so a caller
  * can switch modes without touching downstream code — RobustSpec pins
  * that contract plus Auto's threshold behavior.
  */
object Robust {

  /** Default Auto switchover: under ~50M input rows the exact reducer
    * buffering (few hundred MB worst-case, one group) is affordable on a
    * production executor; past it, sketches. Deliberately conservative —
    * at 100 TB nothing real sits under it, so Auto degrades to Sketch. */
  val DefaultAutoThreshold: Long = 50L * 1000 * 1000

  sealed trait Mode
  object Mode {
    /** Sort-buffering exact percentiles (bounded-scale contract). */
    case object Exact extends Mode
    /** Mergeable-sketch fences (the 100 TB path). */
    case object Sketch extends Mode
    /** Exact iff `df.count() <= maxExactRows`, else Sketch. */
    final case class Auto(maxExactRows: Long = DefaultAutoThreshold) extends Mode
  }

  private def useExact(df: DataFrame, mode: Mode): Boolean = mode match {
    case Mode.Exact      => true
    case Mode.Sketch     => false
    case Mode.Auto(max)  => df.count() <= max
  }

  /** Per-group quantile fences: one row per group value, columns
    * `_r_group, _q0.._qn` (doubles, interpolated). Internal building
    * block — the `_r_group` rename exists so the caller can broadcast-join
    * the fences back onto the input without a self-join ambiguity. */
  private def quantileFences(df: DataFrame, group: String, value: String,
      qs: Seq[Double], exact: Boolean, k: Int): DataFrame =
    if (exact)
      fencesFromCounts(groupValueCounts(df, group, value), value, qs)
    else
      df.groupBy(col(group).as("_r_group"))
        .agg(Sketches.quantileSketch(k, qs)(col(value).cast("double")).as("_qq"))
        .select(col("_r_group") +:
          qs.indices.map(i => col("_qq").getItem(i).as(s"_q$i")): _*)

  /** The per-(group, value) DISTRIBUTION frame exact mode runs on:
    * `(_r_group, <value>, _c)`, one row per distinct value per group
    * (null values keep their count row — row totals must include them;
    * the fence math excludes them exactly like `percentile` does). */
  private def groupValueCounts(df: DataFrame, group: String, value: String): DataFrame =
    df.groupBy(col(group).as("_r_group"), col(value))
      .agg(count(lit(1)).as("_c"))

  /** Exact interpolated percentiles from a value-distribution frame —
    * the r18 replacement for the sort-buffering `percentile` aggregate
    * (guide §1.2 "the distributed algorithm" / §5 "memory and spill").
    *
    * Why: `percentile`'s reducer materializes a whole group's values
    * (an OpenHashMap of boxed keys, merged single-threaded per group) —
    * the bounded-scale contract the Exact twins carried. But every one
    * of these operators runs on a BOUNDED VALUE DOMAIN (integer price
    * mils, integer quantities, exact 0.5-multiple deviations), where
    * the distribution `(group, value) → count` is the cheaper object by
    * orders of magnitude: one map-side-combined count shuffle, then the
    * interpolation needs only the cumulative counts over the DISTINCT
    * values. Exact mode thus stops being row-bounded and becomes
    * value-domain-bounded — no reducer ever buffers a group again, and
    * callers reuse the counts frame instead of re-scanning the corpus.
    *
    * Exactness (oracle-pinned): replicates Spark `Percentile`'s
    * arithmetic bit-for-bit, verified against the bytecode of
    * `PercentileBase.getPercentile` (Spark 4.1.2) and pinned by
    * RobustSpec on adversarial data: position = (N−1)·q in double;
    * lowerKey/higherKey = the values whose cumulative-count ranges
    * cover 0-based ranks floor(position)/ceil(position); result =
    * lowerKey when the ranks coincide OR the keys are value-equal, else
    * `(higher − position)·lowerKey + (position − lower)·higherKey` in
    * exactly that double evaluation order. */
  private def fencesFromCounts(counts: DataFrame, value: String,
      qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nn = counts.filter(col(value).isNotNull)
    val wOrd = Window.partitionBy(col("_r_group")).orderBy(col(value))
    val wAll = Window.partitionBy(col("_r_group"))
    val c = nn
      .withColumn("_cum", sum(col("_c")).over(wOrd))
      .withColumn("_n", sum(col("_c")).over(wAll))
    val aggs = qs.zipWithIndex.flatMap { case (q, i) =>
      val pos = (col("_n") - 1).cast("double") * lit(q)
      val lo = floor(pos) // 0-based rank of the lower key, as bigint
      val hi = ceil(pos)
      // the value covering 0-based rank r is the unique row with
      // cum_before ≤ r < cum; max(when(…)) selects it per group
      Seq(
        max(when(col("_cum") - col("_c") <= lo && col("_cum") > lo, col(value))).as(s"_lk$i"),
        max(when(col("_cum") - col("_c") <= hi && col("_cum") > hi, col(value))).as(s"_hk$i"),
        max(pos).as(s"_pos$i"), max(lo).as(s"_lo$i"), max(hi).as(s"_hi$i"))
    }
    c.groupBy(col("_r_group")).agg(aggs.head, aggs.tail: _*)
      .select(col("_r_group") +: qs.indices.map { i =>
        val lowD = col(s"_lk$i").cast("double")
        val highD = col(s"_hk$i").cast("double")
        when(col(s"_hi$i") === col(s"_lo$i"), lowD)
          .when(col(s"_hk$i") === col(s"_lk$i"), lowD)
          .otherwise((col(s"_hi$i").cast("double") - col(s"_pos$i")) * lowD
            + (col(s"_pos$i") - col(s"_lo$i").cast("double")) * highD)
          .as(s"_q$i")
      }: _*)
  }

  /** Median-absolute-deviation outlier counts per group over an integer
    * value column: `(group, n_rows, n_outliers, mad)` with `mad` in input
    * units (callers that pre-scaled to mils divide back afterwards). The
    * strict fence is `|v − median| > fence·MAD`; the corpus is never
    * globally sorted in either mode. Exact mode (r18) runs ENTIRELY on
    * the value distribution: one counts shuffle of the corpus, then
    * median, deviation distribution, MAD and the fence counts all fold
    * distinct-value frames (was: three corpus scans + two `percentile`
    * reducer sorts). Sketch mode keeps the row-level shape with the
    * deviation frame checkpointed (each re-evaluation would repeat the
    * median SKETCH pass). */
  def madOutliers(df: DataFrame, group: String, value: String,
      fence: Double = 1.5, mode: Mode = Mode.Sketch, k: Int = 256): DataFrame = {
    if (useExact(df, mode)) {
      // r18 exact path: the WHOLE query runs on the value distribution —
      // one corpus scan (the counts shuffle), where the former shape
      // scanned the corpus three times (median pass, deviation pass,
      // fence count) and buffered two sorts in `percentile` reducers.
      // The deviation distribution folds counts instead of rows; every
      // aggregate below is over distinct-value frames.
      // the distribution frames are value-domain-bounded (distinct values
      // per group), so checkpointing them is cheap — and each is read by
      // TWO consumers below; un-checkpointed, every consumer re-ran the
      // full-corpus counting shuffle (registry-released per query)
      val counts = Checkpoints.lazyLocal(groupValueCounts(df, group, value))
      val med = fencesFromCounts(counts, value, Seq(0.5))
        .withColumnRenamed("_q0", "_med")
      val devCounts = Checkpoints.lazyLocal(
        counts.join(broadcast(med), "_r_group")
          .select(col("_r_group"), abs(col(value) - col("_med")).as("_ad"), col("_c"))
          .groupBy(col("_r_group"), col("_ad")).agg(sum(col("_c")).as("_c")))
      val mad = fencesFromCounts(devCounts, "_ad", Seq(0.5))
        .withColumnRenamed("_q0", "_mad")
      devCounts.join(broadcast(mad), "_r_group")
        .groupBy(col("_r_group").as(group))
        // coalesce keeps n_rows non-nullable (count(1) was), so the mode
        // switch stays schema-invisible; a group always has >= 1 count row
        .agg(coalesce(sum(col("_c")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("_ad") > lit(fence) * col("_mad"), col("_c"))),
            lit(0L)).as("n_outliers"),
          max(col("_mad")).as("mad"))
    } else {
      val med = quantileFences(df, group, value, Seq(0.5), exact = false, k)
        .withColumnRenamed("_q0", "_med")
      val dev = Checkpoints.lazyLocal(
        df.join(broadcast(med), col(group) === col("_r_group"))
          .select(col(group), abs(col(value) - col("_med")).as("_ad")))
      val mad = quantileFences(dev, group, "_ad", Seq(0.5), exact = false, k)
        .withColumnRenamed("_q0", "_mad")
      dev.join(broadcast(mad), col(group) === col("_r_group"))
        .groupBy(col(group))
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("_ad") > lit(fence) * col("_mad"), 1)).as("n_outliers"),
          max(col("_mad")).as("mad"))
    }
  }

  /** Quantile-trimmed statistics per group over an integer value column:
    * `(group, n_rows, n_kept, trimmed_mean, lo_fence, hi_fence)`, all
    * value-typed outputs in input units. The fences move with the mode;
    * the trimmed SUM inside them stays EXACT int64 either way — the
    * sketch only ever moves the fences, never the arithmetic. */
  def trimmedStats(df: DataFrame, group: String, value: String,
      loQ: Double = 0.1, hiQ: Double = 0.9,
      mode: Mode = Mode.Sketch, k: Int = 256): DataFrame = {
    val kept = col(value) >= col("_lo") && col(value) <= col("_hi")
    if (useExact(df, mode)) {
      // r18 exact path: fences AND the trimmed aggregate both run on the
      // value distribution — one corpus scan instead of two, no
      // `percentile` reducer buffering. Row sums fold counts: Σ_rows v ≡
      // Σ_distinct v·c exactly (int64, ANSI-loud at the same total).
      // checkpointed for the same two-consumer reason as madOutliers
      val counts = Checkpoints.lazyLocal(groupValueCounts(df, group, value))
      val f = fencesFromCounts(counts, value, Seq(loQ, hiQ))
        .select(col("_r_group"), col("_q0").as("_lo"), col("_q1").as("_hi"))
      counts.join(broadcast(f), "_r_group")
        .groupBy(col("_r_group").as(group))
        // coalesce: schema-invisible mode switch (see madOutliers)
        .agg(coalesce(sum(col("_c")), lit(0L)).as("n_rows"),
          coalesce(sum(when(kept, col("_c"))), lit(0L)).as("n_kept"),
          (sum(when(kept, col(value) * col("_c"))).cast("double")
            / sum(when(kept, col("_c")))).as("trimmed_mean"),
          max(col("_lo")).as("lo_fence"), max(col("_hi")).as("hi_fence"))
    } else {
      val f = quantileFences(df, group, value, Seq(loQ, hiQ), exact = false, k)
        .select(col("_r_group"), col("_q0").as("_lo"), col("_q1").as("_hi"))
      df.join(broadcast(f), col(group) === col("_r_group"))
        .groupBy(col(group))
        .agg(count(lit(1)).as("n_rows"),
          count(when(kept, 1)).as("n_kept"),
          (sum(when(kept, col(value))).cast("double") / count(when(kept, 1)))
            .as("trimmed_mean"),
          max(col("_lo")).as("lo_fence"), max(col("_hi")).as("hi_fence"))
    }
  }

  /** Global heavy hitters over one key column: `(rk, <key>, n)` — the
    * true top-`topK` keys by exact count, ranked with a deterministic
    * (n DESC, key ASC) tie-break. The mode moves only the CANDIDATE
    * discovery, never the arithmetic:
    *  - Exact — one vocabulary-sized count shuffle (map-side partials),
    *    then the distributed top-k. The bounded-scale contract: fine
    *    whenever the distinct-key table is an acceptable shuffle.
    *  - Sketch — a Misra–Gries summary (map-side partial maps of
    *    ≤ `capacity` entries, merged; per-key rows never shuffle)
    *    narrows the corpus to ≤ `capacity` candidates, then ONE exact
    *    pass counts just those (broadcast semi-join). MG guarantees
    *    every key with true count > N/(capacity+1) survives, so the
    *    answer IS the exact top-k whenever the k-th count clears that
    *    line — at 100 TB pick capacity ≈ 10-100× topK. The caller owns
    *    the precondition (audit it with q_heavy_hitters_guarantee's
    *    shape); on a frequency-flattened corpus the survivors past the
    *    detection line are arbitrary.
    *  - Auto additionally AUDITS the guarantee when it lands on the
    *    sketch path, from quantities the path already computes: the
    *    k-th highest candidate count c_k (exact, from the confirm pass)
    *    against the detection line N/(capacity+1). c_k above the line
    *    proves every non-candidate's true count < c_k, so the candidate
    *    top-k IS the exact top-k; c_k at/below it means a true hitter
    *    may be missing, and Auto escalates to the exact vocabulary
    *    count instead of returning arbitrary survivors. The audit costs
    *    one tiny top-k collect; the escalation costs the one shuffle
    *    Exact would have paid anyway — so Auto is always-correct at
    *    sketch cost whenever the corpus is skewed enough to deserve it.
    * Same output schema in all modes (the Robust contract); the gated
    * q_heavy_hitters / q_heavy_hitters_sketch queries are the two
    * shapes' oracle-gated twins, q_heavy_hitters_guarantee the audit's. */
  def heavyHitters(df: DataFrame, key: String, topK: Int = 20,
      mode: Mode = Mode.Sketch, capacity: Int = 256): DataFrame = {
    require(capacity > topK,
      s"MG capacity $capacity must exceed topK $topK for the exactness guarantee")
    // NULL keys are excluded in BOTH modes (a missing key is not a
    // hitter): the MG aggregator skips nulls and an equi-join can never
    // match them, so without this filter Exact would rank a null-key
    // group the Sketch path structurally cannot see — breaking the
    // same-answer contract on exactly the dirty data this runs on
    val rows = df.filter(col(key).isNotNull)
    def exactCounts = rows.groupBy(col(key)).agg(count(lit(1)).as("n"))
    def sketchCounts = {
      val cands = rows.agg(Sketches.misraGries(capacity)(col(key)).as("_mg"))
        .select(explode(map_keys(col("_mg"))).as(key))
      rows.join(broadcast(cands), key).groupBy(col(key)).agg(count(lit(1)).as("n"))
    }
    val counts = mode match {
      case Mode.Exact  => exactCounts
      case Mode.Sketch => sketchCounts
      case Mode.Auto(max) =>
        val n = rows.count() // the Auto threshold probe — reused as MG's N
        if (n <= max) exactCounts
        else {
          // checkpointed: the audit's top-k collect and the final result
          // both consume the candidate counts, and the MG pass + confirm
          // join are exactly what must not run twice
          val sc = Checkpoints.lazyLocal(sketchCounts)
          val kth = sc.orderBy(col("n").desc, col(key).asc).limit(topK)
            .agg(count(lit(1)).as("k"), min(col("n")).as("ck"))
            .collect()(0)
          val holds = kth.getLong(0) >= topK.toLong &&
            kth.getLong(1) > n / (capacity + 1L)
          if (holds) sc else exactCounts
        }
    }
    val order = Seq(col("n").desc, col(key).asc)
    // distributed sort+limit first (TakeOrderedAndProject), the rank
    // window over only the k survivors — never a global one-partition sort
    counts.orderBy(order: _*).limit(topK)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(order: _*)))
      .select(col("rk"), col(key), col("n"))
  }

  /** Per-group interpolated percentiles of one value column:
    * `(group, <name>, ...)` — one double column per requested
    * `(quantile, name)`. The grouped-percentile front door. */
  def percentiles(df: DataFrame, group: String, value: String,
      qs: Seq[(Double, String)], mode: Mode = Mode.Sketch, k: Int = 256): DataFrame =
    quantileFences(df, group, value, qs.map(_._1), useExact(df, mode), k)
      .select(col("_r_group").as(group) +:
        qs.zipWithIndex.map { case ((_, n), i) => col(s"_q$i").as(n) }: _*)
}
