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
  *  - [[Mode.Exact]]   — sort-buffering `percentile`. Bit-exact, oracle
  *    comparable, but a reducer holds a full group: only safe when the
  *    LARGEST group fits an executor (the bounded-scale contract).
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
    if (exact) {
      val aggs = qs.zipWithIndex.map { case (q, i) =>
        expr(s"CAST(percentile(`$value`, $q) AS DOUBLE)").as(s"_q$i") }
      df.groupBy(col(group).as("_r_group")).agg(aggs.head, aggs.tail: _*)
    } else
      df.groupBy(col(group).as("_r_group"))
        .agg(Sketches.quantileSketch(k, qs)(col(value).cast("double")).as("_qq"))
        .select(col("_r_group") +:
          qs.indices.map(i => col("_qq").getItem(i).as(s"_q$i")): _*)

  /** Median-absolute-deviation outlier counts per group over an integer
    * value column: `(group, n_rows, n_outliers, mad)` with `mad` in input
    * units (callers that pre-scaled to mils divide back afterwards). The
    * strict fence is `|v − median| > fence·MAD`. Shape in both modes: two
    * fence aggregations, each broadcast back into a narrow scan — the
    * corpus is never globally sorted. In sketch mode the deviation frame
    * is checkpointed (each re-evaluation would repeat the median SKETCH
    * pass); in exact mode it is recomputed — one cheap scan+join, measured
    * faster than caching (q_mad_outliers scaladoc). */
  def madOutliers(df: DataFrame, group: String, value: String,
      fence: Double = 1.5, mode: Mode = Mode.Sketch, k: Int = 256): DataFrame = {
    val exact = useExact(df, mode)
    val med = quantileFences(df, group, value, Seq(0.5), exact, k)
      .withColumnRenamed("_q0", "_med")
    val devBase = df.join(broadcast(med), col(group) === col("_r_group"))
      .select(col(group), abs(col(value) - col("_med")).as("_ad"))
    val dev = if (exact) devBase else Checkpoints.lazyLocal(devBase)
    val mad = quantileFences(dev, group, "_ad", Seq(0.5), exact, k)
      .withColumnRenamed("_q0", "_mad")
    dev.join(broadcast(mad), col(group) === col("_r_group"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("_ad") > lit(fence) * col("_mad"), 1)).as("n_outliers"),
        max(col("_mad")).as("mad"))
  }

  /** Quantile-trimmed statistics per group over an integer value column:
    * `(group, n_rows, n_kept, trimmed_mean, lo_fence, hi_fence)`, all
    * value-typed outputs in input units. The fences move with the mode;
    * the trimmed SUM inside them stays EXACT int64 either way — the
    * sketch only ever moves the fences, never the arithmetic. */
  def trimmedStats(df: DataFrame, group: String, value: String,
      loQ: Double = 0.1, hiQ: Double = 0.9,
      mode: Mode = Mode.Sketch, k: Int = 256): DataFrame = {
    val f = quantileFences(df, group, value, Seq(loQ, hiQ), useExact(df, mode), k)
      .select(col("_r_group"), col("_q0").as("_lo"), col("_q1").as("_hi"))
    val kept = col(value) >= col("_lo") && col(value) <= col("_hi")
    df.join(broadcast(f), col(group) === col("_r_group"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_rows"),
        count(when(kept, 1)).as("n_kept"),
        (sum(when(kept, col(value))).cast("double") / count(when(kept, 1)))
          .as("trimmed_mean"),
        max(col("_lo")).as("lo_fence"), max(col("_hi")).as("hi_fence"))
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
