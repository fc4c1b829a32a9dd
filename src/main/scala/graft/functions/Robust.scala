package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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
    * the r18 move that made Exact mode value-domain-bounded instead of
    * row-bounded (guide §1.2 "the distributed algorithm" / §5 "memory
    * and spill"): every one of these operators runs on a BOUNDED VALUE
    * DOMAIN (integer price mils, integer quantities, exact 0.5-multiple
    * deviations), where the distribution `(group, value) → count` is
    * the cheaper object by orders of magnitude.
    *
    * r19 (guide §1.2 — fewer passes): the r18 shape re-derived the
    * interpolation with an Exchange + Sort + two WindowExec passes +
    * HashAggregate over the counts frame. Spark's own `percentile`
    * aggregate takes a FREQUENCY argument — `percentile(value, qs, _c)`
    * over the counts frame runs the IDENTICAL `PercentileBase
    * .getPercentile` interpolation (bit-identical by construction, not
    * by replication) in ONE hash aggregate with map-side partials. Its
    * buffer is an OpenHashMap keyed by DISTINCT VALUE with summed
    * counts — the same value-domain bound as the window shape (a
    * per-group window sort held the same distinct rows in one task),
    * with the sort deferred to the final eval of one bounded buffer.
    * Plan diff per fence call: Exchange+Sort+2×Window+HashAggregate →
    * partial_percentile + Exchange + final percentile (see
    * plans/r19/q_mad_outliers_*.txt). RobustSpec still pins the
    * interpolation adversarially against row-level `percentile`. */
  private def fencesFromCounts(counts: DataFrame, value: String,
      qs: Seq[Double]): DataFrame = {
    // percentile ignores null values itself; the explicit filter keeps
    // the null-count rows (present for row totals) off the shuffle
    val nn = counts.filter(col(value).isNotNull)
    nn.groupBy(col("_r_group"))
      .agg(percentile(col(value), array(qs.map(lit): _*), col("_c")).as("_qq"))
      .select(col("_r_group") +:
        qs.indices.map(i => col("_qq").getItem(i).as(s"_q$i")): _*)
  }

  // ---- r19: one-pass exact aggregates over the value distribution.
  //
  // The r18 exact paths were value-domain-bounded but still ran as a
  // CHAIN: counts checkpoint → fence aggregate → broadcast → deviation
  // shuffle → checkpoint → fence aggregate → broadcast → final fold —
  // 5 sequential jobs, 2 checkpoints and 2 broadcasts per query, a fixed
  // constant the driver's r18 bench flagged at sf0.1 (q_mad_outliers
  // 2.73 → 3.57 s). But once the per-group distribution (value → count)
  // is IN ONE BUFFER — which every fence computation already required —
  // the entire operator (median, deviation distribution, MAD, fence
  // counts / trim fold) is a driver-free O(k log k) computation over that
  // buffer. So exact mad/trimmed are now ONE aggregation each (guide
  // §1.2: the fewest passes the operation fundamentally needs): partial
  // (value → count) maps combine map-side, merge by key, and `finish`
  // interpolates + folds. The memory bound is UNCHANGED (distinct values
  // per group, exactly what the window sort / percentile buffer held);
  // the plan loses every Exchange but the one groupBy, every checkpoint
  // and every broadcast (plans/r19/q_mad_outliers_{before,after}.txt).
  //
  // Exactness: `pctFromSorted` replicates Spark `Percentile`'s
  // getPercentile arithmetic bit-for-bit — position = (N−1)·q in double,
  // lower/higher = floor/ceil as longs, value-equality short-circuits,
  // `(higher − pos)·lowerKey + (pos − lower)·higherKey` in that double
  // order — and the deviation/trim folds replicate the column
  // expressions they replace (long→double promotion in comparisons,
  // ANSI-loud int64 sums). RobustSpec pins all of it against row-level
  // `percentile` references on adversarial data (nulls, duplicate runs,
  // singleton groups, fractional ranks); the DuckDB oracle gates the
  // queries end to end.

  /** Per-group distribution buffer: (value → count) plus the null-valued
    * row count (nulls are outside every fence but inside n_rows, exactly
    * like the join-based shapes these aggregates replace). */
  final case class DistState(nullRows: Long, m: Map[Long, Long])

  /** madOutliers result row; a group with no non-null values yields SQL
    * NULL (the old inner-join-on-fences shape dropped such groups). */
  final case class MadRes(n_rows: Long, n_outliers: Long, mad: Double)

  /** trimmedStats result row; trimmed_mean is None when nothing is kept
    * (the old sum(when(kept…)) returned NULL). */
  final case class TrimRes(n_rows: Long, n_kept: Long,
      trimmed_mean: Option[Double], lo_fence: Double, hi_fence: Double)

  /** Interpolated percentile over a sorted distinct-key distribution —
    * Spark `PercentileBase.getPercentile` (4.1.2) bit-for-bit. `keyD(i)`
    * is the i-th smallest key as double; `cum(i)` its inclusive
    * cumulative count. */
  private def pctFromSorted(keyD: Int => Double, cum: Array[Long], q: Double): Double = {
    val n = cum(cum.length - 1)
    val pos = (n - 1) * q
    val lower = math.floor(pos).toLong
    val higher = math.ceil(pos).toLong
    // the key covering 0-based rank r is the first index with cum > r
    def idxAt(r: Long): Int = {
      var lo = 0; var hi = cum.length - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cum(mid) > r) hi = mid else lo = mid + 1
      }
      lo
    }
    val li = idxAt(lower)
    if (higher == lower) return keyD(li)
    val hi = idxAt(higher)
    if (hi == li) return keyD(li) // distinct sorted keys: same index ⇔ equal key
    (higher - pos) * keyD(li) + (pos - lower) * keyD(hi)
  }

  private def reduceState(s: DistState, x: (java.lang.Long, java.lang.Long)): DistState = {
    val c = x._2.longValue
    if (x._1 == null) s.copy(nullRows = s.nullRows + c)
    else {
      val v = x._1.longValue
      s.copy(m = s.m.updated(v, s.m.getOrElse(v, 0L) + c))
    }
  }

  private def mergeState(a: DistState, b: DistState): DistState =
    DistState(a.nullRows + b.nullRows,
      b.m.foldLeft(a.m) { case (acc, (v, c)) => acc.updated(v, acc.getOrElse(v, 0L) + c) })

  /** Sorted keys + inclusive cumulative counts of a distribution map. */
  private def sortedCum(m: Map[Long, Long]): (Array[Long], Array[Long]) = {
    val keys = m.keysIterator.toArray
    java.util.Arrays.sort(keys)
    val cum = new Array[Long](keys.length)
    var t = 0L
    var i = 0
    while (i < keys.length) { t += m(keys(i)); cum(i) = t; i += 1 }
    (keys, cum)
  }

  private final case class MadFromCounts(fence: Double)
      extends Aggregator[(java.lang.Long, java.lang.Long), DistState, Option[MadRes]] {
    override def zero: DistState = DistState(0L, Map.empty)
    override def reduce(s: DistState, x: (java.lang.Long, java.lang.Long)): DistState =
      reduceState(s, x)
    override def merge(a: DistState, b: DistState): DistState = mergeState(a, b)
    override def finish(s: DistState): Option[MadRes] = {
      if (s.m.isEmpty) return None
      val (keys, cum) = sortedCum(s.m)
      val med = pctFromSorted(i => keys(i).toDouble, cum, 0.5)
      // deviation distribution: |v − med| in double (long − double
      // promotion, like the abs(col − _med) column it replaces); abs
      // never yields -0.0, so double keys merge exactly like groupBy
      val dm = scala.collection.mutable.HashMap.empty[Double, Long]
      var i = 0
      while (i < keys.length) {
        val d = math.abs(keys(i).toDouble - med)
        dm.update(d, dm.getOrElse(d, 0L) + (cum(i) - (if (i == 0) 0L else cum(i - 1))))
        i += 1
      }
      val dk = dm.keysIterator.toArray
      java.util.Arrays.sort(dk)
      val dcum = new Array[Long](dk.length)
      var t = 0L
      i = 0
      while (i < dk.length) { t += dm(dk(i)); dcum(i) = t; i += 1 }
      val mad = pctFromSorted(i => dk(i), dcum, 0.5)
      var out = 0L
      i = 0
      while (i < dk.length) {
        if (dk(i) > fence * mad) out += dcum(i) - (if (i == 0) 0L else dcum(i - 1))
        i += 1
      }
      Some(MadRes(cum(cum.length - 1) + s.nullRows, out, mad))
    }
    override def bufferEncoder: Encoder[DistState] = ExpressionEncoder()
    override def outputEncoder: Encoder[Option[MadRes]] = ExpressionEncoder()
  }

  private final case class TrimFromCounts(loQ: Double, hiQ: Double)
      extends Aggregator[(java.lang.Long, java.lang.Long), DistState, Option[TrimRes]] {
    override def zero: DistState = DistState(0L, Map.empty)
    override def reduce(s: DistState, x: (java.lang.Long, java.lang.Long)): DistState =
      reduceState(s, x)
    override def merge(a: DistState, b: DistState): DistState = mergeState(a, b)
    override def finish(s: DistState): Option[TrimRes] = {
      if (s.m.isEmpty) return None
      val (keys, cum) = sortedCum(s.m)
      val lo = pctFromSorted(i => keys(i).toDouble, cum, loQ)
      val hi = pctFromSorted(i => keys(i).toDouble, cum, hiQ)
      var kept = 0L
      var sumKept = 0L
      var i = 0
      while (i < keys.length) {
        val kd = keys(i).toDouble // long ≥ double comparison promotes, as in SQL
        if (kd >= lo && kd <= hi) {
          val c = cum(i) - (if (i == 0) 0L else cum(i - 1))
          kept += c
          // ANSI-loud at the same magnitudes as sum(value · _c) in SQL
          sumKept = Math.addExact(sumKept, Math.multiplyExact(keys(i), c))
        }
        i += 1
      }
      Some(TrimRes(cum(cum.length - 1) + s.nullRows, kept,
        if (kept == 0) None else Some(sumKept.toDouble / kept), lo, hi))
    }
    override def bufferEncoder: Encoder[DistState] = ExpressionEncoder()
    override def outputEncoder: Encoder[Option[TrimRes]] = ExpressionEncoder()
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
      // r19 exact path: ONE aggregation — the counts shuffle feeds
      // MadFromCounts, whose finish computes median, deviation
      // distribution, MAD and the fence fold over the in-buffer
      // distribution (see the r19 block above; was a 5-job chain with
      // 2 checkpoints + 2 broadcasts in r18, 3 corpus scans + 2
      // percentile reducer sorts before that).
      groupValueCounts(df, group, value)
        .groupBy(col("_r_group").as(group))
        .agg(udaf(MadFromCounts(fence)).apply(col(value), col("_c")).as("_r"))
        // a group with no non-null values has no fences — the old
        // inner-join-on-fences shape dropped it, so does this
        .filter(col("_r").isNotNull)
        // coalesce keeps n_rows/n_outliers non-nullable (count(1) was in
        // sketch mode), so the mode switch stays schema-invisible
        .select(col(group),
          coalesce(col("_r.n_rows"), lit(0L)).as("n_rows"),
          coalesce(col("_r.n_outliers"), lit(0L)).as("n_outliers"),
          col("_r.mad").as("mad"))
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
      // r19 exact path: ONE aggregation — fences AND the trimmed fold
      // run inside TrimFromCounts.finish over the in-buffer distribution
      // (see the r19 block above). Row sums still fold counts: Σ_rows v ≡
      // Σ_distinct v·c exactly (int64, ANSI-loud at the same total).
      groupValueCounts(df, group, value)
        .groupBy(col("_r_group").as(group))
        .agg(udaf(TrimFromCounts(loQ, hiQ)).apply(col(value), col("_c")).as("_r"))
        .filter(col("_r").isNotNull) // all-null groups had no fences (see madOutliers)
        // coalesce: schema-invisible mode switch (see madOutliers)
        .select(col(group),
          coalesce(col("_r.n_rows"), lit(0L)).as("n_rows"),
          coalesce(col("_r.n_kept"), lit(0L)).as("n_kept"),
          col("_r.trimmed_mean").as("trimmed_mean"),
          col("_r.lo_fence").as("lo_fence"), col("_r.hi_fence").as("hi_fence"))
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
