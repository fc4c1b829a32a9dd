package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable frequency sketches for heavy-hitter mining at scale.
  *
  * The exact heavy-hitters query (`q_heavy_hitters`) shuffles one row per
  * DISTINCT token — fine while the vocabulary is bounded, quadratic pain
  * when it is not (URLs, n-grams, user ids). The Misra–Gries summary is
  * the classic fix: a fixed-k counter map per partition, merged
  * associatively, that provably contains EVERY item whose true count
  * exceeds N/k (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012). Spark shape: partial sketches build
  * map-side inside one hash aggregate (no shuffle of token rows at all —
  * only k-entry maps cross the wire), and a second exact pass counts just
  * the candidates, turning the approximate sketch into an EXACT top-q
  * answer whenever the q-th count clears the N/k guarantee line.
  */
object Sketches {

  /** Misra–Gries counter summary over strings with capacity `k`.
    *
    * State is an immutable counter map (≤ k entries). `reduce` increments
    * or, at capacity, decrements every counter (dropping zeros) — the MG
    * step that charges one occurrence of each resident item to the new
    * arrival. `merge` sums counts then subtracts the (k+1)-th largest
    * count from everything (the mergeable-summaries rule), keeping the
    * error bound additive across partials. Guarantee: est(x) ≤ true(x) ≤
    * est(x) + N/(k+1) for every x, and any x with true(x) > N/(k+1) is
    * present in the final map.
    */
  final case class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0)

    override def zero: Map[String, Long] = Map.empty

    override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
      if (x == null) m
      else m.get(x) match {
        case Some(c) => m.updated(x, c + 1L)
        case None if m.size < k => m.updated(x, 1L)
        case None => // decrement-all; the arrival cancels against residents
          m.collect { case (t, c) if c > 1L => t -> (c - 1L) }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count, drop non-positives
        val cut = sum.valuesIterator.toArray.sortBy(-_).apply(k)
        sum.collect { case (t, c) if c > cut => t -> (c - cut) }
      }
    }

    override def finish(m: Map[String, Long]): Map[String, Long] = m

    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Column form: `misraGries(256)(col("term"))` → one `map<string,bigint>`. */
  def misraGries(k: Int)(c: Column): Column = udaf(MisraGries(k)).apply(c)

  /** State of [[QuantileSketch]]: `levels(i)` holds items each standing
    * for 2^i original rows (level 0 = raw intake); `flips` is one
    * alternation bit per level so consecutive compactions take odd/even
    * positions in turn (cancels the halving bias). */
  final case class QSketchState(levels: Vector[Vector[Double]], flips: Long)

  /** Mergeable quantile sketch — the deterministic compactor stack
    * (Munro & Paterson 1980 selection buffers; the unweighted ancestor of
    * KLL), built so EXACT `percentile`'s reducer-buffering never has to
    * run at 100 TB:
    *
    *   - `reduce` appends to a level-0 buffer; a full level (2k items)
    *     sorts, promotes every second element to the next level (each now
    *     standing for twice the rows), and holds back one element on odd
    *     sizes — held items keep their true weight, so only the halving
    *     steps introduce rank error;
    *   - `merge` concatenates level-wise then re-compacts — fully
    *     associative/commutative up to the deterministic alternation
    *     bits, so partial sketches combine map-side like any aggregate;
    *   - `finish` reads requested quantiles off the weighted summary
    *     (first value whose cumulative weight reaches ⌈q·W⌉; total weight
    *     W is preserved exactly by construction).
    *
    * Space: O(k·log(n/k)) doubles per group, fixed per level — vs the
    * exact operator's O(group) reducer buffer. Rank error: each level-i
    * compaction perturbs a fixed rank by ≤ 2^(i-1); with alternation the
    * observed error is well under n·L/(2k) for L levels (the property
    * spec pins a 1.5·n·L/(2k) envelope over arbitrary splits/merge
    * orders, plus an absolute 2% ceiling at k=256 against exact
    * percentiles).
    */
  final case class QuantileSketch(k: Int, qs: Seq[Double])
      extends Aggregator[java.lang.Double, QSketchState, Array[Double]] {
    require(k >= 8, "compactor capacity k must be >= 8")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
    private val cap = 2 * k

    override def zero: QSketchState = QSketchState(Vector(Vector.empty), 0L)

    // boxed input: a primitive Double would decode SQL NULL as 0.0 and
    // COUNT it — SQL aggregates skip nulls, and so does this one
    override def reduce(s: QSketchState, x: java.lang.Double): QSketchState =
      if (x == null) s
      else compact(QSketchState(s.levels.updated(0, s.levels(0) :+ x.doubleValue), s.flips))

    override def merge(a: QSketchState, b: QSketchState): QSketchState = {
      val n = math.max(a.levels.length, b.levels.length)
      val lv = Vector.tabulate(n) { i =>
        a.levels.applyOrElse(i, (_: Int) => Vector.empty[Double]) ++
          b.levels.applyOrElse(i, (_: Int) => Vector.empty[Double])
      }
      compact(QSketchState(lv, a.flips ^ b.flips))
    }

    private def compact(s0: QSketchState): QSketchState = {
      var levels = s0.levels
      var flips = s0.flips
      var i = 0
      while (i < levels.length) {
        if (levels(i).length >= cap) {
          val sorted = levels(i).sorted
          val off = ((flips >> i) & 1L).toInt
          flips ^= 1L << i
          // odd size: hold ONE element back at its true weight (no error)
          val (body, hold) =
            if (sorted.length % 2 == 0) (sorted, Vector.empty[Double])
            else (sorted.init, Vector(sorted.last))
          val promoted = (off until body.length by 2).map(body).toVector
          levels = levels.updated(i, hold)
          levels =
            if (i + 1 >= levels.length) levels :+ promoted
            else levels.updated(i + 1, levels(i + 1) ++ promoted)
        }
        i += 1
      }
      QSketchState(levels, flips)
    }

    override def finish(s: QSketchState): Array[Double] = {
      val items = for {
        (lvl, i) <- s.levels.zipWithIndex
        v <- lvl
      } yield (v, 1L << i)
      if (items.isEmpty) return qs.map(_ => Double.NaN).toArray
      val sorted = items.sortBy(_._1)
      val total = sorted.iterator.map(_._2).sum
      qs.map { q =>
        val target = math.max(1L, math.ceil(q * total).toLong)
        var cum = 0L
        var idx = 0
        var res = sorted.last._1
        var found = false
        while (idx < sorted.length && !found) {
          cum += sorted(idx)._2
          if (cum >= target) { res = sorted(idx)._1; found = true }
          idx += 1
        }
        res
      }.toArray
    }

    override def bufferEncoder: Encoder[QSketchState] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  }

  /** Column form: `quantileSketch(256, Seq(.25,.5,.9))(col("x"))` →
    * `array<double>` of the requested quantiles. */
  def quantileSketch(k: Int, qs: Seq[Double])(c: Column): Column =
    udaf(QuantileSketch(k, qs)).apply(c)
}
