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
}
