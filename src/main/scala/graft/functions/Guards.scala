package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Checked scale contracts for plans whose shape depends on a frame
  * staying SMALL.
  *
  * A forced `broadcast(...)` hint bypasses Spark's
  * autoBroadcastJoinThreshold sizing entirely — if the hinted side is
  * secretly corpus-proportional, the plan OOMs executors at scale
  * instead of falling back to a shuffle join. The decontamination
  * queries hinge on exactly such a hint: their eval side is a
  * configuration-bounded benchmark suite by CONTRACT (thousands of
  * vectors / a few thousand exploded n-grams — never the corpus), and
  * [[boundedBroadcast]] turns that prose contract into a checked one,
  * so a corpus change that silently grows the "eval" side fails loudly
  * at build time with the measured count, not at executor OOM.
  */
object Guards {

  /** Default eval-side bound: 4M rows × ~16 bytes/row ≈ 64 MB of
    * broadcast payload — comfortably inside a 1-2 GiB executor's
    * broadcast budget while far above any real benchmark suite. */
  val MaxBroadcastRows: Long = 4L * 1000 * 1000

  /** Broadcast-hint `df` only after PROVING its row count is within
    * `maxRows`. The count is one extra cheap action over the (by
    * contract, tiny) frame; when the contract is violated the
    * IllegalArgumentException names the frame and both numbers — the
    * loud failure is the point, and its cost is irrelevant because the
    * query must not run with that plan anyway. */
  def boundedBroadcast(df: DataFrame, what: String,
                       maxRows: Long = MaxBroadcastRows): DataFrame = {
    val n = df.count()
    require(n <= maxRows,
      s"$what has $n rows, above the forced-broadcast bound $maxRows: " +
        "the frame is corpus-proportional, not configuration-bounded — " +
        "shrink the eval suite or drop the broadcast hint for a shuffle join")
    broadcast(df)
  }
}
