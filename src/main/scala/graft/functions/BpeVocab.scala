package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE-style vocabulary induction over a tokenized corpus — the
  * canonical tokenizer-training loop (Sennrich et al. 2016), distributed:
  * each round counts ADJACENT token pairs corpus-wide (one map-side-
  * combined aggregation — the same shape as the oracle-gated
  * `q_ngram_stats` bigram count), picks the most frequent pair on the
  * driver (a 1-row argmax with a deterministic (freq desc, pair asc)
  * tie-break), and rewrites every document by greedy leftmost
  * non-overlapping substitution of that pair with its merged symbol.
  *
  * Scale shape per round: the pair count shuffles only (l, r, n)
  * aggregate partials (vocabulary-sized, not corpus-sized); the merge is
  * a narrow per-row array fold (no shuffle); iteration hygiene is the
  * [[KMeans.fit]] discipline — each round's corpus is lazily
  * localCheckpoint'ed so round k+1's pair count never re-runs round k's
  * rewrite chain, and the superseded checkpoint is unpersisted after its
  * successor materializes.
  *
  * Exactness: counts are exact longs; the argmax tie-break is total
  * (freq desc, left asc, right asc), so the learned merge table is
  * deterministic for any partitioning — BpeSpec pins round 1 against an
  * independent recount and the repartition-invariance.
  */
object BpeVocab {

  final case class Merge(step: Int, left: String, right: String, pair_freq: Long)

  /** Learned merge table + the corpus after all merges (doc_id, toks).
    * The corpus is a materialized localCheckpoint — call [[Fit.release]]
    * when done with it (the merge table is plain driver data and
    * survives), otherwise the checkpointed blocks live for the session
    * (neither `spark.catalog.clearCache` nor `Dataset.unpersist` drops
    * RDD-level checkpoint blocks — release goes through
    * [[Checkpoints.releaseNow]]). */
  final case class Fit(merges: Seq[Merge], corpus: DataFrame) {
    def release(): Unit = Checkpoints.releaseNow(corpus)
  }

  /** Adjacent-pair frame (l, r, n) of a (doc_id, toks) corpus.
    *
    * r19 (guide codegen/expressions): the pair arrays are built with
    * `arrays_zip` over two `slice`s — ordinary codegen expressions —
    * instead of a `transform(sequence(…))` lambda, which is an
    * interpreted higher-order function (CodegenFallback, one boxed eval
    * per token per round on the fit loop's corpus pass). Identical
    * pairs: slice(toks, 1, size-1) zipped with slice(toks, 2, size-1)
    * is exactly ((toks[i-1], toks[i]))_{i=1..size-1}; the size < 2
    * branch still yields no rows (slice length 0 each — and the old
    * explicit guard stays for the sequence-descends trap it documents). */
  def pairCounts(corpus: DataFrame): DataFrame =
    corpus.select(explode(expr(
        "CASE WHEN size(toks) < 2 THEN CAST(array() AS ARRAY<STRUCT<l: STRING, r: STRING>>) " +
          "ELSE CAST(arrays_zip(slice(toks, 1, size(toks) - 1), " +
          "slice(toks, 2, size(toks) - 1)) AS ARRAY<STRUCT<l: STRING, r: STRING>>) END")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(count(lit(1)).as("n"))

  /** Greedy leftmost non-overlapping substitution of the (left, right)
    * pair with the merged symbol "left right".
    *
    * left ≠ right (the common case): two (l, r) windows can only overlap
    * when l = r (window i+1 would need toks[i+1] = l AND = r), so every
    * match merges independently — one LINEAR transform over indices
    * (emit merged at a match, drop the consumed right half, copy
    * everything else) and a null-filter. No sequential state.
    *
    * left == right (a self-pair like (a, a)): within a run of equal
    * tokens greedy leftmost takes every OTHER window, which is
    * inherently sequential, so this branch keeps the array fold — when
    * the running output ends with `left` and the next token is `right`,
    * the tail is replaced by the merged symbol (so "a a a" yields
    * [aa, a] — the standard BPE overlap rule). The fold copies its
    * accumulator per step (O(len²) per doc) — acceptable because
    * self-pairs are rare in real merge tables and the linear branch
    * handles everything else. */
  private[graft] def mergeExpr(left: String, right: String): Column = {
    def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    val (l, r, m) = (q(left), q(right), q(left) + " " + q(right))
    if (left != right)
      expr(
        // size < 2 guard: sequence(0, -1) DESCENDS on an empty array
        s"CASE WHEN size(toks) < 2 THEN toks ELSE " +
          s"filter(transform(sequence(0, size(toks) - 1), i -> " +
          s"CASE WHEN toks[i] = '$l' AND i + 1 < size(toks) AND toks[i+1] = '$r' THEN '$m' " +
          s"WHEN i > 0 AND toks[i-1] = '$l' AND toks[i] = '$r' THEN CAST(NULL AS STRING) " +
          s"ELSE toks[i] END), x -> x IS NOT NULL) END")
    else
      expr(
        s"aggregate(toks, CAST(array() AS ARRAY<STRING>), (acc, x) -> " +
          s"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$l' AND x = '$r' " +
          s"THEN concat(slice(acc, 1, size(acc) - 1), array('$m')) " +
          s"ELSE concat(acc, array(x)) END)")
  }

  /** Run `rounds` total merges (fewer if the corpus runs out of pairs),
    * applying up to `batch` NON-INTERACTING merges per corpus rewrite
    * pass. `docs` must carry (doc_id, toks: array<string>).
    *
    * Batching is the standard fix for the one-corpus-pass-per-merge
    * cost model (a realistic 32k-merge tokenizer run must not make 32k
    * corpus passes): per round, take the pair frame's top rows in the
    * total order (n desc, l asc, r asc) and keep the longest PREFIX
    * that is (a) pairwise symbol-disjoint and (b) separated from the
    * first excluded pair by a STRICT count gap (trailing ties with the
    * cut are dropped; if that leaves nothing, fall back to the plain
    * 1-pair argmax, which is always correct). The kept pairs are applied
    * as one composed rewrite (chained [[mergeExpr]] projections — ONE
    * pass over the corpus, collapsed by Catalyst) and recorded as
    * consecutive steps.
    *
    * This selection makes batched ≡ sequential PROVABLY (BpeSpec pins
    * it): applying a selected merge leaves every other selected pair's
    * count unchanged (disjoint symbols: no shared window, no created or
    * destroyed adjacency over those symbols); every non-selected
    * original pair ranks at or below the cut (prefix-closedness) and
    * its count can only decrease; and every NEW pair (one involving a
    * merged symbol) injects into instances of an original pair that
    * shares a symbol with an applied merge — hence non-selected, hence
    * count ≤ the cut < every selected count (the strict gap). So the
    * sequential argmax at step i is exactly the i-th selected pair,
    * with identical recorded frequencies. */
  def fit(docs: DataFrame, rounds: Int, batch: Int = 1): Fit = {
    require(rounds >= 1 && batch >= 1)
    // PRECONDITION (also binds encode): input tokens must be SPACE-FREE.
    // Merged symbols are encoded as l+" "+r, and both the
    // batched≡sequential selection proof and encode's n_absorbed
    // conservation (which counts embedded spaces) rely on that encoding
    // being injective — a token that already contains a space would
    // alias a merge. Any whitespace-split tokenizer satisfies this;
    // check a bounded sample loudly rather than scan the corpus.
    val spaced = docs.select(col("toks")).limit(64)
      .select(explode(col("toks")).as("t"))
      .filter(col("t").contains(" ")).limit(1).count()
    require(spaced == 0,
      "BPE input tokens must not contain spaces (sampled check): merged " +
        "symbols are encoded l + \" \" + r, so spaced input tokens would " +
        "alias merges and break the batched==sequential equivalence")
    var corpus = docs.select(col("doc_id"), col("toks")).localCheckpoint(false)
    // deferred unpersist (one job per round, not two): round k+1's argmax
    // action is what materializes round k's rewrite checkpoint, and only
    // THEN is round k-1's checkpoint safe to drop — a localCheckpoint's
    // lineage is cut, so unpersisting a parent before its child
    // materializes would lose the data unrecoverably (KMeans discipline)
    var prev: Option[DataFrame] = None
    val merges = List.newBuilder[Merge]
    var step = 1
    var dry = false
    while (step <= rounds && !dry) {
      val want = math.min(batch, rounds - step + 1)
      val top = pairCounts(corpus)
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(want + 1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      prev.foreach(Checkpoints.releaseNow) // `corpus` just materialized above
      prev = None
      if (top.isEmpty) dry = true // empty corpus or all single-token docs
      else {
        // longest symbol-disjoint prefix of the total order, capped
        val used = scala.collection.mutable.Set.empty[String]
        val selected = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var i = 0
        var blocked = false
        while (!blocked && i < top.length && selected.length < want) {
          val (l, r, _) = top(i)
          if (used(l) || used(r)) blocked = true
          else { selected += top(i); used += l; used += r; i += 1 }
        }
        // strict-gap truncation vs the first excluded pair: a selected
        // pair tying the cut could be overtaken by a new merged-symbol
        // pair with the same count but an earlier tie-break — drop the
        // trailing ties, keeping at least the argmax itself
        if (i < top.length) {
          val cutN = top(i)._3
          while (selected.length > 1 && selected.last._3 == cutN)
            selected.dropRightInPlace(1)
        }
        selected.foreach { case (l, r, n) => merges += Merge(step, l, r, n); step += 1 }
        prev = Some(corpus)
        // r19: the composed rewrite runs as ONE native scan per document
        // ([[graft.plans.BpeOps.applyMerges]] — sequential application of
        // the selected merges, exactly the chained mergeExpr semantics;
        // BpeExprSpec pins native ≡ chained-interpreted on the corpus)
        corpus = corpus.withColumn("toks", graft.plans.BpeExpressions.applyMerges(
            col("toks"), selected.toSeq.map(t => (t._1, t._2))))
          .localCheckpoint(false)
      }
    }
    // materialize the final corpus (it is lazy over `prev`), then drop
    // the superseded parent — the returned Fit owns exactly ONE
    // checkpointed frame, released via Fit.release()
    corpus.count()
    prev.foreach(Checkpoints.releaseNow)
    Fit(merges.result(), corpus)
  }

  /** Tokenizer INFERENCE: apply a learned merge table to a corpus
    * carrying a `toks: array<string>` column, in step order — the
    * encode pass every training run executes over the full corpus after
    * [[fit]] learns the table once.
    *
    * The merge table is MODEL PARAMETERS — configuration-bounded, never
    * data-proportional — so it embeds into the plan as literals and the
    * whole encode is a chain of narrow per-row rewrites ([[mergeExpr]]):
    * NO shuffle touches the corpus, any other columns ride along
    * untouched. Greedy-leftmost application in step order is exactly the
    * sequential semantics [[fit]]'s batched selection is proven
    * equivalent to, so encode(docs, fit(docs).merges) reproduces
    * fit's final corpus bit-for-bit (BpeSpec pins it).
    *
    * r19: the whole table applies as ONE native expression
    * ([[graft.plans.BpeOps.applyMerges]] — one greedy scan per merge in
    * step order inside a single per-row loop, the mapPartitions-trie
    * shape the old plan-size note asked for without leaving Catalyst),
    * replacing |merges| chained interpreted mergeExpr projections
    * (higher-order lambdas are CodegenFallback — one boxed eval per
    * token per merge). BpeExprSpec pins native ≡ the chained mergeExpr
    * fold on the real corpus and on self-pair/overlap shapes; BpeSpec's
    * encode ≡ fit.corpus pin still holds by construction.
    *
    * Precondition: space-free input tokens, as in [[fit]] (merged
    * symbols are `l + " " + r`; the absorbed-token accounting counts
    * embedded spaces). */
  def encode(docs: DataFrame, merges: Seq[Merge]): DataFrame =
    if (merges.isEmpty) docs
    else docs.withColumn("toks", graft.plans.BpeExpressions.applyMerges(
      col("toks"), merges.sortBy(_.step).map(m => (m.left, m.right))))
}
