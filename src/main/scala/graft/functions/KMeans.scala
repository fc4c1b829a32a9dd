package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed k-means (Lloyd) over quantized integer vectors —
  * the full fit loop behind `q_kmeans_fit`, generalizing the single
  * oracle-gated step (`q_kmeans_step`).
  *
  * Exactness: centroids are never materialized as doubles mid-loop.
  * A cluster is its integer element-sum vector `s` plus its count `cn`
  * (centroid = s/cn as a rational); the scaled distance to it is
  * d2 = Σ(cn·q_i − s_i)² = cn²·|q − s/cn|², and nearest-centroid across
  * clusters of UNEQUAL size compares the rationals d2/cn² by
  * cross-multiplication in decimal(38,0) — so every assignment is exact
  * and deterministic, and both engines would fail LOUDLY (ANSI overflow)
  * past the documented headroom rather than diverge silently.
  *
  * Scale shape per iteration: cluster sums broadcast (k × (dim+1)
  * integers, folded into ONE array-of-structs row); assignment is a
  * NARROW per-row argmin over that broadcast array — no per-candidate
  * row blowup, no shuffle keyed on vec_id; the recompute is one
  * map-side-combined groupBy(cluster) aggregation whose state is the
  * bounded (dim+1)-long partial sum vector. The corpus is read twice
  * per iteration and shuffles only those bounded partials.
  *
  * Iteration hygiene (same lessons as
  * [[graft.functions.ConnectedComponents]]): per-iteration survivors
  * (assignments) are localCheckpoint'ed so unpersisting a previous
  * iteration can never force a recompute through stale lineage, and the
  * convergence check (moved = 0 — an EXACT fixpoint, possible because
  * assignments are exact integers, not double-rounded) shares one
  * action with the objective read and the moved flag is computed INLINE
  * in the assignment row (prev label travels with the row), so no
  * prev-vs-next join runs at all.
  */
object KMeans {

  /** The comparator lambda shared by every exact nearest-cluster sort:
    * orders (cl, cn, d2) candidates by the EXACT rational distance
    * d2/cn² — cross-multiplied in decimal(38,0) (the products exceed
    * int64 already at sf0.01), ties by cl. Comparing raw d2 = cn²·dist²
    * would bias the ordering toward small clusters. */
  private def exactCmp: String =
    "(a, b) -> CASE " +
      "WHEN CAST(a.d2 AS DECIMAL(38,0))*b.cn*b.cn < CAST(b.d2 AS DECIMAL(38,0))*a.cn*a.cn THEN -1 " +
      "WHEN CAST(a.d2 AS DECIMAL(38,0))*b.cn*b.cn > CAST(b.d2 AS DECIMAL(38,0))*a.cn*a.cn THEN 1 " +
      "WHEN a.cl < b.cl THEN -1 WHEN a.cl > b.cl THEN 1 ELSE 0 END"

  /** SQL fragment: ALL candidates from a `cands` array column of
    * (cl, s, cn) structs scored against the row's `q` and sorted under
    * the exact rational comparator — computed per ROW (narrow, inside
    * codegen), never as a per-(row × candidate) join. `element_at(…, 1)`
    * of this is the exact nearest cluster; `slice(…, 1, p)` is an exact
    * probe list. */
  def nearestSorted(cands: String = "cands", q: String = "q"): String = {
    val scored = s"transform($cands, c -> named_struct(" +
      s"'cl', c.cl, 'cn', c.cn, " +
      s"'d2', aggregate(zip_with($q, c.s, (x, y) -> (c.cn*x - y)*(c.cn*x - y)), " +
      "CAST(0 AS BIGINT), (acc, v) -> acc + v)))"
    s"array_sort($scored, $exactCmp)"
  }

  /** The k cluster descriptors folded into ONE (cands: array<struct(cl,
    * s, cn)>) row, the unit the narrow argmin broadcasts. Bounded by k —
    * a model parameter, never corpus-proportional. */
  def candidatesRow(cs: DataFrame): DataFrame =
    cs.agg(collect_list(struct(col("cl"), col("s"), col("cn"))).as("cands"))

  /** Exact per-label element sums of quantized vectors as (cl, s[dim],
    * cn) from a frame with (label, q) columns — ONE map-side-combined
    * shuffle whose aggregation state is the bounded (dim+1)-long partial
    * vector per label (never `collect_list(q)`, whose buffer would hold
    * every vector of a label and OOM a task at corpus scale).
    *
    * `dim` is the fixed vector width (a model constant, 64 for the
    * `embeddings` table); rows narrower than `dim` fail LOUDLY on the
    * out-of-bounds `element_at` rather than silently truncating. */
  def labelSums(emb: DataFrame, dim: Int = 64): DataFrame =
    emb.groupBy(col("label").as("cl"))
      .agg(array((1 to dim).map(i => sum(element_at(col("q"), i))): _*).as("s"),
        count(lit(1)).as("cn"))

  /** Cluster sums under an explicit assignment (vec_id, cl). */
  def clusterSums(emb: DataFrame, asg: DataFrame): DataFrame =
    labelSums(emb
      .join(asg.toDF("a_vec_id", "a_cl"), col("vec_id") === col("a_vec_id"))
      .select(col("a_cl").as("label"), col("q")))

  /** Exact nearest-cluster assignment: (vec_id, cl, d2n) where d2n is
    * the winning scaled squared distance d2/cn² as a double (exact
    * comparisons happen BEFORE this one presentational division — d2n
    * exists for objective tracking, not for ordering). Narrow: one
    * corpus pass against the broadcast candidate row, no shuffle. */
  def assign(emb: DataFrame, cs: DataFrame): DataFrame =
    emb.crossJoin(broadcast(candidatesRow(cs)))
      // empty-cs guard: the legacy join shape dropped every row when no
      // cluster existed; keep that contract (and keep ANSI element_at
      // off the empty array)
      .filter(size(col("cands")) > 0)
      .withColumn("w", expr(s"element_at(${nearestSorted()}, 1)"))
      .select(col("vec_id"), col("w.cl").as("cl"),
        (col("w.d2").cast("double") /
          (col("w.cn") * col("w.cn")).cast("double")).as("d2n"))

  /** Fit result: converged assignments (vec_id, cl, d2n), final cluster
    * sums (cl, s, cn), iterations actually run, whether the assignment
    * fixpoint was reached, and the per-iteration objective (Σ d2/cn² in
    * quantized units — monotonically non-increasing by Lloyd's
    * argument). Assignment and cluster frames are localCheckpoint'ed
    * and registry-registered (the harness reclaims them after the
    * consuming query materializes); direct library users can
    * [[Fit.release]] earlier. */
  final case class Fit(assignments: DataFrame, clusters: DataFrame,
                       iterations: Int, converged: Boolean,
                       objective: Seq[Double]) {
    def release(): Unit = {
      Checkpoints.releaseNow(assignments)
      Checkpoints.releaseNow(clusters)
    }
  }

  /** Lloyd iterations from the `label` column init until the assignment
    * fixpoint or `maxIter`. `emb` must carry (vec_id, label, q). */
  def fit(emb: DataFrame, maxIter: Int): Fit = {
    require(maxIter >= 1)
    val e = emb.select(col("vec_id"), col("label"), col("q")).persist()
    e.count()
    var asg = e.select(col("vec_id"), col("label").as("cl")).localCheckpoint(true)
    var obj = List.empty[Double]
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // The iteration's whole dataflow fans out of ONE small join
      // (cached e ⋈ checkpointed asg — the prev label rides along):
      // cluster sums reduce it map-side; the broadcast candidate row
      // then drives the NARROW re-assignment, whose rows carry
      // (new cl, d2n, moved) so the single stats action below reads
      // convergence and objective with no prev-vs-next join.
      val ea = e.join(asg.select(col("vec_id").as("a_vec"), col("cl").as("p_cl")),
          col("vec_id") === col("a_vec"))
        .select(col("vec_id"), col("q"), col("p_cl"))
      val cands = candidatesRow(labelSums(ea.select(col("p_cl").as("label"), col("q"))))
      // LAZY checkpoint: the stats action computes (and thereby
      // checkpoints) next in the same job — an eager checkpoint would
      // spend an extra job on the same work
      val next = ea.crossJoin(broadcast(cands))
        .filter(size(col("cands")) > 0)
        .withColumn("w", expr(s"element_at(${nearestSorted()}, 1)"))
        .select(col("vec_id"), col("w.cl").as("cl"),
          (col("w.d2").cast("double") /
            (col("w.cn") * col("w.cn")).cast("double")).as("d2n"),
          (col("w.cl") =!= col("p_cl")).as("moved"))
        .localCheckpoint(false)
      val stats = next
        .agg(count(when(col("moved"), 1)).as("moved"), sum(col("d2n")).as("obj"))
        .head()
      // empty input: sum(d2n) aggregates to NULL (SQL semantics) — read
      // it as a zero objective instead of NPEing; moved=0 then ends the
      // loop at the fixpoint with well-formed empty frames
      obj ::= (if (stats.isNullAt(1)) 0.0 else stats.getDouble(1))
      // RDD-level release (Dataset.unpersist is a no-op for checkpoint
      // blocks) — safe NOW because `next` materialized in the stats
      // action above
      Checkpoints.releaseNow(asg)
      asg = next
      iter += 1
      converged = stats.getLong(0) == 0L
    }
    val out = asg.select(col("vec_id"), col("cl"), col("d2n"))
    val cs = clusterSums(e, asg.select(col("vec_id"), col("cl"))).localCheckpoint(true)
    e.unpersist() // plain persist() — the CacheManager path applies
    Fit(Checkpoints.register(out), Checkpoints.register(cs),
      iter, converged, obj.reverse)
  }
}
