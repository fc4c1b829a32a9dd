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
  * integers); assignment is one corpus pass (narrow map + one
  * vec_id-keyed aggregation folding the k candidates through a sorted
  * array under the exact comparator — no self-join); the recompute is
  * one map-side-combined (cluster, dim) aggregation. The corpus is read
  * twice per iteration and shuffles only aggregate partials.
  *
  * Iteration hygiene (same lessons as
  * [[graft.functions.ConnectedComponents]]): per-iteration survivors
  * (assignments, cluster sums) are localCheckpoint'ed so unpersisting a
  * previous iteration can never force a recompute through stale
  * lineage, and the convergence check (moved = 0 — an EXACT fixpoint,
  * possible because assignments are exact integers, not
  * double-rounded) shares one action with the objective read.
  */
object KMeans {

  /** SQL fragment sorting collected (cl, cn, d2) candidates by the EXACT
    * rational distance d2/cn² — cross-multiplied in decimal(38,0) (the
    * products exceed int64 already at sf0.01), ties by cl. Comparing raw
    * d2 = cn²·dist² would bias the ordering toward small clusters. */
  val exactNearestSort: String =
    "array_sort(collect_list(struct(cl, cn, d2)), (a, b) -> CASE " +
      "WHEN CAST(a.d2 AS DECIMAL(38,0))*b.cn*b.cn < CAST(b.d2 AS DECIMAL(38,0))*a.cn*a.cn THEN -1 " +
      "WHEN CAST(a.d2 AS DECIMAL(38,0))*b.cn*b.cn > CAST(b.d2 AS DECIMAL(38,0))*a.cn*a.cn THEN 1 " +
      "WHEN a.cl < b.cl THEN -1 WHEN a.cl > b.cl THEN 1 ELSE 0 END)"

  /** Exact per-label element sums of quantized vectors as (cl, s[dim],
    * cn) from a frame with (label, q) columns. Built with BOUNDED
    * aggregation state: posexplode to (label, dim) int64 partials
    * (map-side combinable), then the k×dim result regroups into one
    * array per label — never `collect_list(q)`, whose buffer would hold
    * every vector of a label and OOM a task at corpus scale. */
  def labelSums(emb: DataFrame): DataFrame = {
    val dims = emb.select(col("label"), posexplode(col("q")).as(Seq("p", "x")))
      .groupBy(col("label"), col("p")).agg(sum(col("x")).as("sx"))
    val arrs = dims.groupBy(col("label").as("cl"))
      .agg(expr("transform(array_sort(collect_list(struct(p, sx))), t -> t.sx)").as("s"))
    val counts = emb.groupBy(col("label").as("c_cl")).agg(count(lit(1)).as("cn"))
    arrs.join(counts, col("cl") === col("c_cl"))
      .select(col("cl"), col("s"), col("cn"))
  }

  /** Cluster sums under an explicit assignment (vec_id, cl). */
  def clusterSums(emb: DataFrame, asg: DataFrame): DataFrame =
    labelSums(emb
      .join(asg.toDF("a_vec_id", "a_cl"), col("vec_id") === col("a_vec_id"))
      .select(col("a_cl").as("label"), col("q")))

  /** Exact nearest-cluster assignment: (vec_id, cl, d2n) where d2n is
    * the winning scaled squared distance d2/cn² as a double (exact
    * comparisons happen BEFORE this one presentational division — d2n
    * exists for objective tracking, not for ordering). */
  def assign(emb: DataFrame, cs: DataFrame): DataFrame = {
    val dt = emb.crossJoin(broadcast(cs))
      .withColumn("d2", expr("aggregate(zip_with(q, s, (x, y) -> (cn*x - y)*(cn*x - y)), " +
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .select(col("vec_id"), col("cl"), col("cn"), col("d2"))
    dt.groupBy(col("vec_id"))
      .agg(expr(s"element_at($exactNearestSort, 1)").as("w"))
      .select(col("vec_id"), col("w.cl").as("cl"),
        (col("w.d2").cast("double") /
          (col("w.cn") * col("w.cn")).cast("double")).as("d2n"))
  }

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
      // LAZY checkpoints: the one stats action below computes (and
      // thereby checkpoints) cs and next in a single job — eager
      // checkpoints would spend three jobs per iteration on the same
      // work. Unpersists follow the action, so nothing recomputes.
      val cs = clusterSums(e, asg.select(col("vec_id"), col("cl"))).localCheckpoint(false)
      val next = assign(e, cs).localCheckpoint(false)
      val prev = asg.select(col("vec_id").as("p_vec"), col("cl").as("p_cl"))
      val stats = next.join(prev, col("vec_id") === col("p_vec"))
        .agg(count(when(col("cl") =!= col("p_cl"), 1)).as("moved"),
          sum(col("d2n")).as("obj"))
        .head()
      // empty input: sum(d2n) aggregates to NULL (SQL semantics) — read
      // it as a zero objective instead of NPEing; moved=0 then ends the
      // loop at the fixpoint with well-formed empty frames
      obj ::= (if (stats.isNullAt(1)) 0.0 else stats.getDouble(1))
      // RDD-level release (Dataset.unpersist is a no-op for checkpoint
      // blocks) — safe NOW because `next` materialized in the stats
      // action above
      Checkpoints.releaseNow(cs)
      Checkpoints.releaseNow(asg)
      asg = next
      iter += 1
      converged = stats.getLong(0) == 0L
    }
    val cs = clusterSums(e, asg.select(col("vec_id"), col("cl"))).localCheckpoint(true)
    e.unpersist() // plain persist() — the CacheManager path applies
    Fit(Checkpoints.register(asg), Checkpoints.register(cs),
      iter, converged, obj.reverse)
  }
}
