package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list, by
  * LOCAL UNION-FIND CONTRACTION — the near-dup clustering engine behind
  * `q_dedup_clusters`.
  *
  * Why not plain min-label propagation (the Pregel loop): its round count
  * is the component DIAMETER, and every round pays a join + aggregate +
  * action over the full node frame — measured at ~3-4 s of almost-empty
  * stages per round on a 477-edge pair graph. Why not large-star/
  * small-star: better round bound (O(log² n)) but the same
  * many-tiny-stages-per-round constant.
  *
  * This formulation contracts entire partitions at once:
  *
  *   1. partition the edges into W tasks, each bounded by
  *      `maxEdgesPerTask`; a per-task union-find (path compression,
  *      union-by-min) resolves EVERY chain inside the task in one narrow
  *      pass — no shuffle, diameter irrelevant;
  *   2. merge: per-node min of the local roots across tasks (one
  *      map-side-combined aggregate);
  *   3. contract: rewrite each edge to its endpoints' new representatives,
  *      drop self-loops, dedup — only edges CROSSING task boundaries
  *      survive;
  *   4. repeat on the (much smaller) contracted graph with W shrunk
  *      geometrically; terminate when no edges remain. W reaching 1
  *      guarantees termination in ≤ log₄(parallelism) + 1 rounds even for
  *      adversarial chains, and each round's survivor count is bounded by
  *      cross-partition adjacencies, not by data.
  *
  * Labels compose across rounds (lbl ← m(lbl) while reps merge), then a
  * pointer-doubling pass resolves the residual rep forest: a round's
  * merge map can hand a root to one node while mapping that root further
  * down in the SAME round (node→25 and 25→1 simultaneously) — if no
  * surviving contracted edge keeps 25 alive, that label would stay
  * stale. Pointer chains only shrink (every hop strictly decreases), and
  * doubling halves them, so resolution is log₂(chain) tiny self-joins —
  * usually zero. The final frame maps every edge-endpoint to its
  * component MINIMUM — the deterministic canonical survivor the dedup
  * contract wants, identical to what the recursive-CTE oracle computes.
  *
  * Memory: one open-addressed LongMap of ≤ 2·maxEdgesPerTask entries per
  * task — two Long arrays at ~2× load factor ≈ 64·maxEdgesPerTask bytes,
  * i.e. ~64 MB at the 1M-edge default — sized for executors, spill-free
  * by construction; raise it when executors have headroom (fewer
  * rounds), lower it for small executors.
  */
object ConnectedComponents {

  /** (node, lbl) for every node appearing in `edges` (first two columns,
    * long-castable); lbl = min node id of the component. The result is
    * localCheckpoint'ed — materialized on executors with truncated
    * lineage (callers typically join it twice: stamping + sizing).
    * Caveat: localCheckpoint storage is non-replicated; on a cluster,
    * executor loss mid-query fails the query (acceptable for a batch
    * operator — rerun) rather than silently recomputing nondeterministic
    * lineage.
    *
    * Lifecycle: the result is REGISTRY-registered ([[Checkpoints]]).
    * The harness mains (Bench/Verify/Explain) reclaim it via
    * `releaseAll()` between queries; a long-lived library session must
    * do the same — call `Checkpoints.releaseNow(result)` once the
    * consuming query has materialized (the per-result analogue of
    * [[KMeans.Fit.release]]), or `releaseAll()` at a query boundary —
    * otherwise the label blocks stay pinned for the session. */
  def labels(edges: DataFrame, maxEdgesPerTask: Long = 1L << 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val cols = edges.columns
    // Iteration hygiene, learned the hard way:
    //  - partitioning must be DETERMINISTIC (hash on u, never round-robin):
    //    a recomputed partition assignment changes every local root, and
    //    Spark recomputes cached frames whose ANCESTOR was unpersisted
    //    (non-cascading unpersist clears dependants' buffers);
    //  - each round's survivors (lab, e) are localCheckpoint'ed — lineage
    //    truncation makes them immune to ancestor unpersists AND keeps the
    //    plan from growing a round-per-round lineage tail.
    var e: DataFrame = edges
      .select(col(cols(0)).cast("long").as("u"), col(cols(1)).cast("long").as("v"))
      // null endpoints match equi-join semantics (no edge): drop them here,
      // or the Dataset decode inside the union-find would NPE opaquely
      .filter(col("u").isNotNull && col("v").isNotNull)
      .localCheckpoint(true)
    var n = e.count()
    var w = width(spark, n, maxEdgesPerTask)
    var lab: DataFrame = null
    while (n > 0) {
      // hash on BOTH endpoints: union-find needs no key locality, and
      // hashing on u alone would hand a hub node's entire edge set to one
      // task, voiding the per-task memory bound
      val contracted = e.repartition(w, col("u"), col("v"))
        .as[(Long, Long)].mapPartitions(localUnionFind)
        .toDF("node", "root")
      val m = contracted.groupBy($"node").agg(min($"root").as("root")).persist()
      val nextLab = (if (lab == null) m.select($"node", $"root".as("lbl"))
      else {
        // fresh toDF names on both sides — lab and m share lineage, and
        // dataframe-apply references can rebind across a dedup'd subtree
        val labR = lab.toDF("l_node", "l_lbl")
        val mm = m.toDF("m_node", "m_root")
        labR.join(mm, col("l_lbl") === col("m_node"), "left")
          .select(col("l_node").as("node"),
            coalesce(col("m_root"), col("l_lbl")).as("lbl"))
      }).localCheckpoint(true)
      // RDD-level release (Dataset.unpersist is a checkpoint no-op) —
      // safe: nextLab was checkpointed EAGERLY above
      if (lab != null) Checkpoints.releaseNow(lab)
      lab = nextLab
      val ma = m.toDF("a_node", "a_root")
      val mb = m.toDF("b_node", "b_root")
      val e2 = e
        .join(ma, col("u") === col("a_node"))
        .join(mb, col("v") === col("b_node"))
        .select(col("a_root").as("u"), col("b_root").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(false) // lazy: the count below materializes it
      n = e2.count()
      m.unpersist() // plain persist() — the CacheManager path applies
      Checkpoints.releaseNow(e) // e2 materialized by the count above
      e = e2
      w = math.max(1, w / 4) // geometric shrink → guaranteed termination
    }
    Checkpoints.releaseNow(e)
    if (lab == null)
      edges.limit(0).select(col(cols(0)).cast("long").as("node"),
        col(cols(1)).cast("long").as("lbl"))
    else resolve(lab)
  }

  /** Pointer-doubling fixpoint over the (node, lbl) forest: replace lbl
    * with lbl's own label until nothing moves. Every rep is itself a
    * node of the frame, every hop strictly decreases, and doubling
    * (both sides of the self-join advance) halves chain length per
    * iteration — so this is log₂(max chain) iterations of one tiny
    * self-join + count over the edge-node frame. */
  private def resolve(lab0: DataFrame): DataFrame = {
    var lab = lab0
    var moved = 1L
    while (moved > 0) {
      // fresh names on BOTH sides — this is a true self-join, where
      // dataframe-apply column references are exactly the rebinding trap
      val cur = lab.toDF("c_node", "c_lbl")
      val ptr = lab.toDF("p_node", "p_lbl")
      val next = cur.join(ptr, col("c_lbl") === col("p_node"), "left")
        .select(col("c_node").as("node"),
          coalesce(col("p_lbl"), col("c_lbl")).as("lbl"),
          (coalesce(col("p_lbl"), col("c_lbl")) =!= col("c_lbl")).as("chg"))
        .localCheckpoint(true) // truncate before unpersisting the parent
      moved = next.filter(col("chg")).count()
      Checkpoints.releaseNow(lab) // RDD-level: next checkpointed eagerly
      lab = next.drop("chg")
    }
    // the resolved frame outlives this builder inside the caller's query
    // plan — registry-release it after the query materializes
    Checkpoints.register(lab)
  }

  private def width(spark: org.apache.spark.sql.SparkSession, n: Long,
                    maxEdgesPerTask: Long): Int =
    math.max(1L, math.min(spark.sparkContext.defaultParallelism.toLong,
      (n + maxEdgesPerTask - 1) / maxEdgesPerTask)).toInt

  /** Partition-local union-find: resolves every edge in the iterator and
    * emits (node, localRoot) for each distinct node, root = local
    * component min. Path compression keeps finds amortized ~O(1);
    * union-by-min (smaller id becomes the root) makes the root the min
    * directly instead of needing a post-pass. */
  private def localUnionFind(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent.update(c, r); c = nx }
      r
    }
    it.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.update(rb, ra) else parent.update(ra, rb)
      }
    }
    // materialize keys before the final finds mutate the map
    parent.keys.toArray.iterator.map(k => k -> find(k))
  }
}
