package graft

/** ANN quality audit: recall@10 of the probed/compressed paths against
  * the exact brute-force top-10, on the same deterministic data the
  * oracle gate uses. Near-uniform synthetic embeddings are the WORST
  * case for cell/bucket probing (no cluster structure to exploit), so
  * these floors are regression canaries, not quality claims — the
  * numbers are documented in the query comments. */
class AnnRecallSpec extends SparkSpec {

  private def topSets(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf001)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

  test("IVF (nprobe=2 of ~10 cells) holds its measured recall floor vs brute") {
    val brute = topSets("q_knn_brute")
    val ivf = topSets("q_knn_ivf")
    assert(brute.keySet == ivf.keySet)
    val recalls = brute.map { case (q, b) =>
      (b intersect ivf(q)).size.toDouble / b.size
    }
    val mean = recalls.sum / recalls.size
    // measured 0.26 on this deterministic corpus; probing 2 of ~10 cells
    // of structureless data bounds the expectation near nprobe/cells
    assert(mean >= 0.2, f"IVF recall@10 regressed: $mean%.2f")
  }

  test("k-means-fitted IVF lifts recall above the label-cell floor") {
    val brute = topSets("q_knn_brute")
    val label = topSets("q_knn_ivf")
    val fitted = topSets("q_knn_ivf_fitted")
    assert(brute.keySet == fitted.keySet)
    def recall(m: Map[Long, Set[Long]]) = brute.map { case (q, b) =>
      (b intersect m.getOrElse(q, Set.empty)).size.toDouble / b.size
    }.sum / brute.size
    val (rl, rf) = (recall(label), recall(fitted))
    // measured 0.26 label vs 0.32 fitted at sf0.001 (0.38 vs 0.42 at
    // sf0.01): Lloyd-trained Voronoi cells beat arbitrary label slices
    // even on structureless synthetic data — the deterministic corpus
    // makes both numbers stable, so pin the lift AND a raised floor
    assert(rf >= rl, f"fitted IVF ($rf%.2f) fell below label cells ($rl%.2f)")
    assert(rf >= 0.28, f"fitted-IVF recall@10 regressed: $rf%.2f")
  }

  test("hyperplane-LSH candidates stay within the exact top-10's score range") {
    val brute = SparkEntry.queries("q_knn_brute")(spark, sf001)
      .select("qid", "cosine").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).max }
    val lsh = SparkEntry.queries("q_ann_lsh")(spark, sf001)
      .select("qid", "cosine").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // an approximate path must never MANUFACTURE similarity: every LSH
    // cosine is bounded by that query's exact best
    lsh.foreach { case (q, c) =>
      assert(c <= brute(q) + 1e-12, s"query $q: LSH cosine $c exceeds exact best ${brute(q)}")
    }
  }
}
