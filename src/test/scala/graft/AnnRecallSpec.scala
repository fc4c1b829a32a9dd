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
