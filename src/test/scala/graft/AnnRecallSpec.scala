package graft

/** ANN quality audit: recall@10 of the probed/compressed paths against
  * the exact brute-force top-10, on the same deterministic data the
  * oracle gate uses. Near-uniform synthetic embeddings are the WORST
  * case for cell/bucket probing (no cluster structure to exploit), so
  * these floors are regression canaries, not quality claims — the
  * numbers are documented in the query comments. */
class AnnRecallSpec extends SparkSpec {

  private def topSetsIn(dir: String, name: String): Map[Long, Set[Long]] = {
    val m = SparkEntry.queries(name)(spark, dir)
      .select("qid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    graft.functions.Checkpoints.releaseAll()
    spark.catalog.clearCache()
    m
  }

  private def topSets(name: String): Map[Long, Set[Long]] = topSetsIn(sf001, name)

  private def meanRecall(brute: Map[Long, Set[Long]],
                         approx: Map[Long, Set[Long]]): Double =
    brute.map { case (q, b) =>
      (b intersect approx.getOrElse(q, Set.empty)).size.toDouble / b.size
    }.sum / brute.size

  /** CLUSTERED fixture — the realistic corpus shape the near-uniform
    * driver data can't provide: 10 well-separated label-centered
    * Gaussian-ish clusters (deterministic splitmix-style noise, no RNG
    * state), written as an `embeddings.parquet` lake so the UNCHANGED
    * oracle queries run against it verbatim. True neighbors are
    * same-cluster, so cell probing must recover them — the recall
    * numbers here are quality claims, not just regression canaries. */
  private lazy val clusteredDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-clustered").toString
    val (dim, k, n) = (64, 10, 500)
    def mix(a: Long, b: Long): Double = {
      var x = a * 0x9E3779B97F4A7C15L + b * 0xC2B2AE3D27D4EB4FL
      x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
      x ^= (x >>> 27); x *= 0x94D049BB133111EBL
      x ^= (x >>> 31)
      (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0 // [-1, 1)
    }
    val rows = (0 until n).map { i =>
      val l = i % k
      val emb = Array.tabulate(dim)(d =>
        (mix(l.toLong, d.toLong) + 0.05 * mix(i + 1000L, d.toLong)).toFloat)
      (i.toLong, emb, l)
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

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

  test("clustered corpus: IVF, fitted IVF and PQ all recover >= 0.8 recall@10") {
    val brute = topSetsIn(clusteredDir, "q_knn_brute")
    assert(brute.nonEmpty)
    val ivf = meanRecall(brute, topSetsIn(clusteredDir, "q_knn_ivf"))
    val fitted = meanRecall(brute, topSetsIn(clusteredDir, "q_knn_ivf_fitted"))
    val pq = meanRecall(brute, topSetsIn(clusteredDir, "q_pq_ann"))
    // well-separated clusters: a query's true top-10 live in its own
    // cell, so 2-probe IVF and the fitted quantizer should recover
    // (nearly) all of them, and the PQ ADC shortlist (50 deep, exact
    // rerank) should keep them — the documented 0.26-0.42 floors on the
    // near-uniform driver data are that data's worst case, not the
    // operators'
    assert(ivf >= 0.8, f"clustered IVF recall@10 too low: $ivf%.2f")
    assert(fitted >= 0.8, f"clustered fitted-IVF recall@10 too low: $fitted%.2f")
    assert(pq >= 0.8, f"clustered PQ recall@10 too low: $pq%.2f")
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
