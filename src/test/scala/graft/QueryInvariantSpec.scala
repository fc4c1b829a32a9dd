package graft

import org.apache.spark.sql.functions._

/** Cross-query invariants for the round-4 training-pipeline operators —
  * facts that must hold regardless of data, checked over sf0.001 (the
  * oracle gate checks VALUES; these check internal consistency between
  * related operators and the algebraic contracts the docs claim). */
class QueryInvariantSpec extends SparkSpec {
  import spark.implicits._

  test("data mixture emits exactly mult copies per doc with dense copy ids") {
    val out = SparkEntry.queries("q_data_mixture")(spark, sf001)
      .select($"doc_id", $"copy_id", $"mult").as[(Long, Long, Long)].collect()
    val byDoc = out.groupBy(_._1)
    byDoc.foreach { case (doc, rows) =>
      val mult = rows.head._3
      assert(rows.length == mult, s"doc $doc: ${rows.length} copies, mult $mult")
      assert(rows.map(_._2).sorted.toSeq == (1L to mult), s"doc $doc copy ids not dense")
    }
    val docs = Tables(spark, sf001, "documents").count()
    assert(byDoc.size == docs, "every document must appear in the mixture")
  }

  test("near-dup clusters: canonical min labels, and every verified LSH pair lands in one cluster") {
    val clusters = SparkEntry.queries("q_dedup_clusters")(spark, sf001)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    // canonical closure: labels are component minima, so label(label) = label
    clusters.foreach { case (doc, cl) =>
      assert(cl <= doc, s"cluster id $cl exceeds member $doc (not a min label)")
      assert(clusters(cl) == cl, s"canonical $cl is not its own cluster")
    }
    // consistency with the pair query: connected docs share a cluster
    val pairs = SparkEntry.queries("q_dedup_minhash_lsh")(spark, sf001)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("repetition ratio is bounded and the flag matches the threshold") {
    val out = SparkEntry.queries("q_rep_ratio")(spark, sf001)
      .select($"n_bigrams", $"n_dup", $"dup_ratio", $"flagged")
      .as[(Long, Long, Double, Boolean)].collect()
    out.foreach { case (n, d, r, f) =>
      assert(n > 0 && d >= 0 && d < n)
      assert(r >= 0.0 && r < 1.0 && math.abs(r - d.toDouble / n) < 1e-15)
      assert(f == (r > 0.05))
    }
  }

  test("decontamination flags only non-eval docs") {
    val hits = SparkEntry.queries("q_decontaminate")(spark, sf001)
      .select($"doc_id").as[Long].collect()
    hits.foreach(d => assert(d % 20 != 0, s"eval doc $d flagged as contaminated"))
  }

  test("hash top-k sample is invariant to input partitioning") {
    val base = SparkEntry.queries("q_hash_topk_sample")(spark, sf001)
      .select($"doc_id").as[Long].collect().toSeq
    val repart = Tables(spark, sf001, "documents")
      .repartition(17) // adversarial partition count
      .select($"doc_id", md5($"doc_id".cast("string").cast("binary")).as("h"))
      .orderBy($"h", $"doc_id").limit(20)
      .select($"doc_id").as[Long].collect().toSeq
    assert(base == repart, "sample depends on physical partitioning")
  }

  test("kmeans step: every member count is positive and totals the corpus") {
    val out = SparkEntry.queries("q_kmeans_step")(spark, sf001)
      .select($"cluster", $"dim", $"n_members").as[(Int, Long, Long)].collect()
    val total = Tables(spark, sf001, "embeddings").count()
    val perCluster = out.groupBy(_._1).map { case (c, rows) =>
      val ns = rows.map(_._3).distinct
      assert(ns.length == 1, s"cluster $c has inconsistent member counts across dims")
      ns.head
    }
    assert(perCluster.forall(_ > 0))
    assert(perCluster.sum == total, "every vector must be assigned to exactly one cluster")
  }

  test("kmeans step assigns each vector to its TRUE nearest centroid (exact BigInt replay)") {
    // Brute-force replay of the Lloyd assignment in exact rational
    // arithmetic: quantize q = floor(x * 2^20), centroid_cl = s_cl / cn_cl,
    // compare |q - s/cn|^2 across clusters via cross-multiplied BigInts —
    // the unbiased comparison the cn^2-scaled int64 argmin used to get
    // wrong for unequal cluster sizes.
    val emb = Tables(spark, sf001, "embeddings")
      .select($"vec_id", $"label", $"embedding").as[(Long, Int, Array[Float])].collect()
    val q = emb.map { case (id, lab, v) =>
      (id, lab, v.map(x => BigInt(math.floor(x.toDouble * 1048576.0).toLong)))
    }
    val byLabel = q.groupBy(_._2)
    val sums = byLabel.map { case (l, rows) =>
      l -> (rows.map(_._3).reduce((a, b) => a.zip(b).map(t => t._1 + t._2)), BigInt(rows.length))
    }
    def d2(v: Array[BigInt], s: Array[BigInt], cn: BigInt): BigInt =
      v.zip(s).map { case (x, si) => val t = cn * x - si; t * t }.sum // = cn^2 * dist^2
    val expected = q.map { case (id, _, v) =>
      val best = sums.toSeq.map { case (l, (s, cn)) => (l, d2(v, s, cn), cn) }
        .minBy { case (l, d, cn) => (ExactFrac(d, cn * cn), l) }(
          Ordering.Tuple2(ExactFrac.ordering, Ordering.Int))
      id -> best._1
    }.toMap
    // recompute: n_members per cluster from the expected assignment
    val expSizes = expected.values.groupBy(identity).map { case (l, g) => (l, g.size.toLong) }
    val got = SparkEntry.queries("q_kmeans_step")(spark, sf001)
      .select($"cluster", $"n_members").distinct().as[(Int, Long)].collect().toMap
    assert(got == expSizes, s"cluster sizes differ: got $got expected $expSizes")
  }

  test("funnel: step counts never increase down the funnel") {
    val steps = SparkEntry.queries("q_funnel")(spark, sf001)
      .select($"step", $"n_users").as[(String, Long)].collect().sortBy(_._1).map(_._2)
    assert(steps.length == 3)
    assert(steps(0) >= steps(1) && steps(1) >= steps(2),
      s"funnel counts increased: ${steps.toSeq}")
  }

  test("transition matrix: conditional probabilities sum to 1 per source state") {
    val rows = SparkEntry.queries("q_transition_matrix")(spark, sf001)
      .select($"prev", $"n", $"p").as[(String, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (prev, g) =>
      val total = g.map(_._3).sum
      assert(math.abs(total - 1.0) < 1e-9, s"P(next | $prev) sums to $total")
    }
  }

  test("cohort: every user is active at day offset 0 of their own cohort") {
    val grid = SparkEntry.queries("q_cohort")(spark, sf001)
      .select($"cohort_day", $"day_offset", $"n_users").as[(Long, Long, Long)].collect()
    val day0 = grid.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    val users = Tables(spark, sf001, "events")
      .select($"user_id", expr("unix_micros(MIN(ts) OVER (PARTITION BY user_id)) DIV 86400000000").as("c"))
      .distinct().groupBy($"c").count()
      .as[(Long, Long)].collect().toMap
    assert(day0 == users, "day-0 actives must equal cohort sizes")
    grid.groupBy(_._1).foreach { case (c, g) =>
      g.foreach { case (_, off, n) =>
        assert(n <= day0(c), s"cohort $c offset $off actives $n exceed cohort size") }
    }
  }

  test("gap fill: grid is complete and zero-fill preserves the event total") {
    val grid = SparkEntry.queries("q_gap_fill")(spark, sf001)
      .select($"event_type", $"hour_bucket", $"n").as[(String, Long, Long)].collect()
    val types = grid.map(_._1).distinct.length
    val hours = grid.map(_._2).distinct.sorted
    assert(grid.length == types * hours.length, "grid not dense")
    assert(hours.zip(hours.tail).forall { case (a, b) => b == a + 1 }, "hour gaps remain")
    val total = Tables(spark, sf001, "events").count()
    assert(grid.map(_._3).sum == total, "zero-fill changed the event total")
  }

  test("oov rate: bounded by totals and consistent with the flagged-doc test") {
    val rows = SparkEntry.queries("q_oov_rate")(spark, sf001)
      .select($"total_oov", $"total_tok", $"oov_rate", $"n_high_oov_docs", $"n_docs")
      .as[(Long, Long, Double, Long, Long)].collect()
    rows.foreach { case (oov, tok, rate, hi, docs) =>
      assert(oov <= tok && rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - oov.toDouble / tok) < 1e-15)
      assert(hi <= docs)
    }
  }

  test("association rules: confidences in (0,1], pair support bounded by either side") {
    val rows = SparkEntry.queries("q_assoc_rules")(spark, sf001)
      .select($"su", $"conf_ab", $"conf_ba").as[(Long, Double, Double)].collect()
    rows.foreach { case (su, ab, ba) =>
      assert(su >= 2)
      assert(ab > 0.0 && ab <= 1.0 && ba > 0.0 && ba <= 1.0,
        s"confidence out of range: $ab / $ba")
    }
  }

  test("table digest is invariant to partitioning and flips on a single changed row") {
    val digest = SparkEntry.queries("q_table_digest")(spark, sf001)
      .select($"digest_xor").as[Long].head()
    val hv = queries.RelationalQueries.digestHashExpr // the SAME formula the query ships
    def digestOf(df: org.apache.spark.sql.DataFrame): Long =
      df.selectExpr(s"$hv AS hv").agg(expr("bit_xor(hv)")).as[Long].head()
    val ev = Tables(spark, sf001, "events")
    assert(digestOf(ev.repartition(17)) == digest, "digest depends on partitioning")
    assert(digestOf(ev.orderBy($"event_type")) == digest, "digest depends on row order")
    val tampered = ev.withColumn("user_id",
      when($"event_id" === 0L, $"user_id" + 1).otherwise($"user_id"))
    assert(digestOf(tampered) != digest, "digest missed a changed row")
  }

  test("pq ann: dense ranks, ascending exact distances, no self-matches") {
    val out = SparkEntry.queries("q_pq_ann")(spark, sf001)
      .select($"qid", $"rnk", $"cid", $"d2").as[(Long, Int, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length), s"query $qid ranks not dense")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sorted.toSeq,
        s"query $qid rerank distances not ascending")
      assert(!rows.exists(_._3 == qid), s"query $qid matched itself")
    }
  }

  test("incremental LSH equals the full-corpus pass restricted to batch x lake") {
    val full = SparkEntry.queries("q_dedup_minhash_lsh")(spark, sf001)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val inc = SparkEntry.queries("q_dedup_incremental_lsh")(spark, sf001)
      .select($"new_id", $"lake_id").as[(Long, Long)].collect().toSet
    // full pass emits a < b; incremental emits (batch doc, lake doc) —
    // exactly the full pairs with one end in the % 10 batch slice
    val expected = full.collect {
      case (a, b) if a % 10 == 0 && b % 10 != 0 => (a, b)
      case (a, b) if b % 10 == 0 && a % 10 != 0 => (b, a)
    }
    assert(inc === expected)
  }

  test("spearman moment math survives groups past the old int64 ceiling") {
    // 100 K ranks: n·Σxy ≈ n⁴/3 ≈ 3.3·10¹⁹ > 2^63 — int64 moments would
    // throw under ANSI; the decimal(38,0) accumulators must not. Same
    // moment expressions as q_spearman, ranks supplied directly (the
    // windows are not under test). Anti-monotone y ⇒ rho = −1 (up to
    // the final double division's ulp: the exact integer numerator and
    // denominator round to double independently).
    import graft.functions.Exact
    val n = 100000L
    val d = spark.range(1, n + 1)
      .select(col("id").as("rx"), (lit(n + 1) - col("id")).as("ry"))
    val m = d.agg(count(lit(1)).as("n"),
      sum(col("rx").cast(Exact.Moment)).as("sx"),
      sum(col("ry").cast(Exact.Moment)).as("sy"),
      sum((col("rx") * col("ry")).cast(Exact.Moment)).as("sxy"),
      sum((col("rx") * col("rx")).cast(Exact.Moment)).as("sxx"),
      sum((col("ry") * col("ry")).cast(Exact.Moment)).as("syy"))
    val rho = m.select(
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))).as("rho"))
      .head().getDouble(0)
    assert(math.abs(rho + 1.0) < 1e-12, s"rho = $rho")
  }

  test("boilerplate detection and removal agree per document") {
    val det = SparkEntry.queries("q_boilerplate")(spark, sf001)
      .select($"doc_id", $"n_chunks", $"n_boiler").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val cln = SparkEntry.queries("q_boilerplate_clean")(spark, sf001)
      .select($"doc_id", $"n_chunks", $"n_kept").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(det.keySet == cln.keySet)
    det.foreach { case (doc, (nc, nb)) =>
      val (nc2, nk) = cln(doc)
      assert(nc2 == nc, s"doc $doc: chunk counts diverge ($nc vs $nc2)")
      // what detection flags is exactly what removal drops
      assert(nk == nc - nb, s"doc $doc: kept $nk != $nc - $nb")
    }
  }

  test("sequence packing conserves every token and every document") {
    val packed = SparkEntry.queries("q_seq_packing")(spark, sf001)
      .select($"window_id", $"n_docs", $"n_tokens").as[(Long, Long, Long)]
      .collect()
    val docs = Tables(spark, sf001, "documents")
      .select(size(split($"text", " ")).cast("long").as("n"))
      .agg(count(lit(1)), sum($"n")).as[(Long, Long)].head()
    assert(packed.map(_._2).sum == docs._1, "every document starts in exactly one window")
    assert(packed.map(_._3).sum == docs._2, "token totals must be conserved")
    assert(packed.forall(_._2 >= 1), "emitted windows hold at least one doc start")
    // start-window ids never exceed the token budget's last window
    val maxWin = (docs._2 - 1) / 512
    assert(packed.forall(w => w._1 >= 0 && w._1 <= maxWin))
  }

  test("unigram surprisal: rare tokens bounded, mean consistent with bits") {
    val out = SparkEntry.queries("q_unigram_surprisal")(spark, sf001)
      .select($"n_tokens", $"sur_bits", $"mean_surprisal", $"n_rare")
      .as[(Long, Long, Double, Long)].collect()
    out.foreach { case (n, bits, mean, rare) =>
      assert(n > 0 && bits >= 0 && rare >= 0 && rare <= n)
      assert(math.abs(mean - bits.toDouble / n) < 1e-12)
    }
  }

  test("bigram surprisal: bits consistent, bigram mass conserved") {
    val out = SparkEntry.queries("q_bigram_surprisal")(spark, sf001)
      .select($"n_bigrams", $"sur_bits", $"mean_surprisal", $"n_rare")
      .as[(Long, Long, Double, Long)].collect()
    out.foreach { case (n, bits, mean, rare) =>
      assert(n > 0 && bits >= 0 && rare >= 0 && rare <= n)
      assert(math.abs(mean - bits.toDouble / n) < 1e-12)
    }
    // every bigram instance of every ≥2-token doc is scored exactly once
    val want = Tables(spark, sf001, "documents")
      .select((size(split($"text", " ")) - 1).cast("long").as("nb"))
      .filter($"nb" >= 1).agg(sum($"nb")).as[Long].head()
    assert(out.map(_._1).sum == want, "bigram mass not conserved")
  }

  test("boolean retrieval: zero-match row survives; match counts replay exactly") {
    val out = SparkEntry.queries("q_bool_retrieval")(spark, sf001)
      .select($"query_id", $"n_terms", $"n_docs", $"n_hit_tokens")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "a query row vanished")
    // query 3 names a term absent from the corpus → zero matches, row kept
    assert(out(3L)._3 == 0 && out(3L)._4 == 0)
    // independent replay of query 2 with array_contains semantics
    val q2 = Tables(spark, sf001, "documents")
      .withColumn("toks", split($"text", " "))
      .filter(array_contains($"toks", "slow") && array_contains($"toks", "fast") &&
        array_contains($"toks", "merge"))
      .count()
    assert(out(2L)._3 == q2, s"query 2: ${out(2L)._3} docs vs replay $q2")
  }

  test("source overlap: full C(S,2) matrix, intersections bounded by set sizes") {
    val out = SparkEntry.queries("q_source_overlap")(spark, sf001)
      .select($"sa", $"sb", $"na", $"nb", $"inter", $"jac")
      .as[(String, String, Long, Long, Long, Double)].collect()
    val sources = (out.map(_._1) ++ out.map(_._2)).distinct
    assert(out.length == sources.length * (sources.length - 1) / 2,
      s"${out.length} pairs for ${sources.length} sources")
    out.foreach { case (sa, sb, na, nb, inter, jac) =>
      assert(sa < sb, "pair order must be canonical")
      assert(inter >= 0 && inter <= math.min(na, nb))
      assert(jac >= 0.0 && jac <= 1.0)
      assert(math.abs(jac - inter.toDouble / (na + nb - inter)) < 1e-15)
    }
    // each source's set size is consistent across all its pairs
    (out.map(r => r._1 -> r._3) ++ out.map(r => r._2 -> r._4))
      .groupBy(_._1).foreach { case (s, g) =>
        assert(g.map(_._2).distinct.length == 1, s"source $s has inconsistent nsh") }
  }

  test("mixture resample: deterministic gate, totals conserved, rate-100 lang kept whole") {
    val out = SparkEntry.queries("q_mixture_resample")(spark, sf001)
      .select($"lang", $"n_before", $"n_after", $"tok_before", $"tok_after", $"realized_rate")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    out.foreach { case (_, nb, na, tb, ta, rate) =>
      assert(na <= nb && ta <= tb)
      assert(math.abs(rate - na.toDouble / nb) < 1e-15)
    }
    // rate(zh) = 100 ⇒ the gate h < 100 always holds (h ∈ [0, 100))
    out.filter(_._1 == "zh").foreach { case (_, nb, na, tb, ta, _) =>
      assert(na == nb && ta == tb, "rate-100 language must be kept whole") }
    val (docs, toks) = Tables(spark, sf001, "documents")
      .select(size(split($"text", " ")).cast("long").as("n"))
      .agg(count(lit(1)), sum($"n")).as[(Long, Long)].head()
    assert(out.map(_._2).sum == docs && out.map(_._4).sum == toks,
      "pre-sample totals must cover the corpus")
  }

  test("fold split: dense folds, every doc and token in exactly one fold") {
    val out = SparkEntry.queries("q_fold_split")(spark, sf001)
      .select($"fold", $"lang", $"n_docs", $"n_tokens")
      .as[(Long, String, Long, Long)].collect()
    assert(out.forall(r => r._1 >= 0 && r._1 < 5))
    val (docs, toks) = Tables(spark, sf001, "documents")
      .select(size(split($"text", " ")).cast("long").as("n"))
      .agg(count(lit(1)), sum($"n")).as[(Long, Long)].head()
    assert(out.map(_._3).sum == docs && out.map(_._4).sum == toks,
      "fold split must partition the corpus")
  }

  test("trimmed stats: fences ordered, ≥80% kept, mean inside the fences") {
    val out = SparkEntry.queries("q_trimmed_stats")(spark, sf001)
      .select($"n_rows", $"n_kept", $"trimmed_mean", $"lo_fence", $"hi_fence")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (n, k, mean, lo, hi) =>
      assert(lo <= hi)
      // [p10, p90] keeps at least 80% of the group by construction
      assert(k <= n && k.toDouble >= 0.8 * n - 2,
        s"trim kept $k of $n — below the 80% floor")
      assert(mean >= lo && mean <= hi,
        s"trimmed mean $mean outside fences [$lo, $hi]")
    }
  }

  test("semantic decontamination: train-side hits only, eval-side neighbors, threshold honored") {
    val out = SparkEntry.queries("q_semantic_decontaminate")(spark, sf001)
      .select($"vec_id", $"n_eval_near", $"max_cosine", $"nearest_eval")
      .as[(Long, Long, Double, Long)].collect()
    val nEval = Tables(spark, sf001, "embeddings").filter($"vec_id" % 20 === 0).count()
    out.foreach { case (id, near, mx, ev) =>
      assert(id % 20 != 0, s"eval vector $id flagged as contaminated")
      assert(ev % 20 == 0, s"nearest neighbor $ev is not in the eval slice")
      assert(mx >= 0.30, s"vector $id flagged below threshold: $mx")
      assert(near >= 1 && near <= nEval)
    }
  }

  test("token budget: the two-pass bucket refinement equals the straight window") {
    val out = SparkEntry.queries("q_token_budget")(spark, sf001)
      .select($"source", $"n_docs", $"tok_total", $"n_kept", $"tok_kept", $"budget_util")
      .as[(String, Long, Long, Long, Long, Double)].collect()
    out.foreach { case (_, nd, tt, nk, tk, util) =>
      assert(nk <= nd && tk <= tt && tk <= 1000L, "budget overrun")
      assert(math.abs(util - tk.toDouble / 1000) < 1e-15)
    }
    // naive single-window replay (affordable at spec scale)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"q".desc, $"doc_id".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val want = Tables(spark, sf001, "documents")
      .select($"doc_id", $"source", size(split($"text", " ")).cast("long").as("n_tok"),
        (length(regexp_replace($"text", "[^a-z]", "")).cast("double")
          / length($"text")).as("q"))
      .withColumn("cum", sum($"n_tok").over(w))
      .groupBy($"source")
      .agg(count(when($"cum" <= 1000, 1)).as("n_kept"),
        coalesce(sum(when($"cum" <= 1000, $"n_tok")), lit(0L)).as("tok_kept"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    out.foreach { case (src, _, _, nk, tk, _) =>
      assert(want(src) == ((nk, tk)),
        s"source $src: bucketed ($nk, $tk) != straight window ${want(src)}")
    }
  }

  test("pii scrub: flag matches hits, growth bounded by the pattern lengths") {
    val out = SparkEntry.queries("q_pii_scrub")(spark, sf001)
      .select($"n_hits", $"chars_before", $"chars_after", $"flagged")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.exists(_._1 > 0), "the deny pattern never matched — gate is vacuous")
    out.foreach { case (hits, before, after, flagged) =>
      assert(flagged == (hits > 0))
      // '[REDACTED]' (10 chars) replaces 'customer' (8) or 'vector' (6)
      assert(after - before >= 2 * hits && after - before <= 4 * hits,
        s"growth ${after - before} inconsistent with $hits hits")
    }
  }

  test("bpe encode: absorbed tokens account exactly for the deficit") {
    val out = SparkEntry.queries("q_bpe_encode")(spark, sf001)
      .select($"n_before", $"n_after", $"n_absorbed", $"compression")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.exists(_._3 > 0), "no document absorbed a merge — gate is vacuous")
    out.foreach { case (before, after, absorbed, c) =>
      assert(after >= 1 && after <= before)
      assert(before - after == absorbed,
        s"deficit ${before - after} != absorbed $absorbed")
      assert(math.abs(c - after.toDouble / before) < 1e-15)
    }
  }

  test("quality classifier: the confusion table partitions the corpus") {
    val out = SparkEntry.queries("q_quality_classifier")(spark, sf001)
      .select($"label_true", $"label_pred", $"n").as[(Int, Int, Long)].collect()
    assert(out.forall(r => (r._1 == 0 || r._1 == 1) && (r._2 == 0 || r._2 == 1)))
    assert(out.map(r => (r._1, r._2)).distinct.length == out.length)
    val total = Tables(spark, sf001, "embeddings").count()
    assert(out.map(_._3).sum == total, "confusion cells must partition the corpus")
  }

  test("curriculum phases partition the corpus: equal counts ±1, ordered length ranges") {
    val out = SparkEntry.queries("q_curriculum")(spark, sf001)
      .select($"phase", $"n_docs", $"min_tok", $"max_tok", $"n_tokens", $"mean_tok")
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (1L to 4L), "phases must be exactly 1..4")
    val docs = Tables(spark, sf001, "documents").count()
    assert(out.map(_._2).sum == docs, "phases must partition every document")
    // NTILE contract: phase sizes differ by at most one, larger first
    val sizes = out.map(_._2)
    assert(sizes.max - sizes.min <= 1, s"phase sizes not ±1: ${sizes.toSeq}")
    assert(sizes.toSeq == sizes.sorted.reverse.toSeq, "NTILE gives earlier phases the remainder")
    // curriculum order: length ranges never overlap ACROSS phases (ties
    // on the boundary value may straddle — ranges touch, never invert)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 <= b._3, s"phase ${a._1} max ${a._4} exceeds phase ${b._1} min ${b._3}")
      case _ =>
    }
    out.foreach { case (p, n, mn, mx, tot, mean) =>
      assert(mn <= mx && tot >= n * mn && tot <= n * mx, s"phase $p stats inconsistent")
      assert(math.abs(mean - tot.toDouble / n) < 1e-12)
    }
  }

  test("hard negatives never share the query's label and never beat the brute top-1") {
    val hn = SparkEntry.queries("q_hard_negatives")(spark, sf001)
      .select($"qid", $"q_label", $"rnk", $"cid", $"c_label", $"cosine")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(hn.nonEmpty)
    hn.foreach { case (qid, ql, _, cid, cl, cos) =>
      assert(cl != ql, s"negative $cid for query $qid shares label $ql — not a negative")
      assert(cid != qid && cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
    }
    hn.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length), s"query $qid ranks not dense")
      val sorted = rows.sortBy(_._3).map(_._6)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
        s"query $qid cosines not descending")
    }
    // hard negatives are a label-filtered subset of the brute candidate
    // pool, so no negative may score above the query's overall top-1
    val bruteTop = SparkEntry.queries("q_knn_brute")(spark, sf001)
      .filter($"rnk" === 1).select($"qid", $"cosine").as[(Long, Double)].collect().toMap
    hn.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._6).max <= bruteTop(qid) + 1e-12,
        s"query $qid: a hard negative outscored the unfiltered top-1")
    }
  }

  test("IVF maintenance growth reconciles exactly with the lake and batch slices") {
    val out = SparkEntry.queries("q_ivf_maintain")(spark, sf001)
      .select($"cell", $"n_lake", $"n_added", $"growth_ratio")
      .as[(Long, Long, Long, Double)].collect()
    val emb = Tables(spark, sf001, "embeddings")
    val lake = emb.filter($"vec_id" % 10 =!= 0)
    // one row per frozen cell = the lake slice's distinct labels
    assert(out.map(_._1).toSet ==
      lake.select($"label").distinct().as[Long].collect().toSet)
    assert(out.map(_._2).sum == lake.count(), "lake cell sizes must sum to the lake")
    // every batch vector lands in exactly one frozen cell
    assert(out.map(_._3).sum == emb.filter($"vec_id" % 10 === 0).count(),
      "added counts must sum to the batch size")
    out.foreach { case (cell, nLake, nAdd, g) =>
      assert(nLake > 0 && nAdd >= 0)
      assert(math.abs(g - nAdd.toDouble / nLake) < 1e-15, s"cell $cell ratio off")
    }
  }

  test("dedup keeper: one keeper per cluster, keeper is a member, clusters agree") {
    val out = SparkEntry.queries("q_dedup_keep")(spark, sf001)
      .select($"doc_id", $"cluster_id", $"keeper_id", $"kept")
      .as[(Long, Long, Long, Boolean)].collect()
    val clusters = SparkEntry.queries("q_dedup_clusters")(spark, sf001)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    assert(out.length == clusters.size, "keeper view must cover every document")
    out.foreach { case (doc, cl, _, _) =>
      assert(clusters(doc) == cl, s"doc $doc: cluster $cl disagrees with q_dedup_clusters")
    }
    out.groupBy(_._2).foreach { case (cl, rows) =>
      val keepers = rows.map(_._3).distinct
      assert(keepers.length == 1, s"cluster $cl names ${keepers.length} keepers")
      assert(rows.map(_._1).contains(keepers.head), s"cluster $cl keeper not a member")
      assert(rows.count(_._4) == 1, s"cluster $cl kept ${rows.count(_._4)} docs")
      rows.foreach { case (doc, _, k, kept) => assert(kept == (doc == k)) }
    }
  }

  test("exact-substring decontamination flags only training docs against real eval ids") {
    val out = SparkEntry.queries("q_decontaminate_exact")(spark, sf001)
      .select($"doc_id", $"n_eval_hits", $"first_eval").as[(Long, Long, Long)].collect()
    assert(out.nonEmpty, "no substring leaks found — gate is vacuous at this SF")
    out.foreach { case (doc, n, ev) =>
      assert(doc % 20 != 0, s"eval doc $doc flagged as leaked-into")
      assert(n >= 1 && ev % 20 == 0, s"doc $doc: bad hit count $n or eval id $ev")
    }
  }

  test("DSIR weights: full coverage, and target sources outscore the rest on average") {
    val out = SparkEntry.queries("q_dsir_weights")(spark, sf001)
      .select($"doc_id", $"source", $"is_target", $"n_bigrams", $"dsir_bits", $"mean_bits")
      .as[(Long, String, Boolean, Long, Long, Double)].collect()
    val docs = Tables(spark, sf001, "documents")
      .filter(size(split($"text", " ")) >= 2).count()
    assert(out.length == docs, "every multi-token document must be scored")
    val targets = Set("src0", "src1", "src2", "src3")
    out.foreach { case (_, src, isT, n, bits, mean) =>
      assert(isT == targets(src))
      assert(n >= 1 && math.abs(mean - bits.toDouble / n) < 1e-12)
    }
    // the importance weight is TRAINED on the target slice, so the
    // target slice must rank higher in aggregate — the op's whole point
    def avg(rows: Array[(Long, String, Boolean, Long, Long, Double)]) =
      rows.map(_._6).sum / rows.length
    val (t, g) = out.partition(_._3)
    assert(avg(t) > avg(g),
      f"target mean ${avg(t)}%.3f bits not above general ${avg(g)}%.3f")
  }

  test("int8 quantization: saturation floor, exact mse consistency, positive scales") {
    val out = SparkEntry.queries("q_int8_quantize")(spark, sf001)
      .select($"vec_id", $"s_max", $"n_sat", $"sse127", $"mse")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.length == 20)
    out.foreach { case (v, s, sat, sse, mse) =>
      assert(s > 0, s"vector $v: non-positive scale")
      // the max-|x| element always rounds to ±127 — at least one code saturates
      assert(sat >= 1 && sat <= 64, s"vector $v: saturation count $sat out of range")
      assert(sse >= 0)
      val expect = sse.toDouble / 64 / (133169152.0 * 133169152.0)
      assert(mse == expect, s"vector $v: mse $mse != $expect")
    }
  }

  test("winnowing: fingerprints bounded by grams, exact ratio, never empty") {
    val out = SparkEntry.queries("q_winnow_fingerprint")(spark, sf001)
      .select($"doc_id", $"n_grams", $"n_fingerprints", $"fp_ratio")
      .as[(Long, Long, Long, Double)].collect()
    val docs = Tables(spark, sf001, "documents").count()
    assert(out.length == docs)
    out.foreach { case (doc, g, fp, r) =>
      assert(g >= 1 && fp >= 1 && fp <= g, s"doc $doc: $fp fingerprints of $g grams")
      assert(math.abs(r - fp.toDouble / g) < 1e-15, s"doc $doc ratio off")
    }
    // winnowing should compress meaningfully on multi-window docs
    val multi = out.filter(_._2 > 8)
    assert(multi.nonEmpty && multi.forall(r => r._3 < r._2),
      "no compression on any multi-window document")
  }

  test("minhash calibration covers exactly the verified LSH pairs with sane errors") {
    val cal = SparkEntry.queries("q_minhash_calibration")(spark, sf001)
      .select($"a_id", $"b_id", $"jac", $"n_match", $"est", $"abs_err")
      .as[(Long, Long, Double, Long, Double, Double)].collect()
    val pairs = SparkEntry.queries("q_dedup_minhash_lsh")(spark, sf001)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(cal.map(r => (r._1, r._2)).toSet == pairs,
      "calibration rows must be exactly the verified near-dup pairs")
    cal.foreach { case (a, b, jac, m, est, err) =>
      assert(m >= 0 && m <= 16 && est == m.toDouble / 16)
      assert(math.abs(err - math.abs(est - jac)) < 1e-15)
      // a >= 0.5-Jaccard pair matching 0 of 16 slots is a broken family
      // (P ~ 2^-16 per pair); jac >= 0.5 pairs should estimate high
      assert(m >= 1, s"pair ($a,$b) with jac $jac matched no slots")
    }
    val meanErr = cal.map(_._6).sum / cal.length
    assert(meanErr <= 0.15, f"mean |est - jac| $meanErr%.3f too high for 16 slots")
  }

  test("random projection: exact pair counts and distortion around the JL expectation") {
    val out = SparkEntry.queries("q_random_projection")(spark, sf001)
      .select($"qid", $"n_pairs", $"ratio", $"min_ratio", $"max_ratio")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.map(_._1).sorted.toSeq == (0L until 5L))
    val cands = Tables(spark, sf001, "embeddings")
      .filter($"vec_id" % 10 === 0).count()
    out.foreach { case (qid, n, r, mn, mx) =>
      // every sampled candidate pairs with the query except itself
      val expected = if (qid % 10 == 0) cands - 1 else cands
      assert(n == expected, s"query $qid: $n pairs, expected $expected")
      assert(mn <= r && r <= mx, s"query $qid: ratio $r outside [$mn, $mx]")
      // E[ratio] = 1 for ±1 planes; with 8 dims × ~50 pairs the
      // aggregate concentrates loosely — a band failure means the sign
      // derivation or the decimal accumulation broke, not bad luck
      assert(r > 0.4 && r < 2.5, s"query $qid: aggregate distortion $r out of band")
    }
  }

  test("silence profile: bounded counts, run consistency, exact ratio, full coverage") {
    val out = SparkEntry.queries("q_mm_silence")(spark, sf001)
      .select($"doc_id", $"n_windows", $"n_silent", $"longest_silence", $"active_ratio")
      .as[(Long, Long, Long, Long, Double)].collect()
    val docs = Tables(spark, sf001, "documents").filter(length($"text") > 0).count()
    assert(out.length == docs)
    assert(out.exists(_._3 > 0), "no silent window anywhere — gate is vacuous")
    out.foreach { case (doc, nw, ns, run, ar) =>
      assert(nw >= 1 && ns >= 0 && ns <= nw, s"doc $doc: $ns silent of $nw")
      assert(run <= ns && (run >= 1) == (ns >= 1), s"doc $doc: run $run vs silent $ns")
      assert(math.abs(ar - (nw - ns).toDouble / nw) < 1e-15, s"doc $doc ratio off")
    }
  }

  test("dataset diff reconciles exactly with the slice arithmetic") {
    val out = SparkEntry.queries("q_dataset_diff")(spark, sf001)
      .select($"source", $"n_added", $"n_removed", $"n_changed", $"n_unchanged")
      .as[(String, Long, Long, Long, Long)].collect()
    val d = Tables(spark, sf001, "documents").select($"doc_id").as[Long].collect()
    def n(p: Long => Boolean) = d.count(p).toLong
    assert(out.map(_._2).sum == n(id => id % 11 == 0 && id % 17 != 0), "added mismatch")
    assert(out.map(_._3).sum == n(id => id % 17 == 0 && id % 11 != 0), "removed mismatch")
    assert(out.map(_._4).sum == n(id => id % 13 == 0 && id % 11 != 0 && id % 17 != 0),
      "changed mismatch")
    assert(out.map(r => r._2 + r._3 + r._4 + r._5).sum ==
      n(id => id % 11 != 0 || id % 17 != 0), "diff rows must cover the union of releases")
  }

  test("pagerank top-20: dense ranks, teleport floor, mass bound, monotone order") {
    val out = SparkEntry.queries("q_pagerank")(spark, sf001)
      .select($"rn", $"node", $"rank_fp").as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == (1L to out.length), "rn must be dense from 1")
    // the top-k must fill up to min(20, |nodes|) — node count from the
    // degree histogram over the SAME co-purchase graph
    val nNodes = SparkEntry.queries("q_degree_stats")(spark, sf001)
      .agg(sum($"n_nodes")).as[Long].head()
    assert(out.length == math.min(20L, nNodes), s"expected min(20, $nNodes) rows")
    val ranks = out.map(_._3)
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b }, "ranks not sorted desc")
    // every node holds at least its teleport share and never the full mass
    assert(ranks.forall(r => r > 0 && r < 1000000000000L), "rank outside (0, mass)")
  }

  test("bm25 top docs: dense per-query ranks, positive scores, and hits contain a query term") {
    val qTerms = Map(1L -> Set("spark", "window"), 2L -> Set("hash", "merge"),
      3L -> Set("vector", "fast"))
    val out = SparkEntry.queries("q_bm25")(spark, sf001)
      .select($"query_id", $"rn", $"doc_id", $"score_n", $"n_terms")
      .as[(Long, Long, Long, Long, Long)].collect()
    val text = Tables(spark, sf001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    out.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length), s"query $qid ranks not dense")
      val scores = rows.sortBy(_._2).map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"query $qid not sorted")
      rows.foreach { case (_, _, doc, score, nt) =>
        assert(score > 0 && nt >= 1 && nt <= qTerms(qid).size)
        val toks = text(doc).split(" ").toSet
        assert(qTerms(qid).exists(toks), s"query $qid doc $doc contains no query term")
      }
    }
  }

  test("chunking reconstructs every document exactly from overlapped chunks") {
    val out = SparkEntry.queries("q_chunking")(spark, sf001)
      .select($"doc_id", $"chunk_id", $"chunk_start", $"chunk", $"chunk_len", $"is_last")
      .as[(Long, Long, Long, String, Long, Boolean)].collect()
    val text = Tables(spark, sf001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    out.groupBy(_._1).foreach { case (doc, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (0L until ordered.length), s"doc $doc chunk ids not dense")
      ordered.foreach { case (_, i, start, chunk, len, last) =>
        assert(start == i * 90 + 1 && len == chunk.length)
        assert(last == (i == ordered.length - 1), s"doc $doc chunk $i is_last wrong")
      }
      // stride-overlap reconstruction: first chunk + the post-overlap tail
      // of every later chunk must re-spell the document
      val rebuilt = ordered.head._4 + ordered.tail.map(_._4.drop(30)).mkString
      assert(rebuilt == text(doc), s"doc $doc does not reconstruct from its chunks")
    }
  }

  test("scd2 intervals chain per user, cover every event, and types change at boundaries") {
    val out = SparkEntry.queries("q_scd2")(spark, sf001)
      .select($"user_id", $"interval_seq", $"event_type", $"valid_from_us", $"valid_to_us",
        $"is_current", $"n_events")
      .as[(Long, Long, String, Long, Option[Long], Boolean, Long)].collect()
    val perUser = Tables(spark, sf001, "events").groupBy($"user_id")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    out.groupBy(_._1).foreach { case (user, rows) =>
      val ordered = rows.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (1L to ordered.length),
        s"user $user: interval_seq not dense from 1")
      assert(ordered.map(_._4).toSeq == ordered.map(_._4).sorted.toSeq,
        s"user $user: interval_seq order disagrees with time order")
      assert(ordered.map(_._7).sum == perUser(user), s"user $user: intervals lose events")
      assert(ordered.count(_._6) == 1 && ordered.last._6, s"user $user: is_current not unique-last")
      ordered.zip(ordered.tail).foreach { case (a, b) =>
        assert(a._5.contains(b._4), s"user $user: interval chain broken")
        assert(a._3 != b._3, s"user $user: consecutive intervals share a type (not collapsed)")
      }
      assert(ordered.last._5.isEmpty, "open interval must close the history")
    }
  }

  test("epoch shuffle: each epoch is a permutation with dense per-shard positions") {
    val out = SparkEntry.queries("q_epoch_shuffle")(spark, sf001)
      .select($"epoch", $"shard", $"pos", $"doc_id", $"h")
      .as[(Int, Long, Long, Long, Long)].collect()
    val docs = Tables(spark, sf001, "documents").select($"doc_id").as[Long].collect().toSet
    out.groupBy(_._1).foreach { case (ep, rows) =>
      assert(rows.map(_._4).toSet == docs && rows.length == docs.size,
        s"epoch $ep is not a permutation of the corpus")
      rows.foreach { case (_, shard, _, _, h) => assert(shard == h % 8 && shard >= 0) }
      rows.groupBy(_._2).foreach { case (shard, inShard) =>
        val ordered = inShard.sortBy(_._3)
        assert(ordered.map(_._3).toSeq == (1L to ordered.length),
          s"epoch $ep shard $shard positions not dense")
        val keys = ordered.map(r => (r._5, r._4))
        assert(keys.zip(keys.tail).forall { case (a, b) =>
          a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) },
          s"epoch $ep shard $shard not hash-ordered")
      }
    }
    // the two epochs must disagree somewhere, or the re-keying is vacuous
    val orders = out.groupBy(_._1).map { case (ep, rows) =>
      ep -> rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq }
    assert(orders(0) != orders(1), "epoch 0 and 1 produced the identical order")
  }

  test("char stats replay exactly against a Scala histogram of each document") {
    val out = SparkEntry.queries("q_char_stats")(spark, sf001)
      .select($"doc_id", $"n_chars", $"n_buckets", $"gini", $"top_ratio")
      .as[(Long, Long, Long, Double, Double)].collect()
    val text = Tables(spark, sf001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(out.length == text.size)
    out.foreach { case (doc, n, nb, gini, top) =>
      val t = text(doc)
      assert(n == t.length)
      val counts = (('a' to 'z') :+ ' ').map(c => t.count(_ == c).toLong)
      val all = counts :+ (n - counts.sum)
      assert(nb == all.count(_ > 0), s"doc $doc bucket count")
      val ssq = all.map(c => c * c).sum
      assert(gini == 1.0 - ssq.toDouble / (n * n).toDouble, s"doc $doc gini mismatch")
      assert(top == all.max.toDouble / n, s"doc $doc top_ratio mismatch")
      assert(gini >= 0.0 && gini < 1.0 && top > 0.0 && top <= 1.0)
    }
  }

  test("label propagation: seeds clamped, labels in range, propagation non-vacuous") {
    val out = SparkEntry.queries("q_label_prop")(spark, sf001)
      .select($"node", $"label", $"is_seed").as[(Long, Option[Long], Boolean)].collect()
    out.foreach { case (node, label, isSeed) =>
      assert(isSeed == (node % 10 == 0), s"node $node seed flag wrong")
      if (isSeed) assert(label.contains(node % 3), s"seed $node not clamped")
      label.foreach(l => assert(l >= 0 && l <= 2, s"node $node label $l out of range"))
    }
    assert(out.exists(r => !r._3 && r._2.isDefined),
      "no non-seed node was ever labeled — propagation is vacuous")
    assert(out.exists(_._3), "fixture has no seeds")
  }

  test("degree stats: histogram partitions the node set, cumulative exact, shares sum to 1") {
    val out = SparkEntry.queries("q_degree_stats")(spark, sf001)
      .select($"degree", $"n_nodes", $"cum_nodes", $"share")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val total = out.map(_._2).sum
    var cum = 0L
    out.foreach { case (d, n, c, sh) =>
      assert(d >= 1 && n >= 1)
      cum += n
      assert(c == cum, s"degree $d cumulative off")
      assert(sh == n.toDouble / total, s"degree $d share not the exact division")
    }
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-12, "shares must sum to 1")
  }

  test("feature hashing replays exactly against a Scala md5-prefix bucketer") {
    val out = SparkEntry.queries("q_feature_hashing")(spark, sf001)
      .select($"doc_id", $"n_terms", $"n_buckets", $"n_collisions", $"collision_rate")
      .as[(Long, Long, Long, Long, Double)].collect()
    val text = Tables(spark, sf001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    def bucket(term: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 256
    }
    assert(out.length == text.size)
    out.foreach { case (doc, nt, nb, nc, rate) =>
      val terms = text(doc).split(" ").toSet
      assert(nt == terms.size, s"doc $doc distinct term count")
      assert(nb == terms.map(bucket).size, s"doc $doc bucket count")
      assert(nc == nt - nb && rate == nc.toDouble / nt)
    }
  }

  test("minhash union: complete source-pair matrix with bounded slot agreement") {
    val out = SparkEntry.queries("q_minhash_union")(spark, sf001)
      .select($"source_a", $"source_b", $"n_match", $"est_jaccard")
      .as[(String, String, Long, Double)].collect()
    val sources = Tables(spark, sf001, "documents")
      .select($"source").distinct().as[String].collect().sorted
    val expectPairs = (for { a <- sources; b <- sources if a < b } yield (a, b)).toSet
    assert(out.map(r => (r._1, r._2)).toSet == expectPairs,
      "pair matrix must cover exactly C(S,2) ordered source pairs")
    out.foreach { case (a, b, n, est) =>
      assert(a < b && n >= 0 && n <= 16, s"($a,$b) slot agreement $n out of range")
      assert(est == n.toDouble / 16, s"($a,$b) estimate is not the exact division")
    }
  }

  test("weighted sample replays exactly as the bottom-20 by hash/weight priority") {
    val out = SparkEntry.queries("q_weighted_sample")(spark, sf001)
      .select($"rn", $"doc_id", $"n_tok", $"pri").as[(Long, Long, Long, Double)].collect()
      .sortBy(_._1)
    def h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val all = Tables(spark, sf001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split(" ").length.toLong) }
      .map { case (id, n) => (id, n, h(id).toDouble / n) }
      .sortBy { case (id, _, pri) => (pri, id) }
    assert(out.length == 20)
    out.zip(all.take(20)).foreach { case ((rn, doc, n, pri), (eid, en, epri)) =>
      assert(doc == eid && n == en && pri == epri, s"rank $rn: got $doc, expected $eid")
    }
  }

  test("quantile normalization: exact (rank-1)/(n-1) percentiles per language") {
    val out = SparkEntry.queries("q_quantile_normalize")(spark, sf001)
      .select($"doc_id", $"lang", $"n_chars", $"pct")
      .as[(Long, String, Long, Double)].collect()
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      val n = ordered.length
      ordered.zipWithIndex.foreach { case ((doc, _, _, pct), i) =>
        val expect = if (n == 1) 0.0 else i.toDouble / (n - 1)
        assert(pct == expect, s"lang $lang doc $doc pct $pct != $expect")
      }
    }
  }

  test("hll tokens: estimates inside the error envelope, union exactly equals one-pass sketch") {
    val out = SparkEntry.queries("q_hll_tokens")(spark, sf001)
      .select($"source", $"est_distinct").as[(String, Long)].collect().toMap
    val t = Tables(spark, sf001, "documents")
      .select($"source", explode(split($"text", " ")).as("term"))
    val exact = t.groupBy($"source").agg(countDistinct($"term").as("n"))
      .as[(String, Long)].collect().toMap
    assert(out.keySet == exact.keySet + "__ALL__", "one row per source plus the union row")
    // lgK=12 HLL: published relative standard error ~1.04/sqrt(4096) ≈ 1.6%;
    // 5% is > 3 sigma on every source in this corpus
    exact.foreach { case (src, n) =>
      assert(math.abs(out(src) - n) <= math.max(3, (0.05 * n).toLong),
        s"source $src: estimate ${out(src)} vs exact $n outside the envelope")
    }
    // merge exactness: the union of per-source sketches IS the sketch of
    // the whole corpus (bucket-max merge is lossless), so the estimates
    // must be EQUAL, not just close
    val direct = t.agg(expr("hll_sketch_estimate(hll_sketch_agg(term, 12))").as("e"))
      .as[Long].head()
    assert(out("__ALL__") == direct, s"union ${out("__ALL__")} != one-pass sketch $direct")
  }

  test("variant extraction agrees exactly with the from_json flatten path") {
    val v = SparkEntry.queries("q_variant_extract")(spark, sf001)
      .select($"event_type", $"n", $"sum_k").as[(String, Long, Long)].collect().toMap2
    val f = SparkEntry.queries("q_json_flatten")(spark, sf001)
    val viaFlatten = f.join(Tables(spark, sf001, "events").select($"event_id", $"event_type"), "event_id")
      .groupBy($"event_type").agg(count(lit(1)).as("n"), sum($"k").as("sum_k"))
      .as[(String, Long, Long)].collect().toMap2
    assert(v == viaFlatten, "variant_get and from_json must extract identical payloads")
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("skyline equals the brute-force dominance check per language") {
    val out = SparkEntry.queries("q_skyline")(spark, sf001)
      .select($"lang", $"doc_id", $"n_tok", $"n_distinct")
      .as[(String, Long, Long, Long)].collect()
    val docs = Tables(spark, sf001, "documents")
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
      .map { case (id, lang, t) =>
        val toks = t.split(" "); (lang, id, toks.length.toLong, toks.distinct.length.toLong) }
    val expect = docs.filter { case (lang, _, a, b) =>
      !docs.exists { case (l2, _, a2, b2) =>
        l2 == lang && a2 >= a && b2 >= b && (a2 > a || b2 > b) }
    }.map(r => (r._1, r._2)).toSet
    assert(out.map(r => (r._1, r._2)).toSet == expect,
      "skyline must equal the O(n^2) dominance filter")
    out.foreach { case (lang, id, a, b) =>
      val (_, _, ea, eb) = docs.find(d => d._1 == lang && d._2 == id).get
      assert(a == ea && b == eb)
    }
  }

  test("ks drift replays exactly against a Scala CDF supremum") {
    val out = SparkEntry.queries("q_ks_drift")(spark, sf001)
      // d_num surfaces as VARCHAR (decimal128 is intermediates-only —
      // the driver's decimal fetch paths canonicalize inconsistently);
      // the sf0.001 value fits a long exactly, so the cast is lossless here
      .select($"na", $"nb", $"at_x", $"d_num".cast("long"), $"ks")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.length == 1)
    val (na, nb, atX, dNum, ks) = out.head
    val xs = Tables(spark, sf001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => (t.split(" ").length.toLong, id % 2) }
    val (a, b) = (xs.filter(_._2 == 0).map(_._1), xs.filter(_._2 == 1).map(_._1))
    assert(na == a.length && nb == b.length)
    val sup = xs.map(_._1).distinct.sorted.map { v =>
      (v, math.abs(a.count(_ <= v).toLong * nb - b.count(_ <= v).toLong * na))
    }
    val best = sup.maxBy { case (v, num) => (num, -v) }
    assert((atX, dNum) == best, s"got ($atX, $dNum), expected $best")
    assert(ks == dNum.toDouble / (na * nb) && ks >= 0.0 && ks <= 1.0)
  }

  test("compress ratio: bounds, byte accounting, repetition ordering, determinism") {
    val out = SparkEntry.queries("q_compress_ratio")(spark, sf001)
      .as[(Long, Long, Long, Double)].collect()
    val n = Tables(spark, sf001, "documents").count()
    assert(out.length == n)
    out.foreach { case (_, raw, defl, ratio) =>
      // DEFLATE overhead is bounded (~11 bytes + 5/16k block headers), so
      // the ratio can exceed 1 only slightly on tiny inputs
      assert(raw > 0 && defl > 0 && ratio > 0.0 && ratio <= 1.2,
        s"ratio $ratio (raw=$raw defl=$defl) outside the sane band")
      assert(ratio == defl.toDouble / raw, "ratio must be defl/raw exactly")
    }
    // raw_bytes is plain UTF-8 byte accounting
    val rawSpark = Tables(spark, sf001, "documents")
      .select($"doc_id", octet_length($"text").cast("long")).as[(Long, Long)]
      .collect().toMap
    out.foreach { case (id, raw, _, _) => assert(raw == rawSpark(id)) }
    // repetitive text compresses strictly better than varied text, and
    // the empty/null documents pin to (0, 0, 0.0) rather than reporting
    // zlib header bytes as incompressibility
    val probe = Seq(
      (1L, Seq.fill(200)("spam").mkString(" ")),
      (2L, (0 until 200).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")),
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val pp = graft.functions.Compression.deflateStats(probe, "doc_id", "text")
      .collect().map(p => p.doc_id -> p).toMap
    val pr = pp.view.mapValues(_.ratio).toMap
    assert(pr(1L) < pr(2L) / 2,
      s"repetition must compress far better: ${pr(1L)} vs ${pr(2L)}")
    Seq(3L, 4L).foreach { id =>
      assert(pp(id).raw_bytes == 0 && pp(id).deflate_bytes == 0 && pp(id).ratio == 0.0,
        s"empty doc $id must pin to (0, 0, 0.0)")
    }
    // same input, same stream: the column is reproducible
    val again = SparkEntry.queries("q_compress_ratio")(spark, sf001)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("semdedup: keep-first marking replays exactly from the assignment") {
    val out = SparkEntry.queries("q_semdedup")(spark, sf001)
      .select($"vec_id", $"cluster".cast("long"), $"keeper_id", $"n_near", $"is_dup")
      .as[(Long, Long, Option[Long], Long, Boolean)].collect()
    val n = Tables(spark, sf001, "embeddings").count()
    assert(out.length == n && out.map(_._1).distinct.length == n,
      "exactly one verdict row per vector")
    // flag algebra: is_dup ⟺ keeper present ⟺ n_near ≥ 1; keeper precedes
    out.foreach { case (id, _, keeper, near, dup) =>
      assert(dup == keeper.isDefined && dup == (near >= 1),
        s"vec $id: inconsistent (keeper=$keeper, n_near=$near, is_dup=$dup)")
      keeper.foreach(k => assert(k < id, s"vec $id: keeper $k not earlier"))
    }
    // independent replay of the marking from (cluster, shard, q): a vector
    // is a dup iff a LOWER-id vector in its (cluster, shard) clears the
    // 0.35 cosine, keeper is the min such id, n_near the count — the same
    // quantized arithmetic, recomputed in plain Scala over the collected
    // corpus (50 vectors at sf0.001)
    val q = Tables(spark, sf001, "embeddings")
      .select($"vec_id", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))"))
      .as[(Long, Seq[Long])].collect().toMap
    val cluster = out.map(r => r._1 -> r._2).toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    out.foreach { case (id, cl, keeper, near, _) =>
      val hits = out.map(_._1).filter(o =>
        o < id && cluster(o) == cl && o / 2000 == id / 2000 &&
          cos(q(o), q(id)) >= 0.35).sorted
      assert(hits.headOption == keeper && hits.length == near,
        s"vec $id: replay found $hits, query said (keeper=$keeper, n=$near)")
    }
    // the marking is cluster-LOCAL by design (the SemDeDup contract): at
    // least one cross-cluster pair above threshold must exist untouched
    // at this sf, or the locality claim is vacuous here
    val cross = out.flatMap { case (id, cl, _, _, _) =>
      out.collect { case (o, ocl, _, _, _)
        if o < id && ocl != cl && cos(q(o), q(id)) >= 0.35 => (o, id) }
    }
    assert(cross.nonEmpty, "no cross-cluster near pair at sf0.001 — " +
      "locality assertion is vacuous, lower the probe threshold")
  }

  test("cdc upsert: last writer wins, tombstoned keys absent, re-inserts survive") {
    val out = SparkEntry.queries("q_cdc_upsert")(spark, sf001)
      .select($"user_id", $"n_versions", $"n_deletes", $"last_type", $"last_value", $"last_ts_us")
      .as[(Long, Long, Long, String, Double, Long)].collect()
    // independent replay: per-user last change by (ts, event_id) in plain Scala
    val log = Tables(spark, sf001, "events")
      .select($"user_id", $"event_type", $"value", unix_micros($"ts"), $"event_id")
      .as[(Long, String, Double, Long, Long)].collect()
    val byUser = log.groupBy(_._1)
    val expected = byUser.flatMap { case (u, rows) =>
      val last = rows.maxBy(r => (r._4, r._5))
      if (last._2 == "error") None
      else Some(u -> (rows.length.toLong,
        rows.count(_._2 == "error").toLong, last._2, last._3, last._4))
    }
    assert(out.length == expected.size, "snapshot key count differs from replay")
    out.foreach { case (u, nv, nd, lt, lv, lts) =>
      val (env, end, elt, elv, elts) = expected(u)
      assert((nv, nd, lt, lv, lts) == (env, end, elt, elv, elts), s"user $u mismatch")
    }
    // every tombstoned-last key really is absent
    val gone = byUser.keySet -- expected.keySet
    val present = out.map(_._1).toSet
    gone.foreach(u => assert(!present(u), s"tombstoned user $u leaked into the snapshot"))
    assert(gone.nonEmpty, "no user ends on a tombstone at sf0.001 — deletion arm untested")
    // delete-then-reinsert survival: some surviving key must carry deletes
    assert(out.exists(_._3 > 0), "no surviving key with prior deletes — re-insert arm vacuous")
  }

  test("token entropy: integer-log2 identity, bounds, and the flag threshold") {
    val out = SparkEntry.queries("q_token_entropy")(spark, sf001)
      .select($"doc_id", $"n_tokens", $"n_types", $"ent_bits", $"entropy", $"ttr", $"flagged")
      .as[(Long, Long, Long, Long, Double, Double, Boolean)].collect()
    def fl2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    // independent replay of the integer-exact definition from raw text
    val docs = Tables(spark, sf001, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    out.foreach { case (id, n, types, bits, h, ttr, f) =>
      val counts = docs(id).split(" ").filter(_.nonEmpty)
        .groupBy(identity).map(_._2.length.toLong)
      assert(counts.sum == n && counts.size == types, s"doc $id count mismatch")
      val expBits = n * fl2(n) - counts.map(c => c * fl2(c)).sum
      assert(bits == expBits, s"doc $id: ent_bits $bits, replay $expBits")
      assert(bits >= 0 && h >= 0.0 && h <= fl2(n).toDouble, s"doc $id entropy out of bounds")
      assert(h == bits.toDouble / n && ttr == types.toDouble / n, s"doc $id division drift")
      assert(f == (h < 4.0), s"doc $id flag/threshold drift")
    }
    // a uniform single-type doc has entropy exactly 0 — check the formula
    // degenerates correctly rather than only asserting over corpus docs
    assert(1L * fl2(1L) == 0L)
  }

  test("regr trend: moments match a plain-Scala least-squares replay") {
    val out = SparkEntry.queries("q_regr_trend")(spark, sf001)
      .select($"event_type", $"n_days", $"slope", $"intercept", $"r2")
      .as[(String, Long, Double, Double, Option[Double])].collect()
    val days = Tables(spark, sf001, "events")
      .select($"event_type", expr("unix_micros(ts) DIV 86400000000"))
      .as[(String, Long)].collect()
    val expected = days.groupBy(_._1).filter(_._2.map(_._2).distinct.length >= 2)
      .map { case (t, rows) =>
      val counts = rows.groupBy(_._2).map { case (d, r) => (d, r.length.toLong) }
      val k = counts.size.toLong
      val sx = counts.keys.map(BigInt(_)).sum
      val sy = counts.values.map(BigInt(_)).sum
      val sxy = counts.map { case (d, n) => BigInt(d) * n }.sum
      val sxx = counts.keys.map(d => BigInt(d) * d).sum
      val syy = counts.values.map(n => BigInt(n) * n).sum
      val num = (k * sxy - sx * sy).toDouble
      val den = (k * sxx - sx * sx).toDouble
      val d2 = k * syy - sy * sy
      t -> (k, num / den,
        (sy.toDouble - num / den * sx.toDouble) / k,
        if (d2 == 0) None else Some(num * num / (den * d2.toDouble)))
    }
    assert(out.length == expected.size)
    out.foreach { case (t, k, sl, ic, r2) =>
      val (ek, esl, eic, er2) = expected(t)
      assert(k == ek && sl == esl && ic == eic && r2 == er2, s"$t regression drift")
    }
    // the fit must be non-degenerate somewhere: R² strictly inside (0,1)
    assert(out.exists(r => r._5.exists(v => v > 0 && v < 1)),
      "all fits degenerate at sf0.001 — moments arm vacuous")
  }

  test("islands: every streak is a maximal consecutive day run") {
    val out = SparkEntry.queries("q_islands")(spark, sf001)
      .select($"user_id", $"streak_start", $"streak_end", $"streak_len")
      .as[(Long, Long, Long, Long)].collect()
    val active = Tables(spark, sf001, "events")
      .select($"user_id", expr("unix_micros(ts) DIV 86400000000"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (u, r) => u -> r.map(_._2).toSet }
    out.foreach { case (u, lo, hi, len) =>
      assert(hi - lo + 1 == len && len >= 3, s"user $u span/len drift")
      (lo to hi).foreach(d => assert(active(u)(d), s"user $u day $d inactive inside streak"))
      // maximality: the days flanking the island are NOT active
      assert(!active(u)(lo - 1) && !active(u)(hi + 1), s"user $u streak not maximal")
    }
    // replay the full island inventory: no qualifying run may be missing
    val expected = active.iterator.flatMap { case (u, ds) =>
      ds.toSeq.sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: t, d) if d == e + 1 => (s, d) :: t
        case (acc, d) => (d, d) :: acc
      }.collect { case (s, e) if e - s + 1 >= 3 => (u, s, e, e - s + 1) }
    }.toSet
    assert(out.toSet == expected, "island inventory differs from replay")
  }

  test("abtest z: counts and pooled z match an exact replay, both signs present") {
    val out = SparkEntry.queries("q_abtest_z")(spark, sf001)
      .select($"source", $"n", $"pass", $"z", $"flagged")
      .as[(String, Long, Long, Double, Boolean)].collect()
    val docs = Tables(spark, sf001, "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val bySrc = docs.groupBy(_._1)
    val tn = docs.length.toLong
    val tpass = docs.count(_._2 >= 300).toLong
    assert(out.length == bySrc.size)
    out.foreach { case (src, n, pass, z, f) =>
      val rows = bySrc(src)
      assert(n == rows.length && pass == rows.count(_._2 >= 300), s"$src counts drift")
      val pS = pass.toDouble / n
      val pR = (tpass - pass).toDouble / (tn - n)
      val pP = tpass.toDouble / tn
      val ez = (pS - pR) / math.sqrt(pP * (1 - pP) * (1.0 / n + 1.0 / (tn - n)))
      assert(z == ez, s"$src z drift: $z vs $ez")
      assert(f == (math.abs(z) > 1.96), s"$src flag drift")
    }
    // the test is two-sided — a healthy corpus shows both directions
    assert(out.exists(_._4 > 0) && out.exists(_._4 < 0),
      "all sources drift one way at sf0.001 — two-sided arm vacuous")
  }

  test("bfs hops: matches a plain-Scala bounded BFS over the replayed edge set") {
    val out = SparkEntry.queries("q_bfs_hops")(spark, sf001)
      .select($"node", $"hop").as[(Long, Long)].collect().toMap
    // rebuild the support-filtered co-purchase edges independently
    val items = Tables(spark, sf001, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect()
    val adj = items.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    // NB: .iterator before .collect — collect on a Map with tuple results
    // would rebuild a Map keyed on `a` and silently drop all but one
    // edge per source node
    }.toSeq.groupBy(identity).iterator
      .collect { case ((a, b), g) if g.size >= 2 => (a, b) }
      .toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
    val seeds = adj.keySet.filter(_ % 100 == 0)
    assert(seeds.nonEmpty, "no seed node at sf0.001 — traversal vacuous")
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val next = dist.toSeq.flatMap { case (u, h) =>
        adj.getOrElse(u, Set.empty).map(_ -> (h + 1))
      }
      dist = (dist.toSeq ++ next).groupBy(_._1)
        .map { case (u, hs) => u -> hs.map(_._2).min }
    }
    assert(out == dist, "hop inventory differs from replay")
    // the bound must bite: some node at hop 3, and hop counts decrease
    assert(out.values.toSet.contains(3L) || out.values.max < 3L)
    assert(out.exists(_._2 > 0), "no node beyond the seed set — frontier arm vacuous")
  }

  test("auc: matches a rank-the-rows replay with midrank ties, and is order-consistent") {
    val out = SparkEntry.queries("q_auc")(spark, sf001)
      .select($"lang", $"n_pos", $"n_neg", $"auc")
      .as[(String, Long, Long, Option[Double])].collect()
    val docs = Tables(spark, sf001, "documents")
      .select($"lang", $"n_chars", instr($"text", "spark") > 0)
      .as[(String, Long, Boolean)].collect()
    val expected = docs.groupBy(_._1).map { case (lang, rows) =>
      // independent path: literally assign midranks to sorted rows
      val sorted = rows.map(r => (r._2, r._3)).sortBy(_._1)
      // NB: .toSeq before flatMap — a Map result keyed on the Boolean
      // would silently collapse to one rank per label
      val ranks = sorted.zipWithIndex.groupBy(_._1._1).toSeq.flatMap { case (_, grp) =>
        val mid = grp.map(_._2 + 1).sum.toDouble / grp.size // average rank
        grp.map { case ((_, pos), _) => (pos, mid) }
      }
      val nPos = sorted.count(_._2)
      val nNeg = sorted.length - nPos
      val rPos = ranks.collect { case (true, r) => r }.sum
      val auc =
        if (nPos == 0 || nNeg == 0) None
        else Some((rPos - nPos.toLong * (nPos + 1) / 2.0) / (nPos.toDouble * nNeg))
      lang -> (nPos.toLong, nNeg.toLong, auc)
    }
    assert(out.length == expected.size)
    out.foreach { case (lang, np, nn, auc) =>
      val (enp, enn, eauc) = expected(lang)
      assert(np == enp && nn == enn, s"$lang count drift")
      (auc, eauc) match {
        case (Some(a), Some(e)) => assert(math.abs(a - e) < 1e-12, s"$lang auc $a vs $e")
        case (a, e)             => assert(a == e, s"$lang degenerate-arm drift")
      }
    }
    // the metric must be informative somewhere: some AUC strictly inside (0,1)
    assert(out.exists(_._4.exists(a => a > 0 && a < 1)), "all AUCs degenerate at sf0.001")
  }

  test("calibration: bins partition the corpus and per-bin stats replay exactly") {
    val out = SparkEntry.queries("q_calibration")(spark, sf001)
      .select($"bin", $"n", $"n_pos", $"mean_pred", $"frac_pos", $"gap")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    val docs = Tables(spark, sf001, "documents")
      .select($"n_chars", instr($"text", "spark") > 0)
      .as[(Long, Boolean)].collect()
    assert(out.map(_._2).sum == docs.length, "bins must partition the corpus")
    assert(out.map(_._1).distinct.length == out.length, "duplicate bin rows")
    assert(out.forall(r => r._1 >= 0 && r._1 <= 9), "bin outside the decile range")
    val byBin = docs.groupBy { case (nc, _) => math.min(math.min(nc, 600L) * 10 / 600, 9L) }
    out.foreach { case (bin, n, nPos, meanPred, fracPos, gap) =>
      val rows = byBin(bin)
      assert(n == rows.length && nPos == rows.count(_._2), s"bin $bin count drift")
      val clampedSum = rows.map(r => math.min(r._1, 600L)).sum
      assert(meanPred == clampedSum.toDouble / (600.0 * n), s"bin $bin mean_pred drift")
      assert(fracPos == nPos.toDouble / n, s"bin $bin frac_pos drift")
      assert(gap == math.abs(meanPred - fracPos), s"bin $bin gap drift")
      // binning consistency: every member's prediction falls in the bin's span
      rows.foreach { case (nc, _) =>
        val p = math.min(nc, 600L).toDouble / 600.0
        assert(p >= bin / 10.0 && (p <= (bin + 1) / 10.0 || bin == 9), s"bin $bin leak")
      }
    }
  }

  /** Exact rational d/(den) comparable via cross-multiplication. */
  private case class ExactFrac(num: BigInt, den: BigInt)
  private object ExactFrac {
    val ordering: Ordering[ExactFrac] =
      (a: ExactFrac, b: ExactFrac) => (a.num * b.den).compare(b.num * a.den)
  }
}
