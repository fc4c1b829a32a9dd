package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Distributed end-to-end contract of the Misra–Gries heavy-hitter path
  * (the algebraic guarantees are property-checked in [[SketchProps]]). */
class SketchSpec extends SparkSpec {

  test("sketch-first heavy hitters equals the exact query, invariant to partitioning") {
    import spark.implicits._
    val exact = SparkEntry.queries("q_heavy_hitters")(spark, sf001)
      .select($"rk", $"term", $"n").as[(Int, String, Long)].collect().toSeq
    val sketch = SparkEntry.queries("q_heavy_hitters_sketch")(spark, sf001)
      .as[(Int, String, Long)].collect().toSeq
    assert(sketch == exact, "sketch path must be invisible in the answer")
    // adversarial partitioning: many tiny partials stress the merge rule
    val t = Tables(spark, sf001, "documents")
      .repartition(23)
      .select(explode(split($"text", " ")).as("term"))
    val cands = t.agg(Sketches.misraGries(256)($"term").as("mg"))
      .select(explode(map_keys($"mg")).as("term")).as[String].collect().toSet
    exact.foreach { case (_, term, _) =>
      assert(cands.contains(term), s"top-20 token $term missing from candidates")
    }
  }

  test("sketch percentile skips SQL NULLs like every other aggregate") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(3.0), Some(5.0), None).toDF("x")
    val med = df.agg(Sketches.quantileSketch(16, Seq(0.5))($"x"))
      .head().getSeq[Double](0).head
    // {1,3,5} median — a primitive-input aggregator would decode the
    // nulls as 0.0, count them, and answer 1.0
    assert(med == 3.0, s"nulls were counted: median = $med")
  }

  test("sketch-MAD twin tracks the exact MAD fences (same rows, bounded drift)") {
    val exact = SparkEntry.queries("q_mad_outliers")(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val sk = SparkEntry.queries("q_mad_outliers_sketch")(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(exact.keySet == sk.keySet)
    exact.foreach { case (flag, (n, out, mad)) =>
      val (n2, out2, mad2) = sk(flag)
      // identical population per group; the sketch only moves the fences
      assert(n2 == n, s"$flag: row count diverged")
      assert(math.abs(mad2 - mad) / mad <= 0.05,
        s"$flag: sketch MAD $mad2 drifted > 5% from exact $mad")
      // the fence count may drift with the median estimates, but bounded:
      // a ≤ 2% rank-error median on this uniform column moves the strict
      // ad > 1.5·mad cut by a few percent of the group at most
      assert(math.abs(out2 - out).toDouble / n <= 0.10,
        s"$flag: outlier count $out2 drifted > 10% of group from exact $out")
    }
  }

  test("sketch trimmed-stats twin tracks the exact fences (same rows, bounded drift)") {
    val exact = SparkEntry.queries("q_trimmed_stats")(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val sk = SparkEntry.queries("q_trimmed_stats_sketch")(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(exact.keySet == sk.keySet)
    exact.foreach { case (flag, (n, kept, mean)) =>
      val (n2, kept2, mean2) = sk(flag)
      // identical population per group; the sketch only moves the fences
      assert(n2 == n, s"$flag: row count diverged")
      // ≤ 2% rank error on each fence moves the kept set by a few
      // percent of the group at most, and the trimmed mean (an average
      // over ~80% of a smooth column) by far less
      assert(math.abs(kept2 - kept).toDouble / n <= 0.10,
        s"$flag: kept count $kept2 drifted > 10% of group from exact $kept")
      assert(math.abs(mean2 - mean) / mean <= 0.05,
        s"$flag: sketch trimmed mean $mean2 drifted > 5% from exact $mean")
    }
  }

  test("sketch percentile lands within 2% rank error of the exact data, per group") {
    import spark.implicits._
    val qs = Seq(0.25, 0.5, 0.9)
    val est = SparkEntry.queries("q_percentile_sketch")(spark, sf001)
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> Array(r._2, r._3, r._4)).toMap
    val groups = Tables(spark, sf001, "lineitem")
      .select($"l_returnflag", $"l_quantity".cast("double"))
      .as[(String, Double)].collect().groupBy(_._1)
    assert(est.keySet == groups.keySet)
    groups.foreach { case (flag, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      qs.zip(est(flag)).foreach { case (q, e) =>
        val lo = sorted.count(_ < e)
        val hi = sorted.count(_ <= e)
        val t = math.max(1, math.ceil(q * n).toInt)
        val err = if (t < lo + 1) lo + 1 - t else if (t > hi) t - hi else 0
        assert(err <= math.max(1, (0.02 * n).toInt),
          s"group $flag q=$q est=$e rank error $err of $n")
      }
    }
    // adversarial partitioning: many tiny partials must merge to the
    // same answer the single-partition fold produces
    val one = Tables(spark, sf001, "lineitem").coalesce(1)
      .agg(Sketches.quantileSketch(256, qs)($"l_quantity".cast("double")))
      .head().getSeq[Double](0)
    val many = Tables(spark, sf001, "lineitem").repartition(37)
      .agg(Sketches.quantileSketch(256, qs)($"l_quantity".cast("double")))
      .head().getSeq[Double](0)
    val all = Tables(spark, sf001, "lineitem")
      .select($"l_quantity".cast("double")).as[Double].collect().sorted
    qs.zipWithIndex.foreach { case (q, i) =>
      val t = math.max(1, math.ceil(q * all.length).toInt)
      Seq(one(i), many(i)).foreach { e =>
        val lo = all.count(_ < e)
        val hi = all.count(_ <= e)
        val err = if (t < lo + 1) lo + 1 - t else if (t > hi) t - hi else 0
        assert(err <= math.max(1, (0.02 * all.length).toInt),
          s"q=$q est=$e err=$err over ${all.length}")
      }
    }
  }
}
