package graft

import org.apache.spark.sql.functions._

import graft.functions.{Exact, Robust}

/** Contract of the [[graft.functions.Robust]] exact/sketch front door:
  * both modes return the pinned shapes, and Auto picks the side its
  * row-count threshold says. The numerical drift between the twins is
  * bounded separately in SketchSpec against the gated queries. */
class RobustSpec extends SparkSpec {

  private def mils = {
    import spark.implicits._
    Tables(spark, sf001, "lineitem")
      .select($"l_returnflag", (Exact.dec($"l_extendedprice") * 1000).cast("long").as("pm"))
  }

  test("madOutliers: both modes return the same schema; exact matches the gated query") {
    import spark.implicits._
    val ex = Robust.madOutliers(mils, "l_returnflag", "pm", 1.5, Robust.Mode.Exact)
    val sk = Robust.madOutliers(mils, "l_returnflag", "pm", 1.5, Robust.Mode.Sketch)
    assert(ex.schema == sk.schema, "mode switch must be schema-invisible")
    assert(ex.columns.toSeq == Seq("l_returnflag", "n_rows", "n_outliers", "mad"))
    val viaQuery = SparkEntry.queries("q_mad_outliers")(spark, sf001)
      .select($"l_returnflag", $"n_rows", $"n_outliers").collect().toSeq
    val direct = ex.orderBy($"l_returnflag")
      .select($"l_returnflag", $"n_rows", $"n_outliers").collect().toSeq
    assert(direct == viaQuery, "front door must reproduce the oracle-gated query")
  }

  test("trimmedStats: both modes return the same schema; counts are sane") {
    val ex = Robust.trimmedStats(mils, "l_returnflag", "pm", 0.1, 0.9, Robust.Mode.Exact)
    val sk = Robust.trimmedStats(mils, "l_returnflag", "pm", 0.1, 0.9, Robust.Mode.Sketch)
    assert(ex.schema == sk.schema)
    assert(ex.columns.toSeq ==
      Seq("l_returnflag", "n_rows", "n_kept", "trimmed_mean", "lo_fence", "hi_fence"))
    ex.collect().foreach { r =>
      val (n, kept) = (r.getLong(1), r.getLong(2))
      assert(kept <= n && kept >= (n * 0.7).toLong, s"10/90 trim kept $kept of $n")
    }
  }

  test("percentiles: caller-named columns, exact interpolation matches SQL percentile") {
    val p = Robust.percentiles(mils, "l_returnflag", "pm",
      Seq(0.5 -> "med", 0.9 -> "p90"), Robust.Mode.Exact).orderBy("l_returnflag")
    assert(p.columns.toSeq == Seq("l_returnflag", "med", "p90"))
    val ref = mils.groupBy("l_returnflag")
      .agg(expr("percentile(pm, 0.5)").as("med"), expr("percentile(pm, 0.9)").as("p90"))
      .orderBy("l_returnflag")
    assert(p.collect().toSeq == ref.collect().toSeq)
  }

  test("heavyHitters: both modes return the exact top-k with one schema") {
    import graft.functions.TextFunctions.tokens
    val terms = Tables(spark, sf001, "documents")
      .select(explode(tokens("text")).as("term"))
    val exact = Robust.heavyHitters(terms, "term", topK = 20, Robust.Mode.Exact)
    val sketch = Robust.heavyHitters(terms, "term", topK = 20, Robust.Mode.Sketch)
    assert(exact.columns.toSeq == Seq("rk", "term", "n"))
    assert(sketch.columns.toSeq == Seq("rk", "term", "n"))
    // the MG guarantee holds here (20th count clears N/257), so the
    // sketch path must be INVISIBLE in the answer
    assert(sketch.collect().toSeq == exact.collect().toSeq)
    assert(exact.count() == 20)
    intercept[IllegalArgumentException] {
      Robust.heavyHitters(terms, "term", topK = 20, Robust.Mode.Sketch, capacity = 10)
    }
  }

  test("heavyHitters: NULL keys are excluded identically in both modes") {
    import spark.implicits._
    // a null-heavy dirty column: without the shared filter, Exact would
    // rank the null group #1 while the MG sketch structurally cannot
    // see it — two different answers from one front door
    val dirty = (Seq.fill(50)(Option.empty[String]) ++
      Seq.fill(30)(Some("a")) ++ Seq.fill(20)(Some("b")) ++ Seq.fill(10)(Some("c")))
      .toDF("k")
    val exact = Robust.heavyHitters(dirty, "k", topK = 3, Robust.Mode.Exact)
      .as[(Int, String, Long)].collect().toSeq
    val sketch = Robust.heavyHitters(dirty, "k", topK = 3, Robust.Mode.Sketch)
      .as[(Int, String, Long)].collect().toSeq
    assert(exact == Seq((1, "a", 30L), (2, "b", 20L), (3, "c", 10L)))
    assert(sketch == exact)
  }

  test("Auto heavy hitters escalate to exact when the MG guarantee is void") {
    import spark.implicits._
    // frequency-FLATTENED corpus (the sf1 shard-lake regime from
    // COVERAGE.md): 300 keys × 6 with the true top-3 only one count
    // ahead — far below the detection line N/(capacity+1), so the MG
    // survivors past the line are arbitrary and the raw sketch answer is
    // untrustworthy. Auto must audit the k-th candidate count against
    // the line and escalate to the exact vocabulary count.
    val flat = (1 to 300).flatMap(i => Seq.fill(6)(f"k$i%03d"))
    val tops = Seq.fill(7)("aaa") ++ Seq.fill(7)("aab") ++ Seq.fill(7)("aac")
    val df = (flat ++ tops).toDF("k").repartition(8)
    val expected = Seq((1, "aaa", 7L), (2, "aab", 7L), (3, "aac", 7L))
    val exact = Robust.heavyHitters(df, "k", topK = 3, Robust.Mode.Exact,
      capacity = 16).as[(Int, String, Long)].collect().toSeq
    assert(exact == expected)
    val auto = Robust.heavyHitters(df, "k", topK = 3,
      Robust.Mode.Auto(maxExactRows = 0), capacity = 16)
      .as[(Int, String, Long)].collect().toSeq
    assert(auto == expected, "Auto must escalate to exact when the guarantee is void")
  }

  test("Auto heavy hitters: a skewed corpus passes the audit on the sketch path") {
    import spark.implicits._
    // heavily skewed: the 3rd count (200) clears N/(capacity+1) = 61, so
    // the audit proves the candidate top-3 exact and Auto never pays the
    // vocabulary shuffle — the answer must still BE the exact top-3
    val df = (Seq.fill(500)("hot") ++ Seq.fill(300)("warm") ++
      Seq.fill(200)("cool") ++ (1 to 50).map(i => f"tail$i%02d"))
      .toDF("k").repartition(8)
    val expected = Seq((1, "hot", 500L), (2, "warm", 300L), (3, "cool", 200L))
    val auto = Robust.heavyHitters(df, "k", topK = 3,
      Robust.Mode.Auto(maxExactRows = 0), capacity = 16)
      .as[(Int, String, Long)].collect().toSeq
    assert(auto == expected)
  }

  test("Auto picks exact under the threshold and sketch above it") {
    // Threshold far above sf0.001 row count -> exact; 0 -> sketch. The two
    // sides are distinguishable through the fence values on this data only
    // when they disagree — so pin by comparing against each explicit mode.
    val autoHi = Robust.madOutliers(mils, "l_returnflag", "pm", 1.5,
      Robust.Mode.Auto(maxExactRows = Long.MaxValue)).orderBy("l_returnflag").collect().toSeq
    val exact = Robust.madOutliers(mils, "l_returnflag", "pm", 1.5,
      Robust.Mode.Exact).orderBy("l_returnflag").collect().toSeq
    assert(autoHi == exact, "Auto under threshold must BE the exact path")
    val auto0 = Robust.madOutliers(mils, "l_returnflag", "pm", 1.5,
      Robust.Mode.Auto(maxExactRows = 0)).orderBy("l_returnflag").collect().toSeq
    val sketch = Robust.madOutliers(mils, "l_returnflag", "pm", 1.5,
      Robust.Mode.Sketch).orderBy("l_returnflag").collect().toSeq
    assert(auto0 == sketch, "Auto over threshold must BE the sketch path")
  }

  // ---- r18: the exact path now computes interpolated percentiles from
  // the per-group value DISTRIBUTION instead of the sort-buffering
  // `percentile` reducer. The replacement must be BIT-identical on
  // adversarial shapes: fractional rank positions (q not a power of 2),
  // heavy duplicate runs (lowerKey == higherKey short-circuit), null
  // values (excluded from fences, counted in rows), singleton and
  // two-row groups (position == 0 / pure interpolation), and double
  // values (toDoubleValue identity).
  test("exact fences from counts are bit-identical to SQL percentile on adversarial data") {
    import spark.implicits._
    val qs = Seq(0.1 -> "q10", 0.25 -> "q25", 0.37 -> "q37", 0.5 -> "med",
      0.9 -> "q90", 0.99 -> "q99")
    // deterministic pseudo-random longs with heavy duplication + skewed
    // group sizes (group 0: 1 row; group 1: 2 rows; group g: g*97 rows)
    val rows = for {
      g <- 0 to 12
      i <- 0 until (if (g == 0) 1 else if (g == 1) 2 else g * 97)
    } yield (g.toLong, ((i * 2654435761L + g * 40503L) % 37) * 13 - 120)
    val df = rows.toDF("g", "v")
    val got = Robust.percentiles(df, "g", "v", qs, Robust.Mode.Exact).orderBy("g")
    val refAggs = qs.map { case (q, n) => expr(s"percentile(v, $q)").as(n) }
    val ref = df.groupBy("g")
      .agg(refAggs.head, refAggs.tail: _*)
      .orderBy("g")
    assert(got.collect().toSeq == ref.collect().toSeq)
    // double values exercise toDoubleValue-identity + fractional keys
    val dd = rows.toDF("g", "v0").select($"g", ($"v0" / 7.0).as("v"))
    val gotD = Robust.percentiles(dd, "g", "v", qs, Robust.Mode.Exact).orderBy("g")
    val refD = dd.groupBy("g")
      .agg(refAggs.head, refAggs.tail: _*)
      .orderBy("g")
    assert(gotD.collect().toSeq == refD.collect().toSeq)
  }

  test("exact mad/trimmed from counts match the row-level reference incl. null values") {
    import spark.implicits._
    val rows = (for {
      g <- 0 to 4
      i <- 0 until (g * 53 + 1)
    } yield (g.toLong, Some(((i * 7919L + g) % 23) * 4 - 40))) ++
      Seq((2L, None), (2L, None), (4L, None)) // nulls: out of fences, in n_rows
    val df = rows.toDF("g", "v")
    // row-level reference = the pre-r18 exact shape, inlined
    val med = df.groupBy($"g".as("_rg"))
      .agg(expr("CAST(percentile(v, 0.5) AS DOUBLE)").as("_med"))
    val dev = df.join(broadcast(med), $"g" === $"_rg")
      .select($"g", abs($"v" - $"_med").as("_ad"))
    val mad = dev.groupBy($"g".as("_rg"))
      .agg(expr("CAST(percentile(_ad, 0.5) AS DOUBLE)").as("_mad"))
    val refMad = dev.join(broadcast(mad), $"g" === $"_rg")
      .groupBy($"g")
      .agg(count(lit(1)).as("n_rows"),
        count(when($"_ad" > lit(1.5) * $"_mad", 1)).as("n_outliers"),
        max($"_mad").as("mad"))
      .orderBy($"g").collect().toSeq
    val gotMad = Robust.madOutliers(df, "g", "v", 1.5, Robust.Mode.Exact)
      .orderBy($"g").collect().toSeq
    assert(gotMad == refMad)
    val fences = df.groupBy($"g".as("_rg"))
      .agg(expr("CAST(percentile(v, 0.1) AS DOUBLE)").as("_lo"),
        expr("CAST(percentile(v, 0.9) AS DOUBLE)").as("_hi"))
    val kept = $"v" >= $"_lo" && $"v" <= $"_hi"
    val refTrim = df.join(broadcast(fences), $"g" === $"_rg")
      .groupBy($"g")
      .agg(count(lit(1)).as("n_rows"), count(when(kept, 1)).as("n_kept"),
        (sum(when(kept, $"v")).cast("double") / count(when(kept, 1))).as("trimmed_mean"),
        max($"_lo").as("lo_fence"), max($"_hi").as("hi_fence"))
      .orderBy($"g").collect().toSeq
    val gotTrim = Robust.trimmedStats(df, "g", "v", 0.1, 0.9, Robust.Mode.Exact)
      .orderBy($"g").collect().toSeq
    assert(gotTrim == refTrim)
  }
}
