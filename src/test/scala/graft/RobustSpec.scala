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
}
