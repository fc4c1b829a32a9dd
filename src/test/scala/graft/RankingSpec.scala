package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Ranking

/** [[graft.functions.Ranking]] must agree EXACTLY with Spark's own
  * single-reducer `Window.orderBy` row_number/ntile on every input —
  * including heavy ties on the primary key (all rows in one value-bucket)
  * and n < k (more tiles than rows). The helper exists so the plan
  * distributes; the answer must be indistinguishable. */
class RankingSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "id").repartition(4)
  }

  // deterministic pseudo-random rows: value collisions guaranteed (k % 17)
  private val rows: Seq[(Long, Long)] =
    (1L to 500L).map(i => ((i * 2654435761L) % 17, i))

  test("withGlobalRowNumber matches Window.orderBy row_number (asc, ties)") {
    val d = df(rows)
    val want = d.withColumn("i",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ranking.withGlobalRowNumber(d, col("k"), primaryAsc = true,
        Seq(col("k"), col("id")), "i", buckets = 8)
      .select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("withGlobalRowNumber matches on a descending primary") {
    val d = df(rows)
    val want = d.withColumn("i",
        row_number().over(Window.orderBy(col("k").desc, col("id"))).cast("long"))
      .select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ranking.withGlobalRowNumber(d, col("k"), primaryAsc = false,
        Seq(col("k").desc, col("id")), "i", buckets = 8)
      .select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("withGlobalNtile matches Window.orderBy ntile for k in 1..13") {
    val d = df(rows)
    for (k <- Seq(1, 3, 10, 13)) {
      val want = d.withColumn("t",
          ntile(k).over(Window.orderBy(col("k").desc, col("id"))))
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = Ranking.withGlobalNtile(d, k, col("k"), primaryAsc = false,
          Seq(col("k").desc, col("id")), "t", buckets = 8)
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === want, s"ntile($k)")
    }
  }

  test("withGlobalNtile handles n < k (more tiles than rows)") {
    val d = df(rows.take(7))
    val want = d.withColumn("t",
        ntile(10).over(Window.orderBy(col("k"), col("id"))))
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Ranking.withGlobalNtile(d, 10, col("k"), primaryAsc = true,
        Seq(col("k"), col("id")), "t", buckets = 4)
      .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === want)
  }

  test("user columns named like the internals survive untouched") {
    import spark.implicits._
    val d = rows.map { case (k, id) => (k, id, s"keep-$id") }
      .toDF("k", "id", "_graft_bkt").repartition(4)
    val out = Ranking.withGlobalRowNumber(d, col("k"), primaryAsc = true,
      Seq(col("k"), col("id")), "i", buckets = 8)
    assert(out.columns.contains("_graft_bkt"), out.columns.mkString(","))
    val kept = out.select("id", "_graft_bkt").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept.forall { case (id, v) => v == s"keep-$id" },
      "internal bucketing clobbered the user's _graft_bkt column")
    // and the rank itself is still correct
    val want = d.withColumn("i",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = out.select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("all-equal primary keys still rank correctly (single bucket)") {
    val d = df((1L to 100L).map(i => (42L, i)))
    val got = Ranking.withGlobalRowNumber(d, col("k"), primaryAsc = true,
        Seq(col("k"), col("id")), "i", buckets = 8)
      .select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 100L).map(i => i -> i).toMap)
  }

  test("salt escape hatch: 90%-constant primary still ranks exactly") {
    // the range-partitioner failure mode: one value owns 90% of the rows,
    // so every one of them lands in a single value-bucket. With `salt`
    // (the ascending second sort key) the dominant value — detected as a
    // repeated approx_percentile boundary — sub-buckets by the salt's own
    // quantiles, and the answer must STILL be bit-identical to the
    // single-reducer oracle, for both directions and both operators.
    val skewed: Seq[(Long, Long)] =
      (1L to 1000L).map(i => (if (i % 10 != 0) 7L else (i * 2654435761L) % 17, i))
    val d = df(skewed)
    for (asc <- Seq(true, false)) {
      val ord = if (asc) Seq(col("k"), col("id")) else Seq(col("k").desc, col("id"))
      val wantRn = d.withColumn("i",
          row_number().over(Window.orderBy(ord: _*)).cast("long"))
        .select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotRn = Ranking.withGlobalRowNumber(d, col("k"), primaryAsc = asc,
          ord, "i", buckets = 8, salt = Some(col("id")))
        .select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotRn === wantRn, s"row_number asc=$asc")
      val wantNt = d.withColumn("t", ntile(10).over(Window.orderBy(ord: _*)))
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val gotNt = Ranking.withGlobalNtile(d, 10, col("k"), primaryAsc = asc,
          ord, "t", buckets = 8, salt = Some(col("id")))
        .select("id", "t").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(gotNt === wantNt, s"ntile asc=$asc")
    }
  }

  test("salted plan partitions its window by (bucket, sub-bucket)") {
    val skewed = (1L to 1000L).map(i => (if (i % 10 != 0) 7L else i % 17, i))
    val plan = Ranking.withGlobalRowNumber(df(skewed), col("k"), primaryAsc = true,
        Seq(col("k"), col("id")), "i", buckets = 8, salt = Some(col("id")))
      .queryExecution.executedPlan.toString
    val specs = plan.linesIterator.filter(_.contains("windowspecdefinition(")).toSeq
    assert(specs.nonEmpty, plan)
    // the sub-bucket key must SURVIVE into the window partition spec —
    // were it constant (no salt effect) Spark 4's
    // EliminateWindowPartitions would have folded it away
    specs.foreach { l =>
      assert(l.contains("windowspecdefinition(_graft_bkt#") && l.contains("_graft_sub#"),
        s"window not partitioned by (bucket, sub):\n$l\n$plan")
    }
  }

  test("salt with no dominant value degrades to the unsalted answer") {
    val d = df(rows)
    val want = Ranking.withGlobalRowNumber(d, col("k"), primaryAsc = true,
        Seq(col("k"), col("id")), "i", buckets = 8)
      .select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ranking.withGlobalRowNumber(d, col("k"), primaryAsc = true,
        Seq(col("k"), col("id")), "i", buckets = 8, salt = Some(col("id")))
      .select("id", "i").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("withGlobalRunningSum matches SUM OVER (ORDER BY ...), salted and not") {
    import spark.implicits._
    val data = rows.map { case (k, id) => (k, id, (id * 7) % 23 + 1) }
    val d = data.toDF("k", "id", "v").repartition(4)
    val want = d.withColumn("c",
        sum(col("v")).over(Window.orderBy(col("k"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .select("id", "c").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Ranking.withGlobalRunningSum(d, col("v"), col("k"), primaryAsc = true,
        Seq(col("k"), col("id")), "c", buckets = 8)
      .select("id", "c").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    // 90%-constant primary + salt: the prefix scan must stay exact
    val skew = (1L to 1000L).map(i =>
      (if (i % 10 != 0) 7L else (i * 2654435761L) % 17, i, (i * 13) % 31 + 1))
    val ds = skew.toDF("k", "id", "v").repartition(4)
    val wantS = ds.withColumn("c",
        sum(col("v")).over(Window.orderBy(col("k"), col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .select("id", "c").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotS = Ranking.withGlobalRunningSum(ds, col("v"), col("k"), primaryAsc = true,
        Seq(col("k"), col("id")), "c", buckets = 8, salt = Some(col("id")))
      .select("id", "c").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotS === wantS)
  }

  test("the ranking plan contains no partition-less window at all") {
    val d = df(rows)
    val plan = Ranking.withGlobalRowNumber(d, col("k"), primaryAsc = true,
        Seq(col("k"), col("id")), "i", buckets = 8)
      .queryExecution.executedPlan.toString
    // the ONLY window in the plan must be the bucket-partitioned
    // row_number — windowspecdefinition's first argument must be the
    // bucket key, not an ORDER BY expression (which is what an empty
    // partition spec degenerates to, and exactly the WindowExec
    // single-reducer alarm this helper exists to eliminate; note Spark
    // 4's EliminateWindowPartitions folds away constant partition keys,
    // so a lit() partition would NOT count as partitioned)
    val specs = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(specs.nonEmpty, plan)
    specs.foreach { l =>
      assert(l.contains("windowspecdefinition(_graft_bkt#"),
        s"partition-less window found:\n$l\n$plan")
    }
  }
}
