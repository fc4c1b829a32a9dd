package graft

import org.apache.spark.sql.functions._

import graft.plans.AsOfJoinPlan

/** The native co-partitioned-merge as-of join must agree row-for-row with
  * the composed equi-join + max_by formulation (which itself hash-matches
  * the DuckDB ROW_NUMBER oracle), and must plan as one shuffle per side
  * with no pair blow-up.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def native() = {
    val e = Tables(spark, sf001, "events").select($"event_id", $"user_id", $"ts")
    val o = Tables(spark, sf001, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
    AsOfJoinPlan.asof(spark, e, o,
      e("user_id"), o("o_custkey"), e("ts"), o("o_orderdate"), o("o_orderkey"))
      .select($"event_id", $"user_id", $"o_orderkey", $"o_totalprice")
  }

  test("native as-of join equals the composed window/max_by formulation") {
    val composed = SparkEntry.queries("q_asof_join")(spark, sf001)
      .as[(Long, Long, Long, Double)].collect().toSet
    val nat = native().as[(Long, Long, Long, Double)].collect().toSet
    assert(nat === composed)
    assert(nat.nonEmpty)
  }

  test("native as-of join picks max time then min tie-break, inner semantics") {
    // hand-built case: user 1 has orders at t=10 (key 5), t=10 (key 3),
    // t=20 (key 9); user 2 has none before its event
    val l = Seq((100L, 1L, 15L), (101L, 1L, 25L), (102L, 2L, 5L))
      .toDF("event_id", "user_id", "t")
    val r = Seq((5L, 1L, 10L, 1.0), (3L, 1L, 10L, 2.0), (9L, 1L, 20L, 3.0),
        (7L, 2L, 50L, 4.0))
      .toDF("o_key", "o_cust", "rt", "price")
    val out = AsOfJoinPlan.asof(spark, l, r,
        l("user_id"), r("o_cust"), l("t"), r("rt"), r("o_key"))
      .select($"event_id", $"o_key", $"price")
      .as[(Long, Long, Double)].collect().toSet
    // event 100: ties at rt=10 → min key 3; event 101: rt=20 wins;
    // event 102: no order at/before t=5 → dropped (inner)
    assert(out === Set((100L, 3L, 2.0), (101L, 9L, 3.0)))
  }

  test("left-side filters push through the custom operator to the scan") {
    val df = native().filter($"event_id" < 100)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // PushFilterThroughAsOfJoin moves the predicate below the join, and
    // standard pushdown then carries it into the parquet scan
    assert(p.contains("PushedFilters: [IsNotNull(event_id), LessThan(event_id,100)]"), p)
    // and the values still match the composed formulation
    val composed = SparkEntry.queries("q_asof_join")(spark, sf001)
      .filter($"event_id" < 100).as[(Long, Long, Long, Double)].collect().toSet
    assert(df.as[(Long, Long, Long, Double)].collect().toSet === composed)
  }

  test("downstream aggregation on the join key reuses the as-of shuffle") {
    val e = Tables(spark, sf001, "events").select($"event_id", $"user_id", $"ts")
    val o = Tables(spark, sf001, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
    val agg = AsOfJoinPlan.asof(spark, e, o,
        e("user_id"), o("o_custkey"), e("ts"), o("o_orderdate"), o("o_orderkey"))
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
    agg.collect()
    val p = agg.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    // only the two as-of input shuffles — outputPartitioning lets the
    // aggregation reuse the left key distribution
    assert(shuffles === 2, s"aggregation re-shuffled despite key partitioning:\n$p")
  }

  test("null keys and times follow SQL join semantics (rows drop, no key-0 match)") {
    val l = Seq((100L, Some(1L), Some(15L)), (101L, None, Some(25L)),
        (102L, Some(0L), Some(30L)), (103L, Some(1L), None))
      .toDF("event_id", "user_id", "t")
    val r = Seq((5L, Some(1L), Some(10L), 1.0), (6L, Some(0L), Some(10L), 6.0),
        (7L, None, Some(5L), 7.0), (8L, Some(1L), None, 8.0))
      .toDF("o_key", "o_cust", "rt", "price")
    val out = AsOfJoinPlan.asof(spark, l, r,
        l("user_id"), r("o_cust"), l("t"), r("rt"), r("o_key"))
      .select($"event_id", $"o_key")
      .as[(Long, Long)].collect().toSet
    // 100 → order 5; 102 matches key 0's real order 6 (not null-keyed rows);
    // 101 (null key) and 103 (null time) drop; null-keyed/timed right rows
    // (7, 8) never match anyone
    assert(out === Set((100L, 5L), (102L, 6L)))
  }

  test("self as-of join dedups shared attributes — right columns carry right values") {
    // both sides derive from the SAME DataFrame, so left and right share
    // exprIds; without dedupRight-style re-aliasing, bindReference would
    // resolve right-side columns to LEFT values (first exprId match wins)
    val d = Seq((1L, 1L, 10L, 100.0), (2L, 1L, 20L, 200.0), (3L, 1L, 30L, 300.0))
      .toDF("id", "k", "t", "v")
    // leftTime = t − 5 → each left row joins the latest STRICTLY EARLIER
    // row (rt ≤ t − 5), so right values must differ from left values;
    // id/k/t/v exprIds are still shared between l and d
    val l = d.withColumn("lt", $"t" - 5L)
    val out = AsOfJoinPlan.asof(spark, l, d,
        l("k"), d("k"), l("lt"), d("t"), d("id"))
      .toDF("id", "k", "t", "v", "lt", "rid", "rk", "rt", "rv")
      .select($"id", $"rid", $"rv")
      .as[(Long, Long, Double)].collect().toSet
    // row 1 has no earlier row (drops); row 2 ← row 1; row 3 ← row 2
    assert(out === Set((2L, 1L, 100.0), (3L, 2L, 200.0)))
  }

  test("null tie-break at the winning timestamp loses to the smallest non-null tie") {
    val l = Seq((100L, 1L, 15L)).toDF("event_id", "user_id", "t")
    val r = Seq((Option(5L), 1L, 10L, 1.0), (Option.empty[Long], 1L, 10L, 2.0),
        (Option(3L), 1L, 10L, 3.0))
      .toDF("o_key", "o_cust", "rt", "price")
    val out = AsOfJoinPlan.asof(spark, l, r,
        l("user_id"), r("o_cust"), l("t"), r("rt"), r("o_key"))
      .select($"event_id", $"o_key", $"price")
      .as[(Long, Option[Long], Double)].collect().toSet
    // the oracle's ROW_NUMBER ... ORDER BY rt DESC, tie ASC NULLS LAST
    // picks key 3 — a null-tie row must not absorb last and win
    assert(out === Set((100L, Some(3L), 3.0)))
  }

  test("mismatched time column types are rejected at construction") {
    val l = Seq((1L, 2L)).toDF("k", "t")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k2", "t2")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinPlan.asof(spark, l, r, l("k"), r("k2"), l("t"), r("t2"), r("k2"))
    }
    assert(e.getMessage.contains("same type"))
  }

  test("non-64-bit join columns are rejected at construction") {
    val l = Seq((1, 2)).toDF("k", "t")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinPlan.asof(spark, l, l.select($"k".as("k2"), $"t".as("t2")),
        l("k"), col("k2"), l("t"), col("t2"), col("k2"))
    }
    assert(e.getMessage.contains("bigint/timestamp"))
  }

  test("native as-of plans one exchange per side and no join blow-up operator") {
    val df = native()
    df.collect()
    // after AQE finalizes, the string holds Final + Initial sections —
    // assert on the final one only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("AsOfJoin"), p) // nodeName prints without the Exec suffix
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles === 2, s"expected exactly the two key shuffles, got:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"), p)
  }
}
