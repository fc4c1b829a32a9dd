package graft

import org.apache.spark.sql.functions._

/** Error-bound checks for the approximate aggregates (no DuckDB oracle —
  * sketches are engine-specific; correctness here means bounded error
  * against the exact answers). */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within rsd bound of exact") {
    val li = Tables(spark, sf001, "lineitem")
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.02).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.1, s"$k: $n vs ${approx(k)}")
    }
  }

  test("approx_percentile lands inside the value distribution near the exact median") {
    val li = Tables(spark, sf001, "lineitem")
    val exact = li.agg(expr("percentile(l_extendedprice, 0.5)")).collect().head.getDouble(0)
    val approx = li.agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)"))
      .collect().head.getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.05, s"$exact vs $approx")
  }
}
