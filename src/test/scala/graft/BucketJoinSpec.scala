package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.LakeWriter

/** Plan proof for bucketed co-location: joining two tables bucketed on
  * the join key with equal bucket counts must produce NO exchange of any
  * kind — the one write-time shuffle is amortized across every later join
  * and aggregation on that key. This is the core 100 TB join strategy for
  * repeatedly-joined fact tables (broadcast covers the small-dim case).
  */
class BucketJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join and aggregation plan with zero exchanges") {
    val work = Files.createTempDirectory("buckets").toString
    val orders = Tables(spark, sf001, "orders")
    val customer = Tables(spark, sf001, "customer")
    LakeWriter.writeBucketed(orders, "orders_b", "o_custkey", 8, s"$work/orders_b")
    LakeWriter.writeBucketed(customer, "customer_b", "c_custkey", 8, s"$work/customer_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the merge path
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
      val expected = orders.join(customer, $"o_custkey" === $"c_custkey").count()
      assert(joined.count() === expected)
      // aggregating on the join/bucket key reuses the bucket distribution:
      // join + partial + final agg, all with ZERO exchanges
      val j = joined.groupBy($"c_custkey").agg(count(lit(1)).as("n"))
      assert(j.count() === customer.join(orders, $"o_custkey" === $"c_custkey", "left_semi").count())
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      val exchanges = "Exchange (hashpartitioning|rangepartitioning)".r.findAllIn(p).length
      assert(exchanges === 0, s"expected a shuffle-free bucketed join+agg, got:\n$p")
      assert(p.contains("SelectedBucketsCount"), p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("bucket pruning: an equality filter on the bucket key reads one bucket") {
    val work = Files.createTempDirectory("bucketprune").toString
    val orders = Tables(spark, sf001, "orders")
    LakeWriter.writeBucketed(orders, "orders_bp", "o_custkey", 8, s"$work/orders_bp")
    // the auto-bucketed-scan heuristic only values avoided exchanges, not
    // bucket pruning, and silently disables the bucketed scan for a plain
    // filter query — force it on for the pruning proof
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val key = orders.select($"o_custkey").as[Long].head()
      val df = spark.table("orders_bp").filter($"o_custkey" === key)
      assert(df.count() === orders.filter($"o_custkey" === key).count())
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"), p)
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS orders_bp")
    }
  }
}
