package graft

/** The SQL face of the engine: every table registered as a view, custom
  * functions injected via GraftExtensions, and full queries written as
  * plain `spark.sql` text — proving a SQL-only user (BI tool, notebook)
  * gets the same engine, Catalyst optimizations included. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("a star-schema aggregation runs as pure SQL and matches the DataFrame query") {
    Tables.registerAll(spark, sf001)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .as[(String, String, Double, Long)].collect().toSeq
    val df = SparkEntry.queries("q1_agg")(spark, sf001)
      .select($"l_returnflag", $"l_linestatus", $"sum_qty", $"count_order")
      .as[(String, String, Double, Long)].collect().toSeq
    assert(sql === df)
    assert(sql.nonEmpty)
  }

  test("custom functions compose with built-ins inside one SQL statement") {
    graft.plans.GraftExtensions.register(spark)
    Tables.registerAll(spark, sf001)
    // quantize embeddings in SQL, dot each vector with itself via the
    // native expression, and aggregate — mixing graft_* with built-ins
    val rows = spark.sql(
      """SELECT label, COUNT(*) AS n,
        |  MIN(graft_qdot(q, q)) AS min_sq_norm
        |FROM (SELECT label,
        |        transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT)) AS q
        |      FROM embeddings)
        |GROUP BY label ORDER BY label""".stripMargin)
      .as[(Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 >= 0L), "a self dot product can never be negative")
  }

  test("SQL over a registered view still pushes filters into the parquet scan") {
    Tables.registerAll(spark, sf001)
    val df = spark.sql("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 50")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,50)]"), plan)
  }
}
