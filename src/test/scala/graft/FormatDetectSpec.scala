package graft

import org.apache.spark.sql.functions._

import graft.functions.Msgpack

/** Distributed format detection (typed Aggregator UDAF surface). */
class FormatDetectSpec extends SparkSpec {
  import spark.implicits._

  test("FormatDetectAggregator classifies msgpack vs json columns distributively") {
    val mp = (1 to 50).map(i => Msgpack.encode(Map("k" -> i)))
    val js = (1 to 50).map(i => s"""{"k":$i}""".getBytes("UTF-8"))
    val mpDf = mp.toDF("value").repartition(4)
    val jsDf = js.toDF("value").repartition(4)
    assert(mpDf.select(Msgpack.detectFormatAgg(col("value"))).as[String].head() === "msgpack")
    assert(jsDf.select(Msgpack.detectFormatAgg(col("value"))).as[String].head() === "json")
    // registered-SQL form with partial aggregation across partitions
    spark.udf.register("detect_format", udaf(Msgpack.FormatDetectAggregator))
    mpDf.createOrReplaceTempView("fmt_mp")
    assert(spark.sql("SELECT detect_format(value) FROM fmt_mp").as[String].head() === "msgpack")
    // mixed: 50 msgpack + 50 json → below the 0.9 threshold → json
    assert(mpDf.union(jsDf).select(Msgpack.detectFormatAgg(col("value")))
      .as[String].head() === "json")
  }
}
