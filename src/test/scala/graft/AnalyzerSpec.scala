package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.analyze.{Analyzer, Schemas}

class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  test("extractValueColumns strips prefix and keeps metadata (P2)") {
    val df = Seq((1L, 10L, 2.5, "ES")).toDF("kafka_offset", "kafka_partition", "value.bid", "value.symbol")
    val out = Analyzer.extractValueColumns(df)
    assert(out.columns.toSeq == Seq("kafka_offset", "kafka_partition", "bid", "symbol"))
    assert(out.collect().head.getDouble(2) == 2.5)
  }

  test("typedView maps present fields, nulls missing ones (to_dataclass R:350-375)") {
    val df = Seq((1L, "SPX", 100.0, 101.0, "unknown_extra"))
      .toDF("conId", "symbol", "bid", "ask", "junk")
    val ds = Analyzer.typedView[Schemas.IndexMarketData](df)
    val r = ds.collect().head
    assert(r.conId.contains(1L) && r.symbol.contains("SPX") &&
      r.bid.contains(100.0) && r.ask.contains(101.0))
    assert(r.index_value.isEmpty && r.has_liquidity.isEmpty)
    assert(!ds.columns.contains("junk")) // unknown fields silently dropped
  }

  test("typedView covers all six entity schemas") {
    val empty = spark.emptyDataFrame
    assert(Analyzer.typedView[Schemas.IndexMarketData](empty).schema.fieldNames.contains("index_value"))
    assert(Analyzer.typedView[Schemas.FuturesMarketData](empty).schema.fieldNames.contains("volume"))
    assert(Analyzer.typedView[Schemas.OptionsMarketData](empty).schema.fieldNames.contains("implied_vol"))
    assert(Analyzer.typedView[Schemas.StockMarketData](empty).schema.fieldNames.contains("bid_size"))
    assert(Analyzer.typedView[Schemas.MultiLegOptionsData](empty).schema.fieldNames.contains("combo_legs"))
    assert(Analyzer.typedView[Schemas.AccountValuesData](empty).schema.fieldNames.contains("values"))
  }

  test("schemaDrift reports missing/extra/mismatched (R:445-489)") {
    val actual = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType), StructField("x", LongType)))
    val expected = StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType), StructField("c", LongType)))
    val d = Analyzer.schemaDrift(actual, expected)
    assert(d.missing == Seq("c"))
    assert(d.extra == Seq("x"))
    assert(d.mismatched == Seq("b: string != double"))
    assert(!d.ok)
    assert(Analyzer.schemaDrift(expected, expected).ok)
  }

  test("describeStats: one row per column, correct nulls and extremes (A8)") {
    val df = Seq((1L, Some(1.0), "a"), (2L, None, "b"), (3L, Some(5.0), "c"))
      .toDF("id", "v", "s")
    val stats = Analyzer.describeStats(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats("v").getLong(1) == 1)              // one null
    assert(stats("v").getAs[Double]("min") == 1.0)
    assert(stats("v").getAs[Double]("max") == 5.0)
    assert(stats("v").getAs[Double]("mean") == 3.0)
    assert(stats("s").isNullAt(2))                  // no numeric stats for strings
    assert(stats("id").getLong(1) == 0)
  }

  test("profile: counts, distincts, and string-rendered extremes per column") {
    val df = Seq((1L, Option("a")), (2L, Option("b")), (2L, None))
      .toDF("id", "s")
    val p = Analyzer.profile(df, Seq("id", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(1) == 3 && p("id").getLong(2) == 3 && p("id").getLong(3) == 2)
    assert(p("id").getString(4) == "1" && p("id").getString(5) == "2")
    assert(p("s").getLong(2) == 2, "null must not count as non-null") // one null
    assert(p("s").getString(4) == "a" && p("s").getString(5) == "b")
    intercept[IllegalArgumentException](Analyzer.profile(df, Seq.empty))
  }
}
