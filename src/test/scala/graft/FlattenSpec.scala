package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ingest.Flatten

/** Behavior spec for the reference's flatten_dict semantics
  * (`app/redpanda_to_parquet_collector.py:259-284`, `README.md:328-347`). */
class FlattenSpec extends SparkSpec {

  private def df(schema: StructType, rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  test("data.* hoists unprefixed; other structs get _-joined prefixes") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("data", StructType(Seq(
        StructField("price", DoubleType),
        StructField("nested", StructType(Seq(StructField("x", LongType))))))),
      StructField("metadata", StructType(Seq(StructField("exchange", StringType))))))
    val out = Flatten.flatten(df(schema, Row(1L, Row(9.5, Row(7L)), Row("NYSE"))))
    assert(out.columns.toSeq ==
      Seq("id", "price", "nested_x", "metadata_exchange"))
    val r = out.collect().head
    assert(r.getLong(0) == 1L && r.getDouble(1) == 9.5 &&
      r.getLong(2) == 7L && r.getString(3) == "NYSE")
  }

  test("data hoists at ANY depth with full prefix reset (ref :273-274)") {
    val schema = StructType(Seq(
      StructField("meta", StructType(Seq(
        StructField("data", StructType(Seq(StructField("x", LongType)))),
        StructField("y", LongType))))))
    val out = Flatten.flatten(df(schema, Row(Row(Row(5L), 6L))))
    assert(out.columns.toSeq == Seq("x", "meta_y"))
    assert(out.collect().head.getLong(0) == 5L)
  }

  test("arrays become JSON strings; empty arrays become null (ref :280)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("tags", ArrayType(StringType))))
    val out = Flatten.flatten(df(schema, Row(1L, Seq("a", "b")), Row(2L, Seq())))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getString(1) == """["a","b"]""")
    assert(rows(1).isNullAt(1))
  }

  test("collision: last writer wins, first position kept (dict.update :399)") {
    val schema = StructType(Seq(
      StructField("price", LongType),
      StructField("data", StructType(Seq(StructField("price", LongType))))))
    val out = Flatten.flatten(df(schema, Row(1L, Row(2L))))
    assert(out.columns.toSeq == Seq("price"))
    assert(out.collect().head.getLong(0) == 2L) // hoisted data.price overwrote
  }

  test("idempotent on already-flat frames") {
    val flat = Tables(spark, sf001, "lineitem").limit(10)
    assert(Flatten.flatten(flat).columns.toSeq == flat.columns.toSeq)
  }
}
