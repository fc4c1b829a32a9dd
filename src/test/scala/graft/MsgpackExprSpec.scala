package graft

import graft.functions.Msgpack

/** The native codegen expression must agree with the interpreted decoder
  * and run inside a real plan with no UDF black box. */
class MsgpackExprSpec extends SparkSpec {

  test("msgpack_to_json SQL function decodes inside codegen") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val payloads = Seq(
      Msgpack.encode(Map("k" -> 42, "s" -> "x")),
      Msgpack.encode(Seq(1, 2, 3)),
      Array[Byte](0xc1.toByte), // malformed → null
      null)
    val df = payloads.zipWithIndex.map { case (b, i) => (i, b) }.toDF("id", "payload")
    df.createOrReplaceTempView("mp")
    val out = spark.sql("SELECT id, msgpack_to_json(payload) j FROM mp ORDER BY id")
      .as[(Int, Option[String])].collect().toMap
    assert(out(0).contains("""{"k":42,"s":"x"}"""))
    assert(out(1).contains("[1,2,3]"))
    assert(out(2).isEmpty)
    assert(out(3).isEmpty)
    // interpreted eval path agrees (codegen fallback coverage)
    assert(graft.plans.MsgpackToJsonExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(payloads.head))
      .eval(null).toString == """{"k":42,"s":"x"}""")
    // the plan has no UDF black box
    val p = spark.sql("SELECT msgpack_to_json(payload) FROM mp")
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p)
  }
}
