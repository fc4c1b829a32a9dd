package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Distributed end-to-end contract of the Misra–Gries heavy-hitter path
  * (the algebraic guarantees are property-checked in [[SketchProps]]). */
class SketchSpec extends SparkSpec {

  test("sketch-first heavy hitters equals the exact query, invariant to partitioning") {
    import spark.implicits._
    val exact = SparkEntry.queries("q_heavy_hitters")(spark, sf001)
      .select($"rk", $"term", $"n").as[(Int, String, Long)].collect().toSeq
    val sketch = SparkEntry.queries("q_heavy_hitters_sketch")(spark, sf001)
      .as[(Int, String, Long)].collect().toSeq
    assert(sketch == exact, "sketch path must be invisible in the answer")
    // adversarial partitioning: many tiny partials stress the merge rule
    val t = Tables(spark, sf001, "documents")
      .repartition(23)
      .select(explode(split($"text", " ")).as("term"))
    val cands = t.agg(Sketches.misraGries(256)($"term").as("mg"))
      .select(explode(map_keys($"mg")).as("term")).as[String].collect().toSet
    exact.foreach { case (_, term, _) =>
      assert(cands.contains(term), s"top-20 token $term missing from candidates")
    }
  }
}
