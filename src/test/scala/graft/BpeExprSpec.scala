package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeVocab
import graft.functions.TextFunctions._
import graft.plans.BpeExpressions

/** r19 equivalence pins for the native BPE merge applier and the codegen
  * pair-count shape: each must be bit-identical to the interpreted
  * formulation it replaced, on the real corpus AND on the adversarial
  * self-pair/overlap shapes where greedy-leftmost semantics bite.
  */
class BpeExprSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, sf001, "documents")
    .select($"doc_id", tokens("text").as("toks"))

  test("BpeApply ≡ the chained interpreted mergeExpr fold on the real corpus") {
    // learn a real table so the merges exercised are the ones the queries run
    val fit = BpeVocab.fit(docs, rounds = 5, batch = 5)
    fit.release()
    val table = fit.merges.sortBy(_.step).map(m => (m.left, m.right))
    assert(table.nonEmpty)
    val interp = table.foldLeft(docs) { (c, m) =>
      c.withColumn("toks", BpeVocab.mergeExpr(m._1, m._2))
    }.withColumnRenamed("toks", "i_toks")
    val native = docs.withColumn("n_toks", BpeExpressions.applyMerges($"toks", table))
    val joined = interp.join(native.select($"doc_id", $"n_toks"), "doc_id")
    assert(joined.filter(!($"i_toks" <=> $"n_toks")).count() === 0)
    assert(joined.count() > 0)
  }

  test("BpeApply ≡ chained mergeExpr on self-pair runs and overlap chains") {
    val shapes = Seq(
      Seq("a", "a", "a"),            // self-pair: greedy takes every other window
      Seq("a", "a", "a", "a"),
      Seq("l", "r", "r"),            // right token reused would double-merge
      Seq("l", "l", "r"),            // match starts after a failed window
      Seq("l", "r", "l", "r"),
      Seq("x"), Seq.empty[String])
    val df = shapes.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "toks")
    // a table whose later merges consume earlier merges' output symbols
    val table = Seq(("a", "a"), ("l", "r"), ("a a", "a"), ("l r", "l r"))
    val interp = table.foldLeft(df) { (c, m) =>
      c.withColumn("toks", BpeVocab.mergeExpr(m._1, m._2))
    }.withColumnRenamed("toks", "i_toks")
    val native = df.withColumn("n_toks", BpeExpressions.applyMerges($"toks", table))
    val joined = interp.join(native.select($"doc_id", $"n_toks"), "doc_id")
    assert(joined.filter(!($"i_toks" <=> $"n_toks")).count() === 0)
  }

  test("codegen pairCounts ≡ the transform(sequence) pair enumeration") {
    val interp = docs.select(explode(expr(
        "CASE WHEN size(toks) < 2 THEN CAST(array() AS ARRAY<STRUCT<l: STRING, r: STRING>>) " +
          "ELSE transform(sequence(1, size(toks) - 1), " +
          "i -> struct(toks[i-1] AS l, toks[i] AS r)) END")).as("p"))
      .groupBy($"p.l".as("l"), $"p.r".as("r")).agg(count(lit(1)).as("n"))
    val got = BpeVocab.pairCounts(docs)
    assert(got.exceptAll(interp).count() === 0)
    assert(interp.exceptAll(got).count() === 0)
    assert(got.count() > 0)
    // the size < 2 clamp still yields zero pair rows
    val tiny = Seq((1L, Seq("only")), (2L, Seq.empty[String])).toDF("doc_id", "toks")
    assert(BpeVocab.pairCounts(tiny).count() === 0)
  }

  test("the codegen n_absorbed form ≡ the interpreted per-token aggregate") {
    val enc = Seq(
      (1L, Seq("a b", "c", "d e f")),  // embedded spaces from merges
      (2L, Seq("plain", "tokens")),
      (3L, Seq.empty[String])).toDF("doc_id", "toks")
    val both = enc.select(
      expr("aggregate(toks, 0L, (a, x) -> a + size(split(x, ' ')) - 1)").as("i"),
      (length(array_join(col("toks"), ""))
        - length(translate(array_join(col("toks"), ""), " ", ""))).cast("long").as("n"))
    assert(both.filter(!($"i" <=> $"n")).count() === 0)
  }
}
