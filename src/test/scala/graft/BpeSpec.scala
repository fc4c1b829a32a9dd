package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeVocab

/** The [[graft.functions.BpeVocab]] contract: round 1 is the plain
  * adjacent-pair argmax (independently recomputed), every round strictly
  * shrinks the corpus, merged pairs vanish from adjacency, and the
  * learned merge table is invariant to input partitioning. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, sf001, "documents")
    .repartition(8, col("doc_id"))
    .select(col("doc_id"), split(col("text"), " ").as("toks"))

  private def tokenTotal(corpus: org.apache.spark.sql.DataFrame): Long =
    corpus.agg(sum(size(col("toks")))).head().getLong(0)

  test("round 1 picks the independently-recomputed most frequent adjacent pair") {
    val fit = BpeVocab.fit(docs, rounds = 1)
    val m = fit.merges.head
    val want = docs
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS l, toks[i] AS r))")).as("p"))
      .groupBy($"p.l", $"p.r").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"p.l".asc, $"p.r".asc)
      .limit(1).as[(String, String, Long)].head()
    assert((m.left, m.right, m.pair_freq) === want)
  }

  test("each round strictly shrinks the corpus; merged pair leaves adjacency") {
    val t0 = tokenTotal(docs)
    val f1 = BpeVocab.fit(docs, rounds = 1)
    val t1 = tokenTotal(f1.corpus)
    assert(t1 < t0, s"round 1 did not shrink: $t0 -> $t1")
    // greedy leftmost substitution leaves NO (left, right) adjacency
    val m = f1.merges.head
    val remaining = BpeVocab.pairCounts(f1.corpus)
      .filter(col("l") === m.left && col("r") === m.right).count()
    assert(remaining == 0, s"${remaining} unmerged (${m.left}, ${m.right}) adjacencies survive")
    // the merged symbol is present
    val sym = s"${m.left} ${m.right}"
    assert(f1.corpus.filter(array_contains(col("toks"), sym)).count() > 0)
    val f3 = BpeVocab.fit(docs, rounds = 3)
    val t3 = tokenTotal(f3.corpus)
    assert(f3.merges.map(_.step) == Seq(1, 2, 3))
    assert(t3 < t1, s"rounds 2-3 did not shrink further: $t1 -> $t3")
  }

  test("the learned merge table is partitioning-invariant") {
    val a = BpeVocab.fit(docs, rounds = 3).merges
    val b = BpeVocab.fit(docs.repartition(17), rounds = 3).merges
    assert(a == b)
  }
}
