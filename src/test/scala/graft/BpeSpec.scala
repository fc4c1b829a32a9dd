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
    fit.release()
    // the size >= 2 filter mirrors production's short-doc guard — a
    // 1-token doc would otherwise feed sequence(1, 0) = [1, 0] (Spark
    // descends) and fabricate (tok, null) pairs in this recount
    val want = docs.filter(size($"toks") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS l, toks[i] AS r))")).as("p"))
      .groupBy($"p.l", $"p.r").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"p.l".asc, $"p.r".asc)
      .limit(1).as[(String, String, Long)].head()
    assert((m.left, m.right, m.pair_freq) === want)
  }

  test("mergeExpr: linear distinct-pair branch and sequential self-pair branch") {
    def run(left: String, right: String, toks: Seq[String]): Seq[String] =
      Seq(Tuple1(toks)).toDF("toks")
        .select(BpeVocab.mergeExpr(left, right).as("out"))
        .as[Seq[String]].head()
    // distinct halves: independent non-overlapping matches
    assert(run("a", "b", Seq("a", "b", "a", "b")) == Seq("a b", "a b"))
    assert(run("a", "b", Seq("x", "a", "b", "b")) == Seq("x", "a b", "b"))
    assert(run("a", "b", Seq("a", "a", "b")) == Seq("a", "a b"))
    assert(run("a", "b", Seq("b", "a")) == Seq("b", "a"))
    assert(run("a", "b", Seq.empty) == Seq.empty)
    assert(run("a", "b", Seq("a")) == Seq("a"))
    // self-pair: greedy leftmost within runs — every OTHER window
    assert(run("a", "a", Seq("a", "a", "a")) == Seq("a a", "a"))
    assert(run("a", "a", Seq("a", "a", "a", "a")) == Seq("a a", "a a"))
    assert(run("a", "a", Seq("x", "a", "a", "x")) == Seq("x", "a a", "x"))
    assert(run("a", "a", Seq.empty) == Seq.empty)
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
    f1.release(); f3.release()
  }

  test("the learned merge table is partitioning-invariant") {
    val fa = BpeVocab.fit(docs, rounds = 3)
    val fb = BpeVocab.fit(docs.repartition(17), rounds = 3)
    val (a, b) = (fa.merges, fb.merges)
    fa.release(); fb.release()
    assert(a == b)
  }

  test("batched fit ≡ sequential fit on the real corpus") {
    val seq5 = BpeVocab.fit(docs, rounds = 5, batch = 1)
    val bat5 = BpeVocab.fit(docs, rounds = 5, batch = 5)
    val (a, b) = (seq5.merges, bat5.merges)
    seq5.release(); bat5.release()
    assert(a == b, s"batched diverged from sequential:\n  seq=$a\n  bat=$b")
  }

  test("encode replays the merge table: encode(docs, fit.merges) ≡ fit.corpus") {
    val fit = BpeVocab.fit(docs, rounds = 5, batch = 5)
    val got = BpeVocab.encode(docs, fit.merges)
      .select(col("doc_id"), col("toks"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    val want = fit.corpus
      .select(col("doc_id"), col("toks"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    fit.release()
    assert(got.toSeq == want.toSeq,
      "encode over the raw corpus diverged from fit's final rewrite state")
  }

  test("batched fit ≡ sequential fit under forced interaction + count ties") {
    // crafted to exercise every selection guard: (a,b) and (b,c) chain
    // (symbol interaction — (b,c) must NOT batch with (a,b)), (x,y)
    // disjoint but TYING the cut count, and a self-pair run
    val rows = Seq(
      (1L, Seq("a", "b", "c", "a", "b", "c", "a", "b")),   // (a,b)=3, (b,c)=2
      (2L, Seq("x", "y", "x", "y")),                        // (x,y)=2 — ties (b,c)
      (3L, Seq("q", "q", "q", "a", "b")),                   // self-pair run, (a,b)=4th
      (4L, Seq("x", "y", "b", "c")))                        // +1 each
    val df = rows.toDF("doc_id", "toks").repartition(3)
    for (k <- 2 to 4) {
      val s1 = BpeVocab.fit(df, rounds = 4, batch = 1)
      val sk = BpeVocab.fit(df, rounds = 4, batch = k)
      val (a, b) = (s1.merges, sk.merges)
      s1.release(); sk.release()
      assert(a == b, s"batch=$k diverged:\n  seq=$a\n  bat=$b")
    }
  }

  test("spaced input tokens are rejected loudly (sampled precondition)") {
    // merged symbols are encoded l+" "+r — a token that already holds a
    // space would alias a merge and break batched≡sequential + the
    // n_absorbed conservation, so fit refuses the input up front
    val spaced = Seq((1L, Seq("a b", "c")), (2L, Seq("x", "y"))).toDF("doc_id", "toks")
    val e = intercept[IllegalArgumentException] {
      BpeVocab.fit(spaced, rounds = 1)
    }
    assert(e.getMessage.contains("space"))
  }
}
