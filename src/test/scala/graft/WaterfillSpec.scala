package graft

import org.apache.spark.sql.functions._

import graft.functions.Waterfill

/** The distributed waterfill plan must equal the sequential reference on
  * every instance — the bridge that carries InvariantProps' reference
  * properties (sum-to-target, caps, fairness) over to the gated
  * q_token_waterfill plan. */
class WaterfillSpec extends SparkSpec {
  import spark.implicits._

  private def check(avails: Seq[(String, Long)], num: Int, den: Int): Unit = {
    val got = Waterfill.allocate(avails.toDF("source", "avail"), "source", "avail", num, den)
      .select($"source", $"allocated", $"capped")
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // allocate() registers a lazyLocal checkpoint per call — release the
    // blocks between instances like the query harness does
    graft.functions.Checkpoints.releaseAll()
    val want = Waterfill.reference(avails, num, den)
    val byKey = avails.toMap
    assert(got.keySet == avails.map(_._1).toSet, s"missing rows for $avails")
    avails.foreach { case (k, a) =>
      assert(got(k)._1 == want(k),
        s"$k: plan ${got(k)._1} != reference ${want(k)} on $avails at $num/$den")
      // the capped flag may only claim groups that took everything
      assert(!got(k)._2 || got(k)._1 == a, s"$k flagged capped below avail")
    }
    assert(got.values.map(_._1).sum == avails.map(_._2).sum * num / den)
  }

  test("distributed waterfill equals the sequential reference") {
    // the gated query's own shape (20-ish sources, 90% target)
    check(Seq("a" -> 1136L, "b" -> 1147L, "c" -> 1266L, "d" -> 1553L,
      "e" -> 1435L, "f" -> 1540L), 9, 10)
    // single source, two equal sources, heavy skew, tiny values
    check(Seq("only" -> 100L), 1, 2)
    check(Seq("x" -> 50L, "y" -> 50L), 3, 4)
    check(Seq("tiny" -> 1L, "giant" -> 100000L), 9, 10)
    check(Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 997L), 1, 2)
    // deterministic pseudo-random instances
    var seed = 123456789L
    def next(mod: Long): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; math.floorMod(seed >>> 16, mod) }
    for (i <- 0 until 8) {
      val n = 1 + next(11).toInt
      val avails = (0 until n).map(j => (f"s$j%02d", 1L + next(5000)))
      check(avails, 1 + next(9).toInt, 10)
    }
  }
}
