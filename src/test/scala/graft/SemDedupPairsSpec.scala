package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** r18 equivalence proof for the q_semdedup pair-stage restructure: the
  * group-local native expression ([[graft.plans.SemDedupPairs]]) must
  * reproduce the per-vid (keeper_id, n_near) summaries of the
  * (cl, sh)-keyed self-join + filter + groupBy shape it replaced,
  * bit-identically, on real testdata — including the threshold
  * boundary's IEEE semantics (double divide vs τ, NULL on a zero
  * denominator).
  */
class SemDedupPairsSpec extends SparkSpec {
  import spark.implicits._

  private def sideFrame(tauShard: Long) = {
    import graft.functions.KMeans
    val emb = Tables(spark, sf001, "embeddings")
      .select($"vec_id", $"label", quantize("embedding").as("q"))
      .persist()
    val asg = KMeans.assign(emb, KMeans.labelSums(emb))
      .select($"vec_id".as("a_vec_id"), $"cl")
    emb.join(asg, $"vec_id" === $"a_vec_id")
      .select($"vec_id", $"cl", expr(s"vec_id DIV $tauShard").as("sh"),
        $"q", qnorm("q").as("nrm"))
  }

  private def joinShape(side: org.apache.spark.sql.DataFrame, tau: Double) = {
    val a = side.select($"vec_id".as("kid"), $"cl".as("acl"),
      $"sh".as("ash"), $"q".as("aq"), $"nrm".as("anrm"))
    val b = side.select($"vec_id".as("vid"), $"cl".as("bcl"),
      $"sh".as("bsh"), $"q".as("bq"), $"nrm".as("bnrm"))
    a.join(b, $"acl" === $"bcl" && $"ash" === $"bsh" && $"kid" < $"vid")
      .withColumn("cosine", cosineFrom(qdot("aq", "bq"), $"anrm", $"bnrm"))
      .filter($"cosine" >= tau)
      .groupBy($"vid")
      .agg(min($"kid").as("keeper_id"), count(lit(1)).as("n_near"))
  }

  private def groupShape(side: org.apache.spark.sql.DataFrame, tau: Double) =
    side.groupBy($"cl", $"sh")
      .agg(collect_list(struct($"vec_id", $"q", $"nrm")).as("members"))
      .select(explode(graft.plans.SemDedupExpressions.pairSummaries(
        $"members", tau)).as("r"))
      .select($"r.vid".as("vid"), $"r.keeper_id".as("keeper_id"),
        $"r.n_near".as("n_near"))

  test("group-local pair summaries equal the self-join shape (query τ = 0.35)") {
    val side = sideFrame(2000L).persist()
    val exp = joinShape(side, 0.35).as[(Long, Long, Long)].collect().toSet
    val got = groupShape(side, 0.35).as[(Long, Long, Long)].collect().toSet
    assert(got === exp)
    assert(exp.nonEmpty, "the τ=0.35 check must actually exercise hits")
  }

  test("agreement holds at a loose τ where most pairs hit (multi-hit vids, shard splits)") {
    // small shard width forces many (cl, sh) groups, exercising the
    // group boundary exactly where the join's equi-key condition cuts
    val side = sideFrame(50L).persist()
    val exp = joinShape(side, 0.05).as[(Long, Long, Long)].collect().toSet
    val got = groupShape(side, 0.05).as[(Long, Long, Long)].collect().toSet
    assert(got === exp)
    assert(exp.exists(_._3 > 1), "needs vids with n_near > 1 to pin min/count")
  }

  test("single-member and empty-hit groups emit nothing (no phantom rows)") {
    val side = sideFrame(1L) // shard width 1: every group is a singleton
    assert(groupShape(side, 0.35).count() === 0)
  }
}
