package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor surface over the `embeddings` table.
  *
  * `q_knn_brute` is the exact baseline: broadcast the (tiny) query set
  * against a single scan of the candidate corpus — at 100 TB this is one
  * pass, no shuffle on the corpus, with a per-query top-k. The quantized
  * arithmetic (see VectorFunctions) keeps scores bit-identical to the
  * DuckDB oracle.
  */
object SimilarityQueries {

  val entries: Seq[Entry] = Seq(

    // ---- Brute-force cosine top-k for a pinned query set (vec_id < 5).
    // The row_number window shuffles on qid only — fine for a bounded
    // query set; the corpus side is a single broadcast-joined scan.
    entry("q_knn_brute",
      """WITH e AS (SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE)*1048576.0) AS BIGINT) for x in embedding] q FROM embeddings),
        | terms AS (SELECT vec_id, x*x t FROM (SELECT vec_id, unnest(q) x FROM e)),
        | n AS (SELECT vec_id, sqrt(CAST(SUM(t) AS DOUBLE)) nrm FROM terms GROUP BY 1),
        | qv AS (SELECT vec_id qid, q qe FROM e WHERE vec_id < 5),
        | pt AS (SELECT qid, c.vec_id cid, qe[i]*c.q[i] t
        |        FROM qv CROSS JOIN e c CROSS JOIN generate_series(1,64) g(i) WHERE qid <> c.vec_id),
        | p AS (SELECT qid, cid, CAST(SUM(t) AS DOUBLE) dot FROM pt GROUP BY 1,2),
        | s AS (SELECT qid, cid, dot/(nq.nrm*nc.nrm) cosine
        |       FROM p JOIN n nq ON p.qid = nq.vec_id JOIN n nc ON p.cid = nc.vec_id),
        | r AS (SELECT qid, cid, cosine, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) rnk FROM s)
        |SELECT qid, rnk, cid, cosine FROM r WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), quantize("embedding").as("q"))
        .withColumn("nrm", qnorm("q"))
      val queries = broadcast(
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("q").as("qe"), col("nrm").as("qnrm")))
      val scored = e.select(col("vec_id").as("cid"), col("q").as("ce"), col("nrm").as("cnrm"))
        .join(queries, col("qid") =!= col("cid"))
        .withColumn("cosine", cosineFrom(qdot("qe", "ce"), col("qnrm"), col("cnrm")))
      val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid").asc)
      scored
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 10)
        .select(col("qid"), col("rnk"), col("cid"), col("cosine"))
        .orderBy(col("qid"), col("rnk"))
    }
  )
}
