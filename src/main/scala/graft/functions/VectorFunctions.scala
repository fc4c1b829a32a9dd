package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns, built from Spark's
  * higher-order functions (`zip_with` + `aggregate`) — codegen'd, no UDF.
  *
  * Exactness contract: the correctness gate hash-compares against DuckDB,
  * and double-accumulated dot products differ across engines in the last
  * ulps (and double→DECIMAL rounding differs too — measured ~1e-13).
  * So vectors are first QUANTIZED: `floor(x * 2^20)` per element, computed
  * in double (exact for the float inputs, identical in every engine), then
  * all dot/norm arithmetic is exact int64 (max |x| < 1 here; elements
  * ≤ 2^20, 64-dim products sum < 2^46 ≪ 2^63, and every sum < 2^53 so the
  * final cast to double is exact). The resulting cosine is bit-identical
  * across engines while differing from the float-exact cosine by O(1e-6) —
  * far below any similarity-threshold resolution that matters.
  *
  * At scale: quantize once per vector (narrow map), not per pair; dot
  * products are per-pair int ops inside codegen; no shuffle is introduced
  * by any function here.
  */
object VectorFunctions {
  /** 2^20 — quantization scale. */
  val Q: Long = 1L << 20

  /** array<float> → array<bigint>, exact deterministic quantization. */
  def quantize(c: String): Column =
    expr(s"transform($c, x -> CAST(floor(CAST(x AS DOUBLE) * $Q.0) AS BIGINT))")

  /** Exact int64 dot product of two quantized vectors.
    *
    * Folds over a CONSTANT index sequence (Catalyst constant-folds
    * `sequence(0, dim-1)` once) with element_at lookups — unlike a
    * `zip_with` formulation this allocates no per-row intermediate array,
    * which matters when the expression runs once per PAIR in an O(n²)
    * loop. Same integer sum, so oracle results are unchanged. */
  def qdot(a: String, b: String, dim: Int = 64): Column =
    expr(s"aggregate(sequence(0, ${dim - 1}), CAST(0 AS BIGINT), (acc, i) -> acc + $a[i]*$b[i])")

  /** Euclidean norm (double) of a quantized vector — exact up to the final
    * sqrt, which is IEEE correctly-rounded and thus engine-identical. */
  def qnorm(a: String): Column = sqrt(qdot(a, a).cast("double"))

  /** Cosine from a precomputed quantized dot and two norms; the 2^40
    * quantization factors cancel algebraically so no rescale is needed. */
  def cosineFrom(dot: Column, normA: Column, normB: Column): Column =
    dot.cast("double") / (normA * normB)
}
