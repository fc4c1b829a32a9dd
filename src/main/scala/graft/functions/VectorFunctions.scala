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

  /** array<float> → array<bigint>, exact deterministic quantization —
    * ONE native expression ([[graft.plans.QuantizeVector]]) since r18:
    * the former `transform(…)` fragment is an interpreted higher-order
    * lambda (~64 boxed evals per embedding row) sitting on the first
    * pass of EVERY vector query; the native loop computes the identical
    * `floor(x·2^20)` int64 (VectorExprSpec pins native ≡ transform). */
  def quantize(c: String): Column =
    graft.plans.VectorExpressions.quantize(col(c), Q.toDouble)

  /** Exact int64 dot product of two quantized vectors, as ONE native
    * Catalyst expression ([[graft.plans.QuantizedDot]]).
    *
    * History: round 1 used `aggregate`/`zip_with` (interpreted lambda per
    * element — ~20s for 1M pairs); round 2 unrolled to a flat 250-node
    * `a[0]*b[0] + …` chain (fast under codegen, but a cosine threshold
    * above a pair join gets pushed into the BroadcastNestedLoopJoin
    * CONDITION, which evaluates INTERPRETED — ~5µs/pair of boxed eval).
    * The single native-loop expression is ~100ns/pair in both contexts.
    * Integer addition is order-independent, so oracle sums are unchanged. */
  def qdot(a: String, b: String): Column =
    graft.plans.VectorExpressions.qdot(col(a), col(b))

  /** Dot of a quantized vector against a driver-side constant vector
    * (e.g. a literal LSH hyperplane). */
  def qdotLit(a: String, v: Seq[Long]): Column =
    graft.plans.VectorExpressions.qdot(col(a), typedLit(v))

  /** Euclidean norm (double) of a quantized vector — exact up to the final
    * sqrt, which is IEEE correctly-rounded and thus engine-identical. */
  def qnorm(a: String): Column = sqrt(qdot(a, a).cast("double"))

  /** Cosine from a precomputed quantized dot and two norms; the 2^40
    * quantization factors cancel algebraically so no rescale is needed.
    * A zero-norm vector (all-zero / sub-quantum embedding) yields NULL
    * through nullif — under Spark's default ANSI mode a bare double /0
    * throws DIVIDE_BY_ZERO and would abort the whole similarity query
    * on one degenerate row. */
  def cosineFrom(dot: Column, normA: Column, normB: Column): Column =
    dot.cast("double") / nullif(normA * normB, lit(0.0))
}
