package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.{GraftExpressionBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector/dedup hot paths.
  *
  * Why these exist (measured, not speculative): a 64-dim dot product
  * written as an unrolled `a[0]*b[0] + … + a[63]*b[63]` Column chain is
  * ~250 expression nodes. Inside a whole-stage-codegen'd Project that is
  * fine, but the similarity thresholds above pair joins get pushed into
  * the JOIN CONDITION (BroadcastNestedLoopJoin), where conditions are
  * evaluated with interpreted `Expression.eval` — recursive descent plus a
  * boxed java.lang.Long per node, ~5µs per pair. At 1M candidate pairs
  * that alone was ~8s of the round-2 bench. Each expression here is ONE
  * node whose eval is a primitive loop (~100ns), and whose codegen is a
  * static call into [[VectorOps]] — the same pattern as
  * [[MsgpackToJsonExpr]], so both interpreted and codegen'd contexts get
  * the native loop.
  *
  * All arithmetic is exact int64 on pre-quantized values (see
  * [[graft.functions.VectorFunctions]] for the exactness contract with the
  * DuckDB oracle). Array elements must be non-null (they come from
  * `transform` over non-null numeric columns).
  */
object VectorOps {

  /** Exact int64 dot product of two equal-length bigint arrays. Length
    * mismatch or a null element raises a clear error rather than reading
    * out of bounds — `graft_qdot` is on the public SQL surface
    * (UnsafeArrayData.getLong has no bounds check and reads 0/garbage at
    * null slots, so an unchecked loop would return wrong sums silently). */
  def qdot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_qdot: vector lengths differ (${n} vs ${b.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"graft_qdot: null element at index $i")
      s += a.getLong(i) * b.getLong(i); i += 1
    }
    s
  }

  /** Exact int64 squared Euclidean distance Σ(a_i − b_i)² of two
    * equal-length bigint arrays — same contract and bounds discipline as
    * [[qdot]] (r18: replaces the interpreted `aggregate(zip_with(…))`
    * lambda in the PQ encode/rerank hot path — higher-order functions are
    * CodegenFallback, ~µs/row; this is one native loop in both contexts). */
  def qdist2(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_qdist2: vector lengths differ (${n} vs ${b.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"graft_qdist2: null element at index $i")
      val d = a.getLong(i) - b.getLong(i)
      s += d * d; i += 1
    }
    s
  }

  /** Exact deterministic quantization of one float/double vector:
    * element i → `floor(x_i · scale)` as int64 — the identical
    * arithmetic of the `transform(c, x -> CAST(floor(CAST(x AS DOUBLE) *
    * scale) AS BIGINT))` fragment it replaces (r18: `transform` is an
    * interpreted higher-order lambda, ~64 boxed evals per embedding row
    * on EVERY vector query's first pass; this is one native loop in
    * both codegen and interpreted contexts). Null elements stay null
    * (CAST(NULL) semantics); a NaN or out-of-int64-range product throws
    * exactly where the ANSI cast would. */
  def quantize(v: ArrayData, scale: Double, fromDouble: Boolean): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val x = if (fromDouble) v.getDouble(i) else v.getFloat(i).toDouble
        val d = Math.floor(x * scale)
        if (d.isNaN || d < Long.MinValue.toDouble || d > Long.MaxValue.toDouble)
          throw new ArithmeticException(
            s"graft_quantize: $x * $scale out of bigint range (ANSI cast contract)")
        out(i) = d.toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All `k` MinHash slots in one pass over the per-shingle base hashes.
    * Slot i (1-based) applies the affine family
    * `h_i(b) = ((2i+1)·b + 1000003·i) mod 2147483647` and keeps the min —
    * the classic one-strong-hash + k-affine-transforms construction
    * (base = first 8 hex digits of md5, so b < 2^32 and every product
    * stays well inside int64). The DuckDB oracle replays the identical
    * formula. */
  def minhash(bases: ArrayData, k: Int): ArrayData = {
    val n = bases.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (bases.isNullAt(j))
        throw new IllegalArgumentException(s"graft_minhash: null base hash at index $j")
      val b = bases.getLong(j)
      // the affine family's int64 headroom assumes 32-bit bases (the md5
      // prefix contract); a larger b would overflow (2i+1)·b and return
      // negative garbage SILENTLY — reject it loudly on the SQL surface
      if (b < 0L || b > 0xffffffffL)
        throw new IllegalArgumentException(
          s"graft_minhash: base hash $b outside the 32-bit contract [0, 2^32)")
      var i = 1
      while (i <= k) {
        val h = ((2L * i + 1L) * b + 1000003L * i) % 2147483647L
        if (h < mins(i - 1)) mins(i - 1) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** SimHash fingerprint as a 64-char '0'/'1' string from per-token md5
    * hex strings. Bit b is set when at least half of the `n` token hashes
    * have bit b set, where bit b lives in hex nibble b/4 (0-based from the
    * left) at weight 2^(b%4) — the identical extraction the DuckDB oracle
    * states with strpos/substr arithmetic. */
  def simhash64(hashes: ArrayData, n: Long): UTF8String = {
    val counts = new Array[Int](64)
    val m = hashes.numElements()
    var j = 0
    while (j < m) {
      if (hashes.isNullAt(j))
        throw new IllegalArgumentException(s"graft_simhash64: null hash at index $j")
      val hex = hashes.getUTF8String(j).toString
      if (hex.length < 16)
        throw new IllegalArgumentException(
          s"graft_simhash64: hash '$hex' shorter than 16 hex chars")
      var b = 0
      while (b < 64) {
        val nibble = Character.digit(hex.charAt(b >> 2), 16)
        // Character.digit returns -1 for a non-hex char, whose bit
        // pattern would count EVERY bit of the nibble as set — a
        // plausible-looking but corrupt fingerprint; reject instead
        if (nibble < 0)
          throw new IllegalArgumentException(
            s"graft_simhash64: non-hex char '${hex.charAt(b >> 2)}' in hash '$hex'")
        if (((nibble >> (b & 3)) & 1) == 1) counts(b) += 1
        b += 1
      }
      j += 1
    }
    val out = new Array[Byte](64)
    var b = 0
    while (b < 64) {
      out(b) = if (2L * counts(b) >= n) '1' else '0'
      b += 1
    }
    UTF8String.fromBytes(out)
  }

  /** 32-bit Morton code from the low 16 bits of two keys — see [[ZOrder2]]. */
  def morton2(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** `graft_quantize(array<float|double>) -> array<bigint>` — see
  * [[VectorOps.quantize]]. */
case class QuantizeVector(child: Expression, scale: Double) extends UnaryExpression {
  override def prettyName: String = "graft_quantize"
  // transform's lambda output is nullable, so the fragment this replaces
  // produced containsNull = true — keep the schema identical
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  private lazy val fromDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize requires array<float> or array<double>, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.quantize(v.asInstanceOf[ArrayData], scale, fromDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.VectorOps.quantize($v, $scale, $fromDouble);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeVector =
    copy(child = newChild)
}

/** `graft_qdot(array<bigint>, array<bigint>) -> bigint` — see [[VectorOps.qdot]]. */
case class QuantizedDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_qdot"

  // analysis-time rejection beats a runtime ClassCastException / silent
  // garbage read — this name is registered on the public SQL surface
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_qdot requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.qdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.qdot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDot =
    copy(left = l, right = r)
}

/** `graft_qdist2(array<bigint>, array<bigint>) -> bigint` — see
  * [[VectorOps.qdist2]]. */
case class QuantizedDist2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_qdist2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_qdist2 requires (array<bigint>, array<bigint>), got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.qdist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.qdist2($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDist2 =
    copy(left = l, right = r)
}

/** `graft_minhash(array<bigint>) -> array<bigint>` of `k` slots — see
  * [[VectorOps.minhash]]. An EMPTY bases array yields NULL (there is no
  * minimum of nothing; shingle inputs are length-clamped so the engine's
  * own queries never hit this, but the SQL surface can). */
case class MinHashSlots(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  // NullType element covers the bare `array()` literal — evaluates to NULL
  // (empty) or a clear runtime null-element error, never garbage
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | org.apache.spark.sql.types.NullType, _) if k >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType | org.apache.spark.sql.types.NullType, _) =>
      TypeCheckResult.TypeCheckFailure(s"graft_minhash requires k >= 1, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<bigint> bases, got $other")
  }

  override protected def nullSafeEval(bases: Any): Any = {
    val arr = bases.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null else VectorOps.minhash(arr, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.VectorOps.minhash($c, $k);
         |}""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSlots =
    copy(child = newChild)
}

/** `graft_simhash64(array<string>, bigint) -> string` — see
  * [[VectorOps.simhash64]]. */
case class SimHash64(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash64 requires (array<string>, bigint), got ($l, $r)")
    }

  override protected def nullSafeEval(hs: Any, n: Any): Any =
    VectorOps.simhash64(hs.asInstanceOf[ArrayData], n.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (hs, n) => s"graft.plans.VectorOps.simhash64($hs, (long) $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SimHash64 =
    copy(left = l, right = r)
}

/** `graft_zorder2(bigint, bigint) -> bigint` — 32-bit Morton code
  * interleaving the LOW 16 BITS of each key (bit i of `a` lands at 2i, of
  * `b` at 2i+1; higher bits are ignored, which both engines and the
  * oracle replicate). Sorting by this code clusters rows that are close
  * in BOTH dimensions, so per-file min/max stats prune scans filtered on
  * either column — the standard lake Z-ORDER optimization. One native
  * node: a 16-iteration shift loop in both interpreted and codegen'd
  * contexts. */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder2 requires integral keys, got ($l, $r)")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.morton2(a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.morton2((long) $a, (long) $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(left = l, right = r)
}

/** Column-level constructors (classic-session bridge). */
object VectorExpressions {
  def quantize(v: Column, scale: Double): Column =
    ExpressionUtils.column(QuantizeVector(ExpressionUtils.expression(v), scale))

  def qdot(a: Column, b: Column): Column =
    ExpressionUtils.column(QuantizedDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def qdist2(a: Column, b: Column): Column =
    ExpressionUtils.column(QuantizedDist2(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def minhashSlots(bases: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSlots(ExpressionUtils.expression(bases), k))

  def simhash64(hashes: Column, n: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(hashes), ExpressionUtils.expression(n)))

  def zorder2(a: Column, b: Column): Column =
    ExpressionUtils.column(ZOrder2(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
