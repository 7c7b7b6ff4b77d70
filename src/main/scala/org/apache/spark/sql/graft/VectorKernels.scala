package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native (whole-stage-codegen) vector kernels for the similarity-search
  * family (`graft/queries/VectorQueries.scala`). Lives under
  * `org.apache.spark.sql` because `ExpressionUtils` (Expression → Column)
  * and `AbstractDataType` are `private[sql]` — the standard extension-point
  * packaging for custom Catalyst expressions.
  *
  * Why native expressions and not `aggregate(zip_with(...))`: higher-order
  * functions are CodegenFallback — each call allocates the zipped array and
  * runs its lambda interpreted per element. That is fine once per vector,
  * but the near-dup queries evaluate the dot product inside the LSH-bucket
  * join's post-condition, i.e. once per CANDIDATE PAIR: at sf0.1 that was
  * ~3 interpreted 64-element lambdas × millions of pairs — the entire cost
  * of the r3 `emb_neardup_hp` bench regression. These expressions compile
  * into the join's generated predicate (tight primitive loop, zero
  * allocation), keeping pair scoring inside whole-stage codegen.
  *
  * Determinism: pure integer arithmetic over the quantized
  * (`floor(x*1000)` BIGINT) vectors — bit-identical to the DuckDB oracle's
  * integer sums.
  */
object VectorKernels {

  /** exact integer dot product of two array<bigint> columns */
  def dotL(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductL(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** signed hyperplane projection: sum_i q[i] * HpSigns.sign(plane, i+1) —
    * the md5-derived deterministic sign family (see [[HpSigns]] for why the
    * previous LCG family was unusable). */
  def hpSignedSum(q: Column, plane: Int): Column =
    ExpressionUtils.column(HpSignedSum(ExpressionUtils.expression(q), plane))
}

/** The deterministic hyperplane sign family, shared by the Spark kernel,
  * the recall harness, and (via `md5()`) the DuckDB oracle:
  *
  *   sign(p, pos) = +1  iff the first hex digit of md5("hp:p:pos") is even
  *
  * Found in r5: the previous LCG family — bit 15 of
  * (1103515245*(p*4096+pos)+12345) mod 2^31 — satisfies
  * sign(p+8, pos) = -sign(p, pos) EXACTLY (adding 8*4096*a ≡ odd*2^15
  * mod 2^31 always flips bit 15), so the whole family contained only 8
  * distinct hyperplanes up to negation. Bands beyond 8/bits repeated earlier
  * partitions verbatim: extra bands bought zero recall, and at 10^9 rows
  * `hpBitsFor`'s occupancy targeting would silently collapse (2^8 effective
  * buckets no matter the bit count). Any affine generator mod 2^k has
  * artifacts of this kind in fixed bit positions; md5 does not, costs the
  * same (signs are row-independent and cached per JVM), and the oracle twin
  * is one `substring(md5(...),1,1) IN ('0','2',...)` expression.
  *
  * Signs are cached as ±1 byte arrays per plane, grown on demand; the
  * kernel's generated code calls [[signedSum]] — a static JIT-compiled
  * primitive loop over the cached array, same cost as inlining. */
object HpSigns {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Byte]]()

  /** first-hex-digit-parity of md5("hp:p:pos"), pos 1-based. */
  def sign(plane: Int, pos: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"hp:$plane:$pos".getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 0) 1 else -1
  }

  def signs(plane: Int, n: Int): Array[Byte] = {
    val cur = cache.get(plane)
    if (cur != null && cur.length >= n) cur
    else {
      val grown = math.max(n, 64)
      val a = new Array[Byte](grown)
      var i = 0
      while (i < grown) { a(i) = sign(plane, i + 1).toByte; i += 1 }
      cache.put(plane, a)
      a
    }
  }

  /** Σ_i q[i] * sign(plane, i+1) over an ArrayData — called from both the
    * interpreted eval and the generated code. */
  def signedSum(plane: Int, x: ArrayData): Long = {
    val n = x.numElements()
    val s = signs(plane, n)
    var acc = 0L
    var i = 0
    while (i < n) { acc += (if (s(i) > 0) x.getLong(i) else -x.getLong(i)); i += 1 }
    acc
  }
}

/** Σ a[i]*b[i] over two array<bigint>; length = min of the two (the callers
  * always pass equal-length embeddings). Null elements are not expected
  * (the arrays come from `transform` over non-null floats). */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_l"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ_i q[i] * HpSigns.sign(plane, i+1) — one fused pass instead of
  * `aggregate(zip_with(q, sequence(...)))` per plane. The generated code
  * delegates to [[HpSigns.signedSum]] (static, JIT-compiled, cached sign
  * array) so the md5 derivation costs nothing per row. */
case class HpSignedSum(child: Expression, plane: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hp_signed_sum"

  override protected def nullSafeEval(a: Any): Any =
    HpSigns.signedSum(plane, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.HpSigns.signedSum($plane, $a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
