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

  /** signed LCG-hyperplane projection: sum_i q[i] * s(plane, i+1) with
    * s(p,pos) = +1 if ((1103515245*(p*4096+pos)+12345) mod 2^31) div 2^15
    * is even else -1 — the same deterministic draw the DuckDB oracle uses. */
  def lcgSignedSum(q: Column, plane: Int): Column =
    ExpressionUtils.column(LcgSignedSum(ExpressionUtils.expression(q), plane * 4096L))
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

/** Σ_i q[i] * sign(base + i + 1) where sign(k) flips on bit 15 of the LCG
  * draw — one fused pass instead of `aggregate(zip_with(q, sequence(...)))`
  * per plane. `base` is plane*4096 so each plane reads a disjoint LCG
  * stream. */
case class LcgSignedSum(child: Expression, base: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "lcg_signed_sum"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val draw = (1103515245L * (base + i + 1) + 12345L) % 2147483648L
      acc += (if ((draw / 32768L) % 2L == 0L) x.getLong(i) else -x.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val draw = ctx.freshName("draw")
      s"""
         |final int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $draw = (1103515245L * (${base}L + $i + 1) + 12345L) % 2147483648L;
         |  $acc += (($draw / 32768L) % 2L == 0L) ? $a.getLong($i) : -$a.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
