package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session-extension registration for the native kernels — the standard
  * Spark extension point (`--conf spark.sql.extensions=
  * org.apache.spark.sql.graft.GraftExtensions` on spark-submit, or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`), so SQL
  * users get the same codegen'd expressions the Dataset facade
  * (`graft.functions.VectorExpr` / `DateFormat`) uses:
  *
  *   dot_l(a, b)               exact int64 dot product of two array<bigint>
  *   lcg_signed_sum(q, base)   signed deterministic-LCG hyperplane projection
  *   format_date(ts, now [, gmt_offset, relative, shorter, full_format])
  *                             pyspider format_date over epoch seconds
  *
  * The knob arguments must be foldable literals — they parameterize codegen,
  * not per-row behavior (same contract as the Scala facade's Int/Boolean
  * parameters). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litOf[T](e: Expression, what: String): T = e match {
    case Literal(v, _) => v.asInstanceOf[T]
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("dot_l"),
      new ExpressionInfo(classOf[DotProductL].getName, "dot_l"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_l(a, b) takes 2 arguments")
        DotProductL(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("lcg_signed_sum"),
      new ExpressionInfo(classOf[LcgSignedSum].getName, "lcg_signed_sum"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "lcg_signed_sum(q, base) takes 2 arguments")
        LcgSignedSum(args(0), litOf[Number](args(1), "base").longValue())
      }))
    ext.injectFunction((FunctionIdentifier("format_date"),
      new ExpressionInfo(classOf[FormatDate].getName, "format_date"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 6,
          "format_date(ts, now[, gmt_offset, relative, shorter, full_format])")
        if (args.length == 2) FormatDate(args(0), args(1), 0, true, false, false)
        else FormatDate(args(0), args(1),
          litOf[Number](args(2), "gmt_offset").intValue(),
          litOf[Boolean](args(3), "relative"),
          litOf[Boolean](args(4), "shorter"),
          litOf[Boolean](args(5), "full_format"))
      }))
  }
}
