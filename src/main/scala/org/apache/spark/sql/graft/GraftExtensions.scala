package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for the native kernels — the standard
  * Spark extension point (`--conf spark.sql.extensions=
  * org.apache.spark.sql.graft.GraftExtensions` on spark-submit, or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`), so SQL
  * users get the same codegen'd expressions the Dataset facade
  * (`graft.functions.VectorExpr` / `DateFormat`) uses:
  *
  *   dot_l(a, b)               exact int64 dot product of two array<bigint>
  *   hp_signed_sum(q, plane)   signed deterministic hyperplane projection
  *   format_date(ts, now [, gmt_offset, relative, shorter, full_format])
  *                             pyspider format_date over epoch seconds
  * plus the engine's scalar URL/text library (see [[StringKernels]]):
  *   canonicalize_url, task_id, main_domain, add_http_if_no_scheme,
  *   lang_id, token_count, quality_score, simhash16, simhash64,
  *   fingerprint64
  *
  * The knob arguments must be foldable literals — they parameterize codegen,
  * not per-row behavior (same contract as the Scala facade's Int/Boolean
  * parameters). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // Foldable, not Literal: the parser wraps negative numbers as
  // UnaryMinus(Literal), and casts/concats of constants are equally fine —
  // anything Catalyst can constant-fold parameterizes codegen safely.
  private def litOf[T](e: Expression, what: String): T =
    if (e.foldable) e.eval().asInstanceOf[T]
    else throw new IllegalArgumentException(
      s"$what must be a foldable constant, got $e")

  private def unary(ext: SparkSessionExtensions, name: String,
                    cls: Class[_], mk: Expression => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(cls.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name(s) takes 1 argument")
        mk(args.head)
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the engine's scalar URL/text library (StringKernels) — SQL runs the
    // SAME JIT-compiled functions the crawl hot path uses
    unary(ext, "canonicalize_url", classOf[CanonicalizeUrl], CanonicalizeUrl)
    unary(ext, "task_id", classOf[TaskIdMd5], TaskIdMd5)
    unary(ext, "main_domain", classOf[MainDomain], MainDomain)
    unary(ext, "add_http_if_no_scheme", classOf[AddHttpIfNoScheme], AddHttpIfNoScheme)
    unary(ext, "lang_id", classOf[LangId], LangId)
    unary(ext, "token_count", classOf[TokenCount], TokenCount)
    unary(ext, "quality_score", classOf[QualityScore], QualityScore)
    unary(ext, "simhash16", classOf[Simhash16], Simhash16)
    unary(ext, "simhash64", classOf[Simhash64], Simhash64)
    unary(ext, "fingerprint64", classOf[Fingerprint64], Fingerprint64)

    ext.injectFunction((FunctionIdentifier("dot_l"),
      new ExpressionInfo(classOf[DotProductL].getName, "dot_l"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_l(a, b) takes 2 arguments")
        DotProductL(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("hp_signed_sum"),
      new ExpressionInfo(classOf[HpSignedSum].getName, "hp_signed_sum"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hp_signed_sum(q, plane) takes 2 arguments")
        HpSignedSum(args(0), litOf[Number](args(1), "plane").intValue())
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
