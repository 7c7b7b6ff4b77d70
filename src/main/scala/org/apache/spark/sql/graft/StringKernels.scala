package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native scalar kernels for the engine's URL/text function library —
  * the SQL-facing surface of what the crawl loop computes per follow
  * (VERDICT r4 items 3+6). Each is a Catalyst `UnaryExpression` whose
  * generated code is one static call into the engine's own JIT-compiled
  * Scala implementation (`graft.url.UrlCanon` / `graft.functions.
  * TextStats`), so SQL users, the Dataset facade, and the typed crawl hot
  * path run literally the same function — no parallel reimplementation to
  * drift, no boxed-`Option` Scala-UDF wrapper, and the expression
  * composes inside whole-stage codegen spans.
  *
  * Registered in [[GraftExtensions]]:
  *   canonicalize_url(url)      E2/E3 build_url + quote_chinese chain
  *   task_id(canon_url)         E1 md5 hex over the UTF8 bytes (no String
  *                              round-trip at all — bytes in, bytes out)
  *   main_domain(url_or_host)   E4 registrable-domain heuristic
  *   add_http_if_no_scheme(url) E5
  *   lang_id(text)              stopword/CJK vote language-ID
  *   token_count(text)          whitespace-collapsed token count
  *   quality_score(text)        struct(n_chars, n_tokens, stop_ratio,
  *                              avg_word_len) — one allocation-free pass
  *   simhash16(text)            TextStats 16-bit simhash
  *   simhash64(text)            md5-per-token 64-bit simhash (the
  *                              simhash64_bands bit derivation, packed)
  *   fingerprint64(text)        rolling-hash winnowing-lite fingerprint
  */
object StringKernels {

  def canonicalizeUrl(c: Column): Column = col(CanonicalizeUrl(expr(c)))
  def taskId(c: Column): Column = col(TaskIdMd5(expr(c)))
  def mainDomain(c: Column): Column = col(MainDomain(expr(c)))
  def addHttpIfNoScheme(c: Column): Column = col(AddHttpIfNoScheme(expr(c)))
  def langId(c: Column): Column = col(LangId(expr(c)))
  def tokenCount(c: Column): Column = col(TokenCount(expr(c)))
  def qualityScore(c: Column): Column = col(QualityScore(expr(c)))
  def simhash16(c: Column): Column = col(Simhash16(expr(c)))
  def simhash64(c: Column): Column = col(Simhash64(expr(c)))
  def fingerprint64(c: Column): Column = col(Fingerprint64(expr(c)))

  private def col(e: Expression): Column = ExpressionUtils.column(e)
  private def expr(c: Column): Expression = ExpressionUtils.expression(c)

  // ---- static entry points the generated code calls ---------------------

  def canon(u: UTF8String): UTF8String =
    UTF8String.fromString(graft.url.UrlCanon.canonicalize(u.toString))

  private val HEX = "0123456789abcdef".getBytes("US-ASCII")

  /** md5 hex of the value's UTF-8 bytes, computed on the raw bytes. */
  def md5HexBytes(u: UTF8String): UTF8String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(u.getBytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def mainDomainS(u: UTF8String): UTF8String =
    UTF8String.fromString(graft.url.UrlCanon.mainDomain(u.toString))

  def addSchemeS(u: UTF8String): UTF8String =
    UTF8String.fromString(graft.url.UrlCanon.addHttpIfNoScheme(u.toString))

  def langIdS(u: UTF8String): UTF8String =
    UTF8String.fromString(graft.functions.TextStats.analyze(u.toString).lang)

  def tokenCountS(u: UTF8String): Long =
    graft.functions.TextStats.analyze(u.toString).nTokens.toLong

  def qualityScoreS(u: UTF8String): InternalRow = {
    val s = graft.functions.TextStats.analyze(u.toString)
    InternalRow(s.nChars.toLong, s.nTokens.toLong, s.stopRatio, s.avgWordLen)
  }

  def simhash16S(u: UTF8String): Long =
    graft.functions.TextStats.analyze(u.toString).simhash16.toLong

  def fingerprint64S(u: UTF8String): Long =
    graft.functions.TextStats.fingerprint(u.toString)

  /** 64-bit simhash over single-space-split tokens (EMPTY tokens included —
    * the exact `split(text, ' ', -1)` stream the simhash64_bands gate
    * aggregates), md5-derived bit votes: bit j reads hex digit j/2 of the
    * token's md5 (even j: digit ≥ 8; odd j: digit odd). The packed value's
    * 16-bit slices equal the gate's band0..band3. */
  def simhash64S(u: UTF8String): Long = {
    val s = u.toString
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val d = md.digest(s.substring(start, i)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var j = 0
        while (j < 64) {
          val hexPos = j / 2
          val b = d(hexPos / 2)
          val nib = if (hexPos % 2 == 0) (b >> 4) & 0xf else b & 0xf
          val up = if (j % 2 == 0) nib >= 8 else (nib & 1) == 1
          if (up) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }
}

/** Shared shape: string in, one static call out. The call target must be a
  * `StringKernels` method of arity 1 over UTF8String. */
abstract class StringKernelExpr extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  /** fully-qualified static call target */
  protected def target: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.StringKernels.$target($a);")
}

case class CanonicalizeUrl(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "canonicalize_url"
  override protected def target: String = "canon"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.canon(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class TaskIdMd5(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "task_id"
  override protected def target: String = "md5HexBytes"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.md5HexBytes(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MainDomain(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "main_domain"
  override protected def target: String = "mainDomainS"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.mainDomainS(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class AddHttpIfNoScheme(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "add_http_if_no_scheme"
  override protected def target: String = "addSchemeS"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.addSchemeS(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class LangId(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override protected def target: String = "langIdS"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.langIdS(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class TokenCount(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "token_count"
  override protected def target: String = "tokenCountS"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.tokenCountS(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class QualityScore(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("stop_ratio", DoubleType, nullable = false),
    StructField("avg_word_len", DoubleType, nullable = false)))
  override def prettyName: String = "quality_score"
  override protected def target: String = "qualityScoreS"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.qualityScoreS(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Simhash16(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash16"
  override protected def target: String = "simhash16S"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.simhash16S(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Simhash64(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def target: String = "simhash64S"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.simhash64S(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Fingerprint64(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"
  override protected def target: String = "fingerprint64S"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.fingerprint64S(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
