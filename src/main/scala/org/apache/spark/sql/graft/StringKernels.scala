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
  def fingerprintShingle(c: Column): Column = col(FingerprintShingleMd5Expr(expr(c)))
  def minhashBands(c: Column): Column = col(MinhashBandsExpr(expr(c)))
  def simhash16Md5(c: Column): Column = col(Simhash16Md5Expr(expr(c)))

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

  // ---- r6 single-pass dedup-signature kernels ---------------------------
  // Each replaces an explode → shuffle → hash-aggregate gate plan with ONE
  // scalar pass over the document (doc_id is unique in `documents`, so the
  // per-doc aggregation never actually merged anything across rows — the
  // exchange moved |text|/4 shingle rows per doc just to fold them back to
  // one). Semantics are bit-for-bit the DuckDB oracle's: md5 over the UTF-8
  // bytes, min compared unsigned (== lexicographic min of the lowercase hex
  // the oracle compares), shingles stepped by CODE POINT exactly like
  // substr(text, i, 8) in both engines.

  private val MD5_TL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** byte offsets of code-point starts (UTF-8 lead bytes) + end sentinel */
  private def cpOffsets(b: Array[Byte]): Array[Int] = {
    var n = 0
    var i = 0
    while (i < b.length) { if ((b(i) & 0xc0) != 0x80) n += 1; i += 1 }
    val offs = new Array[Int](n + 1)
    var k = 0
    i = 0
    while (i < b.length) {
      if ((b(i) & 0xc0) != 0x80) { offs(k) = i; k += 1 }
      i += 1
    }
    offs(n) = b.length
    offs
  }

  @inline private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  @inline private def hexInto(d: Array[Byte], out: Array[Byte], at: Int): Unit = {
    var i = 0
    while (i < 16) {
      out(at + 2 * i) = HEX((d(i) >> 4) & 0xf)
      out(at + 2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
  }

  /** min over char shingles (8 code points, step 4, `substr` semantics at
    * i = 1, 5, … ≤ max(len-7, 1)) of md5(shingle), hex-encoded — the
    * t_fingerprint gate value, computed with zero explode/exchange. */
  def fingerprintShingleMd5(u: UTF8String): UTF8String = {
    val bytes = u.getBytes
    val offs = cpOffsets(bytes)
    val len = offs.length - 1
    val md = MD5_TL.get()
    val cur = new Array[Byte](16)
    val best = new Array[Byte](16)
    var have = false
    val limit = math.max(len - 7, 1)
    var i = 1
    while (i <= limit) {
      val s = offs(i - 1)
      val e = offs(math.min(i + 7, len))
      md.reset()
      md.update(bytes, s, e - s)
      md.digest(cur, 0, 16)
      if (!have || unsignedLess(cur, best)) {
        System.arraycopy(cur, 0, best, 0, 16)
        have = true
      }
      i += 4
    }
    val out = new Array[Byte](32)
    hexInto(best, out, 0)
    UTF8String.fromBytes(out)
  }

  /** the minhash_signatures gate bands in one shingle pass:
    * band1 = md5(hex(min md5('1'||sh)) || hex(min md5('2'||sh))),
    * band2 = the same with prefixes '3','4'. */
  def minhashBandsS(u: UTF8String): InternalRow = {
    val bytes = u.getBytes
    val offs = cpOffsets(bytes)
    val len = offs.length - 1
    val md = MD5_TL.get()
    val cur = new Array[Byte](16)
    val mins = Array.ofDim[Byte](4, 16)
    var have = false
    val limit = math.max(len - 7, 1)
    var i = 1
    while (i <= limit) {
      val s = offs(i - 1)
      val e = offs(math.min(i + 7, len))
      var k = 0
      while (k < 4) {
        md.reset()
        md.update(('1' + k).toByte)
        md.update(bytes, s, e - s)
        md.digest(cur, 0, 16)
        if (!have || unsignedLess(cur, mins(k)))
          System.arraycopy(cur, 0, mins(k), 0, 16)
        k += 1
      }
      have = true
      i += 4
    }
    val hexCat = new Array[Byte](64)
    val out = new Array[Array[Byte]](2)
    var b = 0
    while (b < 2) {
      hexInto(mins(2 * b), hexCat, 0)
      hexInto(mins(2 * b + 1), hexCat, 32)
      md.reset()
      md.update(hexCat, 0, 64)
      md.digest(cur, 0, 16)
      val h = new Array[Byte](32)
      hexInto(cur, h, 0)
      out(b) = h
      b += 1
    }
    InternalRow(UTF8String.fromBytes(out(0)), UTF8String.fromBytes(out(1)))
  }

  /** the dedup_simhash gate value: 16-char '0'/'1' string, bit j voted by
    * nibble j of md5(token) ≥ 8 over single-space-split tokens (empties
    * included — `split(text, ' ', -1)` semantics). */
  def simhash16Md5S(u: UTF8String): UTF8String = {
    val bytes = u.getBytes
    val votes = new Array[Int](16)
    val md = MD5_TL.get()
    val cur = new Array[Byte](16)
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        md.digest(cur, 0, 16)
        var j = 0
        while (j < 16) {
          val byteJ = cur(j >> 1)
          val nib = if ((j & 1) == 0) (byteJ >> 4) & 0xf else byteJ & 0xf
          if (nib >= 8) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Byte](16)
    var j = 0
    while (j < 16) {
      out(j) = if (votes(j) > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(out)
  }

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

case class FingerprintShingleMd5Expr(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "fingerprint_shingle_md5"
  override protected def target: String = "fingerprintShingleMd5"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.fingerprintShingleMd5(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinhashBandsExpr(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("band1", StringType, nullable = false),
    StructField("band2", StringType, nullable = false)))
  override def prettyName: String = "minhash_bands"
  override protected def target: String = "minhashBandsS"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.minhashBandsS(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Simhash16Md5Expr(child: Expression) extends StringKernelExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash16_md5"
  override protected def target: String = "simhash16Md5S"
  override protected def nullSafeEval(a: Any): Any =
    StringKernels.simhash16Md5S(a.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
