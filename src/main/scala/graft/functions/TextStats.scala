package graft.functions

/** Per-document text-analysis primitives (builder prompt: language-ID,
  * quality scoring, token counting, fingerprinting) as pure Scala functions
  * usable both from the crawl handlers (per fetched page) and as UDFs.
  * The SQL-expressible twins live in graft.queries.TextQueries; these are
  * the single-pass implementations used in the hot path. */
object TextStats extends Serializable {

  final case class Stats(
      nChars: Int,
      nTokens: Int,
      stopRatio: Double,
      avgWordLen: Double,
      simhash16: Int,
      lang: String)

  private val StopEn = Set("the", "a", "and", "of", "is")
  private val StopEs = Set("el", "los", "es", "y")
  private val StopDe = Set("der", "die", "und", "ist")
  private val StopFr = Set("le", "les", "est", "et")

  @inline private def fnv1a(s: String): Int = fnv1aRange(s, 0, s.length)

  @inline private def fnv1aRange(s: String, from: Int, until: Int): Int = {
    var h = 0x811c9dc5
    var i = from
    while (i < until) { h ^= s.charAt(i); h *= 0x01000193; i += 1 }
    h
  }

  // java-regex \s exactly (the former split("\\s+") semantics)
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Stop-list membership of text[from, from+len) without materializing the
    * token (the former per-token Set[String] lookups allocated one String
    * per token — 10^4 per page). Returns the language index or -1; lists and
    * first-match precedence identical to StopEn/Es/De/Fr. */
  @inline private def stopLang(s: String, from: Int, len: Int): Int = {
    @inline def c(i: Int) = s.charAt(from + i)
    len match {
      case 1 =>
        if (c(0) == 'a') 0 else if (c(0) == 'y') 1 else -1
      case 2 =>
        val a = c(0); val b = c(1)
        if (a == 'o' && b == 'f') 0
        else if (a == 'i' && b == 's') 0
        else if (a == 'e' && b == 'l') 1
        else if (a == 'e' && b == 's') 1
        else if (a == 'l' && b == 'e') 3
        else if (a == 'e' && b == 't') 3
        else -1
      case 3 =>
        val a = c(0); val b = c(1); val d = c(2)
        if (a == 't' && b == 'h' && d == 'e') 0
        else if (a == 'a' && b == 'n' && d == 'd') 0
        else if (a == 'l' && b == 'o' && d == 's') 1
        else if (a == 'd' && b == 'e' && d == 'r') 2
        else if (a == 'd' && b == 'i' && d == 'e') 2
        else if (a == 'u' && b == 'n' && d == 'd') 2
        else if (a == 'i' && b == 's' && d == 't') 2
        else if (a == 'l' && b == 'e' && d == 's') 3
        else if (a == 'e' && b == 's' && d == 't') 3
        else -1
      case _ => -1
    }
  }

  /** One ALLOCATION-FREE pass over the token stream: counts, stopword votes,
    * simhash bits. (The former `split("\\s+")` materialized every token —
    * measured as a top allocation source of the per-page pipeline, which is
    * memory-bandwidth-bound at high core counts.) */
  def analyze(text: String): Stats = {
    val votes = new Array[Int](16)
    var nTok = 0; var letters = 0
    var en = 0; var es = 0; var de = 0; var fr = 0
    var cjk = false
    val n = text.length
    var i = 0
    while (i < n && !cjk) { // CJK probe (cheap early exit)
      val c = text.charAt(i)
      if (c >= '一' && c <= '鿿') cjk = true
      i += 1
    }
    i = 0
    while (i < n) {
      while (i < n && isWs(text.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isWs(text.charAt(i))) i += 1
        val len = i - start
        nTok += 1
        letters += len
        stopLang(text, start, len) match {
          case 0 => en += 1
          case 1 => es += 1
          case 2 => de += 1
          case 3 => fr += 1
          case _ =>
        }
        val h = fnv1aRange(text, start, i)
        var b = 0
        while (b < 16) {
          if (((h >>> b) & 1) == 1) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var sim = 0
    var b = 0
    while (b < 16) { if (votes(b) > 0) sim |= (1 << b); b += 1 }
    val lang =
      if (cjk) "zh"
      else if (en >= es && en >= de && en >= fr) "en"
      else if (es >= de && es >= fr) "es"
      else if (de >= fr) "de" else "fr"
    val stops = en + es + de + fr
    Stats(n, nTok,
      if (nTok == 0) 0.0 else stops.toDouble / nTok,
      if (nTok == 0) 0.0 else letters.toDouble / nTok,
      sim, lang)
  }

  /** Rolling-hash document fingerprint (winnowing-lite): min FNV over
    * 16-char windows stepping 8 — windows hashed in place, no substrings. */
  def fingerprint(text: String): Long = {
    if (text.length < 16) return fnv1a(text).toLong & 0xffffffffL
    var best = Long.MaxValue
    var i = 0
    while (i + 16 <= text.length) {
      val h = fnv1aRange(text, i, i + 16).toLong & 0xffffffffL
      if (h < best) best = h
      i += 8
    }
    best
  }
}
