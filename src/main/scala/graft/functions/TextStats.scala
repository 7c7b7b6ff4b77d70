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

  @inline private def fnv1a(s: String): Int = {
    var h = 0x811c9dc5
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x01000193; i += 1 }
    h
  }

  /** One pass over the token stream: counts, stopword votes, simhash bits. */
  def analyze(text: String): Stats = {
    val votes = new Array[Int](16)
    var nTok = 0; var letters = 0
    var en = 0; var es = 0; var de = 0; var fr = 0
    var cjk = false
    var i = 0
    val n = text.length
    while (i < n && !cjk) { // CJK probe (cheap early exit)
      val c = text.charAt(i)
      if (c >= '一' && c <= '鿿') cjk = true
      i += 1
    }
    text.split("\\s+").foreach { tok =>
      if (tok.nonEmpty) {
        nTok += 1
        letters += tok.length
        if (StopEn(tok)) en += 1
        else if (StopEs(tok)) es += 1
        else if (StopDe(tok)) de += 1
        else if (StopFr(tok)) fr += 1
        val h = fnv1a(tok)
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
    * 16-char windows stepping 8. */
  def fingerprint(text: String): Long = {
    if (text.length < 16) return fnv1a(text).toLong & 0xffffffffL
    var best = Long.MaxValue
    var i = 0
    while (i + 16 <= text.length) {
      val h = fnv1a(text.substring(i, i + 16)).toLong & 0xffffffffL
      if (h < best) best = h
      i += 8
    }
    best
  }
}
