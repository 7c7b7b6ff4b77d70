package graft.url

import java.nio.charset.StandardCharsets

/** URL canonicalization with byte-parity to the reference's
  * `_build_url` / `quote_chinese` chain
  * (reference: pyspider-master/pyspider/libs/url.py:109-160) and the
  * registrable-domain fallback heuristic
  * (pyspider-master/pyspider/libs/get_domain.py:22-30).
  *
  * The reference operates on Python-2 byte strings; we reproduce that by
  * working on the UTF-8 bytes of the input, treating each byte as a
  * latin-1 char, so percent-encoding decisions are made per byte exactly
  * like CPython's `urllib.quote`/`unquote`/`parse_qsl`/`urlencode`.
  *
  * All functions are pure; `canonicalize` is the hot path used to derive
  * `taskid = md5(canonical_url)` (reference: pyspider/libs/utils.py:20,
  * pyspider/spider/base_handler.py:363-365).
  */
object UrlCanon {

  private val HexUpper = "0123456789ABCDEF"

  /** urllib._ALWAYS_SAFE minus nothing: letters digits `_.-` (quote_plus safe set). */
  @inline private def alwaysSafe(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '-'

  /** `_safe_chars` of reference url.py:19-24: ALWAYS_SAFE + % + reserved + unreserved marks. */
  private val PathSafe: Set[Char] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9')).toSet ++
      "_.-".toSet ++ "%".toSet ++ ";/?:@&=+$|,#".toSet ++ "-_.!~*'()".toSet

  /** Bytes of `s` (a UTF-8 Scala string) viewed as one latin-1 char per byte. */
  private def toByteString(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), StandardCharsets.ISO_8859_1)

  // ---------------------------------------------------------------------
  // urlparse (CPython 2.7 urlparse semantics, subset used by _build_url)
  // ---------------------------------------------------------------------

  final case class Parsed(scheme: String, netloc: String, path: String,
                          params: String, query: String, fragment: String) {
    def hostname: String = {
      // CPython: netloc minus userinfo, minus port, lowercased
      val afterAt = netloc.lastIndexOf('@') match {
        case -1 => netloc
        case i  => netloc.substring(i + 1)
      }
      val noPort = {
        val ci = afterAt.lastIndexOf(':')
        // ipv6 [::1]:80 — not in scope for the corpus; handle bracket form anyway
        if (afterAt.startsWith("[")) afterAt.takeWhile(_ != ']').stripPrefix("[")
        else if (ci >= 0 && afterAt.substring(ci + 1).forall(_.isDigit)) afterAt.substring(0, ci)
        else afterAt
      }
      noPort.toLowerCase
    }
  }

  private def isSchemeChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '+' || c == '-' || c == '.'

  /** CPython 2.7 `urlparse.urlsplit` + params split. */
  def urlparse(urlIn: String): Parsed = {
    var url = urlIn
    var scheme = ""
    val ci = url.indexOf(':')
    if (ci > 0) {
      val head = url.substring(0, ci)
      if (head.forall(isSchemeChar) && head.head.isLetter) {
        val rest = url.substring(ci + 1)
        // "make sure url is not actually a port number"
        if (rest.isEmpty || rest.exists(c => !c.isDigit)) {
          scheme = head.toLowerCase
          url = rest
        }
      }
    }
    var netloc = ""
    if (url.startsWith("//")) {
      var i = 2
      while (i < url.length && url(i) != '/' && url(i) != '?' && url(i) != '#') i += 1
      netloc = url.substring(2, i)
      url = url.substring(i)
    }
    var fragment = ""
    val fi = url.indexOf('#')
    if (fi >= 0) { fragment = url.substring(fi + 1); url = url.substring(0, fi) }
    var query = ""
    val qi = url.indexOf('?')
    if (qi >= 0) { query = url.substring(qi + 1); url = url.substring(0, qi) }
    // params: find ';' in the last path segment only (urlparse._splitparams)
    var params = ""
    val si = {
      val slash = url.lastIndexOf('/')
      if (slash >= 0) url.indexOf(';', slash) else url.indexOf(';')
    }
    if (si >= 0) { params = url.substring(si + 1); url = url.substring(0, si) }
    Parsed(scheme, netloc, url, params, query, fragment)
  }

  // ---------------------------------------------------------------------
  // quote / unquote / parse_qsl / urlencode (CPython byte semantics)
  // ---------------------------------------------------------------------

  /** CPython `urllib.unquote`: decode every %XX (hex) to its byte. */
  def unquote(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '%' && i + 2 < s.length && isHex(s(i + 1)) && isHex(s(i + 2))) {
        sb.append(((hexVal(s(i + 1)) << 4) | hexVal(s(i + 2))).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  @inline private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10

  @inline private def pct(sb: StringBuilder, c: Char): Unit = {
    sb.append('%').append(HexUpper((c >> 4) & 0xf)).append(HexUpper(c & 0xf))
  }

  /** CPython `urllib.quote(s, safe)` over byte-chars. */
  def quote(s: String, safe: Char => Boolean): String = {
    val sb = new StringBuilder(s.length)
    s.foreach { c => if (alwaysSafe(c) || safe(c)) sb.append(c) else pct(sb, c) }
    sb.toString
  }

  /** CPython `urllib.quote_plus(s, '')`: space → '+', everything unsafe pct-encoded. */
  def quotePlus(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach { c =>
      if (c == ' ') sb.append('+')
      else if (alwaysSafe(c)) sb.append(c)
      else pct(sb, c)
    }
    sb.toString
  }

  /** CPython `urlparse.parse_qsl(qs, keep_blank_values=True)`. */
  def parseQsl(qs: String): Seq[(String, String)] = {
    val pairs = qs.split("&", -1).flatMap(_.split(";", -1))
    pairs.iterator.filter(_.nonEmpty).map { nv =>
      val eq = nv.indexOf('=')
      val (n, v) = if (eq < 0) (nv, "") else (nv.substring(0, eq), nv.substring(eq + 1))
      (unquote(n.replace('+', ' ')), unquote(v.replace('+', ' ')))
    }.toSeq
  }

  /** CPython `urllib.urlencode(pairs)`. */
  def urlencode(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) => quotePlus(k) + "=" + quotePlus(v) }.mkString("&")

  /** reference url.py:139-143 `_unquotepath`: protect %2F/%3F, then unquote. */
  def unquotePath(path: String): String = {
    var p = path
    for (r <- Seq("2f", "2F", "3f", "3F"))
      p = p.replace("%" + r, "%25" + r.toUpperCase)
    unquote(p)
  }

  /** reference url.py:146-149 `safe_url_string`. */
  def safeUrlString(s: String): String = quote(s, PathSafe.contains)

  /** Python str.encode('idna') on a netloc: ASCII labels pass through
    * unchanged (CPython's idna codec does not lowercase pure-ASCII labels).
    * Non-ASCII labels: CPython 2 would raise here (byte-str → ascii decode
    * fails, _build_url has no try) — we diverge usefully and punycode them
    * (the label arrives as one latin-1 char per UTF-8 byte, so reassemble
    * the UTF-8 first). Documented divergence, SURVEY §2.7 E2. */
  def idnaEncode(netloc: String): String = {
    if (netloc.isEmpty) return netloc
    netloc.split("\\.", -1).map { label =>
      if (label.forall(_ < 128)) label
      else {
        val utf8 = new String(label.getBytes(StandardCharsets.ISO_8859_1),
          StandardCharsets.UTF_8)
        java.net.IDN.toASCII(utf8).toLowerCase
      }
    }.mkString(".")
  }

  // ---------------------------------------------------------------------
  // the public canonicalization chain
  // ---------------------------------------------------------------------

  /** reference url.py:109-137 `_build_url(url, None)` (no extra params). */
  def buildUrl(urlUtf8: String): String = {
    val u = urlparse(toByteString(urlUtf8))
    val netloc = idnaEncode(u.netloc)
    val query = urlencode(parseQsl(u.query))
    val path0 = safeUrlString(unquotePath(u.path))
    val path = if (path0.isEmpty) "/" else path0
    urlunparse(u.scheme, netloc, path, u.params, query, fragment = "")
  }

  /** CPython `urlparse.urlunparse`. */
  def urlunparse(scheme: String, netloc: String, path0: String,
                 params: String, query: String, fragment: String): String = {
    var url = if (params.nonEmpty) path0 + ";" + params else path0
    if (netloc.nonEmpty || url.startsWith("//")) {
      if (url.nonEmpty && !url.startsWith("/")) url = "/" + url
      url = "//" + netloc + url
    }
    if (scheme.nonEmpty) url = scheme + ":" + url
    if (query.nonEmpty) url = url + "?" + query
    if (fragment.nonEmpty) url = url + "#" + fragment
    url
  }

  /** reference url.py:152-160 `quote_chinese`: pct-encode bytes >= 0x80 only. */
  def quoteChinese(urlUtf8: String): String = {
    val bs = toByteString(urlUtf8)
    val sb = new StringBuilder(bs.length)
    bs.foreach { c => if (c < 128) sb.append(c) else pct(sb, c) }
    sb.toString
  }

  /** The full chain applied by the crawl API
    * (reference base_handler.py:284: `quote_chinese(_build_url(url.strip(), ...))`). */
  def canonicalize(url: String): String = quoteChinese(buildUrl(url.trim))

  /** reference url.py:89-97 `add_http_if_no_scheme`. */
  def addHttpIfNoScheme(url: String): String = {
    if (url.startsWith("//")) "http:" + url
    else {
      val p = urlparse(url)
      if (p.scheme.isEmpty || p.netloc.isEmpty) "http://" + url else url
    }
  }

  /** Registrable main domain — the reproducible fallback heuristic of
    * reference get_domain.py:22-30 (the production pyurl lib is proprietary
    * and absent from the repo; SURVEY §2.7 E4 documents the divergence):
    * last 2 labels, or last 3 when the second-to-last label is < 4 chars. */
  def mainDomain(urlOrHost: String): String = {
    val url = if (!urlOrHost.contains("://")) "http://" + urlOrHost else urlOrHost
    val host = urlparse(url).hostname
    if (host.isEmpty) return ""
    val labels = host.split("\\.", -1)
    if (labels.length < 2) return host
    val take = if (labels(labels.length - 2).length < 4) 3 else 2
    labels.takeRight(math.min(take, labels.length)).mkString(".")
  }

  /** md5 hex of the UTF-8 bytes — reference libs/utils.py:20 `md5string`. */
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach { b => sb.append(HexUpper((b >> 4) & 0xf).toLower).append(HexUpper(b & 0xf).toLower) }
    sb.toString
  }

  /** taskid of an (already canonical) url — base_handler.py:363-365. */
  def taskId(canonicalUrl: String): String = md5Hex(canonicalUrl)

  /** reference url.py:76-80. */
  def urlIsFromAnyDomain(url: String, domains: Seq[String]): Boolean = {
    val host = urlparse(url).netloc.toLowerCase
    host.nonEmpty && domains.map(_.toLowerCase).exists(d => host == d || host.endsWith("." + d))
  }

  /** reference url.py:83-86 (posixpath.splitext on the path). */
  def urlHasAnyExtension(url: String, extensions: Set[String]): Boolean = {
    val path = urlparse(url).path
    val base = path.substring(path.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    val ext = if (dot > 0) base.substring(dot).toLowerCase else ""
    extensions.contains(ext)
  }

  /** RFC-3986 reference resolution (CPython urljoin-compatible for the
    * closed corpus grammar): absolutize `rel` against `base`. */
  def urljoin(base: String, rel: String): String = {
    if (rel.isEmpty) return base
    val r = urlparse(rel)
    if (r.scheme.nonEmpty) return rel
    val b = urlparse(base)
    if (rel.startsWith("//")) return b.scheme + ":" + rel
    val (path, query) =
      if (r.path.isEmpty && r.query.isEmpty) (b.path, b.query)
      else if (r.path.isEmpty) (b.path, r.query)
      else if (r.path.startsWith("/")) (removeDotSegments(r.path), r.query)
      else {
        val merged =
          if (b.netloc.nonEmpty && b.path.isEmpty) "/" + r.path
          else b.path.substring(0, b.path.lastIndexOf('/') + 1) + r.path
        (removeDotSegments(merged), r.query)
      }
    urlunparse(b.scheme, b.netloc, path, r.params, query,
      fragment = "") // crawl engine always drops fragments
  }

  private def removeDotSegments(path: String): String = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val segs = path.split("/", -1)
    val leading = path.startsWith("/")
    segs.foreach {
      case "."  => ()
      case ".." => if (out.nonEmpty && out.last.nonEmpty) out.remove(out.length - 1)
      case s    => out += s
    }
    val trailingDot = path.endsWith("/.") || path.endsWith("/..")
    val joined = out.mkString("/")
    val res = (if (leading && !joined.startsWith("/")) "/" + joined else joined) +
      (if (trailingDot && !joined.endsWith("/")) "/" else "")
    res.replaceAll("/{2,}", "/") match { case "" => "/"; case p => p }
  }
}
