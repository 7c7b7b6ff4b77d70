package graft.process

import java.nio.charset.{Charset, CodingErrorAction}
import java.nio.ByteBuffer

/** Parser/extractor over the closed corpus HTML grammar (FIXTURES.md §1).
  *
  * Mirrors the reference processor chain set-at-a-time:
  *  - encoding detection: Content-Type header → `<meta charset>` in the first
  *    100 bytes → utf-8 fallback, with `gb2312 → gb18030` widening
  *    (reference pyspider-master/pyspider/libs/response.py:59-94 — the
  *    chardet statistical tail is deliberately NOT reproduced; SURVEY §7
  *    "hard parts": the corpus is synthesized so the deterministic chain is
  *    exact);
  *  - text decode with REPLACE error action (response.py:105-134);
  *  - link extraction + absolutization (spider/lxml_extractor.py:66-86,
  *    libs/response.py:147-167);
  *  - text/title extraction with HTML-unescape — the byte-identical
  *    inverse of CorpusGen's template (libs/utils.py:414-424 `etree2text`).
  *
  * These are pure functions invoked from `mapPartitions` on the fetch
  * output; no Catalyst Expression needed (SURVEY §2.8).
  */
object HtmlLite extends Serializable {

  private val MetaCharset =
    """(?i)<meta[^>]*charset\s*=\s*["']?([\w!#$%&+\-.:^`|~]+)""".r

  /** header charset → meta (first 100 bytes) → utf-8; gb2312 widened. */
  def detectEncoding(html: Array[Byte], headerCharset: Option[String]): String = {
    val raw = headerCharset
      .filter(c => c.nonEmpty && !c.equalsIgnoreCase("ISO-8859-1"))
      .orElse {
        val head = new String(html, 0, math.min(100, html.length), "ISO-8859-1")
        MetaCharset.findFirstMatchIn(head).map(_.group(1))
      }
      .getOrElse("utf-8")
    if (raw.equalsIgnoreCase("gb2312")) "gb18030" else raw
  }

  /** `content.decode(encoding, 'replace')` parity (response.py:105-134). */
  def decode(html: Array[Byte], encoding: String): String = {
    val cs = try Charset.forName(encoding) catch { case _: Exception => Charset.forName("utf-8") }
    cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
      .decode(ByteBuffer.wrap(html))
      .toString
  }

  def decodeAuto(html: Array[Byte], headerCharset: Option[String] = None): (String, String) = {
    val enc = detectEncoding(html, headerCharset)
    (decode(html, enc), enc)
  }

  def unescapeHtml(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")

  private val H1 = """(?s)<h1>(.*?)</h1>""".r
  private val P = """(?s)<p>(.*?)</p>""".r
  private val TitleTag = """(?s)<title>(.*?)</title>""".r
  private val Href = """(?i)<a\s[^>]*href\s*=\s*"([^"]*)"""".r

  /** Inverse of CorpusGen.renderHtml: `<h1>` + each `<p>` joined by '\n',
    * entities unescaped. MUST stay byte-identical to the `text` column. */
  def extractText(html: String): String = {
    val title = H1.findFirstMatchIn(html).map(m => unescapeHtml(m.group(1)))
    val paras = P.findAllMatchIn(html).map(m => unescapeHtml(m.group(1))).toSeq
    (title.toSeq ++ paras).mkString("\n")
  }

  def extractTitle(html: String): String =
    TitleTag.findFirstMatchIn(html).map(m => unescapeHtml(m.group(1))).getOrElse("")

  /** Extensions pyspider never follows (spider/lxml_extractor.py:16-33). */
  val IgnoredExtensions: Set[String] = Set(
    // images
    "mng", "pct", "bmp", "gif", "jpg", "jpeg", "png", "pst", "psp", "tif",
    "tiff", "ai", "drw", "dxf", "eps", "ps", "svg",
    // audio / video
    "mp3", "wma", "ogg", "wav", "ra", "aac", "mid", "au", "aiff",
    "3gp", "asf", "asx", "avi", "mov", "mp4", "mpg", "qt", "rm", "swf", "wmv", "m4a",
    // office
    "xls", "xlsx", "ppt", "pptx", "doc", "docx", "pps", "odt", "ods", "odg", "odp",
    // other
    "css", "pdf", "exe", "bin", "rss", "zip", "rar")

  private val Comment = """(?s)<!--.*?-->""".r

  /** lxml parity: comments are parse-tree noise, never DOM — links (or any
    * markup) inside `<!-- -->` are invisible to a static parse. This is what
    * makes the F1 js-render stub faithful: un-executed script DOM (comment-
    * wrapped) is NOT followed; `renderJs` unwraps it for js-typed fetches. */
  private def stripComments(html: String): String =
    if (html.indexOf("<!--") < 0) html else Comment.replaceAllIn(html, "")

  /** `//a/@href` over the closed grammar, absolutized against `baseUrl`,
    * javascript:/mailto: dropped, non-http(s) schemes dropped, ignored
    * extensions dropped, order-preserving dedup
    * (spider/lxml_extractor.py:66-123). */
  def extractLinks(html0: String, baseUrl: String): Seq[String] = {
    val html = stripComments(html0)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    Href.findAllMatchIn(html).foreach { m =>
      val raw = unescapeHtml(m.group(1)).trim
      if (raw.nonEmpty && !raw.startsWith("javascript:") && !raw.startsWith("mailto:") &&
          !raw.startsWith("#")) {
        val abs = graft.url.UrlCanon.urljoin(baseUrl, raw)
        val scheme = abs.takeWhile(_ != ':').toLowerCase
        val ext = {
          val path = graft.url.UrlCanon.urlparse(abs).path
          val base = path.substring(path.lastIndexOf('/') + 1)
          val dot = base.lastIndexOf('.')
          if (dot > 0) base.substring(dot + 1).toLowerCase else ""
        }
        if ((scheme == "http" || scheme == "https") && !IgnoredExtensions.contains(ext))
          seen += abs
      }
    }
    seen.toSeq
  }

  /** Minimal xpath-field extraction over the closed grammar — the forms used
    * in the reference's conf/config.ini xpath maps (SURVEY P8/E8):
    * `//title/text()`, `//h1/text()`, `//meta[@charset]/@charset`,
    * element-subtree text for `//p`. */
  private val MetaNameXpath =
    """^//meta\[@name=['"]([^'"]+)['"]\]/@content$""".r

  def xpathExtract(html: String, xpath: String): String = xpath match {
    case "//title/text()" => extractTitle(html)
    case "//h1/text()"    => H1.findFirstMatchIn(html).map(m => unescapeHtml(m.group(1))).getOrElse("")
    case "//p/text()"     => P.findAllMatchIn(html).map(m => unescapeHtml(m.group(1))).mkString("\n")
    case "//a/@href"      => Href.findAllMatchIn(html).map(_.group(1)).mkString("\n")
    case MetaNameXpath(nm) =>
      (s"""(?i)<meta\\s[^>]*name\\s*=\\s*["']?${java.util.regex.Pattern.quote(nm)}["']?[^>]*content\\s*=\\s*"([^"]*)"""").r
        .findFirstMatchIn(html).map(m => unescapeHtml(m.group(1))).getOrElse("")
    case _                => ""
  }

  private val MetaRefresh =
    """(?is)<meta\s[^>]*http-equiv\s*=\s*["']?refresh["']?[^>]*content\s*=\s*["']?\s*\d+\s*;\s*url\s*=\s*([^"'>\s]+)""".r

  /** F3 — redirect detection: the corpus models an HTTP 30x as a
    * meta-refresh stub page (a WARC snapshot has no transport-level Location
    * header). Returns the redirect target if the page is such a stub. */
  def redirectTarget(html: String): Option[String] = {
    val prefix = "<html><head><meta http-equiv="
    if (html.length < prefix.length ||
        !html.regionMatches(true, 0, prefix, 0, prefix.length)) None
    else MetaRefresh.findFirstMatchIn(html).map(m => unescapeHtml(m.group(1)).trim)
  }

  private val JsDom = """(?s)<!--graft-js-dom(.*?)-->""".r

  /** F1/S6 — deterministic stand-in for the reference's phantomjs render
    * (tornado_fetcher.py:455-480 routes fetch_type='js' to the phantomjs
    * proxy, which returns script-built DOM). The corpus models script-built
    * content as comment-wrapped blocks `<!--graft-js-dom ... -->`: a comment
    * is invisible to ANY static HTML parse (lxml ignores comments, and so
    * does `extractLinks`), exactly like un-executed script output; a js-typed
    * fetch "executes" by unwrapping the comment into live DOM. CLEARLY A
    * STUB: no real js engine runs in this container — re-verified r5
    * (`ScriptEngineManager` on this JDK 17 lists ZERO factories; Nashorn
    * was removed in JDK 15 and no Graal/Rhino jar ships in /opt/spark/jars
    * — unlike the r4 multimodal claim, which ImageIO falsified). */
  def renderJs(html: String): String =
    JsDom.replaceAllIn(html,
      m => scala.util.matching.Regex.quoteReplacement(m.group(1)))

  private val SetCookieMeta =
    """(?i)<meta\s[^>]*name\s*=\s*["']?graft-set-cookie["']?[^>]*content\s*=\s*"([^"]*)"""".r

  /** F4 — Set-Cookie headers of a WARC-style snapshot, modeled as meta tags
    * (a corpus page has no transport headers). Each content value is one
    * "k=v" pair; document order preserved. */
  def setCookies(html: String): Seq[String] =
    SetCookieMeta.findAllMatchIn(html).map(m => unescapeHtml(m.group(1))).toSeq

  /** F4 — cookie-jar merge, later-wins per key (the jar semantics tornado's
    * CookieTracker applies across a redirect chain). Parts are "k=v; k2=v2"
    * strings in arrival order; output is deterministic (sorted by key). */
  def mergeCookies(parts: Seq[String]): String = {
    val jar = scala.collection.mutable.LinkedHashMap.empty[String, String]
    parts.filter(p => p != null && p.nonEmpty).foreach(_.split(";").foreach { kv =>
      val eq = kv.indexOf('=')
      if (eq > 0) jar += kv.substring(0, eq).trim -> kv.substring(eq + 1).trim
    })
    if (jar.isEmpty) null
    else jar.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("; ")
  }

  /** robots.txt parse (new scope per north rule; reference has none —
    * SURVEY §2 preamble): returns Disallow path prefixes for `User-agent: *`. */
  def robotsDisallows(body: String): Seq[String] = {
    var inStar = false
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    body.split("\n").foreach { line0 =>
      val line = line0.takeWhile(_ != '#').trim
      val lower = line.toLowerCase
      if (lower.startsWith("user-agent:")) {
        inStar = line.substring("user-agent:".length).trim == "*"
      } else if (inStar && lower.startsWith("disallow:")) {
        val p = line.substring("disallow:".length).trim
        if (p.nonEmpty) out += p
      }
    }
    out.toSeq
  }
}
