package graft.url

/** E11 — `curl` command line → crawl arguments (reference:
  * pyspider/libs/url.py:161-213 `curl_to_arguments`, used by the webui to
  * prefill a crawl config from a browser-copied "Copy as cURL" string).
  *
  * Driver-side dev convenience, not a distributed operator: one string in,
  * one argument bundle out. Tokenization follows POSIX shell word-splitting
  * (the reference delegates to `shlex.split`): whitespace separates words;
  * single quotes are literal; double quotes honor backslash escapes of
  * `"` `\` `$` <backtick>; a bare backslash escapes the next character.
  *
  * Option handling is byte-parity with the reference loop:
  * the first word is the command; bare words are URLs; `--compressed` sets
  * use_gzip; `-H/--header` accumulates headers (split on first ':');
  * `-d/--data` sets data; `--data-binary` sets data with a leading '$'
  * stripped; `-X/--request` sets method; anything else raises.
  */
object CurlParse {

  final case class CurlArguments(
      urls: Seq[String],
      headers: Map[String, String] = Map.empty,
      data: Option[String] = None,
      method: Option[String] = None,
      useGzip: Boolean = false) {
    /** The `Cookie:` header, as FetchOpts/FollowSpec carry cookies. */
    def cookies: Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase("Cookie") => v }
    /** Crawl-ready fetch options for the first URL (method + cookie jar). */
    def fetchOpts: graft.model.FetchOpts = graft.model.FetchOpts(
      method = method.getOrElse(if (data.isDefined) "POST" else "GET"),
      cookies = cookies.orNull)
  }

  /** POSIX-ish word split (shlex.split semantics for the subset curl lines
    * use). Throws IllegalArgumentException on an unterminated quote. */
  def shellSplit(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var started = false // distinguishes `''` (empty word) from no word
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case c if c == ' ' || c == '\t' || c == '\n' || c == '\r' =>
          if (started) { out += cur.result(); cur.clear(); started = false }
          i += 1
        case '\'' =>
          started = true
          val end = s.indexOf('\'', i + 1)
          if (end < 0) throw new IllegalArgumentException("No closing quotation")
          cur.append(s.substring(i + 1, end)); i = end + 1
        case '"' =>
          started = true
          i += 1
          var closed = false
          while (i < s.length && !closed) {
            val c = s.charAt(i)
            if (c == '"') { closed = true; i += 1 }
            else if (c == '\\' && i + 1 < s.length &&
              "\"\\$`".indexOf(s.charAt(i + 1)) >= 0) {
              cur.append(s.charAt(i + 1)); i += 2
            } else { cur.append(c); i += 1 }
          }
          if (!closed) throw new IllegalArgumentException("No closing quotation")
        case '\\' if i + 1 < s.length =>
          started = true; cur.append(s.charAt(i + 1)); i += 2
        case c =>
          started = true; cur.append(c); i += 1
      }
    }
    if (started) out += cur.result()
    out.result()
  }

  /** Reference `curl_to_arguments` (url.py:161-213). Throws
    * IllegalArgumentException where the reference raises TypeError. */
  def toArguments(curl: String): CurlArguments = {
    var command: Option[String] = None
    var currentOpt: Option[String] = None
    val urls = Seq.newBuilder[String]
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var data: Option[String] = None
    var method: Option[String] = None
    var useGzip = false

    for (part <- shellSplit(curl)) {
      if (command.isEmpty) command = Some(part)
      else if (!part.startsWith("-") && currentOpt.isEmpty) urls += part
      else if (currentOpt.isEmpty && part.startsWith("-")) {
        if (part == "--compressed") useGzip = true
        else currentOpt = Some(part)
      } else currentOpt match {
        case None =>
          throw new IllegalArgumentException(s"Unknow curl argument: $part")
        case Some(opt) =>
          opt match {
            case "-H" | "--header" =>
              // reference: split on first ':'; a value-less header keeps the
              // PREVIOUS key/value pair's locals (a quirk we do not copy —
              // we require the colon, matching every real Copy-as-cURL line)
              part.split(":", 2) match {
                case Array(k, v) => headers(k.trim) = v.trim
                case _ => headers(part.trim) = ""
              }
            case "-d" | "--data" => data = Some(part)
            case "--data-binary" =>
              data = Some(if (part.startsWith("$")) part.substring(1) else part)
            case "-X" | "--request" => method = Some(part)
            case other =>
              throw new IllegalArgumentException(s"Unknow curl option: $other")
          }
          currentOpt = None
      }
    }
    val u = urls.result()
    if (u.isEmpty) throw new IllegalArgumentException("curl: no URL specified!")
    currentOpt.foreach(o =>
      throw new IllegalArgumentException(s"Unknow curl option: $o"))
    CurlArguments(u, headers.toMap, data, method, useGzip)
  }
}
