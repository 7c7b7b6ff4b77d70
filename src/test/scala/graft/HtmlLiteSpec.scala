package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.process.HtmlLite

/** The byte-identical extraction invariant (north rule / SURVEY §7 hard
  * parts): extractText(renderHtml(text)) == text, over the closed grammar,
  * across charsets, for every page the generator can produce. */
class HtmlLiteSpec extends AnyFunSuite {

  test("render → extract round-trips byte-identically (utf-8 + gb18030)") {
    val lay = CorpusGen.layout(500, 9)
    (0L until lay.nPages by 7).foreach { i =>
      val p = CorpusGen.pageOf(42L, lay, i)
      val (decoded, enc) = HtmlLite.decodeAuto(p.html)
      assert(HtmlLite.extractText(decoded) === p.text, s"page $i enc=$enc url=${p.url}")
    }
  }

  test("encoding detection chain: header beats meta beats fallback") {
    val gbBytes = "<html><head><meta charset=\"gb18030\"/><title>中</title></head><body><h1>中</h1></body></html>"
      .getBytes("gb18030")
    assert(HtmlLite.detectEncoding(gbBytes, None) === "gb18030")
    assert(HtmlLite.detectEncoding(gbBytes, Some("utf-8")) === "utf-8")
    // ISO-8859-1 header is ignored (response.py:71)
    assert(HtmlLite.detectEncoding(gbBytes, Some("ISO-8859-1")) === "gb18030")
    // gb2312 widened to gb18030 (response.py:85-87)
    val gb2312 = "<html><head><meta charset=\"gb2312\"/></head></html>".getBytes("gb18030")
    assert(HtmlLite.detectEncoding(gb2312, None) === "gb18030")
    assert(HtmlLite.detectEncoding("<html></html>".getBytes, None) === "utf-8")
  }

  test("decode uses REPLACE on malformed input (response.py:105-134)") {
    val bad = Array[Byte]('a', 0xE4.toByte, 'b') // truncated utf-8 seq
    assert(HtmlLite.decode(bad, "utf-8") === "a�b")
  }

  test("link extraction: absolutize, drop javascript/mailto/fragment/ext, dedup") {
    val html =
      """<html><body>
        |<a href="http://a.example/x">1</a>
        |<a href="/abs">2</a>
        |<a href="rel/y">3</a>
        |<a href="javascript:void(0)">4</a>
        |<a href="mailto:x@y.z">5</a>
        |<a href="#frag">6</a>
        |<a href="http://a.example/x">dup</a>
        |<a href="http://a.example/img.jpg">img</a>
        |<a href="ftp://a.example/f">ftp</a>
        |</body></html>""".stripMargin
    val links = HtmlLite.extractLinks(html, "http://base.example/dir/page")
    assert(links === Seq(
      "http://a.example/x",
      "http://base.example/abs",
      "http://base.example/dir/rel/y"))
  }

  test("corpus pages link to the deterministic child set") {
    val lay = CorpusGen.layout(100, 4)
    val p = CorpusGen.pageOf(42L, lay, 1) // host 0, k=1
    val (decoded, _) = HtmlLite.decodeAuto(p.html)
    val links = HtmlLite.extractLinks(decoded, p.url)
    val expected = CorpusGen.childK(lay, 0, 1).map(c => CorpusGen.urlOf(0, c))
    assert(links === expected)
  }

  test("xpath-lite extraction forms (SURVEY P8/E8)") {
    val html = "<html><head><title>T &amp; U</title></head><body><h1>T &amp; U</h1><p>a</p><p>b</p></body></html>"
    assert(HtmlLite.xpathExtract(html, "//title/text()") === "T & U")
    assert(HtmlLite.xpathExtract(html, "//h1/text()") === "T & U")
    assert(HtmlLite.xpathExtract(html, "//p/text()") === "a\nb")
  }

  test("robots.txt parsing (north-rule scope)") {
    val body =
      """# comment
        |User-agent: googlebot
        |Disallow: /only-google/
        |User-agent: *
        |Disallow: /private/
        |Disallow: /tmp/
        |Allow: /private/ok
        |""".stripMargin
    assert(HtmlLite.robotsDisallows(body) === Seq("/private/", "/tmp/"))
    assert(HtmlLite.robotsDisallows("User-agent: *\nDisallow:\n") === Nil)
  }
}
