package graft.process

import java.util.regex.Pattern

import graft.model.Task

/** P8 — config-driven xpath extraction (reference
  * pyspider-master/pyspider/spider/base_spider.py:119-133: the project's
  * `xpath` config is {url_regex: {field_name: xpath}}; for a page whose url
  * matches a pattern, each field = etree2text(html.xpath(xpath)); +
  * libs/read_project_config.py:146-150 parses it from the INI's JSON value).
  *
  * Follow behavior mirrors the generated-spider defaults: links are followed
  * back into the same callback when `follow` is on, restricted to
  * `base_url_pattern` when configured (read_project_config.py:108-110,
  * spider/lxml_extractor.py link admission). */
class XpathSpider(
    name: String,
    xpathMap: Map[String, Map[String, String]],
    baseUrlPatterns: Seq[String] = Nil,
    follow: Boolean = true)
  extends Handler {

  // Pattern is Serializable — compiled once, ships to executors as-is
  private val compiled = xpathMap.toSeq.sortBy(_._1)
    .map { case (p, fs) => (Pattern.compile(p), fs.toSeq.sortBy(_._1)) }
  private val basePats = baseUrlPatterns.map(Pattern.compile)

  override def onPage(task: Task, page: FetchedPage): HandlerResult = {
    if (page.statusCode != 200)
      return HandlerResult(ok = false, exception = s"HTTP ${page.statusCode}")
    val follows =
      if (!follow) Nil
      else HtmlLite.extractLinks(page.text, page.url)
        .filter(l => basePats.isEmpty || basePats.exists(_.matcher(l).find()))
        .map(l => FollowSpec(l, callback = name))
    // fields from EVERY pattern matching this url, in deterministic order
    // (base_spider.py iterates the dict; later fields of the same name win)
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, String]
    compiled.foreach { case (pat, fs) =>
      if (pat.matcher(task.url).find())
        fs.foreach { case (f, xp) =>
          fields(f) = HtmlLite.xpathExtract(page.text, xp)
        }
    }
    val result =
      if (fields.isEmpty) null
      else (Seq("url" -> page.url) ++ fields.toSeq)
        .map { case (k, v) => s"${Handlers.jsonStr(k)}: ${Handlers.jsonStr(v)}" }
        .mkString("{", ", ", "}")
    HandlerResult(follows = follows, result = result)
  }
}
