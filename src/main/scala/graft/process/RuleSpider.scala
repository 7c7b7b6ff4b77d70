package graft.process

import graft.model.Task
import graft.url.UrlCanon

/** P16 — rule-based spider (reference
  * pyspider-master/pyspider/spider/base_rule_spider.py:10-73 +
  * spider/rule.py:9-30): CrawlSpider-style declarative follow/parse rules
  * instead of hand-written callbacks. A page's links are followed when ANY
  * rule with follow semantics admits them; the page itself is parsed by the
  * FIRST rule whose link extractor admits its url (start_rule), falling back
  * to `parse_start_url` (default: empty result, base_rule_spider.py:24-25).
  */
case class LinkRule(
    allow: String = null, // regex the url must match (null = all)
    deny: String = null, // regex the url must NOT match
    allowDomains: Seq[String] = Nil, // main-domain allow list
    denyDomains: Seq[String] = Nil,
    emit: String = null, // result emitter name (reference rule.callback)
    follow: Option[Boolean] = None) { // default: follow iff no emitter (rule.py:17-20)
  def follows: Boolean = follow.getOrElse(emit == null)
}

/** One compiled rule spider, registered in the engine's callback registry
  * under `name`; all followed links point back at it (the reference's
  * `_response_downloaded` indirection collapses — dispatch is re-matching
  * the rules on the response url). `emitters` maps rule.emit names to result
  * constructors; absent/unnamed rules emit nothing. */
class RuleSpider(
    name: String,
    rules: Seq[LinkRule],
    emitters: Map[String, (Task, FetchedPage) => String] = RuleSpider.defaultEmitters)
  extends Handler {

  // compiled once; java.util.regex.Pattern is Serializable so the compiled
  // spider ships to executors as-is
  private val compiled = rules.map { r =>
    (r, Option(r.allow).map(java.util.regex.Pattern.compile),
      Option(r.deny).map(java.util.regex.Pattern.compile))
  }

  private def admitted(rule: (LinkRule, Option[java.util.regex.Pattern],
    Option[java.util.regex.Pattern]), url: String, host: String): Boolean = {
    val (r, allowP, denyP) = rule
    allowP.forall(_.matcher(url).find()) &&
      denyP.forall(!_.matcher(url).find()) &&
      (r.allowDomains.isEmpty || r.allowDomains.contains(host)) &&
      !r.denyDomains.contains(host)
  }

  override def onPage(task: Task, page: FetchedPage): HandlerResult = {
    if (page.statusCode != 200)
      return HandlerResult(ok = false, exception = s"HTTP ${page.statusCode}")
    // follow: links admitted by any following rule (base_rule_spider.py:27-37)
    val links = HtmlLite.extractLinks(page.text, page.url)
    val follows = links.flatMap { l =>
      val host = UrlCanon.mainDomain(l)
      if (compiled.exists(c => c._1.follows && admitted(c, l, host)))
        Some(FollowSpec(l, callback = name))
      else None
    }
    // parse: first rule with an emitter that admits THIS page (start_rule)
    val result = compiled
      .find(c => c._1.emit != null && admitted(c, task.url, task.host))
      .flatMap(c => emitters.get(c._1.emit).map(_(task, page)))
      .orNull
    HandlerResult(follows = follows, result = result)
  }
}

object RuleSpider {
  /** Stock emitters: `detail` = the sample project's {url, title} record. */
  val defaultEmitters: Map[String, (Task, FetchedPage) => String] = Map(
    "detail" -> ((task: Task, page: FetchedPage) => {
      val title = HtmlLite.extractTitle(page.text)
      s"""{"url": ${Handlers.jsonStr(page.url)}, "title": ${Handlers.jsonStr(title)}}"""
    }))
}
