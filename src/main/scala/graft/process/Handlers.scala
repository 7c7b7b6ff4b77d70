package graft.process

import graft.model._
import graft.url.UrlCanon

/** A fetched page as seen by a handler callback (reference Response object,
  * pyspider-master/pyspider/libs/response.py:196-208, trimmed to corpus-fetch
  * fields). */
case class FetchedPage(
    url: String, // response url — the FINAL url after redirects (F3)
    statusCode: Int,
    html: Array[Byte],
    encoding: String,
    text: String, // decoded content
    contentHash: String, // md5 of html bytes — stands in for ETag
    warcTs: Long,
    error: String,
    save: String = null, // control payload (P15 _on_message: {"from","msg"})
    ua: String = null, // F5: deterministic UA pick for the request
    // F4 — merged cookie jar after the fetch: task cookies + every
    // Set-Cookie along the redirect chain + the final page's Set-Cookie,
    // later-wins per key ("k=v; k2=v2", keys sorted)
    cookies: String = null) {

  /** P5 — lazy JSON view of the response body (reference `Response.json`,
    * pyspider-master/pyspider/libs/response.py:136-145: json.loads on the
    * decoded text, parsed once on first access). Jackson ships on the Spark
    * classpath. Throws on non-JSON bodies, like the reference. The field is
    * lazy and not a constructor param, so the Spark product encoder ignores
    * it — no schema or shuffle cost unless a handler actually calls it. */
  @transient lazy val json: com.fasterxml.jackson.databind.JsonNode =
    FetchedPage.jsonMapper.readTree(text)
}

object FetchedPage {
  private[process] val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper
}

/** What a callback asks the engine to do next — the typed restatement of
  * `self.crawl(...)` kwargs (reference spider/base_handler.py:259-361). */
case class FollowSpec(
    url: String,
    callback: String,
    priority: Int = 0,
    age: Long = -1L,
    exetimeDelay: Double = 0.0,
    itag: String = null,
    forceUpdate: Boolean = false,
    autoRecrawl: Boolean = false,
    save: String = null,
    fetchType: String = null,  // F1/S6: "js" routes through the render pass
    cookies: String = null)    // F4: request cookies for the follow

case class HandlerResult(
    follows: Seq[FollowSpec] = Nil,
    result: String = null, // JSON result row, like detail_page's return
    ok: Boolean = true,
    exception: String = null,
    // P15 send_message (base_handler.py:426-428): (target project, JSON msg);
    // the engine dispatches each to the target's `_on_message` callback in
    // the SAME processor pass (processor.py:183-199)
    messages: Seq[(String, String)] = Nil)

/** Compiled callback — the engine's replacement for projectdb's hot-loaded
  * python scripts (SURVEY §2.8: "no dynamic code loading"). */
trait Handler extends Serializable {
  def onPage(task: Task, page: FetchedPage): HandlerResult
}

object Handlers {

  def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Scala port of the canonical sample project
    * (reference tests/data_sample_handler.py:9-27):
    * on_start → index_page (follows all links) → detail_page ({url, title},
    * priority 2, age 10d on index follows). */
  val sample: Map[String, Handler] = Map(
    "on_start" -> new Handler {
      def onPage(task: Task, page: FetchedPage): HandlerResult =
        HandlerResult(follows =
          Seq(FollowSpec(task.url, callback = "index_page", forceUpdate = true)))
    },
    "index_page" -> new Handler {
      def onPage(task: Task, page: FetchedPage): HandlerResult = {
        if (page.statusCode != 200)
          return HandlerResult(ok = false, exception = s"HTTP ${page.statusCode}")
        val links = HtmlLite.extractLinks(page.text, page.url)
        HandlerResult(follows =
          links.map(u => FollowSpec(u, callback = "detail_page", age = 10 * 24 * 3600L)))
      }
    },
    "detail_page" -> new Handler {
      def onPage(task: Task, page: FetchedPage): HandlerResult = {
        if (page.statusCode != 200)
          return HandlerResult(ok = false, exception = s"HTTP ${page.statusCode}")
        val title = HtmlLite.extractTitle(page.text)
        HandlerResult(result =
          s"""{"url": ${jsonStr(page.url)}, "title": ${jsonStr(title)}}""")
      }
    })

  /** BFS crawler: every page's links are followed with the same callback and
    * every page emits the training-data record a web-scale pipeline would
    * keep — url, title, extracted text stats (tokens, quality ratios,
    * lang-ID, simhash, fingerprint). This is the whole-graph workload used
    * by the BFS-reachability oracle and the bench. */
  val bfs: Map[String, Handler] = Map(
    "bfs_page" -> new Handler {
      def onPage(task: Task, page: FetchedPage): HandlerResult = {
        if (page.statusCode != 200)
          return HandlerResult(ok = false, exception = s"HTTP ${page.statusCode}")
        val links = HtmlLite.extractLinks(page.text, page.url)
        val title = HtmlLite.extractTitle(page.text)
        val text = HtmlLite.extractText(page.text)
        val st = graft.functions.TextStats.analyze(text)
        val fp = graft.functions.TextStats.fingerprint(text)
        HandlerResult(
          follows = links.map(u => FollowSpec(u, callback = "bfs_page")),
          result = s"""{"url": ${jsonStr(page.url)}, "title": ${jsonStr(title)},""" +
            s""" "n_chars": ${st.nChars}, "n_tokens": ${st.nTokens},""" +
            f""" "stop_ratio": ${st.stopRatio}%.6f, "avg_word_len": ${st.avgWordLen}%.4f,""" +
            s""" "lang": "${st.lang}", "simhash16": ${st.simhash16}, "fingerprint": $fp}""")
      }
    })

  /** P5 — API-crawling handlers over `page.json` (the reference's
    * `mySpider/` pattern, e.g. mySpider/toutiao feed spiders: parse a JSON
    * listing response, follow the item urls, emit item fields). */
  val jsonApi: Map[String, Handler] = Map(
    "json_list" -> new Handler {
      def onPage(task: Task, page: FetchedPage): HandlerResult = {
        if (page.statusCode != 200)
          return HandlerResult(ok = false, exception = s"HTTP ${page.statusCode}")
        val items = page.json.path("items")
        val follows = (0 until items.size()).map(i =>
          FollowSpec(items.get(i).path("url").asText(), callback = "json_item"))
        HandlerResult(follows = follows)
      }
    },
    "json_item" -> new Handler {
      def onPage(task: Task, page: FetchedPage): HandlerResult = {
        if (page.statusCode != 200)
          return HandlerResult(ok = false, exception = s"HTTP ${page.statusCode}")
        val j = page.json
        HandlerResult(result =
          s"""{"url": ${jsonStr(page.url)}, "id": ${j.path("id").asLong()},""" +
            s""" "name": ${jsonStr(j.path("name").asText())}}""")
      }
    })

  val registry: Map[String, Handler] = sample ++ bfs ++ jsonApi

  /** The crawl-API row constructor (reference base_handler.py:259-361 P10):
    * canonicalize, derive taskid/host, inherit project + depth+1, depth
    * guard applied later (P11). Emits the flat narrow FollowLite — the full
    * Task is built columnar AFTER the candidate merge (Frontier.liftFollows);
    * per-link nested-Task encoding was the dominant cost of a BFS round. */
  def mkFollow(parent: Task, f: FollowSpec, now: Double, project: String): FollowLite = {
    val canon = UrlCanon.canonicalize(f.url)
    FollowLite(
      taskid = UrlCanon.taskId(canon),
      project = project,
      url = canon,
      host = UrlCanon.mainDomain(canon),
      depth = if (parent == null) 0 else parent.depth + 1,
      priority = f.priority,
      exetime = if (f.exetimeDelay > 0) now + f.exetimeDelay else 0.0,
      age = f.age,
      itag = f.itag,
      force_update = f.forceUpdate,
      auto_recrawl = f.autoRecrawl,
      save = f.save,
      callback = f.callback,
      fetch_type = f.fetchType,
      cookies = f.cookies)
  }

  /** Full-Task twin of mkFollow (control paths that stay Task-typed). */
  def mkTask(parent: Task, f: FollowSpec, now: Double, project: String): Task = {
    val l = mkFollow(parent, f, now, project)
    Task(
      taskid = l.taskid, project = l.project, url = l.url,
      status = Status.Active, host = l.host, depth = l.depth,
      schedule = Schedule(priority = l.priority, exetime = l.exetime,
        age = l.age, itag = l.itag, force_update = l.force_update,
        auto_recrawl = l.auto_recrawl),
      fetch = FetchOpts(save = l.save, fetch_type = l.fetch_type,
        cookies = l.cookies),
      process = ProcessOpts(callback = l.callback),
      updatetime = now)
  }
}
