package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.config.ProjectIni
import graft.corpus.CorpusGen
import graft.engine.{CrawlEngine, EngineConfig, ProjectSpec}
import graft.model.{Page, ProjectConfig, Status, Task}
import graft.process.{FetchedPage, Handler, HandlerResult, FollowSpec, RuleSpider, LinkRule}

/** Round-2 engine wiring laws: multi-project scheduling, the config knobs
  * (respectRobots / inqueueLimit / allowDomains / denyPattern / saveHtml),
  * O14 restart-by-status, P15 inter-project messages, F3 engine-path
  * redirects, P16 rule spider, P17 INI parsing, and the same-round
  * rediscovery seen-set fix. */
class EngineKnobsSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  private def page(url: String, links: Seq[String], title: String): Page = {
    val text = s"$title\nbody words here."
    Page(url, new Timestamp(1000L), CorpusGen.renderHtml(text, links, "utf-8"),
      text, "en")
  }
  private def redirect(url: String, target: String): Page =
    Page(url, new Timestamp(1000L),
      s"""<html><head><meta http-equiv="refresh" content="0; url=$target"/></head></html>"""
        .getBytes("utf-8"), "", "en")
  private def robots(host: String): Page = {
    val body = "User-agent: *\nDisallow: /private/\n"
    Page(s"http://$host/robots.txt", new Timestamp(0L),
      body.getBytes("utf-8"), body, "en")
  }

  private def mkEngine(pages: Seq[Page], specs: Seq[ProjectSpec],
                       callbacks: Map[String, Handler] = process.Handlers.registry,
                       dir: String = null): CrawlEngine = {
    val ckpt = if (dir != null) dir
      else Files.createTempDirectory("graft_knobs").toString
    new CrawlEngine(spark.createDataset(pages), EngineConfig(
      projects = specs, callbacks = callbacks,
      roundDt = 30.0, checkpointDir = ckpt))
  }

  private def unbounded(name: String) = ProjectConfig(name,
    rate = 1e9, burst = 1e9, hostRate = 1e9, hostBurst = 1e9,
    loopLimit = Int.MaxValue / 2, depthLimit = -1)

  test("multi-project: per-project rate budgets and isolated seen-sets") {
    // a0 fans out to a1,a2,a3; two projects crawl the SAME urls
    val urls = (0 to 3).map(i => s"http://a.example/p/$i")
    val pages = Seq(page(urls.head, urls.tail, "t0")) ++
      urls.tail.map(u => page(u, Nil, "t")) :+ robots("a.example")
    // slow: 1 task/round (rate*dt = 1, burst 1); fast: unbounded
    val slow = ProjectSpec(unbounded("slow").copy(rate = 1.0 / 30.0, burst = 1.0),
      seeds = Seq(urls.head))
    val fast = ProjectSpec(unbounded("fast"), seeds = Seq(urls.head))
    val eng = mkEngine(pages, Seq(slow, fast))
    val stats = eng.crawl(Nil, maxRounds = 12)
    val arch = frontier.SeenSet.latest(
      eng.store.readArchive(eng.store.lastCommitted().get)).collect()
    val byProj = arch.groupBy(_.project)
    // both projects see the full closure, each under its own budget
    assert(byProj("slow").count(_.status == Status.Success) === 4)
    assert(byProj("fast").count(_.status == Status.Success) === 4)
    val m = eng.metricsDF()
    val slowMax = m.filter(col("project") === "slow")
      .agg(max("processed")).head().getLong(0)
    val fastMax = m.filter(col("project") === "fast")
      .agg(max("processed")).head().getLong(0)
    assert(slowMax <= 1, s"slow project exceeded its 1/round budget: $slowMax")
    assert(fastMax === 3, s"fast project was throttled: $fastMax")
    assert(stats.size >= 4) // slow needs 4 selection rounds
  }

  test("per-project depth limit bounds one project, not the other") {
    val urls = (0 to 4).map(i => s"http://a.example/p/$i")
    val pages = urls.zipWithIndex.map { case (u, i) =>
      page(u, if (i < 4) Seq(urls(i + 1)) else Nil, s"t$i")
    } :+ robots("a.example")
    val shallow = ProjectSpec(unbounded("shallow").copy(depthLimit = 2),
      seeds = Seq(urls.head))
    val deep = ProjectSpec(unbounded("deep"), seeds = Seq(urls.head))
    val eng = mkEngine(pages, Seq(shallow, deep))
    eng.crawl(Nil, maxRounds = 10)
    val arch = frontier.SeenSet.latest(
      eng.store.readArchive(eng.store.lastCommitted().get)).collect()
    assert(arch.filter(_.project == "shallow").map(_.depth).max === 2)
    assert(arch.filter(_.project == "deep").map(_.depth).max === 4)
  }

  test("respectRobots=false actually disables the robots gate") {
    val u0 = "http://a.example/p/0"; val priv = "http://a.example/private/p/1"
    val pages = Seq(page(u0, Seq(priv), "t0"), page(priv, Nil, "secret"),
      robots("a.example"))
    val gated = mkEngine(pages,
      Seq(ProjectSpec(unbounded("gated"), seeds = Seq(u0))))
    gated.crawl(Nil, maxRounds = 6)
    val open = mkEngine(pages,
      Seq(ProjectSpec(unbounded("open").copy(respectRobots = false),
        seeds = Seq(u0))))
    open.crawl(Nil, maxRounds = 6)
    def fetchedUrls(e: CrawlEngine) = frontier.SeenSet.latest(
        e.store.readArchive(e.store.lastCommitted().get))
      .filter(_.status == Status.Success).collect().map(_.url).toSet
    assert(!fetchedUrls(gated).contains(priv))
    assert(fetchedUrls(open).contains(priv))
  }

  test("P7 allowDomains / denyPattern filter follows in the engine loop") {
    val a0 = "http://a.example/p/0"
    val aDeny = "http://a.example/skipme/p/1"
    val b0 = "http://b.example/p/0"
    val pages = Seq(
      page(a0, Seq(aDeny, b0), "t0"), page(aDeny, Nil, "t1"),
      page(b0, Nil, "t2"), robots("a.example"), robots("b.example"))
    val eng = mkEngine(pages, Seq(ProjectSpec(
      unbounded("p").copy(allowDomains = Seq("a.example"),
        denyPattern = "/skipme/"),
      seeds = Seq(a0))))
    eng.crawl(Nil, maxRounds = 6)
    val urls = frontier.SeenSet.latest(
      eng.store.readArchive(eng.store.lastCommitted().get)).collect().map(_.url).toSet
    assert(urls === Set(a0)) // b.example (domain) and /skipme/ (deny) filtered
  }

  test("O9 inqueueLimit drops non-forced candidates while the queue is full") {
    // s0 fans out to 6 kids, each kid links one unique grandkid. With a
    // 1/round budget, a kid's grandkid arrives while the remaining kids are
    // still pending: pending ≥ 3 → dropped (never revisited — reference
    // semantics: the task is discarded, scheduler.py:314-316), pending < 3 →
    // admitted. Exactly 3 grandkids must be dropped.
    val kids = (1 to 6).map(i => s"http://a.example/k/$i")
    val gks = (1 to 6).map(i => s"http://a.example/g/$i")
    val pages = page("http://a.example/p/0", kids, "t0") +:
      (kids.zip(gks).map { case (k, g) => page(k, Seq(g), "k") } ++
        gks.map(g => page(g, Nil, "g"))) :+ robots("a.example")
    val eng = mkEngine(pages, Seq(ProjectSpec(
      unbounded("q").copy(inqueueLimit = 3, rate = 1.0 / 30.0, burst = 1.0),
      seeds = Seq("http://a.example/p/0"))))
    eng.crawl(Nil, maxRounds = 20)
    val fetched = frontier.SeenSet.latest(
        eng.store.readArchive(eng.store.lastCommitted().get))
      .filter(_.status == Status.Success).collect().map(_.url).toSet
    assert(kids.forall(fetched.contains)) // all kids crawled
    val gDone = gks.count(fetched.contains)
    assert(gDone === 3, s"expected exactly 3 grandkids admitted, got $gDone " +
      s"(${gks.filter(fetched.contains)})")
  }

  test("O9 carry: MOR rounds keep exact pending counts without rescans") {
    // same workload as the O9 drop test, but cowMinLive=1 forces every
    // round onto the merge-on-read path: the pending counts must come from
    // the incremental per-project carry (ONE seeding scan total, asserted
    // via o9PendScans) and the drop semantics must stay exactly the
    // scan-based ones (3 of 6 grandkids admitted).
    val kids = (1 to 6).map(i => s"http://a.example/k/$i")
    val gks = (1 to 6).map(i => s"http://a.example/g/$i")
    val pages = page("http://a.example/p/0", kids, "t0") +:
      (kids.zip(gks).map { case (k, g) => page(k, Seq(g), "k") } ++
        gks.map(g => page(g, Nil, "g"))) :+ robots("a.example")
    val ckpt = Files.createTempDirectory("graft_o9mor").toString
    val eng = new CrawlEngine(spark.createDataset(pages), EngineConfig(
      projects = Seq(ProjectSpec(
        unbounded("q").copy(inqueueLimit = 3, rate = 1.0 / 30.0, burst = 1.0),
        seeds = Seq("http://a.example/p/0"))),
      roundDt = 30.0, checkpointDir = ckpt,
      cowMinLive = 1L, compactEvery = 0))
    eng.crawl(Nil, maxRounds = 20)
    val fetched = frontier.SeenSet.latest(
        eng.store.readArchive(eng.store.lastCommitted().get))
      .filter(_.status == Status.Success).collect().map(_.url).toSet
    assert(kids.forall(fetched.contains))
    val gDone = gks.count(fetched.contains)
    assert(gDone === 3, s"expected exactly 3 grandkids admitted, got $gDone")
    assert(eng.o9PendScans === 1L,
      s"pending carry did not hold across MOR rounds (${eng.o9PendScans} scans)")
  }

  test("O14 restartByStatus re-injects archived tasks as forced candidates") {
    val urls = (0 to 2).map(i => s"http://a.example/p/$i")
    val pages = urls.zipWithIndex.map { case (u, i) =>
      page(u, if (i < 2) Seq(urls(i + 1)) else Nil, s"t$i")
    } :+ robots("a.example")
    val ckpt = Files.createTempDirectory("graft_restart").toString
    val eng = mkEngine(pages, Seq(ProjectSpec(unbounded("r"),
      seeds = Seq(urls.head))), dir = ckpt)
    eng.crawl(Nil, maxRounds = 8)
    val n0 = eng.store.lastCommitted().get
    val injected = eng.restartByStatus("r", Set(Status.Success))
    assert(injected === 3L)
    // drive the next rounds: the restarts must be re-fetched (304 — content
    // unchanged and the etag rides along via D4 restart)
    val n1 = eng.store.lastCommitted().get
    (1 to 3).foreach(i => eng.runRound(n1 + i))
    import org.apache.spark.sql.functions._
    val m304 = eng.metricsDF().filter(col("round") > n0)
      .agg(sum("fetch_304")).head().getLong(0)
    assert(m304 === 3L, "restarted tasks were not re-fetched")
  }

  test("P15 send_message: project A's handler produces project B's result") {
    val u0 = "http://a.example/p/0"
    val pages = Seq(page(u0, Nil, "t0"), robots("a.example"))
    val sender = new Handler {
      def onPage(t: Task, p: FetchedPage): HandlerResult =
        HandlerResult(result = """{"who": "a"}""",
          messages = Seq(("pb", """{"greeting": "hello-b"}""")))
    }
    val receiver = new Handler {
      def onPage(t: Task, p: FetchedPage): HandlerResult =
        HandlerResult(result = p.save) // echo the (from, msg) envelope
    }
    val eng = mkEngine(pages, Seq(
      ProjectSpec(unbounded("pa"), seeds = Seq(u0), seedCallback = "send",
        callbacks = Map("send" -> sender)),
      ProjectSpec(unbounded("pb"), callbacks = Map("_on_message" -> receiver))))
    eng.crawl(Nil, maxRounds = 4)
    val res = eng.resultsDF().collect()
    val bRows = res.filter(_.getAs[String]("project") == "pb")
    assert(bRows.length === 1)
    assert(bRows.head.getAs[String]("url") === "data:,on_message")
    assert(bRows.head.getAs[String]("result").contains("hello-b"))
    assert(bRows.head.getAs[String]("result").contains("\"from\": \"pa\""))
  }

  test("P15 duplicate same-round messages never fan out a colliding live row") {
    // Two pa pages each message pb in ONE round, while pb ALSO crawls the
    // REAL url `data:,on_message` — whose taskid equals the synthetic
    // message packs' constant md5. The message packs must be excluded from
    // applyStatus (@not_send_status): with them in, the duplicate join keys
    // fan pb's live row out into duplicate frontier/archive rows; the real
    // task's own pack must still flow (archived exactly once).
    val u0 = "http://a.example/p/0"
    val u1 = "http://a.example/p/1"
    val pages = Seq(page(u0, Nil, "t0"), page(u1, Nil, "t1"), robots("a.example"))
    val sender = new Handler {
      def onPage(t: Task, p: FetchedPage): HandlerResult =
        HandlerResult(messages = Seq(("pb", s"""{"src": "${t.url}"}""")))
    }
    val echo = new Handler {
      def onPage(t: Task, p: FetchedPage): HandlerResult =
        HandlerResult(result = """{"real": true}""")
    }
    val receiver = new Handler {
      def onPage(t: Task, p: FetchedPage): HandlerResult =
        HandlerResult(result = p.save)
    }
    val eng = mkEngine(pages, Seq(
      ProjectSpec(unbounded("pa"), seeds = Seq(u0, u1), seedCallback = "send",
        callbacks = Map("send" -> sender)),
      ProjectSpec(unbounded("pb"), seeds = Seq("data:,on_message"),
        seedCallback = "echo",
        callbacks = Map("echo" -> echo, "_on_message" -> receiver))))
    eng.crawl(Nil, maxRounds = 4)
    val n = eng.store.lastCommitted().get
    // raw archive log (NOT latest-collapsed): exactly ONE terminal row for
    // pb's real task — a fan-out would append duplicates in one round
    val pbArch = eng.store.readArchive(n).filter(_.project == "pb").collect()
    assert(pbArch.length === 1, s"pb archive rows: ${pbArch.length}")
    assert(pbArch.head.status === Status.Success)
    assert(eng.store.readLive(n).filter(_.project == "pb").count() === 0)
    // both messages still delivered to pb's _on_message
    val msgRes = eng.resultsDF()
      .filter(col("project") === "pb").collect()
      .map(_.getAs[String]("result")).filter(_ != null)
    assert(msgRes.count(_.contains("\"src\"")) === 2)
    assert(msgRes.count(_.contains("\"real\"")) === 1)
  }

  test("F3 engine-path redirects: chains followed to final content; >5 hops error") {
    val dst = "http://a.example/p/final"
    val pages = Seq(
      page("http://a.example/p/0",
        Seq("http://a.example/r/1", "http://a.example/loop/1"), "t0"),
      redirect("http://a.example/r/1", "http://a.example/r/2"),
      redirect("http://a.example/r/2", dst),
      page(dst, Nil, "FinalTitle"),
      // 6-cycle: always still a stub after 5 hops → too many redirects
      redirect("http://a.example/loop/1", "http://a.example/loop/2"),
      redirect("http://a.example/loop/2", "http://a.example/loop/1"),
      robots("a.example"))
    val eng = mkEngine(pages, Seq(ProjectSpec(unbounded("rd"),
      seeds = Seq("http://a.example/p/0"))))
    eng.crawl(Nil, maxRounds = 8)
    val arch = frontier.SeenSet.latest(
      eng.store.readArchive(eng.store.lastCommitted().get)).collect()
    val r1 = arch.find(_.url == "http://a.example/r/1").get
    assert(r1.status === Status.Success)
    assert(r1.track.fetch.redirect_url === dst) // followed to the final url
    // the loop task 599s and enters the retry ladder — still live (ACTIVE)
    // with the normalized error recorded after its first failure
    val loop = eng.store.readLive(eng.store.lastCommitted().get)
      .collect().find(_.url == "http://a.example/loop/1").get
    assert(loop.status === Status.Active && loop.schedule.retried >= 1)
    assert(loop.track.fetch.error.contains("too many redirects"))
    // the redirect source's result carries the FINAL page's title
    val res = eng.resultsDF().collect()
      .find(_.getAs[String]("url") == "http://a.example/r/1").get
    assert(res.getAs[String]("result").contains("FinalTitle"))
  }

  test("S8 saveHtml persists fetched bodies for opted-in projects only") {
    val u0 = "http://a.example/p/0"; val u1 = "http://a.example/p/1"
    val pages = Seq(page(u0, Seq(u1), "t0"), page(u1, Nil, "t1"),
      robots("a.example"))
    val eng = mkEngine(pages, Seq(
      ProjectSpec(unbounded("keep").copy(saveHtml = true), seeds = Seq(u0)),
      ProjectSpec(unbounded("drop"), seeds = Seq(u0))))
    eng.crawl(Nil, maxRounds = 6)
    val html = eng.htmlDF().collect()
    assert(html.map(_.getAs[String]("project")).toSet === Set("keep"))
    assert(html.length === 2)
    val body = new String(html.find(_.getAs[String]("url") == u0).get
      .getAs[Array[Byte]]("html"), "utf-8")
    assert(body.contains("<h1>t0</h1>"))
  }

  test("same-round rediscovery: mutual links crawled in one round dedup exactly") {
    // both seeds fetched in round 1; each links to the other → the follow
    // rediscovers a taskid archived THIS round (the r1 blind spot)
    val ua = "http://a.example/p/a"; val ub = "http://a.example/p/b"
    val pages = Seq(page(ua, Seq(ub), "ta"), page(ub, Seq(ua), "tb"),
      robots("a.example"))
    val eng = mkEngine(pages, Seq(ProjectSpec(unbounded("mx"),
      seeds = Seq(ua, ub))))
    val stats = eng.crawl(Nil, maxRounds = 6)
    // exactly 2 fetches ever; no duplicate archive rows; 1 archive row each
    assert(stats.map(_.selected).sum === 2)
    val arch = eng.store.readArchive(eng.store.lastCommitted().get).collect()
    assert(arch.length === 2, s"duplicate archive rows: ${arch.map(_.url).toSeq}")
    assert(arch.map(_.url).toSet === Set(ua, ub))
  }

  test("P16 RuleSpider: declarative follow/parse over the corpus") {
    val list = "http://a.example/list/0"
    val d1 = "http://a.example/detail/1"; val d2 = "http://a.example/detail/2"
    val out = "http://b.example/detail/9"
    val pages = Seq(page(list, Seq(d1, d2, out), "L"),
      page(d1, Nil, "D1"), page(d2, Nil, "D2"), page(out, Nil, "X"),
      robots("a.example"), robots("b.example"))
    val spider = new RuleSpider("rule_page", Seq(
      LinkRule(allow = "/detail/", allowDomains = Seq("a.example"),
        emit = "detail", follow = Some(true)),
      LinkRule(allow = "/list/", follow = Some(true))))
    val eng = mkEngine(pages, Seq(ProjectSpec(unbounded("rs"),
      seeds = Seq(list), seedCallback = "rule_page",
      callbacks = Map("rule_page" -> spider))))
    eng.crawl(Nil, maxRounds = 6)
    val res = eng.resultsDF().collect().map(r =>
      r.getAs[String]("url") -> r.getAs[String]("result")).toMap
    assert(res.keySet === Set(d1, d2)) // only a.example details emit
    assert(res(d1).contains("D1"))
    val urls = frontier.SeenSet.latest(
      eng.store.readArchive(eng.store.lastCommitted().get)).collect().map(_.url).toSet
    assert(!urls.contains(out), "denied domain was followed")
  }

  test("P17 ProjectIni parses reference-style INI into ProjectSpecs") {
    val ini =
      """; comment
        |[news]
        |rate = 5
        |burst = 10
        |depth_limit = 3
        |domain = a.example,b.example
        |list_url_black_pattern = \.pdf$,/private/
        |save_html = 1
        |seeds = http://a.example/,http://b.example/
        |every = 300
        |
        |[blog]
        |callback = detail_page
        |respect_robots = 0
        |inqueue_limit = 500
        |""".stripMargin
    val specs = ProjectIni.parse(ini)
    assert(specs.map(_.config.name) === Seq("news", "blog"))
    val news = specs.head
    assert(news.config.rate === 5.0 && news.config.burst === 10.0)
    assert(news.config.depthLimit === 3)
    assert(news.config.allowDomains === Seq("a.example", "b.example"))
    assert(news.config.denyPattern === """(?:\.pdf$)|(?:/private/)""")
    assert(news.config.saveHtml)
    assert(news.seeds === Seq("http://a.example/", "http://b.example/"))
    assert(news.cronEverySec === 300L)
    val blog = specs(1)
    assert(blog.config.rate === 3.0 && blog.config.burst === 30.0) // defaults
    assert(!blog.config.respectRobots && blog.config.inqueueLimit === 500)
    assert(blog.seedCallback === "detail_page")
    // an INI-built engine runs end-to-end
    val pages = Seq(page("http://a.example/", Nil, "root"), robots("a.example"))
    val eng = mkEngine(pages, ProjectIni.parse(
      "[mini]\nseeds = http://a.example/\ncallback = bfs_page\n"))
    eng.crawl(Nil, maxRounds = 4)
    assert(eng.resultsDF().count() === 1L)
  }

  test("O15 lifecycle: a STOP project is frozen — never selected, candidates dropped") {
    val u0 = "http://a.example/p/0"; val u1 = "http://a.example/p/1"
    val pages = Seq(page(u0, Seq(u1), "t0"), page(u1, Nil, "t1"),
      robots("a.example"))
    val eng = mkEngine(pages, Seq(
      ProjectSpec(unbounded("run"), seeds = Seq(u0)),
      ProjectSpec(unbounded("frozen").copy(status = ProjectConfig.Stop),
        seeds = Seq(u0))))
    eng.crawl(Nil, maxRounds = 6)
    val n = eng.store.lastCommitted().get
    val arch = frontier.SeenSet.latest(eng.store.readArchive(n)).collect()
    assert(arch.map(_.project).toSet === Set("run"))
    assert(arch.count(_.status == Status.Success) === 2)
    // the frozen project's seed row stays parked in the live frontier
    val frozenLive = eng.store.readLive(n).collect().filter(_.project == "frozen")
    assert(frozenLive.map(_.url).toSeq === Seq(u0))
    assert(frozenLive.head.status === Status.Active)
    assert(eng.resultsDF().collect().forall(_.getAs[String]("project") == "run"))
  }

  test("O15 delete: purges frontier + seen-set, tombstones results, vacuum rewrites") {
    val u0 = "http://a.example/p/0"; val u1 = "http://a.example/p/1"
    val pages = Seq(page(u0, Seq(u1), "t0"), page(u1, Nil, "t1"),
      robots("a.example"))
    val eng = mkEngine(pages, Seq(
      ProjectSpec(unbounded("keep"), seeds = Seq(u0)),
      ProjectSpec(unbounded("dead"), seeds = Seq(u0))))
    eng.crawl(Nil, maxRounds = 6)
    assert(eng.resultsDF().filter(col("project") === "dead").count() === 2L)
    eng.deleteProject("dead")
    val n = eng.store.lastCommitted().get
    assert(eng.store.readLive(n).collect().forall(_.project == "keep"))
    assert(eng.store.readArchive(n).collect().forall(_.project == "keep"))
    assert(eng.resultsDF().filter(col("project") === "dead").count() === 0L)
    assert(eng.metricsDF().filter(col("project") === "dead").count() === 0L)
    // the surviving project's data is intact
    assert(eng.resultsDF().filter(col("project") === "keep").count() === 2L)
    // physical vacuum clears the tombstone and keeps reads identical
    eng.store.vacuum()
    assert(eng.store.deletedProjects().isEmpty)
    assert(eng.resultsDF().filter(col("project") === "dead").count() === 0L)
    assert(eng.resultsDF().filter(col("project") === "keep").count() === 2L)
  }

  test("F4 cookie jar: task cookies + redirect-chain Set-Cookie + page Set-Cookie, later wins") {
    val dst = "http://a.example/p/final"
    def stub(url: String, target: String, ck: String): Page =
      Page(url, new Timestamp(1000L),
        (s"""<html><head><meta http-equiv="refresh" content="0; url=$target"/>""" +
          s"""<meta name="graft-set-cookie" content="$ck"/></head></html>""")
          .getBytes("utf-8"), "", "en")
    val finalHtml =
      """<html><head><title>F</title><meta name="graft-set-cookie" content="c=3"/></head>""" +
        """<body><h1>F</h1></body></html>"""
    val pages = Seq(
      page("http://a.example/p/0", Nil, "t0"),
      stub("http://a.example/r/1", "http://a.example/r/2", "a=1"),
      stub("http://a.example/r/2", dst, "b=2; a=9"),
      Page(dst, new Timestamp(1000L), finalHtml.getBytes("utf-8"), "F", "en"),
      robots("a.example"))
    val boot = new Handler {
      def onPage(t: Task, p: FetchedPage): HandlerResult =
        HandlerResult(follows = Seq(FollowSpec("http://a.example/r/1",
          callback = "probe", cookies = "z=0; a=0")))
    }
    val probe = new Handler {
      def onPage(t: Task, p: FetchedPage): HandlerResult =
        HandlerResult(result = process.Handlers.jsonStr(
          String.valueOf(p.cookies)))
    }
    val eng = mkEngine(pages, Seq(ProjectSpec(unbounded("ck"),
      seeds = Seq("http://a.example/p/0"), seedCallback = "boot",
      callbacks = Map("boot" -> boot, "probe" -> probe))))
    eng.crawl(Nil, maxRounds = 6)
    val res = eng.resultsDF().collect()
      .find(_.getAs[String]("url") == "http://a.example/r/1").get
    // merge order: task (z=0; a=0) → hop1 (a=1) → hop2 (b=2; a=9) → page (c=3)
    assert(res.getAs[String]("result") === "\"a=9; b=2; c=3; z=0\"")
  }

  test("F1/S6 js dispatch: comment-wrapped script DOM followed only by js-typed fetch") {
    val jsUrl = "http://a.example/js/1"
    val jsHtml =
      """<html><head><title>J</title></head><body><h1>J</h1>""" +
        """<a href="/s/1">s</a><!--graft-js-dom <a href="/j/1">j</a>--></body></html>"""
    val pages = Seq(
      Page(jsUrl, new Timestamp(1000L), jsHtml.getBytes("utf-8"), "J", "en"),
      page("http://a.example/s/1", Nil, "S"),
      page("http://a.example/j/1", Nil, "Jdom"),
      robots("a.example"))
    def boot(fetchType: String) = new Handler {
      def onPage(t: Task, p: FetchedPage): HandlerResult =
        HandlerResult(follows =
          Seq(FollowSpec(jsUrl, callback = "bfs_page", fetchType = fetchType)))
    }
    val eng = mkEngine(pages, Seq(
      ProjectSpec(unbounded("static"), seeds = Seq("data:,boot"),
        seedCallback = "boot", callbacks = Map("boot" -> boot(null))),
      ProjectSpec(unbounded("jsproj"), seeds = Seq("data:,boot"),
        seedCallback = "boot", callbacks = Map("boot" -> boot("js")))))
    eng.crawl(Nil, maxRounds = 6)
    val seen = frontier.SeenSet.latest(
        eng.store.readArchive(eng.store.lastCommitted().get))
      .collect().groupBy(_.project)
    def urls(p: String) = seen(p).map(_.url).toSet
    assert(urls("static").contains("http://a.example/s/1"))
    assert(!urls("static").contains("http://a.example/j/1"),
      "static parse followed un-executed script DOM")
    assert(urls("jsproj").contains("http://a.example/s/1"))
    assert(urls("jsproj").contains("http://a.example/j/1"),
      "js render did not surface the script DOM link")
  }

  test("bucketed COW live snapshots: changed-bucket rounds preserve the frontier exactly") {
    // a deep chain: each round crawls one url, so COW rounds rewrite only
    // the buckets holding that round's selected/candidate keys
    val urls = (0 to 11).map(i => s"http://a.example/p/$i")
    val pages = urls.zipWithIndex.map { case (u, i) =>
      page(u, if (i < 11) Seq(urls(i + 1)) else Nil, s"t$i")
    } :+ robots("a.example")
    def run(buckets: Int): CrawlEngine = {
      val ckpt = Files.createTempDirectory("graft_cow").toString
      val eng = new CrawlEngine(spark.createDataset(pages),
        engine.EngineConfig(
          projects = Seq(ProjectSpec(unbounded("cow"), seeds = Seq(urls.head))),
          checkpointDir = ckpt, liveBuckets = buckets, cowMinLive = 1L,
          morOverlayMax = 0L)) // this test pins the bucket-COW path
      eng.crawl(Nil, maxRounds = 16)
      eng
    }
    val cow = run(8); val plain = run(0)
    def state(e: CrawlEngine) = {
      val n = e.store.lastCommitted().get
      (frontier.SeenSet.latest(e.store.readArchive(n)).collect()
         .map(t => (t.taskid, t.status, t.url, t.depth)).sortBy(_._1).toSeq,
       e.store.readLive(n).collect().map(_.taskid).sorted.toSeq)
    }
    assert(state(cow) === state(plain))
    // COW actually engaged: some committed manifest inherits buckets from an
    // EARLIER round (i.e. a round wrote a proper subset of buckets)
    val partial = cow.store.committedRounds().exists { r =>
      cow.store.readLiveManifest(r).exists(_.values.map(_._1).toSet.size > 1)
    }
    assert(partial, "no round inherited buckets from an earlier manifest")
  }

  test("P8 config xpath map: INI-declared {url_regex: {field: xpath}} extraction end-to-end") {
    val list = "http://a.example/list/0"
    val d1 = "http://a.example/item/1"; val d2 = "http://a.example/item/2"
    val pages = Seq(page(list, Seq(d1, d2), "TheList"),
      page(d1, Nil, "Item One"), page(d2, Nil, "Item Two"),
      robots("a.example"))
    val ini =
      """[shop]
        |seeds = http://a.example/list/0
        |base_url_pattern = /item/,/list/
        |xpath = {"/item/": {"title": "//title/text()", "headline": "//h1/text()"}}
        |""".stripMargin
    val eng = mkEngine(pages, config.ProjectIni.parse(ini))
    eng.crawl(Nil, maxRounds = 6)
    val res = eng.resultsDF().collect().map(r =>
      r.getAs[String]("url") -> r.getAs[String]("result")).toMap
    // only /item/ pages match the xpath pattern → only they emit results
    assert(res.keySet === Set(d1, d2))
    assert(res(d1).contains("\"title\": \"Item One\""))
    assert(res(d1).contains("\"headline\": \"Item One\""))
    assert(res(d2).contains("\"title\": \"Item Two\""))
    // all three pages were crawled (list followed via base_url_pattern)
    val seen = frontier.SeenSet.latest(
      eng.store.readArchive(eng.store.lastCommitted().get)).collect().map(_.url).toSet
    assert(seen === Set(list, d1, d2))
  }

  test("P5 page.json: API handler parses a JSON listing and follows item urls") {
    // reference mySpider/ API-spider pattern over Response.json
    // (pyspider/libs/response.py:136-145): listing JSON → follow item urls →
    // item JSON → typed result fields
    val listUrl = "http://api.example/list"
    val item1 = "http://api.example/item/1"
    val item2 = "http://api.example/item/2"
    def jsonPage(url: String, body: String): Page =
      Page(url, new Timestamp(1000L), body.getBytes("utf-8"), body, "en")
    val pages = Seq(
      jsonPage(listUrl, s"""{"items": [{"url": "$item1"}, {"url": "$item2"}]}"""),
      jsonPage(item1, """{"id": 1, "name": "first"}"""),
      jsonPage(item2, """{"id": 2, "name": "second"}"""),
      robots("api.example"))
    val eng = mkEngine(pages, Seq(ProjectSpec(unbounded("api"),
      seeds = Seq(listUrl), seedCallback = "json_list")))
    eng.crawl(Nil, maxRounds = 4)
    val res = eng.resultsDF().collect()
    val items = res.filter(_.getAs[String]("url").startsWith("http://api.example/item/"))
    assert(items.length === 2)
    val byUrl = items.map(r => r.getAs[String]("url") -> r.getAs[String]("result")).toMap
    assert(byUrl(item1).contains("\"id\": 1") && byUrl(item1).contains("\"name\": \"first\""))
    assert(byUrl(item2).contains("\"id\": 2") && byUrl(item2).contains("\"name\": \"second\""))
    // the listing callback emits follows only — no result row of its own
    assert(!res.exists(_.getAs[String]("url") == listUrl))
    // the accessor itself is lazy and re-entrant (same parsed tree object)
    val p = FetchedPage(item1, 200, Array.emptyByteArray, "utf-8",
      """{"a": [1, 2, 3]}""", null, 0L, null)
    assert((p.json eq p.json) && p.json.path("a").size() === 3)
  }

  test("G1 event averages: metrics avg_fetch/process_time equal the TimeModel means") {
    import graft.engine.TimeModel
    import graft.process.HtmlLite
    val urls = (0 to 2).map(i => s"http://a.example/p/$i")
    val pages = Seq(page(urls(0), urls.tail, "t0"), page(urls(1), Nil, "t1"),
      page(urls(2), Nil, "t2"), robots("a.example"))
    val eng = mkEngine(pages, Seq(ProjectSpec(unbounded("g1avg"),
      seeds = Seq(urls(0)))))
    eng.crawl(Nil, maxRounds = 6)
    // LAW (counter.py:325-427 analog): every round's (avg, processed) pair
    // recovers that round's EXACT total micros — summing the recovered
    // totals over the crawl must equal the TimeModel evaluated page-by-page,
    // independent of round boundaries and partitioning.
    val m = eng.metricsDF().filter(col("processed") > 0)
      .select("processed", "avg_fetch_time", "avg_process_time").collect()
    val gotFetchUs = m.map(r =>
      math.round(r.getDouble(1) * r.getLong(0) * 1e6)).sum
    val gotProcUs = m.map(r =>
      math.round(r.getDouble(2) * r.getLong(0) * 1e6)).sum
    val (expFetchUs, expProcUs) = pages.filterNot(_.url.endsWith("/robots.txt"))
      .map { p =>
        val decoded = new String(p.html, "utf-8")
        (TimeModel.fetchUs(p.html.length),
          TimeModel.processUs(decoded.length,
            HtmlLite.extractLinks(decoded, p.url).size))
      }.foldLeft((0L, 0L)) { case ((f, pr), (a, b)) => (f + a, pr + b) }
    assert(gotFetchUs === expFetchUs,
      s"fetch micros: metrics=$gotFetchUs model=$expFetchUs")
    assert(gotProcUs === expProcUs,
      s"process micros: metrics=$gotProcUs model=$expProcUs")
  }

  test("F5 deterministic UA pick is stable and spread") {
    import graft.functions.UaPool
    val urls = (0 until 64).map(i => s"http://site$i.example/p/$i")
    val picks = urls.map(UaPool.pick)
    assert(picks.toSet.size > 1, "pool never rotates")
    assert(urls.map(UaPool.pick) === picks, "pick is not stable")
    // column twin agrees with the row path
    val df = spark.createDataset(urls).toDF("url")
      .select(col("url"), UaPool.idxCol(col("url")).as("idx")).collect()
    df.foreach(r => assert(r.getInt(1) === UaPool.idx(r.getString(0))))
  }
}
