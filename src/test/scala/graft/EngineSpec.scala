package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.engine.{CrawlEngine, EngineConfig}
import graft.model.{Page, ProjectConfig, Status}
import graft.process.HtmlLite
import graft.url.UrlCanon

/** End-to-end engine laws (SURVEY §5 test plan items 2-5):
  *  - seen-set == oracle BFS closure over the corpus link graph;
  *  - byte-identical extracted text per url;
  *  - robots gating (no /private/ url is ever fetched);
  *  - per-host politeness invariant (selected per round per host ≤ budget);
  *  - resume-from-kill equivalence.
  */
class EngineSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  val N = 300L
  val H = 5
  lazy val lay = CorpusGen.layout(N, H)
  lazy val corpus = CorpusGen.generate(spark, N, H).cache()

  /** Driver-side oracle: BFS over the same deterministic link graph,
    * robots-aware. Returns url -> depth. */
  def oracleBfs(maxDepth: Int = Int.MaxValue): Map[String, Int] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var frontier: Seq[(Int, Long)] = (0 until H).map(h => (h, 0L))
    frontier.foreach { case (h, k) => seen(CorpusGen.urlOf(h, k)) = 0 }
    var depth = 0
    while (frontier.nonEmpty && depth < maxDepth) {
      depth += 1
      val next = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      frontier.foreach { case (h, k) =>
        // robots-aware: /private/ pages are admitted to the seen-set but
        // never fetched, so their children are not discovered
        if (!CorpusGen.urlOf(h, k).contains("/private/")) {
          val childUrls = CorpusGen.childK(lay, h, k).map(c => (h, c)) ++
            CorpusGen.crossHost(lay, h, k).map { u =>
              val hh = u.stripPrefix("http://site").takeWhile(_ != '.').toInt
              (hh, 0L)
            }
          childUrls.foreach { case (h2, k2) =>
            val u = CorpusGen.urlOf(h2, k2)
            if (!seen.contains(u)) { seen(u) = depth; next += ((h2, k2)) }
          }
        }
      }
      frontier = next.toSeq
    }
    seen.toMap
  }

  def freshEngine(budgetedHostRate: Double = 1e9, dir: String = null): CrawlEngine = {
    val ckpt = if (dir != null) dir
      else Files.createTempDirectory("graft_engine_spec").toString
    new CrawlEngine(corpus, EngineConfig(
      project = ProjectConfig("test", rate = 1e9, burst = 1e9,
        hostRate = budgetedHostRate, hostBurst = budgetedHostRate,
        loopLimit = Int.MaxValue / 2, depthLimit = -1),
      seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt))
  }

  test("seen-set equals BFS oracle; /private/ urls gated by robots") {
    val engine = freshEngine()
    val stats = engine.crawl(CorpusGen.seeds(H), maxRounds = 40)
    assert(stats.last.selected === 0)

    val oracle = oracleBfs()
    val crawled = engine.store.readArchive(engine.store.lastCommitted().get)
    val byStatus = crawled.groupByKey(_.status).count().collect().toMap

    // robots gate: /private/ pages are reachable but must be BAD, never fetched
    val privUrls = oracle.keys.filter(_.contains("/private/")).toSet
    assert(privUrls.nonEmpty, "fixture must contain private pages")
    val fetched = graft.frontier.SeenSet.latest(crawled)
      .filter(_.status == Status.Success).collect().map(_.url).toSet
    assert(fetched.intersect(privUrls) === Set.empty)
    // everything reachable and not robots-gated was fetched exactly once
    assert(fetched === oracle.keys.toSet -- privUrls)

    // depths match BFS depth for fetched pages
    val depths = graft.frontier.SeenSet.latest(crawled)
      .filter(_.status == Status.Success)
      .collect().map(t => t.url -> t.depth).toMap
    val bad = depths.filter { case (u, d) => oracle(u) != d }
    assert(bad.isEmpty, s"depth mismatches: ${bad.take(5)}")

    // results carry byte-identical titles (extraction parity through the
    // full fetch+decode path, incl. the gb18030 hosts)
    val pages = corpus.collect().map(p => p.url -> p).toMap
    val results = engine.resultsDF().select("url", "result").collect()
    assert(results.nonEmpty)
    results.foreach { r =>
      val url = r.getString(0)
      val expectTitle = pages(url).text.split("\n")(0) // titles contain no JSON-escaped chars
      assert(r.getString(1).contains("\"title\": \"" + expectTitle + "\""),
        s"title mismatch for $url: ${r.getString(1)}")
    }
    assert(byStatus.getOrElse(Status.Success, 0L) === (oracle.size - privUrls.size).toLong)
  }

  test("politeness: per-host selected per round never exceeds the budget") {
    val budget = 7L
    val ckpt = Files.createTempDirectory("graft_budget_spec").toString
    // rate*dt == budget and burst == budget → steady per-round budget of 7
    val eng = new CrawlEngine(corpus, EngineConfig(
      project = ProjectConfig("test", rate = 1e9, burst = 1e9,
        hostRate = budget / 30.0, hostBurst = budget.toDouble,
        loopLimit = Int.MaxValue / 2, depthLimit = -1),
      seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt))
    var n = eng.initOrResume(CorpusGen.seeds(H))
    var done = false
    var rounds = 0
    while (!done && rounds < 60) {
      n += 1; rounds += 1
      val stats = eng.runRound(n)
      done = stats.selected == 0
      assert(stats.selected <= H * budget,
        s"round $n selected ${stats.selected} > ${H * budget}")
    }
    // the hot host needs many rounds under a tight budget, but it finishes
    assert(done, "crawl did not quiesce under budget")
    // and the budgeted crawl still reaches the full (robots-gated) closure
    val oracle = oracleBfs()
    val privUrls = oracle.keys.filter(_.contains("/private/")).toSet
    val fetched = graft.frontier.SeenSet.latest(
        eng.store.readArchive(eng.store.lastCommitted().get))
      .filter(_.status == Status.Success).collect().map(_.url).toSet
    assert(fetched === oracle.keys.toSet -- privUrls)
  }

  test("resume from kill: interrupted crawl converges to the same seen-set") {
    val ckpt = Files.createTempDirectory("graft_resume_spec").toString
    val e1 = freshEngine(dir = ckpt)
    var n = e1.initOrResume(CorpusGen.seeds(H))
    // run exactly 2 rounds, then "die"
    e1.runRound(n + 1)
    e1.runRound(n + 2)
    // simulate a torn third round: live dir written but no manifest
    val torn = new java.io.File(s"$ckpt/round=${n + 3}/live"); torn.mkdirs()
    Files.writeString(torn.toPath.resolve("garbage.txt"), "torn write")

    val e2 = freshEngine(dir = ckpt) // fresh engine over the same checkpoint
    val stats = e2.crawl(CorpusGen.seeds(H), maxRounds = 40)
    assert(stats.last.selected === 0)

    val oracle = oracleBfs()
    val privUrls = oracle.keys.filter(_.contains("/private/")).toSet
    val fetched = graft.frontier.SeenSet.latest(
        e2.store.readArchive(e2.store.lastCommitted().get))
      .filter(_.status == Status.Success).collect().map(_.url).toSet
    assert(fetched === oracle.keys.toSet -- privUrls)
  }

  test("cron @every re-injects seeds; re-crawl of unchanged pages 304s (F2)") {
    val ckpt = Files.createTempDirectory("graft_cron_spec").toString
    val seeds = CorpusGen.seeds(H)
    val eng = new CrawlEngine(corpus, EngineConfig(
      project = ProjectConfig("test", rate = 1e9, burst = 1e9,
        hostRate = 1e9, hostBurst = 1e9, loopLimit = Int.MaxValue / 2,
        depthLimit = -1),
      seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt,
      cronEverySec = 300, seeds = seeds)) // tick every 10 rounds
    // run past quiescence: the cron tick at now=300 re-seeds with
    // force_update → D4 restart → conditional fetch (etag) → 304s
    var n = eng.initOrResume(seeds)
    (1 to 14).foreach { i => n += 1; eng.runRound(n) }
    val m = eng.metricsDF()
    import org.apache.spark.sql.functions._
    val m304 = m.agg(sum("fetch_304")).head().getLong(0)
    val firstQuiet = m.filter(col("selected") === 0).agg(min("round")).head().getLong(0)
    val reSelected = m.filter(col("round") > firstQuiet).agg(sum("selected")).head().getLong(0)
    assert(reSelected > 0, "cron tick did not re-inject seeds")
    assert(m304 > 0, "re-crawl of unchanged pages did not produce 304s")
    // exported results (S9) parse as JSON lines with lifted columns
    val exp = Files.createTempDirectory("graft_export").toString + "/out"
    eng.exportResults(exp, "json")
    val back = spark.read.json(exp)
    assert(back.count() > 0 && back.columns.contains("title"))
  }

  test("engine is deterministic: two runs produce identical archives") {
    val e1 = freshEngine(); val e2 = freshEngine()
    e1.crawl(CorpusGen.seeds(H), maxRounds = 40)
    e2.crawl(CorpusGen.seeds(H), maxRounds = 40)
    def fingerprint(e: CrawlEngine): Array[(String, Int, Int, Long)] =
      graft.frontier.SeenSet.latest(e.store.readArchive(e.store.lastCommitted().get))
        .collect().map(t => (t.url, t.status, t.depth, t.seq)).sortBy(_._1)
    assert(fingerprint(e1) === fingerprint(e2))
  }
}
