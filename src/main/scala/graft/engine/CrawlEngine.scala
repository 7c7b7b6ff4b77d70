package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.fetch.{CorpusFetcher, FetchService}
import graft.frontier.{Frontier, SeenSet, StatusPack}
import graft.model._
import graft.process.{FetchedPage, Handler, Handlers, HtmlLite}
import graft.store.SnapshotStore
import graft.url.UrlCanon

/** Engine configuration — one "project" per reference semantics; the loop
  * itself is project-agnostic (everything keys on the `project` column). */
case class EngineConfig(
    project: ProjectConfig = ProjectConfig("default"),
    callbacks: Map[String, Handler] = Handlers.registry,
    seedCallback: String = "bfs_page",
    roundDt: Double = 30.0, // logical seconds per round (LOOP analog)
    checkpointDir: String,
    useBloom: Boolean = true,
    bloomCap: Long = 50_000_000L)

case class RoundStats(round: Long, now: Double, selected: Long, newLive: Long,
                      archived: Long, results: Long)

/** One page processed by a handler. Everything the scheduler + result worker
  * need flows out of one `mapPartitions` pass (reference processor,
  * pyspider-master/pyspider/processor/processor.py:109-211). */
case class ProcessOut(status: StatusPack, follows: Seq[Task], result: ResultRow)

/** The crawl loop: each reference scheduler tick (scheduler.py:524-554)
  * becomes one deterministic batch ROUND — a single Dataset DAG from
  * frontier snapshot to frontier snapshot (SURVEY §3.1 restatement):
  *
  *   candidates = follows ∪ seeds → dedup/merge (D1-D6) → MERGE live
  *   select (O2-O7 windows/filters) → fetch (corpus join, S4)
  *   → process mapPartitions (P1-P14) → (statusΔ, follows′, results)
  *   → snapshot commit (checkpoint/resume).
  *
  * No wall clock anywhere inside jobs: `now = round * roundDt`.
  */
class CrawlEngine(corpus: Dataset[Page], cfg: EngineConfig)
                 (implicit spark: SparkSession) {
  import spark.implicits._

  val store = new SnapshotStore(cfg.checkpointDir)
  val fetcher: FetchService = new CorpusFetcher(corpus)

  /** robots.txt rules parsed from the corpus itself (host → disallow
    * prefixes) — small, broadcast at selection time. */
  lazy val robotsRules: DataFrame = corpus
    .filter(col("url").endsWith("/robots.txt"))
    .map { p =>
      val host = UrlCanon.mainDomain(p.url)
      (host, HtmlLite.robotsDisallows(new String(p.html, "UTF-8")))
    }
    .toDF("host", "disallow_prefixes")

  def seedTasks(urls: Seq[String]): Dataset[Task] = {
    // Scheduler.add_seed semantics (scheduler.py:593-614): md5 taskid,
    // force_update, depth 0, ACTIVE.
    val project = cfg.project.name
    val cb = cfg.seedCallback
    spark.createDataset(urls).map { u =>
      val canon = UrlCanon.canonicalize(u)
      Task(taskid = UrlCanon.taskId(canon), project = project, url = canon,
        status = Status.Active, host = UrlCanon.mainDomain(canon), depth = 0,
        schedule = Schedule(force_update = true),
        process = ProcessOpts(callback = cb))
    }
  }

  private def emptyTokens(key: String): DataFrame =
    Seq.empty[(String, Double)].toDF(key, "tokens")

  /** Initialize round 0 from seeds, or resume from the last committed
    * snapshot (north rule: killed job resumes mid-crawl). */
  def initOrResume(seeds: Seq[String]): Long = {
    store.lastCommitted() match {
      case Some(n) =>
        store.truncateAfter(n) // clear any torn round n+1 garbage
        n
      case None =>
        val live = seedTasks(seeds)
        store.writeLive(0, live)
        store.writeTokens(0, emptyTokens("host"), emptyTokens("project"))
        val liveRows = store.readLive(0).count()
        store.commit(0, 0.0, liveRows, 0, 0, 0, 0, Seq("live" -> liveRows))
        0L
    }
  }

  /** P9 callback dispatch + P10 follow construction + P14 status assembly —
    * one typed pass over the fetch output. */
  def process(fetched: Dataset[(Task, FetchedPage)], now: Double): Dataset[ProcessOut] = {
    val callbacks = cfg.callbacks
    val project = cfg.project.name
    val okResult = graft.process.HandlerResult() // local: avoid capturing `this`
    fetched.mapPartitions { it =>
      it.map { case (task, page) =>
        val fetchOk = page.statusCode == 200 || page.statusCode == 304
        val (hr, skipped) =
          if (page.statusCode == 304) (okResult, true) // P9 304 short-circuit
          else callbacks.get(task.process.callback) match {
            case Some(h) =>
              try (h.onPage(task, page), false)
              catch { case e: Exception =>
                (graft.process.HandlerResult(ok = false,
                  exception = s"${e.getClass.getSimpleName}: ${e.getMessage}"), false)
              }
            case None =>
              (graft.process.HandlerResult(ok = false,
                exception = s"unknown callback: ${task.process.callback}"), false)
          }
        val follows = if (skipped) Nil else hr.follows.map(f =>
          Handlers.mkTask(task, f, now, project))
        val status = StatusPack(
          taskid = task.taskid, project = task.project,
          fetchOk = fetchOk, statusCode = page.statusCode, fetchTime = 0.0,
          encoding = page.encoding, contentHash = page.contentHash,
          fetchError = page.error,
          processOk = fetchOk && hr.ok, processTime = 0.0,
          follows = follows.size, exception = hr.exception)
        val result =
          if (hr.result != null)
            ResultRow(task.taskid, task.project, task.url, hr.result, now)
          else null
        ProcessOut(status, follows, result)
      }
    }
  }

  /** Run one round on top of committed round `n-1`; commits round `n`. */
  def runRound(n: Long): RoundStats = {
    val now = n * cfg.roundDt
    val dt = cfg.roundDt
    val p = cfg.project

    val live0 = store.readLive(n - 1)
    val (hostTok, projTok) = store.readTokens(n - 1)
    val archiveTotal = store.archiveTotalOf(n - 1)

    // O4 requeue + robots gate, then O3 due / O2 priority / O5-O7 budgets
    val live = Frontier.applyRobots(
      Frontier.reactivateTimeouts(live0, now, p.processingTimeout), robotsRules)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dueNow = Frontier.due(live, now)
    val selected = Frontier.select(dueNow.toDF(), p, dt, hostTok, projTok)
      .as[Task].persist(StorageLevel.MEMORY_AND_DISK)
    val selectedCount = selected.count()

    // mark selected rows PROCESSING (the reference's processing queue, O4)
    val selKeys = selected.select(col("project"), col("taskid")).withColumn("__sel", lit(true))
    val liveMarked = live.join(selKeys, Seq("project", "taskid"), "left_outer")
      .withColumn("status",
        when(col("__sel"), lit(Status.Processing)).otherwise(col("status")))
      .withColumn("selected_at",
        when(col("__sel"), lit(now)).otherwise(col("selected_at")))
      .drop("__sel").as[Task]

    // fetch (S4) + process (P*)
    val processed = process(fetcher.fetch(selected), now)
      .persist(StorageLevel.MEMORY_AND_DISK)

    val packs = processed.map(_.status)
    val follows = processed.flatMap(_.follows)
    val results = processed.filter(_.result != null).map(_.result)

    // O11-O13: statuses → live'; terminal rows split off to the archive log
    val (liveAfterStatus, archiveDelta0) = Frontier.applyStatus(liveMarked, packs, now)
    val archiveDelta = archiveDelta0.persist(StorageLevel.MEMORY_AND_DISK)

    // D1-D6 + P11: follows into the frontier, checked against the seen-set
    val candidates = Frontier.mergeCandidates(follows)
    val archive = SeenSet.latest(store.readArchive(n - 1))
    val newLive = Frontier.mergeIntoLive(liveAfterStatus, candidates, archive,
      now, n, p.depthLimit)

    // token carry (O5/O6 closed form)
    val hostTok1 = Frontier.consumedTokens(selected.toDF(), "host", hostTok,
      p.hostRate, p.hostBurst, dt)
    val projTok1 = Frontier.consumedTokens(selected.toDF(), "project", projTok,
      p.rate, p.burst, dt)

    // ---- commit (writes are the round's only actions besides the counts) --
    store.writeLive(n, newLive)
    store.appendArchive(n, archiveDelta)
    store.appendResults(n, results.toDF())
    val liveRows = store.readLive(n).count()
    val archRows = archiveDelta.count()
    val resultRows = results.count()

    val metrics = packs.groupBy("project")
      .agg(count(lit(1)).as("processed"),
        sum(when(col("processOk"), 1).otherwise(0)).as("ok"),
        sum(when(col("statusCode") === 200, 1).otherwise(0)).as("fetch_200"),
        sum(when(col("statusCode") === 304, 1).otherwise(0)).as("fetch_304"),
        sum(when(col("statusCode") >= 400, 1).otherwise(0)).as("fetch_err"))
      .withColumn("round", lit(n)).withColumn("now", lit(now))
      .withColumn("selected", lit(selectedCount))
      .withColumn("live_rows", lit(liveRows))
      .withColumn("archived", lit(archRows))
      .withColumn("results", lit(resultRows))
    store.appendMetrics(n, metrics)
    store.writeTokens(n, hostTok1, projTok1)
    store.commit(n, now, liveRows, archRows, archiveTotal + archRows, resultRows,
      selectedCount,
      Seq("live" -> liveRows, "archive_delta" -> archRows, "results" -> resultRows))

    live.unpersist(); selected.unpersist(); processed.unpersist(); archiveDelta.unpersist()
    RoundStats(n, now, selectedCount, liveRows, archRows, resultRows)
  }

  /** Crawl until `maxRounds` or quiescence (nothing selected). Returns stats
    * per executed round. */
  def crawl(seeds: Seq[String], maxRounds: Int): Seq[RoundStats] = {
    var n = initOrResume(seeds)
    val stats = scala.collection.mutable.ArrayBuffer.empty[RoundStats]
    var quiet = false
    while (!quiet && n < maxRounds) {
      n += 1
      val s = runRound(n)
      stats += s
      quiet = s.selected == 0
    }
    stats.toSeq
  }

  /** Final URL-seen set: every taskid ever admitted (live ∪ archive). */
  def seenUrls(): DataFrame = {
    val n = store.lastCommitted().getOrElse(0L)
    store.readLive(n).select("url", "depth")
      .union(SeenSet.latest(store.readArchive(n)).select("url", "depth"))
      .distinct()
  }

  def resultsDF(): DataFrame = store.readResults()
  def metricsDF(): DataFrame = store.readMetrics()
}
