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
    bloomCap: Long = 50_000_000L, // above this, skip the driver-side bloom
    bloomMinRows: Long = 100_000L, // below this the exact join is cheaper
    bloomExpected: Long = 4_000_000L, // sizing; identical for all merges
    cronEverySec: Long = 0L, // O10: @every interval in logical secs; 0 = off
    seeds: Seq[String] = Nil) // re-injected by each due cron tick

case class RoundStats(round: Long, now: Double, selected: Long, newLive: Long,
                      archived: Long, results: Long, wallSec: Double = 0.0)

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

  /** Incremental URL-seen bloom over archive taskids (north rule): built
    * once at init/resume, then each round's archive delta is OR-ed in
    * (`mergeInPlace`). All blooms share `bloomExpected` so bit layouts are
    * compatible. Pre-filter only — exact anti/left joins remain the truth
    * (bloom FPR must never corrupt the seen set, SURVEY §7). */
  private var seenBloom: Option[org.apache.spark.util.sketch.BloomFilter] = None

  /** (Re)build the bloom when the archive enters the size band where it
    * pays: below bloomMinRows the exact broadcast-semi join is cheaper than
    * the extra per-round bloom jobs; above bloomCap the driver-side sketch
    * is replaced by the bucket-local blooms of the scale path. Building is
    * one pass over the archive, amortized: once built it is maintained
    * incrementally (mergeInPlace of each round's delta). */
  private def maybeInitBloom(upTo: Long): Unit = {
    if (!cfg.useBloom || seenBloom.isDefined) return
    val total = store.archiveTotalOf(upTo)
    if (total < cfg.bloomMinRows || total > cfg.bloomCap) return
    seenBloom = Some(
      store.readArchive(upTo).stat.bloomFilter("taskid", cfg.bloomExpected, 0.01))
  }

  /** robots.txt rules parsed from the corpus itself (host → disallow
    * prefixes). One row per host → COLLECTED once and re-created as a local
    * relation, so the per-round robots gate never re-scans the corpus
    * (broadcasting a local relation is driver-side only). */
  lazy val robotsRules: DataFrame = {
    val rows = corpus
      .filter(col("url").endsWith("/robots.txt"))
      .map { p =>
        val host = UrlCanon.mainDomain(p.url)
        (host, HtmlLite.robotsDisallows(new String(p.html, "UTF-8")))
      }
      .collect()
    spark.createDataFrame(rows.toSeq).toDF("host", "disallow_prefixes")
  }

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

  private val phaseLog = sys.env.contains("GRAFT_PHASE_LOG")
  @inline private def timed[T](name: String)(body: => T): T = {
    if (!phaseLog) body
    else {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"      [phase] $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      spark.sparkContext.setJobDescription(null)
      r
    }
  }

  /** Run one round on top of committed round `n-1`; commits round `n`. */
  def runRound(n: Long): RoundStats = {
    val now = n * cfg.roundDt
    val dt = cfg.roundDt
    val p = cfg.project
    maybeInitBloom(n - 1)
    val cached = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
    def hook[T](d: Dataset[T]): Dataset[T] = {
      val h = d.persist(StorageLevel.MEMORY_AND_DISK); cached += h; h
    }

    val live0 = store.readLive(n - 1)
    val (hostTok, projTok) = store.readTokens(n - 1)
    val archiveTotal = store.archiveTotalOf(n - 1)

    // O4 requeue + robots gate, then O3 due / O2 priority / O5-O7 budgets
    val live = hook(Frontier.applyRobots(
      Frontier.reactivateTimeouts(live0, now, p.processingTimeout), robotsRules))
    val dueNow = Frontier.due(live, now)
    val selected = hook(Frontier.select(dueNow.toDF(), p, dt, hostTok, projTok).as[Task])

    // mark selected rows PROCESSING (the reference's processing queue, O4)
    val selKeys = selected.select(col("project"), col("taskid")).withColumn("__sel", lit(true))
    val liveMarked = live.join(selKeys, Seq("project", "taskid"), "left_outer")
      .withColumn("status",
        when(col("__sel"), lit(Status.Processing)).otherwise(col("status")))
      .withColumn("selected_at",
        when(col("__sel"), lit(now)).otherwise(col("selected_at")))
      .drop("__sel").as[Task]

    // fetch (S4) + process (P*)
    val processed = hook(process(fetcher.fetch(selected, hook(_)), now))

    val packs = processed.map(_.status)
    val follows = processed.flatMap(_.follows)
    val results = processed.filter(_.result != null).map(_.result)

    // O11-O13: statuses → live'; terminal rows split off to the archive log.
    // The parent pass is cached (hook) so the two split views share it.
    val (liveAfterStatus, archiveDelta) =
      Frontier.applyStatus(liveMarked, packs, now, hook(_))

    // O10 cron ticks (@every, scheduler.py:330-358): any tick in
    // ((n-1)*dt, n*dt] divisible by the interval re-injects the seeds as
    // force_update control candidates (the `_on_cronjob` → on_start path)
    val cronCands: Dataset[Task] =
      if (cfg.cronEverySec > 0 && cfg.seeds.nonEmpty && {
        val lo = (n - 1) * dt; val hi = now
        (lo.toLong / cfg.cronEverySec) != (hi.toLong / cfg.cronEverySec) ||
          hi.toLong % cfg.cronEverySec == 0
      }) seedTasks(cfg.seeds)
      else spark.emptyDataset[Task]

    // D1-D6 + P11: follows into the frontier, checked against the seen-set
    // (bloom pre-filter + broadcast-semi-join against the archive log —
    // the archive is never shuffled, see Frontier.mergeIntoLive)
    val candidates = Frontier.mergeCandidates(follows.union(cronCands))
    val newLive = hook(Frontier.mergeIntoLive(liveAfterStatus, candidates,
      store.readArchive(n - 1), seenBloom, now, n, p.depthLimit, hook))

    // token carry (O5/O6 closed form) — one pass for both bucket kinds
    val tokensUnified = Frontier.consumedTokensUnified(
      selected.toDF(), store.readTokensUnified(n - 1),
      p.hostRate, p.hostBurst, p.rate, p.burst, dt)

    // ---- commit (manifest written last; see SnapshotStore) ---------------
    // Per-action driver planning is the fixed tax of a round, so counts ride
    // along the writes as observed metrics instead of separate count() jobs.

    // G1/F7 per-round counters: ONE aggregation over the cached process
    // output yields every counter including selected (1:1 with processed)
    // and the result count; this is also the action that materializes the
    // select→fetch→process caches. Collected rows (one per project) are
    // re-written as a LOCAL relation so the metrics append is shuffle-free.
    val metricRows = timed("metrics.collect")(processed.toDF()
      .groupBy(col("status.project").as("project"))
      .agg(count(lit(1)).as("processed"),
        sum(when(col("status.processOk"), 1).otherwise(0)).as("ok"),
        sum(when(col("status.statusCode") === 200, 1).otherwise(0)).as("fetch_200"),
        sum(when(col("status.statusCode") === 304, 1).otherwise(0)).as("fetch_304"),
        sum(when(col("status.statusCode") >= 400, 1).otherwise(0)).as("fetch_err"),
        sum(when(col("result").isNotNull, 1).otherwise(0)).as("results_cnt"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect())
    // quiet rounds still record a (zero) metrics row — the counter log is
    // gapless per round, like the reference's 60 s counter dumps
    val metricRows0 =
      if (metricRows.nonEmpty) metricRows
      else Array((cfg.project.name, 0L, 0L, 0L, 0L, 0L, 0L))
    val selectedCount = metricRows0.map(_._2).sum
    val resultRows = metricRows0.map(_._7).sum

    // The four commit writes are independent — submit them CONCURRENTLY so
    // their driver planning + job latencies overlap (the serial driver time
    // between jobs is the round's fixed tax; see tools.RoundProfile).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val liveObs = new org.apache.spark.sql.Observation(s"live_$n")
    val archObs = new org.apache.spark.sql.Observation(s"arch_$n")
    val fLive = Future(timed("writeLive")(store.writeLive(n,
      newLive.observe(liveObs, count(lit(1)).as("rows")))))
    val fArch = Future(timed("writeArchive")(store.appendArchive(n,
      archiveDelta.observe(archObs, count(lit(1)).as("rows")))))
    val fRes = Future(timed("writeResults")(store.appendResults(n,
      if (resultRows < 100_000) results.toDF().coalesce(1) else results.toDF())))
    val fTok = Future(timed("writeTokens")(
      store.writeTokensUnified(n, tokensUnified.coalesce(1))))
    Await.result(Future.sequence(Seq(fLive, fArch, fRes, fTok)), Duration.Inf)
    val liveRows = liveObs.get("rows").asInstanceOf[Long]
    val archRows = archObs.get("rows").asInstanceOf[Long]

    val metrics = spark.createDataset(metricRows0.map(r =>
        (r._1, r._2, r._3, r._4, r._5, r._6)).toSeq)
      .toDF("project", "processed", "ok", "fetch_200", "fetch_304", "fetch_err")
      .withColumn("round", lit(n)).withColumn("now", lit(now))
      .withColumn("selected", lit(selectedCount))
      .withColumn("live_rows", lit(liveRows))
      .withColumn("archived", lit(archRows))
      .withColumn("results", lit(resultRows))
    timed("writeMetrics")(store.appendMetrics(n, metrics.coalesce(1)))

    // fold this round's archived keys into the seen-bloom (incremental)
    seenBloom.foreach { bf =>
      if (archRows > 0)
        bf.mergeInPlace(archiveDelta.toDF().stat
          .bloomFilter("taskid", cfg.bloomExpected, 0.01))
    }

    store.commit(n, now, liveRows, archRows, archiveTotal + archRows, resultRows,
      selectedCount,
      Seq("live" -> liveRows, "archive_delta" -> archRows, "results" -> resultRows))

    cached.foreach(_.unpersist())
    RoundStats(n, now, selectedCount, liveRows, archRows, resultRows)
  }

  private val roundLog = sys.env.contains("GRAFT_ROUND_LOG")

  /** Crawl until `maxRounds` or quiescence (nothing selected). Returns stats
    * per executed round. */
  def crawl(seeds: Seq[String], maxRounds: Int): Seq[RoundStats] = {
    var n = initOrResume(seeds)
    val stats = scala.collection.mutable.ArrayBuffer.empty[RoundStats]
    var quiet = false
    while (!quiet && n < maxRounds) {
      n += 1
      val t0 = System.nanoTime()
      val s0 = runRound(n)
      val s = s0.copy(wallSec = (System.nanoTime() - t0) / 1e9)
      if (roundLog) System.err.println(
        f"[round ${s.round}%3d] selected=${s.selected}%7d live=${s.newLive}%7d " +
        f"archived=${s.archived}%7d results=${s.results}%7d ${s.wallSec}%6.2fs")
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

  /** S9 result export (reference libs/result_dump.py:16-121): the common
    * fields of the JSON results are lifted to columns (schema inference —
    * native here) and dumped as JSONL or CSV. */
  def exportResults(path: String, format: String = "json"): Unit = {
    val raw = resultsDF()
    val parsed = spark.read.json(raw.select("result").as[String])
    val out = raw.drop("result")
      .join(parsed.withColumnRenamed("url", "result_url"),
        col("url") === col("result_url"), "left_outer")
      .drop("result_url")
    format match {
      case "json" => out.write.mode("overwrite").json(path)
      case "csv"  => out.write.mode("overwrite").option("header", "true").csv(path)
      case other  => throw new IllegalArgumentException(s"format: $other")
    }
  }
}
