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

/** One project's full declaration (reference scheduler projects dict,
  * pyspider-master/pyspider/scheduler/scheduler.py:90-149 + INI configs,
  * libs/read_project_config.py:55-160): config knobs + seeds + compiled
  * callbacks. Per-project callbacks override the engine registry. */
case class ProjectSpec(
    config: ProjectConfig,
    seeds: Seq[String] = Nil,
    seedCallback: String = "bfs_page",
    cronEverySec: Long = 0L, // O10: @every interval in logical secs; 0 = off
    callbacks: Map[String, Handler] = Map.empty)

/** Engine configuration. Single-project fields (project/seeds/seedCallback/
  * cronEverySec) remain for the common case; `projects` switches the engine
  * to multi-project mode (per-project rate/burst/depth/caps/callbacks —
  * scheduler.py:124-125 wires rate/burst per project). */
case class EngineConfig(
    project: ProjectConfig = ProjectConfig("default"),
    callbacks: Map[String, Handler] = Handlers.registry,
    seedCallback: String = "bfs_page",
    roundDt: Double = 30.0, // logical seconds per round (LOOP analog)
    checkpointDir: String,
    useBloom: Boolean = true,
    // above this the driver-side whole-archive bloom is replaced by
    // bucket-local blooms built at compaction (SeenSet.BucketBlooms)
    bloomCap: Long = 50_000_000L,
    bloomBuckets: Int = 64, // bucket count for the bucket-local bloom set
    bloomMinRows: Long = 100_000L, // below this the exact join is cheaper
    bloomExpected: Long = 4_000_000L, // sizing; identical for all merges
    cronEverySec: Long = 0L, // O10: @every interval in logical secs; 0 = off
    seeds: Seq[String] = Nil, // re-injected by each due cron tick
    projects: Seq[ProjectSpec] = Nil, // multi-project mode when non-empty
    // size gate for every candidate-derived broadcast (fetch build side,
    // status packs, merge candidates): bounded batches broadcast (the big
    // frontier/archive/corpus sides stream map-side, zero exchange); bigger
    // batches switch to SHUFFLE_HASH co-partitioned joins — a 10^6-row
    // broadcast is a serial driver-side collect (the measured scaling
    // killer) and must never happen. Status/merge gates use the ROUND'S
    // MEASURED counts (selected / emitted follows), not an estimate.
    broadcastFetchMax: Long = 200_000L,
    // fold the archive log to latest-per-key every K rounds so readArchive
    // stops unioning every round dir (round cost stays flat over a long
    // crawl); 0 disables
    compactEvery: Int = 16,
    // snapshot expiration (Iceberg expire_snapshots analog), run at the
    // compaction cadence: drop live/delta/token state unreachable from the
    // head (keeping this margin of recent rounds) plus archive deltas folded
    // into the latest compaction. 0 disables — the library default, so
    // historical readLive(k) time travel keeps working in dev/tests;
    // CrawlMain (the production main) turns it on.
    expireKeepLast: Int = 0,
    // bucketed copy-on-write live snapshots (Iceberg-manifest analog): the
    // frontier is hash-bucketed by taskid and a round rewrites ONLY the
    // buckets its selected/candidate keys touch — O(changed), not O(|live|),
    // per round at 10^10-frontier scale. 0 = plain whole-snapshot writes.
    liveBuckets: Int = 32,
    // below this live size a whole rewrite is cheaper than COW bookkeeping
    cowMinLive: Long = 100_000L,
    // merge-on-read live deltas (the O(selected)-write round; see
    // SnapshotStore.writeLiveDelta): a bounded round writes only
    // upsert/delete delta files and readers overlay them BROADCAST over the
    // last materialized snapshot. This caps the cumulative overlay rows —
    // past it (or at compaction cadence) the round materializes a full
    // snapshot and the chain resets. 0 disables (always materialize).
    // Size it to the broadcast budget: overlay rows × ~60 B must fit the
    // driver/executor broadcast comfort zone.
    morOverlayMax: Long = 1_000_000L,
    // frontier block-cache budget (rows): a round whose previous live count
    // fits shares ONE cached scan between selection and merge (fastest at
    // bench scale); past it the frontier is STREAMED — pruned columnar
    // scans with bounded outputs, zero block-store residency (the only
    // shape possible at 10^10 rows). 0 = always stream on MOR rounds.
    liveCacheMaxRows: Long = 10_000_000L,
    // non-null: the fetcher materializes its url-unique corpus view ONCE as
    // a url-bucketed, url-sorted parquet table under this dir (the 100-TB
    // shape — per-round fetch joins reuse the bucketing with zero corpus
    // exchange and zero block-cache residency); null keeps the legacy
    // block-store cache (small ad-hoc corpora)
    corpusDir: String = null) {
  def allProjects: Seq[ProjectSpec] =
    if (projects.nonEmpty) projects
    else Seq(ProjectSpec(project, seeds, seedCallback, cronEverySec))
}

case class RoundStats(round: Long, now: Double, selected: Long, newLive: Long,
                      archived: Long, results: Long, wallSec: Double = 0.0)

/** One page processed by a handler. Everything the scheduler + result worker
  * need flows out of one `mapPartitions` pass (reference processor,
  * pyspider-master/pyspider/processor/processor.py:109-211). Follows ride as
  * FLAT FollowLite rows — encoding a full nested Task per extracted link was
  * measured as the dominant cost of a BFS round. */
case class ProcessOut(status: StatusPack, follows: Seq[FollowLite], result: ResultRow)

/** G1 event-time model (VERDICT r3 next-round 5). The reference's counter
  * tracks 5-minute sliding AVERAGES of per-task `track.fetch.time` /
  * `track.process.time` (pyspider-master/pyspider/libs/counter.py:325-427,
  * wired scheduler/scheduler.py:73-88) — real wall times of its per-task
  * fetch/process calls. This engine fetches from a corpus table and
  * processes set-at-a-time, so a per-task wall clock neither exists nor
  * would be deterministic (wall times written into frontier rows would break
  * the MOR/COW bit-parity and resume-replay invariants). The stand-in is a
  * DETERMINISTIC cost model of the tracked quantities — bytes downloaded and
  * work processed — quantized to whole MICROSECONDS so that any sum of them
  * is an exact integer in a Double and every aggregate is independent of
  * partitioning order:
  *   fetch  ≈ 5 ms request latency + html bytes at 50 MB/s
  *   process≈ 1 ms dispatch + text chars at 100 M/s + 10 µs per follow
  * Per-round per-project (avg, count) pairs are appended to the metrics log;
  * any sliding-window average (the reference's 5m/1h/1d) is reconstructible
  * from them as Σ(avg·count)/Σcount over the window's rounds. */
object TimeModel {
  def fetchUs(htmlBytes: Int): Long = 5000L + htmlBytes / 50
  def processUs(textChars: Int, follows: Int): Long =
    1000L + textChars / 100 + follows * 10L
  def fetchSec(htmlBytes: Int): Double = fetchUs(htmlBytes) / 1e6
  def processSec(textChars: Int, follows: Int): Double =
    processUs(textChars, follows) / 1e6
}

/** The crawl loop: each reference scheduler tick (scheduler.py:524-554)
  * becomes one deterministic batch ROUND — a single Dataset DAG from
  * frontier snapshot to frontier snapshot (SURVEY §3.1 restatement):
  *
  *   candidates = follows ∪ seeds ∪ control → dedup/merge (D1-D6) → MERGE live
  *   select (O2-O7 windows/filters) → fetch (corpus join, S4)
  *   → process mapPartitions (P1-P14, P15 messages) → (statusΔ, follows′, results)
  *   → snapshot commit (checkpoint/resume).
  *
  * No wall clock anywhere inside jobs: `now = round * roundDt`.
  */
class CrawlEngine(corpus: Dataset[Page], cfg: EngineConfig)
                 (implicit spark: SparkSession) {
  import spark.implicits._

  val store = new SnapshotStore(cfg.checkpointDir)
  val fetcher: FetchService = new CorpusFetcher(corpus,
    workDir = cfg.corpusDir, broadcastMax = cfg.broadcastFetchMax)

  // ---- per-project wiring (driver-known, tiny) --------------------------
  private val specs = cfg.allProjects
  private val configs = specs.map(_.config)
  private val headCfg = configs.head
  private val cbByProject: Map[String, Map[String, Handler]] =
    specs.map(s => s.config.name -> (cfg.callbacks ++ s.callbacks)).toMap
  // P11 per-project depth limits (only bounded ones; absent = unlimited)
  private val depthLimits: Map[String, Int] =
    configs.filter(_.depthLimit != -1).map(c => c.name -> c.depthLimit).toMap
  private val timeouts: Map[String, Any] =
    configs.map(c => c.name -> c.processingTimeout).toMap
  private val robotsRespect: Map[String, Any] =
    configs.map(c => c.name -> c.respectRobots).toMap
  private val anyRobots = configs.exists(_.respectRobots)
  private val inqueueLimits: Map[String, Any] = // O9; only bounded projects
    configs.filter(_.inqueueLimit > 0).map(c => c.name -> c.inqueueLimit).toMap
  /** O9 bookkeeping — per-project |live| as of the last committed round,
    * maintained incrementally across MOR rounds (live(n) = live(n−1) −
    * touched + upserts, the per-project twin of the manifest's live-total
    * arithmetic) so the pending check never rescans the frontier in steady
    * state. None = unknown (fresh resume, or after a rewrite round): the
    * next O9 round re-seeds it with one narrow project-column scan. Only
    * maintained when an inqueue limit is configured. */
  private var pendLiveCounts: Option[Map[String, Long]] = None
  private val followFilters: Map[String, (Set[String], String)] = configs // P7
    .filter(c => c.allowDomains.nonEmpty || c.denyPattern != null)
    .map(c => c.name -> (c.allowDomains.toSet, c.denyPattern)).toMap
  private val saveHtmlProjects: Set[String] = // S8
    configs.filter(_.saveHtml).map(_.name).toSet
  // O15 — project lifecycle (projectdb statuses; scheduler task_verify
  // accepts only DEBUG/RUNNING): a non-active project's rows are frozen in
  // the frontier (never selected) and its new candidates are dropped
  private val activeProjects: Set[String] =
    configs.filter(c => ProjectConfig.isActive(c.status)).map(_.name).toSet
  private val anyInactive = activeProjects.size < configs.size
  private def onlyActive(ds: Dataset[Task]): Dataset[Task] =
    if (!anyInactive) ds
    else ds.filter(col("project").isin(activeProjects.toSeq: _*))
  private val maxTimeout = configs.map(_.processingTimeout).max
  private val globalLoopLimit = configs.map(_.loopLimit).max
  /** hard cap on a round's selection implied by per-project fairness caps;
    * MaxValue when any project is unbounded. */
  private val politenessBound: Long = {
    val caps = configs.map(c =>
      if (c.loopLimit >= Int.MaxValue / 2) Long.MaxValue
      else math.max(1L, (c.loopLimit / 10).toLong))
    if (caps.contains(Long.MaxValue)) Long.MaxValue else caps.sum
  }

  /** Incremental URL-seen bloom over archive taskids (north rule): built
    * once at init/resume, then each round's archive delta is OR-ed in
    * (`mergeInPlace`). All blooms share `bloomExpected` so bit layouts are
    * compatible. Pre-filter only — exact anti/left joins remain the truth
    * (bloom FPR must never corrupt the seen set, SURVEY §7).
    *
    * Two regimes share this var:
    *  - driver mode (archive ≤ bloomCap): `seenBloom` covers the WHOLE
    *    archive;
    *  - bucket mode (archive > bloomCap): per-bucket blooms co-located with
    *    the archive compaction carry the bulk (`bucketBlooms` points at
    *    them; executors load lazily — SeenSet.BucketBlooms) and `seenBloom`
    *    holds only the post-compaction DELTA (bounded by compactEvery
    *    rounds) — driver memory stays O(1) at a 10^10-key archive
    *    (VERDICT r2 missing item 2: the silent no-bloom fallback). */
  /** Diagnostics: rounds whose MOR merge leg ran bucket-pruned (tests assert
    * the pruned path actually engaged; FlatRound logs it). */
  var prunedMergeRounds: Long = 0L
  /** Diagnostics: O9 full-frontier pending scans — the carry keeps this at
    * ONE per seed/invalidation across MOR rounds (tests assert it). */
  var o9PendScans: Long = 0L

  private var seenBloom: Option[org.apache.spark.util.sketch.BloomFilter] = None
  private var bucketBlooms: Option[(String, Int)] = None
  private def seenProbe: Option[SeenSet.Probe] = bucketBlooms match {
    case Some((dir, b)) => Some(SeenSet.BucketBlooms(dir, b, seenBloom))
    case None => seenBloom.map(SeenSet.DriverBloom.apply)
  }
  private def emptyDeltaBloom() =
    org.apache.spark.util.sketch.BloomFilter.create(cfg.bloomExpected, 0.01)

  /** (Re)build the probe when the archive enters the size band where it
    * pays: below bloomMinRows the exact broadcast-semi join is cheaper than
    * the extra per-round bloom jobs; above bloomCap the driver-side sketch
    * is replaced by the bucket-local blooms built at compaction (if none
    * exist yet — archive crossed the cap mid-cadence — candidates pay the
    * exact join until the next compaction builds them). Building is one
    * pass, amortized: once built it is maintained incrementally
    * (mergeInPlace of each round's delta). */
  private def maybeInitBloom(upTo: Long): Unit = {
    if (!cfg.useBloom || seenBloom.isDefined) return
    val total = store.archiveTotalOf(upTo)
    if (total < cfg.bloomMinRows) return
    if (total <= cfg.bloomCap) {
      seenBloom = Some( // coalesce: bound the per-partition bitmap partials
        store.readArchive(upTo).toDF().coalesce(16).stat
          .bloomFilter("taskid", cfg.bloomExpected, 0.01))
    } else store.latestArchiveBlooms(upTo).foreach { case (c, b) =>
      bucketBlooms = Some((store.bloomsDir(c), b))
      val delta = store.readArchiveDeltasAfter(c, upTo)
      seenBloom = Some(
        if (delta.isEmpty) emptyDeltaBloom()
        else delta.toDF().coalesce(16).stat
          .bloomFilter("taskid", cfg.bloomExpected, 0.01))
    }
  }

  /** robots.txt rules parsed from the corpus (host → disallow prefixes),
    * built DISTRIBUTED and materialized ONCE under the checkpoint dir —
    * never collected to the driver (VERDICT r2 wrong-at-scale item 1: at
    * 10^7+ hosts a one-row-per-host collect is a driver OOM). Gating happens
    * at ADMISSION time against the round-bounded candidate batch, so the
    * per-round live path pays zero robots cost; the rules side broadcasts
    * only below the MEASURED host-count gate, else it joins co-partitioned
    * by host. A resume reuses the materialized table (no corpus re-scan). */
  lazy val robotsRules: DataFrame = robotsTable._1
  private lazy val robotsTable: (DataFrame, Long) = {
    val dir = s"${cfg.checkpointDir}/robots"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS"))) {
      // scan the fetcher's url-unique view when available (one corpus
      // materialization serves fetch + robots + redirects)
      val src = fetcher match {
        case c: CorpusFetcher => c.view
        case _ => corpus
      }
      src.filter(col("url").endsWith("/robots.txt"))
        .map { p =>
          val host = UrlCanon.mainDomain(p.url)
          (host, HtmlLite.robotsDisallows(new String(p.html, "UTF-8")))
        }
        .toDF("host", "disallow_prefixes")
        .write.mode("overwrite").parquet(dir)
    }
    val df = spark.read.parquet(dir)
    (df, df.count())
  }

  /** Candidate-admission robots gate: split the post-dedup fresh inserts /
    * restarts into (allowed, denied-as-BAD). Denied rows join the archive —
    * in the seen-set once (a later rediscovery dedups against them like any
    * archived row), never in the live frontier. */
  private def robotsGate(now: Double)(fresh: Dataset[Task])
      : (Dataset[Task], Dataset[Task]) = {
    val (rules, nHosts) = robotsTable
    val rulesSide = if (nHosts <= cfg.broadcastFetchMax) broadcast(rules) else rules
    val joined = fresh.join(rulesSide, Seq("host"), "left_outer")
      .withColumn("__denied", Frontier.robotsDeniedCol(robotsRespect))
    val cols = Frontier.taskColumns.map(col)
    val allowed = joined.filter(!col("__denied")).select(cols: _*).as[Task]
    val denied = joined.filter(col("__denied"))
      .withColumn("status", lit(Status.Bad))
      .withColumn("updatetime", Frontier.dynLit(now))
      .select(cols: _*).as[Task]
    (allowed, denied)
  }

  private def seedsFor(spec: ProjectSpec, fallback: Seq[String]): Seq[String] =
    if (spec.seeds.nonEmpty) spec.seeds
    else if (specs.size == 1) fallback
    else Nil

  def seedTasks(spec: ProjectSpec, urls: Seq[String]): Dataset[Task] = {
    // Scheduler.add_seed semantics (scheduler.py:593-614): md5 taskid,
    // force_update, depth 0, ACTIVE.
    val project = spec.config.name
    val cb = spec.seedCallback
    spark.createDataset(urls).map { u =>
      val canon = UrlCanon.canonicalize(u)
      Task(taskid = UrlCanon.taskId(canon), project = project, url = canon,
        status = Status.Active, host = UrlCanon.mainDomain(canon), depth = 0,
        schedule = Schedule(force_update = true),
        process = ProcessOpts(callback = cb))
    }
  }

  def seedTasks(urls: Seq[String]): Dataset[Task] = seedTasks(specs.head, urls)

  private def allSeedTasks(fallback: Seq[String]): Dataset[Task] =
    specs.map(s => seedTasks(s, seedsFor(s, fallback)))
      .reduceOption(_ union _).getOrElse(spark.emptyDataset[Task])

  /** Initialize round 0 from seeds, or resume from the last committed
    * snapshot (north rule: killed job resumes mid-crawl). */
  def initOrResume(seeds: Seq[String]): Long = {
    store.lastCommitted() match {
      case Some(n) =>
        store.truncateAfter(n) // clear any torn round n+1 garbage
        n
      case None =>
        // seeds pass the same admission gate as follows (a /robots.txt-denied
        // seed is archived BAD at round 0, never queued)
        val seedsAll = allSeedTasks(seeds)
        val (live, deniedSeeds) =
          if (anyRobots) robotsGate(0.0)(seedsAll)
          else (seedsAll, spark.emptyDataset[Task])
        val deniedCount = if (anyRobots) deniedSeeds.count() else 0L
        if (deniedCount > 0) store.appendArchive(0, deniedSeeds)
        val liveRows =
          if (cfg.liveBuckets > 0)
            store.writeLiveBucketed(0, live.toDF()
                .withColumn("__bucket", store.bucketCol(cfg.liveBuckets)),
              None, cfg.liveBuckets)
          else { store.writeLive(0, live); store.readLive(0).count() }
        store.writeTokensUnified(0,
          Seq.empty[(String, String, Double)].toDF("kind", "key", "tokens"))
        store.commit(0, 0.0, liveRows, deniedCount, deniedCount, 0, 0,
          Seq("live" -> liveRows, "archive_delta" -> deniedCount))
        0L
    }
  }

  /** P9 callback dispatch + P10 follow construction + P14 status assembly +
    * P15 message dispatch — one typed pass over the fetch output
    * (processor.py:109-211; messages :183-199 run in the SAME pass against
    * the target project's `_on_message` callback with a synthetic 200). */
  def process(fetched: Dataset[(Task, FetchedPage)], now: Double): Dataset[ProcessOut] = {
    val cbs = cbByProject // local: avoid capturing `this`
    val okResult = graft.process.HandlerResult()
    fetched.mapPartitions { it =>
      it.flatMap { case (task, page) =>
        val fetchOk = page.statusCode == 200 || page.statusCode == 304
        val (hr, skipped) =
          if (page.statusCode == 304) (okResult, true) // P9 304 short-circuit
          else cbs.getOrElse(task.project, Map.empty).get(task.process.callback) match {
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
          Handlers.mkFollow(task, f, now, task.project))
        val status = StatusPack(
          taskid = task.taskid, project = task.project,
          fetchOk = fetchOk, statusCode = page.statusCode,
          fetchTime = TimeModel.fetchSec(page.html.length),
          encoding = page.encoding, contentHash = page.contentHash,
          fetchError = page.error,
          processOk = fetchOk && hr.ok,
          processTime =
            if (skipped) TimeModel.processSec(0, 0) // 304 short-circuit
            else TimeModel.processSec(page.text.length, follows.size),
          follows = follows.size, exception = hr.exception,
          redirectUrl = if (page.url != task.url && page.statusCode == 200)
            page.url else null)
        val result =
          if (hr.result != null)
            ResultRow(task.taskid, task.project, task.url, hr.result, now)
          else null
        val mainOut = ProcessOut(status, follows, result)
        // P15 — send_message: dispatch to the TARGET project's `_on_message`
        // here and now (processor.py:183-199 calls on_task synchronously
        // with a synthetic 200 carrying (from_project, msg) in save).
        // Its status pack keys on md5('data:,on_message') which never
        // matches a live row, so it flows through applyStatus as a no-op —
        // the reference's @not_send_status analog.
        val msgOuts = hr.messages.flatMap { case (toProj, msg) =>
          val murl = "data:,on_message"
          val mTask = Task(taskid = UrlCanon.md5Hex(murl), project = toProj,
            url = murl, status = Status.Active, host = "", depth = 0,
            process = ProcessOpts(callback = "_on_message"))
          val mPage = FetchedPage(murl, 200, Array.emptyByteArray, "utf-8", "",
            null, 0L, null,
            save = s"""{"from": ${Handlers.jsonStr(task.project)}, "msg": $msg}""")
          cbs.getOrElse(toProj, Map.empty).get("_on_message").map { h =>
            val r = try h.onPage(mTask, mPage)
              catch { case e: Exception =>
                graft.process.HandlerResult(ok = false,
                  exception = s"${e.getClass.getSimpleName}: ${e.getMessage}") }
            val mFollows = r.follows.map(f => Handlers.mkFollow(mTask, f, now, toProj))
            ProcessOut(
              StatusPack(mTask.taskid, toProj, fetchOk = true, statusCode = 200,
                fetchTime = TimeModel.fetchSec(0), encoding = "utf-8",
                contentHash = null, fetchError = null, processOk = r.ok,
                processTime = TimeModel.processSec(0, mFollows.size),
                follows = mFollows.size, exception = r.exception,
                redirectUrl = null, isMessage = true),
              mFollows,
              if (r.result != null) ResultRow(mTask.taskid, toProj, murl, r.result, now)
              else null)
          }
        }
        Iterator.single(mainOut) ++ msgOuts
      }
    }
  }

  /** P7 — allow/deny follow filters (reference spider/lxml_extractor.py:
    * 92-123), per project, as COLUMNAR predicates over the flat follow
    * stream (RLIKE is java-regex find(), matching the reference's
    * Pattern.search semantics). Identity when no project configures one. */
  private def applyFollowFilters(follows: DataFrame): DataFrame =
    if (followFilters.isEmpty) follows
    else followFilters.foldLeft(follows) { case (df, (p, (allow, deny))) =>
      df.filter(col("project") =!= p ||
        ((if (allow.isEmpty) lit(true)
          else col("host").isin(allow.toSeq: _*)) &&
         (if (deny == null) lit(true) else !col("url").rlike(deny))))
    }

  /** O9 — INQUEUE_LIMIT (scheduler.py:41,314-316): while a project's pending
    * queue is at/over its limit, non-forced new candidates are dropped.
    * `pend` is the per-project pending count, computed by the caller as
    * |live(n-1)| − |archived this round| per project (equals the
    * post-status queue size without scanning the post-status frontier — the
    * bucket-pruned legs never materialize it in full). Projects are
    * driver-known, so the counts ride as a map-literal column (no join). */
  private def applyInqueueLimit(cands: Dataset[Task], pend: Map[String, Long]): Dataset[Task] =
    if (inqueueLimits.isEmpty) cands
    else {
      val limCol = Frontier.perProject(inqueueLimits, 0)
      val pendCol = Frontier.perProject(
        pend.map { case (k, v) => k -> (v: Any) }, 0L)
      cands.filter(col("schedule.force_update") || limCol <= 0 || pendCol < limCol)
    }

  /** O14 — restart archived tasks of `project` with status in `statuses` as
    * force_update control candidates for the NEXT round
    * (scheduler.py:577-591: skip still-pending tasks and data:/curl: urls). */
  def restartByStatus(project: String, statuses: Set[Int]): Long = {
    val n = store.lastCommitted().getOrElse(0L)
    val liveKeys = store.readLive(n).select("project", "taskid")
    val restart = SeenSet.latest(store.readArchive(n))
      .filter(t => t.project == project && statuses.contains(t.status) &&
        !t.url.startsWith("data:") && !t.url.startsWith("curl:"))
      .toDF().join(liveKeys, Seq("project", "taskid"), "left_anti").as[Task]
      .map(t => t.copy(status = Status.Active,
        schedule = t.schedule.copy(force_update = true, retried = 0)))
    store.writeControl(n + 1, restart)
    store.readControl(n + 1).count()
  }

  /** O15 — project DELETE (reference scheduler._check_delete drops the
    * project's taskdb/resultdb data): purge the project's frontier + seen-set
    * physically and tombstone its results/html/metrics (logical delete,
    * Iceberg-delete-file style; `store.vacuum()` does the physical rewrite).
    * Re-adding the project later re-crawls from scratch. */
  def deleteProject(project: String): Unit = {
    val n = store.lastCommitted().getOrElse(
      throw new IllegalStateException("nothing committed yet"))
    store.purgeProject(n, project)
    pendLiveCounts = pendLiveCounts.map(_ - project) // O9 carry: now 0 rows
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
    timed("bloom.init")(maybeInitBloom(n - 1))
    val cached = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]
    def hook[T](d: Dataset[T]): Dataset[T] = {
      // idempotent: a plan already in the cache (hooked twice in one round,
      // or matching a long-lived cache like the fetcher's corpus view) is
      // returned as-is — re-persisting was a no-op that spammed the log
      // with `CacheManager: Asked to cache already cached data` and hid
      // real cache regressions (VERDICT r5 item 6)
      if (d.storageLevel != StorageLevel.NONE) d
      else { val h = d.persist(StorageLevel.MEMORY_AND_DISK); cached += h; h }
    }

    val live0 = store.readLive(n - 1)
    val (hostTok, projTok) = store.readTokens(n - 1)
    val archiveTotal = store.archiveTotalOf(n - 1)
    val prevLiveRows = store.liveRowsOf(n - 1)

    // fetch (S4) + process (P*). Round planning is SIZE-GATED, always with
    // STATIC plans (no AQE re-planning tax):
    //  - bounded round (the production shape): broadcast hints on every
    //    candidate-derived side — the frontier/corpus stream map-side;
    //  - BFS-explosion round (bench ramp-up): SHUFFLE_HASH hints — executor-
    //    parallel co-partitioned joins, no sorts, and NO driver-side collect
    //    of a 10^6-row batch (a large broadcast is serial driver time: the
    //    measured reason cluster scaling was flat).
    // The fetch decision must be made BEFORE the batch is materialized, so
    // it uses the politeness bound / previous live count; the status/merge
    // decisions below use the round's MEASURED counts.
    val bcastFetch = politenessBound <= cfg.broadcastFetchMax ||
      prevLiveRows.forall(_ <= cfg.broadcastFetchMax)

    // BUCKET-PRUNED rounds (VERDICT r2 top item): when the previous snapshot
    // is bucketed under the configured count, big enough for COW to pay, and
    // holds no PROCESSING row (the timeout requeue is provably a no-op), the
    // merge/status legs read ONLY the buckets touched by this round's
    // selected/candidate keys — round compute is O(selected + changed
    // buckets), not O(|live|). The selection scan below still streams the
    // full frontier (columnar, pruned-column parquet scan), uncached: the
    // full set is never materialized into executor memory.
    val B = cfg.liveBuckets
    val cowPlausible = B > 0 && store.processingRowsOf(n - 1) == 0L &&
      store.readLiveManifest(n - 1).exists(_.size == B) && // A1 count guard
      prevLiveRows.exists(_ >= cfg.cowMinLive)

    // MERGE-ON-READ rounds (the true O(selected)-write shape): bucket COW
    // degenerates to a full rewrite whenever the round touches most buckets
    // — and selected/candidate keys are hash-uniform, so it almost always
    // does. When the previous round is quiescent (no PROCESSING row), the
    // frontier is big enough for delta bookkeeping to pay, and the overlay
    // budget has room, this round writes only row-level up/del deltas and
    // the merge/status legs see just the rows whose keys the round touches
    // (semi-join fetch — bounded output, the frontier itself never rewritten
    // or shuffled). Materialization happens at compaction cadence or when
    // the overlay budget fills. The per-round gate on MEASURED candidate
    // counts is applied in buildMergeLeg (morRound).
    val prevOverlayRows = store.liveOverlayRows(n - 1)
    val morPlausible = cfg.morOverlayMax > 0 &&
      store.processingRowsOf(n - 1) == 0L &&
      prevLiveRows.exists(_ >= cfg.cowMinLive) &&
      prevOverlayRows < cfg.morOverlayMax &&
      !(cfg.compactEvery > 0 && n % cfg.compactEvery == 0)

    // O4 requeue (robots are admission-time now — zero per-round live cost),
    // then O3 due / O2 priority / O5-O7 budgets
    val __planT0 = System.nanoTime()
    val requeued = Frontier.reactivateTimeouts(live0, now, timeouts, maxTimeout)
    // full (non-pruned) rounds cache the frontier: selection + merge share
    // it. Pruned rounds STREAM it instead — a politeness-bounded MOR round
    // would otherwise persist the whole frontier into the block store
    // (O(|live|) memory/disk residency, impossible at 10^10 rows) to save
    // two extra columnar scans whose outputs are already bounded: the
    // narrow rank frame is cached separately (persistHook), and the
    // key-fetch / merge semi-joins stream the pruned parquet scan map-side.
    val streamLive = cowPlausible ||
      (morPlausible && politenessBound <= cfg.broadcastFetchMax &&
        prevLiveRows.forall(_ > cfg.liveCacheMaxRows))
    val live = if (streamLive) requeued else hook(requeued)
    val dueNow = onlyActive(Frontier.due(live, now)) // O15: frozen projects skipped
    val selected = hook(Frontier.select(dueNow.toDF(), configs,
      headCfg.hostRate, headCfg.hostBurst, globalLoopLimit,
      dt, hostTok, projTok,
      dueBound = prevLiveRows.getOrElse(Long.MaxValue),
      broadcastKeys = bcastFetch,
      persistHook = df => hook(df)).as[Task])

    val fetchedRaw = fetcher.fetch(selected, hook(_), bcastFetch)
    val fetched = if (saveHtmlProjects.nonEmpty) hook(fetchedRaw) else fetchedRaw
    val processed = hook(process(fetched, now))

    // G1/F7 per-round counters: ONE aggregation over the cached process
    // output yields every counter including selected (1:1 with processed),
    // the result count AND the emitted-follows total; this is also the
    // action that materializes the select→fetch→process caches, and its
    // measured counts drive the status/merge join strategies below.
    // Collected rows (one per project) are re-written as a LOCAL relation so
    // the metrics append is shuffle-free.
    if (phaseLog) System.err.println(
      f"      [phase] plan.preFetch    ${(System.nanoTime() - __planT0) / 1e9}%6.2fs")
    val metricRows = timed("metrics.collect")(processed.toDF()
      .groupBy(col("status.project").as("project"))
      .agg(count(lit(1)).as("processed"),
        sum(when(col("status.processOk"), 1).otherwise(0)).as("ok"),
        sum(when(col("status.statusCode") === 200, 1).otherwise(0)).as("fetch_200"),
        sum(when(col("status.statusCode") === 304, 1).otherwise(0)).as("fetch_304"),
        sum(when(col("status.statusCode") >= 400, 1).otherwise(0)).as("fetch_err"),
        sum(when(col("result").isNotNull, 1).otherwise(0)).as("results_cnt"),
        sum(col("status.follows")).as("follows_cnt"),
        // G1 event averages (counter.py:325-427): the TimeModel micros are
        // recovered as exact longs (round() kills the us/1e6 representation
        // error), so these sums — and the averages derived from them — are
        // bit-identical under any partitioning of the round
        sum(round(col("status.fetchTime") * 1e6).cast("long")).as("fetch_us"),
        sum(round(col("status.processTime") * 1e6).cast("long")).as("process_us"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect())
    // quiet rounds still record a (zero) metrics row — the counter log is
    // gapless per round, like the reference's 60 s counter dumps
    val metricRows0 =
      if (metricRows.nonEmpty) metricRows
      else Array((headCfg.name, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    val selectedCount = metricRows0.map(_._2).sum
    val resultRows = metricRows0.map(_._7).sum
    val followsCount = metricRows0.map(_._8).sum

    // COLUMNAR consumption of the cached process output: `.map(_.status)` /
    // `.flatMap(_.follows)` would deserialize every cached ProcessOut row —
    // including its array of full nested follow Tasks (~50 KB/row on fanout
    // 64) — into JVM objects once PER CONSUMER (~10^7 object graphs per big
    // round; measured as the round's dominant CPU+GC). select/explode stay
    // in Tungsten and column-prune straight into the cache.
    // O10 cron ticks (@every, scheduler.py:330-358): any tick in
    // ((n-1)*dt, n*dt] divisible by a project's interval re-injects that
    // project's seeds as force_update control candidates
    def tickDue(everySec: Long): Boolean = {
      val lo = (n - 1) * dt; val hi = now
      (lo.toLong / everySec) != (hi.toLong / everySec) ||
        hi.toLong % everySec == 0
    }
    val cronDue = specs
      .filter(s => activeProjects.contains(s.config.name) && // O15
        s.cronEverySec > 0 && seedsFor(s, cfg.seeds).nonEmpty &&
        tickDue(s.cronEverySec))

    // operator control rows for this round (O14 restart-by-status)
    val haveControl = store.hasControl(n)

    // O9 pending-count bookkeeping for this round (set inside buildMergeLeg,
    // consumed after the commit writes): the per-project base counts the
    // round started from and the per-project touched-row counts of the MOR
    // merge leg — both round-bounded collections.
    var o9Base: Option[Map[String, Long]] = None
    var o9Touched: Option[Map[String, Long]] = None

    // The status/merge legs below are built LAZILY (def): the zero-delta
    // fast path must not even construct them — analyzing + cache-registering
    // the big join plans costs driver seconds, and uncaching the resulting
    // never-materialized entries was measured at 18 s per quiet round.
    def buildMergeLeg(): (Dataset[Task], Dataset[Task], Dataset[ResultRow],
                          Option[Set[Int]], Option[(DataFrame, Long)]) = {
      // P15 message packs are EXCLUDED from the status stream (the
      // reference's @not_send_status, spider/base_handler.py `_on_message`):
      // they all share the constant taskid md5('data:,on_message'), so two
      // messages to one project in a round are DUPLICATE pack keys — the
      // applyStatus left-outer join would fan out any live row holding that
      // taskid into duplicate frontier rows (silent corruption). Dropping
      // them is also the faithful semantics: message dispatch never reports
      // a status. A REAL crawled `data:,on_message` task still reports via
      // its own (non-message) pack. One codegen'd boolean — zero shuffle.
      val packs = processed.select(col("status.*"))
        .filter(!col("isMessage")).as[StatusPack]
      val followsFlat = applyFollowFilters(
        processed.select(explode(col("follows")).as("__f"))
          .select(col("__f.*")))
      val results = processed.filter(col("result").isNotNull)
        .select(col("result.*")).as[ResultRow]

      val cronCands: Dataset[Task] = cronDue
        .map(s => seedTasks(s, seedsFor(s, cfg.seeds)))
        .reduceOption(_ union _).getOrElse(spark.emptyDataset[Task])
      val controlCands = store.readControl(n)
      // ADVICE r2: an O14 restart batch is archive-sized, not follows-sized —
      // the broadcast gate must count it (cron seeds are driver-known)
      val controlCount = if (haveControl) controlCands.count() else 0L
      val cronCount = cronDue.map(s => seedsFor(s, cfg.seeds).size.toLong).sum
      val bcastCands =
        followsCount + controlCount + cronCount <= cfg.broadcastFetchMax

      // D1-D6 + P7 + O9 + P11: follows into the frontier, checked against
      // the seen-set (bloom pre-filter + broadcast-semi-join against the
      // archive log INCLUDING this round's delta — the archive is never
      // shuffled, see Frontier.mergeIntoLive). The 10^7-row follow stream
      // merges FLAT (Frontier.mergeFollows) and is lifted to Tasks
      // post-collapse; the (driver-known-rare) cron/control Task streams
      // only force a second, cheap merge pass when actually present — the
      // two-level merge composes because the D5/D6 semantics are associative.
      val followsActive =
        if (!anyInactive) followsFlat
        else followsFlat.filter(col("project").isin(activeProjects.toSeq: _*))
      val followTasks = Frontier.mergeFollows(followsActive, now)
      val candidates0 = hook(
        if (cronDue.isEmpty && !haveControl) followTasks
        else Frontier.mergeCandidates(
          onlyActive(followTasks.union(cronCands).union(controlCands))))

      // MOR round gate on MEASURED counts: the round's touched key set
      // (selected ∪ candidates) must be broadcast-sized — it becomes the
      // semi-join build side here AND the written delta (bounded overlay)
      val morRound = morPlausible &&
        selectedCount + followsCount + controlCount + cronCount <=
          cfg.broadcastFetchMax

      // TOUCHED-BUCKET set (non-MOR fallback): only buckets holding a
      // selected or candidate key can change this round (timeout requeue
      // excluded by the processing-rows precondition in cowPlausible;
      // candidates0 is the pre-O9 superset — an O9-dropped candidate's
      // bucket is rewritten byte-identical, which is safe). Too many
      // touched → whole rewrite. With hash-uniform keys this almost always
      // degenerates — the MOR path above is the production shape; the
      // bucket path still wins when a round's keys cluster (single-host
      // recrawl) or MOR is disabled.
      // COUPON-COLLECTOR gate first: with ≥ 8·B hash-uniform keys every
      // bucket is touched w.h.p. (P[a bucket missed] ≤ B·e^-8 < 2%), so
      // the distinct-buckets job is a guaranteed-wasted extra job+collect
      // per BFS round — a fixed serial tax that does not shrink with
      // cluster size (measured as part of the 4N Amdahl residue). A missed
      // bucket would only cost an extra byte-identical rewrite, never
      // correctness, so the gate is purely a planning shortcut.
      val keysUpperBound =
        selectedCount + followsCount + controlCount + cronCount
      val changedBuckets: Option[Set[Int]] =
        if (morRound || !cowPlausible || keysUpperBound >= 8L * B) None
        else {
          val bc = store.bucketCol(B)
          val bks = timed("cow.buckets")(
            selected.toDF().select(bc.as("b"))
              .union(candidates0.toDF().select(bc.as("b")))
              .distinct().collect().map(_.getInt(0)).toSet)
          if (bks.size * 2 >= B) None else Some(bks)
        }
      // the merge/status legs see ONLY the touched rows: under MOR the
      // rows whose keys the round selected or rediscovered (semi-join
      // fetch, bounded output — the frontier streams one columnar scan and
      // is never shuffled); under bucket-COW the touched buckets; else the
      // full frontier (cached — selection + merge share it)
      val liveForMerge: Dataset[Task] =
        if (morRound) {
          val keysDF = selected.select(col("project"), col("taskid"))
            .union(candidates0.select(col("project"), col("taskid")))
          val semiKeys = broadcast(keysDF)
          // bucket-DPP analog: the touched keys' buckets are a bounded,
          // driver-known set — when it's a minority of the bucket count,
          // probe ONLY those buckets of the base snapshot (+ deltas
          // filtered to them) instead of scanning the whole frontier for a
          // bounded semi-join output. Exact because bucket = f(taskid);
          // the requeue pass is provably a no-op here (morPlausible
          // requires zero PROCESSING rows), so reading the store directly
          // loses nothing. At 10^10 rows with B=64k a 2k-key round reads
          // ~3% of the frontier; the fallback is the streaming full scan.
          // same coupon-collector planning gate as changedBuckets below:
          // ≥ 8·B hash-uniform keys touch every bucket w.h.p., so the
          // distinct job would only discover the full set — skip straight
          // to the streaming full scan (the semi-join output is bounded
          // either way; this is a planning shortcut, not a semantics change)
          val prunedSrc: Option[Dataset[Task]] =
            if (B <= 0 ||
                selectedCount + followsCount + controlCount + cronCount >= 8L * B)
              None
            else {
              val bks = timed("mor.buckets")(
                keysDF.select(store.bucketCol(B).as("b")).distinct()
                  .collect().map(_.getInt(0)).toSet)
              if (bks.size * 2 >= B) None
              else store.readLivePruned(n - 1, bks, B)
            }
          if (prunedSrc.isDefined) prunedMergeRounds += 1
          val src = prunedSrc.getOrElse(live)
          hook(src.join(semiKeys, Seq("project", "taskid"), "left_semi").as[Task])
        } else changedBuckets match {
          case Some(bks) => store.readLiveBuckets(n - 1, bks)
          case None => if (cowPlausible) hook(live) else live
        }

      // mark selected rows PROCESSING (the reference's processing queue, O4);
      // selected keys are all in touched buckets (bucket = f(taskid)).
      // selKeys is two narrow columns bounded by the selection — broadcast
      // (in bounded rounds) so the frontier is never shuffled for the marking
      val selKeys0 = selected.select(col("project"), col("taskid"))
        .withColumn("__sel", lit(true))
      val selKeys = if (bcastFetch) broadcast(selKeys0)
                    else selKeys0.hint("SHUFFLE_HASH")
      val liveMarked = liveForMerge.join(selKeys, Seq("project", "taskid"), "left_outer")
        .withColumn("status",
          when(col("__sel"), lit(Status.Processing)).otherwise(col("status")))
        .withColumn("selected_at", // dynLit: keep codegen source round-stable
          when(col("__sel"), Frontier.dynLit(now)).otherwise(col("selected_at")))
        .drop("__sel").as[Task]

      // O11-O13: statuses → live'; terminal rows split off to the archive
      // log. The parent pass is cached (hook) so the split views share it.
      val (liveAfterStatus, archiveDelta) =
        Frontier.applyStatus(liveMarked, packs, now, hook(_),
          broadcastPacks = selectedCount <= cfg.broadcastFetchMax)

      // O9 pending size per project = |live(n-1)| − |archived this round|
      // (identical to counting the post-status frontier, which the pruned
      // legs never materialize in full); both sides are measured counts.
      // |live(n-1)| comes from the incrementally-maintained carry when
      // available — the full-frontier project scan runs only to (re)seed it
      // (fresh resume / after a rewrite round), not per round.
      val candidates =
        if (inqueueLimits.isEmpty) candidates0
        else {
          val pendPrev = pendLiveCounts.getOrElse {
            o9PendScans += 1
            timed("o9.pendScan")(live0.groupBy("project").count()
              .as[(String, Long)].collect().toMap)
          }
          o9Base = Some(pendPrev)
          val archPerProj = archiveDelta.groupBy("project").count()
            .as[(String, Long)].collect().toMap
          val pend = pendPrev.map { case (p, c) =>
            p -> (c - archPerProj.getOrElse(p, 0L)) }
          applyInqueueLimit(candidates0, pend)
        }
      val (newLive0, denied) = Frontier.mergeIntoLive(liveAfterStatus, candidates,
        store.readArchive(n - 1), archiveDelta, seenProbe, now, n,
        depthLimit = -1, hook, depthLimits,
        broadcastCands = bcastCands,
        freshGate = if (anyRobots) robotsGate(now) else null)
      val newLive = hook(newLive0)
      // robots-denied rows join the archive (seen once, never live)
      val archiveAll =
        if (anyRobots) archiveDelta.union(denied) else archiveDelta
      // MOR extras: the delete keys (rows that LEFT the live set = this
      // round's archived keys, minus any key the merge re-admitted in the
      // same round — the upsert wins) and the touched-row count for the
      // live-total arithmetic. Both sides are round-bounded.
      val morInfo: Option[(DataFrame, Long)] =
        if (!morRound) None
        else {
          val delKeys = archiveDelta.select(col("project"), col("taskid"))
            .join(broadcast(newLive.select(col("project"), col("taskid"))),
              Seq("project", "taskid"), "left_anti")
          // O9 carry needs the touched counts PER PROJECT; same single
          // action either way (liveForMerge is bounded under MOR)
          val touchedTotal =
            if (inqueueLimits.isEmpty) liveForMerge.count()
            else {
              val t = liveForMerge.groupBy("project").count()
                .as[(String, Long)].collect().toMap
              o9Touched = Some(t)
              t.values.sum
            }
          Some((delKeys, touchedTotal))
        }
      (newLive, archiveAll, results, changedBuckets, morInfo)
    }

    // token carry (O5/O6 closed form) — one pass for both bucket kinds.
    // Host politeness is GLOBAL (one bucket per host across projects,
    // domain.py); each project's carry refills/clamps with its OWN
    // rate/burst (reference: one Bucket per project, rates from projectdb).
    val tokensUnified = Frontier.consumedTokensUnified(
      selected.toDF(), store.readTokensUnified(n - 1),
      headCfg.hostRate, headCfg.hostBurst,
      configs.map(c => c.name -> (c.rate: Any)).toMap,
      configs.map(c => c.name -> (c.burst: Any)).toMap,
      headCfg.rate, headCfg.burst, dt)

    // ---- commit (manifest written last; see SnapshotStore) ---------------
    // Per-action driver planning is the fixed tax of a round, so counts ride
    // along the writes as observed metrics instead of separate count() jobs
    // (the per-project counters were already collected above, before the
    // status/merge planning they parameterize).

    // The commit writes are independent — submit them CONCURRENTLY so their
    // driver planning + job latencies overlap (the serial driver time
    // between jobs is the round's fixed tax; see tools.RoundProfile).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    // ZERO-DELTA FAST PATH: when nothing was selected, no candidate exists
    // (no follows/cron/control) and the previous snapshot holds no
    // PROCESSING row (manifest-known — requeue provably no-op; robots
    // marking is idempotent on an already-marked snapshot), the new live
    // set IS the previous one: reference it instead of rewriting 10^a rows,
    // and skip the empty archive/result/html writes entirely. A cron-idle
    // production crawl ticks through such rounds constantly; this turns
    // their cost from a full snapshot cycle into tokens+metrics+commit.
    if (phaseLog) System.err.println(
      f"      [phase] plan.postFetch   ${(System.nanoTime() - __planT0) / 1e9}%6.2fs (cumulative)")
    val quietFast = timed("fastpath.check")(
      selectedCount == 0 && followsCount == 0 &&
        cronDue.isEmpty && !haveControl &&
        store.processingRowsOf(n - 1) == 0L)
    // the sparse carry is bounded by recently-throttled keys; compact to one
    // file only when the politeness bound guarantees a small round (ADVICE
    // r2: an unconditional coalesce(1) serialized an unbounded table)
    val tokensOut =
      if (politenessBound <= cfg.broadcastFetchMax) tokensUnified.coalesce(1)
      else tokensUnified
    var processingRows = 0L
    var archiveDeltaOpt: Option[Dataset[Task]] = None
    val (liveRows, archRows) =
      if (quietFast) {
        if (!store.carryLiveManifest(n)) store.writeLiveRef(n, n - 1)
        Await.result(Future(timed("writeTokens")(
          store.writeTokensUnified(n, tokensOut))), Duration.Inf)
        (store.liveRowsOf(n - 1).getOrElse(0L), 0L)
      } else {
        val (newLive, archiveDelta, results, changedBuckets, morInfo) = buildMergeLeg()
        archiveDeltaOpt = Some(archiveDelta)
        val liveObs = new org.apache.spark.sql.Observation(s"live_$n")
        val archObs = new org.apache.spark.sql.Observation(s"arch_$n")
        // bucketed COW write: observation sits ABOVE the bucket filter, so
        // its counts cover exactly the rows written; processing-row count is
        // still complete (precondition: no PROCESSING rows elsewhere) and
        // the total live count comes from the manifest (footer-exact).
        // MOR write: only the up/del deltas are written — the live total is
        // prev − touched + upserts (untouched base rows carry with zero
        // compute; the observation covers every written row, and the
        // processing count is complete by the same precondition).
        var cowTotal = 0L
        val fLive = Future(timed("writeLive")(morInfo match {
          case Some((delKeys, touchedPrev)) =>
            // O9 carry: per-project upsert counts ride the SAME observation
            // (projects are driver-known) — zero extra jobs
            val upAggs = if (inqueueLimits.isEmpty) Nil else configs.map(c =>
              sum(when(col("project") === c.name, 1L).otherwise(0L))
                .as(s"up_${c.name}"))
            val aggs = Seq(count(lit(1)).as("rows"),
              sum(when(col("status") === Status.Processing, 1L).otherwise(0L))
                .as("processing")) ++ upAggs
            val (upRows, _) = store.writeLiveDelta(n,
              newLive.toDF().observe(liveObs, aggs.head, aggs.tail: _*),
              delKeys)
            cowTotal = prevLiveRows.get - touchedPrev + upRows
          case None =>
            if (cfg.liveBuckets > 0) {
              val withB = newLive.toDF()
                .withColumn("__bucket", store.bucketCol(cfg.liveBuckets))
              val toWrite = changedBuckets match {
                case Some(chg) => withB.filter(col("__bucket").isin(chg.toSeq: _*))
                case None => withB
              }
              cowTotal = store.writeLiveBucketed(n,
                toWrite.observe(liveObs, count(lit(1)).as("rows"),
                  sum(when(col("status") === Status.Processing, 1L).otherwise(0L))
                    .as("processing")),
                changedBuckets, cfg.liveBuckets)
            } else store.writeLive(n,
              newLive.observe(liveObs, count(lit(1)).as("rows"),
                sum(when(col("status") === Status.Processing, 1L).otherwise(0L))
                  .as("processing")))
        }))
        val fArch = Future(timed("writeArchive")(store.appendArchive(n,
          archiveDelta.observe(archObs, count(lit(1)).as("rows")))))
        val fRes = Future(timed("writeResults")(store.appendResults(n,
          if (resultRows < 100_000) results.toDF().coalesce(1) else results.toDF())))
        val fTok = Future(timed("writeTokens")(
          store.writeTokensUnified(n, tokensOut)))
        // S8 raw-HTML sink for projects with save_html on
        val fHtml =
          if (saveHtmlProjects.isEmpty) Nil
          else {
            val keep = saveHtmlProjects
            Seq(Future(timed("writeHtml")(store.appendHtml(n, fetched
              .filter(x => keep.contains(x._1.project) && x._2.statusCode == 200)
              .map { case (t, p) =>
                (t.taskid, t.project, t.url, p.url, p.statusCode, p.contentHash, p.html) }
              .toDF("taskid", "project", "url", "response_url", "status_code",
                "content_hash", "html")))))
          }
        Await.result(Future.sequence(Seq(fLive, fArch, fRes, fTok) ++ fHtml), Duration.Inf)
        processingRows = Option(liveObs.get("processing"))
          .collect { case l: Long => l }.getOrElse(0L)
        // O9 carry update: exact per-project arithmetic on MOR rounds (base
        // − touched + upserts, all round-bounded); any rewrite round
        // invalidates it — the next O9 round re-seeds with one scan
        if (inqueueLimits.nonEmpty) {
          pendLiveCounts =
            if (morInfo.isDefined)
              for (base <- o9Base; touched <- o9Touched) yield {
                val up = configs.map(c => c.name ->
                  Option(liveObs.get(s"up_${c.name}"))
                    .collect { case l: Long => l }.getOrElse(0L)).toMap
                (base.keySet ++ up.keySet).iterator.map { p =>
                  p -> (base.getOrElse(p, 0L) - touched.getOrElse(p, 0L)
                        + up.getOrElse(p, 0L))
                }.toMap
              }
            else None
        }
        val totalLive =
          if (morInfo.isDefined || cfg.liveBuckets > 0) cowTotal
          else liveObs.get("rows").asInstanceOf[Long]
        (totalLive, archObs.get("rows").asInstanceOf[Long])
      }

    // G1 per-project event AVERAGES for this round (counter.py's tracked
    // fetch/process time averages): exact-integer micro sums / count, so the
    // sliding 5m/1h/1d windows the reference exposes are Σ(avg·n)/Σn over
    // the window's metrics rows — see TimeModel
    val metrics = spark.createDataset(metricRows0.map(r =>
        (r._1, r._2, r._3, r._4, r._5, r._6,
          if (r._2 > 0) r._9 / 1e6 / r._2 else 0.0,
          if (r._2 > 0) r._10 / 1e6 / r._2 else 0.0)).toSeq)
      .toDF("project", "processed", "ok", "fetch_200", "fetch_304", "fetch_err",
        "avg_fetch_time", "avg_process_time")
      .withColumn("round", lit(n)).withColumn("now", lit(now))
      .withColumn("selected", lit(selectedCount))
      .withColumn("live_rows", lit(liveRows))
      .withColumn("archived", lit(archRows))
      .withColumn("results", lit(resultRows))
    timed("writeMetrics")(store.appendMetrics(n, metrics.coalesce(1)))

    // fold this round's archived keys into the seen-bloom (incremental);
    // same-round rediscovery is already exact via mergeIntoLive's delta check
    timed("bloom.merge")(seenBloom.foreach { bf =>
      if (archRows > 0) archiveDeltaOpt.foreach { delta =>
        // coalesce first: bloomFilter aggregates ~5 MB bitmap partials PER
        // PARTITION to the driver — 32 partials is a 150 MB RPC burst per
        // round on a real cluster, 4 is plenty for a round-bounded delta
        bf.mergeInPlace(delta.toDF().coalesce(4).stat
          .bloomFilter("taskid", cfg.bloomExpected, 0.01))
      }
    })

    store.commit(n, now, liveRows, archRows, archiveTotal + archRows, resultRows,
      selectedCount,
      Seq("live" -> liveRows, "archive_delta" -> archRows, "results" -> resultRows),
      processingRows = processingRows)

    timed("unpersist")(cached.foreach(_.unpersist()))

    // periodic archive compaction — amortized O(1)-ish round cost over long
    // crawls (the compact snapshot replaces the per-round dir union)
    if (cfg.compactEvery > 0 && n > 0 && n % cfg.compactEvery == 0) {
      timed("compactArchive")(store.compactArchive(n))
      // archive past the driver-bloom cap → (re)build the bucket-local
      // blooms over the fresh compaction and reset the delta bloom: the
      // seen-set pre-filter stays O(1) driver memory at any archive size
      val totalNow = archiveTotal + archRows
      if (cfg.useBloom && totalNow > cfg.bloomCap) {
        timed("archiveBlooms")(store.buildArchiveBlooms(n, cfg.bloomBuckets,
          expectedPerBucket =
            math.max(2L * totalNow / cfg.bloomBuckets, 10_000L)))
        bucketBlooms = Some((store.bloomsDir(n), cfg.bloomBuckets))
        seenBloom = Some(emptyDeltaBloom())
      }
      // expire superseded state at the same cadence (table maintenance):
      // bounds the store's file count over a long crawl — without it the
      // soak measured ~90 dead state files/round, linear in rounds
      if (cfg.expireKeepLast > 0)
        timed("expireSnapshots")(store.expireSnapshots(cfg.expireKeepLast))
    }

    RoundStats(n, now, selectedCount, liveRows, archRows, resultRows)
  }

  private val roundLog = sys.env.contains("GRAFT_ROUND_LOG")

  /** Crawl until `maxRounds` or quiescence. A quiet round (nothing selected)
    * only terminates the loop when no live row can ever become due within
    * the remaining horizon — a retry past the first backoff step, a long
    * cron gap, or an auto_recrawl re-arm keeps the loop alive, matching the
    * reference scheduler's persistent loop (VERDICT r1: the backoff ladder
    * beyond step 1 was unreachable via this API). Returns stats per round. */
  def crawl(seeds: Seq[String], maxRounds: Int): Seq[RoundStats] = {
    var n = initOrResume(seeds)
    val stats = scala.collection.mutable.ArrayBuffer.empty[RoundStats]
    var quiet = false
    val horizon = maxRounds * cfg.roundDt
    val cronPending = specs.exists(s =>
      s.cronEverySec > 0 && seedsFor(s, cfg.seeds).nonEmpty)
    while (!quiet && n < maxRounds) {
      n += 1
      val t0 = System.nanoTime()
      val s0 = runRound(n)
      val s = s0.copy(wallSec = (System.nanoTime() - t0) / 1e9)
      if (roundLog) System.err.println(
        f"[round ${s.round}%3d] selected=${s.selected}%7d live=${s.newLive}%7d " +
        f"archived=${s.archived}%7d results=${s.results}%7d ${s.wallSec}%6.2fs")
      stats += s
      quiet = s.selected == 0 && !cronPending && (s.newLive == 0 || {
        // earliest future due time over the live set: ACTIVE rows become due
        // at exetime; PROCESSING rows at their timeout requeue. One tiny agg,
        // only ever run on quiet rounds.
        val minDue = onlyActive(store.readLive(n)) // O15: frozen rows never due
          .select(min(when(col("status") === Status.Active, col("schedule.exetime"))
            .otherwise(col("selected_at") + maxTimeout)))
          .as[Option[Double]].head()
        minDue.forall(_ > horizon)
      })
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
  def htmlDF(): DataFrame = store.readHtml()

  /** S9 result export (reference libs/result_dump.py:16-121): the common
    * fields of the JSON results are lifted to columns (schema inference —
    * native here) and dumped as JSONL or CSV.
    *
    * The result log is append-only (re-crawls append one row per round), so
    * rows are first reduced to the LATEST per (project, taskid) — resultdb
    * upserts by taskid — and the JSON fields are lifted with `from_json` on
    * the same row, never a join (VERDICT r1: the url-equality join fanned
    * out quadratically once a url had two result rows). */
  def exportResults(path: String, format: String = "json"): Unit = {
    import org.apache.spark.sql.expressions.Window
    val raw = resultsDF()
    val latest = raw
      .withColumn("__rn", row_number().over(
        Window.partitionBy("project", "taskid").orderBy(col("updatetime").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val schema = spark.read.json(latest.select("result").as[String]).schema
    val baseCols = raw.columns.filterNot(_ == "result")
    val lifted = schema.fieldNames.filterNot(baseCols.contains)
      .map(f => col(s"__parsed.`$f`").as(f))
    val out = latest.withColumn("__parsed", from_json(col("result"), schema))
      .select(baseCols.map(col) ++ lifted: _*)
    format match {
      case "json" => out.write.mode("overwrite").json(path)
      case "csv"  => out.write.mode("overwrite").option("header", "true").csv(path)
      case other  => throw new IllegalArgumentException(s"format: $other")
    }
  }
}
