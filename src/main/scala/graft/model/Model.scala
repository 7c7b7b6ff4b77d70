package graft.model

/** Typed frontier row model — the reference's task dict restated as nested
  * case classes (schema: pyspider-master/pyspider/database/base/taskdb.py:8-59,
  * SURVEY §1.1/§1.5). Times are epoch seconds (Double) like the reference;
  * the engine only ever uses an injected logical clock (SURVEY §1.5), never
  * wall-clock, so rounds are replayable.
  */
object Status {
  val Active = 1
  val Success = 2
  val Failed = 3
  val Bad = 4
  /** engine-only: selected and awaiting a status pack (reference models this
    * with the in-memory processing queue, task_queue.py:119,161-171). */
  val Processing = 5
}

/** reference taskdb `schedule` dict (base/taskdb.py:17-25; defaults
  * scheduler/scheduler.py:31-37). */
case class Schedule(
    priority: Int = 0,
    retries: Int = 3,
    retried: Int = 0,
    exetime: Double = 0.0,
    age: Long = -1L,
    itag: String = null,
    force_update: Boolean = false,
    auto_recrawl: Boolean = false)

/** reference taskdb `fetch` dict, trimmed to the keys the corpus fetcher
  * honors (base/taskdb.py:26-32; full list base_handler.py:307-329). */
case class FetchOpts(
    method: String = "GET",
    etag: String = null,
    last_modified: String = null,
    save: String = null, // JSON payload passed through to the handler
    fetch_type: String = null, // null | "js" (S6/F1: js rows get the render pass)
    allow_redirects: Boolean = true,
    max_redirects: Int = 5,
    // F4 — request cookies ("k=v; k2=v2"), merged with every Set-Cookie
    // along the redirect chain (tornado_fetcher.py cookie tracking); the
    // merged jar is visible to the handler on FetchedPage.cookies
    cookies: String = null)

case class ProcessOpts(callback: String = "index_page")

case class TrackFetch(
    ok: Boolean = false,
    time: Double = 0.0,
    status_code: Int = 0,
    encoding: String = null,
    redirect_url: String = null,
    error: String = null,
    content_hash: String = null) // stands in for etag (corpus fetch)

case class TrackProcess(
    ok: Boolean = false,
    time: Double = 0.0,
    follows: Int = 0,
    result: String = null,
    exception: String = null)

case class Track(
    fetch: TrackFetch = TrackFetch(),
    process: TrackProcess = TrackProcess(),
    save: String = null)

/** One frontier row. `selected_at` powers the processing-timeout requeue
  * (SURVEY O4); `seq` is the deterministic FIFO tie-breaker standing in for
  * the reference heap's insertion order. */
case class Task(
    taskid: String,
    project: String,
    url: String,
    status: Int,
    host: String,
    depth: Int,
    schedule: Schedule = Schedule(),
    fetch: FetchOpts = FetchOpts(),
    process: ProcessOpts = ProcessOpts(),
    track: Track = Track(),
    lastcrawltime: Double = 0.0,
    updatetime: Double = 0.0,
    selected_at: Double = 0.0,
    seq: Long = 0L)

/** Flat narrow follow row — the 10^7-rows-per-round BFS path (one per
  * extracted link). Carries only what candidate admission reads (D1-D6 merge
  * fields, P7 filter fields, P11 depth); lifted to a full nested Task (all
  * other fields are defaults for a fresh follow) only AFTER the per-key
  * merge collapses the batch. Encoding/shuffling full 40-field Tasks per
  * link was measured as the dominant cost of a BFS round. */
case class FollowLite(
    taskid: String,
    project: String,
    url: String,
    host: String,
    depth: Int,
    priority: Int,
    exetime: Double,
    age: Long,
    itag: String,
    force_update: Boolean,
    auto_recrawl: Boolean,
    save: String,
    callback: String,
    fetch_type: String,
    cookies: String)

/** Result row (reference database/base/resultdb.py:8-17). */
case class ResultRow(
    taskid: String,
    project: String,
    url: String,
    result: String, // JSON
    updatetime: Double)

/** Corpus row — BASELINE.json input_hint shape. */
case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Project definition (reference database/base/projectdb.py:12-40 +
  * fork config fields, libs/read_project_config.py:55-160). Handler scripts
  * become compiled callbacks keyed by `process.callback` (SURVEY §2.8). */
case class ProjectConfig(
    name: String,
    rate: Double = 3.0,   // read_project_config.py:77-80 defaults
    burst: Double = 30.0,
    depthLimit: Int = -1, // -1 = unlimited; else BFS priority = -depth (O2)
    hostRate: Double = 20.0, // scheduler/domain.py:16
    hostBurst: Double = 50.0,
    loopLimit: Int = 1000, // scheduler.py:38 LOOP_LIMIT
    inqueueLimit: Int = 0, // scheduler.py:41 INQUEUE_LIMIT; 0 = unlimited
    processingTimeout: Double = 600.0, // task_queue.py:119
    respectRobots: Boolean = true, // NEW scope (north rule); reference has none
    allowDomains: Seq[String] = Nil, // P7 allow-list; empty = all
    denyPattern: String = null,      // P7 deny regex
    saveHtml: Boolean = false,       // S8 raw-HTML sink (save_html.py:23-52)
    // O15 — project lifecycle (reference projectdb statuses, database/base/
    // projectdb.py:16 'TODO,STOP,CHECKING,DEBUG,RUNNING'; scheduler
    // task_verify accepts only DEBUG/RUNNING): a non-active project's live
    // rows are never selected and its new candidates are dropped at admission
    status: String = ProjectConfig.Running)

object ProjectConfig {
  val Running = "RUNNING"
  val Debug = "DEBUG"
  val Stop = "STOP"
  val Todo = "TODO"
  val Checking = "CHECKING"
  def isActive(status: String): Boolean = status == Running || status == Debug
}

object Retry {
  /** reference scheduler.py:44-50 DEFAULT_RETRY_DELAY:
    * {1: 30s, 2: 1h, 3: 6h, 4: 12h, '': 24h}. */
  def delayFor(retried: Int): Double = retried match {
    case 1 => 30.0
    case 2 => 3600.0
    case 3 => 6 * 3600.0
    case 4 => 12 * 3600.0
    case _ => 24 * 3600.0
  }
}
