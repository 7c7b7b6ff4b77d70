package graft.frontier

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.model._

/** Set-at-a-time restatements of the reference scheduler's per-task logic
  * (SURVEY §2.2/§2.3). Every function is a pure Dataset transformation —
  * no driver-side loops over rows, no wall clock.
  */
object Frontier {

  /** The engine's documented deterministic total order (SURVEY §7 step 3):
    * (priority DESC, exetime ASC, seq ASC, taskid ASC). `seq` is the round
    * the row entered the frontier — the set-at-a-time analog of the
    * reference heap's FIFO insertion order (scheduler/task_queue.py:27-47).
    */
  def selectOrder: Seq[Column] = Seq(
    col("eff_priority").desc, col("schedule.exetime").asc,
    col("seq").asc, col("taskid").asc)

  /** O2 — depth→priority policy (scheduler/scheduler.py:165-174,231-242):
    * BFS (-depth) when the project has a depth_limit, else schedule.priority.
    */
  def withEffectivePriority(df: DataFrame, depthLimit: Int): DataFrame =
    df.withColumn("eff_priority",
      if (depthLimit != -1) -col("depth") else col("schedule.priority"))

  /** Per-project parameter as a pure COLUMN: a map literal over the (small,
    * driver-known) projects list with a default — no join, stays inside
    * whole-stage codegen. The scheduler's projects dict
    * (scheduler.py:90-149) restated as expressions. */
  /** A round-varying scalar as a NON-FOLDABLE column. `lit(now)` constant-
    * folds the value into the generated whole-stage source, so every round
    * produces NEW codegen sources and every executor janino-compiles ~35
    * MB-scale classes per round — serialized behind the per-executor compile
    * lock (measured: the dominant non-scaling cost of a cluster round). A
    * udf-backed scalar keeps the value in the plan's references array, the
    * source text stable, and the codegen cache hot across rounds. */
  def dynLit(v: Double): Column = udf(() => v).apply() // ScalaUDF: never folded
  def dynLitLong(v: Long): Column = udf(() => v).apply()

  def perProject(byProject: Map[String, Any], default: Any): Column =
    if (byProject.isEmpty || byProject.values.forall(_ == default)) lit(default)
    else coalesce(
      element_at(
        map(byProject.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col("project")),
      lit(default))

  /** O3 — due filter (task_queue.py:114-159): rows whose exetime has come.
    * Not-due rows simply stay in the frontier untouched. */
  def due(live: Dataset[Task], now: Double): Dataset[Task] =
    live.filter(col("status") === Status.Active &&
      col("schedule.exetime") <= dynLit(now))

  /** O4 — processing-timeout requeue (task_queue.py:119,161-171): selected
    * rows that never reported a status within `timeout` go back to ACTIVE
    * (at-least-once). */
  def reactivateTimeouts(live: Dataset[Task], now: Double, timeout: Double)
                        (implicit spark: SparkSession): Dataset[Task] =
    reactivateTimeouts(live, now, Map.empty, timeout)

  /** Per-project timeout variant (multi-project engine). */
  def reactivateTimeouts(live: Dataset[Task], now: Double,
                         timeouts: Map[String, Any], default: Double)
                        (implicit spark: SparkSession): Dataset[Task] = {
    import spark.implicits._
    // pure column rewrite — stays inside whole-stage codegen, no
    // deserialize/reserialize of the frontier
    live.withColumn("status",
      when(col("status") === Status.Processing &&
        col("selected_at") < dynLit(now) - perProject(timeouts, default),
        lit(Status.Active))
        .otherwise(col("status"))).as[Task]
  }

  /** Robots gate (north-rule scope; the reference has no robots handling —
    * SURVEY §2 preamble). `rules` is small ((host, prefixes) per host) and
    * broadcast. Disallowed rows are marked BAD once so they never clog
    * selection. */
  def applyRobots(live: Dataset[Task], rules: DataFrame,
                  respect: Map[String, Any] = Map.empty)
                 (implicit spark: SparkSession): Dataset[Task] = {
    import spark.implicits._
    // `respect` gates the BAD-mark per project (the respectRobots knob);
    // default true — an empty map keeps the single-project behavior
    live.join(broadcast(rules), Seq("host"), "left_outer")
      .withColumn("path_part",
        regexp_replace(col("url"), "^[a-z]+://[^/]*", ""))
      .withColumn("robots_denied",
        coalesce(exists(col("disallow_prefixes"),
          p => col("path_part").startsWith(p)), lit(false)))
      .withColumn("status",
        when(col("robots_denied") && col("status") === Status.Active &&
          perProject(respect, true),
          lit(Status.Bad)).otherwise(col("status")))
      .drop("disallow_prefixes", "path_part", "robots_denied")
      .as[Task]
  }

  /** O5/O6/O7 — budgeted, politeness-aware selection.
    *
    * Token buckets are evaluated in closed form per round
    * (token_bucket.py:33-47: `tokens' = min(burst, tokens + rate*dt)`), so
    * budgets are plain columns and admission is a per-host / per-project
    * `row_number` over the documented total order — the set-at-a-time
    * equivalent of the reference's heap + bucket loop
    * (scheduler.py:244-261,390-431).
    *
    * AT SCALE: the host window is the skew point (one hot domain = one hot
    * partition). The window only ranks rows *up to the budget*; we pre-trim
    * with a cheap salted partial rank so the hot host's millions of pending
    * rows never hit a single partition — see `saltedHostRank`.
    *
    * @param hostTokens  (host, tokens) carry table — may be empty
    * @param projTokens  (project, tokens) carry table — may be empty
    */
  def select(dueTasks: DataFrame, cfg: ProjectConfig, dt: Double,
             hostTokens: DataFrame, projTokens: DataFrame): DataFrame =
    select(dueTasks, Seq(cfg), cfg.hostRate, cfg.hostBurst, cfg.loopLimit,
      dt, hostTokens, projTokens)

  /** Multi-project selection: each project's rate/burst/depth_limit/cap is a
    * per-project COLUMN (map-literal over the driver-known projects list —
    * the reference scheduler's projects dict, scheduler.py:90-149,124-125),
    * while host politeness stays GLOBAL (a host does not care which project
    * hits it — domain.py keeps one bucket per domain). Unknown projects fall
    * back to the first config's parameters. */
  def select(dueTasks: DataFrame, projects: Seq[ProjectConfig],
             hostRate: Double, hostBurst: Double, globalLoopLimit: Int,
             dt: Double, hostTokens: DataFrame, projTokens: DataFrame): DataFrame = {
    // NO-BIND SHORTCUT: a budget's LOWER bound over any token state is
    // min(burst, rate·dt) (empty bucket) and the fairness cap is
    // loopLimit/10 — when every bound provably exceeds any plausible round
    // (≥ 5·10^7) the rank filters keep EVERY row, so the two windows (a full
    // sort-shuffle of the fattest DF each, partitioned by host with real
    // corpora 30 % skewed) are identity work: skip them. This is the
    // BFS-benchmark / unthrottled-backfill regime; politeness-bounded
    // production configs keep the budgeted path below.
    val UNBOUNDED = 5e7
    val noBind =
      math.min(hostBurst, hostRate * dt) >= UNBOUNDED &&
        projects.forall(c =>
          math.min(c.burst, c.rate * dt) >= UNBOUNDED &&
            c.loopLimit / 10 >= UNBOUNDED)
    if (noBind) {
      return (
        if (globalLoopLimit.toLong >= Int.MaxValue / 2) dueTasks
        else dueTasks.orderBy(selectOrder: _*).limit(globalLoopLimit))
    }
    val d = projects.head
    def pp(f: ProjectConfig => Any, default: Any): Column =
      perProject(projects.map(c => c.name -> f(c)).toMap, default)

    val pRate = pp(_.rate, d.rate)
    val pBurst = pp(_.burst, d.burst)
    val pDepthLimit = pp(_.depthLimit, d.depthLimit)
    val hostBudget = least(lit(hostBurst),
      coalesce(col("host_tokens"), lit(hostBurst)) + lit(hostRate * dt))
    val projBudget = least(pBurst,
      coalesce(col("proj_tokens"), pBurst) + pRate * dt)
    // per-project fairness cap LOOP_LIMIT/10 (scheduler.py:419)
    val perProjectCap =
      greatest(lit(1L), floor(pp(_.loopLimit, d.loopLimit) / 10))

    val joined = dueTasks
      .withColumn("eff_priority",
        when(pDepthLimit =!= -1, -col("depth"))
          .otherwise(col("schedule.priority")))
      .join(broadcast(hostTokens.withColumnRenamed("tokens", "host_tokens")),
        Seq("host"), "left_outer")
      .join(broadcast(projTokens.withColumnRenamed("tokens", "proj_tokens")),
        Seq("project"), "left_outer")

    // SKEW DEFUSE (SURVEY §4): with a hot domain holding ~30% of the
    // frontier, Window.partitionBy(host) puts millions of rows in one
    // partition. When the budget is small enough for salting to pay, rank
    // per (host, salt) first and keep only each salt's top `budget` rows —
    // the final exact per-host rank then sees ≤ SALT×budget rows per host.
    // Pure pre-trim: rows beyond the per-salt budget can never be within
    // the per-host budget, so the final selection is unchanged.
    val SALT = 16
    val preTrimmed =
      if (hostBurst <= 100_000) {
        joined
          .withColumn("__salt", pmod(hash(col("taskid")), lit(SALT)))
          .withColumn("__r0", row_number().over(
            Window.partitionBy("host", "__salt").orderBy(selectOrder: _*)))
          .filter(col("__r0") <= ceil(hostBudget))
          .drop("__salt", "__r0")
      } else joined

    val ranked = preTrimmed
      .withColumn("host_rank",
        row_number().over(Window.partitionBy("host").orderBy(selectOrder: _*)))
      .withColumn("proj_rank",
        row_number().over(Window.partitionBy("project").orderBy(selectOrder: _*)))

    val budgeted = ranked
      .filter(col("host_rank") <= floor(hostBudget) &&
        col("proj_rank") <= least(floor(projBudget), perProjectCap))
    // global LOOP_LIMIT cap (scheduler.py:38) — a TOTAL sort; skipped when
    // the cap cannot bind (per-project caps already bound the batch)
    val capped =
      if (globalLoopLimit.toLong >= Int.MaxValue / 2) budgeted
      else budgeted.orderBy(selectOrder: _*).limit(globalLoopLimit)
    capped.drop("host_rank", "proj_rank", "host_tokens", "proj_tokens", "eff_priority")
  }

  /** Post-selection token consumption: the carry for the next round.
    * `tokens' = clamp(tokens + rate*dt - consumed, 0, burst)`. */
  def consumedTokens(selected: DataFrame, key: String, prev: DataFrame,
                     rate: Double, burst: Double, dt: Double): DataFrame = {
    selected.groupBy(key).agg(count(lit(1)).as("consumed"))
      .join(prev, Seq(key), "full_outer")
      .select(col(key),
        least(lit(burst),
          greatest(lit(0.0),
            coalesce(col("tokens"), lit(burst)) + lit(rate * dt) -
              coalesce(col("consumed"), lit(0)))).as("tokens"))
  }

  /** D1/D5/D6 — in-batch candidate merge: one row per (project, taskid) with
    * max(priority), min(exetime), OR(force_update), min(depth)
    * (base_handler.py:357-360; task_queue.py:64-78; scheduler.py:286-311). */
  def mergeCandidates(cands: Dataset[Task])(implicit spark: SparkSession): Dataset[Task] = {
    import spark.implicits._
    // Deterministic winner regardless of merge order: (priority desc, depth
    // asc), then a stable total order on the remaining non-merged fields
    // (VERDICT r1: run-order-dependent tie-break), with the full row as the
    // final disambiguator. Expressed as a min-of-ordering-struct AGGREGATION
    // (not groupByKey.reduceGroups): whole-stage-codegen'd with map-side
    // partial merge and ZERO per-row object materialization — a BFS round
    // pushes 10^7 candidate rows through here, and the typed reduce's
    // object churn was measured as the round's dominant CPU+GC cost.
    val ordKey = struct(
      (-col("schedule.priority")).as("np"), // min() ⇒ priority DESC
      col("depth"),
      col("schedule.exetime"),
      coalesce(col("process.callback"), lit("null")).as("cb"),
      coalesce(col("schedule.itag"), lit("null")).as("it"),
      col("schedule.age"),
      coalesce(col("fetch.save"), lit("null")).as("sv"),
      col("url"),
      struct(cands.toDF().columns.map(col): _*).as("row"))
    // flat select, NOT a withField chain (each withField re-runs analysis
    // over the whole plan); the nested schedule struct is rebuilt once
    val schedule = struct(
      col("__mp").as("priority"),
      col("w.row.schedule.retries").as("retries"),
      col("w.row.schedule.retried").as("retried"),
      col("__me").as("exetime"),
      col("w.row.schedule.age").as("age"),
      col("w.row.schedule.itag").as("itag"),
      (col("__fu") === 1).as("force_update"),
      col("w.row.schedule.auto_recrawl").as("auto_recrawl"))
    val outCols = cands.toDF().columns.map {
      case "depth"    => col("__md").as("depth")
      case "schedule" => schedule.as("schedule")
      case c          => col(s"w.row.$c").as(c)
    }
    cands.toDF()
      .groupBy("project", "taskid")
      .agg(min(ordKey).as("w"),
        max("schedule.priority").as("__mp"),
        min("schedule.exetime").as("__me"),
        max(col("schedule.force_update").cast("int")).as("__fu"),
        min("depth").as("__md"))
      .select(outCols: _*).as[Task]
  }

  /** D1/D5/D6 over the FLAT follow stream (one FollowLite row per extracted
    * link — 10^7 rows in a BFS round): the same merge semantics as
    * `mergeCandidates`, but on 15 flat columns instead of 40 nested ones,
    * then lifted to full Tasks (defaults everywhere else) on the collapsed
    * output only. */
  def mergeFollows(flat: DataFrame, now: Double)
                  (implicit spark: SparkSession): Dataset[Task] = {
    val ordKey = struct(
      (-col("priority")).as("np"),
      col("depth"),
      col("exetime"),
      coalesce(col("callback"), lit("null")).as("cb"),
      coalesce(col("itag"), lit("null")).as("it"),
      col("age"),
      coalesce(col("save"), lit("null")).as("sv"),
      col("url"),
      struct(flat.columns.map(col): _*).as("row"))
    val overlay = Map( // merged fields replace the winner's (D5/D6)
      "depth" -> col("__md"), "priority" -> col("__mp"),
      "exetime" -> col("__me"), "force_update" -> (col("__fu") === 1))
    val merged = flat
      .groupBy("project", "taskid")
      .agg(min(ordKey).as("w"),
        max("priority").as("__mp"),
        min("exetime").as("__me"),
        max(col("force_update").cast("int")).as("__fu"),
        min("depth").as("__md"))
      // flat select, NOT a withField chain: every withField re-runs the
      // analyzer over the whole plan — measured as seconds of driver time
      // per round on this 15-field struct
      .select(flat.columns.map(c =>
        overlay.getOrElse(c, col(s"w.row.$c")).as(c)): _*)
    liftFollows(merged, now)
  }

  /** Columnar FollowLite → Task lift: every non-carried field is the fresh-
    * follow default (struct field names match the case classes for the
    * by-name typed mapping). */
  def liftFollows(flat: DataFrame, now: Double)
                 (implicit spark: SparkSession): Dataset[Task] = {
    import spark.implicits._
    val nullS = lit(null).cast("string")
    flat.select(
      col("taskid"), col("project"), col("url"),
      lit(Status.Active).as("status"), col("host"), col("depth"),
      struct(col("priority"), lit(3).as("retries"), lit(0).as("retried"),
        col("exetime"), col("age"), col("itag").as("itag"),
        col("force_update"), col("auto_recrawl")).as("schedule"),
      struct(lit("GET").as("method"), nullS.as("etag"),
        nullS.as("last_modified"), col("save"),
        col("fetch_type"), lit(true).as("allow_redirects"),
        lit(5).as("max_redirects"), col("cookies")).as("fetch"),
      struct(col("callback")).as("process"),
      struct(
        struct(lit(false).as("ok"), lit(0.0).as("time"),
          lit(0).as("status_code"), nullS.as("encoding"),
          nullS.as("redirect_url"), nullS.as("error"),
          nullS.as("content_hash")).as("fetch"),
        struct(lit(false).as("ok"), lit(0.0).as("time"),
          lit(0).as("follows"), nullS.as("result"),
          nullS.as("exception")).as("process"),
        nullS.as("save")).as("track"),
      lit(0.0).as("lastcrawltime"),
      dynLit(now).as("updatetime"),
      lit(0.0).as("selected_at"),
      lit(0L).as("seq")
    ).as[Task]
  }

  /** D2/D3/D4 — merge candidates into the live frontier + archived seen-set.
    *
    * The reference's per-task point-get + on_new/on_old branch
    * (scheduler.py:318-327,724-773) becomes ONE set-oriented pass:
    * full-outer join live vs candidates (the MERGE), then the remaining new
    * candidates are checked against the SEEN-SET:
    *
    *  1. bloom pre-filter (north rule): candidates the bloom rejects are
    *     definitely-new → inserted with NO archive access at all;
    *  2. possible hits are confirmed exactly: the archive log is
    *     left-semi-joined against the BROADCAST candidate keys (map-side,
    *     never shuffles the 10^10-row archive), reduced to latest-per-key,
    *     then joined to decide insert vs re-crawl (D4) vs drop.
    *
    * `archive` is the raw append-only log; `persistHook` lets the caller
    * cache the intermediate that is consumed by multiple branches.
    *
    * Returns the new live set (old rows + restarted rows + inserts).
    */
  def mergeIntoLive(live: Dataset[Task], cands: Dataset[Task],
                    archive: Dataset[Task],
                    archiveDelta: Dataset[Task],
                    bloom: Option[org.apache.spark.util.sketch.BloomFilter],
                    now: Double, round: Long, depthLimit: Int,
                    persistHook: Dataset[Task] => Dataset[Task] = identity,
                    depthLimits: Map[String, Int] = Map.empty,
                    broadcastCands: Boolean = false)
                   (implicit spark: SparkSession): Dataset[Task] = {
    import spark.implicits._

    def restartWanted(old: Task, nw: Task): Boolean = {
      val itagChanged = nw.schedule.itag != null && nw.schedule.itag != old.schedule.itag
      val ageExpired = old.schedule.age >= 0 && old.lastcrawltime + old.schedule.age < now
      itagChanged || ageExpired || nw.schedule.force_update
    }
    // D4 restart (scheduler.py:737-773): ACTIVE again, depth = min(old, new),
    // schedule replaced by the new task's, track/lastcrawltime preserved.
    // F2 conditional fetch (tornado_fetcher.py:296-314): the re-crawl carries
    // the last success's content hash as its ETag so unchanged pages 304.
    def restart(old: Task, nw: Task): Task = nw.copy(
      status = Status.Active,
      depth = math.min(old.depth, nw.depth),
      track = old.track,
      fetch = nw.fetch.copy(etag = old.track.fetch.content_hash),
      lastcrawltime = old.lastcrawltime,
      updatetime = now,
      seq = old.seq)

    // SHUFFLE DISCIPLINE: join strategies are left to AQE — when the
    // candidate batch is politeness-bounded (the production shape) every
    // join below becomes a broadcast build over the streamed live/archive
    // side; when a BFS bench round explodes to millions of follows AQE
    // falls back to co-partitioned shuffles (at cluster scale the live and
    // archive tables are bucketed by (project, taskid), making those
    // shuffles coincide with storage partitioning):
    //   (a) matched-update pass: live ⟕ cands;
    //   (b) matched keys: live ⋉ cand keys;
    //   (c) inserts: cands ▷ matched keys;
    //   (d) seen-set: bloom pre-filter, then archive ⋉ maybe-seen keys.
    val candsP = persistHook(cands)
    // `hintB` marks candidate-derived (round-bounded) sides as broadcast
    // builds when the caller measured the candidate batch to be small, so
    // the LIVE frontier and the ARCHIVE always stream map-side. In
    // BFS-explosion rounds the hint becomes SHUFFLE_HASH: executor-parallel
    // co-partitioned joins with NO driver-side collect (a 10^6-row broadcast
    // is serial driver time — the measured scaling killer) and no sort.
    def hintB[T](d: Dataset[T]): Dataset[T] =
      if (broadcastCands) broadcast(d) else d.hint("SHUFFLE_HASH")
    def hintBDF(d: DataFrame): DataFrame =
      if (broadcastCands) broadcast(d) else d.hint("SHUFFLE_HASH")
    val candsB = hintB(candsP)
    val keyCond = live("project") === candsB("project") && live("taskid") === candsB("taskid")

    // (a) D2/D4 on rows already in the queue (scheduler.py:303-311)
    val updatedLive = live.joinWith(candsB, keyCond, "left_outer").map {
      case (old, null) => old
      case (old, nw) =>
        if (old.status == Status.Active || old.status == Status.Processing) {
          if (nw.schedule.force_update) restart(old, nw) else old
        } else if (restartWanted(old, nw)) restart(old, nw) else old
    }

    // (b)/(c) candidates that are NOT pending → provisional inserts
    val candKeys = candsP.select("project", "taskid")
    val matchedKeys = live.join(hintBDF(candKeys), Seq("project", "taskid"), "left_semi")
      .select("project", "taskid")
    val inserts = candsP.toDF()
      .join(hintBDF(matchedKeys), Seq("project", "taskid"), "left_anti")
      // columnar seq stamp (a typed .map(_.copy(...)) would deserialize every
      // insert); dynLitLong keeps the codegen source round-stable
      .withColumn("seq", dynLitLong(round)).as[Task]

    // exact confirm of candidate inserts against a seen log: semi-join the
    // log on the (BROADCAST) candidate keys — the big side is filtered
    // map-side, never shuffled — then decide insert vs re-crawl (D4) vs drop
    def confirm(candsIn: Dataset[Task], seenLog: Dataset[Task]): Dataset[Task] = {
      def hintB2(d: DataFrame): DataFrame =
        if (broadcastCands) broadcast(d) else d.hint("SHUFFLE_HASH")
      val keys = candsIn.select("project", "taskid")
      val matched0 = SeenSet.latest(
        seenLog.join(hintB2(keys), Seq("project", "taskid"), "left_semi").as[Task])
      val matched = if (broadcastCands) broadcast(matched0)
                    else matched0.hint("SHUFFLE_HASH")
      val cond = candsIn("project") === matched("project") &&
        candsIn("taskid") === matched("taskid")
      candsIn.joinWith(matched, cond, "left_outer").flatMap {
        case (nw, null) => Some(nw) // truly new → insert
        case (nw, old)  => // seen before → on_old_request: re-crawl only if D4 says so
          if (restartWanted(old, nw)) Some(restart(old, nw)) else None
      }
    }

    // (d) D2 bloom pre-filter. The bloom covers the archive only up to the
    // PREVIOUS round — rows archived THIS round (archiveDelta) are not in it
    // yet, so a same-round rediscovery (self-link, mutual links crawled in
    // one round) would slip through as "definitely new". Both halves of the
    // split are therefore confirmed against the round-bounded delta exactly
    // (VERDICT r1 high: same-round seen-set blind spot).
    val (defNew0, maybeSeen0) = SeenSet.splitByBloom(inserts, bloom)
    val maybeSeen = persistHook(maybeSeen0)
    val confirmed = confirm(maybeSeen, archive.union(archiveDelta))
    val defNew = confirm(persistHook(defNew0), archiveDelta)

    val fresh = defNew.union(confirmed)
    // P11 depth guard (base_handler.py:481-494), per project when limits vary
    val guarded =
      if (depthLimits.isEmpty && depthLimit == -1) fresh
      else fresh.filter { t =>
        val dl = depthLimits.getOrElse(t.project, depthLimit)
        dl == -1 || t.depth <= dl
      }

    updatedLive.union(guarded)
  }

  /** Both politeness-bucket carries in one shuffle: selected is exploded to
    * (kind, key) pairs, aggregated once, and full-outer-merged with the
    * previous unified carry table. */
  def consumedTokensUnified(selected: DataFrame, prevUnified: DataFrame,
                            hostRate: Double, hostBurst: Double,
                            projRate: Double, projBurst: Double,
                            dt: Double): DataFrame = {
    val pairs = selected.select(explode(array(
      struct(lit("host").as("kind"), col("host").as("key")),
      struct(lit("proj").as("kind"), col("project").as("key")))).as("kk"))
      .select(col("kk.kind").as("kind"), col("kk.key").as("key"))
    val rate = when(col("kind") === "host", hostRate).otherwise(projRate)
    val burst = when(col("kind") === "host", hostBurst).otherwise(projBurst)
    pairs.groupBy("kind", "key").agg(count(lit(1)).as("consumed"))
      .join(prevUnified, Seq("kind", "key"), "full_outer")
      .select(col("kind"), col("key"),
        least(burst, greatest(lit(0.0),
          coalesce(col("tokens"), burst) + rate * dt -
            coalesce(col("consumed"), lit(0)))).as("tokens"))
  }

  /** O11/O12/O13 — apply the round's status packs to the live set
    * (scheduler.py:775-872). Returns (newLive, archiveDelta):
    *  - success → SUCCESS (archived) unless auto_recrawl re-arms it (O12);
    *  - failure with retries left → retry with backoff ladder (O11);
    *  - exhausted → FAILED (archived).
    */
  def applyStatus(live: Dataset[Task], packs0: Dataset[StatusPack], now: Double,
                  persistHook: Dataset[Task] => Dataset[Task] = identity,
                  broadcastPacks: Boolean = false)
                 (implicit spark: SparkSession): (Dataset[Task], Dataset[Task]) = {
    import spark.implicits._
    // packs are bounded by the round's selection; when the caller measured
    // the selection small they broadcast (live frontier streams MAP-SIDE);
    // else SHUFFLE_HASH — parallel co-partitioned join, no driver collect
    val packs = if (broadcastPacks) broadcast(packs0)
                else packs0.hint("SHUFFLE_HASH")
    val cond = live("project") === packs("project") && live("taskid") === packs("taskid")
    val updated = live.joinWith(packs, cond, "left_outer").map {
      case (t, null) => t
      case (t, p) =>
        val track = Track(
          fetch = TrackFetch(ok = p.fetchOk, time = p.fetchTime,
            status_code = p.statusCode, encoding = p.encoding,
            redirect_url = p.redirectUrl,
            error = p.fetchError, content_hash = p.contentHash),
          process = TrackProcess(ok = p.processOk, time = p.processTime,
            follows = p.follows, exception = p.exception))
        if (p.processOk) {
          if (t.schedule.auto_recrawl && t.schedule.age >= 0)
            t.copy(status = Status.Active, track = track,
              schedule = t.schedule.copy(exetime = now + t.schedule.age, retried = 0),
              lastcrawltime = now, updatetime = now)
          else
            t.copy(status = Status.Success, track = track,
              lastcrawltime = now, updatetime = now)
        } else {
          val retried = t.schedule.retried + 1
          if (retried > t.schedule.retries) {
            if (t.schedule.auto_recrawl && t.schedule.age >= 0)
              t.copy(status = Status.Active, track = track,
                schedule = t.schedule.copy(retried = 0, exetime = now + t.schedule.age),
                lastcrawltime = now, updatetime = now)
            else
              t.copy(status = Status.Failed, track = track,
                lastcrawltime = now, updatetime = now)
          } else
            t.copy(status = Status.Active, track = track,
              schedule = t.schedule.copy(retried = retried,
                exetime = now + Retry.delayFor(retried)),
              lastcrawltime = now, updatetime = now)
        }
    }
    // cache the PARENT once; the two status-split views are cheap filters
    val updatedP = persistHook(updated)
    val archived = updatedP.filter(t =>
      t.status == Status.Success || t.status == Status.Failed || t.status == Status.Bad)
    val newLive = updatedP.filter(t =>
      t.status == Status.Active || t.status == Status.Processing)
    (newLive, archived)
  }
}

/** Fetch/process outcome reported back to the scheduler — the reference's
  * status pack (processor/processor.py:133-177). */
case class StatusPack(
    taskid: String,
    project: String,
    fetchOk: Boolean,
    statusCode: Int,
    fetchTime: Double,
    encoding: String,
    contentHash: String,
    fetchError: String,
    processOk: Boolean,
    processTime: Double,
    follows: Int,
    exception: String,
    redirectUrl: String = null) // F3: final url when the fetch redirected
