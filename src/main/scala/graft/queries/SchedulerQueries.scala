package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import Q.{frontier, table, FRONTIER_SQL}

/** SURVEY §2.2/§2.3/§2.6 scheduler operators as gate queries: each entry is
  * the set-at-a-time Spark restatement of one reference mechanism, with a
  * DuckDB oracle over the same parquet tables (`documents` → the shared
  * synthetic frontier, `events` for time windows). */
object SchedulerQueries {

  private val selOrder =
    Seq(col("priority").desc, col("exetime").asc, col("taskid").asc)
  private val selOrderSql = "priority DESC, exetime ASC, taskid ASC"

  val all: Seq[Q] = Seq(

    // S1 — seed scan: url → md5 taskid (scheduler.py:593-614)
    Q("s1_seed_scan",
      s"""$FRONTIER_SQL SELECT taskid, url, host, CAST(0 AS BIGINT) AS depth,
         | TRUE AS force_update FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(
        col("taskid"), col("url"), col("host"),
        lit(0L).as("depth"), lit(true).as("force_update"))),

    // S2 — frontier restore: ACTIVE-only scan, 4-field projection
    // (scheduler.py:151-186; partition filter + column pruning)
    Q("s2_frontier_restore",
      s"""$FRONTIER_SQL SELECT taskid, project, url, priority FROM frontier
         | WHERE status = 1""".stripMargin)(
      (s, dir) => frontier(s, dir).filter(col("status") === 1)
        .select("taskid", "project", "url", "priority")),

    // D2 — seen-set anti-join (scheduler.py:303-311): candidates not pending
    Q("d2_seen_antijoin",
      s"""$FRONTIER_SQL SELECT taskid, url FROM frontier
         | WHERE doc_id % 2 = 0 AND taskid NOT IN
         |   (SELECT taskid FROM frontier WHERE doc_id % 3 = 0)""".stripMargin)(
      (s, dir) => {
        val f = frontier(s, dir)
        f.filter(col("doc_id") % 2 === 0)
          .join(f.filter(col("doc_id") % 3 === 0).select("taskid"),
            Seq("taskid"), "left_anti")
          .select("taskid", "url")
      }),

    // D5/D6 — queue-collision merge: max(priority), min(exetime),
    // OR(force_update), min(depth) per colliding key (task_queue.py:64-78)
    Q("d5_priority_merge",
      s"""$FRONTIER_SQL SELECT 'k' || CAST(doc_id % 199 AS VARCHAR) AS key,
         | MAX(priority) AS priority, MIN(exetime) AS exetime,
         | BOOL_OR(force_update) AS force_update, MIN(depth) AS depth
         | FROM frontier GROUP BY 1""".stripMargin)(
      (s, dir) => frontier(s, dir)
        .groupBy(concat(lit("k"), (col("doc_id") % 199).cast("string")).as("key"))
        .agg(max("priority").as("priority"), min("exetime").as("exetime"),
          expr("bool_or(force_update)").as("force_update"), min("depth").as("depth"))),

    // D4 — re-crawl decision truth table (scheduler.py:737-773), now = 100
    Q("d4_recrawl_decision",
      s"""$FRONTIER_SQL SELECT taskid,
         | (force_update OR itag <> 'v1'
         |   OR (age >= 0 AND lastcrawltime + age < 100)) AS restart
         | FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("taskid"),
        (col("force_update") || col("itag") =!= "v1" ||
          (col("age") >= 0 && col("lastcrawltime") + col("age") < 100)).as("restart"))),

    // O2 — depth→priority policy (scheduler.py:165-174,231-242)
    Q("o2_depth_priority",
      s"""$FRONTIER_SQL SELECT taskid,
         | CAST(CASE WHEN doc_id % 2 = 0 THEN -depth ELSE priority END AS BIGINT)
         |   AS eff_priority FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("taskid"),
        when(col("doc_id") % 2 === 0, -col("depth")).otherwise(col("priority"))
          .cast("long").as("eff_priority"))),

    // O3 — time-queue due filter (task_queue.py:114-159), now = 48
    Q("o3_due_filter",
      s"""$FRONTIER_SQL SELECT taskid, exetime FROM frontier
         | WHERE status = 1 AND exetime <= 48""".stripMargin)(
      (s, dir) => frontier(s, dir)
        .filter(col("status") === 1 && col("exetime") <= 48)
        .select("taskid", "exetime")),

    // O4 — processing-timeout requeue (task_queue.py:161-171):
    // status 2 plays PROCESSING here; now = 100, timeout = 30
    Q("o4_timeout_requeue",
      s"""$FRONTIER_SQL SELECT taskid,
         | CAST(CASE WHEN status = 2 AND lastcrawltime < 100 - 30
         |   THEN 1 ELSE status END AS BIGINT) AS status
         | FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("taskid"),
        when(col("status") === 2 && col("lastcrawltime") < 100 - 30, lit(1))
          .otherwise(col("status")).cast("long").as("status"))),

    // O1 — priority-heap order as global top-k under the documented total
    // order (task_queue.py:27-47 → ORDER BY + LIMIT)
    Q("o1_priority_topk",
      s"""$FRONTIER_SQL SELECT taskid, priority, exetime FROM frontier
         | WHERE status = 1 ORDER BY $selOrderSql LIMIT 50""".stripMargin)(
      (s, dir) => frontier(s, dir).filter(col("status") === 1)
        .orderBy(selOrder: _*).limit(50)
        .select("taskid", "priority", "exetime")),

    // O6 — per-host politeness budget: row_number ≤ budget per host
    // (scheduler.py:244-261, domain.py:14-48); budget = 5
    Q("o6_host_budget",
      s"""$FRONTIER_SQL SELECT host, taskid, rn FROM (
         |  SELECT host, taskid,
         |    row_number() OVER (PARTITION BY host ORDER BY $selOrderSql) AS rn
         |  FROM frontier WHERE status = 1) t WHERE rn <= 5""".stripMargin)(
      (s, dir) => frontier(s, dir).filter(col("status") === 1)
        .withColumn("rn", row_number()
          .over(Window.partitionBy("host").orderBy(selOrder: _*)).cast("long"))
        .filter(col("rn") <= 5).select("host", "taskid", "rn")),

    // O7 — per-project fairness cap LOOP_LIMIT/10 (scheduler.py:419)
    Q("o7_project_caps",
      s"""$FRONTIER_SQL SELECT project, taskid FROM (
         |  SELECT project, taskid,
         |    row_number() OVER (PARTITION BY project ORDER BY $selOrderSql) AS rn
         |  FROM frontier WHERE status = 1) t WHERE rn <= 20""".stripMargin)(
      (s, dir) => frontier(s, dir).filter(col("status") === 1)
        .withColumn("rn", row_number()
          .over(Window.partitionBy("project").orderBy(selOrder: _*)))
        .filter(col("rn") <= 20).select("project", "taskid")),

    // O5 — project token bucket, closed form (token_bucket.py:33-47):
    // budget = min(burst=30, carry + rate(3)*dt(6))
    Q("o5_token_budget",
      s"""$FRONTIER_SQL SELECT project, COUNT(*) AS pending,
         | CAST(LEAST(30, (CASE project WHEN 'p0' THEN 5 WHEN 'p1' THEN 12
         |   ELSE 0 END) + 3 * 6) AS BIGINT) AS budget
         | FROM frontier WHERE status = 1 GROUP BY project""".stripMargin)(
      (s, dir) => frontier(s, dir).filter(col("status") === 1)
        .groupBy("project").agg(count(lit(1)).as("pending"))
        .withColumn("budget",
          least(lit(30),
            when(col("project") === "p0", 5).when(col("project") === "p1", 12)
              .otherwise(0) + lit(3 * 6)).cast("long"))),

    // O9 — INQUEUE_LIMIT overflow drop (scheduler.py:41,314-316): projects
    // over the pending limit drop incoming tasks
    Q("o9_inqueue_limit",
      s"""$FRONTIER_SQL SELECT f.taskid FROM frontier f JOIN (
         |  SELECT project, COUNT(*) AS pending FROM frontier
         |  WHERE status = 1 GROUP BY project) p
         | ON f.project = p.project
         | WHERE f.doc_id % 2 = 1 AND p.pending < 42""".stripMargin)(
      (s, dir) => {
        val f = frontier(s, dir)
        val pending = f.filter(col("status") === 1)
          .groupBy("project").agg(count(lit(1)).as("pending"))
        f.filter(col("doc_id") % 2 === 1)
          .join(broadcast(pending), Seq("project"))
          .filter(col("pending") < 42).select("taskid")
      }),

    // O11 — retry backoff ladder 30s/1h/6h/12h/24h, FAILED when exhausted
    // (scheduler.py:44-50,821-872)
    Q("o11_retry_backoff",
      s"""$FRONTIER_SQL SELECT taskid, retried,
         | CAST(lastcrawltime + CASE retried + 1 WHEN 1 THEN 30 WHEN 2 THEN 3600
         |   WHEN 3 THEN 21600 WHEN 4 THEN 43200 ELSE 86400 END AS BIGINT)
         |   AS next_exetime,
         | CAST(CASE WHEN retried + 1 > 3 THEN 3 ELSE 1 END AS BIGINT) AS next_status
         | FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("taskid"), col("retried"),
        (col("lastcrawltime") +
          when(col("retried") + 1 === 1, 30).when(col("retried") + 1 === 2, 3600)
            .when(col("retried") + 1 === 3, 21600).when(col("retried") + 1 === 4, 43200)
            .otherwise(86400)).cast("long").as("next_exetime"),
        when(col("retried") + 1 > 3, 3).otherwise(1).cast("long").as("next_status"))),

    // O12 — success / auto_recrawl transition (scheduler.py:800-819), now=100
    Q("o12_auto_recrawl",
      s"""$FRONTIER_SQL SELECT taskid,
         | CAST(CASE WHEN age >= 0 THEN 100 + age ELSE NULL END AS BIGINT)
         |   AS next_exetime FROM frontier WHERE status = 2""".stripMargin)(
      (s, dir) => frontier(s, dir).filter(col("status") === 2)
        .select(col("taskid"),
          when(col("age") >= 0, lit(100) + col("age")).otherwise(lit(null))
            .cast("long").as("next_exetime"))),

    // O10 — cron tick generation (@every; scheduler.py:330-358):
    // explode(sequence) + modulo filter; min_tick = 13
    Q("o10_cron_ticks",
      s"""$FRONTIER_SQL SELECT p.project, t.tick
         | FROM (SELECT DISTINCT project FROM frontier) p,
         |      (SELECT CAST(unnest(generate_series(0, 100)) AS BIGINT) AS tick) t
         | WHERE t.tick % 13 = 0""".stripMargin)(
      (s, dir) => frontier(s, dir).select("project").distinct()
        .crossJoin(s.range(0, 101).toDF("tick"))
        .filter(col("tick") % 13 === 0).select("project", "tick")),

    // O14 — restart-by-status (scheduler.py:577-591)
    Q("o14_restart_by_status",
      s"""$FRONTIER_SQL SELECT taskid, TRUE AS force_update FROM frontier
         | WHERE status IN (2, 3)
         |   AND url NOT LIKE 'data:%' AND url NOT LIKE 'curl:%'""".stripMargin)(
      (s, dir) => frontier(s, dir)
        .filter(col("status").isin(2, 3) &&
          !col("url").startsWith("data:") && !col("url").startsWith("curl:"))
        .select(col("taskid"), lit(true).as("force_update"))),

    // G1 — sliding counters → time-bucketed counts over events
    // (libs/counter.py:51-205 ring buffers → groupBy time bucket)
    Q("g1_window_counts",
      """SELECT (epoch_us(ts) // 300000000) * 300 AS bucket, event_type,
        | COUNT(*) AS n FROM events GROUP BY 1, 2""".stripMargin)(
      (s, dir) => table(s, dir, "events")
        .groupBy((expr("unix_micros(cast(ts as timestamp_ltz)) DIV 300000000") * 300).as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))),

    // G1 — event-time AVERAGES per 5-minute window (libs/counter.py:325-427:
    // the reference's sliding counters track avg fetch/process time per
    // window). Quantized-integer protocol: per-event values become exact
    // longs (µ-units), the window aggregate carries (count, exact sum) — the
    // average is s/n, reconstructible bit-identically by any consumer, like
    // the engine's per-round avg_fetch_time/avg_process_time metrics columns
    // (engine/CrawlEngine.TimeModel).
    Q("g1_event_avg",
      """SELECT (epoch_us(ts) // 300000000) * 300 AS bucket, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS s
        | FROM events GROUP BY 1, 2""".stripMargin)(
      (s, dir) => table(s, dir, "events")
        .groupBy((expr("unix_micros(cast(ts as timestamp_ltz)) DIV 300000000") * 300).as("bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 1000000).cast("long")).as("s"))),

    // G2 — status histogram (database/sqlite/taskdb.py:91-104)
    Q("g2_status_histogram",
      s"""$FRONTIER_SQL SELECT project, status, COUNT(*) AS n
         | FROM frontier GROUP BY 1, 2""".stripMargin)(
      (s, dir) => frontier(s, dir).groupBy("project", "status")
        .agg(count(lit(1)).as("n"))),

    // G3 — top-k failed projects (scheduler.py:439-475)
    Q("g3_top_failed",
      s"""$FRONTIER_SQL SELECT project, COUNT(*) AS fails FROM frontier
         | WHERE status = 3 GROUP BY project
         | ORDER BY fails DESC, project LIMIT 2""".stripMargin)(
      (s, dir) => frontier(s, dir).filter(col("status") === 3)
        .groupBy("project").agg(count(lit(1)).as("fails"))
        .orderBy(col("fails").desc, col("project")).limit(2)),

    // G4 — recent-task ring buffer: last-100 per project
    // (scheduler.py:115-119,676-717)
    Q("g4_recent_ring",
      s"""$FRONTIER_SQL SELECT project, taskid FROM (
         |  SELECT project, taskid, row_number() OVER
         |    (PARTITION BY project ORDER BY lastcrawltime DESC, taskid) AS rn
         |  FROM frontier) t WHERE rn <= 100""".stripMargin)(
      (s, dir) => frontier(s, dir)
        .withColumn("rn", row_number().over(Window.partitionBy("project")
          .orderBy(col("lastcrawltime").desc, col("taskid"))))
        .filter(col("rn") <= 100).select("project", "taskid")),

    // F7 — fetch metrics: per-project status-class counts
    // (tornado_fetcher.py:584-599)
    Q("f7_fetch_metrics",
      s"""$FRONTIER_SQL SELECT project,
         | CAST((CASE WHEN doc_id % 10 < 7 THEN 200 WHEN doc_id % 10 < 9
         |   THEN 404 ELSE 599 END // 100) * 100 AS BIGINT) AS status_class,
         | COUNT(*) AS n FROM frontier GROUP BY 1, 2""".stripMargin)(
      (s, dir) => frontier(s, dir)
        .withColumn("code",
          when(col("doc_id") % 10 < 7, 200).when(col("doc_id") % 10 < 9, 404)
            .otherwise(599))
        .groupBy(col("project"),
          ((col("code") / 100).cast("long") * 100).as("status_class"))
        .agg(count(lit(1)).as("n")))
  )
}
