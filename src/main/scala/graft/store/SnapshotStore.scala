package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}

import graft.model.Task

/** Iceberg-shaped Parquet snapshot store (SURVEY §7 item 4: no Iceberg
  * runtime jar ships offline, so v1 implements the same contract — atomic
  * per-round snapshots, append-only logs, per-partition lineage counts in a
  * manifest — on plain Parquet; swapping in Iceberg is a config change).
  *
  * Layout under `root/`:
  * {{{
  *   round=N/live/           live frontier (ACTIVE|PROCESSING rows), rewritten per round
  *   round=N/host_tokens/    politeness-bucket carry
  *   round=N/proj_tokens/
  *   round=N/_MANIFEST.json  commit marker — written LAST; a round without it is invisible
  *   archive/round=N/        append-only terminal rows (log-structured; latest-wins on read)
  *   results/round=N/        append-only result rows
  *   metrics/round=N/        per-round per-project counters (G1/G5 analog)
  * }}}
  *
  * Resume = max committed N; archive/results/metrics dirs are only read for
  * committed rounds, so a crash mid-round leaves invisible garbage, never a
  * torn state (the reference's analog: taskdb IS the checkpoint,
  * scheduler.py:151-186 + counter dumps :477-489).
  */
class SnapshotStore(val root: String)(implicit spark: SparkSession) {
  import spark.implicits._

  private val hconf = spark.sparkContext.hadoopConfiguration
  private def fs: FileSystem = new Path(root).getFileSystem(hconf)

  def roundDir(n: Long) = s"$root/round=$n"
  def manifestPath(n: Long) = new Path(s"${roundDir(n)}/_MANIFEST.json")

  def committedRounds(): Seq[Long] = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return Nil
    fs.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("round=") => s.stripPrefix("round=").toLong }
      .filter(n => fs.exists(manifestPath(n)))
      .sorted
  }

  def lastCommitted(): Option[Long] = committedRounds().lastOption

  /** Materializations are LOCALLY SORTED by (status, schedule.exetime) so
    * the due scan's pushed predicates (Frontier.due) can skip whole row
    * groups: in a steady-state frontier the not-yet-due recrawl tail — the
    * bulk of a 10^10-row frontier — clusters into row groups whose
    * min(exetime) stats exceed the quantized `now`, and the scan never
    * touches them (Iceberg's sort-order analog). A local sort at
    * materialization cadence only; per-round MOR deltas stay unsorted. */
  private def dueSorted(live: DataFrame, prefix: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    live.sortWithinPartitions(
      (prefix.map(col) :+ col("status") :+ col("schedule.exetime")): _*)
  }

  def writeLive(n: Long, live: Dataset[Task]): Unit =
    dueSorted(live.toDF(), Nil)
      .write.mode(SaveMode.Overwrite).parquet(s"${roundDir(n)}/live")

  /** Zero-delta round: round `n`'s live frontier IS round `ref`'s — record a
    * reference marker instead of rewriting the whole snapshot (Iceberg's
    * unchanged-snapshot analog). The marker stores the ROOT round (ref's own
    * marker is resolved at write time), so consecutive quiet rounds stay
    * O(1) to read instead of an O(k) recursive chain (ADVICE r2). */
  def writeLiveRef(n: Long, ref: Long): Unit = {
    val refP = new Path(s"${roundDir(ref)}/live_ref")
    val root =
      if (!fs.exists(refP)) ref
      else {
        val in = fs.open(refP)
        val bytes = new Array[Byte](fs.getFileStatus(refP).getLen.toInt)
        in.readFully(bytes); in.close()
        new String(bytes, "UTF-8").trim.toLong
      }
    val out = fs.create(new Path(s"${roundDir(n)}/live_ref"), true)
    out.write(root.toString.getBytes("UTF-8")); out.close()
  }

  // ---- bucketed copy-on-write live snapshots (Iceberg-manifest analog) ---
  // The live frontier is hash-bucketed by taskid. A round writes ONLY the
  // buckets its selected/candidate keys touch; the round's live manifest
  // maps every bucket to (source round, rows) — unchanged buckets inherit
  // the previous manifest's pointer. A politeness-bounded round over a
  // 10^10-row frontier thus writes O(changed-buckets), not O(|live|) —
  // the r1-verdict scale-killer. Old bucket versions stay on disk while a
  // committed manifest references them (snapshot history, like Iceberg).

  /** bucket id column for `taskid` — Murmur3 via hash(): deterministic
    * across sessions, so bucket membership is stable over resume. */
  def bucketCol(nBuckets: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    pmod(hash(col("taskid")), lit(nBuckets))
  }

  private def liveManifestPath(n: Long) = new Path(s"${roundDir(n)}/live_manifest.json")

  def readLiveManifest(n: Long): Option[Map[Int, (Long, Long)]] = {
    val p = liveManifestPath(n)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    in.readFully(bytes); in.close()
    val s = new String(bytes, "UTF-8")
    Some("""\{"b":(\d+),"round":(\d+),"rows":(\d+)\}""".r.findAllMatchIn(s)
      .map(m => m.group(1).toInt -> (m.group(2).toLong, m.group(3).toLong))
      .toMap)
  }

  private def writeLiveManifest(n: Long, m: Map[Int, (Long, Long)]): Unit = {
    val json = m.toSeq.sortBy(_._1)
      .map { case (b, (r, rows)) => s"""{"b":$b,"round":$r,"rows":$rows}""" }
      .mkString("""{"buckets":[""", ",", "]}")
    val tmp = new Path(s"${roundDir(n)}/live_manifest.json.tmp")
    val out = fs.create(tmp, true)
    out.write(json.getBytes("UTF-8")); out.close()
    fs.rename(tmp, liveManifestPath(n))
  }

  /** Exact row counts of the bucket dirs just written, from parquet footers
    * (driver-side metadata reads — no job). */
  private def footerRows(dir: Path): Long = {
    if (!fs.exists(dir)) return 0L
    fs.listStatus(dir).filter(f => f.getPath.getName.endsWith(".parquet")).map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, hconf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Test/dev override of the live-write distribution gate: Some(true)
    * forces the hash-distributed partitioned layout, Some(false) the plain
    * map-side one; None (default) uses GRAFT_LIVE_REPART / the file-count
    * budget. StoreFuzzSpec flips this per write to prove mixed-layout
    * manifest chains read exactly. */
  @volatile var liveRepartOverride: Option[Boolean] = None

  /** Upstream write-task estimate for the layout gate, from the PHYSICAL
    * PLAN, not `.rdd`: building the RDD kicks off the plan's
    * broadcast-build futures (SparkPlan.prepare) before the write's own
    * execution — planning alone launches no job and cannot be charged for
    * upstream compute the write then re-plans.
    *
    * ADVICE r3 fix: `SparkPlan.outputPartitioning` is UnknownPartitioning(0)
    * for AQE roots (AdaptiveSparkPlanExec never overrides it) and for
    * map-only scan pipelines — a 0 is "unknown", NOT "zero tasks", and the
    * old code fed it straight into `mapSideFiles`, permanently disabling the
    * hash-distributed layout (the documented 10^4+-task safeguard). Unwrap
    * the AQE root (`inputPlan` is the un-executed physical plan — still no
    * job) and treat any non-positive estimate as unknown → assume the
    * session's shuffle parallelism, the write's actual task count for every
    * shuffle-fed pipeline and a sane scale proxy otherwise. */
  private[graft] def mapSideTaskEstimate(live: DataFrame): Long = {
    val est =
      try {
        val p = live.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.inputPlan
          case other => other
        }
        p.outputPartitioning.numPartitions
      } catch { case _: Exception => 0 }
    (if (est > 0) est else spark.sessionState.conf.numShufflePartitions).toLong
  }

  /** Write round `n`'s live set bucketed. `changed = None` rewrites every
    * bucket (BFS-explosion rounds, first round, fallback); `Some(set)`
    * expects `live` ALREADY FILTERED to those buckets and inherits the rest
    * from round n-1's manifest (which must exist). `live` must carry
    * `__bucket`. Returns total live rows across all buckets (exact counts
    * from the post-write metadata aggregation). */
  def writeLiveBucketed(n: Long, live: DataFrame, changed: Option[Set[Int]],
                        nBuckets: Int): Long = {
    val dir = s"${roundDir(n)}/live"
    // Write distribution, gated by the file count a PARTITIONED layout would
    // produce (all layouts are bit-parity — MorParity/EngineKnobs COW tests):
    //  - under the budget: PLAIN map-side files sorted by (__bucket, status,
    //    exetime), with __bucket kept as a data column — zero exchange, one
    //    file per upstream task. Bucket-pruned reads use row-group min/max
    //    on the sorted __bucket. The previous map-side partitionBy layout
    //    (one file per task × bucket) was the measured non-scaling term of
    //    explosion rounds: 2048 small files cost 11-13 s to write plus
    //    13-16 s of DRIVER-SERIAL footer reads for the manifest at BOTH
    //    cluster sizes (tools.WriteShape2; run-F phase logs showed writeLive
    //    at 20-35 s with a 1.04× N→4N speedup). Plain: 0.7-2.6 s write +
    //    0.5 s manifest, and the manifest counts come from a column-pruned
    //    executor-parallel agg instead of the driver.
    //  - above the budget (true scale: 10^4+ tasks × 10^3 buckets would be
    //    10^7+ interleaved files that force every pruned read to open every
    //    file), hash-distribute on __bucket into the partitioned layout —
    //    Iceberg's write.distribution-mode=hash for exactly this reason.
    //    One file per bucket keeps pruned reads O(touched buckets) and the
    //    per-bucket manifest footers O(B) single-file reads.
    //    (The unconditional shuffle was also measured WRONG at bench scale:
    //    18.5k vs 11.4k urls/s on 4×4 multi-JVM — cross-JVM serialization
    //    of the full frontier; see BENCH/BASELINE.md "Round-3 (late)".)
    // GRAFT_LIVE_REPART=true/false forces either path (dev A/B).
    val maxFiles = sys.env.getOrElse("GRAFT_LIVE_MAX_FILES", "8192").toLong
    val mapSideFiles = mapSideTaskEstimate(live) * nBuckets
    val repart = liveRepartOverride.orElse(
      sys.env.get("GRAFT_LIVE_REPART").map(_ == "true")) match {
      case Some(v) => v
      case None => mapSideFiles > maxFiles
    }
    if (repart)
      dueSorted(live.repartition(nBuckets,
          org.apache.spark.sql.functions.col("__bucket")), Seq("__bucket"))
        .write.mode(SaveMode.Overwrite).partitionBy("__bucket").parquet(dir)
    else
      dueSorted(live, Seq("__bucket"))
        .write.mode(SaveMode.Overwrite).parquet(dir)
    // per-bucket manifest counts from ONE executor-parallel zero-column agg
    // (count(*) over parquet row-group metadata), for BOTH layouts — a
    // driver-side footer loop here is O(files) serial time per
    // materialization (the measured 13-16 s Amdahl term at 2048 files;
    // minutes at a real-scale B=64k partitioned write)
    val counts: Map[Int, Long] =
      if (!hasParquet(dir)) Map.empty // zero-row write → no data files
      else spark.read.parquet(dir).groupBy("__bucket").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val m = changed match {
      case None =>
        (0 until nBuckets).map(b => b -> (n, counts.getOrElse(b, 0L))).toMap
      case Some(chg) =>
        val prev = readLiveManifest(n - 1).getOrElse(
          throw new IllegalStateException(s"no live manifest at ${n - 1}"))
        // ADVICE r2: a resume with a different cfg.liveBuckets must not
        // inherit buckets laid out under the old count (silent corruption) —
        // the engine gates on manifest size, this is the hard backstop
        require(prev.size == nBuckets,
          s"live bucket count changed ${prev.size} -> $nBuckets at round $n; " +
            "COW inherit is invalid — caller must fall back to a full rewrite")
        (0 until nBuckets).map { b =>
          if (chg(b)) b -> (n, counts.getOrElse(b, 0L))
          else b -> prev(b)
        }.toMap
    }
    writeLiveManifest(n, m)
    m.values.map(_._2).sum
  }

  /** Layout of round `r`'s live dir: plain sorted files (true) vs
    * `__bucket=` partition dirs (false). Detected from the dir contents so
    * mixed-layout manifests (a partial partitioned round inheriting from a
    * plain full rewrite, or vice versa) read correctly. */
  private def livePlain(r: Long): Boolean = {
    val dir = new Path(s"${roundDir(r)}/live")
    fs.exists(dir) && fs.listStatus(dir).exists(
      _.getPath.getName.endsWith(".parquet"))
  }

  /** Any parquet data file under `dir` (recursive — finds files nested in
    * `__bucket=` partition dirs too)? */
  private def hasParquet(dir: String): Boolean = {
    val p = new Path(dir)
    if (!fs.exists(p)) return false
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      if (it.next().getPath.getName.endsWith(".parquet")) return true
    }
    false
  }

  /** Read the live rows that manifest `m` maps to `buckets` (None = all).
    * Sources are grouped by round; each source round's layout is detected
    * (plain vs partitioned). A plain round is ALWAYS filtered to the
    * buckets the manifest maps to it — its dir may hold stale rows of
    * buckets a later round rewrote — except in the single-source full case
    * where the filter is provably a no-op. */
  private def readManifestBuckets(m: Map[Int, (Long, Long)],
                                  buckets: Option[Set[Int]]): Dataset[Task] = {
    import org.apache.spark.sql.functions.col
    val want = buckets match {
      case Some(bs) => m.filter { case (b, _) => bs(b) }
      case None => m
    }
    val byRound = want.groupBy { case (_, (r, _)) => r }
    val parts = byRound.toSeq.sortBy(_._1).flatMap { case (r, entries) =>
      val dir = s"${roundDir(r)}/live"
      val bs = entries.keySet
      if (livePlain(r)) {
        val df = spark.read.parquet(dir)
        val filtered =
          if (byRound.size == 1 && bs.size == m.size) df
          else bucketSetFilter(df, bs, m.size)
        Some(filtered.select(taskCols: _*))
      } else {
        val paths = bs.toSeq.sorted.map(b => s"$dir/__bucket=$b")
          .filter(p => fs.exists(new Path(p)))
        if (paths.isEmpty) None
        else Some(spark.read.parquet(paths: _*).select(taskCols: _*))
      }
    }
    if (parts.isEmpty) spark.emptyDataset[Task]
    else parts.reduce(_ union _).as[Task]
  }

  /** Bucket-set predicate that stays cheap to PLAN at real-scale bucket
    * counts (ADVICE r3: a mixed-layout chain read at B=64k was building an
    * `In` with tens of thousands of literals per source round — slow to
    * analyze and near expression-size limits). Shape chosen by the set:
    * contiguous → one `between` (reaches parquet row-group min/max on the
    * __bucket-sorted plain layout, strictly better than `In`); small set or
    * small complement → bounded `isin` / negated `isin`; otherwise (huge
    * fragmented set) → broadcast left-semi join, O(1) expression size. */
  private val MaxInLiterals = 256
  private def bucketSetFilter(df: DataFrame, bs: Set[Int], nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    val sorted = bs.toSeq.sorted
    val compl = (0 until nBuckets).filterNot(bs)
    if (sorted.nonEmpty && sorted.size == sorted.last - sorted.head + 1)
      df.filter(col("__bucket").between(sorted.head, sorted.last))
    else if (sorted.size <= MaxInLiterals)
      df.filter(col("__bucket").isin(sorted: _*))
    else if (compl.size <= MaxInLiterals)
      df.filter(!col("__bucket").isin(compl: _*))
    else
      df.join(org.apache.spark.sql.functions.broadcast(
        spark.createDataset(sorted).toDF("__bucket")), Seq("__bucket"), "left_semi")
  }

  /** Quiet-round carry: round `n` inherits round `n-1`'s bucket manifest
    * verbatim (zero data writes). Returns false when n-1 isn't bucketed
    * (caller falls back to a live_ref marker). */
  def carryLiveManifest(n: Long): Boolean =
    readLiveManifest(n - 1) match {
      case Some(m) => writeLiveManifest(n, m); true
      case None => false
    }

  // ---- merge-on-read live deltas (the O(selected)-write round) -----------
  // Bucket-level COW cannot bound a round's write: selected/candidate keys
  // are HASH-UNIFORM over taskid, so any round with more than a handful of
  // keys touches every bucket and degenerates to a full rewrite (measured:
  // 2048 selected keys over B=32 → all 32 buckets, 10^7-row frontier
  // rewritten per round). The scale shape is Iceberg's merge-on-read with
  // equality deletes: a bounded round writes ONLY
  //   round=N/live_delta/up/   rows whose state changed or that inserted
  //   round=N/live_delta/del/  (project, taskid) keys that LEFT the live set
  //   round=N/live_delta.json  {"base":B,"rows":cumulativeOverlayRows}
  // and readers overlay the delta chain (base, N] onto the last
  // materialized snapshot `B`: base rows minus overlaid keys, plus the
  // latest-round upsert per key. The overlay is bounded by the caller
  // (cumulative rows tracked in the marker; the engine materializes a full
  // snapshot when it grows past its broadcast budget or at compaction
  // cadence), so the overlay side BROADCASTS and the base streams map-side
  // — a round's live write AND the read overlay are O(round), not O(|live|).

  private def liveDeltaMarker(n: Long) = new Path(s"${roundDir(n)}/live_delta.json")
  private def liveDeltaDir(n: Long) = s"${roundDir(n)}/live_delta"

  /** (base materialized round, cumulative overlay rows) of round n's delta
    * chain, if round n is a delta round. */
  def liveDeltaInfo(n: Long): Option[(Long, Long)] = {
    val p = liveDeltaMarker(n)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    in.readFully(bytes); in.close()
    val s = new String(bytes, "UTF-8")
    for {
      b <- """"base":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
      r <- """"rows":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    } yield (b, r)
  }

  /** Nearest materialized live snapshot at or below round `r` (a bucketed
    * manifest, a plain live dir, a live_ref root, or a delta chain's base). */
  def resolveLiveBase(r: Long): Long = {
    if (fs.exists(liveManifestPath(r)) || fs.exists(new Path(s"${roundDir(r)}/live")))
      r
    else liveDeltaInfo(r) match {
      case Some((base, _)) => base
      case None =>
        val refP = new Path(s"${roundDir(r)}/live_ref")
        if (fs.exists(refP)) {
          val in = fs.open(refP)
          val bytes = new Array[Byte](fs.getFileStatus(refP).getLen.toInt)
          in.readFully(bytes); in.close()
          resolveLiveBase(new String(bytes, "UTF-8").trim.toLong)
        } else
          throw new IllegalStateException(s"no live snapshot at round $r")
    }
  }

  /** Cumulative overlay rows of round `r`'s delta chain — 0 when `r` is a
    * materialized snapshot; follows live_ref markers (a quiet round between
    * delta rounds must not reset the budget counter). */
  def liveOverlayRows(r: Long): Long =
    liveDeltaInfo(r) match {
      case Some((_, cum)) => cum
      case None =>
        if (fs.exists(liveManifestPath(r)) ||
            fs.exists(new Path(s"${roundDir(r)}/live"))) 0L
        else {
          val refP = new Path(s"${roundDir(r)}/live_ref")
          if (!fs.exists(refP)) 0L
          else {
            val in = fs.open(refP)
            val bytes = new Array[Byte](fs.getFileStatus(refP).getLen.toInt)
            in.readFully(bytes); in.close()
            liveOverlayRows(new String(bytes, "UTF-8").trim.toLong)
          }
        }
    }

  /** Write round `n`'s live state as a delta over round n-1. `upserts` must
    * carry the full Task columns; `deleteKeys` is (project, taskid) of rows
    * that left the live set THIS round, already excluding any key that also
    * appears in `upserts` (same-round re-admission wins). Returns the rows
    * written as (upsertRows, deleteRows), footer-exact. */
  def writeLiveDelta(n: Long, upserts: DataFrame, deleteKeys: DataFrame): (Long, Long) = {
    import org.apache.spark.sql.functions.lit
    val base = resolveLiveBase(n - 1)
    val prevCum = liveOverlayRows(n - 1)
    upserts.withColumn("__dround", lit(n))
      .write.mode(SaveMode.Overwrite).parquet(s"${liveDeltaDir(n)}/up")
    deleteKeys.select(deleteKeys("project"), deleteKeys("taskid"))
      .withColumn("__dround", lit(n))
      .write.mode(SaveMode.Overwrite).parquet(s"${liveDeltaDir(n)}/del")
    val upRows = footerRows(new Path(s"${liveDeltaDir(n)}/up"))
    val delRows = footerRows(new Path(s"${liveDeltaDir(n)}/del"))
    val json = s"""{"base":$base,"rows":${prevCum + upRows + delRows}}"""
    val tmp = new Path(s"${roundDir(n)}/live_delta.json.tmp")
    val out = fs.create(tmp, true)
    out.write(json.getBytes("UTF-8")); out.close()
    fs.rename(tmp, liveDeltaMarker(n))
    (upRows, delRows)
  }

  /** Round n's live set = base snapshot with the delta chain (base, n]
    * overlaid, latest round wins per (project, taskid). The overlay side is
    * bounded (see writeLiveDelta) and BROADCAST — the base is never
    * shuffled or rewritten. */
  private def readLiveViaDeltas(n: Long, base: Long,
      pruneTo: Option[(Set[Int], Int)] = None): Dataset[Task] = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, max, struct}
    val rounds = ((base + 1) to n)
      .filter(r => fs.exists(new Path(s"${liveDeltaDir(r)}/up")))
    val upDirs = rounds.map(r => s"${liveDeltaDir(r)}/up")
    val delDirs = rounds.map(r => s"${liveDeltaDir(r)}/del")
      .filter(d => fs.exists(new Path(d)))
    // bucket pruning: membership is a pure function of taskid, so dropping
    // rows outside the bucket set — on BOTH the base and the (bounded)
    // delta overlay — is exact for any key that hashes into the set
    val prune: DataFrame => DataFrame = pruneTo match {
      case Some((bks, nb)) => df => df.filter(bucketCol(nb).isin(bks.toSeq: _*))
      case None => identity
    }
    val taskSchema = org.apache.spark.sql.Encoders.product[Task].schema
    val ups = prune(spark.read.parquet(upDirs: _*))
      .select((taskCols :+ col("__dround")): _*)
      .select(col("project"), col("taskid"), col("__dround"),
        lit(true).as("__keep"), struct(taskCols: _*).as("__row"))
    val dels =
      if (delDirs.isEmpty) None
      else Some(prune(spark.read.parquet(delDirs: _*))
        .select(col("project"), col("taskid"), col("__dround"),
          lit(false).as("__keep"), lit(null).cast(taskSchema).as("__row")))
    val overlay = dels.fold(ups)(ups.union(_))
      .groupBy("project", "taskid")
      .agg(max(struct(col("__dround"), col("__keep"), col("__row"))).as("w"))
    val baseLive = pruneTo match {
      case Some((bks, _)) => readLiveBuckets(base, bks).toDF()
      case None => readLive(base).toDF()
    }
    baseLive
      .join(broadcast(overlay.select("project", "taskid")),
        Seq("project", "taskid"), "left_anti")
      .select(taskCols: _*)
      .union(overlay.filter(col("w.__keep")).select(
        taskColNames.map(c => col(s"w.__row.$c").as(c)): _*))
      .as[Task]
  }

  /** Read ONLY the given buckets of round `n`'s live snapshot — the
    * bucket-pruned merge/status legs (VERDICT r2 top item): a politeness-
    * bounded round touches O(selected + candidate) buckets; the untouched
    * rest carries through the manifest with zero compute. Caller gates on
    * the manifest existing with the right bucket count. */
  def readLiveBuckets(n: Long, buckets: Set[Int]): Dataset[Task] = {
    val m = readLiveManifest(n).getOrElse(
      throw new IllegalStateException(s"readLiveBuckets($n): no live manifest"))
    readManifestBuckets(m, Some(buckets))
  }

  /** Bucket-pruned live read that also works mid-delta-chain: reads ONLY
    * `buckets` of the nearest materialized bucketed snapshot and overlays
    * the bounded delta chain filtered to those buckets. EXACT for any probe
    * keyed into `buckets` (bucket = f(taskid)). None when the underlying
    * materialization isn't bucketed under `nBuckets` — caller falls back to
    * the full read. This is what keeps a politeness-bounded MOR round's
    * merge leg at O(touched buckets) instead of one full frontier scan at
    * 10^10 rows. */
  def readLivePruned(n: Long, buckets: Set[Int],
                     nBuckets: Int): Option[Dataset[Task]] = {
    if (readLiveManifest(n).exists(_.size == nBuckets))
      Some(readLiveBuckets(n, buckets))
    else liveDeltaInfo(n) match {
      case Some((base, _)) if readLiveManifest(base).exists(_.size == nBuckets) =>
        Some(readLiveViaDeltas(n, base, Some((buckets, nBuckets))))
      case Some(_) => None
      case None =>
        // quiet round: follow the ref TARGET (may itself be a delta round
        // whose overlay still applies — resolveLiveBase would skip it)
        val refP = new Path(s"${roundDir(n)}/live_ref")
        if (!fs.exists(refP)) None
        else {
          val in = fs.open(refP)
          val bytes = new Array[Byte](fs.getFileStatus(refP).getLen.toInt)
          in.readFully(bytes); in.close()
          val ref = new String(bytes, "UTF-8").trim.toLong
          if (ref == n) None else readLivePruned(ref, buckets, nBuckets)
        }
    }
  }

  def readLive(n: Long): Dataset[Task] = {
    readLiveManifest(n) match {
      case Some(m) => readManifestBuckets(m, None)
      case None =>
        val dir = new Path(s"${roundDir(n)}/live")
        if (fs.exists(dir))
          spark.read.parquet(dir.toString).select(taskCols: _*).as[Task]
        else liveDeltaInfo(n) match {
          case Some((base, _)) => readLiveViaDeltas(n, base)
          case None =>
            val refP = new Path(s"${roundDir(n)}/live_ref")
            val in = fs.open(refP)
            val bytes = new Array[Byte](fs.getFileStatus(refP).getLen.toInt)
            in.readFully(bytes); in.close()
            readLive(new String(bytes, "UTF-8").trim.toLong)
        }
    }
  }

  /** Task columns in declaration order (drops any partition-derived extras
    * like `__bucket` a multi-leaf-dir read may surface). */
  private lazy val taskColNames: Seq[String] =
    Seq("taskid", "project", "url", "status", "host", "depth", "schedule",
      "fetch", "process", "track", "lastcrawltime", "updatetime",
      "selected_at", "seq")
  private lazy val taskCols = {
    import org.apache.spark.sql.functions.col
    taskColNames.map(col)
  }

  /** Both bucket tables in ONE write (a `kind` discriminator column) —
    * halves the per-round commit jobs. */
  def writeTokens(n: Long, host: DataFrame, proj: DataFrame): Unit = {
    import org.apache.spark.sql.functions.lit
    host.selectExpr("host as key", "tokens").withColumn("kind", lit("host"))
      .union(proj.selectExpr("project as key", "tokens").withColumn("kind", lit("proj")))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"${roundDir(n)}/tokens")
  }

  /** Unified (kind, key, tokens) carry written as-is. */
  def writeTokensUnified(n: Long, unified: DataFrame): Unit =
    unified.write.mode(SaveMode.Overwrite).parquet(s"${roundDir(n)}/tokens")

  def readTokensUnified(n: Long): DataFrame =
    spark.read.parquet(s"${roundDir(n)}/tokens")

  def readTokens(n: Long): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.col
    val t = spark.read.parquet(s"${roundDir(n)}/tokens")
    (t.filter(col("kind") === "host").select(col("key").as("host"), col("tokens")),
      t.filter(col("kind") === "proj").select(col("key").as("project"), col("tokens")))
  }

  def appendArchive(n: Long, delta: Dataset[Task]): Unit =
    delta.write.mode(SaveMode.Overwrite).parquet(s"$root/archive/round=$n")

  // ---- archive compaction (VERDICT r1 scale item 2) ----------------------
  // Without compaction readArchive unions EVERY round dir, so round cost
  // grows O(rounds). compactArchive(n) folds the log ≤ n to latest-per-key;
  // readers then see one compact snapshot + only the deltas after it.
  // Atomicity: the _DONE marker is written last — a torn compaction is
  // invisible and simply retried at the next cadence.

  private def compactDir(n: Long) = s"$root/archive/compact=$n"
  private def compactMarker(n: Long) = new Path(s"${compactDir(n)}/_DONE")

  def compactions(): Seq[Long] = {
    val p = new Path(s"$root/archive")
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("compact=") => s.stripPrefix("compact=").toLong }
      .filter(n => fs.exists(compactMarker(n)))
      .sorted
  }

  /** Fold the archive log up to round `n` into one latest-per-key snapshot.
    * Written hash-distributed by (project, taskid) so the merge joins that
    * consume it align with the file layout (Iceberg bucket partitioning at
    * cluster scale). `exclude` drops whole projects during the fold (O15
    * delete: the compaction IS the physical purge). */
  def compactArchive(n: Long, exclude: Set[String] = Set.empty): Unit = {
    import org.apache.spark.sql.functions.col
    val base = graft.frontier.SeenSet.latest(readArchive(n))
    val kept = if (exclude.isEmpty) base
               else base.filter(t => !exclude.contains(t.project))
    val snap = kept
      .toDF().repartition(col("project"), col("taskid")).as[Task]
    snap.write.mode(SaveMode.Overwrite).parquet(compactDir(n))
    val out = fs.create(compactMarker(n), true)
    out.write("done".getBytes("UTF-8")); out.close()
    // older compactions (and their bucket blooms) are now redundant — drop
    // them (readers never pick a non-latest compaction, so deleting is safe)
    compactions().filter(_ < n).foreach { c =>
      fs.delete(new Path(compactDir(c)), true)
      fs.delete(new Path(bloomsDir(c)), true)
    }
  }

  // ---- bucket-local seen-blooms (the >bloomCap scale path) ---------------
  // One bloom per taskid bucket, built DISTRIBUTED at compaction time and
  // stored next to the compaction they cover. Executors load their buckets
  // lazily (SeenSet.BucketBlooms); the driver never holds more than the
  // post-compaction DELTA bloom — seen-set pre-filtering stays O(1) driver
  // memory at a 10^10-key archive.

  def bloomsDir(n: Long) = s"$root/archive/blooms=$n"
  private def bloomsMarker(n: Long) = new Path(s"${bloomsDir(n)}/_DONE")

  /** Latest completed bucket-bloom set ≤ upTo: (compaction round, nBuckets). */
  def latestArchiveBlooms(upTo: Long): Option[(Long, Int)] = {
    val p = new Path(s"$root/archive")
    if (!fs.exists(p)) return None
    fs.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case s if s.startsWith("blooms=") => s.stripPrefix("blooms=").toLong }
      .filter(c => c <= upTo && fs.exists(bloomsMarker(c)))
      .sorted.lastOption.map { c =>
        val metaP = new Path(s"${bloomsDir(c)}/_meta")
        val in = fs.open(metaP)
        val bytes = new Array[Byte](fs.getFileStatus(metaP).getLen.toInt)
        in.readFully(bytes); in.close()
        (c, new String(bytes, "UTF-8").trim.toInt)
      }
  }

  /** Build per-bucket blooms over compaction `n`'s taskids. Fully
    * distributed: the taskid column is shuffled to one partition per bucket
    * and each partition BUILDS AND WRITES its buckets' blooms executor-side
    * — no driver collect at any size. `expectedPerBucket` sizes each bloom
    * (same-layout blooms are mergeable if buckets ever split). Marker +
    * meta are written last (a torn build is invisible and retried at the
    * next compaction cadence). */
  def buildArchiveBlooms(n: Long, nBuckets: Int, expectedPerBucket: Long,
                         fpp: Double = 0.01): Unit = {
    import org.apache.spark.sql.functions.col
    val dir = bloomsDir(n)
    if (fs.exists(new Path(dir))) fs.delete(new Path(dir), true)
    fs.mkdirs(new Path(dir))
    val exp = math.max(expectedPerBucket, 1000L)
    spark.read.parquet(compactDir(n)).select(col("taskid"))
      .withColumn("__b", bucketCol(nBuckets))
      .repartition(nBuckets, col("__b"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val blooms = scala.collection.mutable.Map.empty[
          Int, org.apache.spark.util.sketch.BloomFilter]
        it.foreach { row =>
          blooms.getOrElseUpdate(row.getInt(1),
              org.apache.spark.util.sketch.BloomFilter.create(exp, fpp))
            .putString(row.getString(0))
        }
        if (blooms.nonEmpty) {
          val conf = new org.apache.hadoop.conf.Configuration()
          blooms.foreach { case (b, bf) =>
            val p = new Path(s"$dir/bucket=$b.bloom")
            val pfs = p.getFileSystem(conf)
            val out = pfs.create(p, true)
            try bf.writeTo(out) finally out.close()
          }
        }
      }
    // buckets with zero archived keys get an EMPTY bloom so executor probes
    // never miss a file (mightContain = false for everything, exactly right)
    val empty = org.apache.spark.util.sketch.BloomFilter.create(1000L, fpp)
    (0 until nBuckets).foreach { b =>
      val p = new Path(s"$dir/bucket=$b.bloom")
      if (!fs.exists(p)) {
        val out = fs.create(p, true)
        try empty.writeTo(out) finally out.close()
      }
    }
    val meta = fs.create(new Path(s"$dir/_meta"), true)
    meta.write(nBuckets.toString.getBytes("UTF-8")); meta.close()
    val done = fs.create(bloomsMarker(n), true)
    done.write("done".getBytes("UTF-8")); done.close()
  }

  /** Archive delta dirs in (c, upTo] only — the rows a bucket-bloom set
    * built at compaction `c` does NOT cover (the engine's delta bloom). */
  def readArchiveDeltasAfter(c: Long, upTo: Long): Dataset[Task] = {
    val dirs = committedRounds().filter(n => n > c && n <= upTo)
      .map(n => s"$root/archive/round=$n")
      .filter(d => fs.exists(new Path(d)))
    if (dirs.isEmpty) spark.emptyDataset[Task]
    else spark.read.parquet(dirs: _*).as[Task]
  }

  /** Latest-wins log read: newest compaction ≤ upTo, plus deltas after it. */
  def readArchive(upTo: Long): Dataset[Task] = {
    val base = compactions().filter(_ <= upTo).lastOption
    val dirs = base.map(compactDir).toSeq ++
      committedRounds().filter(n => n <= upTo && base.forall(n > _))
        .map(n => s"$root/archive/round=$n")
        .filter(d => fs.exists(new Path(d)))
    if (dirs.isEmpty) spark.emptyDataset[Task]
    else spark.read.parquet(dirs: _*).as[Task]
  }

  def appendResults(n: Long, results: DataFrame): Unit =
    results.write.mode(SaveMode.Overwrite).parquet(s"$root/results/round=$n")

  /** O14 restart-by-status / operator control rows: candidates injected for
    * round `n` (consumed by runRound(n) as extra merge candidates). */
  def writeControl(n: Long, tasks: Dataset[Task]): Unit =
    tasks.write.mode(SaveMode.Overwrite).parquet(s"$root/control/round=$n")

  def hasControl(n: Long): Boolean =
    fs.exists(new Path(s"$root/control/round=$n"))

  def readControl(n: Long): Dataset[Task] = {
    val d = s"$root/control/round=$n"
    if (fs.exists(new Path(d))) spark.read.parquet(d).as[Task]
    else spark.emptyDataset[Task]
  }

  /** S8 raw-HTML sink (reference processor/save_html.py:23-52): per-task
    * body persistence behind the project's save_html flag. */
  def appendHtml(n: Long, html: DataFrame): Unit =
    html.write.mode(SaveMode.Overwrite).parquet(s"$root/html/round=$n")

  def readHtml(): DataFrame = {
    val dirs = committedRounds().map(n => s"$root/html/round=$n")
      .filter(d => fs.exists(new Path(d)))
    if (dirs.isEmpty) spark.emptyDataFrame
    else dropDeleted(spark.read.parquet(dirs: _*))
  }

  def appendMetrics(n: Long, metrics: DataFrame): Unit =
    metrics.write.mode(SaveMode.Overwrite).parquet(s"$root/metrics/round=$n")

  def readResults(): DataFrame = {
    val dirs = committedRounds().map(n => s"$root/results/round=$n")
      .filter(d => fs.exists(new Path(d)))
    if (dirs.isEmpty) spark.emptyDataFrame
    else dropDeleted(spark.read.parquet(dirs: _*))
  }

  // ---- O15 project delete (projectdb 'STOP'+delete group; the reference
  // scheduler drops the project's taskdb/resultdb data, scheduler.py
  // _check_delete). Deletion is LOGICAL first (a tombstone marker filters
  // every read — O(1), like Iceberg delete files), with the heavyweight
  // physical rewrite folded into the normal compaction/vacuum cadence.

  private def tombstoneDir = s"$root/_deleted"
  private def tombstone(project: String) =
    new Path(s"$tombstoneDir/${java.net.URLEncoder.encode(project, "UTF-8")}")

  def deletedProjects(): Set[String] = {
    val p = new Path(tombstoneDir)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(st =>
      java.net.URLDecoder.decode(st.getPath.getName, "UTF-8")).toSet
  }

  private def dropDeleted(df: DataFrame): DataFrame = {
    val dead = deletedProjects()
    if (dead.isEmpty) df
    else df.filter(!org.apache.spark.sql.functions.col("project")
      .isin(dead.toSeq: _*))
  }

  /** Purge `project` at committed round `n`: tombstone (logical, instant for
    * results/html/metrics readers), archive compaction with exclusion (so
    * the seen-set forgets the project — re-adding it later re-crawls from
    * scratch, matching a reference project delete + re-create), and the
    * purged LIVE frontier published as a NEW committed round `n+1`. The
    * committed round `n` is never mutated (ADVICE r2: the in-place swap
    * could leave a truncated or unreadable committed snapshot on crash) —
    * a crash anywhere in here leaves round `n` intact and is healed by
    * re-running the purge (every step is idempotent). */
  def purgeProject(n: Long, project: String): Unit = {
    import org.apache.spark.sql.functions.col
    val out = fs.create(tombstone(project), true)
    out.write("deleted".getBytes("UTF-8")); out.close()
    // archive: fold to a compaction that excludes the project (atomic via
    // its _DONE marker; also removes per-round delta dirs from the read path)
    compactArchive(n, exclude = Set(project))
    // live + tokens: write under round n+1, manifest LAST (commit point)
    val m = n + 1
    val mDir = new Path(roundDir(m))
    if (fs.exists(mDir)) fs.delete(mDir, true) // torn uncommitted leftovers
    readLive(n).toDF().filter(col("project") =!= project)
      .write.mode(SaveMode.Overwrite).parquet(s"${roundDir(m)}/live")
    writeTokensUnified(m, readTokensUnified(n)
      .filter(!(col("kind") === "proj" && col("key") === project)))
    // executor-parallel counts (a driver footer loop is O(files) serial)
    val liveRows =
      if (!hasParquet(s"${roundDir(m)}/live")) 0L
      else spark.read.parquet(s"${roundDir(m)}/live").count()
    val archTotal =
      if (!hasParquet(compactDir(n))) 0L
      else spark.read.parquet(compactDir(n)).count()
    commit(m, nowOf(n), liveRows, 0, archTotal, 0, 0,
      Seq("live" -> liveRows), processingRows = processingRowsOf(n))
  }

  /** Logical clock recorded at round n's commit. */
  def nowOf(n: Long): Double =
    readManifest(n).flatMap { s =>
      """"now":([0-9.eE+-]+)""".r.findFirstMatchIn(s).map(_.group(1).toDouble)
    }.getOrElse(0.0)

  /** Physically drop tombstoned projects from the append-only logs
    * (results/html/metrics) and clear the tombstones. O(round dirs) — run
    * at leisure, reads are already correct via the tombstone filter.
    * Crash-safe: a `.__vac` staging dir is completed (renamed into place)
    * on the next vacuum, so the delete→rename window cannot lose a round
    * dir — finishing the swap is always correct because the staged dir is
    * the filtered copy of the original. */
  def vacuum(): Unit = {
    import org.apache.spark.sql.functions.col
    // recover torn swaps from a previous crashed vacuum FIRST (also when
    // the tombstone set is now empty — the staged dir is still the one
    // consistent copy if the original is gone)
    Seq("results", "html", "metrics").foreach { kind =>
      val base = new Path(s"$root/$kind")
      if (fs.exists(base)) fs.listStatus(base).foreach { st =>
        val name = st.getPath.getName
        if (name.endsWith(".__vac")) {
          val target = new Path(base, name.stripSuffix(".__vac"))
          val staged = fs.exists(new Path(st.getPath, "_SUCCESS"))
          if (!fs.exists(target)) {
            // original already deleted → the staged copy is the only one
            // (and complete: the delete only ever runs after a successful
            // write); promote it
            fs.rename(st.getPath, target)
          } else if (staged) {
            fs.delete(target, true) // crash between write and delete
            fs.rename(st.getPath, target)
          } else {
            fs.delete(st.getPath, true) // torn write; original intact
          }
        }
      }
    }
    val dead = deletedProjects()
    if (dead.isEmpty) return
    Seq("results", "html", "metrics").foreach { kind =>
      committedRounds().map(k => s"$root/$kind/round=$k")
        .filter(d => fs.exists(new Path(d))).foreach { d =>
          spark.read.parquet(d)
            .filter(!col("project").isin(dead.toSeq: _*))
            .write.mode(SaveMode.Overwrite).parquet(s"$d.__vac")
          fs.delete(new Path(d), true)
          fs.rename(new Path(s"$d.__vac"), new Path(d))
        }
    }
    dead.foreach(p => fs.delete(tombstone(p), false))
  }

  // ---- snapshot expiration (Iceberg expire_snapshots analog) -------------
  // Without it the store's STATE footprint grows O(rounds) forever: every
  // round leaves its live buckets / MOR delta dirs / token carry behind even
  // after later materializations supersede them, and the raw per-round
  // archive delta dirs survive the compactions that folded them (measured in
  // the r4 soak: ~90 state files/round, linear). A multi-month crawl at
  // production cadence is 10^5-10^6 rounds — unbounded small-file metadata
  // is a real 100-TB operational failure mode, which is exactly why Iceberg
  // ships expire_snapshots as routine table maintenance.

  /** Drop state unreachable from the LATEST committed round. Keeps
    *  - every round's `_MANIFEST.json` commit marker (cheap metadata
    *    history — `committedRounds()` and the metrics/results readers
    *    iterate it; deleting it would un-commit the round's product rows);
    *  - results/html/metrics dirs (sink output — legitimate data growth);
    *  - all state of rounds within `keepLast` of the head, reachable or not
    *    (resume margin), and everything the head's live chain references:
    *    the manifest's source-round bucket dirs, the MOR delta chain back
    *    to its base, live_ref targets.
    * Drops, for every other committed round: live/ bucket dirs,
    * live_manifest.json, live_delta/ + marker, live_ref, tokens/, control/;
    * plus raw archive `round=` dirs already folded into the latest
    * compaction. Historical `readLive(k)` for an expired k stops working —
    * the Iceberg expire_snapshots contract (readers target the head).
    * Crash-safe and idempotent: only unreachable data is deleted, in
    * arbitrary order — a partial expire leaves every reader's view intact
    * and a re-run finishes the job. Returns the number of deleted paths. */
  def expireSnapshots(keepLast: Int = 8): Long = {
    val rounds = committedRounds()
    if (rounds.isEmpty) return 0L
    val latest = rounds.last

    // live-state reachability from the head, following every layout:
    // bucketed manifest (bucket -> source round), plain live dir, MOR delta
    // chain (every delta round down to the materialized base), live_ref
    val reach = scala.collection.mutable.Set[Long]()
    def mark(r: Long): Unit = {
      if (reach(r)) return
      reach += r
      if (fs.exists(liveManifestPath(r))) {
        readLiveManifest(r).foreach(_.values.foreach { case (src, _) => mark(src) })
      } else if (fs.exists(new Path(s"${roundDir(r)}/live"))) {
        () // materialized (bucket dirs or plain sorted) — terminal
      } else if (fs.exists(liveDeltaMarker(r))) {
        liveDeltaInfo(r).foreach { case (base, _) =>
          ((base + 1) until r).foreach { k =>
            if (fs.exists(liveDeltaMarker(k))) reach += k }
          mark(base)
        }
      } else {
        val refP = new Path(s"${roundDir(r)}/live_ref")
        if (fs.exists(refP)) {
          val in = fs.open(refP)
          val bytes = new Array[Byte](fs.getFileStatus(refP).getLen.toInt)
          in.readFully(bytes); in.close()
          mark(new String(bytes, "UTF-8").trim.toLong)
        }
      }
    }
    mark(latest)

    var deleted = 0L
    def drop(p: Path, recursive: Boolean): Unit =
      if (fs.exists(p)) { fs.delete(p, recursive); deleted += 1 }

    val keepFloor = latest - math.max(keepLast, 1)
    rounds.filter(_ < keepFloor).foreach { r =>
      // tokens and control packs are strictly per-round (written fresh,
      // read only by the following round) — expirable even when the
      // round's LIVE payload is still referenced by a head manifest.
      // NB control lives under $root/control/round=N (writeControl), not
      // under the round dir — deleting the latter was a silent no-op.
      drop(new Path(s"${roundDir(r)}/tokens"), recursive = true)
      drop(new Path(s"$root/control/round=$r"), recursive = true)
      if (!reach(r)) {
        Seq("live", "live_delta")
          .foreach(s => drop(new Path(s"${roundDir(r)}/$s"), recursive = true))
        Seq("live_manifest.json", "live_delta.json", "live_ref")
          .foreach(f => drop(new Path(s"${roundDir(r)}/$f"), recursive = false))
      }
    }

    // archive deltas folded into the latest compaction are dead for the
    // plain readers (readArchive / readArchiveDeltasAfter always overlay the
    // latest compaction and only union round dirs ABOVE it) — but the bloom
    // resume path reads readArchiveDeltasAfter(c_bloom, upTo) where c_bloom
    // is the latest COMPLETED bucket-bloom compaction, which can lag the
    // latest compaction (torn buildArchiveBlooms). Bound the deletion by
    // min(latest compaction, latest bloom compaction) so a direct expire in
    // that state can't starve the delta-bloom rebuild (false negatives =
    // seen tasks re-admitted).
    compactions().lastOption.foreach { c =>
      val floor = latestArchiveBlooms(latest) match {
        case Some((cBloom, _)) => math.min(c, cBloom)
        case None              => c
      }
      rounds.filter(_ <= floor).foreach { k =>
        drop(new Path(s"$root/archive/round=$k"), recursive = true)
      }
    }
    deleted
  }

  def readMetrics(): DataFrame = {
    val dirs = committedRounds().map(n => s"$root/metrics/round=$n")
      .filter(d => fs.exists(new Path(d)))
    if (dirs.isEmpty) spark.emptyDataFrame
    else dropDeleted(spark.read.parquet(dirs: _*))
  }

  /** Commit marker with per-partition lineage counts (north rule).
    * `processingRows` powers the zero-delta fast path: a quiet round can
    * only reference the previous snapshot when no PROCESSING row could be
    * timeout-requeued. */
  def commit(n: Long, now: Double, liveRows: Long, archiveDeltaRows: Long,
             archiveTotalRows: Long, resultRows: Long, selected: Long,
             partCounts: Seq[(String, Long)], processingRows: Long = 0L): Unit = {
    val parts = partCounts.map { case (k, v) => s"""{"part":"$k","rows":$v}""" }
      .mkString("[", ",", "]")
    val json =
      s"""{"round":$n,"now":$now,"live_rows":$liveRows,"archive_delta":$archiveDeltaRows,
         |"archive_total":$archiveTotalRows,"results":$resultRows,"selected":$selected,
         |"processing_rows":$processingRows,
         |"partitions":$parts}""".stripMargin.replace("\n", "")
    val tmp = new Path(s"${roundDir(n)}/_MANIFEST.json.tmp")
    val out = fs.create(tmp, true)
    out.write(json.getBytes("UTF-8")); out.close()
    fs.rename(tmp, manifestPath(n)) // atomic on HDFS / local
  }

  def readManifest(n: Long): Option[String] = {
    val p = manifestPath(n)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes); in.close()
      Some(new String(bytes, "UTF-8"))
    }
  }

  def archiveTotalOf(n: Long): Long =
    readManifest(n).flatMap { s =>
      """"archive_total":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    }.getOrElse(0L)

  /** Committed live-row count of round n (from the manifest — no job). */
  def liveRowsOf(n: Long): Option[Long] =
    readManifest(n).flatMap { s =>
      """"live_rows":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    }

  /** PROCESSING-status rows committed at round n (absent in old manifests →
    * conservative MaxValue: the fast path stays off). */
  def processingRowsOf(n: Long): Long =
    readManifest(n).flatMap { s =>
      """"processing_rows":(\d+)""".r.findFirstMatchIn(s).map(_.group(1).toLong)
    }.getOrElse(Long.MaxValue)

  /** Drop everything after round n (used by resume after a torn run, and by
    * the kill/resume test). */
  def truncateAfter(n: Long): Unit = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) return
    def dropRounds(base: String): Unit = {
      val p = new Path(base)
      if (fs.exists(p)) fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("round=") && name.stripPrefix("round=").toLong > n)
          fs.delete(st.getPath, true)
      }
    }
    dropRounds(root); dropRounds(s"$root/archive")
    dropRounds(s"$root/results"); dropRounds(s"$root/metrics")
    dropRounds(s"$root/control"); dropRounds(s"$root/html")
    // compactions (and their bucket blooms) newer than the resume point are
    // torn state
    val arch = new Path(s"$root/archive")
    if (fs.exists(arch)) fs.listStatus(arch).foreach { st =>
      val name = st.getPath.getName
      val torn =
        (name.startsWith("compact=") && name.stripPrefix("compact=").toLong > n) ||
        (name.startsWith("blooms=") && name.stripPrefix("blooms=").toLong > n)
      if (torn) fs.delete(st.getPath, true)
    }
  }
}
