package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.engine.{CrawlEngine, EngineConfig}
import graft.model.ProjectConfig

/** Dev profiler: runs a few crawl rounds and prints wall time per round and
  * the Spark job count, to locate fixed per-round overhead. Not part of the
  * driver contract. */
object RoundProfile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val nPages = if (args.length > 1) args(1).toLong else 20000L
    val branch = if (args.length > 2) args(2).toInt else 3
    val nHosts = if (args.length > 3) args(3).toInt else 20
    // per-host budget per round (0 = unbounded): a tight budget forces a
    // LONG crawl (many rounds) — the fixture for per-round flatness over
    // ≥20 rounds with archive compaction
    val hostBudget = if (args.length > 4) args(4).toDouble else 0.0
    val maxRounds = if (args.length > 5) args(5).toInt else 25
    def tune(b: SparkSession.Builder): SparkSession.Builder = b
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_PARTITIONS", "32"))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.buffer.pageSize", sys.env.getOrElse("GRAFT_PAGESZ", "2m"))
      .config("spark.io.compression.codec",
        sys.env.getOrElse("GRAFT_CODEC", "lz4"))
      .config("spark.ui.enabled", "false")
    // GRAFT_WORKERS=N spawns a real N×4-core multi-JVM standalone cluster
    // (the bench protocol's execution model); GRAFT_MASTER=spark://...
    // attaches to an external one; default local[cores]
    sys.env.get("GRAFT_WORKERS") match {
      case Some(w) =>
        ClusterHarness.withCluster(w.toInt, coresPerWorker = 4,
          executorMemGb = sys.env.getOrElse("GRAFT_EXEC_MEM_GB", "10").toInt,
          appName = s"graft-profile-${w}x4", tune) { spark =>
          run(spark, cores, nPages, branch, nHosts, hostBudget, maxRounds)
        }
        return
      case None =>
    }
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", s"local[$cores]"))
    sys.env.get("GRAFT_MASTER").foreach { _ =>
      b.config("spark.executor.cores", "4")
        .config("spark.executor.memory",
          sys.env.getOrElse("GRAFT_EXEC_MEM", "10g"))
        .config("spark.executor.extraClassPath", ClusterHarness.classesJar)
    }
    val spark = tune(b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, cores, nPages, branch, nHosts, hostBudget, maxRounds)
  }

  private def run(spark: SparkSession, cores: Int, nPages: Long, branch: Int,
                  nHosts: Int, hostBudget: Double, maxRounds: Int): Unit = {
    implicit val s: SparkSession = spark
    val totalCores = sys.env.get("GRAFT_WORKERS")
      .map(_.toInt * 4).getOrElse(cores)

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobInfo = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val jobDur = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, Long)]())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = Option(j.properties.getProperty("spark.job.description"))
          .orElse(Option(j.properties.getProperty("callSite.short"))).getOrElse("?")
        jobInfo.put(j.jobId, (site, j.time))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobInfo.remove(j.jobId)).foreach { case (site, t0) =>
          jobDur.add((site, j.time - t0))
        }
      }
      override def onStageCompleted(st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = st.stageInfo.taskMetrics
        taskTime.addAndGet(m.executorRunTime)
        jobDur.add((f"STAGE ntasks=${st.stageInfo.numTasks}%4d " +
          f"gc=${m.jvmGCTime}%6d cpu=${m.executorCpuTime / 1000000}%7d " +
          f"deser=${m.executorDeserializeTime}%6d " +
          st.stageInfo.name.take(48),
          m.executorRunTime))
      }
    })

    val t00 = System.nanoTime()
    val corpus = CorpusGen.generate(spark, nPages, nHosts, 42L, branch)
    // same checkpoint medium as the bench protocol (tmpfs by default): the
    // shared virtio disk's noise would otherwise dominate phase comparisons
    val ckptBase = new java.io.File(
      sys.env.getOrElse("GRAFT_CKPT_BASE", "/dev/shm"))
    val ckpt = java.nio.file.Files.createTempDirectory(
      ckptBase.toPath, "graft_profile").toString
    val hr = if (hostBudget > 0) hostBudget / 30.0 else 1e9
    val hb = if (hostBudget > 0) hostBudget else 1e9
    val engine = new CrawlEngine(corpus, EngineConfig(
      project = ProjectConfig("prof", rate = 1e9, burst = 1e9,
        hostRate = hr, hostBurst = hb, loopLimit = Int.MaxValue / 2, depthLimit = -1),
      seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt,
      broadcastFetchMax = // dev A/B knob for the candidate-broadcast gate
        sys.env.getOrElse("GRAFT_BCAST_MAX", "200000").toLong))
    engine.robotsRules.count()
    engine.fetcher match {
      case c: graft.fetch.CorpusFetcher => c.warm()
      case _ =>
    }
    println(f"corpus generated+warmed in ${(System.nanoTime() - t00) / 1e9}%.1fs")
    var n = engine.initOrResume(CorpusGen.seeds(nHosts))
    var done = false
    while (!done && n < maxRounds) {
      n += 1
      val (j0, s0, t0, w0) = (jobs.get, stages.get, taskTime.get, System.nanoTime())
      val st = engine.runRound(n)
      val wall = (System.nanoTime() - w0) / 1e9
      val busyMs = taskTime.get - t0
      // executor utilization: busy task-time over the round's core-seconds —
      // LOW (<30%) means the round is driver-latency-bound, not work-bound
      val util = busyMs / 1000.0 / (wall * totalCores) * 100
      println(f"round $n%2d selected=${st.selected}%7d wall=$wall%6.2fs " +
        f"jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d " +
        f"taskTimeMs=$busyMs%7d util=$util%5.1f%%")
      import scala.jdk.CollectionConverters._
      val byDur = jobDur.asScala.toSeq.sortBy(-_._2)
      byDur.take(8).foreach { case (site, ms) => println(f"    $ms%6dms $site") }
      val grouped = jobDur.asScala.toSeq.groupBy(_._1)
        .map { case (s2, xs) => (s2, xs.size, xs.map(_._2).sum) }.toSeq.sortBy(-_._3)
      grouped.take(8).foreach { case (s2, cnt, tot) =>
        println(f"    total $tot%6dms x$cnt%-3d $s2") }
      jobDur.clear()
      done = st.selected == 0
    }
    spark.stop()
  }
}
