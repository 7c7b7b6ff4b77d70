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
    // GRAFT_MASTER=spark://host:port profiles against an external standalone
    // cluster (the bench protocol's execution model) instead of local[N]
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", s"local[$cores]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_PARTITIONS", cores.toString))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_MASTER").foreach { _ =>
      b.config("spark.executor.cores", "4")
        .config("spark.executor.memory",
          sys.env.getOrElse("GRAFT_EXEC_MEM", "10g"))
      // system-classpath, NOT spark.jars: typed-API lambdas deserialized via
      // the url-classloader hit SerializedLambda ClassCastExceptions
      sys.env.get("GRAFT_JAR").foreach(j =>
        b.config("spark.executor.extraClassPath", j))
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark

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
    val corpus = CorpusGen.generate(spark, nPages, nHosts, 42L, branch).cache()
    corpus.count()
    println(f"corpus generated+cached in ${(System.nanoTime() - t00) / 1e9}%.1fs")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_profile").toString
    val hr = if (hostBudget > 0) hostBudget / 30.0 else 1e9
    val hb = if (hostBudget > 0) hostBudget else 1e9
    val engine = new CrawlEngine(corpus, EngineConfig(
      project = ProjectConfig("prof", rate = 1e9, burst = 1e9,
        hostRate = hr, hostBurst = hb, loopLimit = Int.MaxValue / 2, depthLimit = -1),
      seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt))
    var n = engine.initOrResume(CorpusGen.seeds(nHosts))
    var done = false
    while (!done && n < maxRounds) {
      n += 1
      val (j0, s0, t0, w0) = (jobs.get, stages.get, taskTime.get, System.nanoTime())
      val st = engine.runRound(n)
      val wall = (System.nanoTime() - w0) / 1e9
      println(f"round $n%2d selected=${st.selected}%7d wall=$wall%6.2fs " +
        f"jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d " +
        f"taskTimeMs=${taskTime.get - t0}%7d")
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
