package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.engine.{CrawlEngine, EngineConfig}
import graft.model.ProjectConfig

/** Bench harness (driver contract): times the headline gate queries on
  * SPARK_GRAFT_SF_DIR and runs the BASELINE.md scaling protocol — the same
  * crawl job over the same synthesized frontier at local[8] and local[32],
  * reporting urls/sec at both plus efficiency = (T32/T8)/4.
  * Prints ONE JSON line. */
object Bench {

  private val headline = Seq(
    "q1_agg", "q3_revenue_topk", "w1_running_window", "ev_sessionize",
    "s1_seed_scan", "d2_seen_antijoin", "o6_host_budget", "o1_priority_topk",
    "g1_window_counts", "dedup_simhash", "minhash_signatures",
    "t_fingerprint", "ann_topk_bruteforce")

  private def newSession(cores: Int, forCrawl: Boolean = false): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (forCrawl) {
      // measured on the engine (tools.RoundProfile): the round pipeline's
      // typed plans generate ~MB whole-stage sources that dominate task
      // deserialization, and forced broadcasts of large candidate batches
      // thrash — interpreted eval + AQE-decided joins with a 64 MB
      // threshold are strictly faster for the crawl loop.
      b.config("spark.sql.codegen.wholeStage", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full crawl over `nPages` synthetic pages; returns urls-fetched/sec
    * (the north-rule metric: fetched+deduped URLs per second). */
  private def crawlRun(cores: Int, nPages: Long, nHosts: Int,
                       branch: Int): (Double, Long) = {
    val spark = newSession(cores, forCrawl = true)
    try {
      implicit val s: SparkSession = spark
      val corpus = CorpusGen.generate(spark, nPages, nHosts, 42L, branch).cache()
      corpus.count() // materialize outside the timed section
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft_bench_$cores").toString
      val engine = new CrawlEngine(corpus, EngineConfig(
        project = ProjectConfig("bench", rate = 1e9, burst = 1e9,
          hostRate = 1e9, hostBurst = 1e9, loopLimit = Int.MaxValue / 2,
          depthLimit = -1),
        seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt,
        useBloom = true))
      val t0 = System.nanoTime()
      val stats = engine.crawl(CorpusGen.seeds(nHosts), maxRounds = 60)
      val secs = (System.nanoTime() - t0) / 1e9
      val fetched = stats.map(_.archived).sum
      (fetched / secs, fetched)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // default sized to run inside the sbt-run heap (8g): corpus cache +
    // per-round hit caches; raise via env (BENCH/BASELINE.md used 1M at 24g)
    val benchPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "300000").toLong
    val benchHosts = sys.env.getOrElse("SPARK_GRAFT_BENCH_HOSTS", "64").toInt
    val benchBranch = sys.env.getOrElse("SPARK_GRAFT_BENCH_BRANCH", "16").toInt

    // -- part 1: headline queries on the provided tables ------------------
    val spark = newSession(cpus)
    val qmap = SparkEntry.queries
    val results = headline.flatMap { name =>
      qmap.get(name).map { fn =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    spark.stop()

    // -- part 2: scaling protocol (BASELINE.md): same job, 8 vs 32 cores --
    val (t8rate, _) = crawlRun(8, benchPages, benchHosts, benchBranch)
    val (t32rate, fetched) = crawlRun(32, benchPages, benchHosts, benchBranch)
    val efficiency = (t32rate / t8rate) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""crawl_pages":$fetched,"crawl_urls_per_sec_8c":$t8rate,""" +
      s""""crawl_urls_per_sec_32c":$t32rate,"scaling_efficiency":$efficiency}""")
  }
}
