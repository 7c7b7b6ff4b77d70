package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.engine.{CrawlEngine, EngineConfig}
import graft.model.{ProjectConfig, Schedule, Status, Task}
import graft.store.SnapshotStore

/** Flat-round evidence (VERDICT r2 next-round 1 "Done =" criterion): round
  * wall-time must be ~independent of |live| once the merge/status legs are
  * bucket-pruned. The tool seeds the store with a SYNTHETIC live frontier of
  * size K (bucketed, committed as round 0), then runs politeness-bounded
  * rounds on top and reports the mean round wall — at K and at 10K. A flat
  * engine shows ≤~1.3× round cost for the 10× frontier (the selection scan
  * is the only O(|live|) term left, and it is a narrow columnar scan).
  *
  * Not part of the driver contract — dev evidence for BENCH/BASELINE.md.
  */
object FlatRound {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 16
    val kSmall = if (args.length > 1) args(1).toLong else 1_000_000L
    val mult = if (args.length > 2) args(2).toInt else 10
    val rounds = if (args.length > 3) args(3).toInt else 6
    // fraction of the frontier that is DUE; the rest is a far-future recrawl
    // tail (steady-state shape: most of a 10^10-row frontier is waiting on
    // age/auto_recrawl timers, not due now). With exetime-sorted
    // materialization + the quantized due pre-filter, round cost must track
    // the DUE count, not |live|.
    val dueFrac = if (args.length > 4) args(4).toDouble else 1.0
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-flat-round")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.buffer.pageSize", "2m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: SparkSession = spark
    import spark.implicits._

    // small real corpus: fetch hits are constant-size across both levels —
    // the VARIABLE under test is |live| only
    val corpus = CorpusGen.generate(spark, 20_000L, 16, 42L, 4).cache()
    corpus.count()

    def build(k: Long): (CrawlEngine, String) = {
      val ckpt = java.nio.file.Files
        .createTempDirectory(java.nio.file.Paths.get("/dev/shm"), "graft_flat")
        .toString
      val store = new SnapshotStore(ckpt)
      val B = 32
      // synthetic ACTIVE frontier: K rows over 64 hosts; urls mostly miss
      // the corpus (normalized 599s) — fetch cost is round-bounded either way
      val nDue = math.max(1L, (k * dueFrac).toLong)
      val live = spark.range(k).select(
        md5(concat(lit("u"), col("id"))).as("taskid"),
        lit("flat").as("project"),
        concat(lit("http://site"), pmod(col("id"), lit(64)),
          lit(".example/p"), col("id")).as("url"),
        lit(Status.Active).as("status"),
        concat(lit("site"), pmod(col("id"), lit(64)), lit(".example")).as("host"),
        lit(0).as("depth"), col("id"))
        .withColumn("schedule",
          when(col("id") < nDue, typedLit(Schedule()))
            .otherwise(typedLit(Schedule(exetime = 1e12))))
        .drop("id")
        .withColumn("fetch", typedLit(graft.model.FetchOpts()))
        .withColumn("process", typedLit(graft.model.ProcessOpts(callback = "bfs_page")))
        .withColumn("track", typedLit(graft.model.Track()))
        .withColumn("lastcrawltime", lit(0.0))
        .withColumn("updatetime", lit(0.0))
        .withColumn("selected_at", lit(0.0))
        .withColumn("seq", lit(0L))
      store.writeLiveBucketed(0,
        live.withColumn("__bucket", store.bucketCol(B)), None, B)
      store.writeTokensUnified(0,
        Seq.empty[(String, String, Double)].toDF("kind", "key", "tokens"))
      store.commit(0, 0.0, k, 0, 0, 0, 0, Seq("live" -> k))

      // politeness-bounded rounds: 64 hosts × burst 32 ≈ 2k selected/round
      val engine = new CrawlEngine(corpus, EngineConfig(
        project = ProjectConfig("flat", rate = 1e9, burst = 1e9,
          hostRate = 32.0 / 30.0, hostBurst = 32.0,
          loopLimit = Int.MaxValue / 2, depthLimit = -1),
        seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt,
        cowMinLive = 1000L,
        // measure the 10^10-frontier shape: never block-cache the frontier —
        // rounds run on streamed, pruned columnar scans only
        liveCacheMaxRows = 0L))
      engine.robotsRules.count()
      engine.fetcher match {
        case c: graft.fetch.CorpusFetcher => c.warm()
        case _ =>
      }
      (engine, ckpt)
    }

    // INTERLEAVED measurement: the host is shared and its throughput drifts
    // ±30 % between runs — measuring the two sizes back-to-back confounds
    // |live| with drift (three same-code sequential runs spread 1.0-1.8×).
    // Alternating small/big rounds puts each pair under ~the same host
    // state; the reported ratio is the MEDIAN of per-round-pair ratios.
    val (eSmall, ckptS) = build(kSmall)
    val (eBig, ckptB) = build(kSmall * mult)
    def one(e: CrawlEngine, k: Long, n: Int): Double = {
      val t0 = System.nanoTime()
      val st = e.runRound(n)
      val w = (System.nanoTime() - t0) / 1e9
      println(f"  live=$k%9d round $n%2d selected=${st.selected}%6d wall=$w%6.2fs")
      w
    }
    val pairs = (1 to rounds).map { n =>
      (one(eSmall, kSmall, n), one(eBig, kSmall * mult, n))
    }
    // drop the two warm-up round-pairs (codegen priming, bloom init)
    val steady = pairs.drop(2)
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmRf))
      f.delete()
    }
    rmRf(new java.io.File(ckptS)); rmRf(new java.io.File(ckptB))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.size / 2)
    }
    val wSmall = median(steady.map(_._1))
    val wBig = median(steady.map(_._2))
    val ratio = median(steady.map(p => p._2 / p._1))
    println(f"""{"live_small":$kSmall,"live_big":${kSmall * mult},""" +
      f""""due_frac":$dueFrac%.4f,""" +
      f""""round_sec_small":$wSmall%.3f,"round_sec_big":$wBig%.3f,""" +
      f""""cost_ratio_10x":$ratio%.3f}""")
    spark.stop()
  }
}
