package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.CorpusGen

/** Throwaway dev probe: isolate cluster-vs-local / worker-count per-op cost.
  * GRAFT_WORKERS=N runs against a fresh N×4-core multi-JVM cluster. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    def tune(b: SparkSession.Builder) = b
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.buffer.pageSize", "2m")
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_WORKERS") match {
      case Some(w) =>
        ClusterHarness.withCluster(w.toInt, 4, 10,
          s"graft-probe-${w}x4", tune)(run)
      case None =>
        val spark = tune(SparkSession.builder()
          .master(sys.env.getOrElse("GRAFT_MASTER", "local[8]"))).getOrCreate()
        run(spark)
    }
  }

  private def run(spark: SparkSession): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cpu = new java.util.concurrent.atomic.AtomicLong(0L)
    val runt = new java.util.concurrent.atomic.AtomicLong(0L)
    val gc = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = st.stageInfo.taskMetrics
        cpu.addAndGet(m.executorCpuTime / 1000000)
        runt.addAndGet(m.executorRunTime)
        gc.addAndGet(m.jvmGCTime)
      }
    })
    def timed(name: String)(f: => Any): Unit = {
      val (c0, r0, g0) = (cpu.get, runt.get, gc.get)
      val t0 = System.nanoTime(); val r = f
      Thread.sleep(300) // let listener events drain
      println(f"$name%-28s wall=${(System.nanoTime() - t0) / 1e9}%7.2fs " +
        f"cpu=${cpu.get - c0}%7dms run=${runt.get - r0}%7dms gc=${gc.get - g0}%6dms ($r)")
    }
    val corpus = CorpusGen.generate(spark, 200000, 64, 42L, 64)
      .repartition(32, col("url")).cache()
    timed("corpus cache+count")(corpus.count())
    timed("corpus count (cached)")(corpus.count())
    timed("agg strlen (columnar)")(
      corpus.agg(sum(length(col("text")))).head().getLong(0))
    // handler-like typed pass: decode + extract + text stats per page
    timed("process typed map")(
      corpus.map { p =>
        val (raw, _) = graft.process.HtmlLite.decodeAuto(p.html)
        val text = graft.process.HtmlLite.extractText(raw)
        val links = graft.process.HtmlLite.extractLinks(raw, p.url)
        val st = graft.functions.TextStats.analyze(text)
        st.nTokens + links.size
      }.reduce(_ + _))
    timed("process typed map 2")(
      corpus.map { p =>
        val (raw, _) = graft.process.HtmlLite.decodeAuto(p.html)
        graft.process.HtmlLite.extractLinks(raw, p.url).size
      }.reduce(_ + _))
    // follows-like explode: 64 structs per row then aggregate
    timed("explode+agg")(
      corpus.select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").count().count())
    val probe = spark.range(4000)
      .select(concat(lit("http://site0.example/p/"), col("id")).as("__sel_url"))
    timed("bcast join probe")(
      corpus.join(broadcast(probe), col("url") === col("__sel_url")).count())
    timed("shuffle-hash join probe")(
      corpus.join(probe.hint("SHUFFLE_HASH"), col("url") === col("__sel_url")).count())
    timed("shuffle groupBy")(
      corpus.groupBy(substring(col("url"), 1, 18)).count().count())
    timed("write parquet")(corpus.limit(50000).write.mode("overwrite")
      .parquet("/tmp/probe_out"))
    spark.stop()
  }
}
