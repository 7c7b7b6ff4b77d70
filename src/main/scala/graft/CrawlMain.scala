package graft

import org.apache.spark.sql.SparkSession

import graft.config.ProjectIni
import graft.engine.{CrawlEngine, EngineConfig, ProjectSpec}
import graft.model.{Page, ProjectConfig}

/** spark-submit entry point (north rule: "the whole pipeline runs via
  * spark-submit ... on a multi-executor cluster"): crawl a Common-Crawl-style
  * corpus table — parquet with columns (url, warc_ts, html, text, lang), the
  * BASELINE input shape — resuming from the checkpoint if one exists.
  *
  * {{{
  * spark-submit --class graft.CrawlMain graft.jar \
  *   --corpus hdfs:///cc/pages --checkpoint hdfs:///crawl/ckpt \
  *   --seeds http://example.com/ --rounds 1000 \
  *   [--projects projects.ini] [--export hdfs:///crawl/results.jsonl]
  * }}}
  *
  * Project scheduling config comes from an INI file in the reference's
  * format (P17, `ProjectIni`) when `--projects` is given; otherwise one
  * default project crawls `--seeds` BFS. All cluster sizing (master,
  * executor count/cores/memory) is spark-submit's — this main only builds
  * the session with the engine's SQL tuning defaults, which any
  * `--conf spark.sql.*` on the submit line overrides. */
object CrawlMain {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  private def readFile(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      new String(bytes, "UTF-8")
    } finally in.close()
  }

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    def req(k: String): String = a.getOrElse(k,
      sys.error(s"missing required --$k (got: ${args.mkString(" ")})"))
    val corpusPath = req("corpus")
    val checkpoint = req("checkpoint")
    val rounds = a.getOrElse("rounds", "1000").toInt

    val spark = SparkSession.builder()
      .appName("graft-crawl")
      .config("spark.sql.session.timeZone", "UTC")
      // the crawl DAG carries explicit measured-count join strategies; AQE
      // re-planning was measured as pure overhead on it (BENCH/BASELINE.md)
      .config("spark.sql.adaptive.enabled",
        a.getOrElse("aqe", "false"))
      // the engine's SQL function library (canonicalize_url, task_id,
      // dot_l, format_date, …) registers in the engine's OWN entry point —
      // not only for spark-submit users passing the extensions conf
      // (VERDICT r5 item 5)
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .getOrCreate()
    implicit val s: SparkSession = spark
    import spark.implicits._

    val projects: Seq[ProjectSpec] = a.get("projects") match {
      case Some(ini) => ProjectIni.parse(readFile(spark, ini))
      case None =>
        val seeds = a.get("seeds").map(_.split(",").toSeq).getOrElse(Nil)
        Seq(ProjectSpec(
          ProjectConfig(a.getOrElse("project", "default")), seeds = seeds))
    }
    require(projects.exists(p => p.seeds.nonEmpty || p.cronEverySec > 0),
      "no project has seeds — nothing to crawl (use --seeds or INI `seeds=`)")

    val corpus = spark.read.parquet(corpusPath).as[Page]
    val engine = new CrawlEngine(corpus, EngineConfig(
      projects = projects,
      roundDt = a.getOrElse("round-dt", "30.0").toDouble,
      checkpointDir = checkpoint,
      liveBuckets = a.getOrElse("live-buckets", "32").toInt,
      compactEvery = a.getOrElse("compact-every", "16").toInt,
      // production default ON: routine table maintenance (Iceberg
      // expire_snapshots analog) — historical readLive(k) time travel is a
      // dev affordance, not part of the crawl contract
      expireKeepLast = a.getOrElse("expire-keep-last", "8").toInt,
      broadcastFetchMax = a.getOrElse("broadcast-max", "200000").toLong,
      // bucketed corpus working table (the 100-TB fetch-join shape) lives
      // beside the checkpoint unless placed explicitly
      corpusDir = a.getOrElse("corpus-dir", s"$checkpoint/corpus_table")))

    val stats = engine.crawl(Nil, maxRounds = rounds)
    stats.foreach { r =>
      println(f"round=${r.round} now=${r.now}%.0f selected=${r.selected} " +
        f"live=${r.newLive} archived=${r.archived} results=${r.results} " +
        f"wall=${r.wallSec}%.1fs")
    }
    a.get("export").foreach { path =>
      engine.exportResults(path, a.getOrElse("export-format", "json"))
      println(s"results exported to $path")
    }
  }
}
