package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.corpus.CorpusGen
import graft.engine.{CrawlEngine, EngineConfig}
import graft.model.{Page, ProjectConfig}

/** End-to-end engine oracle: the WHOLE crawl loop (seed → dedup → select →
  * fetch → parse → follow → merge → checkpoint, SURVEY §3.1) run over a
  * corpus derived deterministically from `documents`, checked against a
  * DuckDB recursive-CTE BFS over the same link graph. If any operator in the
  * loop (dedup, depth accounting, link extraction, url canonicalization,
  * merge) is wrong, the seen-set or the depths diverge. */
object CrawlQueries {

  val H = 7 // hosts

  /** page (h, k): h = doc_id % H, k = rank of doc_id within h.
    * Links: ternary tree k → 3k+1, 3k+2, 3k+3 (within host size). */
  def corpusFromDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy(col("hh")).orderBy(col("doc_id"))
    val pages = Q.table(s, dir, "documents")
      .withColumn("hh", (col("doc_id") % H).cast("int"))
      .withColumn("k", (row_number().over(w) - 1).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("hh")).cast("long"))
      .select(col("hh"), col("k"), col("n"), col("text"))
    pages.map { r =>
      val h = r.getAs[Int]("hh"); val k = r.getAs[Long]("k"); val n = r.getAs[Long]("n")
      val links = (1L to 3L).map(j => 3 * k + j).filter(_ < n).map(c => urlOf(h, c))
      val text = "Page " + k + "\n" + r.getAs[String]("text")
      Page(urlOf(h, k), new Timestamp(CorpusGen.Epoch),
        CorpusGen.renderHtml(text, links, "utf-8"), text, "en")
    }.toDF()
  }

  def urlOf(h: Int, k: Long): String =
    if (k == 0L) s"http://site$h.example/"
    else s"http://site$h.example/p/$k"

  def run(s: SparkSession, dir: String): DataFrame = {
    implicit val spark: SparkSession = s
    import s.implicits._
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_crawl_oracle").toString
    val corpus = corpusFromDocs(s, dir).as[Page]
    val cfg = EngineConfig(
      project = ProjectConfig("oracle",
        rate = 1e9, burst = 1e9, hostRate = 1e9, hostBurst = 1e9,
        loopLimit = Int.MaxValue / 2, depthLimit = -1),
      seedCallback = "bfs_page",
      roundDt = 30.0,
      checkpointDir = ckpt,
      useBloom = true)
    val engine = new CrawlEngine(corpus, cfg)
    engine.crawl((0 until H).map(h => urlOf(h, 0L)), maxRounds = 40)
    engine.seenUrls().select(col("url"), col("depth").cast("long").as("depth"))
  }

  val oracleSql: String =
    s"""WITH RECURSIVE pages AS (
       |  SELECT doc_id, CAST(doc_id % $H AS INTEGER) AS h,
       |         CAST(row_number() OVER (PARTITION BY doc_id % $H ORDER BY doc_id) - 1 AS BIGINT) AS k
       |  FROM documents),
       | sizes AS (SELECT h, COUNT(*) AS n FROM pages GROUP BY h),
       | reach AS (
       |  SELECT h, CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS depth FROM sizes
       |  UNION ALL
       |  SELECT r.h, 3 * r.k + j.j AS k, r.depth + 1 AS depth
       |  FROM reach r
       |  JOIN sizes s ON s.h = r.h
       |  CROSS JOIN (SELECT CAST(unnest(generate_series(1, 3)) AS BIGINT) AS j) j
       |  WHERE 3 * r.k + j.j < s.n)
       | SELECT CASE WHEN k = 0
       |   THEN 'http://site' || CAST(h AS VARCHAR) || '.example/'
       |   ELSE 'http://site' || CAST(h AS VARCHAR) || '.example/p/' || CAST(k AS VARCHAR)
       |   END AS url, MIN(depth) AS depth
       | FROM reach GROUP BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("crawl_bfs_seen", oracleSql)(run))
}
