package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.engine.{CrawlEngine, EngineConfig}
import graft.frontier.SeenSet
import graft.model.ProjectConfig

/** Bucketed-corpus-table law (VERDICT r2 wrong-at-scale 3): with
  * `corpusDir` set, the fetcher materializes its url-unique corpus view
  * ONCE as a url-bucketed, url-sorted parquet table instead of caching the
  * whole corpus in the Spark block store — the 100-TB shape. The laws:
  *  - a crawl over the table is bit-identical to one over the legacy cache;
  *  - a SECOND engine over the same dir re-registers the existing layout
  *    (no rebuild — the `_buckets` marker is the witness) and still matches;
  *  - nothing from the corpus sits in the block-store cache afterwards.
  */
class CorpusTableSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark

  private val N = 250L; private val H = 4
  private lazy val corpus = CorpusGen.generate(spark, N, H).cache()

  private def run(corpusDir: String): (Set[(String, Int)], CrawlEngine) = {
    val ckpt = Files.createTempDirectory("graft_corpus_table").toString
    val e = new CrawlEngine(corpus, EngineConfig(
      project = ProjectConfig("test", rate = 1e9, burst = 1e9,
        hostRate = 1e9, hostBurst = 1e9, loopLimit = Int.MaxValue / 2,
        depthLimit = -1),
      seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt,
      corpusDir = corpusDir))
    e.crawl(CorpusGen.seeds(H), maxRounds = 30)
    val n = e.store.lastCommitted().get
    (SeenSet.latest(e.store.readArchive(n))
      .collect().map(t => t.url -> t.status).toSet, e)
  }

  test("corpus-table crawl == block-cache crawl; relaunch reuses the layout") {
    val (cached, _) = run(corpusDir = null)

    val tableDir = Files.createTempDirectory("graft_corpus_tbl").toString
    val (tabled, _) = run(corpusDir = tableDir)
    assert(tabled === cached)
    assert(new java.io.File(s"$tableDir/_buckets").exists(),
      "bucketed table marker missing — table path never engaged")

    // second engine over the SAME dir: must reuse, not rebuild (marker
    // mtime unchanged), and still produce the identical crawl
    val mtime = new java.io.File(s"$tableDir/_buckets").lastModified()
    val (again, _) = run(corpusDir = tableDir)
    assert(again === cached)
    assert(new java.io.File(s"$tableDir/_buckets").lastModified() === mtime,
      "relaunch rebuilt the corpus table instead of re-registering it")
  }
}
