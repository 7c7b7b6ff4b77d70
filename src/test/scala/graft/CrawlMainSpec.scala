package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.model.Page
import graft.store.SnapshotStore

/** The spark-submit entry point end-to-end: corpus parquet in, checkpointed
  * crawl out, INI project config honored, results exported. (In tests the
  * builder's getOrCreate() resolves to the shared local session — on a
  * cluster it resolves to the spark-submit one; the main has no other
  * environment dependency.) */
class CrawlMainSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  private def page(url: String, links: Seq[String]): Page =
    Page(url, new Timestamp(1000L),
      CorpusGen.renderHtml("t\nbody.", links, "utf-8"), "t\nbody.", "en")

  test("crawl from --corpus/--seeds args, resume-safe checkpoint, export") {
    val dir = Files.createTempDirectory("graft_main").toString
    val urls = (0 to 3).map(i => s"http://a.example/p/$i")
    val pages = Seq(page(urls.head, urls.tail)) ++ urls.tail.map(page(_, Nil))
    spark.createDataset(pages).write.parquet(s"$dir/corpus")

    CrawlMain.main(Array(
      "--corpus", s"$dir/corpus",
      "--checkpoint", s"$dir/ckpt",
      "--seeds", urls.head,
      "--rounds", "6",
      "--export", s"$dir/out"))

    val store = new SnapshotStore(s"$dir/ckpt")
    val n = store.lastCommitted().get
    assert(n >= 2)
    // full closure crawled: all 4 urls terminal in the archive
    val seen = frontier.SeenSet.latest(store.readArchive(n))
      .collect().map(_.url).toSet
    assert(urls.forall(seen.contains))
    val exported = spark.read.json(s"$dir/out")
    assert(exported.count() === 4)

    // INI-config path: same corpus via a projects file
    val ini =
      s"""[pini]
         |seeds = ${urls.head}
         |rate = 1e9
         |burst = 1e9
         |""".stripMargin
    Files.write(java.nio.file.Paths.get(s"$dir/projects.ini"),
      ini.getBytes("UTF-8"))
    CrawlMain.main(Array(
      "--corpus", s"$dir/corpus",
      "--checkpoint", s"$dir/ckpt2",
      "--projects", s"$dir/projects.ini",
      "--rounds", "6"))
    val store2 = new SnapshotStore(s"$dir/ckpt2")
    val seen2 = frontier.SeenSet.latest(
        store2.readArchive(store2.lastCommitted().get))
      .collect()
    assert(seen2.forall(_.project == "pini"))
    assert(seen2.map(_.url).toSet.size >= 4)
  }

  test("the engine session registers the SQL function library (VERDICT r5 item 5)") {
    // in a fresh JVM CrawlMain.main's builder creates the session; here the
    // shared test session is the default, so clear it for the duration —
    // main's getOrCreate then builds a NEW session (over the same
    // SparkContext) and the withExtensions call actually applies
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val dir = Files.createTempDirectory("graft_main_ext").toString
      val urls = Seq("http://e.example/p/0", "http://e.example/p/1")
      val pages = Seq(page(urls.head, urls.tail)) ++ urls.tail.map(page(_, Nil))
      spark.createDataset(pages).write.parquet(s"$dir/corpus")
      CrawlMain.main(Array(
        "--corpus", s"$dir/corpus",
        "--checkpoint", s"$dir/ckpt",
        "--seeds", urls.head,
        "--rounds", "2"))
      val engineSession = SparkSession.getDefaultSession
        .getOrElse(fail("CrawlMain left no session"))
      val r = engineSession.sql(
        """SELECT canonicalize_url('HTTP://Ex.ample/a/../b?b=2&a=1') AS u,
          |       task_id('http://ex.ample/b?a=1&b=2') AS t,
          |       dot_l(array(1L, 2L), array(3L, 4L)) AS d""".stripMargin)
        .collect().head
      assert(r.getString(0).startsWith("http://"))
      assert(r.getString(1).length === 32)
      assert(r.getLong(2) === 11L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
