package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.engine.{CrawlEngine, EngineConfig}
import graft.frontier.{Frontier, SeenSet}
import graft.model._
import graft.store.SnapshotStore

/** Bucket-local seen-bloom laws (VERDICT r2 next-round 4): above the
  * driver-bloom cap the seen-set pre-filter becomes per-bucket blooms
  * CO-LOCATED with the archive compaction (SeenSet.BucketBlooms) plus a
  * driver-side delta bloom for post-compaction rounds. The laws:
  *  1. the probe never false-negatives (every archived key lands in
  *     maybeSeen) and candidate ADMISSION through mergeIntoLive is
  *     bit-identical under no-probe / driver-bloom / bucket-bloom;
  *  2. an engine crawl that crosses the cap mid-run (bucket blooms engage
  *     at the compaction cadence) converges to the same seen-set as a
  *     bloom-free run.
  */
class SeenBloomSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  def mkTask(id: String, status: Int = Status.Success, prio: Int = 0): Task =
    Task(taskid = id, project = "p", url = s"http://h0/$id", status = status,
      host = "h0", depth = 0, schedule = Schedule(priority = prio),
      lastcrawltime = 10.0, updatetime = 10.0)

  test("bucket blooms: no false negatives; admission identical to exact/driver paths") {
    val dir = Files.createTempDirectory("graft_bloom_spec").toString
    val store = new SnapshotStore(dir)
    // archive: 200 seen keys, committed + compacted + bucket-bloomed
    val seen = (0 until 200).map(i => mkTask(f"seen$i%03d"))
    store.appendArchive(0, spark.createDataset(seen))
    store.commit(0, 0.0, 0, 200, 200, 0, 0, Seq("archive_delta" -> 200L))
    store.compactArchive(0)
    store.buildArchiveBlooms(0, nBuckets = 8, expectedPerBucket = 10_000L)
    assert(store.latestArchiveBlooms(0) === Some((0L, 8)))

    val archive = store.readArchive(0)
    // candidates: 60 seen rediscoveries + 40 genuinely new
    val cands = spark.createDataset(
      (0 until 60).map(i => mkTask(f"seen$i%03d", status = Status.Active)) ++
      (0 until 40).map(i => mkTask(f"new$i%03d", status = Status.Active)))

    val bucketProbe = SeenSet.BucketBlooms(store.bloomsDir(0), 8, None)
    val (defNew, maybeSeen) = SeenSet.splitByBloom(cands, Some(bucketProbe))
    val defNewIds = defNew.select("taskid").as[String].collect().toSet
    val maybeIds = maybeSeen.select("taskid").as[String].collect().toSet
    // partition of the input, and NO archived key ever lands in defNew
    assert((defNewIds ++ maybeIds) ===
      cands.select("taskid").as[String].collect().toSet)
    assert(defNewIds.intersect(maybeIds).isEmpty)
    assert(defNewIds.forall(_.startsWith("new")),
      "bucket-bloom probe false-negatived an archived key")

    // admission identity across all three probe shapes
    val driverProbe = SeenSet.DriverBloom(
      archive.toDF().stat.bloomFilter("taskid", 10_000L, 0.01))
    val live = spark.emptyDataset[Task]
    val delta = spark.emptyDataset[Task]
    def admit(probe: Option[SeenSet.Probe]): Set[String] =
      Frontier.mergeIntoLive(live, cands, archive, delta, probe,
        now = 20.0, round = 1, depthLimit = -1)
        ._1.select("taskid").as[String].collect().toSet
    val exact = admit(None)
    assert(admit(Some(driverProbe)) === exact)
    assert(admit(Some(bucketProbe)) === exact)
    assert(exact.filter(_.startsWith("new")).size === 40)

    // delta bloom: keys archived AFTER the compaction covered by a second
    // bloom — the combined probe must not false-negative them either
    val deltaKeys = (0 until 20).map(i => mkTask(f"late$i%03d"))
    val deltaBloom = spark.createDataset(deltaKeys).toDF()
      .stat.bloomFilter("taskid", 10_000L, 0.01)
    val lateCands = spark.createDataset(
      (0 until 20).map(i => mkTask(f"late$i%03d", status = Status.Active)))
    val (lateNew, lateMaybe) = SeenSet.splitByBloom(lateCands,
      Some(SeenSet.BucketBlooms(store.bloomsDir(0), 8, Some(deltaBloom))))
    assert(lateNew.count() === 0L)
    assert(lateMaybe.count() === 20L)
  }

  test("engine law: bucket-bloom crawl == bloom-free crawl (same seen-set)") {
    val N = 250L; val H = 4
    val corpus = CorpusGen.generate(spark, N, H).cache()
    def run(useBloom: Boolean, cap: Long): (Set[(String, Int)], CrawlEngine) = {
      val ckpt = Files.createTempDirectory("graft_bloom_engine").toString
      val e = new CrawlEngine(corpus, EngineConfig(
        project = ProjectConfig("test", rate = 1e9, burst = 1e9,
          hostRate = 1e9, hostBurst = 1e9, loopLimit = Int.MaxValue / 2,
          depthLimit = -1),
        seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt,
        useBloom = useBloom, bloomCap = cap, bloomMinRows = 1L,
        bloomExpected = 100_000L, bloomBuckets = 8, compactEvery = 3))
      e.crawl(CorpusGen.seeds(H), maxRounds = 30)
      val n = e.store.lastCommitted().get
      val s = SeenSet.latest(e.store.readArchive(n))
        .collect().map(t => t.url -> t.status).toSet
      (s, e)
    }
    // cap=10: the archive crosses it in round 1 → driver bloom never builds;
    // the round-3 compaction builds bucket blooms and they take over
    val (withBlooms, eb) = run(useBloom = true, cap = 10L)
    val (without, _) = run(useBloom = false, cap = 10L)
    assert(store_has_blooms(eb), "bucket blooms never engaged — test is vacuous")
    assert(withBlooms === without)
    corpus.unpersist()
  }

  private def store_has_blooms(e: CrawlEngine): Boolean =
    e.store.latestArchiveBlooms(Long.MaxValue).isDefined
}
