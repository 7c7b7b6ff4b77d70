package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.engine.{CrawlEngine, EngineConfig}
import graft.frontier.SeenSet
import graft.model.{ProjectConfig, Status}

/** Merge-on-read live-delta laws (the O(selected)-write round): a bounded
  * round writes only up/del row deltas over the last materialized snapshot
  * and readers overlay them. The laws:
  *  1. a crawl with MOR forced on (delta rounds interleaved with the
  *     compaction-cadence materializations) produces EXACTLY the live set,
  *     archive, and manifest live-row totals of a crawl with MOR off
  *     (always-materialize) — including the arithmetic live total
  *     (prev − touched + upserts) matching a physical count;
  *  2. resume: a fresh engine over a checkpoint whose head round is a DELTA
  *     round reads the overlay correctly and converges to the same BFS
  *     seen-set;
  *  3. quiet rounds interleave with delta rounds (live_ref over a delta
  *     head resolves through the chain).
  */
class MorParitySpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  private val N = 300L; private val H = 4
  private lazy val corpus = CorpusGen.generate(spark, N, H).cache()

  private def engine(ckpt: String, morMax: Long, hostRate: Double = 1e9,
                     compactEvery: Int = 4): CrawlEngine =
    new CrawlEngine(corpus, EngineConfig(
      project = ProjectConfig("test", rate = 1e9, burst = 1e9,
        hostRate = hostRate, hostBurst = hostRate,
        loopLimit = Int.MaxValue / 2, depthLimit = -1),
      seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt,
      cowMinLive = 1L, // frontier always "big enough" — MOR can engage
      morOverlayMax = morMax, compactEvery = compactEvery))

  private def finalState(e: CrawlEngine): (Set[(String, Int)], Set[(String, Int)], Long) = {
    val n = e.store.lastCommitted().get
    val live = e.store.readLive(n).collect().map(t => t.taskid -> t.status).toSet
    val arch = SeenSet.latest(e.store.readArchive(n))
      .collect().map(t => t.url -> t.status).toSet
    (live, arch, n)
  }

  test("MOR crawl == materialized crawl (live set, archive, manifest totals)") {
    // politeness-bounded (hostRate 40/round): multiple delta rounds before
    // quiescence, materialization every 4th round via compactEvery
    val ckptA = Files.createTempDirectory("graft_mor_on").toString
    val ckptB = Files.createTempDirectory("graft_mor_off").toString
    val eA = engine(ckptA, morMax = 1_000_000L, hostRate = 40.0)
    val eB = engine(ckptB, morMax = 0L, hostRate = 40.0)
    eA.crawl(CorpusGen.seeds(H), maxRounds = 40)
    eB.crawl(CorpusGen.seeds(H), maxRounds = 40)

    // the MOR run actually exercised delta rounds (not vacuous)
    val nA = eA.store.lastCommitted().get
    val deltaRounds = (1L to nA).filter(r => eA.store.liveDeltaInfo(r).isDefined)
    assert(deltaRounds.nonEmpty, "no MOR delta round engaged — test is vacuous")

    val (liveA, archA, _) = finalState(eA)
    val (liveB, archB, _) = finalState(eB)
    assert(liveA === liveB)
    assert(archA === archB)

    // manifest live totals (MOR arithmetic prev − touched + upserts) match
    // a physical count at EVERY delta round
    deltaRounds.foreach { r =>
      val manifest = eA.store.liveRowsOf(r).get
      val physical = eA.store.readLive(r).count()
      assert(manifest === physical,
        s"round $r: manifest live_rows $manifest != physical $physical")
    }
  }

  test("resume over a delta-round head converges to the same seen-set") {
    val ckpt = Files.createTempDirectory("graft_mor_resume").toString
    val e1 = engine(ckpt, morMax = 1_000_000L, hostRate = 60.0, compactEvery = 100)
    var n = e1.initOrResume(CorpusGen.seeds(H))
    e1.runRound(n + 1); e1.runRound(n + 2); e1.runRound(n + 3)
    assert(e1.store.liveDeltaInfo(n + 3).isDefined,
      "head round is not a delta round — resume test is vacuous")

    val e2 = engine(ckpt, morMax = 1_000_000L, hostRate = 60.0, compactEvery = 100)
    e2.crawl(CorpusGen.seeds(H), maxRounds = 40)

    val ckptRef = Files.createTempDirectory("graft_mor_resume_ref").toString
    val eRef = engine(ckptRef, morMax = 0L, hostRate = 60.0, compactEvery = 100)
    eRef.crawl(CorpusGen.seeds(H), maxRounds = 40)

    val (liveR, archR, _) = finalState(e2)
    val (liveRef, archRef, _) = finalState(eRef)
    assert(liveR === liveRef)
    assert(archR === archRef)
  }

  test("quiet rounds (live_ref) resolve over a delta head") {
    val ckpt = Files.createTempDirectory("graft_mor_quiet").toString
    // cron-free, finite crawl: after quiescence runRound produces quiet
    // rounds referencing the last delta round
    val e = engine(ckpt, morMax = 1_000_000L, hostRate = 1e9, compactEvery = 100)
    e.crawl(CorpusGen.seeds(H), maxRounds = 30)
    val n = e.store.lastCommitted().get
    val before = e.store.readLive(n).collect().map(_.taskid).toSet
    e.runRound(n + 1) // quiet: nothing selected, live_ref/carry over the head
    val after = e.store.readLive(n + 1).collect().map(_.taskid).toSet
    assert(after === before)
  }
}
