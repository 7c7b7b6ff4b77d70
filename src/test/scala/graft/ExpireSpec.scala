package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.engine.{CrawlEngine, EngineConfig}
import graft.frontier.SeenSet
import graft.model.ProjectConfig

/** Snapshot-expiration laws (Iceberg expire_snapshots analog,
  * `SnapshotStore.expireSnapshots`). The contract: expiry is pure physical
  * maintenance — it may never change what a reader of the HEAD sees, must
  * actually delete superseded state, and the expired checkpoint must still
  * resume. Laws:
  *  1. head parity: a crawl with expiry at compaction cadence produces
  *     exactly the live set + archive latest-per-key of a no-expiry twin;
  *  2. it deletes: the expired store has fewer files, early rounds' heavy
  *     state dirs are gone, and archive deltas at or below the latest
  *     compaction are gone;
  *  3. resume over an expired checkpoint works and the metrics log stays
  *     gapless (expiry keeps every round's commit marker + metrics);
  *  4. idempotence: a second expire deletes nothing further and the head
  *     live set is unchanged.
  */
class ExpireSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark

  private val N = 300L; private val H = 4
  private lazy val corpus = CorpusGen.generate(spark, N, H).cache()

  private def engine(ckpt: String, expireKeepLast: Int): CrawlEngine =
    new CrawlEngine(corpus, EngineConfig(
      project = ProjectConfig("test", rate = 1e9, burst = 1e9,
        hostRate = 2.0, hostBurst = 8.0, // politeness-bounded: many rounds
        loopLimit = Int.MaxValue / 2, depthLimit = -1),
      seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt,
      cowMinLive = 1L, compactEvery = 4, expireKeepLast = expireKeepLast))

  private def liveSet(e: CrawlEngine): Set[(String, Int)] = {
    val n = e.store.lastCommitted().get
    e.store.readLive(n).collect().map(t => t.taskid -> t.status).toSet
  }

  private def fileCount(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      else 1L
    walk(new java.io.File(dir))
  }

  test("expiry: head parity, real deletion, gapless resume, idempotence") {
    val ckptA = Files.createTempDirectory("graft_exp_on").toString
    val ckptB = Files.createTempDirectory("graft_exp_off").toString
    val eA = engine(ckptA, expireKeepLast = 4)
    val eB = engine(ckptB, expireKeepLast = 0)
    val rounds = 24
    eA.crawl(CorpusGen.seeds(H), maxRounds = rounds)
    eB.crawl(CorpusGen.seeds(H), maxRounds = rounds)

    // 1. head parity — expiry changed nothing a head reader sees
    assert(liveSet(eA) === liveSet(eB))
    val n = eA.store.lastCommitted().get
    assert(n === eB.store.lastCommitted().get)
    val archA = SeenSet.latest(eA.store.readArchive(n))
      .collect().map(t => t.taskid -> t.status).toSet
    val archB = SeenSet.latest(eB.store.readArchive(n))
      .collect().map(t => t.taskid -> t.status).toSet
    assert(archA === archB)

    // 2. it deletes: fewer files than the twin; an early round's heavy state
    // is gone while its commit marker + metrics survive; folded archive
    // deltas are gone
    assert(fileCount(ckptA) < fileCount(ckptB),
      s"expiry deleted nothing: ${fileCount(ckptA)} vs ${fileCount(ckptB)}")
    // tokens are written fresh every round and never referenced across
    // rounds — always expirable (live bucket dirs MAY legitimately survive
    // via unchanged-bucket manifest inheritance, so they are not asserted)
    val earlyGone = (1L to 4L).forall { r =>
      !new java.io.File(s"$ckptA/round=$r/tokens").exists()
    }
    assert(earlyGone, "early rounds' token state survived expiry")
    assert((1L to 4L).forall(r =>
      new java.io.File(s"$ckptA/round=$r/_MANIFEST.json").exists()),
      "expiry must keep commit markers")
    val c = eA.store.compactions().last
    assert((1L to c).forall(r =>
      !new java.io.File(s"$ckptA/archive/round=$r").exists()),
      s"archive deltas <= compaction $c survived expiry")

    // 3. resume over the expired checkpoint: two more rounds run, the
    // metrics log is gapless 1..n+2, and the resumed head equals the
    // no-expiry twin resumed the same way
    val eA2 = engine(ckptA, expireKeepLast = 4)
    val eB2 = engine(ckptB, expireKeepLast = 0)
    val n2 = eA2.initOrResume(CorpusGen.seeds(H))
    assert(n2 === n)
    eA2.runRound(n + 1); eA2.runRound(n + 2)
    eB2.initOrResume(CorpusGen.seeds(H))
    eB2.runRound(n + 1); eB2.runRound(n + 2)
    assert(liveSet(eA2) === liveSet(eB2))
    val mRounds = eA2.metricsDF().select("round").distinct()
      .collect().map(_.getLong(0)).sorted
    assert((1L to (n + 2)).forall(mRounds.contains),
      s"metrics gap after expiry+resume: ${mRounds.mkString(",")}")

    // ADVICE r4 (medium): control packs live at $root/control/round=N
    // (writeControl), NOT under the round dir — the r4 expire deleted the
    // nonexistent round-dir path, silently leaking control dirs O(rounds).
    // Plant packs at early rounds and require expire to remove them.
    val ctl = eA2.store.readLive(eA2.store.lastCommitted().get).limit(1)
    (1L to 4L).foreach(r => eA2.store.writeControl(r, ctl))
    assert((1L to 4L).forall(r =>
      new java.io.File(s"$ckptA/control/round=$r").exists()))

    // 4. idempotence: nothing further to delete, head unchanged
    val before = liveSet(eA2)
    eA2.store.expireSnapshots(keepLast = 4)
    assert((1L to 4L).forall(r =>
      !new java.io.File(s"$ckptA/control/round=$r").exists()),
      "early rounds' control packs survived expiry")
    val second = eA2.store.expireSnapshots(keepLast = 4)
    assert(second === 0L, s"second expire deleted $second paths")
    assert(liveSet(eA2) === before)
  }
}
