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

  test("readLivePruned == readLive restricted to the buckets, across a delta chain") {
    import org.apache.spark.sql.functions.col
    val ckpt = Files.createTempDirectory("graft_mor_pruned").toString
    val store = new graft.store.SnapshotStore(ckpt)
    val B = 16
    def task(i: Int, st: Int = Status.Active) =
      graft.model.Task(s"t$i", "p", s"http://h/$i", st, "h", 0, seq = i.toLong)
    // round 0: materialized bucketed base
    val base = spark.createDataset((0 until 200).map(task(_)))
    store.writeLiveBucketed(0,
      base.toDF().withColumn("__bucket", store.bucketCol(B)), None, B)
    // round 1: delta — 20 modified + 10 new upserts, 15 deletes
    val ups1 = spark.createDataset(
      (0 until 20).map(task(_, Status.Processing)) ++ (200 until 210).map(task(_)))
    val dels1 = spark.createDataset((50 until 65).map(i => ("p", s"t$i")))
      .toDF("project", "taskid")
    store.writeLiveDelta(1, ups1.toDF(), dels1)
    // round 2: quiet (live_ref over the delta head)
    store.writeLiveRef(2, 1)
    // round 3: second delta (base resolves through ref -> delta -> round 0)
    val ups3 = spark.createDataset(
      (10 until 25).map(task(_, Status.Success)) ++ (210 until 215).map(task(_)))
    val dels3 = spark.createDataset((100 until 105).map(i => ("p", s"t$i")))
      .toDF("project", "taskid")
    store.writeLiveDelta(3, ups3.toDF(), dels3)

    val fullDF = store.readLive(3)
    val bmap = fullDF.toDF().select(col("taskid"), store.bucketCol(B).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val full = fullDF.collect().map(t => (t.taskid, t.status, t.seq)).toSet
    for (bks <- Seq(Set(0), Set(3, 7, 11), (0 until 8).toSet)) {
      val pr = store.readLivePruned(3, bks, B)
      assert(pr.isDefined, s"pruned read unavailable for $bks")
      val got = pr.get.collect().map(t => (t.taskid, t.status, t.seq)).toSet
      val want = full.filter { case (tid, _, _) => bks(bmap(tid)) }
      assert(got === want, s"bucket set $bks")
    }
    // ref round resolves through the chain too (bucket map must come from
    // ROUND 2's live — keys deleted later in round 3 still exist here)
    val r2DF = store.readLive(2)
    val bmap2 = r2DF.toDF().select(col("taskid"), store.bucketCol(B).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val pr2 = store.readLivePruned(2, Set(1, 2), B)
    assert(pr2.isDefined)
    assert(pr2.get.collect().map(_.taskid).toSet ===
      r2DF.collect().map(_.taskid).filter(t => Set(1, 2)(bmap2(t))).toSet)
    // bucket-count mismatch refuses (caller falls back to the full read)
    assert(store.readLivePruned(3, Set(0), B + 1).isEmpty)
  }

  test("bucket-pruned MOR merge legs (high B, few keys) == full-scan fallback") {
    def eng(ckpt: String, b: Int, cacheMax: Long) = new CrawlEngine(corpus,
      EngineConfig(
        project = ProjectConfig("test", rate = 1e9, burst = 1e9,
          hostRate = 2.0, hostBurst = 2.0, loopLimit = Int.MaxValue / 2,
          depthLimit = -1),
        seedCallback = "bfs_page", roundDt = 30.0, checkpointDir = ckpt,
        cowMinLive = 1L, morOverlayMax = 1_000_000L, compactEvery = 4,
        liveBuckets = b, liveCacheMaxRows = cacheMax))
    // ~8 selected + ~tens of candidate keys per bounded round: touched <<
    // 128 buckets -> readLivePruned engages from the early rounds on the
    // STREAMED frontier (cacheMax=0, the 10^10-row shape); at B=8 every
    // round falls back to the cached full-scan semi-join. Final states must
    // be identical. 6 rounds cross one compaction (round 4) so the pruned
    // read also runs against a freshly materialized base + new delta chain.
    val eA = eng(Files.createTempDirectory("graft_morp_hiB").toString, 128, 0L)
    val eB = eng(Files.createTempDirectory("graft_morp_loB").toString, 8,
      10_000_000L)
    eA.crawl(CorpusGen.seeds(H), maxRounds = 6)
    eB.crawl(CorpusGen.seeds(H), maxRounds = 6)
    assert(eA.prunedMergeRounds > 0, "pruned merge leg never engaged — vacuous")
    val (liveA, archA, _) = finalState(eA)
    val (liveB, archB, _) = finalState(eB)
    assert(liveA === liveB)
    assert(archA === archB)
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
