package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Schedule, Status, Task}
import graft.store.SnapshotStore

/** Stateful fuzz of the live-snapshot store: seeded random sequences of
  * round types — full bucketed materializations, COW bucket rewrites,
  * merge-on-read deltas, quiet rounds (manifest carry / live_ref) — driven
  * against an in-memory model map. After EVERY round `readLive(n)` must
  * equal the model exactly (full row content: status, seq, exetime), and
  * `readLivePruned` must equal the model restricted to the probed buckets
  * whenever it reports availability. Any interleaving the engine can commit
  * (MOR round, COW round, materialization at compaction cadence, quiet
  * cron-idle round, resume from any head) is a subsequence of these
  * sequences, so this is the state machine's torture test — the individual
  * MorParitySpec laws each pin ONE interleaving; this pins the space. */
class StoreFuzzSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  private val B = 8
  private val KeySpace = 400

  private def mkTask(id: Int, ver: Int): Task =
    Task(s"t$id", "p", s"http://h/$id",
      if (ver % 5 == 3) Status.Processing else Status.Active,
      s"h${id % 5}", depth = 0,
      schedule = Schedule(exetime = ver * 10.0, priority = id % 7),
      selected_at = ver.toDouble, seq = ver.toLong)

  private def key(t: Task): (String, String) = (t.project, t.taskid)
  private def sig(t: Task): (String, Int, Long, Double) =
    (t.taskid, t.status, t.seq, t.schedule.exetime)

  test("random round sequences: store == model at every round") {
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new Random(seed)
      val ckpt = Files.createTempDirectory(s"graft_fuzz_$seed").toString
      val store = new SnapshotStore(ckpt)
      var model = Map.empty[(String, String), Task]
      var ver = 0

      // bucket of every possible key, via the store's own hash column
      val bucketOf: Map[String, Int] =
        spark.createDataset((0 until KeySpace).map(mkTask(_, 0))).toDF()
          .select(col("taskid"), store.bucketCol(B).as("b"))
          .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

      def writeMat(n: Long): Unit =
        store.writeLiveBucketed(n,
          spark.createDataset(model.values.toSeq).toDF()
            .withColumn("__bucket", store.bucketCol(B)), None, B)

      /** Random upserts (insert-or-modify) + deletes, keys never overlapping
        * (writeLiveDelta's contract: same-round re-admission wins, the
        * caller pre-excludes). */
      def mutate(nUp: Int, nDel: Int): (Seq[Task], Seq[(String, String)]) = {
        ver += 1
        val ups = rnd.shuffle((0 until KeySpace).toList).take(nUp)
          .map(mkTask(_, ver))
        val upKeys = ups.map(key).toSet
        val dels = rnd.shuffle((model.keySet -- upKeys).toList).take(nDel)
        (ups, dels)
      }

      // round 0: initial materialization
      model = (0 until 120).map(mkTask(_, 0)).map(t => key(t) -> t).toMap
      writeMat(0)
      store.commit(0, 0.0, model.size, 0, 0, 0, 0, Seq("live" -> model.size))

      var n = 0L
      var lastManifested = true // does round n carry a bucket manifest?
      for (_ <- 1 to 14) {
        n += 1
        // flip the write distribution per round: manifests then chain plain
        // map-side rounds and hash-partitioned rounds, and every read below
        // must resolve the mixed layouts exactly (readManifestBuckets'
        // per-source-round detection + bucket filters)
        store.liveRepartOverride = Some(rnd.nextBoolean())
        rnd.nextInt(4) match {
          case 0 => // full materialization (the compaction-cadence round)
            val (ups, dels) = mutate(12, 4)
            model = model -- dels ++ ups.map(t => key(t) -> t)
            writeMat(n); lastManifested = true
          case 1 if lastManifested => // COW: rewrite only touched buckets
            val (ups, dels) = mutate(10, 3)
            model = model -- dels ++ ups.map(t => key(t) -> t)
            val touched = (ups.map(_.taskid) ++ dels.map(_._2))
              .map(bucketOf).toSet
            store.writeLiveBucketed(n,
              spark.createDataset(model.values.toSeq
                  .filter(t => touched(bucketOf(t.taskid)))).toDF()
                .withColumn("__bucket", store.bucketCol(B)),
              Some(touched), B)
            lastManifested = true
          case 2 => // merge-on-read delta round
            val (ups, dels) = mutate(8, 3)
            model = model -- dels ++ ups.map(t => key(t) -> t)
            store.writeLiveDelta(n, spark.createDataset(ups).toDF(),
              dels.toDF("project", "taskid"))
            lastManifested = false
          case _ => // quiet round: manifest carry if possible, else live_ref
            if (lastManifested && rnd.nextBoolean()) {
              assert(store.carryLiveManifest(n))
            } else {
              store.writeLiveRef(n, n - 1)
              lastManifested = false
            }
        }

        store.commit(n, 0.0, model.size, 0, 0, 0, 0,
          Seq("live" -> model.size))
        // snapshot expiration fuzz: expiring mid-sequence (tight keepLast)
        // must NEVER change what a reader of the head sees — every layout
        // interleaving the sequence produced so far (manifest inheritance,
        // delta chains over expired neighbors, live_ref hops) resolves
        // identically after the physical deletes
        if (rnd.nextInt(4) == 0) store.expireSnapshots(keepLast = 2)

        val got = store.readLive(n).collect().map(sig).toSet
        val want = model.values.map(sig).toSet
        assert(got === want, s"seed $seed round $n: readLive != model")

        // pruned read parity over a random bucket subset (when the store
        // reports the pruned path available for this head)
        val bks = (0 until B).filter(_ => rnd.nextBoolean()).toSet
        store.readLivePruned(n, bks, B).foreach { pr =>
          val gotP = pr.collect().map(sig).toSet
          val wantP = model.values
            .collect { case t if bks(bucketOf(t.taskid)) => sig(t) }.toSet
          assert(gotP === wantP, s"seed $seed round $n pruned=$bks")
        }
        // wrong bucket count must refuse, never mis-prune
        assert(store.readLivePruned(n, Set(0), B + 3).isEmpty)
      }
    }
  }

  // ADVICE r3: the layout gate's task estimate must never read a plan's
  // UnknownPartitioning(0) as "zero tasks" — AdaptiveSparkPlanExec does not
  // override outputPartitioning and map-only scan pipelines report 0, so the
  // old estimate silently disabled the hash-distributed layout (the 10^4+
  // task safeguard) in every AQE session.
  test("mapSideTaskEstimate positive for AQE roots and map-only scans") {
    val ckpt = Files.createTempDirectory("graft_est").toString
    val store = new SnapshotStore(ckpt)
    val dir = s"$ckpt/t.parquet"
    spark.range(100).toDF("id").write.parquet(dir)
    val scan = spark.read.parquet(dir) // map-only pipeline
    val agg = scan.groupBy(col("id") % 7).count() // AQE root with exchange
    assert(store.mapSideTaskEstimate(scan) > 0L)
    assert(store.mapSideTaskEstimate(agg) > 0L)
  }
}
