package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.Frontier
import graft.model._

/** Ordering-parity oracle (SURVEY §5 plan item 2; VERDICT r2 next-round 7):
  * an INDEPENDENT, imperative replay of the reference scheduler's
  * heap + token-bucket selection loop
  * (pyspider-master/pyspider/scheduler/task_queue.py:27-111 heap + buckets,
  * scheduler/scheduler.py:390-437 per-loop caps, scheduler/domain.py:14-48
  * host buckets), run driver-side over a small fixture, asserted equal —
  * round by round — to the engine's declarative window/rank selection
  * (Frontier.select) with the token carry (Frontier.consumedTokensUnified).
  *
  * The replay follows the ENGINE'S DOCUMENTED restatement conventions
  * (SURVEY §2 O1/O6/O7), which diverge from the reference loop in two
  * documented ways:
  *  - deterministic GLOBAL total order (eff_priority DESC, exetime ASC,
  *    seq ASC, taskid ASC) instead of Python dict iteration order over
  *    projects (non-deterministic across runs in the reference);
  *  - budget tokens are consumed on ADMISSION (a host-denied row stays due
  *    and pays nothing), where the reference consumes the project token at
  *    heap pop and parks host-denied rows in `_send_buffer`.
  * Everything else replays the reference algorithm literally: a heap pop
  * sequence under the O1 comparator, per-pop budget checks with
  * min(burst, tokens + rate·dt) closed-form refill (token_bucket.py:33-47),
  * the LOOP_LIMIT/10 fairness cap (scheduler.py:419), and the global
  * LOOP_LIMIT cut in pop order.
  */
class OrderingParitySpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  case class SimTask(taskid: String, project: String, host: String,
                     priority: Int, exetime: Double, seq: Long, depth: Int)

  /** The documented total order (Frontier.selectOrder restated on plain
    * Scala tuples; higher eff_priority first). */
  private def ordKey(t: SimTask, depthLimits: Map[String, Int])
      : (Int, Double, Long, String) = {
    val eff =
      if (depthLimits.getOrElse(t.project, -1) != -1) -t.depth else t.priority
    (-eff, t.exetime, t.seq, t.taskid)
  }

  /** One simulated round: returns (selected taskids in pop order, new host
    * tokens, new project tokens). Buckets: absent key = full burst; budget
    * for the round = min(burst, tokens + rate*dt); a key admits its first
    * floor(budget) popped rows; consumption on admission, clamped ≥ 0. */
  private def simRound(pending: Seq[SimTask], now: Double, dt: Double,
                       cfgs: Map[String, ProjectConfig],
                       hostRate: Double, hostBurst: Double,
                       globalLoopLimit: Int,
                       hostTok: Map[String, Double], projTok: Map[String, Double],
                       depthLimits: Map[String, Int])
      : (Seq[String], Map[String, Double], Map[String, Double]) = {
    // O3 time-queue migration: only due rows enter the heap
    val due = pending.filter(_.exetime <= now)
    // heap pop sequence = ascending ordKey (scala PriorityQueue is a max-heap;
    // use sorted ascending — identical pop order, simpler to audit)
    val popped = due.sortBy(t => ordKey(t, depthLimits))(
      Ordering.Tuple4(Ordering.Int, Ordering.Double.TotalOrdering,
        Ordering.Long, Ordering.String))
    def budget(tok: Map[String, Double], key: String, rate: Double,
               burst: Double): Double =
      math.min(burst, tok.getOrElse(key, burst) + rate * dt)
    // per-key pop counters (rank semantics: every popped due row of a key
    // occupies a rank slot whether or not the other key's budget admits it)
    val hostSeen = scala.collection.mutable.Map.empty[String, Long]
    val projSeen = scala.collection.mutable.Map.empty[String, Long]
    val selected = scala.collection.mutable.ArrayBuffer.empty[SimTask]
    for (t <- popped if selected.size < globalLoopLimit) {
      val c = cfgs(t.project)
      val hRank = hostSeen.updateWith(t.host)(v => Some(v.getOrElse(0L) + 1)).get
      val pRank = projSeen.updateWith(t.project)(v => Some(v.getOrElse(0L) + 1)).get
      val hB = math.floor(budget(hostTok, t.host, hostRate, hostBurst))
      val pB = math.min(
        math.floor(budget(projTok, t.project, c.rate, c.burst)),
        math.max(1L, c.loopLimit / 10).toDouble)
      if (hRank <= hB && pRank <= pB) selected += t
    }
    // token consumption (closed form, admission-only), clamped to [0, burst]
    def consume(tok: Map[String, Double], keyOf: SimTask => String,
                rate: Double, burstOf: String => Double): Map[String, Double] = {
      val consumed = selected.groupBy(keyOf).view.mapValues(_.size.toDouble)
      val keys = tok.keySet ++ consumed.keys
      keys.map { k =>
        val burst = burstOf(k)
        k -> math.min(burst, math.max(0.0,
          tok.getOrElse(k, burst) + rate * dt - consumed.getOrElse(k, 0.0)))
      }.toMap
    }
    val hostTok2 = consume(hostTok, _.host, hostRate, _ => hostBurst)
    // project buckets use each project's own rate/burst
    val projTok2 = {
      val consumed = selected.groupBy(_.project).view.mapValues(_.size.toDouble)
      val keys = projTok.keySet ++ consumed.keys
      keys.map { k =>
        val c = cfgs(k)
        k -> math.min(c.burst, math.max(0.0,
          projTok.getOrElse(k, c.burst) + c.rate * dt - consumed.getOrElse(k, 0.0)))
      }.toMap
    }
    (selected.map(_.taskid).toSeq, hostTok2, projTok2)
  }

  private def toTask(s: SimTask): Task =
    Task(taskid = s.taskid, project = s.project,
      url = s"http://${s.host}/${s.taskid}", status = Status.Active,
      host = s.host, depth = s.depth,
      schedule = Schedule(priority = s.priority, exetime = s.exetime),
      seq = s.seq)

  /** Drive BOTH implementations over `rounds` rounds (selected rows leave
    * the frontier — simulating completion — so later rounds see the carry
    * semantics) and assert the per-round selected sets match. The engine's
    * per-host/per-project top-k IS its order statement: with budget B the
    * admitted set is exactly the first B popped rows, so set equality per
    * round proves rank-order parity. */
  private def runParity(tasks: Seq[SimTask], cfgs: Seq[ProjectConfig],
                        hostRate: Double, hostBurst: Double,
                        globalLoopLimit: Int, rounds: Int, dt: Double): Unit = {
    val cfgMap = cfgs.map(c => c.name -> c).toMap
    val depthLimits = cfgs.filter(_.depthLimit != -1)
      .map(c => c.name -> c.depthLimit).toMap
    var simPending = tasks
    var simHost = Map.empty[String, Double]
    var simProj = Map.empty[String, Double]
    var engPending = tasks
    // the engine's unified carry table starts empty (absent key = burst) and
    // flows through consumedTokensUnified each round — including the SPARSE
    // carry (rows at full burst dropped), which this oracle exercises
    var engTokens: DataFrame =
      Seq.empty[(String, String, Double)].toDF("kind", "key", "tokens")
    for (r <- 1 to rounds) {
      val now = r * dt
      val (simSel, h2, p2) = simRound(simPending, now, dt, cfgMap,
        hostRate, hostBurst, globalLoopLimit, simHost, simProj, depthLimits)
      simPending = simPending.filterNot(t => simSel.contains(t.taskid))
      simHost = h2; simProj = p2

      val live = spark.createDataset(engPending.map(toTask))
      val due = Frontier.due(live, now)
      val hostTok = engTokens.filter(col("kind") === "host")
        .select(col("key").as("host"), col("tokens"))
      val projTok = engTokens.filter(col("kind") === "proj")
        .select(col("key").as("project"), col("tokens"))
      val selDF = Frontier.select(due.toDF(), cfgs,
        hostRate, hostBurst, globalLoopLimit, dt, hostTok, projTok)
      val engSel = selDF.select("taskid").as[String].collect().toSet
      assert(engSel === simSel.toSet,
        s"round $r: engine selection diverged from the heap+bucket replay")
      engTokens = Frontier.consumedTokensUnified(selDF, engTokens,
        hostRate, hostBurst,
        cfgs.map(c => c.name -> (c.rate: Any)).toMap,
        cfgs.map(c => c.name -> (c.burst: Any)).toMap,
        cfgs.head.rate, cfgs.head.burst, dt)
        .cache()
      engTokens.count()
      engPending = engPending.filterNot(t => engSel.contains(t.taskid))
    }
  }

  private val rnd = new scala.util.Random(42)
  private def mkTasks(n: Int, hosts: Int, projects: Seq[String]): Seq[SimTask] =
    (0 until n).map { i =>
      SimTask(f"t$i%04d", projects(rnd.nextInt(projects.size)),
        s"h${rnd.nextInt(hosts)}", priority = rnd.nextInt(5),
        exetime = if (rnd.nextInt(4) == 0) (rnd.nextInt(6) + 1) * 10.0 else 0.0,
        seq = rnd.nextInt(3).toLong, depth = rnd.nextInt(6))
    }

  test("parity 1: single project, tight host budgets, carry over rounds") {
    val cfg = ProjectConfig("p", rate = 1e9, burst = 1e9,
      hostRate = 1.0, hostBurst = 3.0, loopLimit = Int.MaxValue / 2)
    runParity(mkTasks(120, hosts = 5, Seq("p")), Seq(cfg),
      hostRate = 1.0, hostBurst = 3.0, globalLoopLimit = Int.MaxValue / 2,
      rounds = 5, dt = 1.0)
  }

  test("parity 2: multi-project rates + fairness caps, shared hosts") {
    val cfgs = Seq(
      ProjectConfig("pa", rate = 2.0, burst = 4.0, loopLimit = 40),
      ProjectConfig("pb", rate = 5.0, burst = 20.0, loopLimit = 30),
      ProjectConfig("pc", rate = 0.5, burst = 2.0, loopLimit = 1000))
    runParity(mkTasks(150, hosts = 4, Seq("pa", "pb", "pc")), cfgs,
      hostRate = 3.0, hostBurst = 6.0, globalLoopLimit = Int.MaxValue / 2,
      rounds = 6, dt = 1.0)
  }

  test("parity 3: BFS depth-priority project + binding global LOOP_LIMIT") {
    val cfgs = Seq(
      ProjectConfig("bfs", rate = 1e6, burst = 1e6, depthLimit = 8,
        loopLimit = 200),
      ProjectConfig("flat", rate = 1e6, burst = 1e6, loopLimit = 200))
    runParity(mkTasks(200, hosts = 6, Seq("bfs", "flat")), cfgs,
      hostRate = 1e6, hostBurst = 1e6, globalLoopLimit = 25,
      rounds = 4, dt = 1.0)
  }
}
