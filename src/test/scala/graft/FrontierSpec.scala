package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.frontier.{Frontier, StatusPack}
import graft.model._

/** Unit laws for the frontier operators (SURVEY §5 plan item 1):
  * token-bucket closed form, D4 restart truth table, O11 backoff ladder,
  * selection ordering + budgets, candidate merge. */
class FrontierSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  def mkTask(id: String, host: String = "h0", prio: Int = 0, exetime: Double = 0,
             status: Int = Status.Active, depth: Int = 0, seq: Long = 0): Task =
    Task(taskid = id, project = "p", url = s"http://$host/$id", status = status,
      host = host, depth = depth,
      schedule = Schedule(priority = prio, exetime = exetime), seq = seq)

  test("token bucket closed form (FIXTURES §7: rate=100 burst=1000)") {
    // consume 100 of 1000 → 900 + refill 10 (rate*dt=100*0.1), clamped
    val prev = Seq(("h0", 1000.0)).toDF("host", "tokens")
    val selected = spark.range(100).select(lit("h0").as("host"))
    val out = Frontier.consumedTokens(selected, "host", prev, 100.0, 1000.0, 0.1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("h0") === 910.0) // min(1000, 1000 + 10 - 100)
    // unknown host defaults to burst
    val out2 = Frontier.consumedTokens(
      spark.range(30).select(lit("h9").as("host")), "host",
      Seq.empty[(String, Double)].toDF("host", "tokens"), 100.0, 1000.0, 0.1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out2("h9") === 980.0) // min(1000, 1000 + 10 - 30)
  }

  test("selection: documented total order + host budget + project cap") {
    // 10 tasks on one host with priorities 0..9 → budget 3 picks 9,8,7
    val tasks = (0 until 10).map(i => mkTask(f"t$i%02d", prio = i))
    val due = spark.createDataset(tasks).toDF()
    val cfg = ProjectConfig("p", rate = 1e9, burst = 1e9,
      hostRate = 0.1, hostBurst = 3.0, loopLimit = 1000)
    val empty = Seq.empty[(String, Double)].toDF("host", "tokens")
    val emptyP = Seq.empty[(String, Double)].toDF("project", "tokens")
    val sel = Frontier.select(due, cfg, 1.0, empty, emptyP)
      .select("taskid").as[String].collect().sorted
    assert(sel === Array("t07", "t08", "t09"))
  }

  test("selection: exetime earlier wins within equal priority; seq then taskid") {
    val tasks = Seq(
      mkTask("a", prio = 1, exetime = 5),
      mkTask("b", prio = 1, exetime = 2),
      mkTask("c", prio = 0, exetime = 0),
      mkTask("d", prio = 1, exetime = 2, seq = 1))
    val cfg = ProjectConfig("p", rate = 1e9, burst = 1e9,
      hostRate = 0.1, hostBurst = 2.0, loopLimit = 1000)
    val empty = Seq.empty[(String, Double)].toDF("host", "tokens")
    val emptyP = Seq.empty[(String, Double)].toDF("project", "tokens")
    val sel = Frontier.select(spark.createDataset(tasks).toDF(), cfg, 1.0, empty, emptyP)
      .select("taskid").as[String].collect().toSet
    assert(sel === Set("b", "d")) // prio 1, exetime 2; 'b' (seq 0) and 'd'
  }

  test("D5/D6 candidate merge: max priority, min exetime, OR force_update") {
    val cands = Seq(
      mkTask("x", prio = 1, exetime = 100, depth = 3),
      mkTask("x", prio = 5, exetime = 50, depth = 2),
      mkTask("x", prio = 2, exetime = 200, depth = 4)
        .copy(schedule = Schedule(priority = 2, exetime = 200, force_update = true)))
    val merged = Frontier.mergeCandidates(spark.createDataset(cands)).collect()
    assert(merged.length === 1)
    val m = merged.head
    assert(m.schedule.priority === 5)
    assert(m.schedule.exetime === 50.0)
    assert(m.schedule.force_update === true)
    assert(m.depth === 2)
  }

  test("D3/D4 merge into live: insert / ignore-seen / restart-on-age / force") {
    val now = 1000.0
    val live = spark.createDataset(Seq(mkTask("pending")))
    // archive: one fresh success (no age), one expired-age success, one itag match
    val archived = Seq(
      mkTask("fresh", status = Status.Success).copy(lastcrawltime = 990,
        schedule = Schedule(age = 100)),
      mkTask("expired", status = Status.Success).copy(lastcrawltime = 100,
        schedule = Schedule(age = 60), depth = 5),
      mkTask("retagged", status = Status.Success).copy(lastcrawltime = 990,
        schedule = Schedule(age = -1, itag = "v1")))
    val archive = spark.createDataset(archived)
    val cands = spark.createDataset(Seq(
      mkTask("pending", prio = 9),                       // D2: pending wins, no force
      mkTask("brandnew", depth = 2),                     // insert
      mkTask("fresh"),                                   // seen + age not expired → drop
      mkTask("expired", depth = 9),                      // age expired → restart, depth min(5,9)
      mkTask("retagged").copy(schedule = Schedule(itag = "v2")))) // itag change → restart
    val out = Frontier.mergeIntoLive(live, cands, archive,
        spark.emptyDataset[Task], bloom = None,
        now, round = 7, depthLimit = -1)
      ._1.collect().map(t => t.taskid -> t).toMap
    assert(out.keySet === Set("pending", "brandnew", "expired", "retagged"))
    assert(out("pending").schedule.priority === 0) // old pending row kept
    assert(out("brandnew").seq === 7 && out("brandnew").status === Status.Active)
    assert(out("expired").depth === 5 && out("expired").status === Status.Active)
    assert(out("retagged").schedule.itag === "v2")
  }

  test("O11/O12/O13 status application: backoff ladder then FAILED; auto_recrawl") {
    val now = 5000.0
    def pack(id: String, ok: Boolean) = StatusPack(id, "p", fetchOk = ok,
      statusCode = if (ok) 200 else 599, fetchTime = 0, encoding = null,
      contentHash = null, fetchError = null, processOk = ok, processTime = 0,
      follows = 0, exception = null)
    val live = spark.createDataset(Seq(
      mkTask("ok", status = Status.Processing),
      mkTask("fail0", status = Status.Processing), // retried 0 → retry, +30s
      mkTask("fail3", status = Status.Processing)
        .copy(schedule = Schedule(retried = 3)),   // retried 3 → exhausted → FAILED
      mkTask("recrawl", status = Status.Processing)
        .copy(schedule = Schedule(age = 100, auto_recrawl = true)),
      mkTask("untouched")))
    val packs = spark.createDataset(Seq(
      pack("ok", ok = true), pack("fail0", ok = false), pack("fail3", ok = false),
      pack("recrawl", ok = true)))
    val (newLive, archived) = Frontier.applyStatus(live, packs, now)
    val liveMap = newLive.collect().map(t => t.taskid -> t).toMap
    val archMap = archived.collect().map(t => t.taskid -> t).toMap
    assert(archMap("ok").status === Status.Success)
    assert(archMap("fail3").status === Status.Failed)
    assert(liveMap("fail0").schedule.retried === 1)
    assert(liveMap("fail0").schedule.exetime === now + 30.0) // ladder step 1
    assert(liveMap("recrawl").status === Status.Active)
    assert(liveMap("recrawl").schedule.exetime === now + 100.0) // re-armed by age
    assert(liveMap("untouched").status === Status.Active)
    assert(!archMap.contains("recrawl"))
  }

  test("O4 processing-timeout reactivation") {
    val live = spark.createDataset(Seq(
      mkTask("young", status = Status.Processing).copy(selected_at = 950),
      mkTask("stale", status = Status.Processing).copy(selected_at = 100)))
    val out = Frontier.reactivateTimeouts(live, now = 1000, timeout = 600)
      .collect().map(t => t.taskid -> t.status).toMap
    assert(out("young") === Status.Processing)
    assert(out("stale") === Status.Active)
  }

  test("retry ladder values match scheduler.py DEFAULT_RETRY_DELAY") {
    assert(Retry.delayFor(1) === 30.0)
    assert(Retry.delayFor(2) === 3600.0)
    assert(Retry.delayFor(3) === 6 * 3600.0)
    assert(Retry.delayFor(4) === 12 * 3600.0)
    assert(Retry.delayFor(5) === 24 * 3600.0)
  }

  test("property: candidate merge is permutation-invariant; staged merge " +
      "preserves the merged fields (scalacheck)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // batches drawn from a SMALL key/priority pool so key collisions and
    // priority TIES are common — the regime where a run-order-dependent
    // tie-break (the r1 bug class) or a staged-merge drift would show
    val genTask = for {
      id <- Gen.oneOf("a", "b", "c", "d")
      prio <- Gen.choose(0, 2)
      exe <- Gen.choose(0, 3).map(_.toDouble)
      depth <- Gen.choose(0, 3)
      fu <- Gen.oneOf(true, false)
      host <- Gen.oneOf("h0", "h1")
      seq <- Gen.choose(0L, 2L)
    } yield mkTask(id, host = host, prio = prio, exetime = exe,
      depth = depth, seq = seq)
      .copy(schedule = Schedule(priority = prio, exetime = exe,
        force_update = fu))
    val genBatch = Gen.listOfN(12, genTask)

    def sigAll(ts: Seq[Task]) = ts.map(t => (t.taskid, t)).sortBy(_._1)
    def sigMerged(ts: Seq[Task]) = ts.map(t => (t.taskid,
      t.schedule.priority, t.schedule.exetime, t.schedule.force_update,
      t.depth)).sortBy(_._1)

    val prop = Prop.forAll(genBatch, Gen.choose(0, 11)) { (batch, cut) =>
      val merged = Frontier.mergeCandidates(batch.toDS()).collect().toSeq
      // 1. permutation invariance: FULL-row equality whatever the input
      // order (the documented deterministic total order)
      val shuffled = Frontier.mergeCandidates(
        batch.reverse.toDS()).collect().toSeq
      // 2. staged merge (the production shape: follows collapsed first,
      // then merged with cron/control legs) preserves the D5/D6 merged
      // fields exactly
      val (a, b) = batch.splitAt(cut)
      val staged = Frontier.mergeCandidates(
        (Frontier.mergeCandidates(a.toDS()).collect().toSeq ++ b).toDS())
        .collect().toSeq
      sigAll(shuffled) == sigAll(merged) &&
        sigMerged(staged) == sigMerged(merged)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
