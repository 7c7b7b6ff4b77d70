package graft.frontier

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.util.sketch.BloomFilter

import graft.model.Task

/** The URL-seen set over the append-only archive (SURVEY D2/D3, §4).
  *
  * The archive is log-structured: a terminal row is APPENDED per completion,
  * so a taskid re-crawled via age/auto_recrawl may appear in several rounds'
  * deltas. Readers take the latest row per key; compaction can fold the log
  * at any time without changing semantics.
  *
  * Dedup strategy (north rule "distributed bloom/cuckoo seen-filter"):
  * a Bloom filter over archive keys is a PRE-filter only — candidates it
  * rejects are definitely-new and skip the join entirely; possible hits are
  * confirmed by the exact anti/left join (bloom FPR must never corrupt the
  * seen set — SURVEY §7 hard parts). At 10^10 keys the driver-side sketch is
  * replaced by per-bucket blooms co-partitioned with the bucketed archive;
  * the interface stays the same.
  */
object SeenSet {

  /** At most one (latest) archive row per (project, taskid).
    * Aggregation (map-side partial reduce) rather than a window — a window
    * would shuffle every archive row; reduceGroups combines per partition
    * first, so the exchange only carries one row per key per partition. */
  def latest(archive: Dataset[Task])(implicit spark: SparkSession): Dataset[Task] = {
    import spark.implicits._
    archive.groupByKey(t => (t.project, t.taskid))
      .reduceGroups { (a, b) =>
        if (a.updatetime > b.updatetime ||
          (a.updatetime == b.updatetime && a.status >= b.status)) a else b
      }
      .map(_._2)
  }

  /** Build a driver-side bloom over archive taskids when the archive is
    * small enough; None above the cap (callers then join exactly). */
  def bloomOf(archive: Dataset[Task], expected: Long,
              cap: Long = 50_000_000L, fpp: Double = 0.01): Option[BloomFilter] =
    if (expected == 0 || expected > cap) None
    else Some(archive.stat.bloomFilter("taskid", math.max(expected, 1000L), fpp))

  /** Split candidate inserts into (definitelyNew, maybeSeen) using the bloom
    * pre-filter; with no bloom everything is maybeSeen. */
  def splitByBloom(inserts: Dataset[Task], bloom: Option[BloomFilter])
                  (implicit spark: SparkSession): (Dataset[Task], Dataset[Task]) = {
    import spark.implicits._
    bloom match {
      case None => (spark.emptyDataset[Task], inserts)
      case Some(bf) =>
        val bc = spark.sparkContext.broadcast(bf)
        (inserts.filter(t => !bc.value.mightContain(t.taskid)),
          inserts.filter(t => bc.value.mightContain(t.taskid)))
    }
  }
}
