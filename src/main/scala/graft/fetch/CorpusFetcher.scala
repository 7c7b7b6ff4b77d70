package graft.fetch

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Page, Task}
import graft.process.FetchedPage

/** Fetch abstraction (SURVEY S4): the reference's async curl pool
  * (pyspider-master/pyspider/fetcher/tornado_fetcher.py:240-412) restated as
  * a set-at-a-time lookup-join against the corpus table — the north rule
  * resolves URLs against the Common-Crawl-style corpus, not live HTTP. The
  * trait boundary lets a real partition-local async fetcher slot in later
  * without touching the round pipeline.
  */
trait FetchService extends Serializable {
  /** `hook` lets the caller cache intermediates consumed twice (round-scoped). */
  def fetch(selected: Dataset[Task], hook: FetchService.Hook = identity _)
           (implicit spark: SparkSession): Dataset[(Task, FetchedPage)]
}
object FetchService {
  type Hook = Dataset[(Task, FetchedPage)] => Dataset[(Task, FetchedPage)]
}

/** Corpus-backed fetcher.
  *
  * Join shape AT SCALE: the corpus (10^10 rows) is the big side, the round's
  * selected batch (≤ LOOP_LIMIT per project) the small side — Spark/AQE
  * turn this into a broadcast or shuffled-hash join with the selected batch
  * as build side; with the corpus bucketed by `url` the probe is
  * shuffle-free. Never the other way around.
  *
  * Semantics per row:
  *  - url present in corpus → 200, html decoded via the deterministic
  *    encoding chain (HtmlLite, SURVEY P2/P3);
  *  - conditional fetch (F2, tornado_fetcher.py:296-314): if the task carries
  *    the content hash of its last success and the corpus page is unchanged
  *    → 304 with empty body (the processor then short-circuits, P9);
  *  - url absent → 404-style miss normalized like fetch errors (F6,
  *    tornado_fetcher.py:210-224 — any error becomes a status row, the
  *    pipeline never throws).
  */
class CorpusFetcher(corpus: Dataset[Page]) extends FetchService {

  override def fetch(selected: Dataset[Task], hook: FetchService.Hook = identity _)
                    (implicit spark: SparkSession): Dataset[(Task, FetchedPage)] = {
    import spark.implicits._
    // JOIN SHAPE: an outer join preserving `selected` can only broadcast the
    // corpus (illegal at 10^10 rows), so split it:
    //   1. INNER join with the selected batch broadcast as build side —
    //      the corpus is probed MAP-SIDE, COLUMNAR (plain DF join: no Page
    //      deserialization for non-matching rows — a typed joinWith here
    //      would decode every corpus row every round), never shuffled;
    //   2. misses = selected ANTI-JOIN hit keys (both sides tiny) →
    //      normalized 599 rows (F6, tornado_fetcher.py:210-224).
    // At 10^10 rows the same contract is met by bucketing the corpus on url
    // and pruning buckets to the selected batch's bucket set.
    val selDF = selected.toDF()
      .select(struct(col("*")).as("_1"), col("url").as("__sel_url"))
    val matched = corpus.toDF()
      .join(broadcast(selDF), col("url") === col("__sel_url"), "inner")
      .select(col("_1"), col("warc_ts").as("_2"), col("html").as("_3"))
      .as[(Task, java.sql.Timestamp, Array[Byte])]
    val hits = hook(matched.map { case (t, ts, html) =>
      val hash = graft.url.UrlCanon.md5Hex(
        java.util.Base64.getEncoder.encodeToString(html))
      if (t.fetch.etag != null && t.fetch.etag == hash) {
        (t, FetchedPage(t.url, 304, Array.emptyByteArray, null, "", hash,
          ts.getTime, null))
      } else {
        val (text, enc) = graft.process.HtmlLite.decodeAuto(html)
        (t, FetchedPage(t.url, 200, html, enc, text, hash, ts.getTime, null))
      }
    })
    val hitKeys = hits.select(col("_1.taskid").as("taskid"))
    val misses = selected
      .join(broadcast(hitKeys), Seq("taskid"), "left_anti").as[Task]
      .map { t =>
        (t, FetchedPage(t.url, statusCode = 599, html = Array.emptyByteArray,
          encoding = null, text = "", contentHash = null, warcTs = 0L,
          error = "HTTP 599: corpus miss"))
      }
    hits.union(misses)
  }
}
