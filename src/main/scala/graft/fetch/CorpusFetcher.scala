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
  def fetch(selected: Dataset[Task])(implicit spark: SparkSession): Dataset[(Task, FetchedPage)]
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

  override def fetch(selected: Dataset[Task])
                    (implicit spark: SparkSession): Dataset[(Task, FetchedPage)] = {
    import spark.implicits._
    val cond = selected("url") === corpus("url")
    selected.joinWith(corpus, cond, "left_outer").map {
      case (t, null) =>
        (t, FetchedPage(t.url, statusCode = 599, html = Array.emptyByteArray,
          encoding = null, text = "", contentHash = null, warcTs = 0L,
          error = "HTTP 599: corpus miss"))
      case (t, p) =>
        val hash = graft.url.UrlCanon.md5Hex(
          java.util.Base64.getEncoder.encodeToString(p.html))
        if (t.fetch.etag != null && t.fetch.etag == hash) {
          (t, FetchedPage(t.url, 304, Array.emptyByteArray, null, "", hash,
            p.warc_ts.getTime, null))
        } else {
          val (text, enc) = graft.process.HtmlLite.decodeAuto(p.html)
          (t, FetchedPage(t.url, 200, p.html, enc, text, hash,
            p.warc_ts.getTime, null))
        }
    }
  }
}
