package graft.corpus

import java.nio.charset.Charset
import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Page

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).
  *
  * Shape matches BASELINE.json input_hint exactly:
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`.
  *
  * Properties:
  *  - hosts `site<i>.example`, Zipf-ish sizes with host 0 holding ~30% of all
  *    pages (the hot-domain skew fixture, SURVEY §4);
  *  - page (h, k) links to same-host children `3k+1, 3k+2, 3k+3` (a closed
  *    BFS tree mirroring the reference's `/links/10/k` chain fixture,
  *    pyspider-master/tests/data_test_webpage.py:10-27) plus a deterministic
  *    cross-host link every 7th page;
  *  - every host has `/robots.txt` disallowing `/private/`; every 11th page
  *    lives under `/private/` so robots gating has real targets;
  *  - `html` is rendered from `text` by a fixed closed template grammar so
  *    that `HtmlLite.extractText(html) == text` holds BYTE-WISE (the
  *    north-rule extraction invariant);
  *  - a deterministic subset of hosts is `zh` and encoded GB18030 (with a
  *    `<meta charset>` inside the first 100 bytes) to exercise the
  *    header→meta→fallback encoding chain (SURVEY P2/P3).
  *
  * Generation is index-pure: row i is a pure function of (seed, i), so the
  * corpus can be synthesized lazily at any scale with `spark.range`.
  */
object CorpusGen extends Serializable {

  val Epoch: Long = 1767225600000L // 2026-01-01T00:00:00Z

  // ------------------------------------------------------------------
  // layout: nPages split over nHosts, host 0 hot (~30%)
  // ------------------------------------------------------------------

  final case class Layout(nPages: Long, nHosts: Int, sizes: Array[Long],
                          offsets: Array[Long], branch: Int = 3) extends Serializable {
    /** global index -> (host, k-within-host) */
    def locate(i: Long): (Int, Long) = {
      var lo = 0; var hi = nHosts - 1
      while (lo < hi) { // offsets is ascending; find host with offset <= i < offset+size
        val mid = (lo + hi + 1) >>> 1
        if (offsets(mid) <= i) lo = mid else hi = mid - 1
      }
      (lo, i - offsets(lo))
    }
  }

  def layout(nPages: Long, nHosts: Int, branch: Int = 3): Layout = {
    require(nHosts >= 2 && nPages >= nHosts && branch >= 2)
    val sizes = new Array[Long](nHosts)
    val hot = math.max(1L, (nPages * 3) / 10)
    sizes(0) = hot
    // remaining spread 1/rank (Zipf) over hosts 1..H-1, min 1
    val weights = (1 until nHosts).map(i => 1.0 / i)
    val wsum = weights.sum
    var assigned = hot
    for (i <- 1 until nHosts) {
      val s = math.max(1L, math.round((nPages - hot) * (1.0 / i) / wsum))
      sizes(i) = s; assigned += s
    }
    // fix rounding drift on the tail host
    sizes(nHosts - 1) = math.max(1L, sizes(nHosts - 1) + (nPages - assigned))
    val offsets = new Array[Long](nHosts)
    var acc = 0L
    for (i <- 0 until nHosts) { offsets(i) = acc; acc += sizes(i) }
    Layout(acc, nHosts, sizes, offsets, branch)
  }

  // ------------------------------------------------------------------
  // url scheme (shared with the BFS oracle — keep in exact sync)
  // ------------------------------------------------------------------

  def hostName(h: Int): String = s"site$h.example"

  def urlOf(h: Int, k: Long): String =
    if (k == 0L) s"http://${hostName(h)}/"
    else if (k % 11 == 5) s"http://${hostName(h)}/private/p/$k"
    else s"http://${hostName(h)}/p/$k"

  def robotsUrl(h: Int): String = s"http://${hostName(h)}/robots.txt"

  /** children of page k within host h (same-host B-ary BFS tree). */
  def childK(layout: Layout, h: Int, k: Long): Seq[Long] = {
    val size = layout.sizes(h)
    val b = layout.branch
    (1L to b.toLong).map(j => b * k + j).filter(_ < size)
  }

  /** cross-host link target, if any: every 7th page points at another host's
    * front page (exercises cross-host dedup + host budgets). */
  def crossHost(layout: Layout, h: Int, k: Long): Option[String] =
    if (k % 7 == 3) Some(urlOf(((h + k) % layout.nHosts).toInt, 0L)) else None

  def isZh(h: Int): Boolean = h % 5 == 1

  // ------------------------------------------------------------------
  // text + html rendering (the closed grammar)
  // ------------------------------------------------------------------

  private val WordsEn: Array[String] = Array(
    "spark", "frontier", "crawl", "queue", "token", "bucket", "shard",
    "merge", "robots", "politeness", "depth", "priority", "retry",
    "snapshot", "lineage", "bloom", "filter", "salt", "skew", "window",
    "codegen", "shuffle", "broadcast", "parquet", "iceberg", "catalyst",
    "tungsten", "url&query", "a<b", "c>d", "\"quoted\"", "it's")

  private val WordsZh: Array[String] = Array(
    "爬虫", "调度", "队列", "令牌",
    "深度", "优先", "重试", "快照",
    "数据", "分区", "索引", "广度")

  private def mix(seed: Long, a: Long, b: Long): Long = {
    var x = seed ^ (a * 0x9E3779B97F4A7C15L) ^ (b * 0xC2B2AE3D27D4EB4FL)
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 33
    x *= 0xC4CEB9FE1A85EC53L; x ^= x >>> 33
    x
  }

  def titleOf(h: Int, k: Long): String =
    if (isZh(h)) s"页面 $k @ ${hostName(h)}"
    else s"Page $k of ${hostName(h)}"

  def textOf(seed: Long, h: Int, k: Long): String = {
    val words = if (isZh(h)) WordsZh else WordsEn
    val r = mix(seed, h.toLong, k)
    val nSent = 2 + (math.abs(r) % 4).toInt
    val sb = new StringBuilder
    sb.append(titleOf(h, k)).append('\n')
    var s = 0
    while (s < nSent) {
      val nW = 4 + (math.abs(mix(r, s.toLong, 1)) % 6).toInt
      var w = 0
      while (w < nW) {
        if (w > 0) sb.append(' ')
        sb.append(words((math.abs(mix(r, s.toLong, 7L + w)) % words.length).toInt))
        w += 1
      }
      sb.append('.')
      if (s < nSent - 1) sb.append('\n')
      s += 1
    }
    sb.toString
  }

  def escapeHtml(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  /** The fixed template: `text` is `title \n para1 \n para2 ...`; html carries
    * the title in <h1> and each remaining line in its own <p>. */
  def renderHtml(text: String, links: Seq[String], charset: String): Array[Byte] = {
    val lines = text.split("\n", -1)
    val title = lines.head
    val sb = new StringBuilder(text.length * 2 + 256)
    sb.append("<html><head><meta charset=\"").append(charset).append("\"/>")
    sb.append("<title>").append(escapeHtml(title)).append("</title></head><body>")
    sb.append("<h1>").append(escapeHtml(title)).append("</h1>")
    lines.tail.foreach(p => sb.append("<p>").append(escapeHtml(p)).append("</p>"))
    if (links.nonEmpty) {
      sb.append("<ul>")
      links.foreach { u =>
        sb.append("<li><a href=\"").append(u).append("\">")
          .append(escapeHtml(u.takeRight(12))).append("</a></li>")
      }
      sb.append("</ul>")
    }
    sb.append("</body></html>")
    sb.toString.getBytes(Charset.forName(charset))
  }

  def charsetOf(h: Int): String = if (isZh(h)) "gb18030" else "utf-8"

  def pageOf(seed: Long, lay: Layout, i: Long): Page = {
    val (h, k) = lay.locate(i)
    val links = childK(lay, h, k).map(c => urlOf(h, c)) ++ crossHost(lay, h, k)
    val text = textOf(seed, h, k)
    Page(
      url = urlOf(h, k),
      warc_ts = new Timestamp(Epoch + i * 1000L),
      html = renderHtml(text, links, charsetOf(h)),
      text = text,
      lang = if (isZh(h)) "zh" else "en")
  }

  def robotsPage(h: Int): Page = {
    val body = "User-agent: *\nDisallow: /private/\n"
    Page(robotsUrl(h), new Timestamp(Epoch), body.getBytes("utf-8"), body, "en")
  }

  /** Full corpus: nPages content pages + one robots.txt per host. */
  def generate(spark: SparkSession, nPages: Long, nHosts: Int,
               seed: Long = 42L, branch: Int = 3): Dataset[Page] = {
    import spark.implicits._
    val lay = layout(nPages, nHosts, branch)
    val pages = spark.range(lay.nPages).map(i => pageOf(seed, lay, i))
    val robots = spark.createDataset((0 until nHosts).map(robotsPage))
    pages.union(robots)
  }

  def seeds(nHosts: Int): Seq[String] = (0 until nHosts).map(h => urlOf(h, 0L))
}
