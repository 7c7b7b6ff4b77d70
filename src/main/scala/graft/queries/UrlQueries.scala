package graft.queries

import org.apache.spark.sql.functions._

import graft.process.HtmlLite
import graft.url.UrlCanon
import Q.{frontier, table, FRONTIER_SQL}

/** UDF result rows for UrlQueries. TOP-LEVEL on purpose: nested inside the
  * object, janino could not resolve their accessors in the encoder's
  * generated code ("no applicable method ... UrlQueries$CurlOut.gz()") and
  * every struct projection fell back to interpreted eval. */
private[queries] case class CurlOut(purl: String, method: String, data: String,
    hdr: String, gz: Boolean)
private[queries] case class JsonOut(id: Long, name: String, item0: String,
    n_items: Int)

/** SURVEY §2.7 expression library + §2.5 parse/extract operators as gate
  * queries. The Spark side runs the REAL engine functions (UrlCanon /
  * HtmlLite as UDFs); the DuckDB oracle reconstructs the expected output
  * with plain string surgery over inputs crafted so the expectation is
  * SQL-expressible (FIXTURES.md §6 vectors). */
object UrlQueries {

  /** E11 — run the REAL CurlParse on a synthesized `curl` line; flattened
    * for the oracle (headers rendered "k=v" sorted, ';'-joined). `method`
    * goes through fetchOpts so the data-implies-POST default is gated too. */
  private val curlUdf = udf((line: String) => {
    val a = graft.url.CurlParse.toArguments(line)
    CurlOut(a.urls.head, a.fetchOpts.method, a.data.orNull,
      a.headers.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
        .mkString(";"),
      a.useGzip)
  })

  /** P5 — the REAL FetchedPage.json accessor (Response.json analog). */
  private val pageJsonUdf = udf((body: String) => {
    val p = graft.process.FetchedPage("http://x", 200, Array.emptyByteArray,
      "utf-8", body, "", 0L, null)
    val j = p.json
    JsonOut(j.path("id").asLong(), j.path("name").asText(),
      j.path("items").get(0).path("url").asText(), j.path("items").size())
  })

  // r5: the scalar URL kernels run NATIVE (StringKernels — the same
  // codegen'd expressions GraftExtensions registers for SQL); the gates
  // below therefore exercise the production expression path, not a
  // boxed-String UDF wrapper.
  private val canonUdf = org.apache.spark.sql.graft.StringKernels.canonicalizeUrl _
  private val mainDomainUdf = org.apache.spark.sql.graft.StringKernels.mainDomain _
  private val addSchemeUdf = org.apache.spark.sql.graft.StringKernels.addHttpIfNoScheme _
  private val hasExtUdf = udf((s: String) =>
    UrlCanon.urlHasAnyExtension(s, Set(".jpg", ".pdf", ".zip")))
  private val linksUdf = udf((html: String, base: String) =>
    HtmlLite.extractLinks(html, base))
  private val titleUdf = udf((html: String) => HtmlLite.extractTitle(html))
  private val textUdf = udf((html: String) => HtmlLite.extractText(html))
  private val urljoinUdf = udf((base: String, rel: String) => UrlCanon.urljoin(base, rel))

  val all: Seq[Q] = Seq(

    // E1 — md5 taskid parity (libs/utils.py:20); runs the engine's native
    // TaskIdMd5 kernel (raw UTF-8 bytes, no String round-trip) under gate
    Q("e1_md5",
      "SELECT doc_id, md5(text) AS h FROM documents")(
      (s, dir) => table(s, dir, "documents").select(col("doc_id"),
        org.apache.spark.sql.graft.StringKernels.taskId(col("text")).as("h"))),

    // E2/E3 — canonicalization chain (_build_url + quote_chinese,
    // url.py:109-160): fragment dropped, path space %20, %2f protected,
    // query space → '+', blank query values kept, empty path → '/'
    Q("e2_canonicalize",
      s"""$FRONTIER_SQL SELECT doc_id,
         | 'http://site' || CAST(doc_id % 37 AS VARCHAR) ||
         |   '.example/a%20b/p%2Fq?q=a+space&a=1&empty=' AS canon_url,
         | 'http://site' || CAST(doc_id % 37 AS VARCHAR) || '.example/' AS canon_root
         | FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("doc_id"),
        canonUdf(concat(lit("http://site"), (col("doc_id") % 37).cast("string"),
          lit(".example/a b/p%2fq?q=a%20space&a=1&empty=#frag"))).as("canon_url"),
        canonUdf(concat(lit("http://site"), (col("doc_id") % 37).cast("string"),
          lit(".example"))).as("canon_root"))),

    // E4 — registrable main domain (get_domain.py:22-30 fallback spec)
    Q("e4_main_domain",
      s"""$FRONTIER_SQL SELECT doc_id,
         | CASE WHEN doc_id % 2 = 0
         |   THEN 'site' || CAST(doc_id % 37 AS VARCHAR) || '.example'
         |   ELSE 'sub.xy.example' END AS domain
         | FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("doc_id"),
        mainDomainUdf(when(col("doc_id") % 2 === 0,
          concat(lit("http://www.site"), (col("doc_id") % 37).cast("string"),
            lit(".example/p/1")))
          .otherwise(lit("http://sub.xy.example/p/2"))).as("domain"))),

    // E5 — scheme defaulting (url.py:89-97)
    Q("e5_add_scheme",
      s"""$FRONTIER_SQL SELECT doc_id,
         | 'http://' || host || '/x' AS with_scheme FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("doc_id"),
        addSchemeUdf(when(col("doc_id") % 2 === 0, concat(lit("//"), col("host"), lit("/x")))
          .otherwise(concat(col("host"), lit("/x")))).as("with_scheme"))),

    // E6 — extension blacklist predicate (url.py:83-86)
    Q("e6_url_extension",
      s"""$FRONTIER_SQL SELECT doc_id,
         | (doc_id % 5 = 0 OR doc_id % 5 = 1) AS blocked FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("doc_id"),
        hasExtUdf(concat(col("url"),
          when(col("doc_id") % 5 === 0, ".jpg").when(col("doc_id") % 5 === 1, ".pdf")
            .when(col("doc_id") % 5 === 2, ".html").otherwise(""))).as("blocked"))),

    // E10 — cookie string → map (tonado_cookies.py:4-9), exploded to rows
    Q("e10_cookie_parse",
      """SELECT doc_id, 'sid' AS k, CAST(doc_id AS VARCHAR) AS v FROM documents
        | UNION ALL SELECT doc_id, 'lang' AS k, lang AS v FROM documents""".stripMargin)(
      (s, dir) => table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          concat(lit("sid="), col("doc_id").cast("string"), lit("; lang="), col("lang"))
            .as("cookie"))
        .select(col("doc_id"), explode(expr("str_to_map(cookie, '; ', '=')")))
        .select(col("doc_id"), col("key").as("k"), col("value").as("v"))),

    // P6 — link extraction + absolutization + javascript:/mailto: drop
    // (spider/lxml_extractor.py:66-86): html synthesized per doc; the real
    // extractLinks runs on the Spark side, the oracle states the expectation
    Q("p6_link_extract",
      s"""$FRONTIER_SQL SELECT doc_id, link FROM (
         |  SELECT doc_id, url AS link FROM frontier
         |  UNION ALL
         |  SELECT doc_id, 'http://site' || CAST(doc_id % 37 AS VARCHAR) ||
         |    '.example/p/rel/' || CAST(doc_id AS VARCHAR) AS link FROM frontier) t""".stripMargin)(
      (s, dir) => {
        val html = concat(
          lit("<html><body><a href=\""), col("url"), lit("\">x</a>"),
          lit("<a href=\"javascript:void(0)\">j</a>"),
          lit("<a href=\"mailto:a@b.c\">m</a>"),
          lit("<a href=\"rel/"), col("doc_id").cast("string"), lit("\">r</a>"),
          lit("</body></html>"))
        frontier(s, dir).select(col("doc_id"),
            explode(linksUdf(html, col("url"))).as("link"))
      }),

    // P7 — allow/deny URL filters (lxml_extractor.py:92-123): deny regex +
    // extension blacklist + scheme whitelist
    Q("p7_url_filter",
      s"""$FRONTIER_SQL SELECT taskid, url FROM frontier
         | WHERE doc_id % 4 <> 1
         |   AND NOT regexp_matches(url, '/p/1[0-9]${"$"}')""".stripMargin)(
      (s, dir) => frontier(s, dir)
        .withColumn("url2",
          when(col("doc_id") % 4 === 1, concat(col("url"), lit(".jpg")))
            .otherwise(col("url")))
        .filter(!hasExtUdf(col("url2")).cast("boolean") &&
          !col("url2").rlike("/p/1[0-9]$"))
        .select(col("taskid"), col("url2").as("url"))),

    // P8/E8 — xpath field extraction + etree2text over the closed grammar
    // (base_spider.py:118-136, utils.py:414-424): title round-trips with
    // HTML-escaping exactly
    Q("p8_xpath_title",
      """SELECT doc_id, 'T ' || CAST(doc_id AS VARCHAR) || ' &<>"' AS title
        | FROM documents""".stripMargin)(
      (s, dir) => table(s, dir, "documents").select(col("doc_id"),
        titleUdf(concat(lit("<html><head><title>T "),
          col("doc_id").cast("string"),
          lit(" &amp;&lt;&gt;&quot;</title></head><body></body></html>")))
          .as("title"))),

    // P4/P3 — text extraction inverse of the corpus template: rebuild the
    // documents table's own text through render→extract (byte-identity)
    Q("p3_text_roundtrip",
      "SELECT doc_id, text FROM documents")(
      (s, dir) => {
        val renderUdf = udf((text: String) =>
          new String(graft.corpus.CorpusGen.renderHtml(text, Nil, "utf-8"), "UTF-8"))
        table(s, dir, "documents").select(col("doc_id"),
          textUdf(renderUdf(col("text"))).as("text"))
      }),

    // P11 — depth guard (base_handler.py:481-494)
    Q("p11_depth_guard",
      s"""$FRONTIER_SQL SELECT taskid, depth FROM frontier
         | WHERE CASE WHEN doc_id % 2 = 0 THEN depth <= 3 ELSE TRUE END""".stripMargin)(
      (s, dir) => frontier(s, dir)
        .filter(when(col("doc_id") % 2 === 0, col("depth") <= 3).otherwise(lit(true)))
        .select("taskid", "depth")),

    // P12 — ajax URL split: fetch_type flag by pattern (base_spider.py:40-60)
    Q("p12_ajax_split",
      s"""$FRONTIER_SQL SELECT taskid,
         | CASE WHEN regexp_matches(url, '/p/.*[02468]${"$"}') THEN 'js'
         |   ELSE NULL END AS fetch_type FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("taskid"),
        when(col("url").rlike("/p/.*[02468]$"), lit("js"))
          .otherwise(lit(null).cast("string")).as("fetch_type"))),

    // P13 — list-URL age policy (base_spider.py:96-112)
    Q("p13_list_age",
      s"""$FRONTIER_SQL SELECT taskid,
         | CAST(CASE WHEN regexp_matches(url, '/p/[0-9]*0${"$"}')
         |   THEN 3600 ELSE -1 END AS BIGINT) AS age FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("taskid"),
        when(col("url").rlike("/p/[0-9]*0$"), 3600L).otherwise(-1L).as("age"))),

    // F3 — redirect following: bounded iterative resolution against a
    // redirect map (tornado_fetcher.py:329-364); 301 chain k → k+1 for
    // doc_id%10==0, max 5 hops
    Q("f3_redirects",
      s"""$FRONTIER_SQL SELECT f.taskid,
         | CASE WHEN f.doc_id % 10 = 0 THEN r.url ELSE f.url END AS final_url
         | FROM frontier f LEFT JOIN frontier r ON r.doc_id = f.doc_id + 1""".stripMargin)(
      (s, dir) => {
        val f = frontier(s, dir)
        val redirects = f.select((col("doc_id") - 1).as("src_id"), col("url").as("dst_url"))
        f.join(redirects, f("doc_id") === redirects("src_id"), "left_outer")
          .select(col("taskid"),
            when(col("doc_id") % 10 === 0, col("dst_url")).otherwise(col("url"))
              .as("final_url"))
      }),

    // urljoin vectors (RFC-3986 resolution used by P6)
    Q("p6_urljoin",
      s"""$FRONTIER_SQL SELECT doc_id,
         | 'http://site' || CAST(doc_id % 37 AS VARCHAR) || '.example/p/x' AS joined
         | FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("doc_id"),
        urljoinUdf(col("url"), lit("../p/x")).as("joined"))),

    // E11 — curl_to_arguments (url.py:161-213): three branch shapes cover
    // single-quoted words, double-quoted words with \" escapes, bare words,
    // -X/-H/-d/--data-binary ($ strip)/--compressed, and the
    // data-implies-POST method default
    Q("e11_curl_parse",
      s"""$FRONTIER_SQL SELECT doc_id, url AS purl,
         | CASE WHEN doc_id % 3 = 2 THEN 'GET' ELSE 'POST' END AS method,
         | CASE WHEN doc_id % 3 = 2 THEN NULL
         |   ELSE 'q=' || CAST(doc_id AS VARCHAR) END AS data,
         | CASE WHEN doc_id % 3 = 0
         |     THEN 'X-Doc=' || CAST(doc_id AS VARCHAR) || ' v;X-Q=a"b'
         |   WHEN doc_id % 3 = 1 THEN 'Cookie=sid=' || CAST(doc_id AS VARCHAR)
         |   ELSE '' END AS hdr,
         | (doc_id % 3 = 0) AS gz FROM frontier""".stripMargin)(
      (s, dir) => {
        val id = col("doc_id").cast("string")
        val line =
          when(col("doc_id") % 3 === 0, concat(
            lit("curl '"), col("url"), lit("' -X POST -H 'X-Doc: "), id,
            lit(" v' -H \"X-Q: a\\\"b\" --data-binary '$q="), id,
            lit("' --compressed")))
          .when(col("doc_id") % 3 === 1, concat(
            lit("curl -H 'Cookie: sid="), id, lit("' -d q="), id,
            lit(" "), col("url")))
          .otherwise(concat(lit("curl "), col("url")))
        frontier(s, dir).select(col("doc_id"), curlUdf(line).as("o"))
          .select(col("doc_id"), col("o.purl").as("purl"),
            col("o.method").as("method"), col("o.data").as("data"),
            col("o.hdr").as("hdr"), col("o.gz").as("gz"))
      }),

    // P5 — page.json accessor (libs/response.py:136-145): the real
    // FetchedPage lazy-parses a synthesized API body; field/array access
    // round-trips against the construction
    Q("p5_page_json",
      """SELECT doc_id, doc_id AS id, lang AS name,
        | 'http://a.example/' || CAST(doc_id AS VARCHAR) AS item0,
        | CAST(2 AS INTEGER) AS n_items FROM documents""".stripMargin)(
      (s, dir) => {
        val id = col("doc_id").cast("string")
        val body = concat(
          lit("{\"id\": "), id, lit(", \"name\": \""), col("lang"),
          lit("\", \"items\": [{\"url\": \"http://a.example/"), id,
          lit("\"}, {\"url\": \"http://b.example/"), id, lit("\"}]}"))
        table(s, dir, "documents").select(col("doc_id"), pageJsonUdf(body).as("o"))
          .select(col("doc_id"), col("o.id").as("id"), col("o.name").as("name"),
            col("o.item0").as("item0"), col("o.n_items").as("n_items"))
      }),

    // E12 — format_date relative dates (libs/utils.py:72-143): the real
    // columnar DateFormat runs on the Spark side over a deterministic ts
    // spread hitting every branch (seconds/minutes/hours incl. banker's-
    // rounding halves, yesterday, weekday, month-day, full, the future
    // whole-day clamp quirk, NULL); the oracle restates the algorithm over
    // DuckDB's calendar functions (now = 1700000000 = Nov 14 2023 22:13:20
    // UTC, so local_yesterday.day = 13)
    Q("e12_format_date",
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 101 = 0 THEN NULL
        |         WHEN doc_id % 8 = 0 THEN 1700000000 - doc_id % 55
        |         WHEN doc_id % 8 = 1 THEN 1700000000 - (doc_id % 2950 + 50)
        |         WHEN doc_id % 8 = 2 THEN 1700000000 - (doc_id % 83400 + 3000)
        |         WHEN doc_id % 8 = 3 THEN 1700000000 - (doc_id % 80000) - 86400
        |         WHEN doc_id % 8 = 4 THEN 1700000000 - (doc_id % 259200) - 172800
        |         WHEN doc_id % 8 = 5 THEN 1700000000 - (doc_id % 28425600) - 432000
        |         WHEN doc_id % 8 = 6 THEN 1700000000 - (doc_id % 34560000) - 28857600
        |         ELSE 1700000000 + doc_id % 172900 END AS ts
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, ts,
        |    CASE WHEN ts > 1700000000 AND (ts - 1700000000) % 86400 < 60
        |         THEN 1700000000 ELSE ts END AS tse,
        |    (ts > 1700000000 AND (ts - 1700000000) % 86400 >= 60) AS isfull
        |  FROM base),
        |d AS (
        |  SELECT doc_id, ts, isfull,
        |    (1700000000 - tse) // 86400 AS days,
        |    (1700000000 - tse) % 86400 AS secs,
        |    make_timestamp(tse * 1000000) AS lt
        |  FROM c),
        |e AS (
        |  SELECT *,
        |    CAST(hour(lt) AS VARCHAR) || ':' ||
        |      lpad(CAST(minute(lt) AS VARCHAR), 2, '0') AS tstr,
        |    strftime(lt, '%b') || ' ' || CAST(day(lt) AS VARCHAR) || ', ' ||
        |      CAST(year(lt) AS VARCHAR) AS mdy,
        |    secs // 60 AS m0, secs % 60 AS mr,
        |    secs // 3600 AS h0, secs % 3600 AS hr
        |  FROM d)
        |SELECT doc_id,
        |  CASE
        |    WHEN ts IS NULL OR ts = 0 THEN '-'
        |    WHEN isfull THEN mdy || ' at ' || tstr
        |    WHEN days = 0 AND secs < 50 THEN
        |      CASE WHEN secs <= 1 THEN '1 second ago'
        |           ELSE CAST(secs AS VARCHAR) || ' seconds ago' END
        |    WHEN days = 0 AND secs < 3000 THEN
        |      CASE WHEN m0 + (CASE WHEN mr > 30 THEN 1 WHEN mr < 30 THEN 0
        |                           ELSE m0 % 2 END) <= 1 THEN '1 minute ago'
        |           ELSE CAST(m0 + (CASE WHEN mr > 30 THEN 1 WHEN mr < 30 THEN 0
        |                                ELSE m0 % 2 END) AS VARCHAR)
        |                || ' minutes ago' END
        |    WHEN days = 0 THEN
        |      CASE WHEN h0 + (CASE WHEN hr > 1800 THEN 1 WHEN hr < 1800 THEN 0
        |                           ELSE h0 % 2 END) <= 1 THEN '1 hour ago'
        |           ELSE CAST(h0 + (CASE WHEN hr > 1800 THEN 1 WHEN hr < 1800 THEN 0
        |                                ELSE h0 % 2 END) AS VARCHAR)
        |                || ' hours ago' END
        |    WHEN days = 1 AND day(lt) = 13 THEN 'yesterday at ' || tstr
        |    WHEN days < 5 THEN strftime(lt, '%A') || ' at ' || tstr
        |    WHEN days < 334 THEN CAST(month(lt) AS VARCHAR) || '-' ||
        |      CAST(day(lt) AS VARCHAR) || ' at ' || tstr
        |    ELSE mdy || ' at ' || tstr
        |  END AS rel
        |FROM e""".stripMargin)(
      (s, dir) => {
        val NOW = 1700000000L
        val id = col("doc_id").cast("long")
        val ts =
          when(id % 101 === 0, lit(null).cast("long"))
            .when(id % 8 === 0, lit(NOW) - id % 55)
            .when(id % 8 === 1, lit(NOW) - (id % 2950 + 50L))
            .when(id % 8 === 2, lit(NOW) - (id % 83400 + 3000L))
            .when(id % 8 === 3, lit(NOW) - (id % 80000) - 86400L)
            .when(id % 8 === 4, lit(NOW) - (id % 259200) - 172800L)
            .when(id % 8 === 5, lit(NOW) - (id % 28425600L) - 432000L)
            .when(id % 8 === 6, lit(NOW) - (id % 34560000L) - 28857600L)
            .otherwise(lit(NOW) + id % 172900)
        table(s, dir, "documents").select(col("doc_id"),
          graft.functions.DateFormat.formatDateOrDash(ts, lit(NOW)).as("rel"))
      }),

    // F5 — deterministic UA rotation (tornado_fetcher.py:60-101,274-294):
    // pick index = first md5 byte mod pool size, identical in the Scala row
    // path (UaPool.pick), the column path (this query) and this oracle
    Q("f5_ua_pick",
      s"""$FRONTIER_SQL SELECT taskid,
         | CAST(((instr('0123456789abcdef', substr(md5(url), 1, 1)) - 1) * 16
         |      + (instr('0123456789abcdef', substr(md5(url), 2, 1)) - 1)) % 4
         |   AS INTEGER) AS ua_idx FROM frontier""".stripMargin)(
      (s, dir) => frontier(s, dir).select(col("taskid"),
        graft.functions.UaPool.idxCol(col("url")).as("ua_idx")))
  )
}
