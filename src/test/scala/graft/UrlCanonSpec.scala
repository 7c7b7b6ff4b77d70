package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.url.UrlCanon._

/** FIXTURES.md §6 vectors — byte-parity of the canonicalization chain with
  * the reference `_build_url`/`quote_chinese`/`get_domain`
  * (pyspider-master/pyspider/libs/url.py:109-160, libs/get_domain.py:22-30,
  * incl. the module self-tests url.py:215-221). */
class UrlCanonSpec extends AnyFunSuite {

  test("url.py self-test vectors (_build_url)") {
    // print _build_url('http://www.example.com/do?&a=1', None) → blank pair dropped by parse_qsl
    assert(canonicalize("http://www.example.com/do?&a=1") ===
      "http://www.example.com/do?a=1")
    // space in query normalized to '+'
    assert(canonicalize("http://www.example.com/do?q=a%20space&a=1") ===
      "http://www.example.com/do?q=a+space&a=1")
    // space in path percent-encoded
    assert(canonicalize("http://www.example.com/a do?a=1") ===
      "http://www.example.com/a%20do?a=1")
    // unquote-then-requote path
    assert(canonicalize("http://www.example.com/a %20do?a=1") ===
      "http://www.example.com/a%20%20do?a=1")
  }

  test("fragment dropped; empty path becomes /") {
    assert(canonicalize("http://example.com#frag") === "http://example.com/")
    assert(canonicalize("http://example.com/x?a=1#frag") === "http://example.com/x?a=1")
  }

  test("%2F / %3F protected in path (url.py:139-143)") {
    assert(canonicalize("http://example.com/a%2fb") === "http://example.com/a%2Fb")
    assert(canonicalize("http://example.com/a%3Fb") === "http://example.com/a%3Fb")
    // other escapes are unquoted then requoted
    assert(canonicalize("http://example.com/a%41b") === "http://example.com/aAb")
  }

  test("blank query values kept (keep_blank_values=True)") {
    assert(canonicalize("http://example.com/x?a=&b=1") === "http://example.com/x?a=&b=1")
    assert(canonicalize("http://example.com/x?a") === "http://example.com/x?a=")
  }

  test("quote_chinese: bytes >= 0x80 percent-encoded (UTF-8)") {
    assert(canonicalize("http://example.com/中文") ===
      "http://example.com/%E4%B8%AD%E6%96%87")
    assert(quoteChinese("http://example.com/中") === "http://example.com/%E4%B8%AD")
  }

  test("unicode host IDNA-encoded; ASCII labels untouched") {
    assert(canonicalize("http://中文.example.com/") ===
      "http://xn--fiq228c.example.com/")
    // python str.encode('idna') does NOT lowercase pure-ASCII labels
    assert(canonicalize("http://WWW.Example.com/") === "http://WWW.Example.com/")
  }

  test("scheme lowercased; params preserved") {
    assert(canonicalize("HTTP://example.com/x;par?a=1") === "http://example.com/x;par?a=1")
  }

  test("md5 taskid parity (libs/utils.py:20)") {
    assert(md5Hex("hello") === "5d41402abc4b2a76b9719d911017c592")
    assert(md5Hex("") === "d41d8cd98f00b204e9800998ecf8427e")
    assert(taskId("http://example.com/") === md5Hex("http://example.com/"))
  }

  test("main domain fallback heuristic (get_domain.py:22-30)") {
    assert(mainDomain("http://www.a.com/x") === "www.a.com") // 'a' < 4 chars → 3 labels
    assert(mainDomain("http://x.co.uk/") === "x.co.uk")
    assert(mainDomain("http://www.site0.example/p/1") === "site0.example")
    assert(mainDomain("site0.example") === "site0.example")
    assert(mainDomain("http://a.b.c.example.com/") === "example.com")
  }

  test("add_http_if_no_scheme (url.py:89-97)") {
    assert(addHttpIfNoScheme("//host/x") === "http://host/x")
    assert(addHttpIfNoScheme("host/x") === "http://host/x")
    assert(addHttpIfNoScheme("https://host/x") === "https://host/x")
  }

  test("url_is_from_any_domain / url_has_any_extension (url.py:76-86)") {
    assert(urlIsFromAnyDomain("http://a.example.com/x", Seq("example.com")))
    assert(!urlIsFromAnyDomain("http://examplexcom/x", Seq("example.com")))
    assert(urlHasAnyExtension("http://e.com/a/b.JPG", Set(".jpg")))
    assert(!urlHasAnyExtension("http://e.com/a/b.html", Set(".jpg")))
  }

  test("urljoin RFC-3986 vectors") {
    assert(urljoin("http://e.com/a/b", "c") === "http://e.com/a/c")
    assert(urljoin("http://e.com/a/b", "/c") === "http://e.com/c")
    assert(urljoin("http://e.com/a/b", "../c") === "http://e.com/c")
    assert(urljoin("http://e.com/a/b", "//x.com/c") === "http://x.com/c")
    assert(urljoin("http://e.com/a/b", "http://y.com/") === "http://y.com/")
    assert(urljoin("http://e.com/a/b?q=1", "") === "http://e.com/a/b?q=1")
  }

  test("E11 curl_to_arguments parity (libs/url.py:161-213)") {
    import graft.url.CurlParse
    // the reference docstring's own example shape: Copy-as-cURL line
    val args = CurlParse.toArguments(
      """curl 'http://example.com/api?x=1' -X POST -H 'Accept: application/json' """ +
        """-H "Cookie: a=1; b=2" --data-binary $'{"k":"v"}' --compressed""")
    assert(args.urls === Seq("http://example.com/api?x=1"))
    assert(args.method === Some("POST"))
    assert(args.headers("Accept") === "application/json")
    assert(args.cookies === Some("a=1; b=2"))
    assert(args.data === Some("""{"k":"v"}""")) // leading '$' stripped
    assert(args.useGzip)
    assert(args.fetchOpts.method === "POST")
    assert(args.fetchOpts.cookies === "a=1; b=2")
    // -d sets data; default method stays GET unless -X given (reference
    // passes kwargs through; fetchOpts infers POST for data like curl does)
    val d = CurlParse.toArguments("curl http://e.com -d 'a=b&c=d'")
    assert(d.data === Some("a=b&c=d") && d.method.isEmpty)
    assert(d.fetchOpts.method === "POST")
    // multiple urls accumulate; flags between them are fine
    assert(CurlParse.toArguments("curl http://a.com http://b.com").urls.size === 2)
    // error parity: no url / unknown option / dangling option
    intercept[IllegalArgumentException](CurlParse.toArguments("curl -X POST"))
    intercept[IllegalArgumentException](
      CurlParse.toArguments("curl http://e.com --bogus v"))
    intercept[IllegalArgumentException](
      CurlParse.toArguments("curl http://e.com -H"))
    // shlex parity: quotes + escapes
    assert(CurlParse.shellSplit("""a 'b c' "d \" e" f\ g""") ===
      Seq("a", "b c", """d " e""", "f g"))
  }

  test("property: canonicalization is idempotent (scalacheck)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val gen = Gen.oneOf(
      Gen.alphaNumStr.map(s => s"http://example.com/$s"),
      Gen.alphaNumStr.map(s => s"http://h.example.com/p?q=$s&x="),
      Gen.alphaNumStr.map(s => s"http://site0.example/a b/$s#f"),
      Gen.const("http://example.com/中 文?我=1"))
    val prop = Prop.forAll(gen) { u =>
      val c = canonicalize(u)
      canonicalize(c) == c
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: idempotence holds on hostile inputs (scalacheck)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // URLs a real frontier sees: stray percent-escapes (valid and torn),
    // '+', dot-segments, double slashes, explicit ports, mixed-case scheme
    // and host, empty query values, fragments, non-ASCII — the taskid is
    // md5(canonicalize(url)), so ANY non-idempotent input re-keys a task on
    // re-crawl and splits its history
    val seg = Gen.oneOf("a", "b%20c", "d+e", "%2F", "%zz", "..", "", "中文",
      "a b", "~x", "A%3f", ".")
    val segs = Gen.listOfN(3, seg).map(_.mkString("/"))
    val scheme = Gen.oneOf("http", "HTTP", "https")
    val host = Gen.oneOf("Example.COM", "h.example.com", "site0.example")
    val port = Gen.oneOf("", ":80", ":8080")
    val query = Gen.oneOf("", "?", "?a=b=c", "?x=&y", "?我=1", "?a=%20+%2B")
    val frag = Gen.oneOf("", "#f", "#a b")
    val gen = for {
      sc <- scheme; h <- host; p <- port; s <- segs; q <- query; f <- frag
    } yield s"$sc://$h$p/$s$q$f"
    val prop = Prop.forAll(gen) { u =>
      val c = canonicalize(u)
      val cc = canonicalize(c)
      if (cc != c) { System.err.println(s"NON-IDEMPOTENT: $u -> $c -> $cc") }
      cc == c
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("native CanonicalizeUrl/TaskIdMd5 expressions match the Scala functions (hostile corpus)") {
    // the r5 codegen'd kernels (StringKernels) must agree byte-for-byte
    // with the direct Scala calls the typed crawl path makes — evaluated
    // through a real Spark plan so the doGenCode path is what runs
    val spark = SparkTestBase.spark
    import org.apache.spark.sql.functions.col
    val hostile = Seq(
      "http://Example.COM:80/a b/%2F/../d+e?a=b=c&x=&y#f",
      "HTTP://h.example.com:8080//double//slash?%zz=1",
      "http://site0.example/中 文?我=1&empty=",
      "example.com/no/scheme", "//proto.relative/x", "",
      "http://example.com/%zz%20%2B+~x/A%3f?a=%20+%2B#a b")
    val df = spark.createDataFrame(hostile.map(Tuple1(_))).toDF("u")
      .select(col("u"),
        org.apache.spark.sql.graft.StringKernels.canonicalizeUrl(col("u")).as("c"),
        org.apache.spark.sql.graft.StringKernels.taskId(
          org.apache.spark.sql.graft.StringKernels.canonicalizeUrl(col("u"))).as("t"))
    df.collect().foreach { r =>
      val u = r.getString(0)
      val c = canonicalize(u)
      assert(r.getString(1) === c, s"canonicalize_url($u)")
      assert(r.getString(2) === md5Hex(c), s"task_id($u)")
    }
  }
}
