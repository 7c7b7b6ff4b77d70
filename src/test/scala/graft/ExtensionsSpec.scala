package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.GraftExtensions

/** `GraftExtensions` — the spark-submit registration path
  * (`--conf spark.sql.extensions=org.apache.spark.sql.graft.
  * GraftExtensions`): the native kernels must be reachable from PLAIN SQL
  * with the same semantics as the Dataset facade, including implicit
  * integer widening of SQL literals. */
class ExtensionsSpec extends AnyFunSuite {

  // a second session over the SAME SparkContext, built with the extensions
  // (the shared SparkTestBase session is restored afterwards)
  private lazy val ext: SparkSession = {
    val base = SparkTestBase.spark // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try SparkSession.builder()
      .master(base.sparkContext.master)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("dot_l from SQL (int literals widen to bigint)") {
    val r = ext.sql("SELECT dot_l(array(1, 2, 3), array(4, 5, 6)) AS d")
      .collect().head.getLong(0)
    assert(r === 32L)
  }

  test("hp_signed_sum from SQL matches the facade and the md5 sign family") {
    import org.apache.spark.sql.functions._
    val viaSql = ext.sql(
      "SELECT hp_signed_sum(array(10, 20, 30, 40), 1) AS s")
      .collect().head.getLong(0)
    val viaFacade = ext.range(1)
      .select(graft.functions.VectorExpr.hpSignedSum(
        expr("array(10L, 20L, 30L, 40L)"), 1).as("s"))
      .collect().head.getLong(0)
    assert(viaSql === viaFacade)
    val expect = Seq(10L, 20L, 30L, 40L).zipWithIndex
      .map { case (v, i) => v * org.apache.spark.sql.graft.HpSigns.sign(1, i + 1) }.sum
    assert(viaSql === expect)
  }

  test("format_date from SQL: 2-arg and 6-arg forms") {
    val now = 1700000000L
    val r2 = ext.sql(s"SELECT format_date(${now - 2}, $now) AS s")
      .collect().head.getString(0)
    assert(r2 === "2 seconds ago")
    val r6 = ext.sql(
      s"SELECT format_date(${now - 2 * 86400}, $now, 0, true, true, false) AS s")
      .collect().head.getString(0)
    assert(r6 === "Sunday")
  }

  test("negative gmt_offset parses (UnaryMinus over a literal is foldable)") {
    // ADVICE r4: the parser wraps -60 as UnaryMinus(Literal); a strict
    // Literal match rejected the PRIMARY case of the tornado convention
    // (negative = east of GMT). Parity vs the facade on a non-relative form
    // where the offset actually shifts the rendered calendar day.
    import org.apache.spark.sql.functions._
    val ts = 1700000000L; val now = 1710000000L
    val viaSql = ext.sql(
      s"SELECT format_date($ts, $now, -600, false, false, true) AS s")
      .collect().head.getString(0)
    val viaFacade = ext.range(1)
      .select(graft.functions.DateFormat.formatDate(
        lit(ts), lit(now), gmtOffset = -600, relative = false,
        shorter = false, fullFormat = true).as("s"))
      .collect().head.getString(0)
    assert(viaSql === viaFacade)
  }

  test("the scalar URL/text library from SQL equals the engine functions") {
    import graft.url.UrlCanon
    import graft.functions.TextStats
    val url = "http://www.Site7.example/a b/p%2fq?q=a%20space&a=1&empty=#frag"
    val text = "the cat and the hat is   on les mats"
    // one row through every registered function, raw SQL
    val r = ext.sql(
      s"""SELECT canonicalize_url('$url') AS canon,
         |  task_id('$url') AS tid,
         |  main_domain('$url') AS dom,
         |  add_http_if_no_scheme('site.example/x') AS sch,
         |  lang_id('$text') AS lang,
         |  token_count('$text') AS ntok,
         |  quality_score('$text') AS q,
         |  simhash16('$text') AS sh16,
         |  simhash64('$text') AS sh64,
         |  fingerprint64('$text') AS fp""".stripMargin).collect().head
    assert(r.getString(0) === UrlCanon.canonicalize(url))
    assert(r.getString(1) === UrlCanon.md5Hex(url))
    assert(r.getString(2) === UrlCanon.mainDomain(url))
    assert(r.getString(3) === UrlCanon.addHttpIfNoScheme("site.example/x"))
    val st = TextStats.analyze(text)
    assert(r.getString(4) === st.lang)
    assert(r.getLong(5) === st.nTokens.toLong)
    val q = r.getStruct(6)
    assert(q.getLong(0) === st.nChars.toLong && q.getLong(1) === st.nTokens.toLong)
    assert(q.getDouble(2) === st.stopRatio && q.getDouble(3) === st.avgWordLen)
    assert(r.getLong(7) === st.simhash16.toLong)
    assert(r.getLong(9) === TextStats.fingerprint(text))

    // simhash64: the packed bits' 16-bit slices must equal the
    // simhash64_bands gate aggregation (split(' ', -1) token stream,
    // md5 hex-digit bit votes) computed via Spark built-ins
    import org.apache.spark.sql.functions._
    val sh64 = r.getLong(8)
    val toks = ext.createDataFrame(Seq(Tuple1(text))).toDF("text")
      .select(explode(split(col("text"), " ", -1)).as("tok"))
    def vote(j: Int) = {
      val c = substring(md5(col("tok")), j / 2 + 1, 1)
      val bit = if (j % 2 == 0) c >= "8"
        else c.isin("1", "3", "5", "7", "9", "b", "d", "f")
      when(bit, 1).otherwise(-1)
    }
    val packed = (0 until 64).map(j =>
      when(sum(vote(j)) > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    val expect64 = toks.agg(packed.as("s")).collect().head.getLong(0)
    assert(sh64 === expect64, "simhash64 scalar != banded aggregation")
  }

  test("non-foldable knob arguments are rejected") {
    val e = intercept[Exception] {
      ext.sql("SELECT hp_signed_sum(array(1), cast(rand() * 10 as bigint))")
        .collect()
    }
    assert(e.getMessage.contains("foldable"))
  }
}
