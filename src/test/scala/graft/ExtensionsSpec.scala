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

  test("non-foldable knob arguments are rejected") {
    val e = intercept[Exception] {
      ext.sql("SELECT hp_signed_sum(array(1), cast(rand() * 10 as bigint))")
        .collect()
    }
    assert(e.getMessage.contains("foldable"))
  }
}
