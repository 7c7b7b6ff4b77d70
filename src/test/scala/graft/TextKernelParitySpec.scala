package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.StringKernels

/** r6 optimization-parity pins: the single-pass dedup-signature kernels
  * (fingerprintShingleMd5, minhashBandsS, simhash16Md5S) must equal the
  * explode → groupBy aggregation plans they replaced in
  * t_fingerprint / minhash_signatures / dedup_simhash, and the banded
  * candidate joins' expected-cap hash sample (TextQueries.BAND_CAP) must be
  * a no-op below the cap and an expected-size sample above it. */
class TextKernelParitySpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  private def md5Hex(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(b)
    d.map(x => f"$x%02x").mkString
  }

  /** independent reimplementation of the oracle's shingle enumeration:
    * substr(text, i, 8) over CODE POINTS for i = 1, 5, … ≤ max(len-7, 1) */
  private def shingles(text: String): Seq[String] = {
    val cps = text.codePoints().toArray
    val len = cps.length
    val limit = math.max(len - 7, 1)
    (1 to limit by 4).map { i =>
      new String(cps, i - 1, math.min(8, len - (i - 1)).max(0))
    }
  }

  private def utf8(s: String) = UTF8String.fromString(s)

  private val hostileTexts = Seq(
    "", " ", "  ", "ab", "abcdefg", "abcdefgh", "abcdefghi",
    "the quick brown fox jumps over the lazy dog",
    "doc doc doc doc doc doc doc doc doc doc",
    "中文内容 混合 ascii 词汇 与 空格", "a" * 41, ("xy " * 20).trim,
    "tab\tis not a separator", "trailing space ", " leading space")

  test("fingerprint kernel == min(md5(shingle)) for hostile + generated texts") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    def expected(text: String): String =
      shingles(text).map(sh => md5Hex(sh.getBytes("UTF-8"))).min
    hostileTexts.foreach { t =>
      assert(StringKernels.fingerprintShingleMd5(utf8(t)).toString === expected(t), s"text=[$t]")
    }
    val gen = Gen.listOfN(6, Gen.oneOf(Gen.alphaNumStr.map(_.take(12)),
      Gen.const(""), Gen.const("中文字符串测试内容"), Gen.const("a b"))).map(_.mkString(" "))
    val prop = Prop.forAll(gen) { t =>
      StringKernels.fingerprintShingleMd5(utf8(t)).toString == expected(t)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("minhash-bands kernel == md5(min||min) aggregation for hostile + generated texts") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    def expected(text: String): (String, String) = {
      val sh = shingles(text)
      def minP(p: Char) = sh.map(x => md5Hex((p + x).getBytes("UTF-8"))).min
      (md5Hex((minP('1') + minP('2')).getBytes("UTF-8")),
        md5Hex((minP('3') + minP('4')).getBytes("UTF-8")))
    }
    def actual(text: String): (String, String) = {
      val r = StringKernels.minhashBandsS(utf8(text))
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }
    hostileTexts.foreach(t => assert(actual(t) === expected(t), s"text=[$t]"))
    val gen = Gen.listOfN(5, Gen.oneOf(Gen.alphaNumStr.map(_.take(10)),
      Gen.const("中文 词"), Gen.const("boiler plate boiler plate"))).map(_.mkString(" "))
    val prop = Prop.forAll(gen)(t => actual(t) == expected(t))
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("simhash16 kernel == md5-nibble vote aggregation (split ' ' keeps empties)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    def expected(text: String): String = {
      val votes = new Array[Int](16)
      text.split(" ", -1).foreach { tok =>
        val hex = md5Hex(tok.getBytes("UTF-8"))
        for (j <- 0 until 16)
          if (hex.charAt(j) >= '8') votes(j) += 1 else votes(j) -= 1
      }
      votes.map(v => if (v > 0) '1' else '0').mkString
    }
    hostileTexts.foreach { t =>
      assert(StringKernels.simhash16Md5S(utf8(t)).toString === expected(t), s"text=[$t]")
    }
    val gen = Gen.listOfN(6, Gen.oneOf(Gen.alphaNumStr.map(_.take(8)),
      Gen.const(""), Gen.const("中文"), Gen.const("%20"))).map(_.mkString(" "))
    val prop = Prop.forAll(gen) { t =>
      StringKernels.simhash16Md5S(utf8(t)).toString == expected(t)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("kernels == the replaced explode/groupBy plans on real fixture docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // the pre-r6 t_fingerprint plan, verbatim
    val shingleDf = docs.select(col("doc_id"),
        explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1)), lit(4))).as("i"),
        col("text"))
      .select(col("doc_id"), expr("substring(text, cast(i as int), 8)").as("sh"))
    val oldFp = shingleDf.groupBy("doc_id").agg(min(md5(col("sh"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val newFp = docs.select(col("doc_id"),
        StringKernels.fingerprintShingle(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(newFp === oldFp)
    // the pre-r6 minhash_signatures plan, verbatim
    val oldMh = shingleDf.groupBy("doc_id")
      .agg(md5(concat(min(md5(concat(lit("1"), col("sh")))),
          min(md5(concat(lit("2"), col("sh")))))).as("band1"),
        md5(concat(min(md5(concat(lit("3"), col("sh")))),
          min(md5(concat(lit("4"), col("sh")))))).as("band2"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val newMh = docs.select(col("doc_id"),
        StringKernels.minhashBands(col("text")).as("mb"))
      .select(col("doc_id"), col("mb.band1"), col("mb.band2"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(newMh === oldMh)
    // the pre-r6 dedup_simhash plan, verbatim
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
    val bitCols = (0 until 16).map { j =>
      when(sum(when(substring(md5(col("tok")), j + 1, 1) >= "8", 1)
        .otherwise(-1)) > 0, "1").otherwise("0")
    }
    val oldSh = toks.groupBy("doc_id").agg(concat(bitCols: _*).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val newSh = docs.select(col("doc_id"),
        StringKernels.simhash16Md5(col("text")).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(newSh === oldSh)
    // null text propagates to a dropped row in query form (isNotNull guard)
    assert(newFp.size === docs.count())
  }

  test("band cap: no-op below BAND_CAP, expected-size sample on a hot bucket") {
    val cap = queries.TextQueries.BAND_CAP
    // one hot band value (4×cap rows) + a cold tail of singletons
    val hotN = (4 * cap).toInt
    val df = spark.range(hotN).select(col("id").as("doc_id"), lit(42L).as("band0"))
      .union(spark.range(100).select((col("id") + hotN).as("doc_id"),
        (col("id") + 1000L).as("band0")))
    val out = queries.TextQueries.cappedForTest(df, "band0")
    val hot = out.filter(col("band0") === 42L).count()
    val cold = out.filter(col("band0") =!= 42L).count()
    assert(cold === 100, "groups at/below the cap must be kept whole")
    // expected survivors = cap; allow wide slack for the LCG sample's variance
    assert(hot <= 3 * cap, s"hot bucket kept $hot of $hotN — cap not enforced")
    assert(hot >= cap / 4, s"hot bucket kept only $hot — sample too aggressive")
    // candidate-pair law: the capped self-join is ≤ ~(3·cap)²/2 pairs, far
    // below the uncapped hotN²/2 ≈ ${hotN.toLong * hotN / 2}
    val a = out.select(col("doc_id").as("id_a"), col("band0").as("ba"))
    val b = out.select(col("doc_id").as("id_b"), col("band0").as("bb"))
    val pairs = a.join(b, col("ba") === col("bb") && col("id_a") < col("id_b")).count()
    assert(pairs <= (3 * cap) * (3 * cap) / 2,
      s"candidate volume $pairs not bounded by the cap")
  }

  test("band cap is inactive on every driver fixture (max occupancy < BAND_CAP)") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val sim = docs.select(col("doc_id"),
        StringKernels.simhash64(col("text")).as("sim"))
      val sigs = sim.select(col("doc_id") +: (0 until 4).map { b =>
        shiftrightunsigned(col("sim"), 16 * b).bitwiseAND(lit(65535L)).as(s"band$b")
      }: _*)
      for (b <- 0 until 4) {
        val maxOcc = sigs.groupBy(s"band$b").count()
          .agg(max("count")).collect().head.getLong(0)
        assert(maxOcc < queries.TextQueries.BAND_CAP,
          s"$sf band$b max occupancy $maxOcc reached the cap — gate parity at risk")
      }
      val mh = docs.select(col("doc_id"),
          StringKernels.minhashBands(col("text")).as("mb"))
        .select(col("doc_id"), col("mb.band1"), col("mb.band2"))
      for (c <- Seq("band1", "band2")) {
        val maxOcc = mh.groupBy(c).count().agg(max("count")).collect().head.getLong(0)
        assert(maxOcc < queries.TextQueries.BAND_CAP,
          s"$sf minhash $c max group $maxOcc reached the cap")
      }
    }
  }
}
