package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.StringKernels

/** The native scalar kernels beyond the ExtensionsSpec SQL round-trips:
  * null propagation through the codegen path, and a scalacheck property
  * pinning the one-pass simhash64 scalar to the banded md5-vote
  * aggregation it must equal (the simhash64_bands gate derivation) over
  * arbitrary token streams — including empty tokens from consecutive
  * spaces, which `split(' ', -1)` keeps. */
class StringKernelsSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  test("null inputs propagate as null through every kernel") {
    val df = spark.sql("SELECT CAST(NULL AS STRING) AS s")
    val r = df.select(
      StringKernels.canonicalizeUrl(col("s")),
      StringKernels.taskId(col("s")),
      StringKernels.mainDomain(col("s")),
      StringKernels.addHttpIfNoScheme(col("s")),
      StringKernels.langId(col("s")),
      StringKernels.tokenCount(col("s")),
      StringKernels.qualityScore(col("s")),
      StringKernels.simhash16(col("s")),
      StringKernels.simhash64(col("s")),
      StringKernels.fingerprint64(col("s"))).collect().head
    (0 until r.length).foreach(i => assert(r.isNullAt(i), s"column $i"))
  }

  test("property: simhash64 scalar == banded md5-vote aggregation (scalacheck)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // token streams with empties, unicode, punctuation — split(' ', -1) shape
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.const(""),
      Gen.const("中文"), Gen.const("a.b,c"), Gen.const("%20"))
    val gen = Gen.listOfN(6, word).map(_.mkString(" "))

    def banded(text: String): Long = {
      // independent reimplementation straight from the gate's SQL shape
      val toks = text.split(" ", -1)
      val votes = new Array[Int](64)
      toks.foreach { t =>
        val hex = t.getBytes("UTF-8")
        val d = java.security.MessageDigest.getInstance("MD5").digest(hex)
        for (j <- 0 until 64) {
          val hp = j / 2
          val nib = if (hp % 2 == 0) (d(hp / 2) >> 4) & 0xf else d(hp / 2) & 0xf
          val up = if (j % 2 == 0) nib >= 8 else (nib & 1) == 1
          if (up) votes(j) += 1 else votes(j) -= 1
        }
      }
      (0 until 64).map(j => if (votes(j) > 0) 1L << j else 0L).sum
    }

    val prop = Prop.forAll(gen) { text =>
      StringKernels.simhash64S(
        org.apache.spark.unsafe.types.UTF8String.fromString(text)) == banded(text)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("simhash64 16-bit slices equal the gate's band columns on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    val viaScalar = docs.select(col("doc_id"),
      StringKernels.simhash64(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the gate aggregation (simhash64_bands Spark side), re-derived
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
    def vote(j: Int) = {
      val c = substring(md5(col("tok")), j / 2 + 1, 1)
      val bit = if (j % 2 == 0) c >= "8"
        else c.isin("1", "3", "5", "7", "9", "b", "d", "f")
      when(bit, 1).otherwise(-1)
    }
    val bands = (0 until 4).map { b =>
      (0 until 16).map { i =>
        when(sum(vote(b * 16 + i)) > 0, lit(1L << i)).otherwise(0L)
      }.reduce(_ + _).cast("long").as(s"band$b")
    }
    toks.groupBy("doc_id").agg(bands.head, bands.tail: _*).collect().foreach { r =>
      val h = viaScalar(r.getLong(0))
      for (b <- 0 until 4)
        assert(((h >>> (16 * b)) & 0xffffL) === r.getLong(1 + b),
          s"doc ${r.getLong(0)} band $b")
    }
  }
}
