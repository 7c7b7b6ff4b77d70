package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries
import graft.tools.AnnRecall

/** The offline IVF trainer (VERDICT r4 item 4). Laws:
  *  1. the DISTRIBUTED trainer (`VectorQueries.ivfTrain` — broadcast
  *     centroids, map-side argmax, per-dim integer-sum Lloyd) produces
  *     BIT-IDENTICAL centroids to the driver-side twin
  *     (`AnnRecall.kmeansLocal`) — the integer protocol makes multi-step
  *     k-means order-independent, so this is an exact equality, not a
  *     tolerance check;
  *  2. `annIvf(centroidsDir = Some(path))` actually consumes the persisted
  *     table: searching with 3-step trained centroids equals the in-memory
  *     ivfSearch against those centroids, and the quantizer genuinely
  *     differs from the in-query 1-step one. */
class IvfTrainSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark

  private val fixture = AnnRecall.clusteredFixture(
    nClusters = 20, perCluster = 20, nBackground = 100)

  private def fixtureDF() = {
    import spark.implicits._
    spark.createDataset(fixture.toSeq.map { case (id, v) => (id, v.toSeq) })
      .toDF("vec_id", "q")
      .withColumn("n2", graft.functions.VectorExpr.dotL(col("q"), col("q")))
  }

  test("distributed ivfTrain == kmeansLocal, bit-for-bit, over 3 Lloyd steps") {
    val cand = fixtureDF().filter(col("vec_id") >= 100)
    val cands = fixture.filter(_._1 >= 100)
    val k = VectorQueries.ivfKFor(cands.length)
    for (iters <- Seq(1, 3)) {
      val dist = VectorQueries.ivfTrain(cand, k, iters)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      val local = AnnRecall.kmeansLocal(cands, k, iters)
        .map { case (c, v) => c -> v }.toMap
      assert(dist.keySet === local.keySet, s"iters=$iters list ids")
      dist.foreach { case (c, v) =>
        assert(v.toSeq === local(c).toSeq, s"iters=$iters centroid $c") }
    }
  }

  test("annIvf consumes a persisted centroid table") {
    val dir = Files.createTempDirectory("graft_ivf").toString
    // persist 3-step centroids over the sf0.001 corpus, then search with them
    val sf = "/root/testdata/sf0.001"
    val (qry, cand) = VectorQueries.ivfInputs(spark, sf)
    val k = VectorQueries.ivfKFor(cand.count())
    VectorQueries.ivfTrain(cand, k, iters = 3)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/cents")

    val viaPersisted = VectorQueries.annIvf(spark, sf, Some(s"$dir/cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaMemory = VectorQueries.ivfSearch(qry, cand,
      broadcast(spark.read.parquet(s"$dir/cents")), nprobe = 4, topk = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaPersisted === viaMemory)
    assert(viaPersisted.nonEmpty)

    // and it is genuinely the trained quantizer, not the 1-step fallback
    val oneStep = VectorQueries.annIvf(spark, sf, None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val trained3 = spark.read.parquet(s"$dir/cents")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val step1 = VectorQueries.ivfTrain(cand, k, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(trained3 !== step1, "3-step training changed nothing — fixture too easy or trainer inert")
    // (result sets MAY coincide — both are valid quantizers — so the
    // distinguishing assertion is on the centroids, not the top-k)
    assert(oneStep.nonEmpty)
  }
}
