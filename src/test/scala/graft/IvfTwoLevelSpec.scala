package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.VectorQueries

/** r6 two-level IVF assignment (VERDICT r5 item 4): the coarse-level
  * codebook prunes the flat n·K argmax to n·(G + fanout·K/G) dots. Laws:
  *  1. with fanout ≥ G (probe every group) the two-level path is
  *     BIT-IDENTICAL to the flat argmax — the member scoring runs the
  *     exact flat expression dot/(sqrt(n2)·sqrt(cn2)) with the same
  *     (cos desc, cid asc) tie-break, so pruning is the only divergence;
  *  2. with the production fanout the pruned assignment agrees with flat
  *     on the overwhelming majority of vectors (approximate by design —
  *     standard IMI semantics, documented);
  *  3. the gate path never dispatches to two-level (K < MIN_K on every
  *     fixture), so the DuckDB-checked results replay the flat argmax. */
class IvfTwoLevelSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark

  private def inputs() = {
    val (qry, cand) = VectorQueries.ivfInputs(spark, "/root/testdata/sf0.001")
    val k = VectorQueries.ivfKFor(cand.count())
    val cents = VectorQueries.ivfTrain(cand, k, iters = 1)
    (cand, cents)
  }

  test("full-fanout two-level == flat argmax, bit for bit") {
    val (cand, cents) = inputs()
    val rows = cents.select("cid", "c", "cn2").collect()
    val g = math.max(1, math.round(math.sqrt(rows.length.toDouble)).toInt)
    val flat = VectorQueries.ivfAssignFlat(cand, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = VectorQueries.ivfAssignTwoLevel(cand, rows, fanout = g)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === flat)
  }

  test("production fanout agrees with flat on >= 90% of the fixture") {
    val (cand, cents) = inputs()
    val rows = cents.select("cid", "c", "cn2").collect()
    val flat = VectorQueries.ivfAssignFlat(cand, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = VectorQueries
      .ivfAssignTwoLevel(cand, rows, VectorQueries.IVF_TWO_LEVEL_FANOUT)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two.keySet === flat.keySet)
    val agree = flat.count { case (v, c) => two(v) == c }
    val frac = agree.toDouble / flat.size
    assert(frac >= 0.9, f"two-level/flat agreement $frac%.3f below floor")
  }

  test("gate path stays flat: every fixture trains K far below the dispatch threshold") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val (_, cand) = VectorQueries.ivfInputs(spark, s"/root/testdata/$sf")
      val k = VectorQueries.ivfKFor(cand.count())
      assert(k < VectorQueries.IVF_TWO_LEVEL_MIN_K,
        s"$sf trains K=$k — would dispatch two-level and diverge from the oracle")
    }
  }
}
