package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.AnnRecall

/** Recall floors for the ANN scale paths on the planted-cluster fixture
  * (VERDICT r4 item 2: uniform-random vectors degrade every sublinear
  * method toward its scan fraction — high absolute recall is only
  * achievable, hence only falsifiable, on clustered data, which is also the
  * production near-dup shape).
  *
  * The fixture and measurement are fully deterministic (splitmix64 fixture,
  * md5 sign family, quantized-integer cosine), so these are exact pins, not
  * statistical tests. The floors leave margin below the measured values
  * (lsh@16=0.94, ivf@4=1.00 at r5) so parameter tuning can move numbers
  * without churn, while a silent quality regression — e.g. a degenerate
  * hash family like the r1-r4 LCG, whose 16-band recall here was 0.377 —
  * trips them immediately. */
class AnnRecallSpec extends AnyFunSuite {

  private lazy val report = AnnRecall.measure(AnnRecall.clusteredFixture())

  test("hyperplane LSH: recall rises with bands and clears 0.85 @ 16 bands") {
    val byBands = report.lshByBands.map(s => s.knob -> s).toMap
    assert(byBands(4).recall10 < byBands(8).recall10)
    assert(byBands(8).recall10 < byBands(16).recall10,
      s"bands stopped buying recall: ${report.lshByBands}")
    assert(byBands(16).recall10 >= 0.85,
      s"lsh recall@10 floor: ${byBands(16).recall10}")
    assert(byBands(16).candFrac <= 0.15,
      s"lsh scan fraction blew up: ${byBands(16).candFrac}")
  }

  test("IVF: recall@10 >= 0.8 at nprobe <= 16 with a sublinear scan") {
    val byProbe = report.ivfByNprobe.map(s => s.knob -> s).toMap
    assert(byProbe(4).recall10 >= 0.8, s"ivf@4: ${byProbe(4).recall10}")
    assert(byProbe(16).recall10 >= 0.8, s"ivf@16: ${byProbe(16).recall10}")
    assert(byProbe(4).candFrac <= 0.2,
      s"ivf nprobe=4 scan fraction: ${byProbe(4).candFrac}")
  }
}
