package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.VectorQueries

/** Recall measurement for the ANN scale paths (dev evidence for
  * BENCH/BASELINE.md — the r3 verdict's criterion was "bucketed AND keep
  * recall at scale"; this quantifies the recall the scale parameters buy
  * and the candidate fraction they scan).
  *
  * Protocol: queries = vec_id < 100, candidates = the rest. Ground truth =
  * exact cosine top-10 per query over ALL candidates. Each method retrieves
  * its candidate set (same parameters as the gate queries: hpBitsFor-sized
  * hyperplane bands with the HP_CAP hash-sample cap; ivfKFor lists with an
  * nprobe sweep), ranks by exact cosine, and reports
  *   recall@10   = |top10_retrieved ∩ top10_exact| / 10, averaged
  *   cand_frac   = mean |candidates(q)| / nCand  (the work saved)
  * All arithmetic mirrors the quantized-integer protocol (floor(x*1000)
  * longs), so the numbers are deterministic. Small fixtures → computed
  * driver-side; the measured quantity is a property of the ALGORITHM
  * parameters, not the execution plan (which the gates already verify).
  *
  * Two fixtures (VERDICT r4 item 2 — uniform-only evidence was the right
  * analysis of the wrong fixture):
  *  - `uniform`: the driver's embeddings.parquet — near-uniform vectors
  *    where EVERY sublinear method degrades toward its scan fraction; the
  *    honest signal there is lift-over-random-scan and knob monotonicity;
  *  - `clustered`: a deterministic planted-cluster corpus (tight cosine
  *    clusters + uniform background) — the production near-dup shape where
  *    high absolute recall at a small scan fraction is achievable and
  *    falsifiable. AnnRecallSpec pins recall floors on this fixture. */
object AnnRecall {

  type Vec = (Long, Array[Long])
  case class Sweep(knob: Int, recall10: Double, candFrac: Double)
  case class Report(n: Long, nQueries: Int, bits: Int, cap: Long, ivfK: Int,
                    lshByBands: Seq[Sweep], ivfByNprobe: Seq[Sweep]) {
    def json: String = {
      def row(s: Sweep) =
        f"""{"knob":${s.knob},"recall10":${s.recall10}%.3f,"cand_frac":${s.candFrac}%.4f}"""
      s"""{"n":$n,"queries":$nQueries,"lsh_bits":$bits,"lsh_cap":$cap,"ivf_k":$ivfK,""" +
        s""""lsh_by_bands":[${lshByBands.map(row).mkString(",")}],""" +
        s""""ivf_by_nprobe":[${ivfByNprobe.map(row).mkString(",")}]}"""
    }
  }

  // ---- deterministic planted-cluster fixture ----------------------------
  // splitmix64: decorrelated deterministic doubles (the LCG family is
  // reserved for the engine's hyperplane signs — reusing it here would
  // correlate the fixture with the hash planes under test)
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def unit(seed: Long): Double = // [-1, 1)
    (mix64(seed) >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0

  /** nClusters tight cosine clusters of perCluster members (member = center
    * + eps-scaled noise; in-cluster cosine ≈ 1/sqrt(1+eps²)) + nBackground
    * uniform vectors, dim-dimensional, quantized floor(x*1000). IDs:
    * cluster members first (id % nClusters = cluster), background after —
    * so the protocol's vec_id<100 queries spread across clusters. */
  def clusteredFixture(nClusters: Int = 50, perCluster: Int = 40,
                       nBackground: Int = 500, dim: Int = 64,
                       eps: Double = 0.4, seed: Long = 42L): Array[Vec] = {
    val centers = Array.tabulate(nClusters, dim)((k, j) =>
      unit(seed * 1000003L + k * 64L + j))
    val members = (0 until nClusters * perCluster).map { i =>
      val k = i % nClusters
      val v = Array.tabulate(dim)(j =>
        centers(k)(j) + eps * unit(seed * 7776001L + i.toLong * 64L + j))
      (i.toLong, v.map(x => math.floor(x * 1000.0).toLong))
    }
    val bg = (0 until nBackground).map { i =>
      val id = (nClusters * perCluster + i).toLong
      (id, Array.tabulate(dim)(j =>
        math.floor(unit(seed * 5915587277L + id * 64L + j) * 1000.0).toLong))
    }
    (members ++ bg).toArray
  }

  /** Driver-side twin of `VectorQueries.ivfTrain` (first-k-by-id seeding,
    * exact integer Lloyd steps, empty lists drop) — bit-identical centroids
    * to the distributed trainer (IvfTrainSpec pins the parity). */
  def kmeansLocal(cands: Array[Vec], k: Int, iters: Int): Seq[(Long, Array[Long])] = {
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val sorted = cands.sortBy(_._1)
    val norm: Map[Long, Double] =
      sorted.map { case (id, v) => id -> math.sqrt(dot(v, v).toDouble) }.toMap
    var cents: Seq[(Long, Array[Long])] = sorted.take(k).toSeq
    var it = 0
    while (it < iters) {
      val cn = cents.map { case (c, v) => c -> math.sqrt(dot(v, v).toDouble) }.toMap
      val asg = sorted.groupBy { case (id, v) =>
        cents.map { case (c, cv) =>
          (dot(v, cv).toDouble / (norm(id) * cn(c)), -c) }.max match {
          case (_, nc) => -nc
        }
      }
      cents = asg.toSeq.sortBy(_._1).map { case (c, ms) =>
        val s = new Array[Long](ms.head._2.length)
        ms.foreach { case (_, v) =>
          var j = 0; while (j < v.length) { s(j) += v(j); j += 1 } }
        (c, s)
      }
      it += 1
    }
    cents
  }

  // ---- the measurement (pure, driver-side) ------------------------------
  // ivfIters: 1 = the in-query gate quantizer; >1 = the offline-trained
  // quantizer path (tools/IvfTrain)
  def measure(rows0: Array[Vec],
              lshBands: Seq[Int] = Seq(4, 8, 16),
              ivfProbes: Seq[Int] = Seq(4, 8, 16),
              ivfIters: Int = 1): Report = {
    val rows = rows0.sortBy(_._1)
    val queries = rows.filter(_._1 < 100)
    val cands = rows.filter(_._1 >= 100)
    val n = rows.length.toLong

    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val norm: Map[Long, Double] =
      rows.map { case (id, v) => id -> math.sqrt(dot(v, v).toDouble) }.toMap
    def cos(a: Vec, b: Vec): Double =
      dot(a._2, b._2).toDouble / (norm(a._1) * norm(b._1))

    def top10(q: Vec, pool: Seq[Vec]): Set[Long] =
      pool.map(c => (cos(q, c), c._1)).sortBy { case (c, id) => (-c, id) }
        .take(10).map(_._2).toSet

    val exact: Map[Long, Set[Long]] =
      queries.map(q => q._1 -> top10(q, cands.toSeq)).toMap

    // ---- hyperplane LSH: gate bits, sweeping bands (THE recall knob) ----
    val bits = VectorQueries.hpBitsFor(n)
    def sign(p: Int, pos: Int): Long = // THE engine family (md5-derived)
      org.apache.spark.sql.graft.HpSigns.sign(p, pos).toLong
    val cap = VectorQueries.HP_CAP
    def lshAt(bands: Int): (Double, Double) = {
      def buckets(v: Array[Long]): Array[(Int, Long)] =
        (0 until bands).map { b =>
          var bucket = 0L
          for (j <- 0 until bits) {
            val p = b * bits + j
            var s = 0L; var i = 0
            while (i < v.length) { s += v(i) * sign(p, i + 1); i += 1 }
            if (s >= 0) bucket |= (1L << j)
          }
          (b, bucket)
        }.toArray
      val byBucket = cands.flatMap { c =>
        buckets(c._2).map { case (b, bk) => ((b, bk), c) } }.groupBy(_._1)
      // the gate's deterministic hash-sample cap, bucket-local
      val capped: Map[(Int, Long), Array[Vec]] =
        byBucket.map { case (k @ (b, bk), ms) =>
          val cnt = ms.length.toLong
          k -> ms.map(_._2).filter { case (id, _) =>
            val h = (1103515245L * ((id * 131L + b.toLong * 31L + bk) % 1048576L)
              + 12345L) % 2147483648L
            cnt <= cap || h % cnt < cap
          }
        }
      val per = queries.map { q =>
        val cs = buckets(q._2).flatMap(k => capped.getOrElse(k, Array.empty))
          .distinct
        val got = top10(q, cs.toSeq)
        (got.intersect(exact(q._1)).size / 10.0, cs.length.toDouble / cands.length)
      }
      (per.map(_._1).sum / per.length, per.map(_._2).sum / per.length)
    }
    val lshSweep = lshBands.map(b => b -> lshAt(b))

    // ---- IVF, gate parameters (quantizer depth = ivfIters) --------------
    val k = VectorQueries.ivfKFor(cands.length)
    val cTrained = kmeansLocal(cands, k, ivfIters)
    val aT: Map[Long, Seq[Vec]] = {
      val cn = cTrained.map { case (c, v) => c -> math.sqrt(dot(v, v).toDouble) }.toMap
      cands.groupBy { c =>
        cTrained.map { case (ci, cv) =>
          (dot(c._2, cv).toDouble / (norm(c._1) * cn(ci)), -ci) }.max match {
          case (_, nc) => -nc
        }
      }.map { case (ci, ms) => ci -> ms.toSeq }
    }
    val cTn = cTrained.map { case (c, v) => c -> math.sqrt(dot(v, v).toDouble) }.toMap
    def ivfAt(nprobe: Int): (Double, Double) = {
      val per = queries.map { q =>
        val probed = cTrained.map { case (ci, cv) =>
          (dot(q._2, cv).toDouble / (norm(q._1) * cTn(ci)), ci) }
          .sortBy { case (c, ci) => (-c, ci) }.take(nprobe).map(_._2)
        val cs = probed.flatMap(ci => aT.getOrElse(ci, Nil))
        val got = top10(q, cs)
        (got.intersect(exact(q._1)).size / 10.0, cs.length.toDouble / cands.length)
      }
      (per.map(_._1).sum / per.length, per.map(_._2).sum / per.length)
    }
    val ivfSweep = ivfProbes.map(p => p -> ivfAt(p))

    Report(n, queries.length, bits, cap, k, lshSweep.map { case (b, (r, f)) => Sweep(b, r, f) },
      ivfSweep.map { case (p, (r, f)) => Sweep(p, r, f) })
  }

  def main(args: Array[String]): Unit = {
    val mode = if (args.contains("--clustered")) "clustered" else "uniform"
    val trainedIters = 10
    if (mode == "clustered") {
      val rep = measure(clusteredFixture())
      println(s"""{"fixture":"clustered","ivf_iters":1,${rep.json.drop(1)}""")
      val repT = measure(clusteredFixture(), ivfIters = trainedIters)
      println(s"""{"fixture":"clustered","ivf_iters":$trainedIters,${repT.json.drop(1)}""")
      return
    }
    val dir = args.headOption.filterNot(_.startsWith("--"))
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-ann-recall")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(cast(embedding as array<double>), x -> cast(floor(x * 1000) as bigint))")
          .as("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val rep = measure(rows)
    println(s"""{"fixture":"uniform","ivf_iters":1,${rep.json.drop(1)}""")
    val repT = measure(rows, ivfIters = trainedIters)
    println(s"""{"fixture":"uniform","ivf_iters":$trainedIters,${repT.json.drop(1)}""")
    spark.stop()
  }
}
