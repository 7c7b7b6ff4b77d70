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
  * hyperplane bands with the HP_CAP hash-sample cap; ivfKFor lists with
  * NPROBE=4), ranks by exact cosine, and reports
  *   recall@10   = |top10_retrieved ∩ top10_exact| / 10, averaged
  *   cand_frac   = mean |candidates(q)| / nCand  (the work saved)
  * All arithmetic mirrors the quantized-integer protocol (floor(x*1000)
  * longs), so the numbers are deterministic. Small fixtures → computed
  * driver-side; the measured quantity is a property of the ALGORITHM
  * parameters, not the execution plan (which the gates already verify). */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      .sortBy(_._1)
    val queries = rows.filter(_._1 < 100)
    val cands = rows.filter(_._1 >= 100)
    val n = rows.length.toLong

    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val norm: Map[Long, Double] =
      rows.map { case (id, v) => id -> math.sqrt(dot(v, v).toDouble) }.toMap
    def cos(a: (Long, Array[Long]), b: (Long, Array[Long])): Double =
      dot(a._2, b._2).toDouble / (norm(a._1) * norm(b._1))

    def top10(q: (Long, Array[Long]), pool: Seq[(Long, Array[Long])]): Set[Long] =
      pool.map(c => (cos(q, c), c._1)).sortBy { case (c, id) => (-c, id) }
        .take(10).map(_._2).toSet

    val exact: Map[Long, Set[Long]] =
      queries.map(q => q._1 -> top10(q, cands.toSeq)).toMap

    // ---- hyperplane LSH: gate bits, sweeping bands (THE recall knob) ----
    val bits = VectorQueries.hpBitsFor(n)
    def sign(p: Int, pos: Int): Long = {
      val draw = (1103515245L * (p * 4096L + pos) + 12345L) % 2147483648L
      if ((draw / 32768L) % 2L == 0L) 1L else -1L
    }
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
      val capped: Map[(Int, Long), Array[(Long, Array[Long])]] =
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
    val lshSweep = Seq(4, 8, 16).map(b => b -> lshAt(b))

    // ---- IVF, gate parameters ------------------------------------------
    val k = VectorQueries.ivfKFor(cands.length)
    val c0 = cands.take(k).zipWithIndex.map { case ((_, v), i) => (i, v) }
    def assign(cents: Seq[(Int, Array[Long])]): Map[Int, Seq[(Long, Array[Long])]] = {
      val cn = cents.map { case (i, v) => i -> math.sqrt(dot(v, v).toDouble) }.toMap
      cands.groupBy { c =>
        cents.map { case (i, cv) =>
          (dot(c._2, cv).toDouble / (norm(c._1) * cn(i)), -i) }.max match {
          case (_, ni) => -ni
        }
      }.map { case (i, ms) => i -> ms.toSeq }
    }
    val a0 = assign(c0.toSeq)
    val c1 = a0.map { case (i, ms) =>
      val s = new Array[Long](ms.head._2.length)
      ms.foreach { case (_, v) => var j = 0; while (j < v.length) { s(j) += v(j); j += 1 } }
      (i, s)
    }.toSeq
    val a1 = assign(c1)
    val c1n = c1.map { case (i, v) => i -> math.sqrt(dot(v, v).toDouble) }.toMap
    def ivfAt(nprobe: Int): (Double, Double) = {
      val per = queries.map { q =>
        val probed = c1.map { case (i, cv) =>
          (dot(q._2, cv).toDouble / (norm(q._1) * c1n(i)), i) }
          .sortBy { case (c, i) => (-c, i) }.take(nprobe).map(_._2)
        val cs = probed.flatMap(i => a1.getOrElse(i, Nil))
        val got = top10(q, cs)
        (got.intersect(exact(q._1)).size / 10.0, cs.length.toDouble / cands.length)
      }
      (per.map(_._1).sum / per.length, per.map(_._2).sum / per.length)
    }
    val ivfSweep = Seq(4, 8, 16).map(p => p -> ivfAt(p))

    def row(kv: (Int, (Double, Double))): String =
      f"""{"knob":${kv._1},"recall10":${kv._2._1}%.3f,"cand_frac":${kv._2._2}%.4f}"""
    println(s"""{"n":$n,"queries":${queries.length},"lsh_bits":$bits,"lsh_cap":$cap,"ivf_k":$k,""" +
      s""""lsh_by_bands":[${lshSweep.map(row).mkString(",")}],""" +
      s""""ivf_by_nprobe":[${ivfSweep.map(row).mkString(",")}]}""")
    spark.stop()
  }
}
