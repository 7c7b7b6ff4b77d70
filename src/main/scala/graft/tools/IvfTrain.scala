package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.VectorQueries

/** Offline IVF quantizer trainer (VERDICT r4 item 4): deterministic k-means
  * over the quantized corpus — first-k-by-id seeding, exact integer Lloyd
  * steps (`VectorQueries.ivfAssign`/`ivfLloyd`: broadcast centroids,
  * map-side argmax, per-dim integer sums — order-independent, so the
  * centroids are bit-identical at any parallelism) — persisted as a
  * centroid parquet `(cid, c, cn2)` that `VectorQueries.annIvf(...,
  * centroidsDir = Some(path))` broadcasts at query time. This is the
  * production shape: train once offline, search everywhere; the in-query
  * 1-step quantizer remains the oracle-replayable gate path.
  *
  * Usage: IvfTrain [sfDir] [--iters N] [--out PATH]
  */
object IvfTrain {
  def main(args: Array[String]): Unit = {
    def opt(flag: String, dft: String): String = {
      val i = args.indexOf(flag)
      if (i >= 0 && i + 1 < args.length) args(i + 1) else dft
    }
    val dir = args.headOption.filterNot(_.startsWith("--"))
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val iters = opt("--iters", "10").toInt
    val out = opt("--out", s"/tmp/graft_ivf_centroids")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-ivf-train")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (_, cand) = VectorQueries.ivfInputs(spark, dir)
    val n = cand.count()
    val k = VectorQueries.ivfKFor(n)
    val cents = VectorQueries.ivfTrain(cand, k, iters)
    cents.write.mode(SaveMode.Overwrite).parquet(out)
    val lists = spark.read.parquet(out).count()
    println(s"""{"n":$n,"k":$k,"iters":$iters,"lists":$lists,"out":"$out"}""")
    spark.stop()
  }
}
