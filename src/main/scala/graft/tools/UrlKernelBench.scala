package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.url.UrlCanon

/** Micro-bench: the per-follow canonicalize+taskid scalar — boxed Scala UDF
  * vs the native StringKernels expressions (VERDICT r4 item 3). Bench
  * methodology per BENCH/BASELINE.md r4: two untimed primes, median of
  * three timed runs. Forces evaluation with a length-sum aggregate (no
  * collect of the payload). */
object UrlKernelBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-url-kernel-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // realistic follow-shaped URLs: mixed case, ports, %-escapes, spaces
    val urls = spark.range(n).select(concat(
      lit("http://Site"), (col("id") % 9973).cast("string"),
      lit(".example:80/a b/p%2Fq/item"), col("id").cast("string"),
      lit("?q=a%20space&page="), (col("id") % 50).cast("string"),
      lit("&empty=#frag")).as("u"))

    val canonUdf = udf((s: String) => UrlCanon.canonicalize(s))
    val md5Udf = udf((s: String) => UrlCanon.md5Hex(s))
    def viaUdf(df: DataFrame): DataFrame =
      df.select(canonUdf(col("u")).as("c"))
        .select(length(col("c")) + length(md5Udf(col("c"))) as "l")
    def viaNative(df: DataFrame): DataFrame = {
      val k = org.apache.spark.sql.graft.StringKernels
      df.select(k.canonicalizeUrl(col("u")).as("c"))
        .select(length(col("c")) + length(k.taskId(col("c"))) as "l")
    }

    def timeIt(mk: DataFrame => DataFrame): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk(urls).agg(sum("l")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      once(); once() // primes
      val xs = Seq(once(), once(), once()).sorted
      xs(1)
    }

    val tUdf = timeIt(viaUdf)
    val tNat = timeIt(viaNative)
    println(f"""{"n":$n,"udf_sec":$tUdf%.3f,"native_sec":$tNat%.3f,""" +
      f""""udf_rows_per_sec":${n / tUdf}%.0f,"native_rows_per_sec":${n / tNat}%.0f,""" +
      f""""speedup":${tUdf / tNat}%.2f}""")
    spark.stop()
  }
}
