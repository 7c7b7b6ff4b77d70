package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev microbench (not part of the driver contract): full-rewrite live
  * materialization shape. Compares the map-side `partitionBy` write (each
  * upstream task emits one file per bucket it contains → O(tasks × buckets)
  * small files) against a repartition-by-bucket write (one shuffle, exactly
  * one file per bucket), including the cost of reading each layout back
  * with the due filter. Decides writeLiveBucketed's full-rewrite path. */
object WriteShape {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 5_000_000L
    val b = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft_ws_local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // live-shaped rows, ~64 shuffle-map partitions upstream like a merge leg
    val live = spark.range(0, rows, 1, 64).select(
      md5(concat(lit("t"), col("id"))).as("taskid"),
      lit("p").as("project"),
      concat(lit("http://h"), (col("id") % 64), lit("/"), col("id")).as("url"),
      lit(1).as("status"),
      (rand(7) * 1e9).as("exetime"))
      .withColumn("__bucket", pmod(hash(col("taskid")), lit(b)))

    def countFiles(dir: String): Int = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def write(df: DataFrame, dir: String): Double =
      timed(df.write.mode(SaveMode.Overwrite).partitionBy("__bucket").parquet(dir))._2
    def readDue(dir: String): Double = timed(
      spark.read.parquet(dir).filter(col("exetime") <= 5e7).count())._2

    val base = "/dev/shm/graft_ws"
    for (round <- 1 to 2) { // round 1 warms codegen/JIT; report round 2
      val tA = write(live.sortWithinPartitions(col("__bucket"), col("exetime")), s"$base/a")
      val tB = write(live.repartition(b, col("__bucket"))
        .sortWithinPartitions(col("__bucket"), col("exetime")), s"$base/b")
      val rA = readDue(s"$base/a"); val rB = readDue(s"$base/b")
      println(f"round=$round rows=$rows buckets=$b | mapSide: write=$tA%.1fs files=${countFiles(s"$base/a")} readDue=$rA%.1fs | repart: write=$tB%.1fs files=${countFiles(s"$base/b")} readDue=$rB%.1fs")
    }
    spark.stop()
  }
}
