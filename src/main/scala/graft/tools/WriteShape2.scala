package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev microbench (not part of the driver contract): the explosion-round
  * live materialization, measured on REAL 1×4 / 4×4 worker clusters (the
  * single-JVM WriteShape lied about cross-JVM exchange — BENCH/BASELINE.md
  * "Round-3 (late)"). Run F phase data shows writeLive is the round's
  * non-scaling term (r2 20.8s N → 15.8s 4N for 216k rows), so this probe
  * decomposes one materialization into write / manifest(footers) / pruned
  * read for three layouts:
  *   partBy — map-side partitionBy("__bucket")  (tasks × buckets files)
  *   plain  — one dir, sortWithinPartitions(__bucket, exetime) (tasks files;
  *            bucket reads rely on row-group min/max pruning)
  *   repart — repartition(b, __bucket) + partitionBy (b files, 1 exchange)
  * GRAFT_WORKERS=1|4 picks the cluster size. */
object WriteShape2 {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 1_500_000L
    val b = if (args.length > 1) args(1).toInt else 32
    val upParts = if (args.length > 2) args(2).toInt else 64
    val workers = sys.env.getOrElse("GRAFT_WORKERS", "1").toInt
    ClusterHarness.withCluster(workers, coresPerWorker = 4, executorMemGb = 10,
      appName = s"graft-ws2-${workers}x4",
      _.config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")) { spark =>
      spark.sparkContext.setLogLevel("ERROR")
      run(spark, rows, b, upParts, workers)
    }
  }

  private def run(spark: SparkSession, rows: Long, b: Int, upParts: Int,
                  workers: Int): Unit = {
    // live-shaped rows: ~40 fields in the real Task; approximate the byte
    // width with a url + a few long/string cols so encode/IO cost is honest
    val live = spark.range(0, rows, 1, upParts).select(
      md5(concat(lit("t"), col("id"))).as("taskid"),
      lit("p").as("project"),
      concat(lit("http://host"), (col("id") % 64), lit(".example/path/"),
        col("id")).as("url"),
      lit(1).as("status"),
      (rand(7) * 1e9).as("exetime"),
      repeat(lit("x"), 160).as("payload"))
      .withColumn("__bucket", pmod(hash(col("taskid")), lit(b)))
    live.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    live.count()

    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(hconf)
    def countFiles(dir: String): Int = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    // the store's manifest pass: per-bucket footer-exact row counts
    def footers(dir: String, partitioned: Boolean): Long = {
      def rowsOf(d: org.apache.hadoop.fs.Path): Long =
        fs.listStatus(d).filter(_.getPath.getName.endsWith(".parquet")).map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, hconf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRecordCount finally r.close()
        }.sum
      if (partitioned)
        (0 until b).map(i => rowsOf(new org.apache.hadoop.fs.Path(s"$dir/__bucket=$i"))).sum
      else rowsOf(new org.apache.hadoop.fs.Path(dir))
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val base = "/dev/shm/graft_ws2"
    def bucketRead(dir: String): Double = {
      // MOR/pruned-merge read shape: 3 buckets of the base snapshot. The
      // SAME isin expression serves both layouts on purpose — the layouts
      // differ in what Spark does with it (partition-dir pruning vs
      // row-group min/max on the __bucket-sorted files), not in reader code
      // (ADVICE r3: the old partitioned/plain conditional had identical
      // branches — dead).
      val sel = Seq(1, 7, 23).filter(_ < b)
      timed {
        spark.read.parquet(dir)
          .filter(col("__bucket").isin(sel.map(Integer.valueOf): _*))
          .count()
      }
    }
    def dueRead(dir: String): Double =
      timed(spark.read.parquet(dir).filter(col("exetime") <= 5e7).count())

    for (round <- 1 to 2) {
      val res = Seq(
        ("partBy", s"$base/a", true, () => live
          .sortWithinPartitions(col("__bucket"), col("exetime"))
          .write.mode(SaveMode.Overwrite).partitionBy("__bucket").parquet(s"$base/a")),
        ("plain", s"$base/b", false, () => live
          .sortWithinPartitions(col("__bucket"), col("exetime"))
          .write.mode(SaveMode.Overwrite).parquet(s"$base/b")),
        ("repart", s"$base/c", true, () => live.repartition(b, col("__bucket"))
          .sortWithinPartitions(col("__bucket"), col("exetime"))
          .write.mode(SaveMode.Overwrite).partitionBy("__bucket").parquet(s"$base/c"))
      ).map { case (name, dir, part, w) =>
        val tW = timed(w())
        val tF = timed(footers(dir, part))
        val tB = bucketRead(dir)
        val tD = dueRead(dir)
        f"$name: write=$tW%5.1fs files=${countFiles(dir)}%5d manifest=$tF%5.2fs bucketRead=$tB%5.2fs dueRead=$tD%5.2fs"
      }
      println(s"[${workers}x4 round=$round rows=$rows b=$b up=$upParts]\n  " +
        res.mkString("\n  "))
    }
  }
}
