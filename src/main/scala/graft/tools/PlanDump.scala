package graft.tools

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for gate queries to files — the r06
  * optimization round's plan evidence (plans/r06/<query>_<tag>.txt).
  * args: <outDir> <tag> [query names...]; with no names, dumps every
  * declared query. Session config mirrors Bench.newLocalSession so the
  * recorded plans are the ones the bench times. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val pw = new PrintWriter(new File(outDir, s"${name}_$tag.txt"))
          try pw.println(plan) finally pw.close()
          println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
        case None => println(s"[plandump] UNKNOWN query $name")
      }
    }
    spark.stop()
  }
}
