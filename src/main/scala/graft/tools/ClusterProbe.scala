package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.CorpusGen

/** Throwaway dev probe: isolate cluster-vs-local per-op cost. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
    sys.env.get("GRAFT_MASTER").foreach { _ =>
      b.config("spark.executor.cores", "4").config("spark.executor.memory", "10g")
      // system-classpath, NOT spark.jars: typed-API lambdas deserialized via
      // the url-classloader hit SerializedLambda ClassCastExceptions
      sys.env.get("GRAFT_JAR").foreach(j =>
        b.config("spark.executor.extraClassPath", j))
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  ($r)")
    }
    val corpus = CorpusGen.generate(spark, 200000, 64, 42L, 64).cache()
    timed("corpus cache+count")(corpus.count())
    timed("corpus count (cached)")(corpus.count())
    timed("corpus agg strlen")(corpus.agg(sum(length(col("text")))).head().getLong(0))
    val probe = spark.range(4000)
      .select(concat(lit("http://site0.example/p/"), col("id")).as("__sel_url"))
    timed("bcast join probe")(
      corpus.join(broadcast(probe), col("url") === col("__sel_url")).count())
    timed("bcast join probe 2")(
      corpus.join(broadcast(probe), col("url") === col("__sel_url")).count())
    val decoded = corpus.toDF()
      .join(broadcast(probe), col("url") === col("__sel_url"))
      .drop("__sel_url")
      .as[graft.model.Page]
      .map(p => graft.process.HtmlLite.decodeAuto(p.html)._1.length)
    timed("decode typed map")(decoded.reduce(_ + _))
    timed("shuffle groupBy")(
      corpus.groupBy(substring(col("url"), 1, 18)).count().count())
    timed("write parquet")(corpus.limit(50000).write.mode("overwrite")
      .parquet("/tmp/probe_out"))
    spark.stop()
  }
}
