package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: time the emb_neardup_hp pipeline stage by stage to locate
  * where the wall-clock goes at a given SF. */
object NeardupDissect {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[$label] $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    import graft.queries.VectorQueries._
    val dir = sfDir
    time("full emb_neardup_hp")(graft.SparkEntry.queries("emb_neardup_hp")(spark, dir))
    time("full again")(graft.SparkEntry.queries("emb_neardup_hp")(spark, dir))
    time("buckets (ann_lsh_hyperplane)")(graft.SparkEntry.queries("ann_lsh_hyperplane")(spark, dir))
    val bits = hpBitsFor(2000)
    time("capped")(debugCapped(spark, dir, HP_BANDS, bits))
    time("withq")(debugWithq(spark, dir, HP_BANDS, bits))
    time("pairs-nocosine")(debugPairs(spark, dir, HP_BANDS, bits, withCosine = false))
    time("pairs-cosine")(debugPairs(spark, dir, HP_BANDS, bits, withCosine = true))
    time("pairs+agg")(debugPairs(spark, dir, HP_BANDS, bits, withCosine = true)
      .groupBy("id_a", "id_b").agg(min("cosine").as("cosine")))
    time("full 3rd")(graft.SparkEntry.queries("emb_neardup_hp")(spark, dir))
    spark.stop()
  }
}
