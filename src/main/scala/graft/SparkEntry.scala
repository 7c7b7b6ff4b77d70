package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry pairs a Spark program with a DuckDB oracle (see graft.queries.Q);
  * the battery covers SURVEY §2's operator inventory plus the training-data
  * pipeline ops (dedup/minhash/simhash/ANN/text-analysis) and the end-to-end
  * crawl-engine BFS oracle. */
object SparkEntry {

  private val battery: Seq[Q] =
    CoreQueries.all ++ SchedulerQueries.all ++ UrlQueries.all ++
      TextQueries.all ++ VectorQueries.all ++ MultimodalQueries.all ++
      CrawlQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    battery.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    battery.flatMap(q => q.sql.map(sql => q.name -> sql)).toMap
}
