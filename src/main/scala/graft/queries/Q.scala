package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One gate entry: a Spark program + (optionally) its DuckDB oracle SQL.
  * Column names/types MUST match between the two — the driver sorts columns
  * by name and hashes values. */
case class Q(name: String, fn: (SparkSession, String) => DataFrame, sql: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The synthetic frontier derived deterministically from `documents` —
    * the shared fixture for the scheduler-operator oracles. The DuckDB
    * twin is [[FRONTIER_SQL]]; keep the two in EXACT sync. */
  def frontier(s: SparkSession, dir: String): DataFrame = {
    val host = concat(lit("site"), (col("doc_id") % 37).cast("string"), lit(".example"))
    val url = concat(lit("http://"), host, lit("/p/"), col("doc_id").cast("string"))
    table(s, dir, "documents").select(
      col("doc_id"),
      host.as("host"),
      url.as("url"),
      md5(url).as("taskid"),
      concat(lit("p"), (col("doc_id") % 3).cast("string")).as("project"),
      (lit(1) + col("doc_id") % 4).cast("long").as("status"),
      (col("doc_id") % 7).cast("long").as("depth"),
      (col("doc_id") % 5).cast("long").as("priority"),
      (col("doc_id") % 97).cast("long").as("exetime"),
      when(col("doc_id") % 3 === 0, -1L).otherwise(60L).as("age"),
      (col("doc_id") % 6).cast("long").as("retried"),
      (col("doc_id") % 53).cast("long").as("lastcrawltime"),
      (col("doc_id") % 13 === 0).as("force_update"),
      when(col("doc_id") % 4 === 0, lit("v2")).otherwise(lit("v1")).as("itag"))
  }

  val FRONTIER_SQL: String =
    """WITH frontier AS (
      |  SELECT doc_id,
      |         'site' || CAST(doc_id % 37 AS VARCHAR) || '.example' AS host,
      |         'http://site' || CAST(doc_id % 37 AS VARCHAR) || '.example/p/' || CAST(doc_id AS VARCHAR) AS url,
      |         md5('http://site' || CAST(doc_id % 37 AS VARCHAR) || '.example/p/' || CAST(doc_id AS VARCHAR)) AS taskid,
      |         'p' || CAST(doc_id % 3 AS VARCHAR) AS project,
      |         CAST(1 + (doc_id % 4) AS BIGINT) AS status,
      |         CAST(doc_id % 7 AS BIGINT) AS depth,
      |         CAST(doc_id % 5 AS BIGINT) AS priority,
      |         CAST(doc_id % 97 AS BIGINT) AS exetime,
      |         CAST(CASE WHEN doc_id % 3 = 0 THEN -1 ELSE 60 END AS BIGINT) AS age,
      |         CAST(doc_id % 6 AS BIGINT) AS retried,
      |         CAST(doc_id % 53 AS BIGINT) AS lastcrawltime,
      |         (doc_id % 13 = 0) AS force_update,
      |         CASE WHEN doc_id % 4 = 0 THEN 'v2' ELSE 'v1' END AS itag
      |  FROM documents
      |)""".stripMargin
}
