package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (spark guide: one per suite). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the suite runs hundreds of engine rounds (thousands of SQL
      // executions) in ONE JVM: the status/SQL listeners' default retention
      // (1000 executions × full plan graphs, 100k tasks) grows to GBs and
      // GC-walls the run — cap them hard, nothing in the tests reads them
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.appStateStore.asyncTracking.enable", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
