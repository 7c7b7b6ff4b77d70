package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.store.SnapshotStore

/** Crash-safety of `SnapshotStore.vacuum()`: the delete→rename swap of a
  * round dir must never lose rows, whichever instant the process dies at.
  * Three torn states are reconstructed on disk and vacuum() must heal each:
  *  A. crash between `fs.delete(round)` and the rename — only the staged
  *     `.__vac` copy exists → it is promoted;
  *  B. crash mid-write of the staged copy (no _SUCCESS) — original intact
  *     → the torn staging dir is discarded;
  *  C. crash between a completed staged write and the delete — both exist
  *     → the swap completes (the staged dir is the filtered copy). */
class VacuumRecoverySpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkTestBase.spark
  import spark.implicits._

  private def mkStore(): SnapshotStore =
    new SnapshotStore(Files.createTempDirectory("graft_vac").toString)

  private def resultsDF(rows: (String, String)*) =
    rows.toSeq.toDF("project", "taskid")

  private def commitRound(store: SnapshotStore, n: Long,
                          rows: (String, String)*): Unit = {
    store.appendResults(n, resultsDF(rows: _*))
    store.commit(n, n * 30.0, 0, 0, 0, rows.size, 0, Nil)
  }

  private def fs(store: SnapshotStore) =
    new Path(store.root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("A: staged copy promoted when the original was already deleted") {
    val store = mkStore()
    commitRound(store, 0, "keep" -> "a", "dead" -> "b")
    val d = s"${store.root}/results/round=0"
    // the crashed vacuum had finished the filtered write and the delete
    resultsDF("keep" -> "a").write.parquet(s"$d.__vac")
    fs(store).delete(new Path(d), true)
    store.vacuum() // no tombstones: recovery sweep only
    assert(store.readResults().as[(String, String)].collect().toSet ===
      Set("keep" -> "a"))
    assert(!fs(store).exists(new Path(s"$d.__vac")))
  }

  test("B: torn staged write (no _SUCCESS) discarded, original kept") {
    val store = mkStore()
    commitRound(store, 0, "keep" -> "a", "dead" -> "b")
    val d = s"${store.root}/results/round=0"
    resultsDF("keep" -> "a").write.parquet(s"$d.__vac")
    fs(store).delete(new Path(s"$d.__vac/_SUCCESS"), false) // torn write
    store.vacuum()
    assert(store.readResults().as[(String, String)].collect().toSet ===
      Set("keep" -> "a", "dead" -> "b"))
    assert(!fs(store).exists(new Path(s"$d.__vac")))
  }

  test("C: completed staged write + original present → swap completes") {
    val store = mkStore()
    commitRound(store, 0, "keep" -> "a", "dead" -> "b")
    val d = s"${store.root}/results/round=0"
    resultsDF("keep" -> "a").write.parquet(s"$d.__vac")
    store.vacuum()
    assert(store.readResults().as[(String, String)].collect().toSet ===
      Set("keep" -> "a"))
    assert(!fs(store).exists(new Path(s"$d.__vac")))
  }
}
