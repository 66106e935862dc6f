package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Bloom sidecar point-lookup skipping ([[SnapshotLog.analyzeBlooms]] /
  * [[SnapshotLog.readPoint]]): exactness under pruning for present AND
  * absent probes (false positives may read extra files, never lose
  * rows), real pruning on a scattered-id layout, conservative full
  * planning without a sidecar, and retention cleanup. */
class SnapshotBloomSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def mkLog(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("bloom-log").toString
    // ids deliberately SCATTERED across 8 files (hash partitioning) so
    // zone maps could never prune a point probe — blooms are the only
    // planning-time signal
    val df = (0L until 4096L).map(i => (i, i * 37 % 64, s"v$i"))
      .toDF("id", "grp", "payload")
      .repartition(8, col("id"))
    SnapshotLog.commit(spark, dir, df)
    (dir, df)
  }

  test("present probes: pruned read == full filter, fewer files planned") {
    val (dir, df) = mkLog()
    SnapshotLog.analyzeBlooms(spark, dir, Seq("id"),
      expectedItems = 1000, fpp = 0.01)
    val probes = Seq(0L, 1L, 777L, 4095L, 2048L)
    probes.foreach { p =>
      val (got, scanned, total) = SnapshotLog.readPoint(spark, dir, "id", p)
      assert(total >= 4)
      assert(scanned < total, s"probe $p pruned nothing")
      val expect = df.filter(col("id") === p).collect().map(_.toSeq).toSet
      assert(got.collect().map(_.toSeq).toSet === expect)
      assert(got.count() === 1)
    }
  }

  test("absent probes: zero rows, exactness regardless of false positives") {
    val (dir, _) = mkLog()
    SnapshotLog.analyzeBlooms(spark, dir, Seq("id"),
      expectedItems = 1000, fpp = 0.01)
    (5000L to 5050L).foreach { p =>
      val (got, scanned, total) = SnapshotLog.readPoint(spark, dir, "id", p)
      assert(got.count() === 0, s"phantom rows for absent id $p")
      assert(scanned <= total)
    }
    // aggregate pruning power over the absent probes: a 1% fpp bloom
    // should plan (near) zero files for most of them
    val planned = (5000L to 5050L).map(p =>
      SnapshotLog.readPoint(spark, dir, "id", p)._2).sum
    assert(planned < 51 * 2, s"absent probes planned $planned files")
  }

  test("no sidecar: conservative full planning, still exact") {
    val (dir, df) = mkLog()
    val (got, scanned, total) = SnapshotLog.readPoint(spark, dir, "id", 7L)
    assert(scanned === total)
    assert(got.collect().map(_.toSeq).toSet ===
      df.filter(col("id") === 7L).collect().map(_.toSeq).toSet)
  }

  test("a COW rewrite degrades to conservative planning until re-analyzed") {
    val (dir, _) = mkLog()
    SnapshotLog.analyzeBlooms(spark, dir, Seq("id"), expectedItems = 1000)
    SnapshotLog.deleteWhere(spark, dir, col("id") === 3L)
    // the new version has no sidecar — full planning, exact rows
    val (got, scanned, total) = SnapshotLog.readPoint(spark, dir, "id", 5L)
    assert(scanned === total)
    assert(got.count() === 1)
    // the PRIOR version's sidecar still serves time travel
    val vs = SnapshotLog.versions(spark, dir)
    val (old, oldScanned, oldTotal) =
      SnapshotLog.readPoint(spark, dir, "id", 5L, Some(vs.head))
    assert(oldScanned < oldTotal && old.count() === 1)
  }

  test("vacuum reclaims dropped versions' bloom sidecars") {
    val (dir, df) = mkLog()
    SnapshotLog.analyzeBlooms(spark, dir, Seq("id"), expectedItems = 1000)
    SnapshotLog.commit(spark, dir, df.limit(10)) // v2 replaces
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecar = new org.apache.hadoop.fs.Path(dir, "_log/blooms/v1.parquet")
    assert(f.exists(sidecar))
    SnapshotLog.vacuum(spark, dir, keepLast = 1)
    assert(!f.exists(sidecar), "dropped version's sidecar survived vacuum")
  }
}
