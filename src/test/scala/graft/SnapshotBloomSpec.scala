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

  test("a COW rewrite keeps CARRIED files' blooms; only the rewritten file is conservative (r9)") {
    val (dir, _) = mkLog()
    SnapshotLog.analyzeBlooms(spark, dir, Seq("id"), expectedItems = 1000)
    SnapshotLog.deleteWhere(spark, dir, col("id") === 3L)
    // carried files' blooms propagate to the new version — a probe into
    // a carried file still skips the other carried files; only the
    // rewritten (bloom-less) file is conservatively kept
    val (got, scanned, total) = SnapshotLog.readPoint(spark, dir, "id", 5L)
    assert(scanned < total,
      s"carried blooms did not propagate: scanned $scanned/$total")
    assert(got.count() === 1)
    // the PRIOR version's sidecar still serves time travel
    val vs = SnapshotLog.versions(spark, dir)
    val (old, oldScanned, oldTotal) =
      SnapshotLog.readPoint(spark, dir, "id", 5L, Some(vs.head))
    assert(oldScanned < oldTotal && old.count() === 1)
  }

  test("appends and MoR deletes carry the WHOLE sidecar forward (r9)") {
    import spark.implicits._
    val (dir, _) = mkLog()
    SnapshotLog.analyzeBlooms(spark, dir, Seq("id"), expectedItems = 1000)
    // an append changes no existing file: every bloom stays live
    SnapshotLog.commitBatch(spark, dir,
      Seq((5000L, 1L)).toDF("id", "grp"), batchId = 1L)
    val (a, sA, tA) = SnapshotLog.readPoint(spark, dir, "id", 5L)
    assert(sA < tA, s"append invalidated blooms: $sA/$tA")
    assert(a.count() === 1)
    // a MoR delete rewrites nothing: blooms stay live AND the dead row
    // stays dead through the pruned read
    SnapshotLog.deleteWhereMoR(spark, dir, col("id") === 5L)
    val (m, sM, tM) = SnapshotLog.readPoint(spark, dir, "id", 5L)
    assert(sM < tM, s"MoR delete invalidated blooms: $sM/$tM")
    assert(m.count() === 0, "bloom-pruned read resurrected a MoR-dead row")
    // another live key still resolves through the carried sidecar
    val (l, sL, _) = SnapshotLog.readPoint(spark, dir, "id", 6L)
    assert(sL < tM && l.count() === 1)
    // a replace drops lineage: fresh files share nothing — no sidecar
    SnapshotLog.commit(spark, dir, Seq((1L, 1L)).toDF("id", "grp"))
    val (_, sR, tR) = SnapshotLog.readPoint(spark, dir, "id", 1L)
    assert(sR === tR, "a replace must not inherit unrelated blooms")
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
