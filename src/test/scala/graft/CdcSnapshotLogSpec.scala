package graft

import graft.cdc.CdcConfig
import graft.sources.SnapshotLog
import graft.streaming.CdcStream
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The CDC pillar composed with the snapshot-log table format: every
  * merged generation is an atomic log version by REFERENCE (no second
  * copy), giving table-grain "state as of batch k" time travel, replay
  * no-ops, crash healing, and log-driven retention. */
class CdcSnapshotLogSpec extends AnyFunSuite with SparkFixture {

  private val cfg = CdcConfig(Seq("o_orderkey"),
    Seq("o_custkey", "o_orderstatus", "o_totalprice"))

  private def dirs() = (
    Files.createTempDirectory("cdclog_state").toString,
    Files.createTempDirectory("cdclog_log").toString + "/log")

  private def stateSet(df: org.apache.spark.sql.DataFrame): Set[Ord] = {
    import df.sparkSession.implicits._
    df.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[Ord].collect().toSet
  }

  test("state as of batch k equals the batch-k merge result; replay is a no-op") {
    import spark.implicits._
    val (stateDir, logDir) = dirs()
    val b0 = Seq(Ord(1, 10, "O", 100.0), Ord(2, 20, "O", 200.0)).toDF
    val b1 = Seq(Ord(1, 10, "F", 111.0), Ord(3, 30, "O", 300.0)).toDF // U1 D2 I3
    val b2 = Seq(Ord(1, 10, "F", 111.0), Ord(3, 30, "O", 300.0),
      Ord(4, 40, "O", 400.0)).toDF                                    // I4

    CdcStream.mergeBatch(b0, 0, cfg, stateDir, logDir = Some(logDir))
    CdcStream.mergeBatch(b1, 1, cfg, stateDir, logDir = Some(logDir))
    CdcStream.mergeBatch(b2, 2, cfg, stateDir, logDir = Some(logDir))

    // one log version per batch, each carrying its #batch header
    assert(SnapshotLog.versions(spark, logDir).size === 3)
    assert((0L to 2L).flatMap(SnapshotLog.versionOfBatch(spark, logDir, _))
      .size === 3)

    // table-grain time travel matches the raw generation read (stateAt)
    // AND the semantic expectation, at every batch
    val expect = Map(
      0L -> Set(Ord(1, 10, "O", 100.0), Ord(2, 20, "O", 200.0)),
      1L -> Set(Ord(1, 10, "F", 111.0), Ord(3, 30, "O", 300.0)),
      2L -> Set(Ord(1, 10, "F", 111.0), Ord(3, 30, "O", 300.0),
        Ord(4, 40, "O", 400.0)))
    (0L to 2L).foreach { k =>
      val logged = CdcStream.stateAsOfBatch(spark, logDir, k)
        .getOrElse(fail(s"no logged state for batch $k"))
      assert(stateSet(logged) === expect(k), s"batch $k")
      val raw = CdcStream.stateAt(spark, stateDir, k)
        .getOrElse(fail(s"no generation v$k"))
      assert(stateSet(logged) === stateSet(raw), s"batch $k log vs raw")
    }

    // at-least-once replay of the last batch: merge is skipped AND the
    // log grows no new version
    val vsBefore = SnapshotLog.versions(spark, logDir)
    CdcStream.mergeBatch(b2, 2, cfg, stateDir, logDir = Some(logDir))
    assert(SnapshotLog.versions(spark, logDir) === vsBefore)
    assert(stateSet(CdcStream.currentState(spark, stateDir).get) === expect(2L))
  }

  test("crash between merge and log commit heals on redelivery") {
    import spark.implicits._
    val (stateDir, logDir) = dirs()
    val b0 = Seq(Ord(1, 10, "O", 100.0)).toDF
    // merge lands but the log commit "crashes" (simulated: no logDir)
    CdcStream.mergeBatch(b0, 0, cfg, stateDir)
    assert(SnapshotLog.versions(spark, logDir).isEmpty)
    // foreachBatch redelivers batch 0: merge takes the replay path, and
    // the heal commit writes the missing log version
    CdcStream.mergeBatch(b0, 0, cfg, stateDir, logDir = Some(logDir))
    assert(SnapshotLog.versionOfBatch(spark, logDir, 0L).isDefined)
    assert(stateSet(CdcStream.stateAsOfBatch(spark, logDir, 0L).get)
      === Set(Ord(1, 10, "O", 100.0)))
  }

  test("expireLogged: log retention drives generation retention") {
    import spark.implicits._
    val (stateDir, logDir) = dirs()
    (0 to 3).foreach { i =>
      val rows = (0L to i.toLong).map(k => Ord(k, k * 10, "O", k * 1.5))
      CdcStream.mergeBatch(rows.toDF, i.toLong, cfg, stateDir,
        logDir = Some(logDir))
    }
    assert(SnapshotLog.versions(spark, logDir).size === 4)
    CdcStream.expireLogged(spark, stateDir, logDir, keepLast = 2)
    // log keeps 2 versions; their generations (v2, v3) survive on disk,
    // the unreferenced ones (v0, v1) are reclaimed
    assert(SnapshotLog.versions(spark, logDir).size === 2)
    assert(CdcStream.stateAsOfBatch(spark, logDir, 3L).isDefined)
    assert(CdcStream.stateAsOfBatch(spark, logDir, 2L).isDefined)
    assert(CdcStream.stateAsOfBatch(spark, logDir, 0L).isEmpty)
    assert(!new java.io.File(CdcStream.versionPath(stateDir, 0L)).exists())
    assert(!new java.io.File(CdcStream.versionPath(stateDir, 1L)).exists())
    // retained time travel still reads real data through the manifest
    assert(stateSet(CdcStream.stateAsOfBatch(spark, logDir, 2L).get).size === 3)
    // the live table keeps answering
    assert(stateSet(CdcStream.currentState(spark, stateDir).get).size === 4)
  }
}
