package graft

import graft.sources.{FleetLog, SnapshotLog}
import graft.streaming.CdcStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Cross-table consistent fleet runs: a run manifest pins every table's
  * batch-K snapshot-log version atomically — a partially-failed fleet
  * run is never visible, and readers joining across tables always see
  * ONE run's versions. */
class FleetLogSpec extends AnyFunSuite with SparkFixture {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("status", StringType),
    StructField("amount", DoubleType)))

  private def writeExtract(dir: java.nio.file.Path, name: String,
                           body: String): String = {
    val p = dir.resolve(name)
    Files.writeString(p, body)
    p.toString
  }

  private def cfg(work: java.nio.file.Path, table: String,
                  extract: String): PipelineConfig =
    PipelineConfig(extract, "csv", schema,
      keyCols = Seq("k"), valueCols = Seq("status", "amount"),
      stateDir = s"$work/state/$table", logDir = Some(s"$work/log/$table"))

  test("complete fleet run commits atomically; incomplete run stays invisible until healed") {
    val work = Files.createTempDirectory("fleet")
    val fleetDir = s"$work/fleet"
    val b0 = "k,status,amount\n1,O,10.0\n2,O,20.0\n"
    val tables = Seq("alpha", "beta", "gamma")
    val cfgs0 = tables.map(t =>
      cfg(work, t, writeExtract(work, s"$t-0.csv", b0)))

    // batch 0: all three merge → run 0 commits
    val (res0, ok0) = Pipeline.runFleet(spark, cfgs0, 0L, fleetDir)
    assert(res0.values.forall(_.isRight))
    assert(ok0 && FleetLog.latestRun(spark, fleetDir) === Some(0L))
    val run0 = FleetLog.readRun(spark, fleetDir, 0L)
    assert(run0.keySet === cfgs0.map(_.stateDir).toSet)
    run0.values.foreach(df => assert(df.count() === 2))

    // batch 1: beta's extract is missing → its merge fails, the fleet
    // run must NOT become visible even though alpha/gamma advanced
    val b1 = "k,status,amount\n1,O,10.0\n2,F,25.0\n3,O,30.0\n"
    val cfgs1 = tables.map { t =>
      val path = if (t == "beta") s"$work/missing-$t.csv"
                 else writeExtract(work, s"$t-1.csv", b1)
      cfg(work, t, path)
    }
    val (res1, ok1) = Pipeline.runFleet(spark, cfgs1, 1L, fleetDir)
    assert(res1(cfg(work, "beta", "x").stateDir).isLeft)
    assert(!ok1 && FleetLog.latestRun(spark, fleetDir) === Some(0L))

    // the consistent view still serves run 0 for EVERY table — alpha's
    // live state has 3 rows, but the pinned run-0 read has 2
    val alphaDir = cfg(work, "alpha", "x").stateDir
    assert(CdcStream.currentState(spark, alphaDir).get.count() === 3)
    val run0Again = FleetLog.readRun(spark, fleetDir, 0L)
    assert(run0Again.values.forall(_.count() === 2))

    // heal beta alone and retry the run commit: run 1 appears and every
    // table reads its batch-1 state
    Pipeline.run(spark,
      cfg(work, "beta", writeExtract(work, "beta-1.csv", b1)), 1L)
    assert(FleetLog.commitRun(spark, fleetDir, 1L,
      cfgs1.map(c => c.stateDir -> c.logDir.get).toMap))
    assert(FleetLog.latestRun(spark, fleetDir) === Some(1L))
    val run1 = FleetLog.readRun(spark, fleetDir, 1L)
    run1.foreach { case (state, df) =>
      val asOf = CdcStream.stateAsOfBatch(spark,
        state.replace("/state/", "/log/"), 1L).get
      // stateAsOfBatch drops the internal hash columns; align and compare
      val bare = df.drop(cdc.CdcMerge.KeyHash, cdc.CdcMerge.NonKeyHash)
      assert(bare.orderBy("k").collect().toSeq
        === asOf.orderBy("k").collect().toSeq)
      assert(df.filter(col("k") === 3).count() === 1)
    }

    // replaying a committed run is a no-op
    val before = FleetLog.runs(spark, fleetDir)
    assert(FleetLog.commitRun(spark, fleetDir, 1L,
      cfgs1.map(c => c.stateDir -> c.logDir.get).toMap))
    assert(FleetLog.runs(spark, fleetDir) === before)
  }

  test("vacuumFleet drops old runs first, then prunes member logs to the retained floor") {
    val work = Files.createTempDirectory("fleet_vac")
    val fleetDir = s"$work/fleet"
    val tables = Seq("a", "b")
    def batch(i: Int, rows: String): Unit = {
      val cfgs = tables.map(t =>
        cfg(work, t, writeExtract(work, s"$t-$i.csv", rows)))
      val (res, ok) = Pipeline.runFleet(spark, cfgs, i.toLong, fleetDir)
      assert(res.values.forall(_.isRight) && ok)
    }
    batch(0, "k,status,amount\n1,O,10.0\n")
    batch(1, "k,status,amount\n1,O,10.0\n2,O,20.0\n")
    batch(2, "k,status,amount\n2,F,25.0\n")
    assert(FleetLog.runs(spark, fleetDir) === Seq(0L, 1L, 2L))

    FleetLog.vacuumFleet(spark, fleetDir, keepRuns = 2)
    assert(FleetLog.runs(spark, fleetDir) === Seq(1L, 2L))
    // retained runs still read consistently
    assert(FleetLog.readRun(spark, fleetDir, 1L).values
      .forall(_.count() === 2))
    assert(FleetLog.readRun(spark, fleetDir, 2L).values
      .forall(_.count() === 1)) // k=1 deleted by the full-extract merge
    // member logs kept at least the retained floor (batch-1 versions)
    tables.foreach { t =>
      val logDir = s"$work/log/$t"
      assert(SnapshotLog.versionOfBatch(spark, logDir, 1L).isDefined)
    }
  }

  test("runFleet refuses a fleet with unlogged tables") {
    val work = Files.createTempDirectory("fleet_bad")
    val c = cfg(work, "t",
      writeExtract(work, "t.csv", "k,status,amount\n1,O,1.0\n"))
      .copy(logDir = None)
    val e = intercept[IllegalArgumentException](
      Pipeline.runFleet(spark, Seq(c), 0L, s"$work/fleet"))
    assert(e.getMessage.contains("log_dir"))
  }
}
