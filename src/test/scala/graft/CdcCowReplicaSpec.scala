package graft

import graft.cdc.CdcConfig
import graft.sources.SnapshotLog
import graft.streaming.CdcStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The change feed driving a copy-on-write snapshot-log replica
  * ([[CdcStream.applyFeedToCowLog]]): per-batch writes proportional to
  * the churn's file footprint instead of the full state rewrite the
  * bucketed merge pays — the sparse-CDC regime at 100 TB. Laws: replica
  * == state batch over batch, catch-up applies only pending batches,
  * replays are no-ops, and a sparse batch after key-clustered
  * compaction rewrites only the files holding a changed key. */
class CdcCowReplicaSpec extends AnyFunSuite with SparkFixture {

  private val cfg = CdcConfig(Seq("o_orderkey"),
    Seq("o_custkey", "o_orderstatus", "o_totalprice"))

  private def dirs() = (
    Files.createTempDirectory("cow_state").toString,
    Files.createTempDirectory("cow_log").toString + "/log")

  private def stateSet(df: org.apache.spark.sql.DataFrame): Set[Ord] = {
    import df.sparkSession.implicits._
    df.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[Ord].collect().toSet
  }

  private def baseOrders(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => Ord(i.toLong, i.toLong % 37, "O", i * 10.0)).toDF
  }

  test("replica == merged state batch over batch; catch-up is incremental; replay no-op") {
    import spark.implicits._
    val (stateDir, logDir) = dirs()
    val b0 = baseOrders(200)
    // b1: update key 7, delete key 9, insert key 500
    val b1 = baseOrders(200)
      .filter(col("o_orderkey") =!= 9)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") === 7, lit("F")).otherwise(col("o_orderstatus")))
      .unionByName(Seq(Ord(500, 5, "O", 5000.0)).toDF)
    CdcStream.mergeBatch(b0, 0, cfg, stateDir)
    CdcStream.mergeBatch(b1, 1, cfg, stateDir)

    // first catch-up applies both pending batches, in order
    val vs1 = CdcStream.applyFeedToCowLog(spark, stateDir, logDir, cfg)
    assert(vs1.size === 2)
    (0L to 1L).foreach { k =>
      val replica = SnapshotLog.read(spark, logDir,
        SnapshotLog.versionOfBatch(spark, logDir, k))
      assert(stateSet(replica) ===
        stateSet(CdcStream.stateAt(spark, stateDir, k).get), s"batch $k")
    }
    // re-running with nothing pending is a no-op
    assert(CdcStream.applyFeedToCowLog(spark, stateDir, logDir, cfg).isEmpty)
    // a third batch arrives: exactly one more version lands
    val b2 = b1.withColumn("o_totalprice",
      when(col("o_orderkey") === 500, lit(5555.0)).otherwise(col("o_totalprice")))
    CdcStream.mergeBatch(b2, 2, cfg, stateDir)
    val vs2 = CdcStream.applyFeedToCowLog(spark, stateDir, logDir, cfg)
    assert(vs2.size === 1)
    assert(stateSet(SnapshotLog.read(spark, logDir)) ===
      stateSet(CdcStream.stateAt(spark, stateDir, 2L).get))
    assert(SnapshotLog.versions(spark, logDir).size === 3)
  }

  test("after key-clustered optimize, a sparse batch rewrites only matched-key files") {
    import spark.implicits._
    val (stateDir, logDir) = dirs()
    CdcStream.mergeBatch(baseOrders(400), 0, cfg, stateDir)
    CdcStream.applyFeedToCowLog(spark, stateDir, logDir, cfg)
    // cluster the replica on the merge key — the documented pairing that
    // keeps COW merge's affected-file sets small
    val vOpt = SnapshotLog.optimize(spark, logDir,
      targetFiles = 4, clusterBy = Seq("o_orderkey"))
    val filesOpt = spark.read.textFile(s"$logDir/_log/v$vOpt.manifest")
      .collect().filterNot(_.startsWith("#")).toSet
    assert(filesOpt.size === 4)
    // a batch touching ONE low key: exactly one clustered file rewritten
    val b1 = baseOrders(400).withColumn("o_orderstatus",
      when(col("o_orderkey") === 3, lit("F")).otherwise(col("o_orderstatus")))
    CdcStream.mergeBatch(b1, 1, cfg, stateDir)
    CdcStream.applyFeedToCowLog(spark, stateDir, logDir, cfg)
    val vNew = SnapshotLog.versions(spark, logDir).last
    val filesNew = spark.read.textFile(s"$logDir/_log/v$vNew.manifest")
      .collect().filterNot(_.startsWith("#")).toSet
    assert(filesOpt.intersect(filesNew).size === 3,
      "three of four clustered files must be carried by reference")
    assert(stateSet(SnapshotLog.read(spark, logDir)) ===
      stateSet(CdcStream.stateAt(spark, stateDir, 1L).get))
  }

  test("delete-only first batch on an empty replica commits nothing, then recovers") {
    import spark.implicits._
    val (stateDir, logDir) = dirs()
    // batch 0 inserts, batch 1 deletes everything, batch 2 re-inserts
    CdcStream.mergeBatch(Seq(Ord(1, 1, "O", 1.0)).toDF, 0, cfg, stateDir)
    CdcStream.mergeBatch(Seq.empty[Ord].toDF, 1, cfg, stateDir)
    CdcStream.mergeBatch(Seq(Ord(2, 2, "O", 2.0)).toDF, 2, cfg, stateDir)
    val vs = CdcStream.applyFeedToCowLog(spark, stateDir, logDir, cfg)
    // insert, full delete (empty version), insert again — all versioned
    assert(vs.size === 3)
    assert(stateSet(SnapshotLog.read(spark, logDir)) === Set(Ord(2, 2, "O", 2.0)))
  }
}
