package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The replay high-water mark must survive rewrites + vacuum: a
  * compaction or delete landing after the last batch, followed by a
  * retention vacuum that drops every `#batch=`-bearing version, must not
  * blind the at-least-once replay guard.
  */
class ReplayGuardSpec extends AnyFunSuite with SparkFixture {
  private def freshDir() =
    Files.createTempDirectory("replayguard").toString + "/tbl"

  test("replay no-ops after rewrite + vacuum drops the batch versions") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commitBatch(spark, dir, Seq((1L, "a")).toDF("k", "v"),
      batchId = 0L)
    SnapshotLog.commitBatch(spark, dir, Seq((2L, "b")).toDF("k", "v"),
      batchId = 1L)
    // a rewrite lands after the last batch...
    SnapshotLog.deleteWhere(spark, dir, col("k") === 1L)
    // ...and retention drops every version carrying a #batch header
    SnapshotLog.vacuum(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    // the crash-replay of batch 1 must STILL no-op
    val before = SnapshotLog.read(spark, dir).count()
    SnapshotLog.commitBatch(spark, dir, Seq((2L, "b")).toDF("k", "v"),
      batchId = 1L)
    assert(SnapshotLog.read(spark, dir).count() === before,
      "replayed batch double-applied: the high-water mark was vacuumed away")
  }

  test("restore never lowers the replay high-water mark") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commitBatch(spark, dir, Seq((1L, "a")).toDF("k", "v"),
      batchId = 0L)
    SnapshotLog.commitBatch(spark, dir, Seq((2L, "b")).toDF("k", "v"),
      batchId = 1L)
    // roll the DATA back to batch 0's state...
    SnapshotLog.restore(spark, dir, 1L)
    assert(SnapshotLog.read(spark, dir).count() === 1)
    // ...but the replay guard keeps suppressing batch 1's at-least-once
    // replay: a restored table re-ingesting its own duplicate feed would
    // otherwise double-apply on recovery (the Delta txn-watermark rule)
    assert(SnapshotLog.lastBatch(spark, dir) === Some(1L))
    SnapshotLog.commitBatch(spark, dir, Seq((2L, "b")).toDF("k", "v"),
      batchId = 1L)
    assert(SnapshotLog.read(spark, dir).count() === 1, "replay must no-op")
    // a genuinely NEW batch still lands
    SnapshotLog.commitBatch(spark, dir, Seq((3L, "c")).toDF("k", "v"),
      batchId = 2L)
    assert(SnapshotLog.read(spark, dir).count() === 2)
  }
}
