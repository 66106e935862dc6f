package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The WRITE half of `format("graft-snapshot")`: batch saves route
  * through commit/append (no `#batch=` poisoning), the streaming sink
  * commits epochs exactly-once through commitBatch/commitBatchReplace,
  * CHECK constraints gate both, and the full stream-in → stream-out
  * composition round-trips between two snapshot tables. */
class SnapshotWriteSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("snapwrite").toString + "/tbl"

  private def rows(a: Long, b: Long) =
    (a until b).map(i => (i, s"v$i")).toDF("k", "v")

  test("batch append writes a fresh table, then carries prior versions") {
    val dir = freshDir()
    rows(0, 5).write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    assert(SnapshotLog.versions(spark, dir) === Seq(1L))
    rows(5, 8).write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    assert(SnapshotLog.versions(spark, dir) === Seq(1L, 2L))
    assert(SnapshotLog.read(spark, dir).select("k").as[Long].collect()
      .sorted === (0L until 8L).toArray)
    // round trip: the same format string reads it back
    assert(spark.read.format("graft-snapshot").option("path", dir).load()
      .count() === 8)
    // a plain batch append must NOT stamp a #batch= header — a later
    // streaming sink checkpointed at epoch 0 would silently skip
    assert(SnapshotLog.lastBatch(spark, dir).isEmpty,
      "batch append stamped a #batch header")
  }

  test("overwrite replaces; ErrorIfExists and Ignore honor existence") {
    val dir = freshDir()
    rows(0, 5).write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    rows(100, 103).write.format("graft-snapshot").option("path", dir)
      .mode("overwrite").save()
    assert(SnapshotLog.read(spark, dir).select("k").as[Long].collect()
      .sorted === (100L until 103L).toArray)
    // history intact: v1 still time-travels
    assert(SnapshotLog.read(spark, dir, Some(1L)).count() === 5)
    val e = intercept[Exception] {
      rows(0, 1).write.format("graft-snapshot").option("path", dir)
        .mode("error").save()
    }
    assert(e.getMessage.contains("already has committed versions") ||
      Option(e.getCause).exists(_.getMessage
        .contains("already has committed versions")))
    rows(0, 1).write.format("graft-snapshot").option("path", dir)
      .mode("ignore").save() // no-op, no error
    assert(SnapshotLog.read(spark, dir).count() === 3)
  }

  test("batch writes validate CHECK constraints like the library verbs") {
    val dir = freshDir()
    rows(0, 5).write.format("graft-snapshot").option("path", dir)
      .mode("append").save()
    SnapshotLog.addCheck(spark, dir, "k_small", "k < 100")
    val e = intercept[Exception] {
      rows(100, 101).write.format("graft-snapshot").option("path", dir)
        .mode("append").save()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("k_small")),
      s"expected the CHECK name in: ${msgs(e).mkString(" | ")}")
    assert(SnapshotLog.versions(spark, dir).size === 2, // commit + check
      "a failed CHECK still committed a version")
  }

  test("streaming sink: epochs commit exactly-once across a restart") {
    val dir = freshDir()
    val ckpt = Files.createTempDirectory("snapwrite-ckpt").toString
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    def start() = ms.toDF().toDF("k", "v").writeStream
      .format("graft-snapshot").option("path", dir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      ms.addData((0L, "a"), (1L, "b"))
      q1.processAllAvailable()
      ms.addData((2L, "c"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(SnapshotLog.read(spark, dir).select("k").as[Long].collect()
      .sorted === Array(0L, 1L, 2L))
    val versionsBefore = SnapshotLog.versions(spark, dir)
    // restart on the same checkpoint: no re-emit of committed epochs
    val q2 = start()
    try {
      ms.addData((3L, "d"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(SnapshotLog.read(spark, dir).select("k").as[Long].collect()
      .sorted === Array(0L, 1L, 2L, 3L))
    assert(SnapshotLog.versions(spark, dir).size === versionsBefore.size + 1)
    // batch headers present: the sink's epochs ARE the replay ledger
    assert(SnapshotLog.lastBatch(spark, dir).nonEmpty)
  }

  test("Complete mode replaces the table with each epoch's full result") {
    val dir = freshDir()
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Long]
    val agg = ms.toDF().toDF("k")
      .groupBy((col("k") % 2).as("parity")).agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("graft-snapshot").option("path", dir)
      .option("checkpointLocation",
        Files.createTempDirectory("snapwrite-ckpt2").toString)
      .outputMode("complete").start()
    try {
      ms.addData(0L, 1L, 2L)
      q.processAllAvailable()
      ms.addData(3L, 4L)
      q.processAllAvailable()
    } finally q.stop()
    val now = SnapshotLog.read(spark, dir).as[(Long, Long)].collect().toMap
    assert(now === Map(0L -> 3L, 1L -> 2L)) // 0,2,4 even; 1,3 odd
    // each epoch is a full snapshot, not an accumulation of appends
    assert(SnapshotLog.read(spark, dir).count() === 2)
  }

  test("Update mode and partitionBy are refused loudly") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Long]
    val agg = ms.toDF().toDF("k").groupBy("k").count()
    val e = intercept[Exception] {
      agg.writeStream.format("graft-snapshot").option("path", freshDir())
        .option("checkpointLocation",
          Files.createTempDirectory("snapwrite-ckpt3").toString)
        .outputMode("update").start()
    }
    assert(e.getMessage.contains("Update") ||
      Option(e.getCause).exists(_.getMessage.contains("Update")))
    val e2 = intercept[Exception] {
      ms.toDF().toDF("k").withColumn("g", col("k") % 2).writeStream
        .format("graft-snapshot").option("path", freshDir())
        .partitionBy("g")
        .option("checkpointLocation",
          Files.createTempDirectory("snapwrite-ckpt4").toString)
        .outputMode("append").start()
    }
    assert(e2.getMessage.contains("partition") ||
      Option(e2.getCause).exists(_.getMessage.contains("partition")))
  }

  test("composition: snapshot table streams THROUGH a transform into a second snapshot table") {
    // the closed loop with zero foreachBatch plumbing: source table →
    // format-read stream → filter → format-write sink → replica table,
    // which is itself time-travelable and streamable
    val src = freshDir()
    val dst = freshDir()
    SnapshotLog.commit(spark, src, rows(0, 6))
    val q = spark.readStream.format("graft-snapshot").option("path", src)
      .load()
      .filter(col("k") % 2 === 0L)
      .writeStream.format("graft-snapshot").option("path", dst)
      .option("checkpointLocation",
        Files.createTempDirectory("snapwrite-ckpt5").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      SnapshotLog.commitBatch(spark, src, rows(6, 10), batchId = 1L)
      q.processAllAvailable()
    } finally q.stop()
    assert(SnapshotLog.read(spark, dst).select("k").as[Long].collect()
      .sorted === Array(0L, 2L, 4L, 6L, 8L))
    // the replica has per-epoch versions and time travel
    assert(SnapshotLog.versions(spark, dst).size >= 2)
    assert(SnapshotLog.read(spark, dst, Some(1L)).count() === 3)
  }
}
