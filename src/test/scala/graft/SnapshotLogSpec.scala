package graft

import graft.sources.SnapshotLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Runtime proof of the snapshot log's contract: atomic visibility,
  * file-level time travel, optimistic version claims, crash-orphan
  * invisibility, and vacuum's reader-safe deletion order. */
class SnapshotLogSpec extends AnyFunSuite with SparkFixture {

  private def freshDir() =
    Files.createTempDirectory("snaplog").toString + "/tbl"

  test("commit/read/time-travel: each version returns exactly its data") {
    import spark.implicits._
    val dir = freshDir()
    val v1 = SnapshotLog.commit(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val v2 = SnapshotLog.commit(spark, dir, Seq((1L, "a2"), (3L, "c")).toDF("k", "v"))
    assert(v1 === 1L && v2 === 2L)
    assert(SnapshotLog.versions(spark, dir) === Seq(1L, 2L))
    val r1 = SnapshotLog.read(spark, dir, Some(1)).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val latest = SnapshotLog.read(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(r1 === Seq((1L, "a"), (2L, "b")))
    assert(latest === Seq((1L, "a2"), (3L, "c")))
  }

  test("uncommitted data files are invisible; vacuum reclaims them") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    // simulate a crash mid-commit: data written, manifest never renamed
    Seq((9L, "orphan")).toDF("k", "v")
      .write.parquet(s"$dir/data/crashed-commit")
    assert(SnapshotLog.read(spark, dir).count() === 1) // orphan invisible
    val (droppedVs, droppedFiles) = SnapshotLog.vacuum(spark, dir, keepLast = 1)
    assert(droppedVs === 0 && droppedFiles >= 1)
    assert(!new java.io.File(s"$dir/data/crashed-commit").exists())
    assert(SnapshotLog.read(spark, dir).count() === 1) // survivor intact
  }

  test("version claim is optimistic: a squatted manifest forces the next slot") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    // another committer already holds v2
    val f = new Path(s"$dir/_log/v2.manifest")
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(f, false); out.close()
    val v = SnapshotLog.commit(spark, dir, Seq((2L, "b")).toDF("k", "v"))
    assert(v === 3L, "commit must skip the claimed slot, not clobber it")
    assert(SnapshotLog.read(spark, dir, Some(3)).count() === 1)
  }

  test("deleteWhere rewrites only affected files and shares the rest by reference") {
    import spark.implicits._
    val dir = freshDir()
    // 4 files, keys range-partitioned so the delete key lives in one file
    val df = spark.range(0, 400).select(col("id").as("k"),
      (col("id") % 7).as("v")).repartitionByRange(4, col("k"))
    SnapshotLog.commit(spark, dir, df)
    val before = SnapshotLog.read(spark, dir).count()
    val filesV1 = spark.read.textFile(s"$dir/_log/v1.manifest").collect().toSet
    val v = SnapshotLog.deleteWhere(spark, dir, col("k") >= 350)
    assert(v === 2L)
    val filesV2 = spark.read.textFile(s"$dir/_log/v2.manifest").collect().toSet
    // untouched files carried by reference, affected file gone, ≥1 new
    val shared = filesV1.intersect(filesV2)
    assert(shared.size === 3, s"expected 3 shared files, got ${shared.size}")
    assert(filesV2.diff(filesV1).nonEmpty)
    // values: new version lacks the keys, old version still has them
    assert(SnapshotLog.read(spark, dir).count() === before - 50)
    assert(SnapshotLog.read(spark, dir).filter(col("k") >= 350).count() === 0)
    assert(SnapshotLog.read(spark, dir, Some(1)).count() === before)
    // no-match delete is a no-op returning the current version
    assert(SnapshotLog.deleteWhere(spark, dir, col("k") === -1) === 2L)
    assert(SnapshotLog.versions(spark, dir) === Seq(1L, 2L))
    // vacuum after share: v1-only files die, shared files survive
    SnapshotLog.vacuum(spark, dir, keepLast = 1)
    assert(SnapshotLog.read(spark, dir).count() === before - 50)
  }

  test("concurrent committers: every commit lands exactly once, versions dense") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir()
    val n = 6
    val futures = (1 to n).map { i =>
      Future(SnapshotLog.commit(spark, dir,
        Seq((i.toLong, s"writer$i")).toDF("k", "v")))
    }
    val versions = futures.map(Await.result(_, Duration("120s")))
    // read-back-verified claims: every writer got a DISTINCT version and
    // the log is dense 1..n — no clobbered manifests, no lost commits
    assert(versions.sorted === (1L to n.toLong))
    assert(SnapshotLog.versions(spark, dir) === (1L to n.toLong))
    val all = (1L to n.toLong).flatMap { v =>
      SnapshotLog.read(spark, dir, Some(v)).collect()
        .map(r => (r.getLong(0), r.getString(1)))
    }.toSet
    assert(all === (1 to n).map(i => (i.toLong, s"writer$i")).toSet)
  }

  test("streaming sink: one cumulative version per batch, replay-idempotent, time travel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = freshDir()
    val ck = Files.createTempDirectory("snapck").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long]
    val q = SnapshotLog.sink(ms.toDF().withColumnRenamed("value", "k"), dir, ck)
    try {
      (0 until 3).foreach { b =>
        ms.addData((b * 10L until b * 10L + 5).toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(SnapshotLog.versions(spark, dir) === Seq(1L, 2L, 3L))
    assert((1 to 3).map(v => SnapshotLog.batchOf(spark, dir, v.toLong)) ===
      Seq(Some(0L), Some(1L), Some(2L)))
    // cumulative: version v holds batches 0..v-1; latest holds all 15
    assert(SnapshotLog.read(spark, dir, Some(2)).count() === 10)
    assert(SnapshotLog.read(spark, dir).count() === 15)
    // at-least-once replay of the last batch: same version, untouched
    assert(SnapshotLog.commitBatch(spark, dir,
      Seq(20L, 21L, 22L, 23L, 24L).toDF("k"), 2L) === 3L)
    assert(SnapshotLog.versions(spark, dir) === Seq(1L, 2L, 3L))
    assert(SnapshotLog.read(spark, dir).count() === 15)
    // the table format's other verbs work on the streamed table
    assert(SnapshotLog.deleteWhere(spark, dir, col("k") >= 20) === 4L)
    assert(SnapshotLog.read(spark, dir).count() === 10)
    assert(SnapshotLog.read(spark, dir, Some(3)).count() === 15) // still visible
    SnapshotLog.vacuum(spark, dir, keepLast = 1)
    assert(SnapshotLog.read(spark, dir).count() === 10)
  }

  test("vacuum drops old versions manifest-first and read fails loudly after") {
    import spark.implicits._
    val dir = freshDir()
    (1 to 4).foreach { i =>
      SnapshotLog.commit(spark, dir,
        spark.range(i).select(col("id"), lit(s"gen$i").as("v")))
    }
    val (droppedVs, droppedFiles) = SnapshotLog.vacuum(spark, dir, keepLast = 2)
    assert(droppedVs === 2 && droppedFiles >= 2)
    assert(SnapshotLog.versions(spark, dir) === Seq(3L, 4L))
    assert(SnapshotLog.read(spark, dir, Some(3)).count() === 3)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.read(spark, dir, Some(1))
    }
    assert(e.getMessage.contains("does not exist"))
    // shared commit directories: files still referenced by v3/v4 survive
    assert(SnapshotLog.read(spark, dir).count() === 4)
  }
}
