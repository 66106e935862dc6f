package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Shallow clone + materialize: zero-copy branching must share every
  * data file by reference, branches must evolve independently in both
  * directions, and materialize must break the source dependence for
  * exactly the borrowed files.
  */
class SnapshotCloneSpec extends AnyFunSuite with SparkFixture {

  private def freshDir() =
    Files.createTempDirectory("snapclone").toString + "/tbl"

  private def rows(dir: String, v: Option[Long] = None): Seq[(Long, String)] =
    SnapshotLog.read(spark, dir, v).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def dataFilesUnder(dir: String): Seq[String] = {
    val root = new java.io.File(s"$dir/data")
    if (!root.exists()) Seq.empty
    else root.listFiles().toSeq.flatMap(_.listFiles().toSeq)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(_.getPath)
  }

  test("shallowClone shares files by reference — zero data copied") {
    import spark.implicits._
    val (src, dst) = (freshDir(), freshDir())
    SnapshotLog.commit(spark, src, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val v = SnapshotLog.shallowClone(spark, src, dst)
    assert(v === 1L)
    assert(rows(dst) === Seq((1L, "a"), (2L, "b")))
    assert(dataFilesUnder(dst).isEmpty, "clone must not copy data files")
    // the clone's manifest names the SOURCE's files verbatim
    assert(SnapshotLog.referencedFiles(spark, dst) ===
      SnapshotLog.referencedFiles(spark, src))
  }

  test("clone of an older version is a time-travel branch") {
    import spark.implicits._
    val (src, dst) = (freshDir(), freshDir())
    SnapshotLog.commit(spark, src, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.commit(spark, src, Seq((1L, "a2"), (2L, "b")).toDF("k", "v"))
    SnapshotLog.shallowClone(spark, src, dst, version = Some(1L))
    assert(rows(dst) === Seq((1L, "a")))
  }

  test("branches evolve independently in both directions") {
    import spark.implicits._
    val (src, dst) = (freshDir(), freshDir())
    // one file holding both rows, so the delete's rewrite has survivors
    SnapshotLog.commit(spark, src,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))
    SnapshotLog.shallowClone(spark, src, dst)
    // mutate the CLONE: the delete rewrites into the clone's own data
    // root; the source never observes it
    SnapshotLog.deleteWhere(spark, dst, col("k") === 1L)
    assert(rows(dst) === Seq((2L, "b")))
    assert(rows(src) === Seq((1L, "a"), (2L, "b")))
    assert(dataFilesUnder(dst).nonEmpty, "rewrite must land in the clone")
    // mutate the SOURCE: the clone's pinned version is unaffected
    SnapshotLog.commit(spark, src, Seq((9L, "z")).toDF("k", "v"))
    assert(rows(dst) === Seq((2L, "b")))
  }

  test("clone vacuum never reaches borrowed source files") {
    import spark.implicits._
    val (src, dst) = (freshDir(), freshDir())
    SnapshotLog.commit(spark, src, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    SnapshotLog.shallowClone(spark, src, dst)
    SnapshotLog.deleteWhere(spark, dst, col("k") === 1L) // clone v2
    val (dropped, removed) =
      SnapshotLog.vacuum(spark, dst, keepLast = 1, orphanGraceMs = 0L)
    assert(dropped === 1)
    assert(rows(dst) === Seq((2L, "b")))
    assert(rows(src) === Seq((1L, "a"), (2L, "b")),
      "clone vacuum must not delete the source's data files")
  }

  test("clone carries a deletion vector self-contained") {
    import spark.implicits._
    val (src, dst) = (freshDir(), freshDir())
    SnapshotLog.commit(spark, src,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    SnapshotLog.deleteWhereMoR(spark, src, col("k") === 2L)
    SnapshotLog.shallowClone(spark, src, dst)
    assert(rows(dst) === Seq((1L, "a"), (3L, "c")),
      "the clone must apply the inherited deletion vector")
    // the rewrite-verb contract carries over: materialize refuses while
    // a DV names row positions in the files it would rewrite
    val e = intercept[IllegalArgumentException](
      SnapshotLog.materialize(spark, dst))
    assert(e.getMessage.contains("deletion vector"))
    // the clone compacts ITS OWN copied sidecar (source untouched), after
    // which materialize severs the borrowed files
    SnapshotLog.applyDeletionVectors(spark, dst)
    SnapshotLog.materialize(spark, dst)
    assert(rows(dst) === Seq((1L, "a"), (3L, "c")))
    assert(rows(src) === Seq((1L, "a"), (3L, "c")),
      "source still reads through its own DV")
  }

  test("materialize rewrites only borrowed files and survives source vacuum") {
    import spark.implicits._
    val (src, dst) = (freshDir(), freshDir())
    SnapshotLog.commit(spark, src, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    SnapshotLog.shallowClone(spark, src, dst)
    val v2 = SnapshotLog.materialize(spark, dst)
    assert(v2 === 2L)
    assert(rows(dst) === Seq((1L, "a"), (2L, "b")))
    // after dropping the borrowed v1, every referenced file lives under
    // the clone's own data root
    SnapshotLog.vacuum(spark, dst, keepLast = 1, orphanGraceMs = 0L)
    val own = dataFilesUnder(dst).map(p => s"file:$p").toSet
    assert(SnapshotLog.referencedFiles(spark, dst).forall(f =>
      own.exists(o => new org.apache.hadoop.fs.Path(o).toUri.getPath ==
        new org.apache.hadoop.fs.Path(f).toUri.getPath)))
    // idempotent: nothing left to rewrite
    assert(SnapshotLog.materialize(spark, dst) === v2)
    // the source can now rewrite + vacuum everything away
    SnapshotLog.deleteWhere(spark, src, col("k") === 1L)
    SnapshotLog.vacuum(spark, src, keepLast = 1, orphanGraceMs = 0L)
    assert(rows(dst) === Seq((1L, "a"), (2L, "b")),
      "a materialized branch must outlive the source's retention")
  }

  test("unmaterialized clone fails LOUDLY after source vacuum") {
    import spark.implicits._
    val (src, dst) = (freshDir(), freshDir())
    SnapshotLog.commit(spark, src, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.shallowClone(spark, src, dst)
    SnapshotLog.deleteWhere(spark, src, col("k") === 1L) // rewrites v1's file
    SnapshotLog.vacuum(spark, src, keepLast = 1, orphanGraceMs = 0L)
    val e = intercept[IllegalArgumentException](rows(dst))
    assert(e.getMessage.contains("vacuumed"),
      s"read must name the vacuumed file, got: ${e.getMessage}")
  }

  test("readAsOf resolves timestamps to the version an observer saw") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(25) // put v2's mtime strictly after the captured instant
    SnapshotLog.commit(spark, dir, Seq((2L, "b")).toDF("k", "v"))
    assert(SnapshotLog.versionAsOf(spark, dir, afterV1) === 1L)
    assert(rows(dir, Some(SnapshotLog.versionAsOf(spark, dir,
      System.currentTimeMillis()))) === Seq((2L, "b")))
    assert(SnapshotLog.readAsOf(spark, dir, afterV1)
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    // before table creation: loud, never fabricated history
    val e = intercept[IllegalArgumentException](
      SnapshotLog.versionAsOf(spark, dir, 0L))
    assert(e.getMessage.contains("time-travel before table creation"))
  }

  test("vacuum minAgeMs: young versions survive beyond keepLast") {
    import spark.implicits._
    val dir = freshDir()
    (1 to 3).foreach(i =>
      SnapshotLog.commit(spark, dir, Seq((i.toLong, s"g$i")).toDF("k", "v")))
    // everything is seconds old: with a 1-hour retention nothing drops
    val (d0, _) = SnapshotLog.vacuum(spark, dir, keepLast = 1,
      orphanGraceMs = 0L, minAgeMs = 3600L * 1000)
    assert(d0 === 0)
    assert(SnapshotLog.versions(spark, dir) === Seq(1L, 2L, 3L))
    // with retention waived the same call drops the old tail
    val (d1, _) = SnapshotLog.vacuum(spark, dir, keepLast = 1,
      orphanGraceMs = 0L)
    assert(d1 === 2)
    assert(SnapshotLog.versions(spark, dir) === Seq(3L))
  }

  test("guards: non-empty target and unknown version refuse") {
    import spark.implicits._
    val (src, dst) = (freshDir(), freshDir())
    SnapshotLog.commit(spark, src, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.commit(spark, dst, Seq((2L, "x")).toDF("k", "v"))
    intercept[IllegalArgumentException](
      SnapshotLog.shallowClone(spark, src, dst))
    intercept[IllegalArgumentException](
      SnapshotLog.shallowClone(spark, src, freshDir(), version = Some(7L)))
  }

  test("cloned batch header keeps streaming replay idempotence") {
    import spark.implicits._
    val (src, dst) = (freshDir(), freshDir())
    SnapshotLog.commitBatch(spark, src, Seq((1L, "a")).toDF("k", "v"),
      batchId = 0L)
    SnapshotLog.commitBatch(spark, src, Seq((2L, "b")).toDF("k", "v"),
      batchId = 1L)
    SnapshotLog.shallowClone(spark, src, dst)
    assert(SnapshotLog.lastBatch(spark, dst) === Some(1L))
    // a replay of batch 1 against the branch is a no-op
    val before = SnapshotLog.versions(spark, dst)
    SnapshotLog.commitBatch(spark, dst, Seq((2L, "b")).toDF("k", "v"),
      batchId = 1L)
    assert(SnapshotLog.versions(spark, dst) === before)
    assert(rows(dst) === Seq((1L, "a"), (2L, "b")))
    // the NEXT batch lands normally
    SnapshotLog.commitBatch(spark, dst, Seq((3L, "c")).toDF("k", "v"),
      batchId = 2L)
    assert(rows(dst) === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(rows(src) === Seq((1L, "a"), (2L, "b")))
  }
}
