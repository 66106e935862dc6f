package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Merge-on-read deletion vectors ([[SnapshotLog.deleteWhereMoR]] /
  * [[SnapshotLog.applyDeletionVectors]]): MoR results == COW results with
  * ZERO data files rewritten (path+mtime law), every read path honors the
  * vector, appends carry it forward, rewriting verbs refuse loudly until
  * compaction, accumulation across consecutive deletes, NULL-predicate
  * survival, time travel, and vacuum reclaim of orphaned sidecars. */
class SnapshotDvSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def mkLog(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("dv-log").toString
    val df = (0L until 1000L)
      .map(i => (i, i % 7, if (i % 13 == 0) None else Some(s"e$i")))
      .toDF("id", "grp", "email")
    SnapshotLog.commit(spark, dir, df.repartition(4, col("id")))
    (dir, df)
  }

  private def dataFileStates(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(s"$dir/data"))
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getPath -> f.lastModified).toMap
  }

  test("MoR delete == COW delete, with zero data files rewritten") {
    val (dirM, df) = mkLog()
    val (dirC, _) = mkLog()
    val before = dataFileStates(dirM)
    val vM = SnapshotLog.deleteWhereMoR(spark, dirM, col("grp") === 3)
    val vC = SnapshotLog.deleteWhere(spark, dirC, col("grp") === 3)
    assert(dataFileStates(dirM) === before,
      "MoR delete touched a data file")
    val gotM = SnapshotLog.read(spark, dirM, Some(vM))
      .select("id").collect().map(_.getLong(0)).toSet
    val gotC = SnapshotLog.read(spark, dirC, Some(vC))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotM === gotC)
    assert(gotM === (0L until 1000L).filterNot(_ % 7 == 3).toSet)
    // time travel: the pre-delete version still sees everything
    assert(SnapshotLog.read(spark, dirM, Some(1L)).count() === 1000L)
  }

  test("NULL predicate rows survive MoR deletes (three-valued logic)") {
    val (dir, _) = mkLog()
    SnapshotLog.deleteWhereMoR(spark, dir, col("email") === "e1")
    val left = SnapshotLog.read(spark, dir)
    assert(left.count() === 999L)
    // null-email rows (id % 13 == 0) were never matched and all survive
    assert(left.filter(col("email").isNull).count() ===
      (0L until 1000L).count(_ % 13 == 0))
  }

  test("consecutive MoR deletes accumulate; readBetween/readPoint honor the vector") {
    val (dir, _) = mkLog()
    SnapshotLog.analyze(spark, dir, Seq("id"))
    SnapshotLog.deleteWhereMoR(spark, dir, col("id") === 10L)
    SnapshotLog.deleteWhereMoR(spark, dir, col("id") === 11L)
    assert(SnapshotLog.read(spark, dir).count() === 998L)
    // ANALYZE republishes the file list — the vector must ride along
    SnapshotLog.analyze(spark, dir, Seq("id"))
    assert(SnapshotLog.read(spark, dir).count() === 998L,
      "analyze dropped the deletion vector")
    val (between, _, _) = SnapshotLog.readBetween(spark, dir, "id", 9L, 12L)
    assert(between.select("id").collect().map(_.getLong(0)).toSet ===
      Set(9L, 12L))
    SnapshotLog.analyzeBlooms(spark, dir, Seq("id"), expectedItems = 1000)
    val (point, _, _) = SnapshotLog.readPoint(spark, dir, "id", 10L)
    assert(point.count() === 0L, "readPoint resurrected a MoR-deleted row")
  }

  test("appends carry the vector; rewriting verbs COMPOSE with it (r8)") {
    val (dir, _) = mkLog()
    SnapshotLog.deleteWhereMoR(spark, dir, col("id") < 5L)
    SnapshotLog.commitBatch(spark, dir,
      Seq((5000L, 1L, Some("x"))).toDF("id", "grp", "email"), batchId = 1L)
    val rows = SnapshotLog.read(spark, dir)
    assert(rows.count() === 996L)
    assert(rows.filter(col("id") < 5L).count() === 0L,
      "an append resurrected MoR-deleted rows")

    // COW delete on the DV-bearing version: the target dies, MoR-dead
    // rows STAY dead (the rewrite read through the vector; the commit
    // pruned only the rewritten files' entries)
    SnapshotLog.deleteWhere(spark, dir, col("id") === 7L)
    val afterDel = SnapshotLog.read(spark, dir)
    assert(afterDel.count() === 995L)
    assert(afterDel.filter(col("id") < 5L).count() === 0L,
      "COW delete resurrected MoR-dead rows")

    // merge: replaces a live row; a MoR-DEAD key is correctly ABSENT,
    // so merging it INSERTS the new image (one visible row, new value)
    SnapshotLog.merge(spark, dir,
      Seq((8L, 77L, Some("y")), (3L, 33L, Some("z")))
        .toDF("id", "grp", "email"), Seq("id"))
    val afterMerge = SnapshotLog.read(spark, dir)
    assert(afterMerge.filter(col("id") === 8L).select("grp")
      .as[Long].head() === 77L)
    assert(afterMerge.filter(col("id") === 3L).count() === 1L,
      "a dead key's merge image must insert (the key is invisible)")
    assert(afterMerge.filter(col("id") === 3L).select("grp")
      .as[Long].head() === 33L)
    assert(afterMerge.filter(col("id").isin(0L, 1L, 2L, 4L)).count() === 0L,
      "untouched MoR-dead rows stayed dead through the merge")

    // updateWhere composes the same way
    SnapshotLog.updateWhere(spark, dir, col("id") === 9L,
      Map("grp" -> lit(-1L)))
    assert(SnapshotLog.read(spark, dir).filter(col("id") === 9L)
      .select("grp").as[Long].head() === -1L)

    // optimize compacts THROUGH the vector — every small file rewritten,
    // so the vector empties and the header drops: applyDeletionVectors
    // on the result is a no-op (nothing left to apply)
    val optV = SnapshotLog.optimize(spark, dir)
    val compacted = SnapshotLog.read(spark, dir, Some(optV))
    // ids 0,1,2,4 are MoR-dead; id 3 is ALIVE again (the merge above
    // legitimately re-inserted it)
    assert(compacted.filter(col("id").isin(0L, 1L, 2L, 4L)).count() === 0L)
    assert(compacted.filter(col("id") === 3L).count() === 1L)
    assert(compacted.count() === 996L) // 995 +1 merge-insert(3)
    assert(SnapshotLog.applyDeletionVectors(spark, dir) === optV,
      "optimize left a vector behind despite rewriting every file")

    // time travel: the ORIGINAL MoR version still reads DV-filtered
    val mor = SnapshotLog.read(spark, dir, Some(2L))
    assert(mor.count() === 995L && mor.filter(col("id") < 5L).count() === 0L)
  }

  test("vacuum reclaims sidecars no retained manifest references") {
    val (dir, df) = mkLog()
    SnapshotLog.deleteWhereMoR(spark, dir, col("id") === 1L)
    val dvDir = new java.io.File(s"$dir/_log/dv")
    assert(dvDir.listFiles().nonEmpty)
    // replace-commit drops the DV lineage; vacuum to 1 version reclaims
    SnapshotLog.commit(spark, dir, df.limit(10))
    SnapshotLog.vacuum(spark, dir, keepLast = 1)
    assert(!dvDir.exists() || dvDir.listFiles().isEmpty,
      "orphaned DV sidecar survived vacuum")
  }
  test("change data feed sees MoR deletes; replica sync law holds across one") {
    import spark.implicits._
    val src = Files.createTempDirectory("dv-cdf-src").toString
    val rep = Files.createTempDirectory("dv-cdf-rep").toString
    val rows = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
    SnapshotLog.commit(spark, src, rows.repartition(4, col("k")))
    // bootstrap the replica at v1 parity
    SnapshotLog.merge(spark, rep, rows, Seq("k"))
    val v1 = SnapshotLog.versions(spark, src).last
    val v2 = SnapshotLog.deleteWhereMoR(spark, src, col("k") < 10L)

    val feed = SnapshotLog.changesBetween(spark, src, v1, v2, keys = Seq("k"))
    val deletes = feed.filter(col("_change_type") === "delete")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(deletes === (0L until 10L).toSet,
      "the feed must surface exactly the MoR-tombstoned rows")
    assert(feed.filter(col("_change_type") =!= "delete").count() === 0)

    SnapshotLog.applyChanges(spark, rep, feed, Seq("k"))
    val replica = SnapshotLog.read(spark, rep)
      .select("k").collect().map(_.getLong(0)).toSet
    val source = SnapshotLog.read(spark, src)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(replica === source, "replica diverged across a MoR delete")

    // restore to the DV-bearing version keeps the vector (no resurrection)
    val v3 = SnapshotLog.commitBatch(spark, src,
      Seq((500L, "x")).toDF("k", "v"), batchId = 1L)
    val v4 = SnapshotLog.restore(spark, src, v2)
    val restored = SnapshotLog.read(spark, src, Some(v4))
    assert(restored.filter(col("k") < 10L).count() === 0L,
      "restore dropped the deletion vector and resurrected rows")
  }

  test("bitmap sidecars stay KB-scale on a wide delete (round 9)") {
    val dir = Files.createTempDirectory("dv-wide").toString
    val df = spark.range(0, 200000).select(col("id"), (col("id") % 7).as("grp"))
    SnapshotLog.commit(spark, dir, df.repartition(4, col("id")))
    // tombstone HALF the table: 100k positions — row-per-position
    // parquet was ~MBs; one roaring bitmap per file is KBs
    SnapshotLog.deleteWhereMoR(spark, dir, col("id") % 2 === 0)
    assert(SnapshotLog.read(spark, dir).count() === 100000L)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val sidecarBytes = walk(new java.io.File(s"$dir/_log/dv"))
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    assert(sidecarBytes > 0)
    assert(sidecarBytes < 256 * 1024,
      s"100k-position sidecar should be KB-scale, was $sidecarBytes bytes")
    // compaction applies the bitmap exactly
    val v = SnapshotLog.applyDeletionVectors(spark, dir)
    val after = SnapshotLog.read(spark, dir, Some(v))
    assert(after.count() === 100000L)
    assert(after.filter(col("id") % 2 === 0).count() === 0L)
  }

  test("legacy row-per-position sidecars stay readable (round 9)") {
    val (dir, _) = mkLog()
    SnapshotLog.deleteWhereMoR(spark, dir, col("id") < 10L)
    // rewrite the bitmap sidecar into the pre-r9 positions shape IN
    // PLACE — same name, old schema — and assert every consumer still
    // reads through it
    val dvDir = new java.io.File(s"$dir/_log/dv")
    val sidecar = dvDir.listFiles().filter(_.isDirectory).head
    val positions = (0L until 1000L).filter(_ < 10L) // ids 0..9
    // locate each id's (file, row_index) from the raw physical scan
    val phys = spark.read.parquet(s"$dir/data/*")
      .withColumn("path", col("_metadata.file_path"))
      .withColumn("row_index", col("_metadata.row_index"))
      .filter(col("id") < 10L)
      .select("path", "row_index")
    val tmp = Files.createTempDirectory("dv-legacy").toString
    phys.coalesce(1).write.mode("overwrite").parquet(tmp)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf); f.delete() }
    rmrf(sidecar)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp),
      sidecar.toPath)
    // reads, pruned reads and the CDF all honor the legacy shape
    assert(SnapshotLog.read(spark, dir).count() === 990L)
    assert(SnapshotLog.read(spark, dir).filter(col("id") < 10L).count() === 0L)
    // a further MoR delete merges legacy positions into a new bitmap
    SnapshotLog.deleteWhereMoR(spark, dir, col("id") === 500L)
    val rows = SnapshotLog.read(spark, dir)
    assert(rows.count() === 989L)
    assert(rows.filter(col("id") < 10L).count() === 0L,
      "legacy positions lost in the bitmap merge")
    // compaction through the mixed lineage stays exact
    val v = SnapshotLog.applyDeletionVectors(spark, dir)
    assert(SnapshotLog.read(spark, dir, Some(v)).count() === 989L)
  }

  test("the DV anti-join broadcasts the sparse vector (read-cost claim)") {
    val (dir, _) = mkLog()
    SnapshotLog.deleteWhereMoR(spark, dir, col("id") === 3L)
    val df = SnapshotLog.read(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"sparse DV must broadcast, not shuffle the table:\n$plan")
  }


  test("replaceWhere composes with a live deletion vector: MoR-dead " +
      "rows neither mark files affected nor resurrect; vector pruned") {
    val (dir, _) = mkLog()
    // MoR-kill grp 3 entirely, then REPLACE the grp 5 region
    SnapshotLog.deleteWhereMoR(spark, dir, col("grp") === 3)
    val fresh = (0L until 10L).map(i => (10000L + i, 5L, Some(s"n$i")))
      .toDF("id", "grp", "email")
    val v = SnapshotLog.replaceWhere(spark, dir, fresh, col("grp") === 5)
    val got = SnapshotLog.read(spark, dir, Some(v))
    // grp 3 stays dead (the rewrite read THROUGH the vector), grp 5 is
    // exactly the fresh rows, everything else intact
    assert(got.filter(col("grp") === 3).count() === 0,
      "MoR-deleted rows resurrected through replaceWhere")
    assert(got.filter(col("grp") === 5).count() === 10)
    assert(got.filter(col("grp") === 5 && col("id") < 10000L).count() === 0)
    val others = got.filter(col("grp") =!= 3 && col("grp") =!= 5).count()
    assert(others === (0L until 1000L).count(i => i % 7 != 3 && i % 7 != 5))
    // the incoming-rows contract still guards under a live DV
    val bad = (0L until 3L).map(i => (20000L + i, 6L, Option.empty[String]))
      .toDF("id", "grp", "email")
    val e = intercept[Exception] {
      SnapshotLog.replaceWhere(spark, dir, bad, col("grp") === 5)
    }
    assert(e.getMessage.contains("do NOT match"))
  }
}
