package graft.sources

import graft.SparkFixture
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Replica-bootstrap admission: a change-feed stream's INITIAL snapshot
  * (stream start with no retained predecessor — the full table) drains
  * in FILE-grain bites under maxBytesPerTrigger instead of one
  * table-sized batch, survives a mid-snapshot restart exactly-once,
  * and `replicate` bootstraps a replica in bounded merge commits. */
class SnapshotBootstrapSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("snapboot").toString + "/tbl"

  /** A table whose first version has `nFiles` data files. */
  private def seed(dir: String, nFiles: Int, rows: Long): Unit = {
    SnapshotLog.commit(spark, dir,
      (0L until rows).map(i => (i, s"v$i")).toDF("k", "v")
        .repartition(nFiles))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
  }

  private def mkStream(dir: String,
      maxBytes: Option[Long]): SnapshotMicroBatchStream =
    new SnapshotMicroBatchStream(dir,
      SnapshotStreamSource.schemaFor(dir)
        .add("_change_type", org.apache.spark.sql.types.StringType)
        .add("_commit_version", org.apache.spark.sql.types.LongType),
      startingVersion = None, maxVersionsPerTrigger = None,
      maxBytesPerTrigger = maxBytes, changeFeed = true)

  /** Drive the admission protocol like the engine does: latestOffset →
    * planInputPartitions, until caught up. Returns each bite's file
    * paths, plus every intermediate offset JSON. */
  private def drainBites(stream: SnapshotMicroBatchStream,
      from: VersionOffset, maxBites: Int = 100)
      : (Seq[Seq[String]], Seq[String]) = {
    val bites = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    val offsets = scala.collection.mutable.ArrayBuffer[String]()
    var cur = from
    var n = 0
    while (n < maxBites) {
      n += 1
      val next = stream.latestOffset(cur, ReadLimit.allAvailable())
        .asInstanceOf[VersionOffset]
      if (next == cur) return (bites.toSeq, offsets.toSeq)
      val parts = stream.planInputPartitions(cur, next)
      bites += parts.toSeq.map(_.asInstanceOf[SnapshotFilePartition].path)
      offsets += next.json()
      cur = next
    }
    fail(s"drain did not converge in $maxBites bites")
  }

  test("initial snapshot splits at file grain under maxBytesPerTrigger: " +
      "every bite bounded, files exactly-once, then versions as usual") {
    val dir = freshDir()
    seed(dir, nFiles = 5, rows = 500)
    SnapshotLog.append(spark, dir, Seq((1000L, "x")).toDF("k", "v"))
    val manifest = SnapshotLog.filesOf(spark, dir, 1L)
    assert(manifest.size === 5, "seed must produce a multi-file snapshot")
    // budget of 1 byte: the first-pending-file-always-rides rule makes
    // each bite exactly one file
    val stream = mkStream(dir, maxBytes = Some(1L))
    val (bites, _) = drainBites(stream,
      stream.initialOffset().asInstanceOf[VersionOffset])
    // 5 snapshot bites of one file each, then the append version
    assert(bites.size === 6, s"got ${bites.size} bites: $bites")
    assert(bites.take(5).forall(_.size == 1),
      s"snapshot bites must be budget-bounded: ${bites.map(_.size)}")
    assert(bites.take(5).flatten === manifest,
      "snapshot bites must cover the manifest exactly once, in order")
    // without a budget the snapshot stays ONE bite (no behavior change)
    val one = mkStream(dir, maxBytes = None)
    val (bites1, _) = drainBites(one,
      one.initialOffset().asInstanceOf[VersionOffset])
    assert(bites1.size === 1 && manifest.toSet.subsetOf(bites1.head.toSet),
      "budget-less streams keep the one-bite snapshot")
  }

  test("mid-snapshot restart resumes from the file cursor exactly-once " +
      "(fresh stream instance, offset rehydrated from JSON)") {
    val dir = freshDir()
    seed(dir, nFiles = 4, rows = 400)
    val manifest = SnapshotLog.filesOf(spark, dir, 1L)
    val s1 = mkStream(dir, maxBytes = Some(1L))
    val first = s1.initialOffset().asInstanceOf[VersionOffset]
    val next = s1.latestOffset(first, ReadLimit.allAvailable())
      .asInstanceOf[VersionOffset]
    val bite1 = s1.planInputPartitions(first, next)
      .map(_.asInstanceOf[SnapshotFilePartition].path).toSeq
    assert(next.files === 1L, s"expected an in-flight cursor, got $next")
    // "restart": a new stream instance deserializes the checkpointed
    // offset and continues — the union must be the manifest exactly once
    val s2 = mkStream(dir, maxBytes = Some(1L))
    val resumed = s2.deserializeOffset(next.json())
      .asInstanceOf[VersionOffset]
    val (rest, _) = drainBites(s2, resumed)
    assert((bite1 ++ rest.flatten) === manifest,
      "restarted drain must neither skip nor re-emit snapshot files")
    // and a restart that DROPPED the budget option still finishes the
    // in-flight snapshot (cursor wins over the missing option)
    val s3 = mkStream(dir, maxBytes = None)
    val (rest3, _) = drainBites(s3, resumed)
    assert((bite1 ++ rest3.flatten) === manifest)
  }

  test("replicate bootstraps a 100-file-scale source in bounded merge " +
      "commits under AvailableNow, exactly-once across drains") {
    val src = freshDir()
    val dst = freshDir()
    val ckpt = Files.createTempDirectory("boot-ckpt").toString
    seed(src, nFiles = 4, rows = 200)
    def drainReplica(): Unit = {
      val q = SnapshotLog.replicate(spark, src, dst, Seq("k"), ckpt,
        maxBytesPerTrigger = Some(1L))
      q.awaitTermination(180000)
    }
    drainReplica()
    // the bootstrap landed as MULTIPLE bounded merge commits (one per
    // file bite), not one table-sized batch
    val dstVersions = SnapshotLog.versions(spark, dst)
    assert(dstVersions.size >= 4,
      s"bootstrap should take ≥4 bounded commits, took ${dstVersions.size}")
    def sorted(d: String) = SnapshotLog.read(spark, d)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(sorted(dst) === sorted(src))
    // incremental catch-up afterwards stays version-grain and converges
    SnapshotLog.updateWhere(spark, src, col("k") === 0L,
      Map("v" -> lit("updated")))
    drainReplica()
    assert(sorted(dst) === sorted(src))
    // idle drain: no new replica commits
    val before = SnapshotLog.versions(spark, dst).last
    drainReplica()
    assert(SnapshotLog.versions(spark, dst).last === before)
  }

  test("randomized drains: any (file count, budget, restart point) " +
      "sequence covers the snapshot + tail exactly once, in order") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 6).foreach { trial =>
      val dir = freshDir()
      val nFiles = 1 + rnd.nextInt(6)
      seed(dir, nFiles, rows = 100L * nFiles)
      val nAppends = rnd.nextInt(3)
      (0 until nAppends).foreach(i =>
        SnapshotLog.append(spark, dir,
          Seq((5000L + i, s"a$i")).toDF("k", "v")))
      val manifest = SnapshotLog.filesOf(spark, dir, 1L)
      // drain with a fresh stream instance after EVERY bite (the
      // harshest restart schedule), under a random byte budget that
      // may or may not split the snapshot
      val budget = if (rnd.nextBoolean()) Some(1L + rnd.nextInt(2000).toLong)
        else Some(1L)
      val emitted = scala.collection.mutable.ArrayBuffer[String]()
      var cur = mkStream(dir, budget).initialOffset()
        .asInstanceOf[VersionOffset]
      var spins = 0
      while (spins < 50) {
        spins += 1
        val st = mkStream(dir, budget) // restart: new instance each bite
        val resumed = st.deserializeOffset(cur.json())
          .asInstanceOf[VersionOffset]
        val next = st.latestOffset(resumed, ReadLimit.allAvailable())
          .asInstanceOf[VersionOffset]
        if (next == resumed) spins = 50
        else {
          emitted ++= st.planInputPartitions(resumed, next)
            .map(_.asInstanceOf[SnapshotFilePartition].path)
          cur = next
        }
      }
      assert(emitted.take(manifest.size).toSeq === manifest,
        s"trial $trial (files=$nFiles budget=$budget): snapshot not " +
          "covered exactly once in manifest order")
      assert(emitted.size === manifest.size + nAppends,
        s"trial $trial: appended versions must follow, one file each " +
          s"(got ${emitted.size}, want ${manifest.size + nAppends})")
      assert(emitted.distinct.size === emitted.size,
        s"trial $trial: a file was emitted twice")
    }
  }

  test("a vacuumed mid-snapshot bootstrap refuses loudly instead of " +
      "silently skipping the un-emitted tail") {
    val dir = freshDir()
    seed(dir, nFiles = 4, rows = 400)
    SnapshotLog.append(spark, dir, Seq((1000L, "x")).toDF("k", "v"))
    val s1 = mkStream(dir, maxBytes = Some(1L))
    val first = s1.initialOffset().asInstanceOf[VersionOffset]
    val mid = s1.latestOffset(first, ReadLimit.allAvailable())
      .asInstanceOf[VersionOffset]
    assert(mid.files === 1L)
    // the snapshot version disappears while the bootstrap is mid-cursor
    SnapshotLog.vacuum(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    assert(!SnapshotLog.versions(spark, dir).contains(1L))
    val s2 = mkStream(dir, maxBytes = Some(1L))
    val resumed = s2.deserializeOffset(mid.json())
      .asInstanceOf[VersionOffset]
    // both the admission walk and checkpoint-recovery planning refuse
    val e1 = intercept[IllegalArgumentException](
      s2.latestOffset(resumed, ReadLimit.allAvailable()))
    assert(e1.getMessage.contains("initial snapshot"),
      s"admission must refuse: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException](
      s2.planInputPartitions(resumed,
        VersionOffset(2L, resumed.start)))
    assert(e2.getMessage.contains("initial snapshot"),
      s"recovery planning must refuse: ${e2.getMessage}")
  }

  test("CDF stream starting ON a recorded rewrite commit (predecessor " +
      "retained) serves its recorded changes — span-start parity with " +
      "the batch changeFeed view") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    SnapshotLog.deleteWhere(spark, dir, col("k") === 1L) // recorded rewrite
    val vDel = SnapshotLog.versions(spark, dir).last
    val ckpt = Files.createTempDirectory("spanstart-ckpt").toString
    val q = spark.readStream
      .format("graft.sources.SnapshotStreamSource")
      .option("path", dir).option("readChangeFeed", "true")
      .option("startingVersion", vDel.toString).load()
      .writeStream.format("memory").queryName("cdf_spanstart")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("cdf_spanstart")
      .select("k", "_change_type").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "delete")),
      s"start-on-rewrite must serve the recorded delete, got $got")
  }
}
