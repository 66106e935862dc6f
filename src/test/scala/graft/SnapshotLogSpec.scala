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
    // with the default grace period the fresh orphan is PROTECTED — it
    // could be a commit in flight (data lands before the manifest)
    val (v0, f0) = SnapshotLog.vacuum(spark, dir, keepLast = 1)
    assert(v0 === 0 && f0 === 0)
    assert(new java.io.File(s"$dir/data/crashed-commit").exists())
    // once past the grace window (forced to 0 here) it is reclaimed
    val (droppedVs, droppedFiles) =
      SnapshotLog.vacuum(spark, dir, keepLast = 1, orphanGraceMs = 0L)
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
    val filesV1 = spark.read.textFile(s"$dir/_log/v1.manifest").collect()
      .filterNot(_.startsWith("#")).toSet
    val v = SnapshotLog.deleteWhere(spark, dir, col("k") >= 350)
    assert(v === 2L)
    val filesV2 = spark.read.textFile(s"$dir/_log/v2.manifest").collect()
      .filterNot(_.startsWith("#")).toSet
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

  test("deleteWhere keeps rows where the predicate is NULL (3VL safety)") {
    import spark.implicits._
    val dir = freshDir()
    // email is null for half the rows; deleting email='x' must only
    // remove the definite matches — NULL-predicate rows are NOT matches
    val df = Seq((1L, "x"), (2L, null), (3L, "y"), (4L, null))
      .toDF("k", "email")
    SnapshotLog.commit(spark, dir, df)
    SnapshotLog.deleteWhere(spark, dir, col("email") === "x")
    val left = SnapshotLog.read(spark, dir).orderBy("k")
      .collect().map(_.getLong(0)).toSeq
    assert(left === Seq(2L, 3L, 4L),
      "rows with NULL predicate must survive a deleteWhere")
  }

  test("batch replay guard survives an intervening non-batch commit") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commitBatch(spark, dir, Seq(1L, 2L).toDF("k"), 0L)
    SnapshotLog.commitBatch(spark, dir, Seq(3L, 4L).toDF("k"), 1L)
    // a deleteWhere lands between batch 1 and its at-least-once replay:
    // the latest manifest now has NO #batch header
    SnapshotLog.deleteWhere(spark, dir, col("k") === 1L)
    val before = SnapshotLog.read(spark, dir).count()
    val v = SnapshotLog.commitBatch(spark, dir, Seq(3L, 4L).toDF("k"), 1L)
    assert(v === SnapshotLog.versions(spark, dir).last)
    assert(SnapshotLog.read(spark, dir).count() === before,
      "replayed batch must not double-commit after a non-batch commit")
  }

  test("concurrent append vs delete: the loser rebases, nothing is lost") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir()
    SnapshotLog.commitBatch(spark, dir,
      spark.range(0, 100).select(col("id").as("k")), 0L)
    // race a batch append (new rows 100..199) against a targeted delete
    // (drop k < 10): whatever order they serialize in, the final table
    // must hold exactly 10..199 — a lost update would drop one side
    val fa = Future(SnapshotLog.commitBatch(spark, dir,
      spark.range(100, 200).select(col("id").as("k")), 1L))
    val fd = Future(SnapshotLog.deleteWhere(spark, dir, col("k") < 10))
    Await.result(fa, Duration("120s")); Await.result(fd, Duration("120s"))
    // whichever order they serialize in, the loser rebases: delete-first
    // ⇒ the append carries the delete's survivors; append-first ⇒ the
    // delete recomputes over the appended table. Both end at 10..199.
    val ks = SnapshotLog.read(spark, dir).collect().map(_.getLong(0)).toSet
    assert(ks === (10L until 200L).toSet,
      s"lost update: got ${ks.size} rows, missing=${(10L until 200L).toSet.diff(ks).take(5)}")
  }

  test("lost-race rewrite attempts reclaim their files eagerly: no " +
      "unreferenced data dirs accumulate on contended tables (round 12)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      spark.range(0, 100).select(col("id").as("k")).coalesce(1))
    // contended rewrites of the SAME file: every lost race used to
    // orphan that attempt's survivor files under a dead uuid dir
    val deleters = (0 until 4).map(i =>
      Future(SnapshotLog.deleteWhere(spark, dir, col("k") === i.toLong)))
    deleters.foreach(Await.result(_, Duration("120s")))
    assert(SnapshotLog.read(spark, dir).count() === 96L)
    // replaceWhere has its own survivor-rewrite dir per attempt — race
    // two disjoint regions living in the same file
    val repl = Seq((10L, 20L), (20L, 30L)).map { case (lo, hi) =>
      Future(SnapshotLog.replaceWhere(spark, dir,
        Seq(lo, lo + 1).toDF("k"), col("k") >= lo && col("k") < hi))
    }
    repl.foreach(Await.result(_, Duration("120s")))
    assert(SnapshotLog.read(spark, dir).count() === 80L) // 96 - 20 + 4
    // every data file on disk must be referenced by SOME retained
    // manifest — raced attempts clean up after themselves now
    val f = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val referenced = SnapshotLog.referencedFiles(spark, dir)
      .map(p => new Path(p).toUri.getPath)
    val onDisk = scala.collection.mutable.ArrayBuffer[String]()
    val it = f.listFiles(new Path(dir, "data"), true)
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getPath.getName.startsWith("part-"))
        onDisk += s.getPath.toUri.getPath
    }
    val orphans = onDisk.filterNot(referenced.contains)
    assert(orphans.isEmpty,
      s"raced rewrite attempts left ${orphans.size} orphan file(s): " +
        orphans.take(3).mkString(", "))
  }

  test("schema evolution: old versions read with typed nulls in added columns") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commitBatch(spark, dir, Seq((1L, "a")).toDF("k", "v"), 0L)
    SnapshotLog.commitBatch(spark, dir,
      Seq((2L, "b", 7.5)).toDF("k", "v", "score"), 1L)
    // latest version: union schema, old files backfilled with nulls
    val latest = SnapshotLog.read(spark, dir)
    assert(latest.columns.toSeq === Seq("k", "v", "score"))
    val rows = latest.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(rows === Seq((1L, "a", None), (2L, "b", Some(7.5))))
    // time travel to v1 keeps the NARROW schema it was committed under
    assert(SnapshotLog.read(spark, dir, Some(1)).columns.toSeq === Seq("k", "v"))
    // a type CHANGE on an existing column fails loudly, never corrupts
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.commitBatch(spark, dir, Seq((3, "c", 1.0)).toDF("k", "v", "score"), 2L)
    }
    assert(e.getMessage.contains("schema evolution"))
  }

  test("optimize compacts small files into a clustered version; history intact") {
    import spark.implicits._
    val dir = freshDir()
    // 8 small files, keys shuffled so pre-compaction min/max is useless
    val df = spark.range(0, 800)
      .select((col("id") * 389 % 800).as("k"), (col("id") % 7).as("v"))
      .repartition(8)
    SnapshotLog.commit(spark, dir, df)
    val filesBefore = spark.read.textFile(s"$dir/_log/v1.manifest")
      .collect().count(!_.startsWith("#"))
    assert(filesBefore === 8)
    val v = SnapshotLog.optimize(spark, dir, targetFiles = 2,
      clusterBy = Seq("k"))
    assert(v === 2L)
    val filesAfter = spark.read.textFile(s"$dir/_log/v2.manifest")
      .collect().count(!_.startsWith("#"))
    assert(filesAfter === 2, s"expected 2 compacted files, got $filesAfter")
    // identical rows, both versions readable
    val sum1 = SnapshotLog.read(spark, dir, Some(1)).agg(sum("k")).head.getLong(0)
    val sum2 = SnapshotLog.read(spark, dir, Some(2)).agg(sum("k")).head.getLong(0)
    assert(sum1 === sum2)
    assert(SnapshotLog.read(spark, dir, Some(2)).count() === 800)
    // range clustering: each compacted file's k-span covers ~half the
    // domain, so a point lookup prunes to one file (footer min/max)
    val byFile = SnapshotLog.read(spark, dir, Some(2))
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi")).collect()
    assert(byFile.length === 2)
    val spans = byFile.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans(0)._2 < spans(1)._1, "compacted files must not overlap in k")
    // a second optimize is a no-op (2 large-enough... still small files —
    // but fewer than the minimum of 2 after filtering? they are 2 small
    // files, so it would re-compact; verify idempotent row identity)
    val v3 = SnapshotLog.optimize(spark, dir, targetFiles = 2, clusterBy = Seq("k"))
    assert(v3 === 3L)
    assert(SnapshotLog.read(spark, dir).count() === 800)
    // vacuum reclaims the replaced small files once history is dropped
    val (dv, dfs) = SnapshotLog.vacuum(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    assert(dv >= 1 && dfs >= 8)
    assert(SnapshotLog.read(spark, dir).count() === 800)
  }

  test("optimize zorder clusters two dims so either column prunes") {
    import spark.implicits._
    val dir = freshDir()
    val df = spark.range(0, 4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
      .repartition(16)
    SnapshotLog.commit(spark, dir, df)
    SnapshotLog.optimize(spark, dir, targetFiles = 4,
      clusterBy = Seq("x", "y"), zorder = true)
    val byFile = SnapshotLog.read(spark, dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("xlo"), max("x").as("xhi"),
        min("y").as("ylo"), max("y").as("yhi")).collect()
    assert(byFile.length === 4)
    assert(SnapshotLog.read(spark, dir).count() === 4096)
    // z-clustering bounds BOTH dims per file: every file's x-span and
    // y-span must each be a strict subset of the full domain (a linear
    // sort on x alone would leave y-spans full-width in every file)
    val fullX = 63L; val fullY = 63L
    val xTight = byFile.count(r => r.getLong(2) - r.getLong(1) < fullX)
    val yTight = byFile.count(r => r.getLong(4) - r.getLong(3) < fullY)
    assert(xTight >= 2 && yTight >= 2,
      s"z-order must tighten both dims: xTight=$xTight yTight=$yTight")
  }

  test("commitWithStats: range reads skip files from manifest stats, results exact") {
    val dir = freshDir()
    // range-clustered layout: 8 files with disjoint k ranges
    val df = spark.range(100)
      .select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))

    val (res, scanned, total) = SnapshotLog.readBetween(spark, dir, "k", 10, 19)
    assert(res.orderBy("k").collect().map(_.getLong(0)).toSeq
      === (10L to 19L))
    assert(total >= 4 && scanned < total,
      s"stats pruned nothing: $scanned of $total files scanned")

    // full range: everything scanned, everything returned
    val (all, s2, t2) = SnapshotLog.readBetween(spark, dir, "k", 0, 99)
    assert(all.count() === 100 && s2 === t2)

    // disjoint range: zero files scanned, empty frame with the schema
    val (none, s3, _) = SnapshotLog.readBetween(spark, dir, "k", 1000, 2000)
    assert(none.count() === 0 && s3 === 0)
    assert(none.columns.toSeq === Seq("k", "v"))

    // a stats-less commit stays readable — prune degrades to scan-all
    SnapshotLog.commit(spark, dir, df)
    val (res2, s4, t4) = SnapshotLog.readBetween(spark, dir, "k", 10, 19)
    assert(s4 === t4 && res2.count() === 10)
  }

  test("zone maps survive deleteWhere: carried files keep stats, rewrites recompute") {
    val dir = freshDir()
    val df = spark.range(100)
      .select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartitionByRange(8, col("k")).sortWithinPartitions("k")
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))
    // delete from one narrow range — most files carry, one rewrites
    SnapshotLog.deleteWhere(spark, dir, col("k").between(40, 44))
    val (res, scanned, total) = SnapshotLog.readBetween(spark, dir, "k", 10, 19)
    assert(res.count() === 10)
    assert(scanned < total,
      s"stats died at the rewrite: $scanned of $total files scanned")
    // the deleted range reads empty AND still prunes
    val (gone, s2, t2) = SnapshotLog.readBetween(spark, dir, "k", 40, 44)
    assert(gone.count() === 0 && s2 < t2)
  }

  test("commitWithStats rejects stat columns outside the encodable domain") {
    import spark.implicits._
    val dir = freshDir()
    // arrays have no order-preserving long/string encoding
    val e = intercept[IllegalArgumentException](
      SnapshotLog.commitWithStats(spark, dir,
        Seq((1L, Seq(0.5))).toDF("k", "x"), Seq("x")))
    assert(e.getMessage.contains("integral"))
  }
  test("history(): one row per version from manifests alone") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hist-log").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    graft.sources.SnapshotLog.commit(spark, dir, df)
    graft.sources.SnapshotLog.commitBatch(spark, dir, df, batchId = 7L)
    graft.sources.SnapshotLog.deleteWhere(spark, dir, col("k") === 1L)
    val h = graft.sources.SnapshotLog.history(spark, dir)
      .orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(h.map(r => Option(r.get(1))).toSeq ===
      Seq(None, Some(7L), None)) // only the batch commit is stamped
    assert(h.forall(_.getLong(2) > 0))   // n_files
    assert(h.forall(r => r.getLong(3) === 2L)) // n_columns from #schema=
    assert(h.forall(!_.getBoolean(4)))   // no deletion vectors here
    assert(h.map(_.getLong(5)).toSeq === Seq(0L, 0L, 0L)) // n_checks
    // replay_mark: the batch commit stamps itself; the rewrite carries
    // the high-water mark forward
    assert(h.map(r => Option(r.get(6))).toSeq ===
      Seq(None, Some(7L), Some(7L)))
    assert(h.forall(!_.isNullAt(7)))     // committed_at
  }

  test("SQL table functions: snapshot_of time travel and snapshot_history") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tvf-log").toString
    graft.sources.SnapshotLog.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    graft.sources.SnapshotLog.commit(spark, dir,
      Seq((1L, "a2")).toDF("k", "v"))

    val latest = spark.sql(s"SELECT k, v FROM snapshot_of('$dir') ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(latest === Seq((1L, "a2")))
    val v1 = spark.sql(s"SELECT k, v FROM snapshot_of('$dir', 1) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(v1 === Seq((1L, "a"), (2L, "b")))
    // composes with plain SQL (joins, aggregates) like any relation
    val joined = spark.sql(
      s"""SELECT count(*) FROM snapshot_of('$dir', 1) a
         |JOIN snapshot_of('$dir', 2) b ON a.k = b.k""".stripMargin)
      .head.getLong(0)
    assert(joined === 1L)

    val hist = spark.sql(s"SELECT version, n_files FROM snapshot_history('$dir')")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(hist === Seq(1L, 2L))

    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM snapshot_of('$dir', 99)").collect()
    }
    assert(bad.getMessage.contains("does not exist"))

    // TIMESTAMP AS OF from pure SQL: a timestamp after v1's commit and
    // before v2's resolves to v1 (manifest-mtime commit points)
    val t1 = new java.io.File(s"$dir/_log/v1.manifest").lastModified()
    val iso = java.time.Instant.ofEpochMilli(t1)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    val asOf = spark.sql(
      s"SELECT k, v FROM snapshot_of('$dir', TIMESTAMP '$iso') ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(asOf === Seq((1L, "a"), (2L, "b")),
      "TIMESTAMP AS OF must resolve to the version live at that instant")

    // snapshot_checks exposes the constraint register to pure SQL
    assert(spark.sql(s"SELECT * FROM snapshot_checks('$dir')").count() === 0)
    graft.sources.SnapshotLog.addCheck(spark, dir, "k_pos", "k > 0")
    val checks = spark.sql(
      s"SELECT name, expr FROM snapshot_checks('$dir')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(checks === Seq(("k_pos", "k > 0")))
  }

}
