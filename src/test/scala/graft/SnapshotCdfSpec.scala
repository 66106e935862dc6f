package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Contract of [[SnapshotLog.changesBetween]] — the snapshot log's
  * change data feed: row-accurate insert/delete/update images derived
  * from manifests alone, COW-survivor cancellation, file-grain read
  * cost, schema-evolution alignment, and the replica-sync law
  * (applyChanges ∘ feed == source). */
class SnapshotCdfSpec extends AnyFunSuite with SparkFixture {

  private def freshDir() =
    Files.createTempDirectory("snapcdf").toString + "/tbl"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(r.fieldIndex("_change_type")))).toSet

  test("append feeds inserts; COW delete feeds ONLY the deleted rows (survivors cancel)") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, spark.range(0, 400)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("k")))
    SnapshotLog.commitBatch(spark, dir, spark.range(400, 410)
      .select(col("id").as("k"), lit(99L).as("v")), 0L)
    val appendFeed = SnapshotLog.changesBetween(spark, dir, 1L, 2L)
    assert(rows(appendFeed) ===
      (400L until 410L).map(k => (k, 99L, "insert")).toSet)
    // deleteWhere rewrites the whole top file (100 rows) to drop 50;
    // the 50 surviving rewritten rows must NOT appear in the feed
    SnapshotLog.deleteWhere(spark, dir, col("k") >= 350 && col("k") < 400)
    val delFeed = SnapshotLog.changesBetween(spark, dir, 2L, 3L)
    assert(rows(delFeed) ===
      (350L until 400L).map(k => (k, k % 7, "delete")).toSet)
    // spanning feed composes: (1 → 3) = append minus the later deletes
    assert(rows(SnapshotLog.changesBetween(spark, dir, 1L, 3L)) ===
      ((400L until 410L).map(k => (k, 99L, "insert")) ++
        (350L until 400L).map(k => (k, k % 7, "delete"))).toSet)
    // zero-length window: empty feed
    assert(SnapshotLog.changesBetween(spark, dir, 2L, 2L).count() === 0)
  }

  test("keyed feed labels update pre/post images; inserts and deletes keep their type") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, spark.range(0, 100)
      .select(col("id").as("k"), (col("id") % 7).as("v")))
    val changes = Seq((10L, 1000L, false), (60L, -1L, true),
      (5000L, 7L, false)).toDF("k", "v", "is_del")
    SnapshotLog.merge(spark, dir, changes, Seq("k"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))
    val feed = SnapshotLog.changesBetween(spark, dir, 1L, 2L, keys = Seq("k"))
    assert(rows(feed) === Set(
      (10L, 3L, "update_preimage"), (10L, 1000L, "update_postimage"),
      (60L, 4L, "delete"), (5000L, 7L, "insert")))
  }

  test("COW UPDATE feeds as update pre/post images; untouched rows cancel") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, spark.range(0, 100)
      .select(col("id").as("k"), (col("id") % 7).as("v")).coalesce(2))
    SnapshotLog.updateWhere(spark, dir, col("k") === 10L || col("k") === 60L,
      Map("v" -> (col("v") + 1000L)))
    val feed = SnapshotLog.changesBetween(spark, dir, 1L, 2L, keys = Seq("k"))
    assert(rows(feed) === Set(
      (10L, 3L, "update_preimage"), (10L, 1003L, "update_postimage"),
      (60L, 4L, "update_preimage"), (60L, 1004L, "update_postimage")),
      "COW survivors rewritten verbatim must cancel out of the feed")
  }

  test("a subscriber whose cursor fell behind retention fails loudly") {
    import spark.implicits._
    val dir = freshDir()
    val cursor = dir + ".cursor"
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    // first poll + ack pins the cursor at v1
    val (_, v1) = SnapshotLog.pollChanges(spark, dir, cursor).get
    SnapshotLog.ackChanges(spark, dir, cursor, v1)
    SnapshotLog.commit(spark, dir, Seq((2L, "b")).toDF("k", "v"))
    SnapshotLog.commit(spark, dir, Seq((3L, "c")).toDF("k", "v"))
    // retention outruns the consumer: v1 is vacuumed away
    SnapshotLog.vacuum(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    // the poll must fail LOUDLY — a silent skip would lose the v1→v2
    // deletes and corrupt every replica downstream. The refusal names
    // the CURSOR FILE (which subscriber is stuck), the retained range,
    // and the recovery path (clear the replica + delete the cursor →
    // full re-bootstrap; widen retention to prevent recurrence) — not
    // the bare changesBetween message that names neither.
    val e = intercept[IllegalStateException](
      SnapshotLog.pollChanges(spark, dir, cursor))
    assert(e.getMessage.contains(cursor),
      s"refusal must name the cursor file: ${e.getMessage}")
    assert(e.getMessage.contains("retained"), e.getMessage)
    assert(e.getMessage.contains("delete the cursor file") &&
      e.getMessage.contains("keepLast"),
      s"refusal must state the recovery path: ${e.getMessage}")
    // bounded admission changes nothing: the span is gone either way
    val eAdm = intercept[IllegalStateException](
      SnapshotLog.pollChanges(spark, dir, cursor, maxVersions = Some(1L)))
    assert(eAdm.getMessage.contains(cursor))
    // re-seeding: a fresh cursor re-delivers the full current table
    val f = new org.apache.hadoop.fs.Path(cursor)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(cursor), false)
    val (feed, _) = SnapshotLog.pollChanges(spark, dir, cursor).get
    assert(feed.count() === 1L) // the current table, as inserts
  }

  test("snapshot_changes TVF: the feed is queryable from pure SQL") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    SnapshotLog.merge(spark, dir, Seq((2L, "b2"), (3L, "c")).toDF("k", "v"),
      keys = Seq("k"))
    val got = spark.sql(
      s"""SELECT k, v, _change_type FROM snapshot_changes('$dir', 1, 2, 'k')
         |ORDER BY k, _change_type""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    assert(got === Seq((2L, "b2", "update_postimage"),
      (2L, "b", "update_preimage"), (3L, "c", "insert")))
    // composes with SQL aggregates like any relation
    assert(spark.sql(s"""SELECT count(*) FROM snapshot_changes('$dir', 1, 2)
      |WHERE _change_type = 'insert'""".stripMargin).head.getLong(0) >= 1L)
  }

  test("replica-sync law: applyChanges reproduces the source version over version") {
    import spark.implicits._
    val srcDir = freshDir(); val repDir = freshDir()
    val seed = spark.range(0, 300).select(col("id").as("k"),
      (col("id") % 13).as("v")).repartitionByRange(3, col("k"))
    SnapshotLog.commit(spark, srcDir, seed)
    SnapshotLog.commit(spark, repDir, seed)
    // source evolves: a churny merge, then a predicate delete
    SnapshotLog.merge(spark, srcDir,
      Seq((7L, 700L, false), (8L, 800L, false), (100L, -1L, true),
        (900L, 9L, false)).toDF("k", "v", "is_del"),
      Seq("k"), deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))
    SnapshotLog.deleteWhere(spark, srcDir, col("k") % 29 === 0)
    def table(dir: String) = SnapshotLog.read(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // replay each source version transition onto the replica
    SnapshotLog.applyChanges(spark, repDir,
      SnapshotLog.changesBetween(spark, srcDir, 1L, 2L, Seq("k")), Seq("k"))
    assert(table(repDir) === SnapshotLog.read(spark, srcDir, Some(2L))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    SnapshotLog.applyChanges(spark, repDir,
      SnapshotLog.changesBetween(spark, srcDir, 2L, 3L, Seq("k")), Seq("k"))
    assert(table(repDir) === table(srcDir))
  }

  test("file-grain cost: a feed between appends opens only the appended files") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, spark.range(0, 4000)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(8, col("k")))
    SnapshotLog.commitBatch(spark, dir, spark.range(4000, 4010)
      .select(col("id").as("k"), lit(1L).as("v")).coalesce(1), 0L)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val feed = SnapshotLog.changesBetween(spark, dir, 1L, 2L)
      // collect() drives feed's OWN cached execution — count() would
      // plan a separate job whose scan metrics we can't reach
      assert(feed.collect().length === 10)
      val scans = feed.queryExecution.executedPlan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val filesRead = scans.map(_.metrics("numFiles").value).sum
      assert(filesRead === 1,
        s"feed must open ONLY the appended commit's file, read $filesRead; " +
          s"scans=${scans.map(s => s.metrics("numFiles").value + ":" +
            s.relation.location.inputFiles.mkString("|")).mkString(" ;; ")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("compaction is CDF-silent: optimize's pure rewrite yields an empty feed") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, spark.range(0, 300)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartition(6, col("k"))) // 6 small files, hash-scattered
    val vOpt = SnapshotLog.optimize(spark, dir, targetFiles = 1,
      clusterBy = Seq("k"))
    assert(vOpt === 2L)
    // every row moved files, yet NO row changed — survivor cancellation
    // must make the feed exactly empty, not 300 deletes + 300 inserts
    assert(SnapshotLog.changesBetween(spark, dir, 1L, 2L).count() === 0)
    // and a feed SPANNING the compaction carries only the real change
    SnapshotLog.merge(spark, dir,
      spark.range(5, 6).select(col("id").as("k"), lit(999L).as("v")),
      Seq("k"))
    val feed = SnapshotLog.changesBetween(spark, dir, 1L, 3L, keys = Seq("k"))
    assert(feed.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2))).toSet ===
      Set((5L, 5L, "update_preimage"), (5L, 999L, "update_postimage")))
  }

  test("feed spanning a schema widening aligns both sides to the later schema") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, 5L), (2L, 6L)).toDF("k", "v"))
    SnapshotLog.merge(spark, dir,
      Seq((2L, 60L, 0.5), (3L, 70L, 0.9)).toDF("k", "v", "score"), Seq("k"))
    val feed = SnapshotLog.changesBetween(spark, dir, 1L, 2L, keys = Seq("k"))
    assert(feed.columns.toSeq === Seq("k", "v", "score", "_change_type"))
    val got = feed.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      r.getString(3))).toSet
    assert(got === Set(
      (2L, 6L, None, "update_preimage"),
      (2L, 60L, Some(0.5), "update_postimage"),
      (3L, 70L, Some(0.9), "insert")))
    // vacuumed fromV: the feed refuses rather than fabricating a diff
    SnapshotLog.vacuum(spark, dir, keepLast = 1)
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.changesBetween(spark, dir, 1L, 2L)
    }
    assert(e.getMessage.contains("retained"))
  }
  test("poll/ack subscription: replica loop converges; re-poll after crash re-delivers") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("poll-src").toString
    val rep = java.nio.file.Files.createTempDirectory("poll-rep").toString
    val cursor = s"$rep/_cursor"

    def syncOnce(): Unit =
      SnapshotLog.pollChanges(spark, src, cursor, keys = Seq("k")).foreach {
        case (feed, upto) =>
          SnapshotLog.applyChanges(spark, rep, feed, Seq("k"))
          SnapshotLog.ackChanges(spark, src, cursor, upto)
      }
    def assertParity(): Unit = {
      val a = SnapshotLog.read(spark, src).orderBy("k")
        .collect().map(_.toSeq).toSeq
      val b = SnapshotLog.read(spark, rep).orderBy("k")
        .collect().map(_.toSeq).toSeq
      assert(a === b, "replica != source after sync")
    }

    SnapshotLog.commit(spark, src,
      (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v"))
    syncOnce(); assertParity()
    // caught up: next poll is None
    assert(SnapshotLog.pollChanges(spark, src, cursor, Seq("k")).isEmpty)

    // churn: keyed merge (update + insert) then a MoR delete
    SnapshotLog.merge(spark, src,
      Seq((1L, "v1b"), (999L, "new")).toDF("k", "v"), Seq("k"))
    SnapshotLog.deleteWhereMoR(spark, src, col("k") === 2L)
    syncOnce(); assertParity()

    // compact the vector away (rewriting verbs refuse while it stands);
    // the compaction version itself is feed-silent but advances the
    // cursor through the loop
    SnapshotLog.applyDeletionVectors(spark, src)
    syncOnce(); assertParity()

    // crash between poll and ack: re-delivery is harmless (keyed apply)
    SnapshotLog.merge(spark, src, Seq((3L, "v3b")).toDF("k", "v"), Seq("k"))
    val (feed1, upto1) =
      SnapshotLog.pollChanges(spark, src, cursor, Seq("k")).get
    SnapshotLog.applyChanges(spark, rep, feed1, Seq("k"))
    // crash: no ack — the next poll re-delivers the same span
    val (feed2, upto2) =
      SnapshotLog.pollChanges(spark, src, cursor, Seq("k")).get
    assert(upto2 === upto1)
    SnapshotLog.applyChanges(spark, rep, feed2, Seq("k"))
    SnapshotLog.ackChanges(spark, src, cursor, upto2)
    assertParity()
  }

  test("bounded catch-up: pollChanges maxVersions admission — a lagging " +
      "subscriber converges ack by ack with replica parity") {
    import spark.implicits._
    val src = freshDir()
    val rep = freshDir()
    SnapshotLog.commit(spark, src,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "n"))       // v1
    SnapshotLog.append(spark, src, Seq((4L, 40L)).toDF("k", "n")) // v2
    SnapshotLog.updateWhere(spark, src, col("k") === 1L,
      Map("n" -> (col("n") + 1L)))                                // v3
    SnapshotLog.deleteWhere(spark, src, col("k") === 2L)          // v4
    SnapshotLog.append(spark, src, Seq((5L, 50L)).toDF("k", "n")) // v5
    val cursor = Files.createTempDirectory("bounded-cur").toString + "/c"
    var polls = 0
    var acked = Seq.empty[Long]
    var done = false
    while (!done && polls < 10) {
      SnapshotLog.pollChanges(spark, src, cursor, Seq("k"),
        maxVersions = Some(1L)) match {
        case None => done = true
        case Some((feed, upTo)) =>
          polls += 1
          SnapshotLog.applyChanges(spark, rep, feed, Seq("k"))
          SnapshotLog.ackChanges(spark, src, cursor, upTo)
          acked :+= upTo
      }
    }
    // m=1: the bootstrap bite is the table AS OF v1, then one version
    // per poll — five bounded bites, acks climbing 1,2,3,4,5
    assert(polls === 5 && acked === Seq(1L, 2L, 3L, 4L, 5L),
      s"expected 5 single-version bites, got $polls acks=$acked")
    val got = SnapshotLog.read(spark, rep).orderBy("k")
      .as[(Long, Long)].collect().toSeq
    val want = SnapshotLog.read(spark, src).orderBy("k")
      .as[(Long, Long)].collect().toSeq
    assert(got === want, s"replica diverged: $got vs $want")
    // the TVF speaks the same admission: reset cursor, poll bounded
    val c2 = Files.createTempDirectory("bounded-cur").toString + "/c"
    val p1 = spark.sql(s"SELECT * FROM snapshot_poll_changes('$src', " +
      s"'$c2', 'k', 1)")
    assert(p1.select("_poll_version").distinct().as[Long].head() === 1L)
    assert(p1.count() === 3, "bounded first bite must be the v1 table")
  }

  test("byte-bounded catch-up: pollChanges maxBytes admission — tiny " +
      "budgets bite version by version (first pending always rides), " +
      "big budgets serve the span, bytes tighten maxVersions") {
    import spark.implicits._
    val src = freshDir()
    val rep = freshDir()
    SnapshotLog.commit(spark, src,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "n"))                   // v1
    SnapshotLog.append(spark, src, Seq((3L, 30L)).toDF("k", "n")) // v2
    SnapshotLog.append(spark, src, Seq((4L, 40L)).toDF("k", "n")) // v3
    SnapshotLog.append(spark, src, Seq((5L, 50L)).toDF("k", "n")) // v4
    // budget=1 byte: bootstrap serves the table AS OF the EARLIEST
    // version (a fat first version rides alone), then one version per
    // poll — the crossing version is always included
    val cursor = Files.createTempDirectory("bytes-cur").toString + "/c"
    var acked = Seq.empty[Long]
    var done = false
    while (!done && acked.size < 10) {
      SnapshotLog.pollChanges(spark, src, cursor, Seq("k"),
        maxBytes = Some(1L)) match {
        case None => done = true
        case Some((feed, upTo)) =>
          SnapshotLog.applyChanges(spark, rep, feed, Seq("k"))
          SnapshotLog.ackChanges(spark, src, cursor, upTo)
          acked :+= upTo
      }
    }
    assert(acked === Seq(1L, 2L, 3L, 4L),
      s"expected four 1-byte-budget bites, got $acked")
    assert(SnapshotLog.read(spark, rep).orderBy("k")
      .as[(Long, Long)].collect().toSeq ===
      SnapshotLog.read(spark, src).orderBy("k")
        .as[(Long, Long)].collect().toSeq)
    // a huge budget serves the remaining span in one bite
    val c2 = Files.createTempDirectory("bytes-cur").toString + "/c"
    SnapshotLog.ackChanges(spark, src, c2, 1L)
    val (_, upTo) = SnapshotLog.pollChanges(spark, src, c2, Seq("k"),
      maxBytes = Some(Long.MaxValue / 2)).get
    assert(upTo === 4L, s"big budget must reach latest, got $upTo")
    // bytes TIGHTEN the version cap (never widen it)
    val c3 = Files.createTempDirectory("bytes-cur").toString + "/c"
    SnapshotLog.ackChanges(spark, src, c3, 1L)
    val (_, upTo3) = SnapshotLog.pollChanges(spark, src, c3, Seq("k"),
      maxVersions = Some(3L), maxBytes = Some(1L)).get
    assert(upTo3 === 2L,
      s"1-byte budget under maxVersions=3 must stop at v2, got $upTo3")
    // the TVF speaks the same admission (5th arg)
    val c4 = Files.createTempDirectory("bytes-cur").toString + "/c"
    spark.sql(s"SELECT * FROM snapshot_poll_changes('$src', '$c4', " +
      "'k', 10, 1)")
      .select("_poll_version").distinct().as[Long].head() match {
      case v => assert(v === 1L, s"TVF byte budget ignored: $v")
    }
    // and refuses a nonsense budget loudly
    val e = intercept[IllegalArgumentException](
      SnapshotLog.pollChanges(spark, src, c4, Seq("k"),
        maxBytes = Some(0L)))
    assert(e.getMessage.contains("maxBytes"))
  }

  test("randomized subscription: arbitrary verb histories drain through " +
      "bounded poll/ack loops with replica parity at every convergence") {
    import spark.implicits._
    val rnd = new scala.util.Random(13L)
    (1 to 3).foreach { trial =>
      val src = freshDir()
      val rep = freshDir()
      val cursor = Files.createTempDirectory("rand-cur").toString + "/c"
      var nextKey = 100L
      SnapshotLog.commit(spark, src,
        (0L until 10L).map(k => (k, k * 10)).toDF("k", "n"))
      def randomVerb(): Unit = rnd.nextInt(4) match {
        case 0 =>
          SnapshotLog.append(spark, src,
            Seq((nextKey, nextKey)).toDF("k", "n")); nextKey += 1
        case 1 =>
          val keys = SnapshotLog.read(spark, src)
            .select("k").as[Long].collect()
          if (keys.nonEmpty)
            SnapshotLog.updateWhere(spark, src,
              col("k") === keys(rnd.nextInt(keys.length)),
              Map("n" -> (col("n") + 1000L)))
        case 2 =>
          val keys = SnapshotLog.read(spark, src)
            .select("k").as[Long].collect()
          if (keys.length > 2)
            SnapshotLog.deleteWhere(spark, src,
              col("k") === keys(rnd.nextInt(keys.length)))
        case 3 =>
          SnapshotLog.merge(spark, src,
            Seq((nextKey, nextKey * 2L, false), (0L, -1L, false))
              .toDF("k", "n", "is_del"),
            keys = Seq("k"), deleteWhen = Some(col("is_del")),
            dropCols = Seq("is_del")); nextKey += 1
      }
      def drainAndCheck(): Unit = {
        val m = 1L + rnd.nextInt(3)
        var spins = 0
        var done = false
        while (!done && spins < 40) {
          spins += 1
          SnapshotLog.pollChanges(spark, src, cursor, Seq("k"),
            maxVersions = Some(m)) match {
            case None => done = true
            case Some((feed, upTo)) =>
              SnapshotLog.applyChanges(spark, rep, feed, Seq("k"))
              SnapshotLog.ackChanges(spark, src, cursor, upTo)
          }
        }
        assert(done, s"trial $trial: poll loop did not converge")
        val got = SnapshotLog.read(spark, rep).orderBy("k")
          .as[(Long, Long)].collect().toSeq
        val want = SnapshotLog.read(spark, src).orderBy("k")
          .as[(Long, Long)].collect().toSeq
        assert(got === want,
          s"trial $trial: replica diverged (maxVersions=$m)")
      }
      (1 to 3).foreach { _ =>
        randomVerb(); randomVerb()
        drainAndCheck()
      }
    }
  }

  test("reserved marker names are guarded CENTRALLY: enabling the feed " +
      "on a clashing schema refuses, and every recording verb — not " +
      "just merge — refuses when the clash arrives later") {
    import spark.implicits._
    // enable-time refusal: the table already owns _change_type
    val clash = freshDir()
    SnapshotLog.commit(spark, clash,
      Seq((1L, "user-owned")).toDF("k", "_change_type"))
    val e1 = intercept[IllegalArgumentException](
      SnapshotLog.setTableProperties(spark, clash,
        Map(SnapshotLog.ChangeFeedProperty -> "true")))
    assert(e1.getMessage.contains("_change_type"))
    // post-enable clash refuses at the CREATION path (ADD/RENAME), so
    // recording verbs never meet it
    val late = freshDir()
    SnapshotLog.commit(spark, late, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, late,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    val e2 = intercept[IllegalArgumentException](
      SnapshotLog.addColumns(spark, late,
        Seq(org.apache.spark.sql.types.StructField("__del",
          org.apache.spark.sql.types.BooleanType))))
    assert(e2.getMessage.contains("__del"))
    val e3 = intercept[IllegalArgumentException](
      SnapshotLog.renameColumn(spark, late, "v", "_change_type"))
    assert(e3.getMessage.contains("_change_type"))
    // a clash smuggled past the creation guards (full-replace commit
    // carries its own schema) still refuses at the next RECORDING verb
    // — while zero-change maintenance (optimize) keeps working, since
    // it writes no marker column
    SnapshotLog.commit(spark, late,
      Seq((1L, "a", false), (2L, "b", false)).toDF("k", "v", "__del"))
    SnapshotLog.optimize(spark, late, smallFileBytes = Long.MaxValue,
      targetFiles = 1)
    val e4 = intercept[IllegalArgumentException](
      SnapshotLog.deleteWhere(spark, late, col("k") === 1L))
    assert(e4.getMessage.contains("__del"),
      s"recording verb must refuse the smuggled clash: ${e4.getMessage}")
    // the table itself is untouched and still readable
    assert(SnapshotLog.read(spark, late).count() === 2)
  }

  test("the feed reserves its OUTPUT marker names too: _commit_version " +
      "(changeFeed/CDF-stream fill) and _poll_version (poll TVF) refuse " +
      "at enable time and at ADD/RENAME") {
    import spark.implicits._
    // enable-time refusal: a user column named _commit_version would be
    // silently clobbered by shape()'s withColumn in every feed read
    val clash = freshDir()
    SnapshotLog.commit(spark, clash,
      Seq((1L, 7L)).toDF("k", "_commit_version"))
    val e1 = intercept[IllegalArgumentException](
      SnapshotLog.setTableProperties(spark, clash,
        Map(SnapshotLog.ChangeFeedProperty -> "true")))
    assert(e1.getMessage.contains("_commit_version"))
    // post-enable: ADD/RENAME of either output marker refuses
    val late = freshDir()
    SnapshotLog.commit(spark, late, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, late,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    val e2 = intercept[IllegalArgumentException](
      SnapshotLog.addColumns(spark, late,
        Seq(org.apache.spark.sql.types.StructField("_poll_version",
          org.apache.spark.sql.types.LongType))))
    assert(e2.getMessage.contains("_poll_version"))
    val e3 = intercept[IllegalArgumentException](
      SnapshotLog.renameColumn(spark, late, "v", "_commit_version"))
    assert(e3.getMessage.contains("_commit_version"))
    // with the feed OFF the names stay ordinary columns
    val plain = freshDir()
    SnapshotLog.commit(spark, plain,
      Seq((1L, 7L)).toDF("k", "_commit_version"))
    assert(SnapshotLog.read(spark, plain)
      .select("_commit_version").as[Long].head() === 7L)
  }
}
