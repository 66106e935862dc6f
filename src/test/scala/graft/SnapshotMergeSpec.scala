package graft

import graft.sources.{LongStat, Probe, SnapshotLog, StrStat}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Contract of [[SnapshotLog.merge]] — keyed copy-on-write MERGE INTO:
  * replace/insert/delete in one atomic version, rewrite cost bounded by
  * the files that actually hold a matched key, loud ambiguity guards,
  * schema widening, and `#batch=` replay idempotence for CDC feeds. */
class SnapshotMergeSpec extends AnyFunSuite with SparkFixture {

  private def freshDir() =
    Files.createTempDirectory("snapmerge").toString + "/tbl"

  private def manifestFiles(dir: String, v: Long): Set[String] =
    spark.read.textFile(s"$dir/_log/v$v.manifest").collect()
      .filterNot(_.startsWith("#")).toSet

  test("merge upserts+inserts+deletes atomically; only affected files rewritten") {
    import spark.implicits._
    val dir = freshDir()
    // 4 files, key-range clustered: the merge touches exactly 2 of them
    val base = spark.range(0, 400).select(col("id").as("k"),
      (col("id") % 7).as("v")).repartitionByRange(4, col("k"))
    SnapshotLog.commit(spark, dir, base)
    val filesV1 = manifestFiles(dir, 1L)
    val changes = Seq(
      (10L, 1000L, false),   // update: k=10 lives in the first file
      (360L, -1L, true),     // delete: k=360 lives in the last file
      (5000L, 7L, false)     // insert: matches nothing
    ).toDF("k", "v", "is_del")
    val v = SnapshotLog.merge(spark, dir, changes, Seq("k"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))
    assert(v === 2L)
    val filesV2 = manifestFiles(dir, 2L)
    assert(filesV1.intersect(filesV2).size === 2,
      "the two files without a matched key must be carried by reference")
    val latest = SnapshotLog.read(spark, dir)
    assert(latest.count() === 400) // +1 insert, -1 delete
    assert(latest.filter(col("k") === 10L).select("v").as[Long].head() === 1000L)
    assert(latest.filter(col("k") === 360L).count() === 0)
    assert(latest.filter(col("k") === 5000L).count() === 1)
    assert(!latest.columns.contains("is_del"), "control column must not be stored")
    // time travel: the pre-merge version is untouched
    val v1 = SnapshotLog.read(spark, dir, Some(1))
    assert(v1.count() === 400 &&
      v1.filter(col("k") === 10L).select("v").as[Long].head() === 3L)
  }

  test("merge equals a full recompute of the same upsert/delete semantics") {
    import spark.implicits._
    val dir = freshDir()
    val base = spark.range(0, 300).select(col("id").as("k"),
      (col("id") * 11 % 13).as("v")).repartitionByRange(3, col("k"))
    SnapshotLog.commit(spark, dir, base)
    // every key class: update evens under 20, delete multiples of 50,
    // insert 300..309
    val changes = spark.range(0, 320).select(col("id").as("k"),
        (col("id") + 9000).as("v"),
        (col("id") % 50 === 0).as("is_del"))
      .filter((col("k") < 20 && col("k") % 2 === 0) ||
        col("k") % 50 === 0 || col("k") >= 300)
    SnapshotLog.merge(spark, dir, changes, Seq("k"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))
    val expected = base
      .join(changes.select("k"), Seq("k"), "left_anti")
      .unionByName(changes.filter(!col("is_del")).drop("is_del"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = SnapshotLog.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("merge bootstraps an empty table; delete-only changes create nothing") {
    import spark.implicits._
    val dir = freshDir()
    val delOnly = Seq((1L, 2L, true)).toDF("k", "v", "is_del")
    assert(SnapshotLog.merge(spark, dir, delOnly, Seq("k"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del")) === 0L)
    assert(SnapshotLog.versions(spark, dir).isEmpty)
    val first = Seq((1L, 10L, false), (2L, 20L, true)).toDF("k", "v", "is_del")
    assert(SnapshotLog.merge(spark, dir, first, Seq("k"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del")) === 1L)
    assert(SnapshotLog.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 10L)))
  }

  test("merge rejects NULL and duplicate change keys loudly") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    val nullKey = Seq((Some(1L), "x"), (None: Option[Long], "y")).toDF("k", "v")
    val e1 = intercept[IllegalArgumentException] {
      SnapshotLog.merge(spark, dir, nullKey, Seq("k"))
    }
    assert(e1.getMessage.contains("NULL key"))
    val dupKey = Seq((1L, "x"), (1L, "y")).toDF("k", "v")
    val e2 = intercept[IllegalArgumentException] {
      SnapshotLog.merge(spark, dir, dupKey, Seq("k"))
    }
    assert(e2.getMessage.contains("duplicate"))
    // nothing landed
    assert(SnapshotLog.versions(spark, dir) === Seq(1L))
  }

  test("merge widens the schema; pre-evolution rows read typed nulls") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val widened = Seq((2L, "b2", 7.5), (3L, "c", 9.0)).toDF("k", "v", "score")
    SnapshotLog.merge(spark, dir, widened, Seq("k"))
    val latest = SnapshotLog.read(spark, dir).orderBy("k")
    assert(latest.columns.toSeq === Seq("k", "v", "score"))
    val rows = latest.collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(rows === Seq((1L, "a", None), (2L, "b2", Some(7.5)),
      (3L, "c", Some(9.0))))
    // time travel predates the column
    assert(SnapshotLog.read(spark, dir, Some(1)).columns.toSeq === Seq("k", "v"))
  }

  test("mergeBatch: replay-idempotent even across an interleaved non-batch commit") {
    import spark.implicits._
    val dir = freshDir()
    def batch(rows: Seq[(Long, Long, Boolean)]) =
      rows.toDF("k", "v", "is_del")
    assert(SnapshotLog.mergeBatch(spark, dir,
      batch(Seq((1L, 10L, false), (2L, 20L, false))), Seq("k"), 0L,
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del")) === 1L)
    assert(SnapshotLog.mergeBatch(spark, dir,
      batch(Seq((2L, 21L, false), (3L, 30L, false))), Seq("k"), 1L,
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del")) === 2L)
    // a deleteWhere lands between batch 1 and its at-least-once replay:
    // the guard must scan past it, not get blinded by the latest version
    SnapshotLog.deleteWhere(spark, dir, col("k") === 1L)
    val vReplay = SnapshotLog.mergeBatch(spark, dir,
      batch(Seq((2L, 21L, false), (3L, 30L, false))), Seq("k"), 1L,
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))
    assert(vReplay === 3L, "replayed batch must return the current version")
    assert(SnapshotLog.versions(spark, dir) === Seq(1L, 2L, 3L))
    assert(SnapshotLog.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((2L, 21L), (3L, 30L)))
  }

  test("merge racing an append loses neither side (rebase on conflict)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      spark.range(0, 100).select(col("id").as("k"), lit(0L).as("v")))
    val fm = Future(SnapshotLog.merge(spark, dir,
      Seq((5L, 999L)).toDF("k", "v"), Seq("k")))
    val fa = Future(SnapshotLog.commitBatch(spark, dir,
      Seq((500L, 1L)).toDF("k", "v"), 0L))
    Await.result(fm, Duration("120s")); Await.result(fa, Duration("120s"))
    val latest = SnapshotLog.read(spark, dir)
    assert(latest.count() === 101, "append row and merge survivors both present")
    assert(latest.filter(col("k") === 5L).select("v").as[Long].head() === 999L)
    assert(latest.filter(col("k") === 500L).count() === 1)
  }

  test("zone-map fast path: a sparse merge prunes candidate files at planning time") {
    import spark.implicits._
    val dir = freshDir()
    val base = spark.range(0, 400).select(col("id").as("k"),
      (col("id") % 7).as("v")).repartitionByRange(4, col("k"))
    SnapshotLog.commitWithStats(spark, dir, base, Seq("k"))
    val files = SnapshotLog.read(spark, dir).inputFiles.toSeq.sorted
    val stats = SnapshotLog.fileStatsOf(spark, dir, 1L)
    assert(stats.nonEmpty)
    // the prune the merge fast path runs: keys {10, 17} live in the
    // first range file only — exactly one candidate survives
    def normStats = stats.map { case (p, m) =>
      files.find(f => f.endsWith(p.split('/').last)).getOrElse(p) -> m }
    val kept = SnapshotLog.pruneByStats(normStats.keys.toSeq.sorted,
      normStats, "k", Array(10L, 17L))
    assert(kept.size === 1, s"expected 1 candidate, got ${kept.size}")
    // prune laws: stat-less files always kept; out-of-range keys prune all
    assert(SnapshotLog.pruneByStats(Seq("nostats"), Map.empty, "k",
      Array(1L)) === Seq("nostats"))
    assert(SnapshotLog.pruneByStats(normStats.keys.toSeq, normStats, "k",
      Array(100000L)).isEmpty)
    // boundary keys (exact file min / max) are candidates, never missed
    val (mn, mx) = normStats.values.map(_("k")).collect {
      case LongStat(lo, hi, _) => (lo, hi) }.minBy(_._1)
    assert(SnapshotLog.pruneByStats(normStats.keys.toSeq, normStats, "k",
      Array(mn)).nonEmpty)
    assert(SnapshotLog.pruneByStats(normStats.keys.toSeq, normStats, "k",
      Array(mx)).nonEmpty)
    // end to end: the fast-path merge result matches the general path's
    // semantics exactly (update + insert + miss-delete)
    val changes = Seq((10L, 999L, false), (17L, 888L, false),
      (9999L, 1L, false), (5000L, -1L, true)).toDF("k", "v", "is_del")
    SnapshotLog.merge(spark, dir, changes, Seq("k"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))
    val got = SnapshotLog.read(spark, dir)
    assert(got.count() === 401)
    assert(got.filter(col("k") === 10L).select("v").as[Long].head() === 999L)
    assert(got.filter(col("k") === 17L).select("v").as[Long].head() === 888L)
    assert(got.filter(col("k") === 9999L).count() === 1)
    // and the zone maps survived for the NEXT merge's prune
    assert(SnapshotLog.fileStatsOf(spark, dir, 2L).nonEmpty)
  }

  test("composite-key merge: matching needs BOTH columns; fast path stands down") {
    import spark.implicits._
    val dir = freshDir()
    // (region, id) composite key; same id exists under both regions
    val base = Seq(("eu", 1L, 10L), ("eu", 2L, 20L),
      ("us", 1L, 30L), ("us", 2L, 40L)).toDF("region", "id", "v")
    SnapshotLog.commitWithStats(spark, dir, base.repartition(2), Seq("id"))
    val changes = Seq(("eu", 1L, 999L, false), ("us", 2L, -1L, true),
      ("ap", 1L, 50L, false)).toDF("region", "id", "v", "is_del")
    SnapshotLog.merge(spark, dir, changes, Seq("region", "id"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))
    val got = SnapshotLog.read(spark, dir).orderBy("region", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // us/1 untouched even though id=1 matched in eu — the key is the PAIR
    assert(got === Seq(("ap", 1L, 50L), ("eu", 1L, 999L), ("eu", 2L, 20L),
      ("us", 1L, 30L)))
  }

  test("two merges racing on disjoint keys: rebase keeps both updates") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      spark.range(0, 200).select(col("id").as("k"), lit(0L).as("v")))
    val f1 = Future(SnapshotLog.merge(spark, dir,
      Seq((10L, 111L)).toDF("k", "v"), Seq("k")))
    val f2 = Future(SnapshotLog.merge(spark, dir,
      Seq((150L, 222L)).toDF("k", "v"), Seq("k")))
    Await.result(f1, Duration("120s")); Await.result(f2, Duration("120s"))
    val latest = SnapshotLog.read(spark, dir)
    assert(latest.count() === 200)
    assert(latest.filter(col("k") === 10L).select("v").as[Long].head() === 111L,
      "first merge's update must survive the race")
    assert(latest.filter(col("k") === 150L).select("v").as[Long].head() === 222L,
      "second merge's update must survive the race")
  }

  test("model-based: random upsert/delete batch sequences match a Map fold") {
    import spark.implicits._
    // deterministic seed — the point is breadth of interleavings, not
    // flakiness; 60 batches across 3 tables, keys colliding heavily
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { table =>
      val dir = freshDir()
      var model = Map.empty[Long, Long]
      (0 until 20).foreach { i =>
        val n = 1 + rnd.nextInt(8)
        val batch = Seq.fill(n)(rnd.nextInt(25).toLong)
          .distinct // merge requires unique keys per batch
          .map(k => (k, rnd.nextInt(1000).toLong, rnd.nextInt(4) == 0))
        val v = SnapshotLog.merge(spark, dir, batch.toDF("k", "v", "is_del"),
          Seq("k"), deleteWhen = Some(col("is_del")),
          dropCols = Seq("is_del"))
        model = batch.foldLeft(model) { case (m, (k, value, del)) =>
          if (del) m - k else m.updated(k, value)
        }
        if (model.isEmpty) ()
        else if (v > 0L) {
          val got = SnapshotLog.read(spark, dir).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got === model, s"table $table diverged after batch $i")
        }
      }
    }
  }

  test("restore publishes an old version as the new latest, files shared, stats alive") {
    import spark.implicits._
    val dir = freshDir()
    val base = spark.range(0, 400).select(col("id").as("k"),
      (col("id") % 7).as("v")).repartitionByRange(4, col("k"))
    SnapshotLog.commitWithStats(spark, dir, base, Seq("k"))           // v1
    SnapshotLog.merge(spark, dir,                                     // v2 (bad)
      Seq((10L, -999L)).toDF("k", "v"), Seq("k"))
    val v = SnapshotLog.restore(spark, dir, 1L)                       // v3 = v1
    assert(v === 3L)
    assert(SnapshotLog.read(spark, dir).filter(col("k") === 10L)
      .select("v").as[Long].head() === 3L, "rollback must undo the merge")
    // same files by reference; botched v2 still readable for forensics
    assert(manifestFiles(dir, 1L) === manifestFiles(dir, 3L))
    assert(SnapshotLog.read(spark, dir, Some(2L))
      .filter(col("k") === 10L).select("v").as[Long].head() === -999L)
    // zone maps travelled with the restore: prune still engages
    val (_, scanned, total) = SnapshotLog.readBetween(spark, dir, "k", 0L, 10L)
    assert(scanned < total)
    // restoring to the current latest is a no-op
    assert(SnapshotLog.restore(spark, dir, 3L) === 3L)
    // unknown version fails loudly
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.restore(spark, dir, 99L)
    }
    assert(e.getMessage.contains("cannot restore"))
  }

  test("mergeSink: streaming upsert replaces by key, tombstones delete, time travel works") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = freshDir()
    val ck = Files.createTempDirectory("mergeck").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Boolean)]
    val q = SnapshotLog.mergeSink(
      ms.toDF().toDF("k", "v", "is_del"), dir, ck, Seq("k"),
      deleteWhen = Some(col("is_del")), dropCols = Seq("is_del"))
    try {
      ms.addData((1L, 10L, false), (2L, 20L, false)) // bootstrap
      q.processAllAvailable()
      ms.addData((2L, 21L, false), (3L, 30L, false)) // upsert 2, insert 3
      q.processAllAvailable()
      ms.addData((1L, -1L, true))                    // tombstone 1
      q.processAllAvailable()
    } finally q.stop()
    def rows(v: Option[Long]) = SnapshotLog.read(spark, dir, v).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows(None) === Seq((2L, 21L), (3L, 30L)))
    // each batch is one atomic version; batch-1 time travel sees key 1
    val v1 = SnapshotLog.versionOfBatch(spark, dir, 1L).get
    assert(rows(Some(v1)) === Seq((1L, 10L), (2L, 21L), (3L, 30L)))
    assert(SnapshotLog.versions(spark, dir).size === 3)
    // no duplicate keys ever: the sink upserted, never appended
    assert(SnapshotLog.read(spark, dir).groupBy("k").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("analyze retrofits zone maps: same files by reference, prune turns on") {
    import spark.implicits._
    val dir = freshDir()
    val base = spark.range(0, 400).select(col("id").as("k"),
      (col("id") % 7).as("v")).repartitionByRange(4, col("k"))
    SnapshotLog.commit(spark, dir, base) // plain commit: no stats
    val (_, scanned0, total0) = SnapshotLog.readBetween(spark, dir, "k", 0L, 10L)
    assert(scanned0 === total0, "no stats yet — nothing can prune")
    val v = SnapshotLog.analyze(spark, dir, Seq("k"))
    assert(v === 2L)
    assert(manifestFiles(dir, 1L) === manifestFiles(dir, 2L),
      "analyze must share every data file by reference")
    val (df, scanned1, total1) = SnapshotLog.readBetween(spark, dir, "k", 0L, 10L)
    assert(scanned1 < total1, s"analyze stats must prune: $scanned1/$total1")
    assert(df.count() === 11)
    // rows identical before/after
    assert(SnapshotLog.read(spark, dir).count() === 400)
    // vacuum after analyze: shared files survive the dropped version
    SnapshotLog.vacuum(spark, dir, keepLast = 1)
    assert(SnapshotLog.read(spark, dir).count() === 400)
  }

  test("merge propagates zone-map stats: carried files keep them, new files gain them") {
    import spark.implicits._
    val dir = freshDir()
    val base = spark.range(0, 400).select(col("id").as("k"),
      (col("id") % 7).as("v")).repartitionByRange(4, col("k"))
    SnapshotLog.commitWithStats(spark, dir, base, Seq("k"))
    SnapshotLog.merge(spark, dir, Seq((10L, 1000L)).toDF("k", "v"), Seq("k"))
    // prune still skips untouched high-range files after the merge commit
    val (df, scanned, total) =
      SnapshotLog.readBetween(spark, dir, "k", 300L, 310L)
    assert(total >= 4 && scanned < total,
      s"stats must survive the merge: scanned $scanned of $total")
    assert(df.count() === 11)
    // and the rewritten low range still reads exactly
    val (low, _, _) = SnapshotLog.readBetween(spark, dir, "k", 8L, 12L)
    assert(low.orderBy("k").select("v").as[Long].collect().toSeq ===
      Seq(1L, 2L, 1000L, 4L, 5L))
  }
}
