package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The RECORDED change feed (`graft.changeFeed=true` +
  * `readStream.option("readChangeFeed", "true")`): rewrite verbs write
  * their exact row-level changes as change files, appends derive their
  * inserts at file grain, and the stream delivers the union with a
  * `_change_type` marker — the Delta-CDF design on the snapshot log.
  *
  * The load-bearing law is REPLAY: because each commit's recorded
  * changes are exact and survivor-cancelled,
  * `(inserts ∪ update_postimages) exceptAll (deletes ∪
  * update_preimages)` over the whole feed reconstructs the table's
  * final content as a multiset, from nothing. */
class SnapshotCdfStreamSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val Fmt = "graft.sources.SnapshotStreamSource"

  private def freshDir() =
    Files.createTempDirectory("snapcdf").toString + "/tbl"

  private def drain(dir: String, sink: String): Unit = {
    val ckpt = Files.createTempDirectory("snapcdf-ckpt").toString
    val q = spark.readStream.format(Fmt).option("path", dir)
      .option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
  }

  /** The replay law as signed counts: per full row, (#insert +
    * #update_postimage − #delete − #update_preimage) over the feed must
    * equal the row's multiplicity in the final table. */
  private def assertFeedReplaysTo(feed: DataFrame, table: DataFrame,
      cols: Seq[String], what: String): Unit = {
    val net = feed.groupBy(cols.map(col): _*)
      .agg(sum(when(col("_change_type")
        .isin("insert", "update_postimage"), 1L).otherwise(-1L))
        .as("__net"))
    val want = table.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val off = net.join(want, cols, "full_outer")
      .filter(coalesce(col("__net"), lit(0L)) =!=
        coalesce(col("__cnt"), lit(0L)))
    assert(off.isEmpty,
      s"$what: replayed feed diverges from the table on " +
        s"${off.count()} row(s): ${off.collect().mkString("; ")}")
  }

  test("_commit_timestamp rides the feed (batch AND stream), equals " +
      "history()'s commit point per version, and is a reserved name") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    SnapshotLog.merge(spark, dir,
      Seq((1L, "A"), (2L, "b")).toDF("k", "v"), keys = Seq("k"))
    SnapshotLog.deleteWhere(spark, dir, col("k") === 2L)
    val vs = SnapshotLog.versions(spark, dir)
    val hist = SnapshotLog.history(spark, dir)
      .select("version", "committed_at")
      .as[(Long, java.sql.Timestamp)].collect().toMap
    // batch feed: one timestamp per version, exactly the commit point
    val batch = SnapshotLog.changeFeed(spark, dir, vs.head, vs.last)
      .select("_commit_version", "_commit_timestamp").distinct()
      .as[(Long, java.sql.Timestamp)].collect().toMap
    batch.foreach { case (v, ts) =>
      assert(ts === hist(v),
        s"batch feed v$v timestamp $ts != history ${hist(v)}")
    }
    // stream feed: same constant per version through the
    // partition-tuple fill
    drain(dir, "cdf_ts")
    val streamed = spark.table("cdf_ts")
      .select("_commit_version", "_commit_timestamp").distinct()
      .as[(Long, java.sql.Timestamp)].collect().toMap
    streamed.foreach { case (v, ts) =>
      assert(ts === hist(v),
        s"stream feed v$v timestamp $ts != history ${hist(v)}")
    }
    // reserved: enabling the feed on a table owning the name refuses
    val clash = freshDir()
    SnapshotLog.commit(spark, clash,
      Seq((1L, new java.sql.Timestamp(0L)))
        .toDF("k", "_commit_timestamp"))
    val e = intercept[IllegalArgumentException](
      SnapshotLog.setTableProperties(spark, clash,
        Map(SnapshotLog.ChangeFeedProperty -> "true")))
    assert(e.getMessage.contains("_commit_timestamp"))
  }

  test("TIMESTAMP-bounded change feed: earliest-at-or-after / " +
      "newest-at-or-before resolution, empty same-shape commit-less " +
      "window, pre-creation refusal, and the TVF timestamp form") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    Thread.sleep(60) // distinct manifest mtimes (ms clock)
    SnapshotLog.merge(spark, dir, Seq((2L, "b")).toDF("k", "v"),
      keys = Seq("k"))
    Thread.sleep(60)
    SnapshotLog.deleteWhere(spark, dir, col("k") === 1L)
    val ts = SnapshotLog.history(spark, dir)
      .select("version", "committed_at")
      .as[(Long, java.sql.Timestamp)].collect()
      .map { case (v, t) => v -> t.getTime }.toMap
    // [ts(v2), ts(v4)] covers v2..v4; v2 (the property commit) recorded
    // zero changes, so the feed emits v3 (merge) and v4 (delete)
    val feed = SnapshotLog.changeFeedBetweenTimestamps(spark, dir,
      ts(2L), ts(4L))
    assert(feed.select("_commit_version").distinct()
      .as[Long].collect().sorted.toSeq === Seq(3L, 4L))
    // a window strictly between two commits is EMPTY but same-shape
    assert(ts(4L) - ts(3L) >= 2, "need a gap between commits")
    val mid = (ts(3L) + ts(4L)) / 2
    val empty = SnapshotLog.changeFeedBetweenTimestamps(spark, dir,
      ts(3L) + 1, mid)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq === Seq("k", "v", "_change_type",
      "_commit_version", "_commit_timestamp"))
    // pre-creation instants refuse loudly (fabricated history)
    val e = intercept[IllegalArgumentException](
      SnapshotLog.changeFeedBetweenTimestamps(spark, dir,
        ts(1L) - 7200000L, ts(1L) - 3600000L))
    assert(e.getMessage.contains("time-travel"))
    // the TVF speaks both forms: version ints and TIMESTAMP literals
    val fromLit = new java.sql.Timestamp(ts(2L))
    val toLit = new java.sql.Timestamp(ts(4L))
    val viaTvf = spark.sql(
      s"""SELECT DISTINCT _commit_version FROM snapshot_change_feed(
         |'$dir', TIMESTAMP '$fromLit', TIMESTAMP '$toLit')""".stripMargin)
      .as[Long].collect().sorted.toSeq
    assert(viaTvf === Seq(3L, 4L), s"TVF timestamp form: $viaTvf")
  }

  test("TIMESTAMP-bounded feed after a prefix vacuum: a from-bound " +
      "before the earliest retained commit refuses loudly; a window " +
      "inside retained history still serves") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    Thread.sleep(60)
    SnapshotLog.merge(spark, dir, Seq((2L, "b")).toDF("k", "v"),
      keys = Seq("k"))
    Thread.sleep(60)
    SnapshotLog.merge(spark, dir, Seq((3L, "c")).toDF("k", "v"),
      keys = Seq("k"))
    Thread.sleep(60)
    SnapshotLog.deleteWhere(spark, dir, col("k") === 1L)
    val tsAll = SnapshotLog.history(spark, dir)
      .select("version", "committed_at")
      .as[(Long, java.sql.Timestamp)].collect()
      .map { case (v, t) => v -> t.getTime }.toMap
    SnapshotLog.vacuum(spark, dir, keepLast = 2)
    val vs = SnapshotLog.versions(spark, dir)
    assert(vs.head > 1L, s"expected a vacuumed prefix, got $vs")
    // fromTs predating the earliest RETAINED commit would span vacuumed
    // changes (v3's merge is gone) — the retained head still HAS change
    // files, so without the guard this would silently omit them
    val e = intercept[IllegalStateException](
      SnapshotLog.changeFeedBetweenTimestamps(spark, dir,
        tsAll(2L), tsAll(vs.last)))
    assert(e.getMessage.contains("vacuumed"),
      s"wrong refusal: ${e.getMessage}")
    // a window starting AT the retained head's commit is sound
    val ok = SnapshotLog.changeFeedBetweenTimestamps(spark, dir,
      tsAll(vs.head), tsAll(vs.last))
    assert(ok.select("_commit_version").distinct()
      .as[Long].collect().sorted.toSeq === vs)
  }

  test("replay law: the recorded feed reconstructs the table through " +
      "append, merge (update/insert/delete), UPDATE, DELETE and " +
      "REPLACE WHERE") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "v", "n"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    // append (inserts derive at file grain — no change files needed)
    SnapshotLog.append(spark, dir,
      Seq((4L, "d", 40L), (5L, "e", 50L)).toDF("k", "v", "n"))
    // merge: update k=1, delete k=2, insert k=6
    SnapshotLog.merge(spark, dir,
      Seq((1L, "A", 11L, false), (2L, "b", 20L, true),
        (6L, "f", 60L, false)).toDF("k", "v", "n", "del"),
      keys = Seq("k"), deleteWhen = Some(col("del")),
      dropCols = Seq("del"))
    // targeted UPDATE and DELETE
    SnapshotLog.updateWhere(spark, dir, col("k") === 3L,
      Map("n" -> (col("n") + 300L)))
    SnapshotLog.deleteWhere(spark, dir, col("k") === 4L)
    // REPLACE WHERE: reload the k >= 5 region
    SnapshotLog.replaceWhere(spark, dir,
      Seq((5L, "E", 55L), (7L, "g", 70L)).toDF("k", "v", "n"),
      col("k") >= 5L)
    drain(dir, "cdf_replay")
    val feed = spark.table("cdf_replay")
    // every row carries a marker; the four types all occur
    assert(feed.filter(col("_change_type").isNull).isEmpty)
    val types = feed.select("_change_type").distinct()
      .as[String].collect().toSet
    assert(types === Set("insert", "delete", "update_preimage",
      "update_postimage"), s"got $types")
    assertFeedReplaysTo(feed, SnapshotLog.read(spark, dir),
      Seq("k", "v", "n"), "replayed feed vs table")
    // exact shape spot-checks: k=1 merged update → pre 10, post 11;
    // k=2 delete pre-image; k=5 replace = delete(50) + insert(55)
    assert(feed.filter(col("k") === 1L &&
      col("_change_type") === "update_preimage")
      .select("n").as[Long].collect().toSeq === Seq(10L))
    assert(feed.filter(col("k") === 1L &&
      col("_change_type") === "update_postimage")
      .select("n").as[Long].collect().toSeq === Seq(11L))
    // k=2: initial-snapshot insert, then the merge's tombstone
    assert(feed.filter(col("k") === 2L)
      .select("_change_type").as[String].collect().sorted.toSeq ===
      Seq("delete", "insert"))
    // k=5: initial insert(50), then REPLACE WHERE = delete(50)+insert(55)
    assert(feed.filter(col("k") === 5L)
      .select(col("_change_type"), col("n")).as[(String, Long)]
      .collect().toSet ===
      Set(("insert", 50L), ("delete", 50L), ("insert", 55L)))
  }

  test("MoR deletes (DV growth) record their tombstoned rows; optimize " +
      "declares a zero-change commit and the stream rides across both") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      (0L until 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    SnapshotLog.deleteWhereMoR(spark, dir, col("k") < 3L)
    SnapshotLog.append(spark, dir, Seq((100L, "x")).toDF("k", "v"))
    SnapshotLog.optimize(spark, dir, smallFileBytes = Long.MaxValue,
      targetFiles = 1)
    drain(dir, "cdf_mor")
    val feed = spark.table("cdf_mor")
    assert(feed.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().sorted.toSeq === Seq(0L, 1L, 2L))
    // initial 20 inserts + 1 append insert + 3 deletes; optimize adds 0
    assert(feed.count() === 24)
    assertFeedReplaysTo(feed, SnapshotLog.read(spark, dir),
      Seq("k", "v"), "MoR feed vs table")
  }

  test("a rewrite WITHOUT recorded changes refuses loudly, naming the " +
      "property; plain streams keep their append-only refusal") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"))
    SnapshotLog.deleteWhere(spark, dir, col("k") === 1L) // not recorded
    val ckpt = Files.createTempDirectory("snapcdf-ckpt").toString
    val q = spark.readStream.format(Fmt).option("path", dir)
      .option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("cdf_refuse")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs.contains(SnapshotLog.ChangeFeedProperty),
      s"refusal must name the property; got: $msgs")
  }

  test("SQL surface: TBLPROPERTIES create/show/unset, CDF rides SQL " +
      "DML, restore rolls properties back") {
    val root = Files.createTempDirectory("cdfcat").toString
    spark.conf.set("spark.sql.catalog.gcdf", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcdf.root", root)
    spark.sql("CREATE NAMESPACE gcdf.ns")
    spark.sql("CREATE TABLE gcdf.ns.t (k BIGINT, v STRING) " +
      s"TBLPROPERTIES ('${SnapshotLog.ChangeFeedProperty}'='true')")
    val dir = s"$root/ns/t"
    assert(SnapshotLog.tablePropertiesOf(spark, dir,
      SnapshotLog.versions(spark, dir).last) ===
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    // SHOW TBLPROPERTIES reads them
    val shown = spark.sql("SHOW TBLPROPERTIES gcdf.ns.t")
      .as[(String, String)].collect().toMap
    assert(shown.get(SnapshotLog.ChangeFeedProperty) === Some("true"))
    spark.sql("INSERT INTO gcdf.ns.t VALUES (1, 'a'), (2, 'b')")
    // SQL DML records its changes (UPDATE plans onto updateWhere)
    spark.sql("UPDATE gcdf.ns.t SET v = 'A' WHERE k = 1")
    drain(dir, "cdf_sql")
    val feed = spark.table("cdf_sql")
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select("v").as[String].collect().toSeq === Seq("A"))
    // property survives data commits via the auto-carry
    val vLatest = SnapshotLog.versions(spark, dir).last
    assert(SnapshotLog.tablePropertiesOf(spark, dir, vLatest)
      .get(SnapshotLog.ChangeFeedProperty) === Some("true"))
    // UNSET drops it; restore to a propertied version brings it back
    spark.sql("ALTER TABLE gcdf.ns.t UNSET TBLPROPERTIES " +
      s"('${SnapshotLog.ChangeFeedProperty}')")
    val vUnset = SnapshotLog.versions(spark, dir).last
    assert(SnapshotLog.tablePropertiesOf(spark, dir, vUnset).isEmpty)
    SnapshotLog.restore(spark, dir, vLatest)
    assert(SnapshotLog.tablePropertiesOf(spark, dir,
      SnapshotLog.versions(spark, dir).last)
      .get(SnapshotLog.ChangeFeedProperty) === Some("true"))
  }

  test("column rename mid-feed: change files are rename-immune — they " +
      "store physical names, the stream reads them under current names") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((0L, "v0"), (1L, "v1"), (2L, "v2")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    // a change file written BEFORE the rename...
    SnapshotLog.deleteWhere(spark, dir, col("k") === 0L)
    SnapshotLog.renameColumn(spark, dir, "v", "label")
    // ...and one written AFTER it
    SnapshotLog.updateWhere(spark, dir, col("k") === 1L,
      Map("label" -> lit("X")))
    drain(dir, "cdf_rename")
    val feed = spark.table("cdf_rename")
    assert(feed.columns.toSeq ===
      Seq("k", "label", "_change_type", "_commit_version",
        "_commit_timestamp"))
    assert(feed.filter(col("k") === 0L &&
      col("_change_type") === "delete")
      .select("label").as[String].collect().toSeq === Seq("v0"),
      "pre-rename change file must read under the CURRENT logical name")
    assert(feed.filter(col("k") === 1L &&
      col("_change_type") === "update_postimage")
      .select("label").as[String].collect().toSeq === Seq("X"))
    assertFeedReplaysTo(feed, SnapshotLog.read(spark, dir),
      Seq("k", "label"), "renamed feed vs table")
  }

  test("replicate: a keyed replica follows the source through mixed " +
      "history; repeated drains are exactly-once no-ops") {
    val src = freshDir()
    val dst = freshDir()
    val ckpt = Files.createTempDirectory("repl-ckpt").toString
    SnapshotLog.commit(spark, src,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("k", "v", "n"))
    SnapshotLog.setTableProperties(spark, src,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    SnapshotLog.append(spark, src, Seq((4L, "d", 40L)).toDF("k", "v", "n"))
    SnapshotLog.merge(spark, src,
      Seq((1L, "A", 11L, false), (2L, "b", 20L, true),
        (5L, "e", 50L, false)).toDF("k", "v", "n", "del"),
      keys = Seq("k"), deleteWhen = Some(col("del")),
      dropCols = Seq("del"))
    def drainReplica(): Unit = {
      val q = SnapshotLog.replicate(spark, src, dst, Seq("k"), ckpt)
      q.awaitTermination(120000)
    }
    def sorted(dir: String) = SnapshotLog.read(spark, dir)
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    drainReplica()
    assert(sorted(dst) === sorted(src))
    // the source moves on: a targeted UPDATE, a region reload touching
    // an existing key, a plain delete — drain again on the SAME
    // checkpoint and the replica converges
    SnapshotLog.updateWhere(spark, src, col("k") === 3L,
      Map("n" -> (col("n") + 300L)))
    SnapshotLog.replaceWhere(spark, src,
      Seq((5L, "E", 55L), (6L, "f", 60L)).toDF("k", "v", "n"),
      col("k") >= 5L)
    SnapshotLog.deleteWhere(spark, src, col("k") === 4L)
    drainReplica()
    assert(sorted(dst) === sorted(src))
    // nothing new: the drain commits nothing (exactly-once replay guard)
    val vBefore = SnapshotLog.versions(spark, dst).last
    drainReplica()
    assert(SnapshotLog.versions(spark, dst).last === vBefore,
      "an empty drain must not commit new replica versions")
  }

  test("batch changeFeed == streamed feed (multisets, versions " +
      "included); TVF serves it in SQL; batch scans refuse the option") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    SnapshotLog.append(spark, dir, Seq((4L, "d")).toDF("k", "v"))
    SnapshotLog.merge(spark, dir,
      Seq((1L, "A", false), (2L, "b", true)).toDF("k", "v", "del"),
      keys = Seq("k"), deleteWhen = Some(col("del")),
      dropCols = Seq("del"))
    // REPLACE WHERE with an EMPTY incoming frame = delete-the-region:
    // records deletes only, no insert read-back of nonexistent files
    SnapshotLog.replaceWhere(spark, dir,
      Seq.empty[(Long, String)].toDF("k", "v"), col("k") === 3L)
    drain(dir, "cdf_batch_parity")
    val streamed = spark.table("cdf_batch_parity")
    val vs = SnapshotLog.versions(spark, dir)
    val batch = SnapshotLog.changeFeed(spark, dir, vs.head, vs.last)
    assert(batch.exceptAll(streamed).isEmpty &&
      streamed.exceptAll(batch).isEmpty,
      s"batch feed diverges from the stream: batch-only=" +
        s"${batch.exceptAll(streamed).collect().mkString(";")} " +
        s"stream-only=${streamed.exceptAll(batch).collect().mkString(";")}")
    // the TVF serves the same relation to SQL
    val tvf = spark.sql(s"SELECT * FROM snapshot_change_feed('$dir', " +
      s"${vs.head}, ${vs.last})")
    assert(tvf.exceptAll(batch).isEmpty && batch.exceptAll(tvf).isEmpty)
    // a BATCH load with the streaming option refuses loudly
    val e = intercept[Exception] {
      spark.read.format(Fmt).option("path", dir)
        .option("readChangeFeed", "true").load().collect()
    }
    assert(e.getMessage.contains("snapshot_change_feed"),
      s"expected the batch refusal, got: ${e.getMessage}")
  }

  test("feeds across an ADD COLUMN ... DEFAULT read the frozen default " +
      "for pre-add rows, never NULL (table/feed consistency)") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val v1 = SnapshotLog.versions(spark, dir).last
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("CURRENT_DEFAULT", "42").build()
    SnapshotLog.addColumns(spark, dir,
      Seq(org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.IntegerType, nullable = true, md)))
    SnapshotLog.deleteWhere(spark, dir, col("k") === 1L)
    val vLast = SnapshotLog.versions(spark, dir).last
    // endpoint diff: the deleted pre-add row shows the default the
    // table would have shown for it — never a NULL-vs-default skew
    val diff = SnapshotLog.changesBetween(spark, dir, v1, vLast)
    assert(diff.filter(col("k") === 1L &&
      col("_change_type") === "delete")
      .select("score").as[Int].collect().toSeq === Seq(42))
    // per-version feed: the recorded delete pre-image reads it too
    val feed = SnapshotLog.changeFeed(spark, dir, v1, vLast)
    assert(feed.filter(col("k") === 1L &&
      col("_change_type") === "delete")
      .select("score").as[Int].collect().toSeq === Seq(42))
  }

  test("dynamic partition overwrite records its changes: replaced " +
      "partitions delete, incoming rows insert — feeds ride across") {
    val dir = freshDir()
    SnapshotLog.commitPartitioned(spark, dir,
      Seq(("eu", 1L), ("eu", 2L), ("us", 3L)).toDF("region", "k"),
      Seq("region"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    SnapshotLog.overwritePartitions(spark, dir,
      Seq(("eu", 10L), ("eu", 11L)).toDF("region", "k"))
    val vs = SnapshotLog.versions(spark, dir)
    val feed = SnapshotLog.changeFeed(spark, dir, vs.head, vs.last)
      .filter(col("_commit_version") === vs.last)
    assert(feed.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().sorted.toSeq === Seq(1L, 2L),
      "replaced partition's rows must record as deletes")
    assert(feed.filter(col("_change_type") === "insert")
      .select("k").as[Long].collect().sorted.toSeq === Seq(10L, 11L))
    assert(feed.filter(col("region") =!= "eu").isEmpty,
      "untouched partitions must not appear in the change set")
    drain(dir, "cdf_dynovr")
    assertFeedReplaysTo(spark.table("cdf_dynovr"),
      SnapshotLog.read(spark, dir), Seq("region", "k"),
      "dynamic-overwrite feed vs table")
  }

  test("ADD COLUMN ... DEFAULT + CHECK in one statement validates " +
      "against the frozen default, not a NULL wave-through") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putString("CURRENT_DEFAULT", "5").build()
    val field = org.apache.spark.sql.types.StructField("c",
      org.apache.spark.sql.types.IntegerType, nullable = true, md)
    // existing rows will READ c = 5, which violates c < 3 — the
    // statement must refuse (NULL three-valued logic would pass it)
    val e = intercept[Exception] {
      SnapshotLog.alterCommit(spark, dir, Seq(field),
        Seq(("chk_small", "c < 3")), Seq.empty)
    }
    assert(e.getMessage.contains("chk_small"),
      s"expected the CHECK refusal, got: ${e.getMessage}")
    // and the consistent CHECK commits fine
    SnapshotLog.alterCommit(spark, dir, Seq(field),
      Seq(("chk_big", "c > 3")), Seq.empty)
    assert(SnapshotLog.read(spark, dir).select("c")
      .as[Int].collect().toSeq === Seq(5))
  }

  test("changeFeed refuses a vacuumed prefix instead of misattributing " +
      "the accumulated table as that version's inserts") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.append(spark, dir, Seq((2L, "b")).toDF("k", "v"))
    SnapshotLog.append(spark, dir, Seq((3L, "c")).toDF("k", "v"))
    SnapshotLog.vacuum(spark, dir, keepLast = 2, orphanGraceMs = 0L)
    val vs = SnapshotLog.versions(spark, dir)
    assert(vs.head > 1L, "vacuum should have dropped the prefix")
    val e = intercept[Exception] {
      SnapshotLog.changeFeed(spark, dir, vs.head, vs.last).collect()
    }
    assert(e.getMessage.contains("vacuumed"),
      s"expected the vacuumed-prefix refusal, got: ${e.getMessage}")
  }

  test("shallowClone carries TBLPROPERTIES; NULL-keyed deletes refuse " +
      "in the replication apply") {
    val src = freshDir()
    SnapshotLog.commit(spark, src, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, src,
      Map(SnapshotLog.ChangeFeedProperty -> "true", "team" -> "data"))
    val dst = freshDir()
    SnapshotLog.shallowClone(spark, src, dst)
    assert(SnapshotLog.tablePropertiesOf(spark, dst,
      SnapshotLog.versions(spark, dst).last) ===
      Map(SnapshotLog.ChangeFeedProperty -> "true", "team" -> "data"),
      "clone must carry table properties (they are table state)")
    // a NULL-keyed delete cannot be applied by key — loud, not silent
    val replica = freshDir()
    SnapshotLog.commit(spark, replica, Seq((1L, "a")).toDF("k", "v"))
    val badBatch = Seq(
      (Option.empty[Long], "x", "delete", 3L))
      .toDF("k", "v", "_change_type", "_commit_version")
    val e = intercept[Exception] {
      SnapshotLog.applyChangeBatch(spark, replica, badBatch,
        Seq("k"), batchId = 1L)
    }
    assert(e.getMessage.contains("NULL key"),
      s"expected the NULL-key refusal, got: ${e.getMessage}")
  }

  test("a schema-WIDENING merge records changes under the widened " +
      "schema: pre-images carry typed NULLs, post-images the new column") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    // the change frame carries a NEW column n — the merge widens the
    // table, and the recorded changes must align to the widened schema
    SnapshotLog.merge(spark, dir,
      Seq((1L, "A", 11L), (2L, "b", 22L)).toDF("k", "v", "n"),
      keys = Seq("k"))
    val vs = SnapshotLog.versions(spark, dir)
    val feed = SnapshotLog.changeFeed(spark, dir, vs.head, vs.last)
    assert(feed.columns.toSeq ===
      Seq("k", "v", "n", "_change_type", "_commit_version",
        "_commit_timestamp"))
    assert(feed.filter(col("k") === 1L &&
      col("_change_type") === "update_preimage")
      .select("n").head().isNullAt(0),
      "the pre-widening pre-image reads a typed NULL in the new column")
    assert(feed.filter(col("_change_type") === "update_postimage")
      .select("n").as[Long].collect().toSeq === Seq(11L))
    assert(feed.filter(col("_change_type") === "insert" &&
      col("k") === 2L).select("n").as[Long].collect().toSeq === Seq(22L))
  }

  test("vacuum reclaims change files of dropped versions, keeps the " +
      "retained versions' files") {
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, dir,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    SnapshotLog.deleteWhere(spark, dir, col("k") === 0L) // recorded
    val vOld = SnapshotLog.versions(spark, dir).last
    val oldChanges = SnapshotLog.changeFilesOf(spark, dir, vOld).get
    assert(oldChanges.nonEmpty)
    SnapshotLog.deleteWhere(spark, dir, col("k") === 1L) // recorded
    val vNew = SnapshotLog.versions(spark, dir).last
    val newChanges = SnapshotLog.changeFilesOf(spark, dir, vNew).get
    SnapshotLog.vacuum(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    oldChanges.foreach(p => assert(
      !f.exists(new org.apache.hadoop.fs.Path(p)),
      s"dropped version's change file survived vacuum: $p"))
    newChanges.foreach(p => assert(
      f.exists(new org.apache.hadoop.fs.Path(p)),
      s"retained version's change file was vacuumed: $p"))
  }
}
