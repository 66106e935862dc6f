package graft

import graft.dedup.{FingerprintStore, ImageDedup, SimHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The persisted fingerprint store (band-bucketed standing corpus for
  * incremental image dedup): the store-backed screen must be
  * row-identical to the two-sided banded recompute
  * ([[graft.ops.ImplOps.dedupImageIncr]]'s formulation), appends must
  * be replay-idempotent, as-of reads must see only earlier batches, the
  * screen scan must partition-prune to the incoming batch's buckets,
  * and an over-radius screen must refuse (recall is a LAYOUT property,
  * not a parameter). */
class FingerprintStoreSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  /** Batch b = fingerprints of test rasters [20b, 20b+20); batch 1 also
    * re-ingests resized copies of batch 0's first three images. */
  private def fpsOf(b: Long) = {
    val base = (b * 20 until b * 20 + 20).map(id =>
      id -> ImageDedup.dHash64(ImageDedup.testRaster(id, 32, 32)))
    val reingest =
      if (b == 1L) (0L until 3L).map(id => (9000 + id) ->
        ImageDedup.dHash64(graft.multimodal.Png.resizeBox(
          ImageDedup.testRaster(id, 32, 32), 16, 16)))
      else Seq.empty
    (base ++ reingest).toDF("media_id", "dhash")
  }

  test("store-backed screen == two-sided banded recompute over 3 " +
      "batches; re-ingests are caught, fresh images accepted") {
    val dir = Files.createTempDirectory("fpstore1").toString + "/fps"
    FingerprintStore.append(spark, dir, fpsOf(0), batchId = 0L)
    FingerprintStore.append(spark, dir, fpsOf(1), batchId = 1L)
    val incoming = fpsOf(2)
    val got = FingerprintStore.screen(spark, dir, incoming, asOfBatch = 2L)
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    // recompute twin: the standing set read whole, screened via the
    // two-sided banded join
    val standingAll = fpsOf(0).unionByName(fpsOf(1))
    val hits = SimHash.bandedHammingJoin(incoming, "media_id",
      standingAll.withColumnRenamed("media_id", "sid"), "sid",
      "dhash", maxDist = 6, bands = 8)
    val want = incoming.select(col("media_id"))
      .join(hits.groupBy("id_a").agg(count(lit(1)).as("n_dups"),
        min("hamming").as("nearest")),
        col("media_id") === col("id_a"), "left_outer")
      .select(col("media_id"), coalesce(col("n_dups"), lit(0L)),
        coalesce(col("nearest"), lit(64)),
        coalesce(col("n_dups"), lit(0L)) === 0L)
      .as[(Long, Long, Int, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got === want, "store screen diverges from the recompute twin")
    // batch 1's re-ingests screen AGAINST batch 0 at as-of 1
    val r = FingerprintStore.screen(spark, dir, fpsOf(1), asOfBatch = 1L)
      .as[(Long, Long, Int, Boolean)].collect()
    r.foreach { case (id, _, _, accept) =>
      assert(accept === (id < 9000),
        s"media $id: accept=$accept (re-ingests reject, fresh pass)")
    }
  }

  test("as-of semantics: batch 0 screened at as-of 0 sees an empty " +
      "standing set; appends are replay-idempotent") {
    val dir = Files.createTempDirectory("fpstore2").toString + "/fps"
    val n0 = FingerprintStore.append(spark, dir, fpsOf(0), batchId = 0L)
    assert(n0 === 20L * 8, "one row per band per fingerprint")
    assert(FingerprintStore.screen(spark, dir, fpsOf(0), asOfBatch = 0L)
      .filter(!col("accept")).count() === 0L,
      "as-of 0 must see no standing fingerprints")
    // replay: same batch id re-appended → identical store content
    val before = spark.read.parquet(dir)
      .select(col("batch_id").cast("long"), col("bucket").cast("long"),
        col("media_id"), col("dhash"))
      .collect().map(_.toSeq).toSet
    assert(FingerprintStore.append(spark, dir, fpsOf(0), 0L) === n0)
    val after = spark.read.parquet(dir)
      .select(col("batch_id").cast("long"), col("bucket").cast("long"),
        col("media_id"), col("dhash"))
      .collect().map(_.toSeq).toSet
    assert(after === before, "replayed append changed the store")
  }

  test("compaction: post-compaction screens are row-identical, folded " +
      "batches' replays are no-ops, the newest batch still replays " +
      "idempotently, file count drops, and as-of reads below the " +
      "watermark refuse") {
    val dir = Files.createTempDirectory("fpstore4").toString + "/fps"
    FingerprintStore.append(spark, dir, fpsOf(0), batchId = 0L)
    FingerprintStore.append(spark, dir, fpsOf(1), batchId = 1L)
    FingerprintStore.append(spark, dir, fpsOf(2), batchId = 2L)
    val incoming = fpsOf(3)
    val before = FingerprintStore.screen(spark, dir, incoming, 3L)
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    def nFiles() = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    val filesBefore = nFiles()
    val (folded, reclaimed) = FingerprintStore.compact(spark, dir)
    assert(folded === 0L,
      s"no duplicate fingerprints across these batches, yet $folded " +
        "rows vanished in the fold")
    assert(reclaimed > 0L, "compaction reclaimed no files")
    assert(nFiles() === filesBefore - reclaimed,
      "reported file reclaim diverges from the directory census")
    assert(nFiles() < filesBefore, "file count did not drop")
    assert(FingerprintStore.compactionWatermark(spark, dir) === Some(1L),
      "watermark must be the highest FOLDED batch (newest kept verbatim)")
    // law 1: the screen reads row-identically through the fold
    val after = FingerprintStore.screen(spark, dir, incoming, 3L)
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    assert(after === before, "compaction changed a screen's rows")
    // law 2: a FOLDED batch's replay is a no-op (its rows live in the
    // compacted generation; rewriting batch_id=0 would duplicate them)
    val content = () => spark.read.parquet(dir)
      .select(col("batch_id").cast("long"), col("bucket").cast("long"),
        col("media_id"), col("dhash")).collect().map(_.toSeq).toSet
    val snap = content()
    assert(FingerprintStore.append(spark, dir, fpsOf(0), 0L) === 0L)
    assert(content() === snap, "replayed folded batch changed the store")
    // law 3: the NEWEST batch (kept verbatim) replays idempotently —
    // the at-least-once stream-resume path compaction must not break
    assert(FingerprintStore.append(spark, dir, fpsOf(2), 2L) === 20L * 8)
    assert(content() === snap, "newest-batch replay changed the store")
    assert(FingerprintStore.screen(spark, dir, incoming, 3L)
      .as[(Long, Long, Int, Boolean)].collect().toSeq === before)
    // law 4: as-of reads at or below the watermark refuse loudly
    val e = intercept[IllegalArgumentException](
      FingerprintStore.screen(spark, dir, fpsOf(1), asOfBatch = 1L))
    assert(e.getMessage.contains("watermark"), e.getMessage)
    // ingest continues after the fold; a second compact folds batch 2
    FingerprintStore.append(spark, dir, fpsOf(3), batchId = 3L)
    val (_, r2) = FingerprintStore.compact(spark, dir)
    assert(r2 > 0L, "second compaction reclaimed nothing")
    assert(FingerprintStore.compactionWatermark(spark, dir) === Some(2L))
    val incoming4 = fpsOf(4)
    val want4 = FingerprintStore.screen(spark, dir, incoming4, 4L)
      .as[(Long, Long, Int, Boolean)].collect().toSeq
    // recompute twin over ALL four batches confirms nothing was lost
    val standingAll = fpsOf(0).unionByName(fpsOf(1))
      .unionByName(fpsOf(2)).unionByName(fpsOf(3))
    val hits = SimHash.bandedHammingJoin(incoming4, "media_id",
      standingAll.withColumnRenamed("media_id", "sid"), "sid",
      "dhash", maxDist = 6, bands = 8)
    val recompute = incoming4.select(col("media_id"))
      .join(hits.groupBy("id_a").agg(count(lit(1)).as("n_dups"),
        min("hamming").as("nearest")),
        col("media_id") === col("id_a"), "left_outer")
      .select(col("media_id"), coalesce(col("n_dups"), lit(0L)),
        coalesce(col("nearest"), lit(64)),
        coalesce(col("n_dups"), lit(0L)) === 0L)
      .as[(Long, Long, Int, Boolean)].collect().toSeq.sortBy(_._1)
    assert(want4 === recompute,
      "twice-compacted store diverges from the full recompute")
  }

  test("compact with a trailing-slash dir stages the swap OUTSIDE the " +
      "store (a nested tmp would be destroyed by the swap's delete)") {
    val dir = Files.createTempDirectory("fpstore7").toString + "/fps"
    FingerprintStore.append(spark, dir, fpsOf(0), batchId = 0L)
    FingerprintStore.append(spark, dir, fpsOf(1), batchId = 1L)
    val want = FingerprintStore.screen(spark, dir, fpsOf(2), 2L)
      .collect().map(_.toSeq).toSeq
    FingerprintStore.compact(spark, dir + "/") // tab-completion shape
    assert(FingerprintStore.compactionWatermark(spark, dir) === Some(0L))
    assert(FingerprintStore.screen(spark, dir, fpsOf(2), 2L)
      .collect().map(_.toSeq).toSeq === want,
      "trailing-slash compact lost store content")
  }

  test("maxBatchId lists the newest real batch; fresh and fold-only " +
      "stores answer None-consistent") {
    val dir = Files.createTempDirectory("fpstore8").toString + "/fps"
    assert(FingerprintStore.maxBatchId(spark, dir) === None)
    FingerprintStore.append(spark, dir, fpsOf(0), batchId = 3L)
    assert(FingerprintStore.maxBatchId(spark, dir) === Some(3L))
    FingerprintStore.append(spark, dir, fpsOf(1), batchId = 7L)
    assert(FingerprintStore.maxBatchId(spark, dir) === Some(7L))
    FingerprintStore.compact(spark, dir) // folds 3, keeps 7 verbatim
    assert(FingerprintStore.maxBatchId(spark, dir) === Some(7L),
      "the folded generation must not count as a real batch")
  }

  test("empty-batch screens and appends are no-ops (the idle stream " +
      "micro-batch shape)") {
    val dir = Files.createTempDirectory("fpstore6").toString + "/fps"
    FingerprintStore.append(spark, dir, fpsOf(0), batchId = 0L)
    val empty = fpsOf(0).limit(0)
    val r = FingerprintStore.screen(spark, dir, empty, asOfBatch = 1L)
    assert(r.count() === 0L)
    assert(r.columns.toSeq === Seq("media_id", "n_dups", "nearest",
      "accept"))
    assert(FingerprintStore.append(spark, dir, empty, batchId = 1L) === 0L)
    assert(spark.read.parquet(dir)
      .filter(col("batch_id").cast("long") === 1L).count() === 0L)
  }

  test("a crashed compaction swap (store absent, tmp complete) heals on " +
      "the next entry — screens never see an empty standing set") {
    val root = Files.createTempDirectory("fpstore5").toString
    val dir = root + "/fps"
    FingerprintStore.append(spark, dir, fpsOf(0), batchId = 0L)
    FingerprintStore.append(spark, dir, fpsOf(1), batchId = 1L)
    FingerprintStore.compact(spark, dir) // folds batch 0, watermark 0
    // batch 1's re-ingests reject against the FOLDED batch 0 — at least
    // one rejection, so the heal visibly matters (an empty store would
    // accept them)
    val want = FingerprintStore.screen(spark, dir, fpsOf(1), 1L)
      .collect().map(_.toSeq).toSeq
    assert(want.exists(r => r(3) == false),
      "fixture needs at least one rejection to prove the heal matters")
    // manufacture the exact crash shape: compact deleted the store but
    // died before renaming the (complete) tmp into place
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__compact_tmp")))
    // the next screen adopts the tmp and answers row-identically —
    // without the heal it would read an EMPTY store and accept all
    assert(FingerprintStore.screen(spark, dir, fpsOf(1), 1L)
      .collect().map(_.toSeq).toSeq === want)
    assert(!f.exists(new org.apache.hadoop.fs.Path(dir + "__compact_tmp")),
      "adoption must consume the tmp dir")
  }

  test("screen scan prunes to the incoming batch's buckets; over-radius " +
      "screens refuse") {
    val dir = Files.createTempDirectory("fpstore3").toString + "/fps"
    FingerprintStore.append(spark, dir, fpsOf(0), batchId = 0L)
    FingerprintStore.append(spark, dir, fpsOf(1), batchId = 1L)
    val totalFiles = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    assert(totalFiles > 16, s"need a multi-file store, got $totalFiles")
    // ONE incoming fingerprint touches exactly 8 buckets of 2048
    val one = fpsOf(2).limit(1)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = FingerprintStore.screen(spark, dir, one, asOfBatch = 2L)
      val scan = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.relation.location.rootPaths.exists(
              _.toString.contains("/fps")) => f
        }.getOrElse(fail("no store FileSourceScanExec in plan"))
      assert(scan.partitionFilters.nonEmpty,
        "bucket/batch filters did not become partition filters")
      q.collect()
      assert(scan.metrics("numFiles").value <= 8L * 2,
        s"read ${scan.metrics("numFiles").value} of $totalFiles store " +
          "files — no bucket pruning")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val e = intercept[IllegalArgumentException](
      FingerprintStore.screen(spark, dir, fpsOf(2), 2L, maxDist = 12))
    assert(e.getMessage.contains("recall"),
      s"over-radius screen must refuse: ${e.getMessage}")
  }
}
