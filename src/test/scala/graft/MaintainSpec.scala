package graft

import graft.sources.SnapshotLog
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The graft.Maintain deployment entry drives every maintenance verb
  * end-to-end against a real table — argument parsing included, since
  * that is the part only this main owns. */
class MaintainSpec extends AnyFunSuite with SparkFixture {

  test("maintenance verbs run end-to-end through the CLI surface") {
    import spark.implicits._
    val dir = Files.createTempDirectory("maintain").toString + "/tbl"
    SnapshotLog.commit(spark, dir,
      (1L to 20L).map(k => (k, s"v$k")).toDF("k", "v").repartition(4))
    Maintain.run(spark, Seq(dir, "add-check", "k_pos", "k", ">", "0"))
    Maintain.run(spark, Seq(dir, "optimize", "1", "k"))
    Maintain.run(spark, Seq(dir, "analyze", "k"))
    Maintain.run(spark, Seq(dir, "delete-where", "k", "=", "7"))
    Maintain.run(spark, Seq(dir, "update-where", "v", "'patched'", "k = 3"))
    Maintain.run(spark, Seq(dir, "history"))
    assert(SnapshotLog.read(spark, dir).count() === 19)
    assert(SnapshotLog.read(spark, dir)
      .filter(org.apache.spark.sql.functions.col("k") === 3L)
      .head.getString(1) === "patched")
    // checks carried through the whole verb chain
    assert(SnapshotLog.checksOf(spark, dir,
      SnapshotLog.versions(spark, dir).last) === Seq("k_pos" -> "k > 0"))
    val dst = Files.createTempDirectory("maintain").toString + "/branch"
    Maintain.run(spark, Seq(dir, "clone", dst))
    Maintain.run(spark, Seq(dst, "materialize"))
    assert(SnapshotLog.read(spark, dst).count() === 19)
    Maintain.run(spark, Seq(dir, "drop-check", "k_pos"))
    // restore rolls back table STATE — data and metadata: v1 predates
    // the constraint, so the restored table has none (Delta semantics)
    Maintain.run(spark, Seq(dir, "restore", "1"))
    assert(SnapshotLog.read(spark, dir).count() === 20)
    assert(SnapshotLog.checksOf(spark, dir,
      SnapshotLog.versions(spark, dir).last).isEmpty)
    // with a 24h retention nothing this young may drop
    Maintain.run(spark, Seq(dir, "vacuum", "1", "24"))
    assert(SnapshotLog.versions(spark, dir).size > 1)
    // dry run first: the plan prints but deletes nothing
    val vsBeforePlan = SnapshotLog.versions(spark, dir)
    Maintain.run(spark, Seq(dir, "vacuum-plan", "1"))
    assert(SnapshotLog.versions(spark, dir) === vsBeforePlan,
      "vacuum-plan must be read-only")
    Maintain.run(spark, Seq(dir, "vacuum", "1"))
    assert(SnapshotLog.versions(spark, dir).size === 1)
    intercept[IllegalArgumentException](
      Maintain.run(spark, Seq(dir, "frobnicate")))
  }

  test("compact-index drives the BM25 index compaction end-to-end") {
    import spark.implicits._
    val idx = Files.createTempDirectory("maintain").toString + "/idx"
    graft.streaming.CdcIndex.applyChanges(spark,
      Seq(("I", 1L, "alpha beta"), ("I", 2L, "beta gamma"))
        .toDF("op", "doc_id", "text"), 0L, idx)
    graft.streaming.CdcIndex.applyChanges(spark,
      Seq(("D", 1L, null.asInstanceOf[String]), ("I", 3L, "gamma delta"))
        .toDF("op", "doc_id", "text"), 1L, idx)
    graft.streaming.CdcIndex.applyChanges(spark,
      Seq(("I", 4L, "delta beta")).toDF("op", "doc_id", "text"), 2L, idx)
    Maintain.run(spark, Seq(idx, "compact-index", "bm25"))
    val hits = graft.streaming.CdcIndex.query(spark, idx, Seq("beta"))
      .collect().map(_.getLong(0)).toSet
    assert(hits === Set(2L, 4L), "compacted index must serve live docs only")
    intercept[IllegalArgumentException](
      Maintain.run(spark, Seq(idx, "compact-index", "nope")))
  }

  test("compact-index fingerprint drives the fingerprint-store fold " +
      "end-to-end") {
    import spark.implicits._
    import graft.dedup.{FingerprintStore, ImageDedup}
    val store = Files.createTempDirectory("maintain").toString + "/fps"
    def fps(b: Long) = (b * 10 until b * 10 + 10)
      .map(id => id -> ImageDedup.dHash64(ImageDedup.testRaster(id, 32, 32)))
      .toDF("media_id", "dhash")
    FingerprintStore.append(spark, store, fps(0), 0L)
    FingerprintStore.append(spark, store, fps(1), 1L)
    FingerprintStore.append(spark, store, fps(2), 2L)
    val before = FingerprintStore.screen(spark, store, fps(3), 3L)
      .collect().map(_.toSeq).toSeq
    Maintain.run(spark, Seq(store, "compact-index", "fingerprint"))
    assert(FingerprintStore.compactionWatermark(spark, store) === Some(1L))
    assert(FingerprintStore.screen(spark, store, fps(3), 3L)
      .collect().map(_.toSeq).toSeq === before,
      "CLI-driven fold changed a screen's rows")
  }

  test("compact-index semvec drives the accepted-vector fold " +
      "end-to-end") {
    import graft.sim.Ivf
    import graft.streaming.SemDedupStream
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, Sf)
    val cents = Ivf.centroidsIter(e, "embedding", "label", iters = 1)
    val outDir = Files.createTempDirectory("maintain").toString + "/sem"
    val base = e.select("vec_id", "embedding")
    SemDedupStream.mergeBatch(spark,
      base.filter(col("vec_id") < 50), 0L, outDir, cents)
    SemDedupStream.mergeBatch(spark,
      base.filter(col("vec_id") >= 50 && col("vec_id") < 100), 1L,
      outDir, cents)
    val before = spark.read
      .parquet(SemDedupStream.storePath(outDir))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    Maintain.run(spark, Seq(outDir, "compact-index", "semvec"))
    assert(SemDedupStream.compactionWatermark(spark, outDir) === Some(0L))
    assert(spark.read.parquet(SemDedupStream.storePath(outDir))
      .select("vec_id").collect().map(_.getLong(0)).toSet === before,
      "CLI-driven fold changed the accepted set")
  }

  test("train-quantizer: a reproducible artifact the batch stage's " +
      "quantizer_path judges IDENTICALLY to in-run training") {
    val e = Tables.embeddings(spark, Sf)
    val corpus = Files.createTempDirectory("maintain").toString + "/emb"
    e.select("vec_id", "embedding").write.parquet(corpus)
    val qdir = Files.createTempDirectory("maintain").toString + "/q"
    Maintain.run(spark, Seq(corpus, "train-quantizer", qdir,
      "vec_id", "embedding", "5", "2"))
    val cents = spark.read.parquet(qdir)
    assert(cents.columns.toSet === Set("list_id", "centroid"))
    assert(cents.count() >= 1L && cents.count() <= 5L)
    // determinism makes the artifact and in-run training interchange:
    // same corpus, same k, same iters => identical survivors
    val cfg = CuratePipeline.CurateConfig(
      inputPath = "unused", outDir = "unused", idCol = "vec_id")
    val docs = spark.read.parquet(corpus)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val inline = CuratePipeline.applyStage(spark, docs,
      CuratePipeline.Stage("dedup_semantic",
        Map("tau_milli" -> "350", "clusters" -> "5", "iters" -> "2")),
      cfg)
    val frozen = CuratePipeline.applyStage(spark, docs,
      CuratePipeline.Stage("dedup_semantic",
        Map("tau_milli" -> "350", "quantizer_path" -> qdir)), cfg)
    assert(ids(inline) === ids(frozen),
      "frozen-artifact verdicts diverged from in-run training")
    assert(ids(frozen).size < docs.count(),
      "the stage dropped nothing on this corpus")
    // a quantizer dir missing the contract columns names the fix
    val bad = Files.createTempDirectory("maintain").toString + "/badq"
    docs.limit(1).write.parquet(bad)
    val eCols = intercept[IllegalArgumentException](
      CuratePipeline.applyStage(spark, docs,
        CuratePipeline.Stage("dedup_semantic",
          Map("tau_milli" -> "350", "quantizer_path" -> bad)), cfg)
        .count())
    assert(eCols.getMessage.contains("list_id"))
  }

  test("replicate / poll-changes / ack-changes: a replica follows the " +
      "source across two CLI drains; the cursor protocol round-trips") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val src = Files.createTempDirectory("maintain").toString + "/src"
    val dst = Files.createTempDirectory("maintain").toString + "/dst"
    val ckpt = Files.createTempDirectory("maintain-ckpt").toString
    SnapshotLog.commit(spark, src,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    SnapshotLog.setTableProperties(spark, src,
      Map(SnapshotLog.ChangeFeedProperty -> "true"))
    def srcRows() = SnapshotLog.read(spark, src).orderBy("k")
      .as[(Long, String)].collect().toSeq
    def dstRows() = SnapshotLog.read(spark, dst).orderBy("k")
      .as[(Long, String)].collect().toSeq
    // drain 1: bootstrap
    Maintain.run(spark, Seq(src, "replicate", dst, "k", ckpt))
    assert(dstRows() === srcRows())
    // the source rewrites; drain 2 (same checkpoint) converges
    SnapshotLog.merge(spark, src,
      Seq((1L, "A", false), (2L, "b", true), (4L, "d", false))
        .toDF("k", "v", "del"),
      keys = Seq("k"), deleteWhen = Some(col("del")),
      dropCols = Seq("del"))
    Maintain.run(spark, Seq(src, "replicate", dst, "k", ckpt))
    assert(dstRows() === srcRows())
    // cursor protocol: poll prints the pending feed, ack retires it
    val cursor = Files.createTempDirectory("maintain-cur").toString + "/c"
    Maintain.run(spark, Seq(src, "poll-changes", cursor, "k"))
    val latest = SnapshotLog.versions(spark, src).last
    Maintain.run(spark, Seq(src, "ack-changes", cursor, latest.toString))
    assert(SnapshotLog.pollChanges(spark, src, cursor, Seq("k")).isEmpty,
      "acked subscription must read as caught-up")
    intercept[IllegalArgumentException](
      Maintain.run(spark, Seq(src, "replicate", dst)))
  }
}
