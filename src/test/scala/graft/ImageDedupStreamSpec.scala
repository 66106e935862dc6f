package graft

import graft.dedup.ImageDedup
import graft.multimodal.Png
import graft.streaming.ImageDedupStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Streaming image dedup ([[graft.streaming.ImageDedupStream]]): the
  * cross-batch accepted set must equal a sequential reference applying
  * the same pointwise rule (reject when ANY earlier-accepted or
  * smaller-same-batch fingerprint sits within the radius), a replayed
  * batch must leave the store byte-identical, and only fingerprints —
  * never payloads — may persist. */
class ImageDedupStreamSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def png(srcId: Long, resized: Boolean = false): Array[Byte] = {
    val base = ImageDedup.testRaster(srcId, 32, 32)
    if (resized)
      Png.encode(16, 16, 1, Png.resizeBox(base, 16, 16).pixels)
    else Png.encode(32, 32, 1, base.pixels)
  }

  // three batches: fresh images, re-ingests of batch-0 images (resized
  // + re-encoded), and an in-batch dup pair
  private val batches: Seq[Seq[(Long, Array[Byte])]] = Seq(
    (0L until 8L).map(id => id -> png(id)),
    Seq(100L -> png(0, resized = true), // near-dup of accepted 0
      101L -> png(100), 102L -> png(101)), // fresh
    Seq(200L -> png(5), // re-encode of accepted 5
      201L -> png(300), 202L -> png(300, resized = true), // in-batch pair
      203L -> png(400)))

  /** Sequential reference: the pointwise rule applied batch by batch. */
  private def referenceAccepted: Set[Long] = {
    var accepted = Map.empty[Long, Long] // id -> dhash
    for (b <- batches) {
      val fps = b.map { case (id, p) =>
        id -> ImageDedup.dHash64(Png.decode(p))
      }
      val keep = fps.filter { case (id, h) =>
        val vsStanding = accepted.values.forall(s =>
          java.lang.Long.bitCount(s ^ h) > 6)
        val vsBatch = fps.forall { case (o, oh) =>
          o >= id || java.lang.Long.bitCount(oh ^ h) > 6
        }
        vsStanding && vsBatch
      }
      accepted ++= keep
    }
    accepted.keySet
  }

  test("cross-batch accepted set == sequential reference; replayed " +
      "batch leaves the store byte-identical; state holds fingerprints " +
      "only") {
    val out = Files.createTempDirectory("imgstream").toString
    val kept = batches.zipWithIndex.map { case (b, i) =>
      ImageDedupStream.mergeBatch(spark,
        b.toDF("media_id", "payload"), i.toLong, out)
    }
    assert(kept.sum > 0)
    val store = ImageDedupStream.storePath(out)
    def acceptedIds() = spark.read.parquet(store)
      .select("media_id").distinct().as[Long].collect().toSet
    assert(acceptedIds() === referenceAccepted,
      s"stream diverges from the sequential rule")
    // the planted semantics hold: re-ingests rejected, in-batch loser
    // rejected, fresh accepted
    assert(!acceptedIds().contains(100L) && !acceptedIds().contains(200L),
      "re-ingest of an accepted image slipped through")
    assert(acceptedIds().contains(201L) && !acceptedIds().contains(202L),
      "in-batch pair must keep the lowest id only")
    // replay batch 1: store content must not change (at-least-once)
    val before = spark.read.parquet(store)
      .select(col("batch_id").cast("long"), col("bucket").cast("long"),
        col("media_id"), col("dhash"))
      .collect().map(_.toSeq).toSet
    ImageDedupStream.mergeBatch(spark,
      batches(1).toDF("media_id", "payload"), 1L, out)
    val after = spark.read.parquet(store)
      .select(col("batch_id").cast("long"), col("bucket").cast("long"),
        col("media_id"), col("dhash"))
      .collect().map(_.toSeq).toSet
    assert(after === before, "replayed batch changed the store")
    // state discipline: fingerprints only, no payload bytes persisted
    assert(spark.read.parquet(store).columns.toSet ===
      Set("media_id", "dhash", "batch_id", "bucket"))
  }

  test("resume across a store compaction: the newest batch still " +
      "replays idempotently, new batches screen identically to an " +
      "uncompacted twin, and a folded batch's replay refuses loudly") {
    import graft.dedup.FingerprintStore
    val out = Files.createTempDirectory("imgstream-c").toString
    val twin = Files.createTempDirectory("imgstream-t").toString
    for (o <- Seq(out, twin); (b, i) <- batches.zipWithIndex)
      ImageDedupStream.mergeBatch(spark,
        b.toDF("media_id", "payload"), i.toLong, o)
    val store = ImageDedupStream.storePath(out)
    // (file reclaim on this tiny fixture can be 0 — batches barely
    // share buckets; FingerprintStoreSpec/ScaleGrowthSpec prove the
    // reclaim at size. Here the law under test is RESUME semantics.)
    FingerprintStore.compact(spark, store)
    assert(FingerprintStore.compactionWatermark(spark, store) === Some(1L))
    // the newest batch (2, kept verbatim by the fold) is the one an
    // at-least-once resume may replay: byte-identical store after
    val content = () => spark.read.parquet(store)
      .select(col("batch_id").cast("long"), col("bucket").cast("long"),
        col("media_id"), col("dhash")).collect().map(_.toSeq).toSet
    val snap = content()
    ImageDedupStream.mergeBatch(spark,
      batches(2).toDF("media_id", "payload"), 2L, out)
    assert(content() === snap,
      "newest-batch replay after compaction changed the store")
    // a NEW batch screens identically through the fold: the compacted
    // store and the uncompacted twin accept the same ids
    val b3 = Seq(300L -> png(0, resized = true), // dup of accepted 0
      301L -> png(500))                          // fresh
    val k1 = ImageDedupStream.mergeBatch(spark,
      b3.toDF("media_id", "payload"), 3L, out)
    val k2 = ImageDedupStream.mergeBatch(spark,
      b3.toDF("media_id", "payload"), 3L, twin)
    assert(k1 === k2 && k1 === 1L,
      s"compacted ($k1) vs uncompacted ($k2) stores accept differently")
    // a FOLDED batch's replay cannot be served soundly (its as-of
    // provenance is gone) — the stream's contract is that only
    // checkpoint-committed batches fold, so this refuses loudly rather
    // than silently re-screening against later fingerprints
    val e = intercept[IllegalArgumentException](
      ImageDedupStream.mergeBatch(spark,
        batches(0).toDF("media_id", "payload"), 0L, out))
    assert(e.getMessage.contains("watermark"), e.getMessage)
  }

  test("the streaming wire-up drains a memory feed through the same " +
      "merge (foreachBatch)") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("imgstream2").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val q = ImageDedupStream.run(
      ms.toDF.toDF("media_id", "payload"), out,
      Files.createTempDirectory("imgstream2-ckpt").toString)
    try {
      ms.addData(Seq(1L -> png(1), 2L -> png(2)))
      q.processAllAvailable()
      ms.addData(Seq(3L -> png(1, resized = true), 4L -> png(9)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read.parquet(ImageDedupStream.storePath(out))
      .select("media_id").distinct().as[Long].collect().toSet
    assert(ids === Set(1L, 2L, 4L),
      s"expected 3 (re-ingest of 1) rejected; got $ids")
  }
}
