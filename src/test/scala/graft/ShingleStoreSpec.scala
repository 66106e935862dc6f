package graft

import graft.dedup.ShingleStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The persisted shingle-type store must (1) answer a screen exactly as
  * the standing-corpus recompute does, (2) stay type-grain distinct and
  * replay-idempotent across appends, and (3) physically prune its scan
  * to the buckets an incoming batch touches. */
class ShingleStoreSpec extends AnyFunSuite with SparkFixture {

  private def docsBy(m: Int) = Tables.documents(spark, Sf)
    .select("doc_id", "text").filter(col("doc_id") % 3 === m)

  test("store-backed screen equals the standing-corpus formulation over 3 batches") {
    val dir = Files.createTempDirectory("shstore").toString + "/types"
    ShingleStore.append(spark, dir, docsBy(0), batchId = 0L)
    ShingleStore.append(spark, dir, docsBy(1), batchId = 1L)

    val fromStore = ShingleStore.screen(spark, dir, docsBy(2), asOfBatch = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

    // the q_dedup_passage_incr formulation, standing corpus recomputed
    val standingDocs = Tables.documents(spark, Sf)
      .select("doc_id", "text").filter(col("doc_id") % 3 =!= 2)
    val standingTypes = ShingleStore.docShingles(standingDocs)
      .select(col("h").as("sh_h")).distinct()
    val direct = ShingleStore.docShingles(docsBy(2))
      .join(standingTypes, col("h") === col("sh_h"), "left_outer")
      .select(col("doc_id"),
        when(col("sh_h").isNotNull, 1L).otherwise(0L).as("seen"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), sum("seen").as("n_seen"))
      .select(col("doc_id"), col("n_shingles"), col("n_seen"),
        expr("(n_shingles - n_seen) * 1000 div n_shingles").as("novel_milli"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

    assert(fromStore.nonEmpty)
    assert(fromStore === direct,
      "store-backed screen diverged from the standing-corpus recompute")
  }

  test("appends are novel-only and replay-idempotent") {
    val dir = Files.createTempDirectory("shstore2").toString + "/types"
    val n0 = ShingleStore.append(spark, dir, docsBy(0), batchId = 0L)
    val n1 = ShingleStore.append(spark, dir, docsBy(1), batchId = 1L)
    assert(n0 > 0 && n1 > 0)
    val all = spark.read.parquet(dir)
    // TYPE grain store-wide: no hash appears under two batches
    assert(all.count() === all.select("h").distinct().count(),
      "a shingle type was stored more than once")
    // at-least-once replay of batch 1 rewrites its own partitions to the
    // identical content
    val before = all.select(col("batch_id").cast("long"), col("h"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    val n1b = ShingleStore.append(spark, dir, docsBy(1), batchId = 1L)
    assert(n1b === n1)
    val after = spark.read.parquet(dir)
      .select(col("batch_id").cast("long"), col("h"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSet
    assert(after === before, "replayed append changed the store")
  }

  test("screen scan prunes to the incoming batch's buckets") {
    import spark.implicits._
    val dir = Files.createTempDirectory("shstore3").toString + "/types"
    ShingleStore.append(spark, dir, docsBy(0), batchId = 0L)
    ShingleStore.append(spark, dir, docsBy(1), batchId = 1L)
    val totalFiles = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    assert(totalFiles > 4, s"need a multi-file store, got $totalFiles")
    // one 8-token doc = exactly ONE shingle type = one bucket touched
    val tiny = Seq((999999L, "one two three four five six seven eight"))
      .toDF("doc_id", "text")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = ShingleStore.screen(spark, dir, tiny, asOfBatch = 2L)
      val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("/types")) => f
      }.getOrElse(fail("no store FileSourceScanExec in plan"))
      assert(scan.partitionFilters.nonEmpty,
        "bucket/batch filters did not become partition filters")
      q.collect()
      assert(scan.metrics("numFiles").value <= totalFiles / 4,
        s"read ${scan.metrics("numFiles").value} of $totalFiles store files — no bucket pruning")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
