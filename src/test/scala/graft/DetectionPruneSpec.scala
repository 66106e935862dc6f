package graft

import java.nio.file.Files

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-grain pre-pruning of the rewriting verbs' affected-file
  * DETECTION scans (round 11): a deleteWhere/updateWhere/replaceWhere
  * against a stats-analyzed or partitioned table must decide most
  * carry-by-reference files from the MANIFEST alone — zone maps,
  * partition tuples — without opening their footers, and must fall
  * back to scanning everything when the predicate cannot be lowered.
  * The prune is an optimization with an exactness contract: results
  * are pinned equal to the unpruned semantics. */
class DetectionPruneSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("detprune").toString + "/tbl"

  test("zone-map stats shrink the detection candidate set; unprunable " +
      "predicates keep every file") {
    val dir = freshDir()
    // 4 files with disjoint k ranges, stats recorded
    val df = spark.range(0, 4000).select(col("id").as("k"),
      (col("id") % 7).as("v")).repartitionByRange(4, col("k"))
    SnapshotLog.commitWithStats(spark, dir, df, Seq("k"))
    val v = SnapshotLog.versions(spark, dir).last
    val all = SnapshotLog.detectionCandidates(spark, dir, v,
      col("v") === 3) // no stats on v -> conservative all
    assert(all.size === 4)
    val ranged = SnapshotLog.detectionCandidates(spark, dir, v,
      col("k") >= 3500)
    assert(ranged.size < 4 && ranged.nonEmpty,
      s"range probe should prune stat-disjoint files, kept ${ranged.size}")
    val unprunable = SnapshotLog.detectionCandidates(spark, dir, v,
      col("k") % 5 === 0) // modulo has no probe form
    assert(unprunable.size === 4)
    // exactness: the pruned detection feeds the same delete result
    SnapshotLog.deleteWhere(spark, dir, col("k") >= 3500)
    assert(SnapshotLog.read(spark, dir).count() === 3500)
    assert(SnapshotLog.read(spark, dir).agg(max("k")).as[Long]
      .head() === 3499L)
  }

  test("partition tuples prune detection on partitioned tables; " +
      "updateWhere stays exact") {
    val dir = freshDir()
    val df = Seq(("eu", 1L), ("eu", 2L), ("us", 3L), ("ap", 4L))
      .toDF("region", "k")
    SnapshotLog.commitPartitioned(spark, dir, df, Seq("region"))
    val v = SnapshotLog.versions(spark, dir).last
    val cands = SnapshotLog.detectionCandidates(spark, dir, v,
      col("region") === "eu")
    val parts = SnapshotLog.filePartsOf(spark, dir, v)
    assert(cands.nonEmpty &&
      cands.forall(p => parts(p)("region") == "eu"),
      s"partition probe kept non-eu files: $cands")
    // exactness through the verb
    SnapshotLog.updateWhere(spark, dir, col("region") === "eu",
      Map("k" -> (col("k") + 100)))
    assert(SnapshotLog.read(spark, dir).orderBy("k")
      .select("region", "k").as[(String, Long)].collect().toSeq ===
      Seq(("us", 3L), ("ap", 4L), ("eu", 101L), ("eu", 102L)))
  }
}
