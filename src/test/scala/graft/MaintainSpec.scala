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
}
