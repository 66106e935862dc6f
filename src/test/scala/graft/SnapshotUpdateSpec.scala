package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** UPDATE ... SET ... WHERE on the snapshot log: matched rows only,
  * file-grain rewrite cost, pre-image predicate semantics, schema
  * immutability, and CHECK enforcement on post-images.
  */
class SnapshotUpdateSpec extends AnyFunSuite with SparkFixture {

  private def freshDir() =
    Files.createTempDirectory("snapupd").toString + "/tbl"

  private def rows(dir: String): Seq[(Long, String, Long)] =
    SnapshotLog.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("updates matched rows only; expressions see the pre-image row") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L))
        .toDF("k", "v", "n").coalesce(1))
    val v = SnapshotLog.updateWhere(spark, dir, col("v") === "a",
      Map("n" -> (col("n") + col("k")), "v" -> lit("upd")))
    assert(v === 2L)
    assert(rows(dir) === Seq((1L, "upd", 11L), (2L, "b", 20L),
      (3L, "upd", 33L)))
    // no-match predicate: current version returned untouched
    assert(SnapshotLog.updateWhere(spark, dir, col("v") === "zzz",
      Map("n" -> lit(0L))) === 2L)
  }

  test("only files holding a match are rewritten; the rest carry") {
    import spark.implicits._
    val dir = freshDir()
    // two files: ks 1-3 and 100-102
    SnapshotLog.commit(spark, dir, Seq((1L, "x", 0L), (2L, "x", 0L))
      .toDF("k", "v", "n").coalesce(1))
    val before = graft.sources.SnapshotLog.referencedFiles(spark, dir)
    SnapshotLog.commitBatch(spark, dir,
      Seq((100L, "y", 0L), (101L, "y", 0L)).toDF("k", "v", "n").coalesce(1),
      batchId = 0L)
    SnapshotLog.updateWhere(spark, dir, col("k") >= 100L,
      Map("n" -> lit(7L)))
    // the first commit's file is carried verbatim into the new manifest
    val nowRefs = graft.sources.SnapshotLog.referencedFiles(spark, dir)
    assert(before.subsetOf(nowRefs),
      "unmatched file must be carried by reference, not rewritten")
    assert(rows(dir).map(_._3) === Seq(0L, 0L, 7L, 7L))
  }

  test("NULL predicate rows are untouched (three-valued logic)") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((1L, Some("a"), 1L), (2L, None, 2L)).toDF("k", "v", "n")
        .coalesce(1))
    SnapshotLog.updateWhere(spark, dir, col("v") === "a",
      Map("n" -> lit(99L)))
    val got = SnapshotLog.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got === Seq((1L, 99L), (2L, 2L)),
      "a NULL-evaluating predicate must not update the row")
  }

  test("schema is immutable; unknown SET column is loud; types coerce") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a", 5L)).toDF("k", "v", "n"))
    val e = intercept[IllegalArgumentException](SnapshotLog.updateWhere(
      spark, dir, lit(true), Map("nope" -> lit(1L))))
    assert(e.getMessage.contains("unknown column"))
    // an Int literal lands in the Long column via the declared cast
    SnapshotLog.updateWhere(spark, dir, lit(true), Map("n" -> lit(7)))
    val df = SnapshotLog.read(spark, dir)
    assert(df.schema("n").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(df.head.getLong(2) === 7L)
  }

  test("CHECK constraints validate post-images; violating update refused") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((1L, "a", 5L), (2L, "b", 6L)).toDF("k", "v", "n").coalesce(1))
    SnapshotLog.addCheck(spark, dir, "n_pos", "n > 0")
    val e = intercept[IllegalArgumentException](SnapshotLog.updateWhere(
      spark, dir, col("k") === 1L, Map("n" -> lit(-1L))))
    assert(e.getMessage.contains("n_pos") &&
      e.getMessage.contains("UPDATE post-images"))
    assert(rows(dir).map(_._3) === Seq(5L, 6L), "refusal commits nothing")
    // an update that keeps the invariant passes and carries the check
    SnapshotLog.updateWhere(spark, dir, col("k") === 1L, Map("n" -> lit(9L)))
    assert(rows(dir).map(_._3) === Seq(9L, 6L))
    assert(SnapshotLog.checksOf(spark, dir,
      SnapshotLog.versions(spark, dir).last) === Seq("n_pos" -> "n > 0"))
  }

  test("composes with a deletion vector: dead rows neither update nor resurrect (r8)") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((1L, "a", 1L), (2L, "b", 2L), (3L, "c", 3L)).toDF("k", "v", "n"))
    SnapshotLog.deleteWhereMoR(spark, dir, col("k") === 2L)
    SnapshotLog.updateWhere(spark, dir, lit(true), Map("n" -> lit(0L)))
    val got = SnapshotLog.read(spark, dir).orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "a", 0L), (3L, "c", 0L)),
      "MoR-dead row resurrected or survivors not updated")
  }
}
