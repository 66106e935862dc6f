package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** CHECK constraints on the snapshot log: added only when existing data
  * already satisfies them, enforced on every row-adding verb with loud
  * whole-commit refusal, NULL-passing three-valued logic, and carried
  * across every rewrite verb like the schema.
  */
class SnapshotCheckSpec extends AnyFunSuite with SparkFixture {

  private def freshDir() =
    Files.createTempDirectory("snapcheck").toString + "/tbl"

  private def rows(dir: String): Seq[(Long, String)] =
    SnapshotLog.read(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  test("addCheck refuses a constraint existing data violates") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a"), (-2L, "b")).toDF("k", "v"))
    val e = intercept[IllegalArgumentException](
      SnapshotLog.addCheck(spark, dir, "k_pos", "k > 0"))
    assert(e.getMessage.contains("k_pos") && e.getMessage.contains("1 row"))
    assert(SnapshotLog.checksOf(spark, dir,
      SnapshotLog.versions(spark, dir).last).isEmpty)
  }

  test("commit-time enforcement: violating batch refused whole, table unchanged") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    val v = SnapshotLog.addCheck(spark, dir, "k_pos", "k > 0")
    assert(v === 2L)
    assert(SnapshotLog.checksOf(spark, dir, v) === Seq("k_pos" -> "k > 0"))
    // replace-commit: one bad row poisons the whole commit
    val e = intercept[IllegalArgumentException](SnapshotLog.commit(spark, dir,
      Seq((2L, "b"), (-3L, "c")).toDF("k", "v")))
    assert(e.getMessage.contains("CHECK constraint violated"))
    assert(rows(dir) === Seq((1L, "a")), "nothing may land on refusal")
    // append-commit path
    intercept[IllegalArgumentException](SnapshotLog.commitBatch(spark, dir,
      Seq((-4L, "d")).toDF("k", "v"), batchId = 0L))
    assert(rows(dir) === Seq((1L, "a")))
    // a clean batch lands and carries the constraint forward
    SnapshotLog.commitBatch(spark, dir, Seq((5L, "e")).toDF("k", "v"),
      batchId = 0L)
    assert(rows(dir) === Seq((1L, "a"), (5L, "e")))
    assert(SnapshotLog.checksOf(spark, dir,
      SnapshotLog.versions(spark, dir).last) === Seq("k_pos" -> "k > 0"))
  }

  test("merge validates post-images only — tombstones pass") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    SnapshotLog.addCheck(spark, dir, "k_pos", "k > 0")
    intercept[IllegalArgumentException](SnapshotLog.merge(spark, dir,
      Seq((-9L, "bad", false)).toDF("k", "v", "del"), keys = Seq("k"),
      deleteWhen = Some(col("del")), dropCols = Seq("del")))
    // a tombstone for a negative key is a DELETE, not a row — it must
    // not be validated as a post-image
    SnapshotLog.merge(spark, dir,
      Seq((2L, "x", true)).toDF("k", "v", "del"), keys = Seq("k"),
      deleteWhen = Some(col("del")), dropCols = Seq("del"))
    assert(rows(dir) === Seq((1L, "a")))
  }

  test("NULL three-valued logic: a NULL check expression passes") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((1L, Some("a")), (2L, None)).toDF("k", "v"))
    // length(NULL) > 0 is NULL → passes (declare not-null separately)
    SnapshotLog.addCheck(spark, dir, "v_nonempty", "length(v) > 0")
    SnapshotLog.commit(spark, dir,
      Seq((3L, None: Option[String])).toDF("k", "v"))
    assert(SnapshotLog.read(spark, dir).count() === 1)
    intercept[IllegalArgumentException](SnapshotLog.commit(spark, dir,
      Seq((4L, Some(""))).toDF("k", "v")))
  }

  test("constraints survive rewrite verbs, restore and clone") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir,
      Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))
    SnapshotLog.addCheck(spark, dir, "k_pos", "k > 0")
    def checkAt(d: String) = SnapshotLog.checksOf(spark, d,
      SnapshotLog.versions(spark, d).last)
    SnapshotLog.deleteWhere(spark, dir, col("k") === 2L)
    assert(checkAt(dir) === Seq("k_pos" -> "k > 0"), "after deleteWhere")
    SnapshotLog.optimize(spark, dir)
    assert(checkAt(dir) === Seq("k_pos" -> "k > 0"), "after optimize")
    SnapshotLog.restore(spark, dir, 2L)
    assert(checkAt(dir) === Seq("k_pos" -> "k > 0"), "after restore")
    val dst = freshDir()
    SnapshotLog.shallowClone(spark, dir, dst)
    assert(checkAt(dst) === Seq("k_pos" -> "k > 0"), "after clone")
    intercept[IllegalArgumentException](SnapshotLog.commitBatch(spark, dst,
      Seq((-1L, "x")).toDF("k", "v"), batchId = 0L))
  }

  test("dropCheck re-opens the gate; unknown name is loud") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a")).toDF("k", "v"))
    SnapshotLog.addCheck(spark, dir, "k_pos", "k > 0")
    intercept[IllegalArgumentException](
      SnapshotLog.dropCheck(spark, dir, "nope"))
    SnapshotLog.dropCheck(spark, dir, "k_pos")
    SnapshotLog.commit(spark, dir, Seq((-7L, "z")).toDF("k", "v"))
    assert(rows(dir) === Seq((-7L, "z")))
  }

  test("a streaming sink is constraint-governed: a bad batch fails the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val dir = freshDir()
    val ck = Files.createTempDirectory("snapcheck-ck").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    SnapshotLog.commit(spark, dir, Seq((1L, "seed")).toDF("k", "v"))
    SnapshotLog.addCheck(spark, dir, "k_pos", "k > 0")
    val ms = MemoryStream[(Long, String)]
    val q = SnapshotLog.sink(ms.toDF().toDF("k", "v"), dir, ck)
    try {
      ms.addData((2L, "ok"))
      q.processAllAvailable()
      assert(SnapshotLog.read(spark, dir).count() === 2)
      // the violating micro-batch must fail the QUERY loudly — never a
      // silently-skipped batch, never a partially-visible version
      ms.addData((-3L, "bad"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
        q.processAllAvailable())
      assert(e.getCause.getMessage.contains("k_pos"),
        s"stream must surface the constraint: ${e.getCause.getMessage}")
    } finally q.stop()
    assert(SnapshotLog.read(spark, dir).count() === 2,
      "the refused batch must not be visible in any version")
  }

  test("a narrow batch cannot sneak typed nulls past a widened-column check") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "a", 5L)).toDF("k", "v", "w"))
    SnapshotLog.addCheck(spark, dir, "w_set", "w IS NOT NULL")
    // a (k, v)-only batch would read w as NULL after the schema merge —
    // exactly what the constraint forbids; refused loudly at commit
    val e = intercept[IllegalArgumentException](SnapshotLog.commitBatch(
      spark, dir, Seq((2L, "b")).toDF("k", "v"), batchId = 0L))
    assert(e.getMessage.contains("absent"), e.getMessage)
    assert(SnapshotLog.versions(spark, dir).size === 2, "nothing committed")
    // the widened batch passes
    SnapshotLog.commitBatch(spark, dir,
      Seq((2L, "b", 7L)).toDF("k", "v", "w"), batchId = 0L)
    assert(SnapshotLog.read(spark, dir).count() === 2)
  }

  test("multiple checks validate in one pass; failure names each") {
    import spark.implicits._
    val dir = freshDir()
    SnapshotLog.commit(spark, dir, Seq((1L, "aa")).toDF("k", "v"))
    SnapshotLog.addCheck(spark, dir, "k_pos", "k > 0")
    SnapshotLog.addCheck(spark, dir, "v_len", "length(v) >= 2")
    val e = intercept[IllegalArgumentException](SnapshotLog.commit(spark, dir,
      Seq((-1L, "x"), (-2L, "yy")).toDF("k", "v")))
    assert(e.getMessage.contains("k_pos") && e.getMessage.contains("2 row"))
    assert(e.getMessage.contains("v_len") && e.getMessage.contains("1 row"))
  }
}
