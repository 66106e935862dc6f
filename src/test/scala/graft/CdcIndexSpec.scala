package graft

import graft.streaming.CdcIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The CDC-maintained index must answer every query exactly as a fresh
  * corpus scan over the CURRENT document state — through inserts,
  * updates, deletes, replay, and physical compaction. */
class CdcIndexSpec extends AnyFunSuite with SparkFixture {

  private val Terms = Seq("join", "fast", "table")

  /** Ground truth: score the given current-state docs with the corpus
    * scorer (shared arithmetic), top-10. */
  private def expectTop10(docs: org.apache.spark.sql.DataFrame) =
    graft.ops.TextRankOps.bm25DocScores(docs, Terms)
      .select(col("doc_id"), col("n_terms"),
        col("score_dec").cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def indexTop10(dir: String) =
    CdcIndex.query(spark, dir, Terms).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("insert/update/delete feed matches a fresh scan of the current state") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcidx").toString + "/idx"
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")

    // batch 0: all docs inserted
    CdcIndex.applyChanges(spark,
      docs.withColumn("op", lit("I")).select("op", "doc_id", "text"), 0L, dir)
    assert(indexTop10(dir) === expectTop10(docs))

    // batch 1: delete the current top-1 doc, rewrite doc 7 to score high
    val top1 = indexTop10(dir).head._1
    val newText = "join fast table join fast table join"
    val changes = Seq(
      ("D", top1, null.asInstanceOf[String]),
      ("U", 7L, newText)
    ).toDF("op", "doc_id", "text")
    CdcIndex.applyChanges(spark, changes, 1L, dir)
    val current = docs.filter(col("doc_id") =!= top1 && col("doc_id") =!= 7L)
      .unionByName(Seq((7L, newText)).toDF("doc_id", "text"))
    assert(indexTop10(dir) === expectTop10(current))
    assert(indexTop10(dir).exists(_._1 === 7L), "updated doc must rank")
    assert(!indexTop10(dir).exists(_._1 === top1), "deleted doc must vanish")

    // replay batch 1 (at-least-once): byte-identical partitions, same answer
    CdcIndex.applyChanges(spark, changes, 1L, dir)
    assert(indexTop10(dir) === expectTop10(current))

    // compact: physical apply of every CHECKPOINT-SAFE batch. The newest
    // batch (1) may still replay, so its partitions and tombstones stay
    // verbatim — cleared is 0 here, and the answer is unchanged
    val (dropped, cleared) = CdcIndex.compact(spark, dir)
    assert(dropped > 0 && cleared === 0L)
    assert(new java.io.File(CdcIndex.tombstonesPath(dir)).exists())
    assert(indexTop10(dir) === expectTop10(current))

    // post-compaction life continues: a new delete works on generation -1
    CdcIndex.applyChanges(spark,
      Seq(("D", 7L, null.asInstanceOf[String])).toDF("op", "doc_id", "text"),
      2L, dir)
    val afterDel = current.filter(col("doc_id") =!= 7L)
    assert(indexTop10(dir) === expectTop10(afterDel))

    // once batch 2 is the newest, a second compact folds batch 1 away and
    // clears ITS tombstones, keeping only batch 2's
    val (_, cleared2) = CdcIndex.compact(spark, dir)
    assert(cleared2 === 2L)
    assert(indexTop10(dir) === expectTop10(afterDel))
  }

  test("replay of the newest batch after compact does not duplicate inserts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcidx").toString + "/idx"
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
    CdcIndex.applyChanges(spark,
      docs.withColumn("op", lit("I")).select("op", "doc_id", "text"), 0L, dir)
    // batch 1: a plain INSERT (no tombstone — the self-healing U/D mask
    // cannot rescue a duplicated insert) plus a DELETE so compact has
    // tombstones to apply and actually folds the store
    val b1 = Seq(("I", 100000L, "join fast table join fast"),
      ("D", 3L, null.asInstanceOf[String]))
      .toDF("op", "doc_id", "text")
    CdcIndex.applyChanges(spark, b1, 1L, dir)
    val current = docs.filter(col("doc_id") =!= 3L).unionByName(
      Seq((100000L, "join fast table join fast")).toDF("doc_id", "text"))
    assert(indexTop10(dir) === expectTop10(current))
    CdcIndex.compact(spark, dir)
    // the stream crashed before its checkpoint committed batch 1: on
    // resume, foreachBatch replays it (at-least-once). The index must
    // still equal the corpus — no double-counted postings.
    CdcIndex.applyChanges(spark, b1, 1L, dir)
    assert(indexTop10(dir) === expectTop10(current),
      "replayed insert duplicated against its own compacted copy")
  }

  test("update in the same batch as older postings masks old, keeps new") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcidx2").toString + "/idx"
    CdcIndex.applyChanges(spark,
      Seq(("I", 1L, "alpha join beta"), ("I", 2L, "fast gamma"))
        .toDF("op", "doc_id", "text"), 0L, dir)
    // U twice across batches: only the latest version scores
    CdcIndex.applyChanges(spark,
      Seq(("U", 1L, "join join join")).toDF("op", "doc_id", "text"), 1L, dir)
    CdcIndex.applyChanges(spark,
      Seq(("U", 1L, "table")).toDF("op", "doc_id", "text"), 2L, dir)
    val expect = expectTop10(
      Seq((1L, "table"), (2L, "fast gamma")).toDF("doc_id", "text"))
    assert(indexTop10(dir) === expect)
  }

  test("same-batch insert-then-delete leaves the doc dead, not resurrected") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcidx3").toString + "/idx"
    // one batch carries the doc's whole life: I at seq 0, D at seq 1
    CdcIndex.applyChanges(spark,
      Seq(("I", 1L, "join fast table", 0L),
          ("D", 1L, null.asInstanceOf[String], 1L),
          ("I", 2L, "fast gamma", 2L))
        .toDF("op", "doc_id", "text", "seq"), 0L, dir)
    val expect = expectTop10(Seq((2L, "fast gamma")).toDF("doc_id", "text"))
    assert(indexTop10(dir) === expect)
    assert(!indexTop10(dir).exists(_._1 === 1L),
      "a doc inserted and deleted within one batch must not be live")
  }

  test("two same-batch versions of a doc: only the last one's postings count") {
    import spark.implicits._
    val dir = Files.createTempDirectory("cdcidx4").toString + "/idx"
    CdcIndex.applyChanges(spark,
      Seq(("I", 1L, "alpha", 0L), ("I", 2L, "fast gamma", 1L))
        .toDF("op", "doc_id", "text", "seq"), 0L, dir)
    // batch 1: doc 1 updated twice — only the seq-later version may score
    // (pre-fix both wrote postings, double-counting tf/df)
    CdcIndex.applyChanges(spark,
      Seq(("U", 1L, "join join join", 0L), ("U", 1L, "table", 1L))
        .toDF("op", "doc_id", "text", "seq"), 1L, dir)
    val expect = expectTop10(
      Seq((1L, "table"), (2L, "fast gamma")).toDF("doc_id", "text"))
    assert(indexTop10(dir) === expect)
    // without a seq column a same-batch D still beats its sibling events
    CdcIndex.applyChanges(spark,
      Seq(("U", 2L, "fast fast"), ("D", 2L, null.asInstanceOf[String]))
        .toDF("op", "doc_id", "text"), 2L, dir)
    val expect2 = expectTop10(Seq((1L, "table")).toDF("doc_id", "text"))
    assert(indexTop10(dir) === expect2)
  }
}
