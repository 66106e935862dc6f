package graft

import graft.streaming.IndexStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

case class DocRow(doc_id: Long, text: String)

/** The incrementally built index must answer queries exactly like the
  * corpus scan over everything ingested so far, replay must be a no-op,
  * and the stream wiring must land in the same state as direct appends. */
class IndexStreamSpec extends AnyFunSuite with SparkFixture {

  private val Terms = Seq("join", "fast", "table")

  private def corpusTop10(): Seq[(Long, Long, Double)] =
    graft.ops.TextRankOps.bm25Query.fn(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def indexTop10(dir: String): Seq[(Long, Long, Double)] =
    IndexStream.query(spark, dir, Terms).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("3 incremental batches == one corpus scan; replay is idempotent") {
    val dir = Files.createTempDirectory("idxstream").toString + "/idx"
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
    (0 to 2).foreach { b =>
      IndexStream.appendBatch(spark,
        docs.filter(col("doc_id") % 3 === b), b.toLong, dir)
    }
    assert(indexTop10(dir) === corpusTop10())
    // at-least-once replay of a middle batch: same partitions rewritten,
    // results unchanged (dynamic overwrite, per-batch stats row)
    IndexStream.appendBatch(spark,
      docs.filter(col("doc_id") % 3 === 1), 1L, dir)
    assert(indexTop10(dir) === corpusTop10())
    // stats did not double-count: n_docs over the stats table == corpus
    val n = spark.read.parquet(IndexStream.statsPath(dir))
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(n === docs.count())
  }

  test("MemoryStream wiring lands in the same state as direct appends") {
    import spark.implicits._
    val dir = Files.createTempDirectory("idxstream_ms").toString + "/idx"
    val ck = Files.createTempDirectory("idxstream_ck").toString
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
      .as[DocRow].collect()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[DocRow]
    val q = IndexStream.run(ms.toDF(), dir, ck)
    try {
      docs.grouped((docs.length + 2) / 3).foreach { g =>
        ms.addData(g.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(indexTop10(dir) === corpusTop10())
  }
}
