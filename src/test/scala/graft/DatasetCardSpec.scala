package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** q_dataset_card: the per-source datasheet must equal a sequential
  * single-threaded pass over the raw documents, and its plan must touch
  * the corpus exactly once.
  */
class DatasetCardSpec extends AnyFunSuite with SparkFixture {

  test("q_dataset_card equals a sequential reference pass") {
    val docs = Tables.documents(spark, Sf)
      .select("source", "lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val bySource = docs.groupBy(_._1)
    val totalDocs = docs.length.toLong
    val got = ops.AuditOps.datasetCard.fn(spark, Sf).collect()
    assert(got.map(_.getString(0)).toSeq === bySource.keys.toSeq.sorted)
    got.foreach { r =>
      val rows = bySource(r.getString(0))
      assert(r.getLong(1) === rows.length.toLong, "n_docs")
      assert(r.getLong(2) === rows.map(_._4).sum, "n_chars")
      val tokens = rows.map { case (_, _, t, _) =>
        (t.length - t.replace(" ", "").length + 1).toLong
      }.sum
      assert(r.getLong(3) === tokens, "n_tokens")
      assert(r.getLong(4) === rows.map(_._2).distinct.length.toLong, "n_langs")
      val uniq = rows.map(_._3).distinct.length.toLong
      assert(r.getLong(5) === uniq, "n_uniq_texts (md5 has no collisions here)")
      assert(r.getDouble(6) === rows.length.toDouble / totalDocs, "share")
      assert(r.getDouble(7) === 1.0 - uniq.toDouble / rows.length, "dup_rate")
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0)
    }
    // shares of a partition of the corpus sum to 1 (within float addition)
    assert(math.abs(got.map(_.getDouble(6)).sum - 1.0) < 1e-9)
  }

  test("q_dataset_card plans exactly one corpus scan") {
    val plan = ops.AuditOps.datasetCard.fn(spark, Sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && !l.contains("ReusedExchange"))
    assert(scans === 0,
      s"corpus re-scan leaked past the source-grain checkpoint:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      "per-source frame must come from the eager checkpoint")
  }
}
