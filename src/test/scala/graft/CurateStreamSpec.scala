package graft

import graft.streaming.CurateStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

// top-level for encoders
final case class Doc(doc_id: Long, text: String)

/** Streaming curation: quality gate + in-batch + cross-batch near-dup
  * state, idempotent under replay. */
class CurateStreamSpec extends AnyFunSuite with SparkFixture {

  private val good1 = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"       // 20 toks
  private val good2 = "one two three four five six seven eight nine ten " +
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen " +
    "nineteen twenty"
  private val lowQuality = "spam spam spam spam spam spam spam spam spam " +
    "spam spam spam spam spam spam spam spam spam spam spam"       // ttr 1/20
  private val short_ = "too short"

  test("streaming curation: gate, in-batch dedup, cross-batch dedup, replay-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = Files.createTempDirectory("curate_out").toString
    val ckpt = Files.createTempDirectory("curate_ckpt").toString

    val ms = MemoryStream[Doc]
    val q = CurateStream.run(ms.toDF, outDir, ckpt)
    try {
      // batch 0: two good docs, one exact in-batch dup, two rejects
      ms.addData(Seq(Doc(1, good1), Doc(2, good2), Doc(3, good1),
        Doc(4, lowQuality), Doc(5, short_)))
      q.processAllAvailable()
      // batch 1: replayed content (cross-batch dup) + one new good doc
      ms.addData(Seq(Doc(6, good1), Doc(7, good2 + " twentyone")))
      q.processAllAvailable()
    } finally q.stop()

    val accepted = spark.read.parquet(CurateStream.acceptedPath(outDir))
    val ids = accepted.select("doc_id").collect().map(_.getLong(0)).toSet
    // 1 and 2 survive batch 0 (3 is an in-batch dup of 1; 4,5 gated out);
    // 6 is a cross-batch dup of 1; 7 is new
    assert(ids === Set(1L, 2L, 7L))

    // replaying batch 1 must not duplicate anything (at-least-once safety)
    val replay = Seq(Doc(6, good1), Doc(7, good2 + " twentyone")).toDF
    CurateStream.mergeBatch(spark, replay, 1L, outDir)
    val after = spark.read.parquet(CurateStream.acceptedPath(outDir))
    assert(after.count() === 3)
    assert(after.groupBy("doc_id").count().filter(col("count") > 1).isEmpty)

    // signature store carries exactly one row per accepted doc
    val sigs = spark.read.parquet(CurateStream.sigPath(outDir))
    assert(sigs.count() === 3 && sigs.select("sig").distinct().count() === 3)
  }

  test("decontamination gate drops gram-overlapping docs per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = Files.createTempDirectory("curate_dc_out").toString
    val ckpt = Files.createTempDirectory("curate_dc_ckpt").toString

    // eval doc shares a 4-gram window with good1's head, none with good2
    val eval = Seq(Doc(1000, "alpha beta gamma delta UNRELATED")).toDF
    val evalGrams = CurateStream.evalGramSet(eval)
    assert(evalGrams.count() === 2) // two 4-grams in a 5-token doc

    val ms = MemoryStream[Doc]
    val q = CurateStream.run(ms.toDF, outDir, ckpt,
      evalGrams = Some(evalGrams))
    try {
      ms.addData(Seq(Doc(1, good1), Doc(2, good2)))
      q.processAllAvailable()
    } finally q.stop()

    val ids = spark.read.parquet(CurateStream.acceptedPath(outDir))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L),
      s"doc 1 shares 'alpha beta gamma delta' with the eval set; got $ids")
  }

  test("mergeBatch doubles as the batch backfill path and matches q_curate's gate") {
    import spark.implicits._
    val outDir = Files.createTempDirectory("curate_bf").toString
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
    val n = CurateStream.mergeBatch(spark, docs, 0L, outDir)
    val gate = CurateStream.qualityGate(docs).count()
    assert(n > 0 && n <= gate, s"accepted $n of $gate gated")
    // cross-check the quality predicate against the oracle-checked query:
    // per-lang quality counts from q_curate sum to the same gate total
    val oracleQuality = graft.ops.CurateOps.curate.fn(spark, Sf)
      .agg(sum("n_quality")).head.getLong(0)
    assert(gate === oracleQuality)
  }
}
