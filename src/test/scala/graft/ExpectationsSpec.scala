package graft

import graft.Expectations._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Declarative data-quality checks ([[Expectations]]): per-check-type
  * violation counts on crafted data, the one-pass fusion guarantee for
  * scalar checks (plan-asserted: ONE aggregate, column-pruned scan), FK
  * semantics against the q_fk_audit formulation, and the observed
  * (free-ride) mode matching the dedicated pass exactly.
  */
class ExpectationsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def crafted = Seq(
    (1L, Some("a"), Some(5.0), Some(10L)),
    (2L, None, Some(50.0), Some(10L)),      // null name; dup key grp
    (2L, Some("b"), Some(-1.0), Some(20L)), // dup id; range violation
    (3L, Some("z"), None, Some(99L)),       // bad accepted value
    (4L, Some("a"), Some(200.0), None)      // range violation; null fk
  ).toDF("id", "name", "score", "fk")

  private val refDim = Seq(10L, 20L).toDF("k")

  private val checks = Seq(
    NotNull("name"),
    AcceptedValues("name", Seq("a", "b")),
    InRange("score", 0.0, 100.0),
    Unique(Seq("id")),
    Predicate("score_lt_million", col("score") < 1000000),
    RefIntegrity("fk", refDim, "k"))

  test("violation counts per check type on crafted rows") {
    val rep = Expectations.run(crafted, checks)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("not_null(name)") === 1L)
    assert(rep("accepted_values(name)") === 1L) // 'z' (null not counted)
    assert(rep("in_range(score)") === 2L)       // -1 and 200
    assert(rep("unique(id)") === 1L)            // one extra row for id=2
    assert(rep("predicate(score_lt_million)") === 1L) // NULL score violates
    assert(rep("ref_integrity(fk)") === 1L)     // 99; NULL fk not counted
    val order = Expectations.run(crafted, checks)
      .select("check").collect().map(_.getString(0)).toSeq
    assert(order === checks.map(_.name))
  }

  test("a clean table passes everything") {
    val clean = Seq((1L, "a", 5.0, 10L), (2L, "b", 6.0, 20L))
      .toDF("id", "name", "score", "fk")
    val rep = Expectations.run(clean, checks)
    assert(rep.filter(!col("pass")).count() === 0)
  }

  test("scalar checks fuse into ONE aggregation over a column-pruned scan") {
    val docs = Tables.documents(spark, Sf)
    // build the same fused plan run() executes, and inspect it
    val plan = {
      // re-derive the fused frame exactly as run() does (private agg):
      // one agg over df; assert single Aggregate + pruned ReadSchema
      val df = docs
      val fused = df.agg(
        count_if(col("lang").isNull).as("a"),
        count_if(col("lang").isNotNull &&
          !col("lang").isin("en", "de", "fr", "es", "zh")).as("b"),
        count_if(col("n_chars").isNotNull &&
          (col("n_chars") < 0 || col("n_chars") > 1e9)).as("c"),
        (count(lit(1)) - countDistinct(col("doc_id"))).as("d"))
      fused.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("text") && !read.contains("source"),
      s"unchecked columns reached the scan: $read")
    // formatted mode names each scan twice (tree + detail) — count
    // physical scans by their Location detail line
    assert(plan.linesIterator.count(_.contains("Location: InMemoryFileIndex")) === 1,
      "scalar checks must share one scan")
  }

  test("observed mode: violations ride a downstream action, equal the dedicated pass") {
    val ridable = checks.filterNot(c =>
      c.isInstanceOf[RefIntegrity] || c.isInstanceOf[Unique])
    val tagged = Expectations.observed(crafted, "dq", ridable)
    // drive with an UNRELATED aggregation — the production query
    val driven = tagged.groupBy("name").agg(sum("score"))
    driven.collect()
    val got = Expectations.observedReport(driven, "dq", ridable).get
    val dedicated = Expectations.run(crafted, ridable)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got === dedicated.toSeq)
    // join-shaped and distinct-shaped checks cannot ride
    val e = intercept[IllegalArgumentException] {
      Expectations.observed(crafted, "dq2", checks)
    }
    assert(e.getMessage.contains("join-shaped"))
    val e2 = intercept[IllegalArgumentException] {
      Expectations.observed(crafted, "dq3",
        checks.filterNot(_.isInstanceOf[RefIntegrity]))
    }
    assert(e2.getMessage.contains("distinct-shaped"))
  }

  test("toCheckSql bridges row-scalar expectations onto snapshot-log CHECKs") {
    val dir = java.nio.file.Files.createTempDirectory("dq-log").toString
    graft.sources.SnapshotLog.commit(spark, dir,
      Seq((1L, "a", 5.0), (2L, "b", 9.5)).toDF("id", "name", "score"))
    Seq[Check](NotNull("name"), AcceptedValues("name", Seq("a", "b")),
      InRange("score", 0.0, 10.0),
      Predicate("pos_id", col("id") > 0)).foreach { c =>
      graft.sources.SnapshotLog.addCheck(spark, dir, c.name
        .replace("=", "").replaceAll("[^a-z_0-9]", "_"),
        Expectations.toCheckSql(c))
    }
    // good rows pass all four bridged constraints
    graft.sources.SnapshotLog.commit(spark, dir,
      Seq((3L, "a", 0.0)).toDF("id", "name", "score"))
    // each violation class is refused at the table boundary
    def refused(rows: Seq[(Long, Option[String], Double)]) =
      intercept[IllegalArgumentException](graft.sources.SnapshotLog.commit(
        spark, dir, rows.toDF("id", "name", "score")))
    assert(refused(Seq((4L, None, 1.0))).getMessage.contains("not_null"))
    assert(refused(Seq((4L, Some("zz"), 1.0))).getMessage
      .contains("accepted_values"))
    assert(refused(Seq((4L, Some("a"), 11.0))).getMessage.contains("in_range"))
    assert(refused(Seq((-4L, Some("a"), 1.0))).getMessage.contains("predicate"))
    // table-shaped checks refuse the bridge loudly
    intercept[IllegalArgumentException](
      Expectations.toCheckSql(Unique(Seq("id"))))
    intercept[IllegalArgumentException](Expectations.toCheckSql(MinRows(1)))
  }
}
