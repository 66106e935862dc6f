package graft

import graft.plans.MvRewrite
import graft.plans.MvRewrite.Mv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Transparent materialized-view rewrite ([[MvRewrite]]): a grouped
  * aggregate over the fact scan silently re-plans onto the registered
  * rollup — results identical, the physical plan reads the summary path
  * and never the fact path — while every out-of-scope shape (filters,
  * distinct, unregistered columns, global aggregates, expression
  * groupings) is left untouched. The misfire-impossibility guards ARE
  * the feature; each one gets a test.
  */
class MvRewriteSpec extends AnyFunSuite with SparkFixture {

  private val srcPath = s"$Sf/lineitem.parquet"
  private lazy val summaryPath = {
    val dir = Files.createTempDirectory("mv-summary").toString
    val mv = Mv(
      sourcePath = srcPath, summaryPath = s"$dir/sum",
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sumCols = Seq("l_quantity", "l_extendedprice"),
      minCols = Seq("l_orderkey"), maxCols = Seq("l_orderkey"))
    MvRewrite.materialize(spark, mv)
    s"$dir/sum"
  }

  private def fact = spark.read.parquet(srcPath)

  private def scans(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("rollup answers a coarser grouping: same values, summary scanned, fact not") {
    summaryPath // force registration
    try {
      val q = fact.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"),
          min("l_orderkey").as("first_ok"), max("l_orderkey").as("last_ok"))
        .orderBy("l_returnflag")
      val plan = scans(q)
      assert(plan.contains("mv-summary"), s"summary not scanned:\n$plan")
      assert(!plan.contains("lineitem.parquet"),
        s"fact table still scanned:\n$plan")

      MvRewrite.clear()
      val direct = fact.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("qty"),
          min("l_orderkey").as("first_ok"), max("l_orderkey").as("last_ok"))
        .orderBy("l_returnflag")
      assert(scans(direct).contains("lineitem.parquet"))
      assert(q.collect().map(_.toSeq) === direct.collect().map(_.toSeq))
    } finally MvRewrite.clear()
  }

  test("exact-grouping rewrite and SQL-path rewrite both fire") {
    summaryPath
    MvRewrite.register(Mv(srcPath, summaryPath,
      Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity", "l_extendedprice"), Seq("l_orderkey"),
      Seq("l_orderkey")))
    try {
      val q = fact.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_extendedprice").as("rev"))
      assert(scans(q).contains("mv-summary"))
      fact.createOrReplaceTempView("li_mv_test")
      val sqlQ = spark.sql(
        "SELECT l_linestatus, count(*) AS n FROM li_mv_test GROUP BY 1")
      assert(scans(sqlQ).contains("mv-summary"))
      spark.catalog.dropTempView("li_mv_test")

      // group-column FILTER rewrites — including a filter column the
      // query does not group by (WHERE status GROUP BY flag)
      val filtered = fact.filter(col("l_linestatus") === "F")
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
        .orderBy("l_returnflag")
      assert(scans(filtered).contains("mv-summary"))
      val gotF = filtered.collect().map(_.toSeq)
      MvRewrite.clear()
      val directF = fact.filter(col("l_linestatus") === "F")
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("q"), count(lit(1)).as("n"))
        .orderBy("l_returnflag").collect().map(_.toSeq)
      assert(gotF === directF)
      MvRewrite.register(Mv(srcPath, summaryPath,
        Seq("l_returnflag", "l_linestatus"),
        Seq("l_quantity", "l_extendedprice"), Seq("l_orderkey"),
        Seq("l_orderkey")))
    } finally MvRewrite.clear()
  }

  test("out-of-scope shapes are never rewritten") {
    summaryPath
    MvRewrite.register(Mv(srcPath, summaryPath,
      Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity", "l_extendedprice"), Seq("l_orderkey"),
      Seq("l_orderkey")))
    try {
      // residual filter on a MEASURE: the summary collapsed those rows
      assert(scans(fact.filter(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(sum("l_quantity")))
        .contains("lineitem.parquet"))
      // non-deterministic filter on a group col (0.999: a rand()<k
      // with k >= 1 is constant-folded away and WOULD legally rewrite)
      assert(scans(fact.filter(col("l_returnflag") === "R" && rand() < 0.999)
        .groupBy("l_returnflag").agg(sum("l_quantity")))
        .contains("lineitem.parquet"))
      // grouping outside the MV's columns
      assert(scans(fact.groupBy("l_partkey").agg(sum("l_quantity")))
        .contains("lineitem.parquet"))
      // unregistered aggregate column
      assert(scans(fact.groupBy("l_returnflag").agg(sum("l_tax")))
        .contains("lineitem.parquet"))
      // distinct aggregate
      assert(scans(fact.groupBy("l_returnflag")
        .agg(countDistinct("l_partkey"))).contains("lineitem.parquet"))
      // global (group-less) aggregate — the empty-source asymmetry
      assert(scans(fact.agg(sum("l_quantity")))
        .contains("lineitem.parquet"))
      // expression grouping
      assert(scans(fact.groupBy((col("l_returnflag") === "R").as("r"))
        .agg(sum("l_quantity"))).contains("lineitem.parquet"))
      // avg is not re-expressible from these partials (no avg rule)
      assert(scans(fact.groupBy("l_returnflag").agg(avg("l_quantity")))
        .contains("lineitem.parquet"))
    } finally MvRewrite.clear()
  }

  test("loop closed: an IncrementalAgg-maintained rollup keeps serving rewritten queries through CDC churn") {
    import spark.implicits._
    MvRewrite.clear()
    val base = Files.createTempDirectory("mv-incr").toString
    val (srcDir, sumDir) = (s"$base/src", s"$base/sum")
    // integral LONG measure: IncrementalAgg's DECIMAL(28,6) partials
    // cast back to LONG exactly, so sum(qty) keeps its type AND value
    val rows0 = Seq(
      ("R", "F", 5L, 1L), ("R", "F", 7L, 2L), ("N", "O", 3L, 3L),
      ("A", "F", 10L, 4L))
    rows0.toDF("flag", "status", "qty", "id")
      .write.mode("overwrite").parquet(srcDir)
    val spec = graft.cdc.IncrementalAgg.Spec(Seq("flag", "status"), Seq("qty"))
    // eager-materialize states: they are LAZY plans over srcDir, which
    // this test later overwrites (the churn) — without the checkpoint a
    // later action would re-read replaced files
    val state0 = graft.cdc.IncrementalAgg.init(
      spark.read.parquet(srcDir), spec).localCheckpoint(true)
    def publish(state: org.apache.spark.sql.DataFrame): Unit = {
      state.select(col("flag"), col("status"), col("cnt"),
          col("sum_qty").cast("long").as("sum_qty"))
        .write.mode("overwrite").parquet(sumDir)
      MvRewrite.register(Mv(srcDir, sumDir, Seq("flag", "status"),
        Seq("qty")))
    }
    publish(state0)
    try {
      def query: org.apache.spark.sql.DataFrame =
        spark.read.parquet(srcDir).groupBy("flag")
          .agg(count(lit(1)).as("n"), sum("qty").as("q")).orderBy("flag")
      val pl0 = scans(query)
      assert(pl0.contains("/sum") && !pl0.contains("/src"),
        s"expected summary-only scan:\n$pl0")

      // CDC churn: insert a row, delete one, move one across groups
      val feed = Seq(
        ("I", "N", "O", 20L, 9L, null.asInstanceOf[java.lang.Long],
          null.asInstanceOf[String], null.asInstanceOf[String]),
        ("D", "A", "F", 10L, 4L, null.asInstanceOf[java.lang.Long],
          null.asInstanceOf[String], null.asInstanceOf[String]),
        // U: id=2 moves from (R,F,7) to (N,F,8) — group move
        ("U", "N", "F", 8L, 2L, java.lang.Long.valueOf(7L), "R", "F"))
        .toDF("op", "flag", "status", "qty", "id",
          "__old_qty", "__old_flag", "__old_status")
      val state1 = graft.cdc.IncrementalAgg.maintain(state0, feed, spec)
        .localCheckpoint(true)
      // churned source, written alongside the maintained summary
      val src1 = Seq(("R", "F", 5L, 1L), ("N", "F", 8L, 2L),
        ("N", "O", 3L, 3L), ("N", "O", 20L, 9L))
      src1.toDF("flag", "status", "qty", "id")
        .write.mode("overwrite").parquet(srcDir)
      publish(state1)

      val got = query
      val pl1 = scans(got)
      assert(pl1.contains("/sum") && !pl1.contains("/src"),
        s"maintained summary no longer serving the rewrite:\n$pl1")
      val gotRows = got.collect().map(_.toSeq)
      MvRewrite.clear()
      assert(gotRows === query.collect().map(_.toSeq),
        "maintained rollup diverged from a recompute over churned source")
    } finally MvRewrite.clear()
  }

  test("empty registry: zero-overhead no-op; downstream operators survive id preservation") {
    MvRewrite.clear()
    val q = fact.groupBy("l_returnflag").agg(sum("l_quantity").as("qty"))
    assert(scans(q).contains("lineitem.parquet"))

    summaryPath
    MvRewrite.register(Mv(srcPath, summaryPath,
      Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity", "l_extendedprice")))
    try {
      // parent operators above the aggregate (join + filter + sort)
      // must not notice the substitution — exprId preservation law
      val rewritten = fact.groupBy("l_returnflag").agg(
        sum("l_quantity").as("qty"))
      val joined = rewritten.filter(col("qty") > 0)
        .join(rewritten.select(col("l_returnflag").as("rf2"),
          col("qty").as("qty2")), col("l_returnflag") === col("rf2"))
        .orderBy("l_returnflag")
      val got = joined.collect()
      MvRewrite.clear()
      val expect = fact.groupBy("l_returnflag").agg(
        sum("l_quantity").as("qty")).filter(col("qty") > 0)
      val expect2 = expect
        .join(expect.select(col("l_returnflag").as("rf2"),
          col("qty").as("qty2")), col("l_returnflag") === col("rf2"))
        .orderBy("l_returnflag").collect()
      assert(got.map(_.toSeq) === expect2.map(_.toSeq))
    } finally MvRewrite.clear()
  }
}
