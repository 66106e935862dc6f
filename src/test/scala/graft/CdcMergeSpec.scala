package graft

import graft.cdc.{CdcConfig, CdcMerge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC merge invariants (SURVEY.md §5.2.2/§5.2.3): count reconciliation —
  * the reference's own validation idea [upstream `cdc.py` R8] — plus the
  * algebraic properties of classify/apply.
  */
class CdcMergeSpec extends AnyFunSuite with SparkFixture {

  private val cfg = CdcConfig(
    keyCols = Seq("o_orderkey"),
    valueCols = Seq("o_custkey", "o_orderstatus", "o_totalprice"))

  private def orders: DataFrame =
    Tables.orders(spark, Sf).select(cfg.allCols.map(col): _*)

  private def prev: DataFrame = orders.filter(col("o_orderkey") % 10 =!= 0)
  private def curr: DataFrame = orders.filter(col("o_orderkey") % 7 =!= 0)
    .withColumn("o_totalprice",
      when(col("o_orderkey") % 5 === 0, col("o_totalprice") + lit(1.0))
        .otherwise(col("o_totalprice")))

  private lazy val classified = CdcMerge.classify(prev, curr, cfg).cache()

  test("I+U+N rows partition the incoming extract; D = vanished keys") {
    val byOp = CdcMerge.counts(classified).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val iun = byOp.getOrElse("I", 0L) + byOp.getOrElse("U", 0L) +
      byOp.getOrElse("N", 0L)
    assert(iun === curr.count())
    val vanished = prev.select("o_orderkey")
      .except(curr.select("o_orderkey")).count()
    assert(byOp.getOrElse("D", 0L) === vanished)
  }

  test("applyChanges(classify(prev, curr)) reproduces curr exactly") {
    val applied = CdcMerge.applyChanges(classified, cfg)
    assert(applied.exceptAll(curr).count() === 0)
    assert(curr.exceptAll(applied).count() === 0)
  }

  test("classify(s, s) marks every row unchanged") {
    val self = CdcMerge.classify(prev, prev, cfg)
    assert(self.filter(col(CdcMerge.OpCol) =!= CdcMerge.Unchanged).count() === 0)
    assert(self.count() === prev.count())
  }

  test("xxhash64 and md5 key variants classify identically") {
    val md5Ops = classified.select(col("o_orderkey"), col(CdcMerge.OpCol))
    val xxOps = CdcMerge.classify(prev, curr, cfg, useXxhash64 = true)
      .select(col("o_orderkey"), col(CdcMerge.OpCol))
    assert(md5Ops.exceptAll(xxOps).count() === 0)
    assert(xxOps.exceptAll(md5Ops).count() === 0)
  }

  test("changeFeed drops unchanged rows and stamps the batch id") {
    val feed = CdcMerge.changeFeed(classified, batchId = 7L)
    assert(feed.filter(col(CdcMerge.OpCol) === CdcMerge.Unchanged).count() === 0)
    assert(feed.filter(col("batch_id") =!= 7L).count() === 0)
    val expected = classified
      .filter(col(CdcMerge.OpCol) =!= CdcMerge.Unchanged).count()
    assert(feed.count() === expected)
  }

  test("withHashes: null and absent-column canonicalization cannot collide") {
    import spark.implicits._
    val df = Seq(("a", Option("b")), ("a", None))
      .toDF("k", "v")
    val hashed = CdcMerge.withHashes(df, CdcConfig(Seq("k"), Seq("v")))
    // ("a", null) and ("a", "b") must hash differently; null sentinel
    // prevents concat_ws from silently dropping the null
    assert(hashed.select("nonkeyhash").distinct().count() === 2)
  }
}
