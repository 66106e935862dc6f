package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-audit helper: prints the formatted physical plan of the named
  * queries (all oracle-checked queries if none given). Used to keep the
  * §4 scale properties honest — pushdown reaching the scan, broadcasts on
  * dim joins, TakeOrderedAndProject for top-k, no stray shuffles.
  *
  *   sbt "runMain graft.Explain q_agg_group q_cdc_apply"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Registry.all.filter(_.oracle.isDefined).map(_.name)
    // SPARK_GRAFT_EXPLAIN_FINAL=1: execute the query first and print the
    // FINAL adaptive plan (AQE re-optimized — ReusedExchange / coalesced
    // reads visible), which the initial plan cannot show
    val finalPlan = sys.env.get("SPARK_GRAFT_EXPLAIN_FINAL").contains("1")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"\n========== $n ==========")
      if (finalPlan) df.collect()
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
