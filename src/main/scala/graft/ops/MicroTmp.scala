package graft.ops

// TEMPORARY measurement scratch (not committed): per-call driver-side
// cost of re-reading parquet footers + building/analyzing query plans.
object MicroTmp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.forDriver()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      println(f"[micro] $label: ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/call")
    }
    time("read.parquet(lineitem).schema", 50) {
      graft.Tables.lineitem(spark, sfDir).schema; ()
    }
    val fn = graft.SparkEntry.queries("q_win_rank")
    time("build+analyze q_win_rank", 30) {
      fn(spark, sfDir).queryExecution.assertAnalyzed()
    }
    time("build+optimize+physical q_win_rank", 30) {
      fn(spark, sfDir).queryExecution.executedPlan; ()
    }
    time("full count q_win_rank", 20) {
      fn(spark, sfDir).count(); ()
    }
    val fn2 = graft.SparkEntry.queries("q_market_share")
    time("build+optimize+physical q_market_share", 20) {
      fn2(spark, sfDir).queryExecution.executedPlan; ()
    }
    time("full count q_market_share", 10) {
      fn2(spark, sfDir).count(); ()
    }
    spark.stop()
  }
}
