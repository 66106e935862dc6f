package graft

/** Single-query timing harness for plan iteration — times just the named
  * queries (3 runs each: cold + 2 warm) against SPARK_GRAFT_SF_DIR,
  * without paying the full [[Bench]] sweep per experiment.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.TimeQ q_map"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.forDriver()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    args.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        f"$dt%.2f s ($rows rows)"
      }
      println(s"[timeq] $n: ${times.mkString(", ")}")
    }
    spark.stop()
  }
}
