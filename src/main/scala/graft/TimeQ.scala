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
    // SPARK_GRAFT_STAGES=1: per-stage wall/task-time dump for the LAST
    // run of each query — the "where did the seconds go" view
    val stages = sys.env.get("SPARK_GRAFT_STAGES").contains("1")
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long, Int)]()
    if (stages) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val wall = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(-1L)
          stageLog.add((i.stageId, i.name.takeWhile(_ != '\n').take(60), wall,
            i.taskMetrics.executorRunTime, i.numTasks))
          ()
        }
      })
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    args.foreach { n =>
      val times = (1 to 3).map { i =>
        if (stages && i == 3) { Thread.sleep(100); stageLog.clear() }
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        f"$dt%.2f s ($rows rows)"
      }
      println(s"[timeq] $n: ${times.mkString(", ")}")
      if (stages) {
        Thread.sleep(100)
        stageLog.toArray(Array.empty[(Int, String, Long, Long, Int)])
          .sortBy(_._1).foreach { case (id, nm, wall, run, nt) =>
            println(f"[timeq]   stage $id%4d $nm%-60s wall=${wall}%5d ms taskSum=${run}%6d ms tasks=$nt")
          }
      }
    }
    spark.stop()
  }
}
