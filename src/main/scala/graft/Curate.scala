package graft

/** Deployment entry for config-driven curation runs — the curation twin
  * of running [[Pipeline]] from a scheduler:
  *
  * {{{ sbt "runMain graft.Curate /path/to/curate.yaml [runId]" }}}
  *
  * Prints the stage funnel, the expectation report and the published
  * snapshot version; exits non-zero when the publish gate fails (the
  * scheduler's retry/alert hook). */
object Curate {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Curate <config.yaml> [runId]")
    val runId = args.lift(1).map(_.toLong).getOrElse(0L)
    val spark = GraftSession.forDriver()
    try {
      val report = CuratePipeline.runFile(spark, args(0), runId)
      report.stageRows.foreach { case (stage, rows) =>
        println(f"[curate] $stage%-28s $rows%10d rows")
      }
      report.expectations.foreach { case (check, violations, pass) =>
        println(f"[curate] expect $check%-30s " +
          (if (pass) "pass" else s"FAIL ($violations violations)"))
      }
      println(s"[curate] final rows: ${report.finalRows}" +
        report.logVersion.map(v => s", published version $v").getOrElse(""))
    } finally spark.stop()
  }
}
