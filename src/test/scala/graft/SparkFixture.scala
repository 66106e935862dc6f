package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** Shared local SparkSession for all suites (one JVM, sequential suites —
  * Test/fork is on, so this lives for the whole test run). */
trait SparkFixture { self: Suite =>
  lazy val spark: SparkSession = SparkFixture.session
  /** Smallest scale factor — unit tests must stay fast. */
  val Sf = "/root/testdata/sf0.001"
}

object SparkFixture {
  lazy val session: SparkSession = {
    // the engine's tuned defaults (GraftSession) so tests assert the same
    // plans the mains produce — only the app name differs
    val s = GraftSession.builder("4").appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
