package graft

import graft.sources.Sources
import graft.streaming.CdcStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Dead-letter quarantine for the Debezium envelope feed
  * ([[Sources.debeziumDeadLetters]] + the `dead_letter_dir` config key):
  * the conservation law (envelope rows + dead letters == input, exactly),
  * per-reason classification, the end-to-end config-driven stream
  * (rejects land in the quarantine dir WITH their raw payloads while the
  * merge applies the good rows), and loud config validation. */
class DeadLetterSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val schema = StructType.fromDDL(
    "k BIGINT, status STRING, amount DOUBLE")

  private val good =
    """{"before":null,"after":{"k":1,"status":"O","amount":10.0},"op":"c","ts_ms":1704103200000}"""
  private val goodDelete =
    """{"before":{"k":9,"status":"O","amount":1.0},"after":null,"op":"d","ts_ms":1704103200000}"""
  private val garbage = """this is not json at all"""
  private val truncate =
    """{"before":null,"after":null,"op":"t","ts_ms":1704103200000}"""
  private val opless =
    """{"before":null,"after":{"k":3,"status":"O","amount":3.0},"ts_ms":1}"""

  test("conservation: envelope + dead letters == input; reasons classified") {
    val in = Seq(good, goodDelete, garbage, truncate, opless).toDF("value")
    val env = Sources.debeziumEnvelope(in, schema)
    val dead = Sources.debeziumDeadLetters(in, schema)
    assert(env.count() + dead.count() === in.count())
    assert(env.count() === 2)
    val reasons = dead.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(reasons(garbage) === "unparsable")
    assert(reasons(truncate) === "unsupported_op:t")
    assert(reasons(opless) === "missing_op")
  }

  test("config stream: rejects quarantined with raw payloads, merge applies the good rows") {
    val dir = Files.createTempDirectory("dl_pipeline")
    val inDir = Files.createDirectory(dir.resolve("in"))
    val dlDir = s"$dir/dead"
    val cfg = PipelineConfig(inDir.toString, "debezium", schema,
      Seq("k"), Seq("status", "amount"), s"$dir/state",
      deadLetterDir = Some(dlDir))
    val q = Pipeline.runStream(spark, cfg, s"$dir/ckpt")
    val dlQ = spark.streams.active
      .find(_.name == "deadletter-state").getOrElse(
        fail("dead-letter query not registered"))
    try {
      Files.writeString(inDir.resolve("b0.jsonl"),
        s"$good\n$garbage\n$truncate\n")
      q.processAllAvailable()
      dlQ.processAllAvailable()
    } finally { q.stop(); dlQ.stop() }

    val state = CdcStream.currentState(spark, s"$dir/state").get
      .select("k").as[Long].collect().toSet
    assert(state === Set(1L))
    val dead = spark.read.parquet(dlDir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dead === Map(garbage -> "unparsable",
      truncate -> "unsupported_op:t"))
  }

  test("config validation: dead_letter_dir needs debezium and its own directory") {
    def parse(lines: String*): Seq[PipelineConfig] =
      ConfigFile.parse(lines.toSeq, "inline", streaming = true)
    val e1 = intercept[IllegalArgumentException] { parse(
      "tables:",
      "  - name: t",
      "    source_path: /tmp/x",
      "    format: csv",
      "    schema: \"k long\"",
      "    key_cols: [k]",
      "    value_cols: []",
      "    state_dir: /tmp/s",
      "    dead_letter_dir: /tmp/dl") }
    assert(e1.getMessage.contains("requires format: debezium"))
    val e2 = intercept[IllegalArgumentException] { parse(
      "tables:",
      "  - name: t",
      "    source_path: /tmp/x",
      "    format: debezium",
      "    schema: \"k long\"",
      "    key_cols: [k]",
      "    value_cols: []",
      "    state_dir: /tmp/s",
      "    dead_letter_dir: /tmp/s") }
    assert(e2.getMessage.contains("must differ from state_dir"))
  }
}
