package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Config-file-driven pipeline runs — the reference's config.yaml shape.
  * Parser subset is strict: typos fail loudly, never misconfigure a
  * merge. */
class ConfigFileSpec extends AnyFunSuite with SparkFixture {

  private def write(body: String): String = {
    val f = Files.createTempFile("graft_cfg", ".yaml")
    Files.writeString(f, body)
    f.toString
  }

  test("loads a two-table config and drives Pipeline.runAll end to end") {
    val work = Files.createTempDirectory("cfg_run")
    // stage two parquet "extracts" from testdata
    Tables.nation(spark, Sf).write.parquet(s"$work/in/nation")
    Tables.region(spark, Sf).write.parquet(s"$work/in/region")

    val cfgPath = write(
      s"""# graft pipeline config — reference config.yaml shape
         |tables:
         |  - name: nation
         |    source_path: $work/in/nation
         |    format: parquet
         |    schema: "n_nationkey int, n_name string, n_regionkey int"
         |    key_cols: [n_nationkey]
         |    value_cols: [n_name, n_regionkey]
         |    state_dir: $work/state/nation
         |  - name: region
         |    source_path: $work/in/region
         |    format: parquet
         |    schema: "r_regionkey int, r_name string"
         |    key_cols: [r_regionkey]
         |    value_cols: [r_name]   # trailing comment
         |    state_dir: $work/state/region
         |    strict_schema: true
         |""".stripMargin)

    val configs = ConfigFile.load(cfgPath)
    assert(configs.size === 2)
    assert(configs(0).keyCols === Seq("n_nationkey"))
    assert(configs(1).strictSchema)

    val results = Pipeline.runAll(spark, configs, batchId = 0L)
    assert(results.size === 2)
    // initial load: everything classifies as insert
    assert(results(s"$work/state/nation").toOption.get("I") === 25L)
    assert(results(s"$work/state/region").toOption.get("I") === 5L)
  }

  test("rejects unknown keys, missing keys, bad schema, undeclared columns") {
    def cfg(item: String): String = write(s"tables:\n  - $item\n")
    val base =
      """name: t
        |    source_path: /x
        |    format: parquet
        |    schema: "a int, b string"
        |    key_cols: [a]
        |    value_cols: [b]
        |    state_dir: /s""".stripMargin

    def err(body: String): String =
      intercept[IllegalArgumentException](
        ConfigFile.load(write(body))).getMessage

    assert(err(s"tables:\n  - $base\n    typo_key: 1\n")
      .contains("unknown key 'typo_key'"))
    assert(err("tables:\n  - name: t\n    format: parquet\n")
      .contains("missing required key"))
    assert(err(s"tables:\n  - $base\n".replace("a int", "a wibbletype"))
      .contains("bad schema DDL"))
    assert(err(s"tables:\n  - $base\n".replace("[b]", "[b, ghost_col]"))
      .contains("'ghost_col' in key_cols/value_cols is not in the declared schema"))
    assert(err(s"  - $base\n").contains("before 'tables:' root"))
    assert(err(s"tables:\n  - $base\n    strict_schema: maybe\n")
      .contains("strict_schema must be true/false"))
    assert(err(s"tables:\n  - $base\n".replace("format: parquet", "format: parqet"))
      .contains("format must be one of"))
  }

  test("kafka binding parses on debezium streams; misuse fails at load") {
    val dbz =
      """name: t
        |    source_path: /x
        |    format: debezium
        |    schema: "a int, b string"
        |    key_cols: [a]
        |    value_cols: [b]
        |    state_dir: /s""".stripMargin
    def parse(body: String, streaming: Boolean = true) =
      ConfigFile.parse(body.linesIterator.toSeq, "inline", streaming)
    // full binding
    val cfg = parse(s"""tables:
        |  - $dbz
        |    kafka_bootstrap: broker1:9092,broker2:9092
        |    kafka_topic: cdc.inventory.orders
        |    kafka_starting_offsets: latest
        |""".stripMargin).head
    assert(cfg.kafka === Some(KafkaBinding(
      "broker1:9092,broker2:9092", "cdc.inventory.orders", "latest")))
    // offsets default
    assert(parse(s"tables:\n  - $dbz\n    kafka_bootstrap: b:9092\n" +
      "    kafka_topic: t1\n").head.kafka.get.startingOffsets === "earliest")
    // no binding → None (file stand-in path)
    assert(parse(s"tables:\n  - $dbz\n").head.kafka === None)
    def err(body: String, streaming: Boolean = true): String =
      intercept[IllegalArgumentException](parse(body, streaming)).getMessage
    // half a binding
    assert(err(s"tables:\n  - $dbz\n    kafka_topic: t1\n")
      .contains("BOTH kafka_bootstrap and kafka_topic"))
    // kafka keys on a file format
    assert(err(("tables:\n  - " + dbz.replace("format: debezium",
      "format: parquet") + "\n    kafka_bootstrap: b:9092\n" +
      "    kafka_topic: t1\n"))
      .contains("requires format: debezium"))
  }

  test("log_dir parses into a snapshot-log binding; state_dir collision fails") {
    val base =
      """name: t
        |    source_path: /x
        |    format: parquet
        |    schema: "a int, b string"
        |    key_cols: [a]
        |    value_cols: [b]
        |    state_dir: /s""".stripMargin
    def parse(body: String) =
      ConfigFile.parse(body.linesIterator.toSeq, "inline")
    assert(parse(s"tables:\n  - $base\n    log_dir: /log/t\n")
      .head.logDir === Some("/log/t"))
    assert(parse(s"tables:\n  - $base\n").head.logDir === None)
    val e = intercept[IllegalArgumentException](
      parse(s"tables:\n  - $base\n    log_dir: /s\n"))
    assert(e.getMessage.contains("must differ from state_dir"))
  }

  test("cow_dir parses into a COW-replica binding; collisions fail loudly") {
    val base =
      """name: t
        |    source_path: /x
        |    format: parquet
        |    schema: "a int, b string"
        |    key_cols: [a]
        |    value_cols: [b]
        |    state_dir: /s""".stripMargin
    def parse(body: String) =
      ConfigFile.parse(body.linesIterator.toSeq, "inline")
    assert(parse(s"tables:\n  - $base\n    cow_dir: /cow/t\n")
      .head.cowDir === Some("/cow/t"))
    assert(parse(s"tables:\n  - $base\n").head.cowDir === None)
    val e1 = intercept[IllegalArgumentException](
      parse(s"tables:\n  - $base\n    cow_dir: /s\n"))
    assert(e1.getMessage.contains("must differ from state_dir"))
    val e2 = intercept[IllegalArgumentException](
      parse(s"tables:\n  - $base\n    log_dir: /log/t\n    cow_dir: /log/t\n"))
    assert(e2.getMessage.contains("must differ from log_dir"))
  }
}
