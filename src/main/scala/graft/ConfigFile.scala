package graft

import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Config-file loader for [[Pipeline]] — the reference drives its
  * many-table run from a YAML config [upstream `config.yaml`, SURVEY §3.1];
  * this reads the same shape so a scheduled deployment is
  * `Pipeline.runAll(spark, ConfigFile.load(path), batchId)`.
  *
  * The sandbox has no YAML dependency (and the charter forbids adding
  * one), so this is a hand-rolled parser for the DOCUMENTED SUBSET the
  * config actually needs — not a general YAML implementation:
  *
  * {{{
  * # one entry per source table
  * tables:
  *   - name: customer
  *     source_path: /data/in/customer
  *     format: csv                      # csv | json | parquet
  *     schema: "c_custkey long, c_name string, c_acctbal double"
  *     key_cols: [c_custkey]
  *     value_cols: [c_name, c_acctbal]
  *     state_dir: /data/state/customer
  *     strict_schema: false             # optional, default false
  *     log_dir: /data/log/customer      # optional: SnapshotLog-backed
  *                                      # state (atomic commits, batch-k
  *                                      # time travel, vacuum retention)
  *     cow_dir: /data/cow/customer      # optional: feed-maintained
  *                                      # copy-on-write replica (per-batch
  *                                      # writes ∝ churn, not table size)
  * }}}
  *
  * Supported: `tables:` root, `- ` item starts, `key: value` pairs,
  * inline `[a, b]` lists, single/double-quoted scalars, `#` comments,
  * blank lines. Anything else — nested maps, multi-line scalars, anchors —
  * is rejected loudly rather than misread: a config typo must fail the
  * run, not silently merge the wrong columns.
  */
object ConfigFile {

  /** Load pipeline configs. `streaming = true` widens the accepted
    * format set with the stream-only `debezium` envelope feed; a batch
    * load (runBatch/runMany) with a debezium config fails HERE, at
    * config load — not at runtime inside the 50-table fleet run. */
  def load(path: String, streaming: Boolean = false): Seq[PipelineConfig] =
    parse(Files.readAllLines(Paths.get(path)).asScala.toSeq, path, streaming)

  private[graft] def parse(rawLines: Seq[String], where: String,
      streaming: Boolean = false): Seq[PipelineConfig] = {
    def fail(i: Int, msg: String): Nothing =
      throw new IllegalArgumentException(s"$where:${i + 1}: $msg")

    // strip comments (a # starts a comment unless inside quotes) + blanks
    def stripComment(s: String): String = {
      var q: Char = 0
      val out = new StringBuilder
      var done = false
      for (c <- s if !done) {
        if (q != 0) { if (c == q) q = 0; out += c }
        else if (c == '\'' || c == '"') { q = c; out += c }
        else if (c == '#') done = true
        else out += c
      }
      out.result()
    }

    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && (t.head == '"' || t.head == '\'') && t.last == t.head)
        t.substring(1, t.length - 1)
      else t
    }

    def parseList(i: Int, v: String): Seq[String] = {
      val t = v.trim
      if (!(t.startsWith("[") && t.endsWith("]")))
        fail(i, s"expected an inline [a, b] list, got '$v'")
      val body = t.substring(1, t.length - 1).trim
      if (body.isEmpty) Seq.empty
      else body.split(",").map(unquote).map(_.trim).toSeq
    }

    val lines = rawLines.map(stripComment)
    val tables = scala.collection.mutable.ArrayBuffer[
      (Int, scala.collection.mutable.LinkedHashMap[String, (Int, String)])]()
    var sawRoot = false

    def addPair(li: Int, kv: String): Unit = {
      val idx = kv.indexOf(':')
      if (idx <= 0) fail(li, s"expected 'key: value', got '$kv'")
      val k = kv.substring(0, idx).trim
      val v = kv.substring(idx + 1).trim
      if (v.isEmpty) fail(li, s"'$k' has no value (nested maps unsupported)")
      val m = tables.last._2
      if (m.contains(k)) fail(li, s"duplicate key '$k' in table item")
      m += k -> ((li, v))
    }

    lines.zipWithIndex.foreach { case (line, i) =>
      val t = line.trim
      if (t.nonEmpty) {
        if (t == "tables:") {
          if (sawRoot) fail(i, "duplicate 'tables:' root")
          sawRoot = true
        } else if (t.startsWith("- ")) {
          if (!sawRoot) fail(i, "table item before 'tables:' root")
          tables += ((i, scala.collection.mutable.LinkedHashMap()))
          val rest = t.drop(2).trim
          if (rest.nonEmpty) addPair(i, rest)
        } else if (t.contains(":")) {
          if (tables.isEmpty) fail(i, s"key outside a '- ' table item: '$t'")
          addPair(i, t)
        } else fail(i, s"unparseable line: '$t'")
      }
    }
    if (!sawRoot) fail(0, "missing 'tables:' root")

    val known = Set("name", "source_path", "format", "schema",
      "key_cols", "value_cols", "state_dir", "strict_schema",
      "kafka_bootstrap", "kafka_topic", "kafka_starting_offsets",
      "log_dir", "cow_dir", "dead_letter_dir")

    tables.toSeq.map { case (itemLine, m) =>
      m.foreach { case (k, (li, _)) =>
        if (!known(k)) fail(li, s"unknown key '$k' (known: ${known.toSeq.sorted.mkString(", ")})")
      }
      def reqPair(k: String): (Int, String) = m.getOrElse(k,
        fail(itemLine, s"table item missing required key '$k'"))
      def req(k: String): String = unquote(reqPair(k)._2)
      val schema = {
        val (li, ddl) = reqPair("schema")
        try StructType.fromDDL(unquote(ddl))
        catch { case e: Exception => fail(li, s"bad schema DDL: ${e.getMessage}") }
      }
      val strict = m.get("strict_schema").map { case (li, v) =>
        unquote(v) match {
          case "true"  => true
          case "false" => false
          case other =>
            fail(li, s"strict_schema must be true/false, got '$other'")
        }
      }.getOrElse(false)
      val keyCols = { val (li, v) = reqPair("key_cols"); parseList(li, v) }
      val valueCols = { val (li, v) = reqPair("value_cols"); parseList(li, v) }
      val declared = schema.fieldNames.toSet
      (keyCols ++ valueCols).foreach { c =>
        if (!declared(c)) fail(itemLine,
          s"column '$c' in key_cols/value_cols is not in the declared schema")
      }
      // validate the format VALUE at load: a typo must fail before a
      // 50-table fleet run has mutated 36 state dirs (batch formats per
      // Pipeline.readExtract; runStream additionally accepts the
      // stream-only 'debezium' envelope feed — mode-aware, so a batch
      // load with a debezium config fails here, not inside readExtract)
      val format = req("format")
      val allowed =
        if (streaming) Set("csv", "json", "parquet", "orc", "debezium")
        else Set("csv", "json", "parquet", "orc")
      if (!allowed(format)) {
        val hint = if (format == "debezium")
          " ('debezium' is stream-only — load with streaming=true for runStream)"
        else ""
        fail(reqPair("format")._1,
          s"format must be one of ${allowed.toSeq.sorted.mkString(", ")} — " +
            s"got '$format'$hint")
      }
      // Kafka binding (production Debezium source): both bootstrap and
      // topic or neither, and only meaningful on the debezium format —
      // a kafka key on a file format is a config mistake, fail loudly
      val kafkaKeys = Seq("kafka_bootstrap", "kafka_topic",
        "kafka_starting_offsets").filter(m.contains)
      val kafka =
        if (kafkaKeys.isEmpty) None
        else {
          if (format != "debezium")
            fail(m(kafkaKeys.head)._1,
              s"${kafkaKeys.head} requires format: debezium (got '$format')")
          if (!m.contains("kafka_bootstrap") || !m.contains("kafka_topic"))
            fail(m(kafkaKeys.head)._1,
              "a kafka binding needs BOTH kafka_bootstrap and kafka_topic")
          Some(KafkaBinding(
            bootstrapServers = req("kafka_bootstrap"),
            topic = req("kafka_topic"),
            startingOffsets = m.get("kafka_starting_offsets")
              .map { case (_, v) => unquote(v) }.getOrElse("earliest")))
        }
      // snapshot-log binding: a log_dir equal to the state_dir would
      // interleave manifests with merge generations — reject at load
      val logDir = m.get("log_dir").map { case (li, v) =>
        val d = unquote(v)
        if (d == req("state_dir"))
          fail(li, "log_dir must differ from state_dir (manifests would " +
            "collide with merge generations)")
        d
      }
      // COW replica binding: its log must own its directory exclusively
      val cowDir = m.get("cow_dir").map { case (li, v) =>
        val d = unquote(v)
        if (d == req("state_dir"))
          fail(li, "cow_dir must differ from state_dir (replica files " +
            "would collide with merge generations)")
        if (logDir.contains(d))
          fail(li, "cow_dir must differ from log_dir (two logs cannot " +
            "share one manifest directory)")
        d
      }
      // dead-letter quarantine: only meaningful on the envelope feed —
      // file/parquet extracts have no parse step to reject from
      val deadLetterDir = m.get("dead_letter_dir").map { case (li, v) =>
        if (format != "debezium")
          fail(li, s"dead_letter_dir requires format: debezium (got '$format')")
        val d = unquote(v)
        if (d == req("state_dir"))
          fail(li, "dead_letter_dir must differ from state_dir")
        d
      }
      PipelineConfig(
        sourcePath = req("source_path"),
        format = format,
        schema = schema,
        keyCols = keyCols,
        valueCols = valueCols,
        stateDir = req("state_dir"),
        strictSchema = strict,
        kafka = kafka,
        logDir = logDir,
        cowDir = cowDir,
        deadLetterDir = deadLetterDir)
    }
  }
}
