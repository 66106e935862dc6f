package graft

import graft.streaming.CdcStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** End-to-end config-driven pipeline runs — the reference's main(config)
  * shape [upstream `cdc.py`]: initial load, then an incremental merge,
  * with the per-run op counts the reference logs (R8). */
class PipelineSpec extends AnyFunSuite with SparkFixture {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("status", StringType),
    StructField("amount", DoubleType)))

  test("initial load then incremental merge, counts reconcile (R1-R9)") {
    val dir = Files.createTempDirectory("pipeline")
    val stateDir = s"$dir/state"

    Files.writeString(dir.resolve("extract0.csv"),
      "k,status,amount\n1,O,10.0\n2,O,20.0\n3,F,30.0\n")
    val cfg0 = PipelineConfig(s"$dir/extract0.csv", "csv", schema,
      keyCols = Seq("k"), valueCols = Seq("status", "amount"), stateDir)
    val counts0 = Pipeline.run(spark, cfg0, batchId = 0L)
    assert(counts0 === Map("I" -> 3L, "N" -> 0L))

    Files.writeString(dir.resolve("extract1.csv"),
      "k,status,amount\n1,O,10.0\n2,F,25.0\n4,O,40.0\n")
    val counts1 = Pipeline.run(spark,
      cfg0.copy(sourcePath = s"$dir/extract1.csv"), batchId = 1L)
    assert(counts1 === Map("U" -> 1L, "D" -> 1L, "I" -> 1L, "N" -> 1L))

    val state = CdcStream.currentState(spark, stateDir).get
    assert(state.count() === 3)
    assert(state.filter(col("k") === 2 && col("amount") === 25.0).count() === 1)
    assert(state.filter(col("k") === 3).count() === 0) // deleted
  }

  test("log_dir config: fleet merges commit snapshot-log versions with batch-k time travel") {
    val dir = Files.createTempDirectory("pipeline_log")
    val stateDir = s"$dir/state"
    val logDir = s"$dir/log"

    Files.writeString(dir.resolve("extract0.csv"),
      "k,status,amount\n1,O,10.0\n2,O,20.0\n3,F,30.0\n")
    val cfg = PipelineConfig(s"$dir/extract0.csv", "csv", schema,
      keyCols = Seq("k"), valueCols = Seq("status", "amount"), stateDir,
      logDir = Some(logDir))
    assert(Pipeline.run(spark, cfg, batchId = 0L) === Map("I" -> 3L, "N" -> 0L))

    Files.writeString(dir.resolve("extract1.csv"),
      "k,status,amount\n1,O,10.0\n2,F,25.0\n4,O,40.0\n")
    assert(Pipeline.run(spark,
      cfg.copy(sourcePath = s"$dir/extract1.csv"), batchId = 1L) ===
      Map("U" -> 1L, "D" -> 1L, "I" -> 1L, "N" -> 1L))

    // table-grain time travel through the log: batch 0 still shows the
    // pre-churn table, batch 1 equals the live state
    val asOf0 = CdcStream.stateAsOfBatch(spark, logDir, 0L).get
    assert(asOf0.count() === 3)
    assert(asOf0.filter(col("k") === 3).count() === 1) // not yet deleted
    val asOf1 = CdcStream.stateAsOfBatch(spark, logDir, 1L).get
    val live = CdcStream.currentState(spark, stateDir).get
    assert(asOf1.orderBy("k").collect().toSeq ===
      live.orderBy("k").collect().toSeq)

    // replaying a committed batch is a no-op for state AND log
    val versionsBefore = graft.sources.SnapshotLog.versions(spark, logDir)
    assert(Pipeline.run(spark,
      cfg.copy(sourcePath = s"$dir/extract1.csv"), batchId = 1L)
      .get("N").isDefined)
    assert(graft.sources.SnapshotLog.versions(spark, logDir) ===
      versionsBefore)
  }

  test("cow_dir config: the feed maintains a COW snapshot-log replica equal to the state") {
    val dir = Files.createTempDirectory("pipeline_cow")
    val stateDir = s"$dir/state"
    val cowDir = s"$dir/cow"

    Files.writeString(dir.resolve("extract0.csv"),
      "k,status,amount\n1,O,10.0\n2,O,20.0\n3,F,30.0\n")
    val cfg = PipelineConfig(s"$dir/extract0.csv", "csv", schema,
      keyCols = Seq("k"), valueCols = Seq("status", "amount"), stateDir,
      cowDir = Some(cowDir))
    Pipeline.run(spark, cfg, batchId = 0L)
    Files.writeString(dir.resolve("extract1.csv"),
      "k,status,amount\n1,O,10.0\n2,F,25.0\n4,O,40.0\n")
    Pipeline.run(spark,
      cfg.copy(sourcePath = s"$dir/extract1.csv"), batchId = 1L)

    // replica latest == live state, and batch-0 time travel works
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "status", "amount").orderBy("k").collect()
        .map(_.toSeq).toSeq
    val live = CdcStream.currentState(spark, stateDir).get
    assert(rows(graft.sources.SnapshotLog.read(spark, cowDir)) === rows(live))
    val v0 = graft.sources.SnapshotLog.versionOfBatch(spark, cowDir, 0L).get
    assert(graft.sources.SnapshotLog.read(spark, cowDir, Some(v0))
      .count() === 3)
    // replay heals/no-ops the replica too
    val before = graft.sources.SnapshotLog.versions(spark, cowDir)
    Pipeline.run(spark,
      cfg.copy(sourcePath = s"$dir/extract1.csv"), batchId = 1L)
    assert(graft.sources.SnapshotLog.versions(spark, cowDir) === before)
  }

  test("config rollout with an added column evolves state through the merge") {
    val dir = Files.createTempDirectory("pipeline_evo")
    val stateDir = s"$dir/state"

    // deployment 1: v1 config, two value columns
    Files.writeString(dir.resolve("extract0.csv"),
      "k,status,amount\n1,O,10.0\n2,O,20.0\n3,F,30.0\n")
    val cfgV1 = PipelineConfig(s"$dir/extract0.csv", "csv", schema,
      keyCols = Seq("k"), valueCols = Seq("status", "amount"), stateDir)
    assert(Pipeline.run(spark, cfgV1, batchId = 0L) === Map("I" -> 3L, "N" -> 0L))

    // deployment 2: upstream DDL added `channel`; the operator ships the
    // v2 config (schema + value_cols grow) against the SAME state dir —
    // no re-bootstrap. Row 1 is untouched (channel still absent), so it
    // must stay N even though the state was hashed under v1 columns.
    val schemaV2 = StructType(schema.fields :+ StructField("channel", StringType))
    Files.writeString(dir.resolve("extract1.csv"),
      "k,status,amount,channel\n1,O,10.0,\n2,F,25.0,web\n4,O,40.0,app\n")
    val cfgV2 = PipelineConfig(s"$dir/extract1.csv", "csv", schemaV2,
      keyCols = Seq("k"), valueCols = Seq("status", "amount", "channel"),
      stateDir)
    assert(Pipeline.run(spark, cfgV2, batchId = 1L) ===
      Map("U" -> 1L, "D" -> 1L, "I" -> 1L, "N" -> 1L))

    val state = CdcStream.currentState(spark, stateDir).get
    assert(state.columns.contains("channel"))
    assert(state.filter(col("k") === 1 && col("channel").isNull).count() === 1)
    assert(state.filter(col("k") === 2 && col("channel") === "web").count() === 1)
  }

  test("runAll merges many tables concurrently, isolating failures") {
    val dir = Files.createTempDirectory("pipeline_multi")
    val cfgs = (0 until 6).map { i =>
      Files.writeString(dir.resolve(s"t$i.csv"),
        s"k,status,amount\n1,O,${i}0.0\n2,F,${i}5.0\n")
      PipelineConfig(s"$dir/t$i.csv", "csv", schema,
        Seq("k"), Seq("status", "amount"), s"$dir/state$i")
    } :+ PipelineConfig(s"$dir/missing.csv", "csv", schema,
      Seq("k"), Seq("status", "amount"), s"$dir/state_bad")

    val results = Pipeline.runAll(spark, cfgs, batchId = 0L)
    assert(results.size === 7)
    (0 until 6).foreach { i =>
      assert(results(s"$dir/state$i") === Right(Map("I" -> 2L, "N" -> 0L)))
    }
    assert(results(s"$dir/state_bad").isLeft, "missing extract must fail its table only")
  }

  test("pruneVersions keeps only the newest snapshots") {
    val dir = Files.createTempDirectory("pipeline_prune")
    val cfg = PipelineConfig(s"$dir/e.csv", "csv", schema,
      Seq("k"), Seq("status", "amount"), s"$dir/state")
    (0 to 3).foreach { b =>
      Files.writeString(dir.resolve("e.csv"),
        s"k,status,amount\n1,O,${b}1.0\n")
      Pipeline.run(spark, cfg, batchId = b.toLong)
    }
    CdcStream.pruneVersions(spark, s"$dir/state", keep = 2)
    assert(CdcStream.currentVersion(spark, s"$dir/state") === Some(3L))
    val state = CdcStream.currentState(spark, s"$dir/state").get
    assert(state.filter(col("amount") === 31.0).count() === 1)
    // only v2 and v3 remain
    assert(!new java.io.File(CdcStream.versionPath(s"$dir/state", 0)).exists())
    assert(!new java.io.File(CdcStream.versionPath(s"$dir/state", 1)).exists())
    assert(new java.io.File(CdcStream.versionPath(s"$dir/state", 2)).exists())
  }

  test("replaying a committed batch is a no-op with the same counts (at-least-once)") {
    val dir = Files.createTempDirectory("pipeline_replay")
    Files.writeString(dir.resolve("e.csv"), "k,status,amount\n1,O,10.0\n2,F,20.0\n")
    val cfg = PipelineConfig(s"$dir/e.csv", "csv", schema,
      Seq("k"), Seq("status", "amount"), s"$dir/state")
    val first = Pipeline.run(spark, cfg, batchId = 0L)
    val replay = Pipeline.run(spark, cfg, batchId = 0L) // foreachBatch redelivery
    assert(first === Map("I" -> 2L, "N" -> 0L))
    assert(replay === first)
    // the feed partition was not double-appended
    val feedRows = spark.read.parquet(CdcStream.changesPath(s"$dir/state"))
      .filter(col("batch_id") === 0).count()
    assert(feedRows === 2)
    assert(CdcStream.currentState(spark, s"$dir/state").get.count() === 2)
  }

  test("schema drift: dropped value column nulls, added column ignored; strict fails") {
    val dir = Files.createTempDirectory("pipeline_drift")
    val stateDir = s"$dir/state"
    Files.writeString(dir.resolve("e0.csv"),
      "k,status,amount\n1,O,10.0\n2,O,20.0\n")
    val cfg = PipelineConfig(s"$dir/e0.csv", "csv", schema,
      Seq("k"), Seq("status", "amount"), stateDir)
    assert(Pipeline.run(spark, cfg, 0L) === Map("I" -> 2L, "N" -> 0L))

    // upstream DDL drift: `amount` dropped, `note` added
    Files.writeString(dir.resolve("e1.csv"),
      "k,status,note\n1,O,x\n2,F,y\n")
    val counts1 = Pipeline.run(spark, cfg.copy(sourcePath = s"$dir/e1.csv"), 1L)
    // both rows change: amount 10.0/20.0 -> null (and 2's status flips)
    assert(counts1 === Map("U" -> 2L, "N" -> 0L))
    val state = CdcStream.currentState(spark, stateDir).get
    assert(state.filter(col("amount").isNull).count() === 2)
    assert(state.columns.toSeq === Seq("k", "status", "amount"))

    // strict mode refuses the same drift
    val strictCfg = cfg.copy(sourcePath = s"$dir/e1.csv",
      stateDir = s"$dir/state_strict", strictSchema = true)
    val e = intercept[IllegalArgumentException](Pipeline.run(spark, strictCfg, 0L))
    assert(e.getMessage.contains("schema drift"))

    // a missing KEY column is an error even in tolerant mode
    Files.writeString(dir.resolve("e2.csv"), "status,amount\nO,1.0\n")
    val e2 = intercept[IllegalArgumentException](
      Pipeline.run(spark, cfg.copy(sourcePath = s"$dir/e2.csv",
        stateDir = s"$dir/state_nokey"), 0L))
    assert(e2.getMessage.contains("key column"))
  }

  test("rows with null keys are rejected at the boundary, not fused by the merge") {
    val dir = Files.createTempDirectory("pipeline_ragged")
    // records missing the key field read as null keys; the merge's
    // null-safe key equality would then fuse them many-to-many
    Files.writeString(dir.resolve("e0.json"),
      """{"k":1,"status":"O","amount":10.0}
        |{"status":"O","amount":2.0}
        |{"status":"F","amount":3.0}
        |{"k":2,"status":"F","amount":20.0}
        |""".stripMargin)
    val cfg = PipelineConfig(s"$dir/e0.json", "json", schema,
      Seq("k"), Seq("status", "amount"), s"$dir/state")
    // tolerant: the two null-keyed rows are dropped, the rest merge
    assert(Pipeline.run(spark, cfg, 0L) === Map("I" -> 2L, "N" -> 0L))
    val state = CdcStream.currentState(spark, s"$dir/state").get
    assert(state.count() === 2 && state.filter(col("k").isNull).count() === 0)
    // strict: the same extract fails the run
    val e = intercept[Exception](
      Pipeline.run(spark, cfg.copy(stateDir = s"$dir/state_strict",
        strictSchema = true), 0L))
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: chain(x.getCause))
    assert(chain(e).exists(_.contains("is not true")), s"got: ${chain(e)}")
  }

  test("runAll timeout machinery: hung table reported, fleet lives, queued work unaffected") {
    import scala.concurrent.duration._
    def cfgFor(name: String) = PipelineConfig(
      s"/nonexistent/$name", "csv", schema, Seq("k"), Seq("status"),
      s"/tmp/ra_$name")
    val slow = cfgFor("slow")
    val ok1 = cfgFor("ok1")
    val ok2 = cfgFor("ok2")
    val ranOk = new java.util.concurrent.atomic.AtomicInteger(0)
    val runFn = (_: org.apache.spark.sql.SparkSession,
                 cfg: PipelineConfig, _: Long) =>
      if (cfg.stateDir.endsWith("slow")) {
        Thread.sleep(30000); Map("I" -> 0L) // interrupted well before 30s
      } else {
        ranOk.incrementAndGet(); Map("I" -> 1L, "N" -> 0L)
      }
    val t0 = System.currentTimeMillis()
    val res = Pipeline.runAllWith(runFn)(
      spark, Seq(slow, ok1, ok2), 0L, parallelism = 2, 2.seconds)
    val wall = System.currentTimeMillis() - t0
    // the hung table is reported timed out, the healthy ones completed
    assert(res(slow.stateDir).isLeft &&
      res(slow.stateDir).swap.exists(_.contains("timed out")))
    assert(res(ok1.stateDir) === Right(Map("I" -> 1L, "N" -> 0L)))
    assert(res(ok2.stateDir) === Right(Map("I" -> 1L, "N" -> 0L)))
    assert(ranOk.get() === 2)
    // and the fleet returned promptly (budget + slack, nowhere near 30 s)
    assert(wall < 15000, s"runAll blocked for ${wall}ms")
  }

  test("runAll abandons a task that never left the queue within the fleet budget") {
    import scala.concurrent.duration._
    def cfgFor(name: String) = PipelineConfig(
      s"/nonexistent/$name", "csv", schema, Seq("k"), Seq("status"),
      s"/tmp/rq_$name")
    val q1Ran = new java.util.concurrent.atomic.AtomicBoolean(false)
    // one worker, wedged by a sleeper that IGNORES interrupts for ~6 s.
    // q1's queue wait expires (queueBudget = 1s x 3) at ~4 s; when the
    // worker frees at ~6 s — while the caller still awaits q2 — it
    // dequeues q1 first, and the abandon flag must stop q1's merge from
    // running unwatched. q2 then starts inside its own await and succeeds.
    val runFn = (_: org.apache.spark.sql.SparkSession,
                 cfg: PipelineConfig, _: Long) =>
      if (cfg.stateDir.endsWith("wedged")) {
        val end = System.currentTimeMillis() + 6000
        while (System.currentTimeMillis() < end)
          try Thread.sleep(100) catch { case _: InterruptedException => }
        Map.empty[String, Long]
      } else if (cfg.stateDir.endsWith("q1")) {
        q1Ran.set(true); Map("I" -> 1L)
      } else Map("I" -> 1L, "N" -> 0L)
    val res = Pipeline.runAllWith(runFn)(
      spark, Seq(cfgFor("wedged"), cfgFor("q1"), cfgFor("q2")), 0L,
      parallelism = 1, 1.second)
    assert(res("/tmp/rq_wedged").isLeft)
    assert(res("/tmp/rq_q1").swap.exists(_.contains("never started")),
      s"q1: ${res("/tmp/rq_q1")}")
    assert(res("/tmp/rq_q2") === Right(Map("I" -> 1L, "N" -> 0L)))
    assert(!q1Ran.get(), "abandoned task ran its merge after the report")
  }

  test("config-driven debezium stream: envelope files drive the keyed merge") {
    import spark.implicits._
    val dir = Files.createTempDirectory("pipeline_dbz")
    val inDir = Files.createDirectory(dir.resolve("in"))
    val cfg = PipelineConfig(inDir.toString, "debezium", schema,
      keyCols = Seq("k"), valueCols = Seq("status", "amount"),
      stateDir = s"$dir/state")
    // the format value must also pass config-file validation — but ONLY
    // under a streaming load; a batch load must reject it at parse time
    val parsed = ConfigFile.parse(streaming = true, where = "inline",
      rawLines = Seq(
      "tables:",
      "  - name: t",
      s"    source_path: $inDir",
      "    format: debezium",
      "    schema: \"k long, status string, amount double\"",
      "    key_cols: [k]",
      "    value_cols: [status, amount]",
      s"    state_dir: $dir/state"))
    assert(parsed.head.format === "debezium")
    // same config under a batch load: rejected at load time, before any
    // state dir is touched
    val batchErr = intercept[IllegalArgumentException](
      ConfigFile.parse(Seq(
        "tables:",
        "  - name: t",
        s"    source_path: $inDir",
        "    format: debezium",
        "    schema: \"k long, status string, amount double\"",
        "    key_cols: [k]",
        "    value_cols: [status, amount]",
        s"    state_dir: $dir/state"), "inline")).getMessage
    assert(batchErr.contains("stream-only"), batchErr)

    val q = Pipeline.runStream(spark, cfg, s"$dir/ckpt")
    try {
      Files.writeString(inDir.resolve("b0.jsonl"),
        """{"before":null,"after":{"k":1,"status":"O","amount":10.0},"op":"r","ts_ms":1704103200000}
          |{"before":null,"after":{"k":2,"status":"O","amount":20.0},"op":"c","ts_ms":1704103200000}
          |""".stripMargin)
      q.processAllAvailable()
      Files.writeString(inDir.resolve("b1.jsonl"),
        """{"before":{"k":1,"status":"O","amount":10.0},"after":{"k":1,"status":"F","amount":15.0},"op":"u","ts_ms":1704103260000}
          |{"before":{"k":2,"status":"O","amount":20.0},"after":null,"op":"d","ts_ms":1704103260000}
          |""".stripMargin)
      q.processAllAvailable()
    } finally q.stop()
    val state = CdcStream.currentState(spark, s"$dir/state").get
      .select("k", "status", "amount").as[(Long, String, Double)]
      .collect().toSet
    assert(state === Set((1L, "F", 15.0)))
  }

  test("json extract drives the same merge") {
    val dir = Files.createTempDirectory("pipeline_json")
    Files.writeString(dir.resolve("e0.json"),
      """{"k":1,"status":"O","amount":1.5}
        |{"k":2,"status":"F","amount":2.5}
        |""".stripMargin)
    val cfg = PipelineConfig(s"$dir/e0.json", "json", schema,
      Seq("k"), Seq("status", "amount"), s"$dir/state")
    assert(Pipeline.run(spark, cfg, 0L) === Map("I" -> 2L, "N" -> 0L))
  }
}
