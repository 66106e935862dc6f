package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

/** Benchmark harness: wall-times every registered query at the driver's
  * scale factor and emits ONE machine-readable JSON line (also written to
  * bench_out.json, since sbt interleaves log noise on stdout).
  *
  * Each query is measured SPARK_GRAFT_BENCH_RUNS times (default 3) and
  * reports the MEDIAN: single-run sub-second timings swing 3× on
  * JIT/GC lottery (round 4's q_intersect "regression" was exactly that),
  * which corrupts round-over-round comparison. Box noise is ONE-SIDED
  * (spikes, never dips), so the median needs a same-query spike majority
  * to corrupt; a repeat-run comparison at 147 queries showed totals
  * within 5% and median per-query deviation ~12%. Set the env var to 5
  * for a tighter sub-second tail (+~90 s wall) when iterating locally.
  *
  * Failures are never folded into healthy timings: a failing query gets
  * time = -1 and an entry in "errors", and is excluded from the total.
  * A warmup pass (the flagship query) runs first so JVM/codegen/session
  * startup is not billed to the first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.forDriver()

    // per-query shuffle accounting: total shuffle bytes written across the
    // query's stages — the scale-discipline number (a query whose shuffle
    // grows superlinearly with SF is the one that dies at 100 TB)
    val shuffleBytes = new AtomicLong(0L)
    // per-query JOB counts: a query whose wall time is mostly scheduler
    // round-trips (many tiny jobs) spikes under host contention while the
    // scan canaries stay clean — the job count is what lets a reader
    // attribute such a spike to the scheduler, not the plan
    val jobCount = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        jobCount.incrementAndGet()
        ()
      }
    })

    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }

    // Codegen warm-up: run every query once at the smallest SF so the
    // measured pass reflects steady-state execution, not janino compile
    // time (q_map's generated str_to_map code costs ~2 s to compile — a
    // one-time JVM cost that a long-lived 100 TB job never re-pays, and
    // that previously landed on whichever query ran it first). Failures
    // here are ignored; the measured pass still reports them.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      "/root/testdata/sf0.001")
    if (Files.isDirectory(Paths.get(warmDir)) && warmDir != sfDir)
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }

    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val shuffles = scala.collection.mutable.LinkedHashMap[String, Double]()
    val jobs = scala.collection.mutable.LinkedHashMap[String, Long]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      Thread.sleep(50) // drain async listener events from the previous query
      val s0 = shuffleBytes.get()
      val j0 = jobCount.get()
      val times = scala.collection.mutable.ArrayBuffer[Double]()
      var failed = false
      var i = 0
      while (i < runs && !failed) { // first failure aborts: no retry noise
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            errors(name) =
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
            failed = true
        }
        i += 1
      }
      Thread.sleep(50)
      // shuffle bytes and job counts are deterministic per run —
      // normalize to one run
      shuffles(name) = math.round((shuffleBytes.get() - s0) / 1048576.0
        / times.size.max(1) * 1000) / 1000.0
      jobs(name) = math.round(
        (jobCount.get() - j0).toDouble / times.size.max(1))
      val median =
        if (times.isEmpty) -1.0 else times.sorted.apply(times.size / 2)
      name -> (if (failed) -1.0 else median)
    }
    // Scheduler-bound canary: a fixed 20-job no-data loop (the
    // q_eval_ann_recall cost class — wall time is ~all scheduler
    // round-trips). The scan canaries below stay clean under CPU-fair
    // contention while multi-job queries spike 5-8× (the r8 driver run);
    // this canary spikes WITH them, making such runs machine-attributable
    // from the artifact alone. Median of 3, like everything else.
    val schedTimes = (0 until 3).map { _ =>
      val t0 = System.nanoTime()
      var k = 0
      while (k < 20) { spark.range(1).count(); k += 1 }
      (System.nanoTime() - t0) / 1e9
    }.sorted
    val schedSec = schedTimes(schedTimes.size / 2)
    // pinned committed-snapshot baseline (update when re-snapshotting)
    val schedBaseline = 0.565
    val schedRatio = math.round(schedSec / schedBaseline * 1000) / 1000.0
    // Host-noise self-adjudication: three scan-shaped canary queries whose
    // code is frozen round-over-round. Their committed-snapshot medians are
    // pinned here (update alongside bench_out.json when re-snapshotting);
    // canary_ratio = geometric mean of measured/baseline. A ratio > 1.3
    // means the HOST is slower than the box that produced the committed
    // snapshot, and every per-query delta in this run must be read through
    // that lens (r7's driver run was 1.6× on the canaries and 3-5× on
    // scheduler-bound queries — machine state, not code). The bench flags
    // it in the artifact itself so no human cross-read of BASELINE.md is
    // needed.
    val canaryBaseline = Seq(
      "q_scan_project" -> 0.1108,
      "q_agg_group"    -> 0.1905,
      "q_topk"         -> 0.1351)
    val resultMap = results.toMap
    val canaryPairs = canaryBaseline.flatMap { case (k, base) =>
      resultMap.get(k).filter(_ > 0).map(v => (k, v, v / base))
    }
    val canaryRatio =
      if (canaryPairs.isEmpty) -1.0
      else math.exp(canaryPairs.map(p => math.log(p._3)).sum / canaryPairs.size)
    val canaryRatioR = math.round(canaryRatio * 1000) / 1000.0
    // scheduler noise swings wider than scan noise on a healthy box —
    // flag at 2×; either canary firing marks the run contaminated
    val hostNoise = canaryRatio > 1.3 || schedRatio > 2.0
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val shfl = shuffles.map { case (k, v) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val jbs = jobs.map { case (k, v) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // full detail (per-query shuffle bytes, error messages) → file only
    val canJson = canaryPairs
      .map { case (k, v, r) =>
        s"${jstr(k)}:{\"sec\":$v,\"vs_baseline\":${math.round(r * 1000) / 1000.0}}" }
      .mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_failed":${errors.size},"shuffle_mb":$shfl,"jobs":$jbs,"canaries":$canJson,"canary_ratio":$canaryRatioR,"sched_canary_sec":$schedSec,"sched_canary_ratio":$schedRatio,"host_noise":$hostNoise,"sf":${jstr(sfDir)}}"""
    Files.writeString(Paths.get("bench_out.json"), fullJson + "\n")
    // stdout line: the driver keeps only a bounded tail of stdout (~2 KB —
    // round 2's full line overflowed it mid-JSON and parsed as null), so
    // print the COMPACT contract JSON at the highest per-query decimal
    // precision that fits a 1900-byte budget. At 141 queries even a
    // 0-decimal line with every name no longer fits (~2.2 KB of names
    // alone — round 4's tail truncated mid-JSON), so the compact map
    // additionally OMITS entries that round to "0" at the chosen
    // precision (they carry no information the "value" total doesn't);
    // failed queries (-1) always stay. n_queries records the full count;
    // bench_out.json keeps every query at full precision.
    def lineAt(dp: Int): String = {
      def fmt(v: Double): String = {
        // Locale.ROOT: a comma-decimal default locale would emit "0,939"
        // and corrupt the JSON line
        val s = String.format(java.util.Locale.ROOT, s"%.${dp}f", v)
        if (!s.contains('.')) s
        else s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      }
      val qsShort = results
        .map { case (k, v) => (k, fmt(v)) }
        .collect { case (k, f) if f != "0" =>
          s"${jstr(k.stripPrefix("q_"))}:$f" }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${math.round(total * 1000) / 1000.0},"unit":"sec","queries":$qsShort,"n_queries":${results.size},"n_failed":${errors.size},"canary_ratio":$canaryRatioR,"sched_canary_ratio":$schedRatio,"host_noise":$hostNoise,"sf":${jstr(sfDir)}}"""
    }
    val json = (3 to 0 by -1).map(lineAt).find(_.length <= 1900)
      .getOrElse(lineAt(0))
    spark.stop()
    System.err.println(
      s"[bench] stdout line: ${json.length} bytes; full detail: bench_out.json (${fullJson.length} bytes)")
    // last bare line on stdout, after the Spark shutdown noise
    println(json)
  }
}
