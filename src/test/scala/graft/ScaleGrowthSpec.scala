package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

/** The measured scale-growth law for the shuffle-heavy five
  * (q_dedup_passage, q_dedup_cross_source, q_boilerplate,
  * q_simjoin_prefix, q_winsorize): on a seeded synthetic corpus with
  * CONSTANT duplicate density (each doc has O(1) planted near-dups —
  * replicating one corpus would quadratically inflate match pairs and
  * test the fixture, not the engine), a 10× corpus must grow each
  * query's shuffle-write bytes ≤ ~linearly, and the executed plan must
  * keep its SHAPE: no partition-less window at either scale, no NEW
  * exchange at 10×, no broadcast appearing on the scaled side, never a
  * cartesian. This converts the 100 TB design comments on those queries
  * into a regression gate — a superlinear shuffle or a shape flip at
  * 10× is exactly what dies at 1000×. */
class ScaleGrowthSpec extends AnyFunSuite with SparkFixture {

  private val Queries = Seq("q_dedup_passage", "q_dedup_cross_source",
    "q_boilerplate", "q_simjoin_prefix", "q_winsorize")

  /** Seeded corpus: `n` docs of a 10-token boilerplate prefix + 40
    * id-salted pseudo-random body tokens (fixed 100k vocab — shingle
    * space stays sparse at both scales); every 10th doc repeats the
    * PREVIOUS doc's body (constant near-dup density). lineitem grows
    * keys WITH the data (50 lines per supplier at every scale — the
    * per-key window stays task-bounded as the corpus grows). */
  private def writeCorpus(dir: String, nDocs: Long): Unit = {
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat(
        lit("terms of service apply to all content on this site "),
        expr("""concat_ws(' ', transform(sequence(1, 40),
                 j -> concat('t', abs(xxhash64(
                   if(id % 10 = 9, id - 1, id), j)) % 100000)))"""))
        .as("text"),
      expr("element_at(array('en','de','fr','es'), int(id % 4) + 1)")
        .as("lang"),
      concat(lit("src"), expr("id % 7")).as("source"))
      .withColumn("n_chars", length(col("text")))
    docs.write.parquet(s"$dir/documents.parquet")
    val nLines = nDocs * 8
    spark.range(nLines).select(
      (col("id") % (nLines / 50)).as("l_suppkey"),
      (expr("abs(xxhash64(id)) % 10000000").cast("double") / 100)
        .as("l_extendedprice"),
      expr("id div 4").as("l_orderkey"),
      (col("id") % 4 + 1).cast("int").as("l_linenumber"))
      .write.parquet(s"$dir/lineitem.parquet")
  }

  private val shuffleBytes = new AtomicLong(0L)
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      shuffleBytes.addAndGet(
        sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      ()
    }
  })

  /** Run to completion; return (shuffle bytes, final physical plan
    * string, result row count). */
  private def measure(df: DataFrame): (Long, String, Long) = {
    val s0 = { Thread.sleep(200); shuffleBytes.get() }
    val n = df.collect().length.toLong
    Thread.sleep(400) // listener events drain async
    (shuffleBytes.get() - s0, df.queryExecution.executedPlan.toString, n)
  }

  private def opCount(plan: String, op: String): Int =
    plan.sliding(op.length).count(_ == op)

  private lazy val (dirX1, dirX10) = {
    val root = Files.createTempDirectory("scalegrow").toString
    writeCorpus(s"$root/x1", 3000L)
    writeCorpus(s"$root/x10", 30000L)
    (s"$root/x1", s"$root/x10")
  }

  for (name <- Queries) test(s"$name: 10x corpus => <= ~linear shuffle " +
      "growth, same plan shape, partitioned windows, no cartesian") {
    val q = Registry.all.find(_.name == name).get
    val dfX1 = q.fn(spark, dirX1)
    val dfX10 = q.fn(spark, dirX10)
    // every window is key-partitioned at BOTH scales — a partition-less
    // window is the single-task sink that dies first at 100 TB
    for ((df, tag) <- Seq((dfX1, "x1"), (dfX10, "x10"))) {
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w.partitionSpec
      }
      assert(windows.forall(_.nonEmpty),
        s"$name@$tag has a partition-less window")
    }
    val (b1, p1, _) = measure(dfX1)
    val (b10, p10, _) = measure(dfX10)
    // shuffle growth ≤ ~linear (10× data, ≤ 15× bytes: headroom for
    // per-partition framing amortizing differently at tiny scale)
    assert(b10 <= b1 * 15,
      s"$name shuffle grew superlinearly: x1=$b1 B, x10=$b10 B " +
        s"(${b10.toDouble / math.max(b1, 1)}x for 10x data)")
    assert(b1 > 0 || b10 == 0,
      s"$name wrote shuffle only at 10x — fixture too small to measure")
    // plan shape holds: no NEW exchange at 10×, no broadcast appearing
    // on the scaled side, never a cartesian / nested-loop all-pairs
    for ((p, tag) <- Seq((p1, "x1"), (p10, "x10"))) {
      assert(!p.contains("CartesianProduct"),
        s"$name@$tag plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name@$tag plans a nested-loop join")
    }
    assert(opCount(p10, "Exchange") <= opCount(p1, "Exchange"),
      s"$name grew a NEW exchange at 10x:\n--- x1 ---\n$p1\n" +
        s"--- x10 ---\n$p10")
    assert(opCount(p10, "BroadcastExchange") <=
      opCount(p1, "BroadcastExchange"),
      s"$name broadcasts MORE at 10x (scaled side broadcast?):\n$p10")
  }

  // -------------------------------------------------------------------
  // the IMAGE leg — the same law over the raster dedup primitives
  // -------------------------------------------------------------------

  /** Seeded raster corpus at constant near-dup density: every 10th
    * image is a box-RESIZE of the previous one (the transform a
    * byte/pixel hash misses), all others distinct test rasters. */
  private def rasterFrame(n: Long): DataFrame = {
    import graft.dedup.ImageDedup
    import graft.multimodal.Png
    import spark.implicits._
    spark.range(n).as[Long].map { i =>
      val srcId = if (i % 10 == 9) i - 1 else i
      val img = ImageDedup.testRaster(srcId, 32, 32)
      val png =
        if (i % 10 == 9)
          Png.encode(16, 16, 1, Png.resizeBox(img, 16, 16).pixels)
        else Png.encode(32, 32, 1, img.pixels)
      (i, png)
    }.toDF("media_id", "payload")
  }

  test("image banded pair join: 10x raster corpus => <= ~linear shuffle " +
      "growth, same plan shape, never cartesian, planted near-dups found") {
    import graft.dedup.ImageDedup
    val dfX1 = ImageDedup.nearDuplicates(rasterFrame(2000L),
      "media_id", "payload", maxDist = 6)
    val dfX10 = ImageDedup.nearDuplicates(rasterFrame(20000L),
      "media_id", "payload", maxDist = 6)
    val (b1, p1, n1) = measure(dfX1)
    val (b10, p10, n10) = measure(dfX10)
    // recall anchor: every planted (orig, resize) pair is found; extra
    // pairs (coincidentally near rasters) only ever ADD rows
    assert(n1 >= 200L && n10 >= 2000L,
      s"planted near-dups missed: x1=$n1 (want >= 200), " +
        s"x10=$n10 (want >= 2000)")
    assert(b10 <= b1 * 15,
      s"image pair join shuffle grew superlinearly: x1=$b1 B, " +
        s"x10=$b10 B (${b10.toDouble / math.max(b1, 1)}x for 10x data)")
    for ((p, tag) <- Seq((p1, "x1"), (p10, "x10"))) {
      assert(!p.contains("CartesianProduct"),
        s"image pair join@$tag plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"image pair join@$tag plans a nested-loop join")
    }
    assert(opCount(p10, "Exchange") <= opCount(p1, "Exchange"),
      s"image pair join grew a NEW exchange at 10x:\n$p10")
  }

  test("store-backed image screen: a FIXED daily batch against a 10x " +
      "standing store reads the same bucket-pruned file set and its " +
      "shuffle grows <= ~linearly") {
    import graft.dedup.{FingerprintStore, ImageDedup}
    val root = Files.createTempDirectory("scalegrow-img").toString
    val (storeX1, storeX10) = (s"$root/fps-x1", s"$root/fps-x10")
    FingerprintStore.append(spark, storeX1,
      ImageDedup.fingerprints(rasterFrame(2000L), "media_id", "payload"),
      batchId = 0L)
    FingerprintStore.append(spark, storeX10,
      ImageDedup.fingerprints(rasterFrame(20000L), "media_id", "payload"),
      batchId = 0L)
    // the daily reality: the BATCH stays constant while the standing
    // corpus grows 10x — screen cost must track the batch, not the store
    val incoming = ImageDedup.fingerprints(
      rasterFrame(64L).withColumn("media_id", col("media_id") + 1000000L),
      "media_id", "payload")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def run(store: String): (Long, Long, Long) = {
        val q = FingerprintStore.screen(spark, store, incoming,
          asOfBatch = 1L)
        val scan = q.queryExecution.executedPlan.collectLeaves()
          .collectFirst {
            case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(
                _.toString.contains(store)) => f
          }.getOrElse(fail(s"no store scan in plan for $store"))
        val (bytes, _, _) = measure(q)
        val total = spark.read.parquet(store)
          .select(input_file_name()).distinct().count()
        (bytes, scan.metrics("numFiles").value, total)
      }
      val (b1, files1, total1) = run(storeX1)
      val (b10, files10, total10) = run(storeX10)
      assert(files10 < total10,
        s"10x screen read the whole store ($files10 of $total10 files)")
      // the touched-bucket set is a function of the INCOMING batch, so
      // the pruned file count must not grow with the store (+8: the
      // x1 store may leave a handful of its 2048 buckets empty)
      assert(files10 <= files1 + 8,
        s"screen file reads grew with the store: x1=$files1/$total1, " +
          s"x10=$files10/$total10 — bucket pruning lost")
      // candidate volume inside touched buckets IS data-proportional;
      // superlinear means the prune (not the data) broke
      assert(b10 <= math.max(b1, 1024L) * 15,
        s"screen shuffle grew superlinearly: x1=$b1 B, x10=$b10 B")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  // -------------------------------------------------------------------
  // the EMBEDDING leg — the same law for the dedup_semantic stage
  // -------------------------------------------------------------------

  /** Seeded embedding corpus at constant dup density: every 10th vector
    * is an IDENTICAL copy of the previous one (same cluster under any
    * quantizer, cosine exactly 1), all others id-salted pseudo-random
    * 16-dim — near-orthogonal, far below τ. */
  private def embFrame(n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(1, 16),
        j -> cast((abs(xxhash64(if(id % 10 = 9, id - 1, id), j)) % 1000)
          / 500.0 - 1.0 as float))""").as("embedding"))

  test("decontaminate_fuzzy stage: 10x corpus against a FIXED eval " +
      "set => <= ~linear shuffle, eval side stays broadcast, planted " +
      "leaks all drop") {
    // the decontamination reality at 100 TB: the eval set is fixed and
    // tiny while the corpus grows — cost must track the corpus scan,
    // with the eval band-buckets broadcast (map-only probe), never a
    // corpus-side shuffle against the eval set
    val evalDir = {
      val d = Files.createTempDirectory("fuzzy-scale").toString + "/eval"
      spark.range(20).select(
        col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(1, 50),
                 j -> concat('e', id, 'x', j)))""").as("text"))
        .write.parquet(d)
      d
    }
    def corpus(n: Long): DataFrame = spark.range(n).select(
      col("id").as("doc_id"),
      // every 100th doc is a LEAK: eval doc (id/100 % 20)'s text with
      // every 15th token swapped — J ~ 0.59, p(band hit) ~ 99.7% under
      // the 8x2 banding (LSH recall is probabilistic BY DESIGN; the
      // assertion below is the recall bound, not an exact count)
      expr("""CASE WHEN id % 100 = 0 THEN
               concat_ws(' ', transform(sequence(1, 50),
                 j -> IF(j % 15 = 0, concat('zz', j),
                   concat('e', (id div 100) % 20, 'x', j))))
             ELSE concat_ws(' ', transform(sequence(1, 50),
               j -> concat('t', abs(xxhash64(id, j)) % 100000)))
             END""").as("text"),
      lit("s").as("source"))
    val cfg = CuratePipeline.CurateConfig(
      inputPath = "unused", outDir = "unused")
    val st = CuratePipeline.Stage("decontaminate_fuzzy",
      Map("eval_path" -> evalDir, "threshold_milli" -> "400"))
    def runScale(n: Long): (Long, String, Long) = {
      val in = corpus(n)
      Thread.sleep(200); val s0 = shuffleBytes.get()
      val out = CuratePipeline.applyStage(spark, in, st, cfg)
      val cnt = out.collect().length.toLong
      Thread.sleep(400)
      (shuffleBytes.get() - s0,
        out.queryExecution.executedPlan.toString, cnt)
    }
    val (b1, p1, n1) = runScale(3000L)
    val (b10, p10, n10) = runScale(30000L)
    // recall bound: >= 90% of planted leaks drop (banding is
    // probabilistic but deterministic for a fixed corpus + hash seeds);
    // NO clean doc ever drops (the dropped count never exceeds planted)
    val (d1, d10) = (3000L - n1, 30000L - n10)
    assert(d1 >= 27L && d1 <= 30L,
      s"x1 dropped $d1 of 30 planted leaks (want 27..30, 0 false drops)")
    assert(d10 >= 270L && d10 <= 300L,
      s"x10 dropped $d10 of 300 planted (want 270..300, 0 false drops)")
    assert(b10 <= b1 * 15,
      s"fuzzy decontamination shuffle grew superlinearly: x1=$b1 B, " +
        s"x10=$b10 B (${b10.toDouble / math.max(b1, 1)}x for 10x data)")
    for ((p, tag) <- Seq((p1, "x1"), (p10, "x10"))) {
      assert(!p.contains("CartesianProduct"),
        s"decontaminate_fuzzy@$tag plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"decontaminate_fuzzy@$tag plans a nested-loop join")
      assert(p.contains("BroadcastExchange"),
        s"decontaminate_fuzzy@$tag lost the eval-side broadcast")
    }
    assert(opCount(p10, "Exchange") <= opCount(p1, "Exchange"),
      s"decontaminate_fuzzy grew a NEW exchange at 10x:\n$p10")
  }

  test("dedup_semantic stage: 10x corpus with clusters scaled as " +
      "declared => <= ~linear shuffle (training included), same plan " +
      "shape, never cartesian, planted dups all drop") {
    // the config contract at 100 TB: `clusters` grows with the corpus
    // so per-cluster size (the quadratic pair term) stays CONSTANT —
    // this gate measures exactly that promise, training shuffles
    // included (applyStage trains the quantizer while building)
    def runScale(n: Long): (Long, String, Long) = {
      val cfg = CuratePipeline.CurateConfig(
        inputPath = "unused", outDir = "unused", idCol = "vec_id")
      val st = CuratePipeline.Stage("dedup_semantic",
        Map("tau_milli" -> "950", "clusters" -> (n / 100).toString))
      val in = embFrame(n)
      Thread.sleep(200); val s0 = shuffleBytes.get()
      val out = CuratePipeline.applyStage(spark, in, st, cfg)
      val cnt = out.collect().length.toLong
      Thread.sleep(400) // listener events drain async
      (shuffleBytes.get() - s0,
        out.queryExecution.executedPlan.toString, cnt)
    }
    val (b1, p1, n1) = runScale(3000L)
    val (b10, p10, n10) = runScale(30000L)
    // recall anchor: every planted identical pair collapses (identical
    // vectors co-cluster under ANY quantizer and cosine 1 >= τ);
    // coincidental extra drops can only push the count lower
    assert(n1 <= 3000L - 300L && n10 <= 30000L - 3000L,
      s"planted dups survived: x1 kept $n1 (want <= 2700), " +
        s"x10 kept $n10 (want <= 27000)")
    assert(b10 <= b1 * 15,
      s"dedup_semantic shuffle grew superlinearly: x1=$b1 B, " +
        s"x10=$b10 B (${b10.toDouble / math.max(b1, 1)}x for 10x data)")
    for ((p, tag) <- Seq((p1, "x1"), (p10, "x10"))) {
      assert(!p.contains("CartesianProduct"),
        s"dedup_semantic@$tag plans a CartesianProduct")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"dedup_semantic@$tag plans a nested-loop join")
    }
    assert(opCount(p10, "Exchange") <= opCount(p1, "Exchange"),
      s"dedup_semantic grew a NEW exchange at 10x:\n$p10")
  }
}
