package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Config-driven curation pipeline ([[CuratePipeline]]): the composed run
  * must equal applying the stages by hand, the observe-riding funnel must
  * equal per-stage recounts (proving the zero-extra-pass audit is exact),
  * the snapshot-log publish must be atomic + replay-idempotent, and every
  * config mistake must fail at LOAD, before any directory is touched.
  */
class CuratePipelineSpec extends AnyFunSuite with SparkFixture {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val goodConfig =
    s"""# training-slice curation run
       |curate:
       |  input: $Sf/documents.parquet
       |  out_dir: OUT
       |  shards: 3
       |stages:
       |  - stage: lang_keep
       |    langs: [en, de]
       |  - stage: quality
       |    min_tok: 20
       |    max_tok: 400
       |    min_ttr_milli: 300
       |  - stage: dedup_exact
       |  - stage: dedup_near
       |  - stage: source_quota
       |    per_source: 8
       |""".stripMargin

  private def cfgWith(out: String, log: Option[String] = None) = {
    val base = CuratePipeline.parse(
      goodConfig.replace("OUT", out).linesIterator.toSeq, "test.yaml")
    log.map(l => base.copy(logDir = Some(l))).getOrElse(base)
  }

  test("run == hand-composed stages, and the funnel == per-stage recounts") {
    val out = tmp("curate-out")
    val cfg = cfgWith(out)
    val report = CuratePipeline.run(spark, cfg)

    // hand composition, one stage at a time (same public stage fns)
    var df = spark.read.parquet(s"$Sf/documents.parquet")
    val expected = scala.collection.mutable.ArrayBuffer[Long](df.count())
    cfg.stages.foreach { st =>
      df = CuratePipeline.applyStage(spark, df, st, cfg)
      expected += df.count()
    }

    assert(report.stageRows.map(_._2) === expected.toSeq)
    assert(report.finalRows === expected.last)
    // stage tags are ordered and named
    assert(report.stageRows.map(_._1) === Seq("s00_input", "s01_lang_keep",
      "s02_quality", "s03_dedup_exact", "s04_dedup_near",
      "s05_source_quota"))
    // monotone funnel: no stage adds rows
    assert(report.stageRows.map(_._2).sliding(2).forall(p => p(1) <= p(0)))

    // written output == composed frame (set equality on ids)
    val written = spark.read.parquet(out)
    assert(written.count() === report.finalRows)
    assert(written.select("doc_id").exceptAll(df.select("doc_id")).isEmpty)

    // shard count honored
    val files = new java.io.File(out).listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(files === 3)
  }

  test("decontaminate stage drops exactly the gram-sharing docs") {
    val out = tmp("curate-out2")
    val evalDir = tmp("curate-eval")
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    // eval set = the deterministic ~1% split the batch oracle uses
    docs.filter(col("doc_id") % 97 === 0).write.mode("overwrite")
      .parquet(evalDir)
    val cfg = CuratePipeline.CurateConfig(
      inputPath = s"$Sf/documents.parquet", outDir = out,
      stages = Seq(CuratePipeline.Stage("decontaminate",
        Map("eval_path" -> evalDir, "gram" -> "4"))))
    val report = CuratePipeline.run(spark, cfg)
    // the eval docs trivially share all their grams with themselves, so
    // they all drop; survivors must share NO 4-gram with the eval set
    val survivors = spark.read.parquet(out)
    val scfg = graft.streaming.CurateStream.Config()
    val evalGrams = graft.streaming.CurateStream.evalGramSet(
      spark.read.parquet(evalDir), scfg)
    val leaked = graft.streaming.CurateStream
      .decontGate(survivors, evalGrams, scfg)
    assert(leaked.count() === survivors.count(),
      "a survivor still shares a gram with the eval set")
    assert(report.finalRows < docs.count())
  }

  test("snapshot-log publish: atomic version, replay no-op, next run advances") {
    val out = tmp("curate-out3")
    val log = tmp("curate-log")
    val cfg = cfgWith(out, log = Some(log))
    val r1 = CuratePipeline.run(spark, cfg, runId = 1L)
    assert(r1.logVersion === Some(1L))
    val published = SnapshotLog.read(spark, log)
    assert(published.count() === r1.finalRows)

    // replay of runId 1: no new version, no rewrite (mtimes untouched)
    val mtimes = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).map(f => f.getName -> f.lastModified).toMap
    val r2 = CuratePipeline.run(spark, cfg, runId = 1L)
    assert(r2.logVersion === Some(1L) && r2.finalRows === -1L)
    val after = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).map(f => f.getName -> f.lastModified).toMap
    assert(after === mtimes, "a replayed run rewrote the published shards")

    // a NEW run commits a new version atomically
    val r3 = CuratePipeline.run(spark, cfg, runId = 2L)
    assert(r3.logVersion === Some(2L))
    assert(SnapshotLog.versions(spark, log) === Seq(1L, 2L))
  }

  test("dedup_jaccard: survivors are pairwise below threshold, one canonical per component") {
    val cfg = CuratePipeline.CurateConfig(
      inputPath = s"$Sf/documents.parquet", outDir = "unused")
    val st = CuratePipeline.Stage("dedup_jaccard",
      Map("threshold_milli" -> "700", "shingle" -> "4"))
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val out = CuratePipeline.applyStage(spark, docs, st, cfg)
    val survivors = out.count()
    assert(survivors > 0 && survivors < docs.count(),
      "the stage must actually drop near-duplicates on this corpus")
    // law: re-running near-dup detection on the survivors finds nothing
    // — every above-threshold pair was an edge, so only one member of
    // each component can remain
    val residual = graft.dedup.MinHashLsh.nearDuplicates(
      out, "doc_id", "text",
      graft.dedup.MinHashLsh.Config(shingleSize = 4, threshold = 0.7))
    assert(residual.isEmpty, "surviving docs still contain a near-dup pair")
    // every survivor is the MIN id of its group: dropped ids never
    // undercut a surviving near-dup partner
    val pairs = graft.dedup.MinHashLsh.nearDuplicates(
      docs, "doc_id", "text",
      graft.dedup.MinHashLsh.Config(shingleSize = 4, threshold = 0.7))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    pairs.foreach { case (a, b) =>
      assert(!(kept(a) && kept(b)), s"pair ($a,$b) both survived")
    }
  }

  test("dedup_semantic: planted identical-embedding groups elect the " +
      "min id; distinct vectors all survive; config surface validates") {
    import spark.implicits._
    // 10 seeded random 16-dim bases, base i duplicated as ids
    // 10i .. 10i+(i%3) with IDENTICAL embeddings (identical vectors
    // always co-cluster — the expected answer is quantizer-independent)
    val rnd = new scala.util.Random(42)
    val bases = Vector.fill(10)(Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    val rows = for (i <- 0 until 10; j <- 0 to i % 3)
      yield (i * 10L + j, bases(i), s"src${i % 3}")
    // premise: cross-base snapped cosines sit below τ=950000 — every
    // dup pair is identical, every non-pair is far
    def cos6(a: Array[Float], b: Array[Float]): Long = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      math.floor(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)) * 1e6
        + 0.5).toLong
    }
    for (i <- 0 until 10; k <- i + 1 until 10)
      assert(cos6(bases(i), bases(k)) < 950000L,
        s"test premise broken: bases $i,$k too close")
    val docs = rows.toDF("vec_id", "embedding", "source")
    val cfg = CuratePipeline.CurateConfig(
      inputPath = "unused", outDir = "unused", idCol = "vec_id")
    val st = CuratePipeline.Stage("dedup_semantic",
      Map("tau_milli" -> "950", "clusters" -> "4"))
    val out = CuratePipeline.applyStage(spark, docs, st, cfg)
    // survivors: exactly the min id of each identity group, original
    // columns only (working columns must not leak)
    assert(out.columns.toSet === docs.columns.toSet)
    assert(out.select("vec_id").as[Long].collect().toSet
      === (0 until 10).map(_ * 10L).toSet)
    // embed_col aliasing follows the corpus' spelling
    val out2 = CuratePipeline.applyStage(spark,
      docs.withColumnRenamed("embedding", "emb"),
      CuratePipeline.Stage("dedup_semantic",
        Map("tau_milli" -> "950", "clusters" -> "4",
          "embed_col" -> "emb")), cfg)
    assert(out2.select("vec_id").as[Long].collect().toSet
      === (0 until 10).map(_ * 10L).toSet)
    // a corpus without the embedding column names the fix
    val eCol = intercept[IllegalArgumentException](
      CuratePipeline.applyStage(spark, docs.drop("embedding"), st, cfg))
    assert(eCol.getMessage.contains("embed_col"))
    // config text parses for BOTH modalities (SemDeDup's original
    // domain was image embeddings)
    def cfgText(modality: String) =
      s"""curate:
         |  input: in
         |  out_dir: out
         |  id_col: vec_id
         |  modality: $modality
         |stages:
         |  - stage: dedup_semantic
         |    tau_milli: 950
         |    clusters: 4
         |""".stripMargin.linesIterator.toSeq
    assert(CuratePipeline.parse(cfgText("text"), "t.yaml")
      .stages.head.name === "dedup_semantic")
    assert(CuratePipeline.parse(cfgText("image"), "t.yaml")
      .stages.head.name === "dedup_semantic")
    // load-time validation: τ outside (0, 1000] and clusters < 1 refuse
    def bad(k: String, v: String) = intercept[IllegalArgumentException](
      CuratePipeline.parse(
        s"""curate:
           |  input: in
           |  out_dir: out
           |stages:
           |  - stage: dedup_semantic
           |    tau_milli: ${if (k == "tau_milli") v else "950"}
           |    clusters: ${if (k == "clusters") v else "4"}
           |""".stripMargin.linesIterator.toSeq, "t.yaml"))
    assert(bad("tau_milli", "0").getMessage.contains("tau_milli"))
    assert(bad("tau_milli", "1001").getMessage.contains("tau_milli"))
    assert(bad("clusters", "0").getMessage.contains("clusters"))
    // the quantizer comes from exactly one place: clusters XOR
    // quantizer_path — neither and both refuse at load
    def qCfg(extra: String) = CuratePipeline.parse(
      s"""curate:
         |  input: in
         |  out_dir: out
         |stages:
         |  - stage: dedup_semantic
         |    tau_milli: 950
         |$extra""".stripMargin.linesIterator.toSeq.filter(_.nonEmpty),
      "t.yaml")
    val eNeither = intercept[IllegalArgumentException](qCfg(""))
    assert(eNeither.getMessage.contains("exactly one of"))
    val eBoth = intercept[IllegalArgumentException](
      qCfg("    clusters: 4\n    quantizer_path: /q"))
    assert(eBoth.getMessage.contains("exactly one of"))
    assert(qCfg("    quantizer_path: /q").stages.head
      .params("quantizer_path") === "/q")
  }

  test("runStream routes a dedup_semantic config to the embedding " +
      "stream engine; in-run training and extra stages refuse") {
    import graft.sim.Ivf
    import graft.streaming.SemDedupStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val e = Tables.embeddings(spark, Sf)
    val qdir = tmp("curate-semq")
    Ivf.centroidsIter(e, "embedding", "label", iters = 2)
      .write.mode("overwrite").parquet(qdir)
    val outA = tmp("curate-semstream-a") // config-driven
    val outB = tmp("curate-semstream-b") // direct mergeBatch twin
    def cfgText(stage: String) =
      s"""curate:
         |  input: unused
         |  out_dir: $outA
         |  id_col: vec_id
         |stages:
         |$stage""".stripMargin.linesIterator.toSeq
    val cfg = CuratePipeline.parse(cfgText(
      s"""  - stage: dedup_semantic
         |    tau_milli: 350
         |    quantizer_path: $qdir""".stripMargin), "s.yaml")
    val base = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val b0 = base.take(120)
    // batch 1 re-sends two batch-0 vectors under new ids — must reject
    val b1 = base.slice(120, 240) ++
      b0.take(2).map { case (id, v) => (90000L + id, v) }
    val ms = MemoryStream[Vec]
    val q = CuratePipeline.runStream(spark, cfg, ms.toDF,
      tmp("curate-semstream-ckpt"))
    try {
      ms.addData(b0.map { case (id, v) => Vec(id, v) })
      q.processAllAvailable()
      ms.addData(b1.map { case (id, v) => Vec(id, v) })
      q.processAllAvailable()
    } finally q.stop()
    // twin: the same batches through mergeBatch directly
    val cents = spark.read.parquet(qdir)
    SemDedupStream.mergeBatch(spark,
      b0.toSeq.toDF("vec_id", "embedding"), 0L, outB, cents,
      SemDedupStream.Config(tauMicro = 350000L))
    SemDedupStream.mergeBatch(spark,
      b1.toSeq.toDF("vec_id", "embedding"), 1L, outB, cents,
      SemDedupStream.Config(tauMicro = 350000L))
    def accepted(d: String) =
      spark.read.parquet(SemDedupStream.storePath(d))
        .select("vec_id").as[Long].collect().toSet
    assert(accepted(outA) === accepted(outB),
      "config-driven stream diverged from the direct engine")
    assert(!accepted(outA).exists(_ >= 90000L),
      "a cross-batch duplicate was accepted")
    // in-run training on a stream refuses (quantizer must be frozen)
    val eTrain = intercept[IllegalArgumentException](
      CuratePipeline.runStream(spark,
        CuratePipeline.parse(cfgText(
          s"""  - stage: dedup_semantic
             |    tau_milli: 350
             |    clusters: 4""".stripMargin), "s.yaml"),
        ms.toDF, tmp("curate-semstream-ckpt2")))
    assert(eTrain.getMessage.contains("quantizer_path"))
    // extra text stages refuse: the vector feed has no textCol
    val eMulti = intercept[IllegalArgumentException](
      CuratePipeline.runStream(spark,
        CuratePipeline.parse(cfgText(
          s"""  - stage: dedup_exact
             |  - stage: dedup_semantic
             |    tau_milli: 350
             |    quantizer_path: $qdir""".stripMargin), "s.yaml"),
        ms.toDF, tmp("curate-semstream-ckpt3")))
    assert(eMulti.getMessage.contains("single-stage"))
  }

  test("decontaminate_fuzzy: a lightly-edited eval leak the exact " +
      "gram gate misses drops; clean docs survive; subscription " +
      "accepts the stage; bad banding refuses at load") {
    import spark.implicits._
    def words(n: Int, tag: String) =
      (1 to n).map(i => s"$tag$i").mkString(" ")
    val evalText = words(60, "w")
    // the leak: every 15th token swapped — longest unchanged run is 14
    // tokens, so exact decontamination at gram 16 shares NOTHING, while
    // 4-shingle Jaccard stays ~0.56
    val leak = evalText.split(" ").zipWithIndex.map { case (w, i) =>
      if ((i + 1) % 15 == 0) s"zz$i" else w }.mkString(" ")
    val clean = words(60, "q")
    val evalDir = tmp("fuzzy-eval")
    Seq((999L, evalText)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(evalDir)
    val docs = Seq((1L, leak, "s"), (2L, clean, "s"))
      .toDF("doc_id", "text", "source")
    val cfg = CuratePipeline.CurateConfig(
      inputPath = "unused", outDir = "unused")
    // premise: the exact gate at gram 16 keeps BOTH docs
    val exactKept = CuratePipeline.applyStage(spark, docs,
      CuratePipeline.Stage("decontaminate",
        Map("eval_path" -> evalDir, "gram" -> "16")), cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(exactKept === Set(1L, 2L),
      "test premise broken: exact gram-16 gate caught the edited leak")
    // the fuzzy gate drops the leak, keeps the clean doc
    val fuzzyKept = CuratePipeline.applyStage(spark, docs,
      CuratePipeline.Stage("decontaminate_fuzzy",
        Map("eval_path" -> evalDir, "threshold_milli" -> "400",
          "shingle" -> "4")), cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(fuzzyKept === Set(2L),
      s"fuzzy gate wrong survivors: $fuzzyKept (want only the clean doc)")
    // per-document semantics: runSubscription's vocabulary accepts it
    // (refusal message would name it corpus-grain otherwise)
    val root = tmp("fuzzy-sub")
    graft.sources.SnapshotLog.commit(spark, s"$root/up", docs)
    val subCfg = cfg.copy(inputPath = s"$root/up",
      outDir = s"$root/shards", inputLog = true,
      stages = Seq(CuratePipeline.Stage("decontaminate_fuzzy",
        Map("eval_path" -> evalDir, "threshold_milli" -> "400"))))
    assert(CuratePipeline.runSubscription(spark, subCfg,
      s"$root/cursor").size === 1)
    assert(graft.sources.SnapshotLog.read(spark, s"$root/shards")
      .select("doc_id").as[Long].collect().toSet === Set(2L),
      "subscription drain let the leak through")
    // an eval set without the text column names the fix
    val wrongDir = tmp("fuzzy-wrong")
    Seq((1L, 2L)).toDF("a", "b").write.mode("overwrite").parquet(wrongDir)
    val eCol2 = intercept[IllegalArgumentException](
      CuratePipeline.applyStage(spark, docs,
        CuratePipeline.Stage("decontaminate_fuzzy",
          Map("eval_path" -> wrongDir, "threshold_milli" -> "400")), cfg))
    assert(eCol2.getMessage.contains("text"))
    // bands must divide num_hashes — refused at LOAD
    val eBand = intercept[IllegalArgumentException](
      CuratePipeline.parse(
        s"""curate:
           |  input: in
           |  out_dir: out
           |stages:
           |  - stage: decontaminate_fuzzy
           |    eval_path: $evalDir
           |    threshold_milli: 400
           |    bands: 3
           |""".stripMargin.linesIterator.toSeq, "t.yaml"))
    assert(eBand.getMessage.contains("divide"))
  }

  test("dedup_semantic embed_path: sidecar embeddings join by " +
      "embed_key, unembedded docs ride through, the joined column " +
      "never reaches the output") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val bases = Vector.fill(6)(Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    // docs 0..6; sidecar covers 0..5 (6 has NO embedding and must ride
    // through); 4 and 5 share base(4) — the planted dup pair
    val docs = (0L to 6L).map(i => (i, s"text $i", "s"))
      .toDF("doc_id", "text", "source")
    val side = (0L to 5L)
      .map(i => (i, bases(math.min(i, 4L).toInt)))
      .toDF("vid", "embedding")
    val sideDir = tmp("semdedup-side")
    side.write.mode("overwrite").parquet(sideDir)
    val cfg = CuratePipeline.CurateConfig(
      inputPath = "unused", outDir = "unused")
    val out = CuratePipeline.applyStage(spark, docs,
      CuratePipeline.Stage("dedup_semantic",
        Map("tau_milli" -> "950", "clusters" -> "3",
          "embed_path" -> sideDir, "embed_key" -> "vid")), cfg)
    assert(out.columns.toSet === docs.columns.toSet,
      s"embedding column leaked: ${out.columns.mkString(",")}")
    assert(out.select("doc_id").as[Long].collect().toSet
      === Set(0L, 1L, 2L, 3L, 4L, 6L), // 5 drops (dup of 4); 6 rides
      "wrong survivors")
    // ambiguity refuses: corpus already embedded AND embed_path set
    val eAmb = intercept[IllegalArgumentException](
      CuratePipeline.applyStage(spark,
        docs.withColumn("embedding", lit(null).cast("array<float>")),
        CuratePipeline.Stage("dedup_semantic",
          Map("tau_milli" -> "950", "clusters" -> "3",
            "embed_path" -> sideDir, "embed_key" -> "vid")), cfg))
    assert(eAmb.getMessage.contains("ambiguous"))
    // a sidecar missing the declared key names the fix
    val eKey = intercept[IllegalArgumentException](
      CuratePipeline.applyStage(spark, docs,
        CuratePipeline.Stage("dedup_semantic",
          Map("tau_milli" -> "950", "clusters" -> "3",
            "embed_path" -> sideDir, "embed_key" -> "nope")), cfg))
    assert(eKey.getMessage.contains("embed_key"))
  }

  test("dedup_semantic end-to-end: a config-text run over the sf " +
      "corpus with the embeddings table as sidecar — funnel == " +
      "hand-composed, publish carries no embedding column") {
    val out = tmp("curate-sem-out")
    val cfg = CuratePipeline.parse(
      s"""curate:
         |  input: $Sf/documents.parquet
         |  out_dir: $out
         |stages:
         |  - stage: quality
         |    min_tok: 5
         |    max_tok: 100000
         |    min_ttr_milli: 0
         |  - stage: dedup_semantic
         |    tau_milli: 350
         |    clusters: 5
         |    embed_path: $Sf/embeddings.parquet
         |    embed_key: vec_id
         |""".stripMargin.linesIterator.toSeq, "sem.yaml")
    val report = CuratePipeline.run(spark, cfg)
    var df = spark.read.parquet(s"$Sf/documents.parquet")
    val expected = scala.collection.mutable.ArrayBuffer[Long](df.count())
    cfg.stages.foreach { st =>
      df = CuratePipeline.applyStage(spark, df, st, cfg)
      expected += df.count()
    }
    assert(report.stageRows.map(_._2) === expected.toSeq,
      "funnel != hand-composed recounts")
    assert(report.stageRows.last._2 < report.stageRows.head._2,
      "the semantic stage dropped nothing on this corpus")
    val written = spark.read.parquet(out)
    assert(written.count() === report.finalRows)
    assert(!written.columns.contains("embedding"),
      "the sidecar embedding column leaked into the published shard")
  }

  test("chunk: token conservation, bounded chunk size, unique ids, columns ride along") {
    val cfg = CuratePipeline.CurateConfig(
      inputPath = s"$Sf/documents.parquet", outDir = "unused")
    val st = CuratePipeline.Stage("chunk", Map("chunk_tokens" -> "16"))
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val out = CuratePipeline.applyStage(spark, docs, st, cfg)
    assert(out.columns.toSet === docs.columns.toSet)
    val tokIn = docs.select(sum(size(split(col("text"), " "))))
      .head.getLong(0)
    val tokOut = out.select(sum(size(split(col("text"), " "))))
      .head.getLong(0)
    assert(tokIn === tokOut, "chunking must conserve tokens exactly")
    val oversize = out.filter(size(split(col("text"), " ")) > 16).count()
    assert(oversize === 0)
    assert(out.select("doc_id").distinct().count() === out.count(),
      "chunk ids must stay unique")
    // provenance: chunk id div 100000 recovers the source doc id
    val badParent = out.withColumn("parent", col("doc_id") / lit(100000L))
      .join(docs.select(col("doc_id").as("orig")),
        expr("CAST(parent AS BIGINT) = orig"), "left_anti").count()
    assert(badParent === 0)

    // OVERLAPPING windows (stride < chunk): per doc, chunks == the
    // q_chunk_docs start rule, every full window carries exactly
    // chunk_tokens, and consecutive windows share chunk − stride tokens
    import spark.implicits._
    val ov = CuratePipeline.applyStage(spark, docs,
      CuratePipeline.Stage("chunk",
        Map("chunk_tokens" -> "16", "stride_tokens" -> "8")), cfg)
    val perDoc = ov
      .select((col("doc_id") / 100000L).cast("long").as("parent"))
      .groupBy("parent").count()
      .join(docs.select(col("doc_id").as("parent"),
        size(split(col("text"), " ")).cast("long").as("n")), Seq("parent"))
      .as[(Long, Long, Long)].collect()
    perDoc.foreach { case (id, got, n) =>
      val want = (math.max(n - 16, 0) + 7) / 8 + 1
      assert(got === want, s"doc $id: $got windows, want $want (n=$n)")
    }
    // overlap law on one concrete doc: window k starts at token k*8+1
    val one = docs.orderBy("doc_id").limit(1)
    val chunks = CuratePipeline.applyStage(spark, one,
      CuratePipeline.Stage("chunk",
        Map("chunk_tokens" -> "16", "stride_tokens" -> "8")), cfg)
      .orderBy("doc_id")
      .select("text").as[String].collect().map(_.split(" ").toSeq)
    val toks = one.select("text").as[String].head.split(" ").toSeq
    chunks.zipWithIndex.foreach { case (c, k) =>
      assert(c === toks.slice(k * 8, k * 8 + 16),
        s"window $k is not toks[${k * 8} ..)")
    }
    // stride > chunk refuses (a gap would silently drop tokens)
    val e = intercept[IllegalArgumentException](
      CuratePipeline.applyStage(spark, docs,
        CuratePipeline.Stage("chunk",
          Map("chunk_tokens" -> "8", "stride_tokens" -> "9")), cfg))
    assert(e.getMessage.contains("stride_tokens"))
    // >= 100000 windows for one doc would collide chunk ids across
    // documents — the plan-side guard fails loudly, never silently
    val giant = Seq((1L, (1 to 100001).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
    val boom = intercept[Exception](
      CuratePipeline.applyStage(spark, giant,
        CuratePipeline.Stage("chunk",
          Map("chunk_tokens" -> "1", "stride_tokens" -> "1")), cfg)
        .count())
    assert(boom.getMessage != null &&
      (boom.getMessage.contains("collide") ||
        Option(boom.getCause).exists(_.getMessage.contains("collide"))),
      s"wrong failure: ${boom.getMessage}")
  }

  test("token_budget: per-source budget respected, kept set is an id-prefix") {
    val cfg = CuratePipeline.CurateConfig(
      inputPath = s"$Sf/documents.parquet", outDir = "unused")
    val st = CuratePipeline.Stage("token_budget",
      Map("per_source_tokens" -> "300"))
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val out = CuratePipeline.applyStage(spark, docs, st, cfg)
    assert(out.count() > 0 && out.count() < docs.count())
    val over = out.groupBy("source")
      .agg(sum(size(split(col("text"), " "))).as("tok"))
      .filter(col("tok") > 300).count()
    assert(over === 0, "a source exceeded its token budget")
    // prefix property: within a source, every kept id < every dropped
    // id THAT WOULD STILL FIT is impossible — equivalently max kept id
    // < min dropped id is false in general (a huge doc can be skipped
    // only by the cumulative rule, which is prefix — so assert directly:
    // kept ids per source are exactly the cumulative-sum prefix
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
    val expect = docs
      .withColumn("cum", sum(size(split(col("text"), " "))).over(w))
      .filter(col("cum") <= 300).select("doc_id")
    assert(out.select("doc_id").exceptAll(expect).isEmpty &&
      expect.exceptAll(out.select("doc_id")).isEmpty)
  }

  test("runStream: the same config drives the streaming engine; batch-only stages rejected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = tmp("curate-stream-out")
    val ckpt = tmp("curate-stream-ckpt")
    val good = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon")
    val cfg = CuratePipeline.CurateConfig(
      inputPath = "unused", outDir = out,
      stages = Seq(
        CuratePipeline.Stage("quality", Map("min_tok" -> "20",
          "max_tok" -> "400", "min_ttr_milli" -> "300")),
        CuratePipeline.Stage("dedup_near", Map.empty)))
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Doc]
    val q = CuratePipeline.runStream(spark, cfg, ms.toDF, ckpt)
    try {
      ms.addData(Seq(Doc(1, good), Doc(2, good), Doc(3, "too short")))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read
      .parquet(graft.streaming.CurateStream.acceptedPath(out))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L)) // 2 deduped, 3 gated

    val batchOnly = cfg.copy(stages = cfg.stages :+
      CuratePipeline.Stage("chunk", Map("chunk_tokens" -> "16")))
    val e = intercept[IllegalArgumentException] {
      CuratePipeline.runStream(spark, batchOnly, ms.toDF, ckpt)
    }
    assert(e.getMessage.contains("batch-only"))
  }

  test("runSubscription: shards FOLLOW the upstream table through churn " +
      "— deletes/degrades/slice-exits evict within one drain, inserts " +
      "curate in, replay is a no-op, corpus-grain stages refuse") {
    import spark.implicits._
    val root = tmp("curate-sub")
    val up = s"$root/up"; val outd = s"$root/shards"
    val cur = s"$root/cursor"
    def doc(id: Long, lang: String, words: Int) =
      (id, lang, (1 to words).map(i => s"w$i$id").mkString(" "))
    SnapshotLog.commit(spark, up,
      Seq(doc(1, "en", 5), doc(2, "en", 1), doc(3, "de", 5),
        doc(4, "en", 6)).toDF("doc_id", "lang", "text"))
    val cfg = CuratePipeline.CurateConfig(
      inputPath = up, outDir = outd, inputLog = true,
      stages = Seq(
        CuratePipeline.Stage("lang_keep", Map("langs" -> "[en]")),
        CuratePipeline.Stage("quality", Map("min_tok" -> "3",
          "max_tok" -> "100", "min_ttr_milli" -> "0"))))
    def shardIds() = SnapshotLog.read(spark, outd)
      .select("doc_id").as[Long].collect().toSet
    // drain 1 (bootstrap): only en docs above the quality bar publish
    assert(CuratePipeline.runSubscription(spark, cfg, cur).size === 1)
    assert(shardIds() === Set(1L, 4L)) // 2 fails quality, 3 fails lang
    // caught up: an idle drain commits nothing
    assert(CuratePipeline.runSubscription(spark, cfg, cur).isEmpty)
    // upstream churn in one commit: 1 deleted, 4 degraded below the
    // bar, 3 flips de→en (now eligible), 5 inserts clean
    SnapshotLog.merge(spark, up, Seq(
        (1L, "en", "x", true),              // delete
        (4L, "en", "tiny", false),          // update: degrades 4
        (3L, "en", doc(3, "en", 5)._3, false), // update: enters slice
        (5L, "en", doc(5, "en", 7)._3, false)) // insert: curates in
        .toDF("doc_id", "lang", "text", "del"),
      keys = Seq("doc_id"), deleteWhen = Some(col("del")),
      dropCols = Seq("del"))
    // ONE drain propagates all four: delete evicts, degrade evicts,
    // slice-entry publishes, insert publishes
    assert(CuratePipeline.runSubscription(spark, cfg, cur).size === 1)
    assert(shardIds() === Set(3L, 5L),
      "published shard set must mirror upstream churn after one drain")
    // replay idempotence: crash between merge and ack == cursor rolled
    // back; the re-drain replays the span as a #batch no-op
    val nVersionsBefore = SnapshotLog.versions(spark, outd).size
    SnapshotLog.ackChanges(spark, up, cur, 1L)
    CuratePipeline.runSubscription(spark, cfg, cur)
    assert(SnapshotLog.versions(spark, outd).size === nVersionsBefore,
      "replayed drain must not stack a new output version")
    assert(shardIds() === Set(3L, 5L))
    // bounded admission: two more upstream commits drain in two bites
    SnapshotLog.merge(spark, up,
      Seq(doc(6, "en", 5)).toDF("doc_id", "lang", "text"),
      keys = Seq("doc_id"))
    SnapshotLog.merge(spark, up,
      Seq(doc(7, "en", 5)).toDF("doc_id", "lang", "text"),
      keys = Seq("doc_id"))
    val bitten = CuratePipeline.runSubscription(spark, cfg, cur,
      maxVersionsPerPoll = Some(1L))
    assert(bitten.size === 2, s"expected 2 bites, got $bitten")
    assert(shardIds() === Set(3L, 5L, 6L, 7L))
    // byte-bounded admission threads through too: two more upstream
    // commits drain in two 1-byte bites
    SnapshotLog.merge(spark, up,
      Seq(doc(8, "en", 5)).toDF("doc_id", "lang", "text"),
      keys = Seq("doc_id"))
    SnapshotLog.merge(spark, up,
      Seq(doc(9, "en", 5)).toDF("doc_id", "lang", "text"),
      keys = Seq("doc_id"))
    val byteBitten = CuratePipeline.runSubscription(spark, cfg, cur,
      maxBytesPerPoll = Some(1L))
    assert(byteBitten.size === 2, s"expected 2 byte-bites, got $byteBitten")
    assert(shardIds() === Set(3L, 5L, 6L, 7L, 8L, 9L))
    // corpus-grain stages refuse loudly: a per-slice dedup would judge
    // against the batch, not the corpus
    val e = intercept[IllegalArgumentException](
      CuratePipeline.runSubscription(spark,
        cfg.copy(stages = cfg.stages :+
          CuratePipeline.Stage("dedup_near", Map.empty)), cur))
    assert(e.getMessage.contains("corpus-grain"))
    // and a non-log input has no feed to subscribe to
    val e2 = intercept[IllegalArgumentException](
      CuratePipeline.runSubscription(spark,
        cfg.copy(inputLog = false), cur))
    assert(e2.getMessage.contains("input_log"))
  }

  test("runSubscription over an IMAGE table: changed images re-gate " +
      "through quality_image — degrades to corrupt/undersized evict, " +
      "good inserts publish, replay is a no-op, dedup_image refuses") {
    import graft.dedup.ImageDedup
    import graft.multimodal.Png
    import spark.implicits._
    val root = tmp("curate-sub-img")
    val up = s"$root/up"; val outd = s"$root/shards"
    val cur = s"$root/cursor"
    def png(id: Long, w: Int, h: Int) =
      Png.encode(w, h, 1, ImageDedup.testRaster(id, w, h).pixels)
    SnapshotLog.commit(spark, up, Seq(
      (1L, png(1, 32, 32)), (2L, png(2, 8, 8)),   // 2 under the floor
      (3L, png(3, 16, 16))).toDF("media_id", "payload"))
    val cfg = CuratePipeline.CurateConfig(
      inputPath = up, outDir = outd, inputLog = true,
      idCol = "media_id", modality = "image",
      stages = Seq(CuratePipeline.Stage("quality_image",
        Map("min_w" -> "16", "min_h" -> "16"))))
    def shardIds() = SnapshotLog.read(spark, outd)
      .select("media_id").as[Long].collect().toSet
    assert(CuratePipeline.runSubscription(spark, cfg, cur).size === 1)
    assert(shardIds() === Set(1L, 3L))
    // churn: 1 degrades to a corrupt payload (evict), 2 upgrades above
    // the floor (publish), 4 inserts good, 3 deletes
    SnapshotLog.merge(spark, up, Seq(
        (1L, "corrupt".getBytes("UTF-8"), false),
        (2L, png(2, 32, 32), false),
        (4L, png(4, 16, 16), false),
        (3L, Array.empty[Byte], true))
        .toDF("media_id", "payload", "del"),
      keys = Seq("media_id"), deleteWhen = Some(col("del")),
      dropCols = Seq("del"))
    assert(CuratePipeline.runSubscription(spark, cfg, cur).size === 1)
    assert(shardIds() === Set(2L, 4L),
      "image shard table must mirror the churn after one drain")
    // replay: rolled-back cursor re-delivers; merge is a #batch no-op
    val nV = SnapshotLog.versions(spark, outd).size
    SnapshotLog.ackChanges(spark, up, cur, 1L)
    CuratePipeline.runSubscription(spark, cfg, cur)
    assert(SnapshotLog.versions(spark, outd).size === nV)
    assert(shardIds() === Set(2L, 4L))
    // dedup_image is corpus-grain over a slice: refuse
    val e = intercept[IllegalArgumentException](
      CuratePipeline.runSubscription(spark,
        cfg.copy(stages = cfg.stages :+
          CuratePipeline.Stage("dedup_image", Map.empty)), cur))
    assert(e.getMessage.contains("ImageDedupStream"))
  }

  test("runSubscription property: under a seeded random churn program " +
      "(merges, deletes, full replaces, batched drains, random " +
      "admission), the shard table ALWAYS equals the batch recompute " +
      "of the upstream latest (seed 5309)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5309)
    val root = tmp("curate-sub-prop")
    val up = s"$root/up"; val outd = s"$root/shards"
    val cur = s"$root/cursor"
    val langs = Seq("en", "de", "fr")
    def text(id: Long, words: Int) =
      (1 to words).map(i => s"w$i-$id").mkString(" ")
    def randDoc(id: Long) =
      (id, langs(rnd.nextInt(3)), text(id, 1 + rnd.nextInt(8)))
    // model of the upstream table
    var model = Map.empty[Long, (String, String)]
    def commitModel(rows: Seq[(Long, String, String)]): Unit = {
      model = rows.map(r => r._1 -> (r._2, r._3)).toMap
      SnapshotLog.commit(spark, up, rows.toDF("doc_id", "lang", "text"))
    }
    commitModel((0L until 10L).map(randDoc))
    val cfg = CuratePipeline.CurateConfig(
      inputPath = up, outDir = outd, inputLog = true,
      stages = Seq(
        CuratePipeline.Stage("lang_keep", Map("langs" -> "[en, de]")),
        CuratePipeline.Stage("quality", Map("min_tok" -> "4",
          "max_tok" -> "100", "min_ttr_milli" -> "0"))))
    // expected shard set = per-doc stages over the model (pointwise:
    // lang in {en,de} AND >= 4 tokens)
    def expected = model.collect {
      case (id, (lang, txt))
        if Seq("en", "de").contains(lang) &&
          txt.split(" ").length >= 4 => id
    }.toSet
    def drained(): Unit = {
      val adm = if (rnd.nextBoolean()) None else Some(1L + rnd.nextInt(3))
      CuratePipeline.runSubscription(spark, cfg, cur,
        maxVersionsPerPoll = adm.map(_.toLong))
      val got = SnapshotLog.read(spark, outd)
        .select("doc_id").as[Long].collect().toSet
      assert(got === expected,
        s"shards diverge from batch recompute: missing=" +
          s"${expected -- got} extra=${got -- expected} model=$model")
    }
    drained() // bootstrap
    for (step <- 0 until 12) {
      rnd.nextInt(3) match {
        case 0 => // keyed merge: upserts over ids 0..19
          val rows = (0 until 1 + rnd.nextInt(4))
            .map(_ => randDoc(rnd.nextLong(20))).distinctBy(_._1)
          model ++= rows.map(r => r._1 -> (r._2, r._3))
          SnapshotLog.merge(spark, up,
            rows.toDF("doc_id", "lang", "text"), keys = Seq("doc_id"))
        case 1 => // keyed delete of existing ids
          val ks = rnd.shuffle(model.keys.toSeq)
            .take(1 + rnd.nextInt(2)).toSet
          if (ks.nonEmpty) {
            model --= ks
            SnapshotLog.deleteWhere(spark, up,
              col("doc_id").isin(ks.toSeq: _*))
          }
        case 2 => // FULL REPLACE: a new corpus slice entirely
          commitModel((0L until (5L + rnd.nextInt(10)))
            .map(i => randDoc(100 * (step + 1) + i)))
      }
      // drain only sometimes: spans of several upstream versions must
      // collapse correctly through changesBetween's endpoint diff
      if (rnd.nextInt(3) != 0) drained()
    }
    drained() // final catch-up
  }

  test("dedup_image stage: planted re-encode/resize dups drop to one " +
      "canonical; the store-backed second run screens against the " +
      "published corpus; funnel == recounts; replay is a no-op") {
    import graft.dedup.{FingerprintStore, ImageDedup}
    import graft.multimodal.Png
    import spark.implicits._
    def corpus(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.flatMap { id =>
        val base = ImageDedup.testRaster(id, 32, 32)
        val orig = (id * 10, Png.encode(32, 32, 1, base.pixels),
          s"src${id % 2}")
        if (id % 3 != 0) Seq(orig)
        else {
          val jit = base.pixels.zipWithIndex.map { case (p, i) =>
            math.min(255, (p & 0xff) + (i % 32 + i / 32) % 2).toByte
          }
          Seq(orig,
            (id * 10 + 1, Png.encode(32, 32, 1, jit), s"src${id % 2}"),
            (id * 10 + 2,
              Png.encode(16, 16, 1, Png.resizeBox(base, 16, 16).pixels),
              s"src${id % 2}"))
        }
      }.toDF("media_id", "payload", "source")
    val in1 = tmp("curate-img-in1")
    corpus(0L until 12L).write.mode("overwrite").parquet(in1)
    val out1 = tmp("curate-img-out1")
    val log = tmp("curate-img-log")
    val store = tmp("curate-img-store") + "/fps"
    def cfgText(in: String, out: String) =
      s"""curate:
         |  input: $in
         |  out_dir: $out
         |  modality: image
         |  id_col: media_id
         |  log_dir: $log
         |stages:
         |  - stage: dedup_image
         |    max_dist: 6
         |    store_dir: $store
         |""".stripMargin
    val cfg1 = CuratePipeline.parse(
      cfgText(in1, out1).linesIterator.toSeq, "img.yaml")
    val r1 = CuratePipeline.run(spark, cfg1, runId = 1L)
    // every planted trio collapses to its min id; singles survive
    val survivors = spark.read.parquet(out1)
      .select("media_id").as[Long].collect().toSet
    assert(survivors === (0L until 12L).map(_ * 10).toSet,
      s"wrong canonicals: $survivors")
    // funnel == recounts (the zero-extra-pass audit law, image leg)
    val handIn = spark.read.parquet(in1)
    val hand = CuratePipeline.applyStage(spark, handIn,
      cfg1.stages.head, cfg1, runId = 1L)
    assert(r1.stageRows === Seq("s00_input" -> handIn.count(),
      "s01_dedup_image" -> hand.count()))
    assert(r1.logVersion === Some(1L))
    // the store holds exactly the PUBLISHED fingerprints (batch 1)
    assert(FingerprintStore.standing(spark, store, asOfBatch = 2L)
      .select("media_id").distinct().count() === 12L)
    // run 2: a resize of published image 5 (must screen out against the
    // store), an in-batch near-dup pair of fresh 100 (min id wins), and
    // fresh 101
    val in2 = tmp("curate-img-in2")
    val resize5 = Png.encode(16, 16, 1,
      Png.resizeBox(ImageDedup.testRaster(5L, 32, 32), 16, 16).pixels)
    val f100 = ImageDedup.testRaster(100L, 32, 32)
    val jit100 = f100.pixels.zipWithIndex.map { case (p, i) =>
      math.min(255, (p & 0xff) + (i % 32 + i / 32) % 2).toByte
    }
    Seq(
      (9001L, resize5, "src0"),
      (1000L, Png.encode(32, 32, 1, f100.pixels), "src0"),
      (1001L, Png.encode(32, 32, 1, jit100), "src0"),
      (1010L, Png.encode(32, 32, 1,
        ImageDedup.testRaster(101L, 32, 32).pixels), "src1"))
      .toDF("media_id", "payload", "source")
      .write.mode("overwrite").parquet(in2)
    val out2 = tmp("curate-img-out2")
    val cfg2 = CuratePipeline.parse(
      cfgText(in2, out2).linesIterator.toSeq, "img.yaml")
    val r2 = CuratePipeline.run(spark, cfg2, runId = 2L)
    val s2 = spark.read.parquet(out2)
      .select("media_id").as[Long].collect().toSet
    assert(s2 === Set(1000L, 1010L),
      s"run 2: store screen + in-batch election wrong: $s2")
    assert(r2.logVersion === Some(2L))
    // replay of run 2: early return, store unchanged
    val storeSnap = spark.read.parquet(store)
      .select(col("batch_id").cast("long"), col("bucket").cast("long"),
        col("media_id"), col("dhash")).collect().map(_.toSeq).toSet
    val r2b = CuratePipeline.run(spark, cfg2, runId = 2L)
    assert(r2b.finalRows === -1L && r2b.logVersion === Some(2L))
    assert(spark.read.parquet(store)
      .select(col("batch_id").cast("long"), col("bucket").cast("long"),
        col("media_id"), col("dhash")).collect().map(_.toSeq).toSet
      === storeSnap, "replay polluted the fingerprint store")
    // a run id BEHIND the store's newest batch refuses before any
    // append could overwrite newer fingerprints (no log replay guard
    // here: logDir unset, the misuse shape)
    val in3 = tmp("curate-img-in3")
    Seq((3000L, Png.encode(32, 32, 1,
        ImageDedup.testRaster(300L, 32, 32).pixels), "src0"))
      .toDF("media_id", "payload", "source")
      .write.mode("overwrite").parquet(in3)
    val cfg3 = CuratePipeline.parse(
      cfgText(in3, tmp("curate-img-out3")).linesIterator.toSeq,
      "img.yaml").copy(logDir = None)
    val eBehind = intercept[IllegalArgumentException](
      CuratePipeline.run(spark, cfg3, runId = 1L))
    assert(eBehind.getMessage.contains("behind the fingerprint store"),
      eBehind.getMessage)
    assert(spark.read.parquet(store)
      .select(col("batch_id").cast("long"), col("bucket").cast("long"),
        col("media_id"), col("dhash")).collect().map(_.toSeq).toSet
      === storeSnap, "refused run still touched the store")
  }

  test("dedup_image tolerates undecodable payloads: they ride through " +
      "unfingerprinted and never poison the batch") {
    import graft.dedup.ImageDedup
    import graft.multimodal.Png
    import spark.implicits._
    val in = tmp("curate-img-tol")
    val base = ImageDedup.testRaster(1L, 32, 32)
    // a decompression bomb (huge declared raster) must also ride
    // through without any decode allocation
    val bomb = Png.encode(2, 2, 1, Array[Byte](1, 2, 3, 4))
    java.nio.ByteBuffer.wrap(bomb).putInt(16, 60000).putInt(20, 60000)
    Seq(
      (1L, Png.encode(32, 32, 1, base.pixels), "s"),
      (11L, Png.encode(16, 16, 1, Png.resizeBox(base, 16, 16).pixels), "s"),
      (3L, "junk".getBytes("UTF-8"), "s"),
      (4L, bomb, "s"))
      .toDF("media_id", "payload", "source")
      .write.mode("overwrite").parquet(in)
    val out = tmp("curate-img-tol-out")
    val cfg = CuratePipeline.parse(
      s"""curate:
         |  input: $in
         |  out_dir: $out
         |  modality: image
         |  id_col: media_id
         |stages:
         |  - stage: dedup_image
         |    max_dist: 6
         |""".stripMargin.linesIterator.toSeq, "tol.yaml")
    CuratePipeline.run(spark, cfg, runId = 1L)
    val kept = spark.read.parquet(out)
      .select("media_id").as[Long].collect().toSet
    // the near-dup pair elects min id 1; the corrupt and bomb payloads
    // cannot fingerprint and ride through (quality_image is the gate)
    assert(kept === Set(1L, 3L, 4L), s"wrong survivors: $kept")
  }

  test("quality_audio: corrupt, short, low-rate and oversize clips " +
      "drop; survivors ride untouched; modality gates the vocabulary; " +
      "subscription re-gates churned clips") {
    import graft.multimodal.WavPcm
    import spark.implicits._
    def tone(n: Int, rate: Int, ch: Int = 1) = WavPcm.encodePcm16(
      Array.tabulate(n * ch)(i => (i % 32) / 32.0f), rate, ch)
    val rows = Seq(
      (1L, tone(8000, 8000), "s"),        // 1000 ms @ 8k — keeps
      (2L, tone(2000, 8000), "s"),        // 250 ms — under floor
      (3L, "noise".getBytes("UTF-8"), "s"), // not a WAV
      (4L, tone(8000, 4000), "s"),        // 2000 ms but 4 kHz — low rate
      (5L, tone(96000, 8000), "s"))       // 12 s — over ceiling
    val in = tmp("curate-audio-in")
    rows.toDF("media_id", "payload", "source")
      .write.mode("overwrite").parquet(in)
    val out = tmp("curate-audio-out")
    val cfg = CuratePipeline.parse(
      s"""curate:
         |  input: $in
         |  out_dir: $out
         |  modality: audio
         |  id_col: media_id
         |stages:
         |  - stage: quality_audio
         |    min_ms: 500
         |    max_ms: 10000
         |    min_rate: 8000
         |""".stripMargin.linesIterator.toSeq, "aud.yaml")
    CuratePipeline.run(spark, cfg, runId = 1L)
    assert(spark.read.parquet(out).select("media_id").as[Long]
      .collect().toSet === Set(1L), "wrong survivors")
    // survivor bytes are untouched
    assert(spark.read.parquet(out).select("payload")
      .as[Array[Byte]].head.toSeq === rows.head._2.toSeq)
    // modality gates: a text stage refuses under audio, quality_audio
    // refuses under text, dedup_image refuses under audio
    def cfgFor(modality: String, stage: String) = {
      val p = if (stage == "quality_audio") "    min_ms: 500" else ""
      s"""curate:
         |  input: $in
         |  out_dir: $out
         |  modality: $modality
         |stages:
         |  - stage: $stage
         |$p""".stripMargin.linesIterator.toSeq.filter(_.nonEmpty)
    }
    assert(intercept[IllegalArgumentException](CuratePipeline.parse(
      cfgFor("audio", "pii_scrub"), "t.yaml"))
      .getMessage.contains("audio-valid"))
    assert(intercept[IllegalArgumentException](CuratePipeline.parse(
      cfgFor("text", "quality_audio"), "t.yaml"))
      .getMessage.contains("waveform"))
    assert(intercept[IllegalArgumentException](CuratePipeline.parse(
      cfgFor("audio", "dedup_image"), "t.yaml"))
      .getMessage.contains("audio-valid"))
    // subscription: an audio shard table follows upstream churn — a
    // degrade to a sub-floor clip evicts, a good insert publishes
    val root = tmp("curate-audio-sub")
    graft.sources.SnapshotLog.commit(spark, s"$root/up",
      Seq((1L, tone(8000, 8000), "s"), (2L, tone(9000, 8000), "s"))
        .toDF("media_id", "payload", "source"))
    val subCfg = cfg.copy(inputPath = s"$root/up",
      outDir = s"$root/shards", inputLog = true)
    assert(CuratePipeline.runSubscription(spark, subCfg,
      s"$root/cursor").size === 1)
    def shardIds() = graft.sources.SnapshotLog.read(spark, s"$root/shards")
      .select("media_id").as[Long].collect().toSet
    assert(shardIds() === Set(1L, 2L))
    graft.sources.SnapshotLog.merge(spark, s"$root/up",
      Seq((2L, tone(100, 8000), "s"))
        .toDF("media_id", "payload", "source"), Seq("media_id"))
    assert(CuratePipeline.runSubscription(spark, subCfg,
      s"$root/cursor").size === 1)
    assert(shardIds() === Set(1L),
      "degraded clip was not evicted from the shard table")
  }

  test("quality_image: corrupt payloads and under-floor rasters drop, " +
      "oversize payloads cut before decode, survivors ride untouched") {
    import graft.dedup.ImageDedup
    import graft.multimodal.Png
    import spark.implicits._
    val in = tmp("curate-imgq-in")
    def png(id: Long, w: Int, h: Int) =
      Png.encode(w, h, 1, ImageDedup.testRaster(id, w, h).pixels)
    // decompression bomb: a tiny stream whose IHDR declares a huge
    // raster — the header admission must drop it BEFORE any decode
    // allocation (the patched dims break the IHDR CRC too, but the
    // gate never gets that far)
    val bomb = png(7, 2, 2)
    java.nio.ByteBuffer.wrap(bomb).putInt(16, 60000).putInt(20, 60000)
    Seq(
      (1L, png(1, 32, 32), "src0"),              // keeps
      (2L, png(2, 8, 32), "src0"),               // under min_w
      (3L, png(3, 32, 8), "src0"),               // under min_h
      (4L, "not a png".getBytes("UTF-8"), "src0"), // corrupt
      (5L, png(5, 16, 16), "src1"),              // keeps (at floor)
      (6L, png(6, 32, 32).take(20), "src1"),     // truncated stream
      (7L, bomb, "src1"))                        // over-ceiling header
      .toDF("media_id", "payload", "source")
      .write.mode("overwrite").parquet(in)
    val out = tmp("curate-imgq-out")
    val cfg = CuratePipeline.parse(
      s"""curate:
         |  input: $in
         |  out_dir: $out
         |  modality: image
         |  id_col: media_id
         |stages:
         |  - stage: quality_image
         |    min_w: 16
         |    min_h: 16
         |""".stripMargin.linesIterator.toSeq, "imgq.yaml")
    val r = CuratePipeline.run(spark, cfg)
    val kept = spark.read.parquet(out)
    assert(kept.select("media_id").as[Long].collect().toSet
      === Set(1L, 5L), "wrong quality survivors")
    assert(kept.columns.toSet === Set("media_id", "payload", "source"),
      "columns must ride through the gate")
    assert(r.stageRows === Seq("s00_input" -> 7L,
      "s01_quality_image" -> 2L))
    // max_bytes cuts BEFORE decode: the 32x32 image exceeds the cap
    val out2 = tmp("curate-imgq-out2")
    val cfg2 = CuratePipeline.parse(
      s"""curate:
         |  input: $in
         |  out_dir: $out2
         |  modality: image
         |  id_col: media_id
         |stages:
         |  - stage: quality_image
         |    min_w: 16
         |    min_h: 16
         |    max_bytes: ${png(5, 16, 16).length}
         |""".stripMargin.linesIterator.toSeq, "imgq.yaml")
    CuratePipeline.run(spark, cfg2)
    assert(spark.read.parquet(out2).select("media_id").as[Long]
      .collect().toSet === Set(5L))
    // text modality refuses the stage at load
    val e = intercept[IllegalArgumentException](
      CuratePipeline.parse(goodConfig.replace("OUT", "/tmp/x")
        .concat("  - stage: quality_image\n    min_w: 1\n    min_h: 1\n")
        .linesIterator.toSeq, "t.yaml"))
    assert(e.getMessage.contains("modality: image"))
  }

  test("modality gates the stage vocabulary at load; image configs " +
      "refuse runStream/runSubscription") {
    def bad(text: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](
        CuratePipeline.parse(text.linesIterator.toSeq, "t.yaml"))
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    // dedup_image without modality: image
    bad(goodConfig.replace("OUT", "/tmp/x") +
      "  - stage: dedup_image\n", "modality: image")
    val imgCfg =
      """curate:
        |  input: /tmp/in
        |  out_dir: /tmp/out
        |  modality: image
        |stages:
        |  - stage: dedup_image
        |""".stripMargin
    // a text stage over an image corpus
    bad(imgCfg.replace("- stage: dedup_image",
      "- stage: quality\n    min_tok: 1\n    max_tok: 9\n" +
        "    min_ttr_milli: 0"), "reads text")
    // modality typo; a raster stage over an audio corpus; over-radius
    // max_dist
    bad(imgCfg.replace("modality: image", "modality: video"),
      "must be text, image or audio")
    bad(imgCfg.replace("modality: image", "modality: audio"),
      "audio-valid")
    bad(imgCfg.replace("- stage: dedup_image",
      "- stage: dedup_image\n    max_dist: 9"), "max_dist must be in")
    // image runStream supports the per-batch stages only: a quota over
    // a stream slice would judge the slice, not the corpus
    val quotaCfg = CuratePipeline.parse(imgCfg
      .replace("- stage: dedup_image",
        "- stage: source_quota\n    per_source: 3")
      .linesIterator.toSeq, "t.yaml")
    val e1 = intercept[IllegalArgumentException](
      CuratePipeline.runStream(spark, quotaCfg,
        spark.readStream.format("rate").load(), tmp("img-ckpt")))
    assert(e1.getMessage.contains("not streamable"))
    // and the subscription engine stays per-doc only
    val parsed = CuratePipeline.parse(imgCfg.linesIterator.toSeq, "t.yaml")
    val e2 = intercept[IllegalArgumentException](
      CuratePipeline.runSubscription(spark,
        parsed.copy(inputLog = true), tmp("img-cur") + "/c"))
    assert(e2.getMessage.contains("ImageDedupStream"))
  }

  test("runStream over an IMAGE feed: per-batch gate + store-screened " +
      "dedup + replay-idempotent snapshot publish; wire-up drains a " +
      "memory stream") {
    import graft.dedup.{FingerprintStore, ImageDedup}
    import graft.multimodal.Png
    import spark.implicits._
    def png(id: Long, w: Int = 32, h: Int = 32, resized: Boolean = false) = {
      val base = ImageDedup.testRaster(id, 32, 32)
      if (resized) Png.encode(16, 16, 1, Png.resizeBox(base, 16, 16).pixels)
      else Png.encode(w, h, 1, ImageDedup.testRaster(id, w, h).pixels)
    }
    val root = tmp("curate-imgstream")
    val outd = s"$root/table"; val store = s"$root/fps"
    val cfg = CuratePipeline.CurateConfig(
      inputPath = "unused", outDir = outd,
      idCol = "media_id", modality = "image",
      stages = Seq(
        CuratePipeline.Stage("quality_image",
          Map("min_w" -> "16", "min_h" -> "16")),
        CuratePipeline.Stage("dedup_image",
          Map("max_dist" -> "6", "store_dir" -> store))))
    // batch 0: good 1, undersized 2, in-batch dup pair 3/4 (4 = resize
    // of 3 — only min id 3 survives)
    val b0 = Seq((1L, png(1)), (2L, png(2, 8, 8)),
      (3L, png(3)), (4L, png(3, resized = true)))
      .toDF("media_id", "payload")
    assert(CuratePipeline.runImageBatch(spark, b0, 0L, cfg) === 2L)
    def published() = SnapshotLog.read(spark, outd)
      .select("media_id").as[Long].collect().toSet
    assert(published() === Set(1L, 3L))
    // batch 1: re-ingest of published 1 (store screen drops), fresh 6
    val b1 = Seq((5L, png(1, resized = true)), (6L, png(6)))
      .toDF("media_id", "payload")
    assert(CuratePipeline.runImageBatch(spark, b1, 1L, cfg) === 1L)
    assert(published() === Set(1L, 3L, 6L))
    // at-least-once replay of batch 1: table version count and store
    // content both unchanged
    val nV = SnapshotLog.versions(spark, outd).size
    val storeSnap = spark.read.parquet(store)
      .select(col("batch_id").cast("long"), col("bucket").cast("long"),
        col("media_id"), col("dhash")).collect().map(_.toSeq).toSet
    CuratePipeline.runImageBatch(spark, b1, 1L, cfg)
    assert(SnapshotLog.versions(spark, outd).size === nV,
      "replayed stream batch stacked a table version")
    assert(spark.read.parquet(store)
      .select(col("batch_id").cast("long"), col("bucket").cast("long"),
        col("media_id"), col("dhash")).collect().map(_.toSeq).toSet
      === storeSnap, "replayed stream batch changed the store")
    assert(published() === Set(1L, 3L, 6L))
    // the streaming wire-up drives the same body
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val root2 = tmp("curate-imgstream2")
    val cfg2 = cfg.copy(outDir = s"$root2/table",
      stages = Seq(
        CuratePipeline.Stage("quality_image",
          Map("min_w" -> "16", "min_h" -> "16")),
        CuratePipeline.Stage("dedup_image",
          Map("max_dist" -> "6", "store_dir" -> s"$root2/fps"))))
    val q = CuratePipeline.runStream(spark, cfg2,
      ms.toDF.toDF("media_id", "payload"), s"$root2/ckpt")
    try {
      ms.addData(Seq(1L -> png(1), 2L -> png(2, 8, 8)))
      q.processAllAvailable()
      ms.addData(Seq(5L -> png(1, resized = true), 6L -> png(6)))
      q.processAllAvailable()
    } finally q.stop()
    assert(SnapshotLog.read(spark, cfg2.outDir)
      .select("media_id").as[Long].collect().toSet === Set(1L, 6L))
  }

  test("pii_scrub: emails, IPs and number runs redact; clean text untouched") {
    import spark.implicits._
    val cfg = CuratePipeline.CurateConfig(inputPath = "unused",
      outDir = "unused")
    val st = CuratePipeline.Stage("pii_scrub", Map.empty)
    val docs = Seq(
      (1L, "contact me at jane.doe+x@example.co.uk for details"),
      (2L, "server at 10.0.255.7 responded"),
      (3L, "call +1 (555) 123-4567 now or 555 867 5309"),
      (4L, "plain text with a year 2024 and a price of 99 stays"),
      (5L, "no pii here at all")).toDF("doc_id", "text")
    val out = CuratePipeline.applyStage(spark, docs, st, cfg)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "contact me at <EMAIL> for details")
    assert(out(2L) === "server at <IP> responded")
    assert(out(3L) === "call <NUM> now or <NUM>")
    assert(out(4L) === "plain text with a year 2024 and a price of 99 stays")
    assert(out(5L) === "no pii here at all")
  }

  test("expect publish gate: passing checks publish + report; failing checks quarantine") {
    val out = tmp("curate-out-exp")
    val log = tmp("curate-log-exp")
    val passCfg = cfgWith(out, log = Some(log)).copy(expect = Seq(
      Expectations.NotNull("text"),
      Expectations.Unique(Seq("doc_id")),
      Expectations.MinRows(10)))
    val r = CuratePipeline.run(spark, passCfg, runId = 1L)
    assert(r.logVersion === Some(1L))
    assert(r.expectations.length === 3 && r.expectations.forall(_._3))

    val out2 = tmp("curate-out-exp2")
    val log2 = tmp("curate-log-exp2")
    val failCfg = cfgWith(out2, log = Some(log2)).copy(expect = Seq(
      Expectations.AcceptedValues("lang", Seq("zz")))) // everything violates
    val e = intercept[IllegalStateException] {
      CuratePipeline.run(spark, failCfg, runId = 1L)
    }
    assert(e.getMessage.contains("NOT published"))
    // quarantine: shards exist, log has NO version
    assert(new java.io.File(out2).listFiles()
      .exists(_.getName.startsWith("part-")))
    assert(graft.sources.SnapshotLog.versions(spark, log2).isEmpty)
  }

  test("ridden gate == dedicated-pass verdicts, with no extra read of the output") {
    // count completed actions whose plan SCANS the output dir — the
    // zero-extra-pass claim, held accountable at the execution layer
    val out = tmp("curate-out-ride")
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (qe.executedPlan.toString.contains(out)) { reads.incrementAndGet(); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // all-ridable expect set: not_null + in-range + min_rows + predicate
      val cfg = cfgWith(out).copy(expect = Seq(
        Expectations.NotNull("text"),
        Expectations.MinRows(5),
        Expectations.Predicate("nonempty", length(col("text")) > 0)))
      val r = CuratePipeline.run(spark, cfg, runId = 1L)
      assert(r.expectations.map(_._1) === Seq("not_null(text)",
        "min_rows(5)", "predicate(nonempty)"), "declaration order preserved")
      // verdict equivalence: the ridden counts == a dedicated pass
      val dedicated = Expectations.run(spark.read.parquet(out), cfg.expect)
        .collect().map(x => (x.getString(0), x.getLong(1), x.getBoolean(2)))
      Thread.sleep(500) // drain async QueryExecutionListener events
      assert(r.expectations === dedicated.toSeq)
      // the dedicated pass above is OURS (1 plan reading out, plus its
      // parquet schema-infer read); the pipeline itself contributed NONE
      assert(reads.get() <= 2,
        s"publish gate re-read the output: ${reads.get()} scans of $out")
    } finally spark.listenerManager.unregister(listener)
  }

  test("mixed gate: table-shaped checks still pay exactly one dedicated pass") {
    val out = tmp("curate-out-mix")
    val cfg = cfgWith(out).copy(expect = Seq(
      Expectations.NotNull("text"),          // rides the write
      Expectations.Unique(Seq("doc_id")),    // distinct-shaped: dedicated
      Expectations.MinRows(5)))              // rides the write
    val r = CuratePipeline.run(spark, cfg, runId = 1L)
    assert(r.expectations.map(_._1) === Seq("not_null(text)",
      "unique(doc_id)", "min_rows(5)"))
    assert(r.expectations.forall(_._3))
    val dedicated = Expectations.run(spark.read.parquet(out), cfg.expect)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getBoolean(2)))
    assert(r.expectations === dedicated.toSeq)
  }

  test("partition_by: hive-layout shards, published table prunes by slice") {
    import spark.implicits._
    val out = tmp("curate-out-part")
    val log = tmp("curate-log-part")
    val cfg = cfgWith(out, log = Some(log)).copy(
      partitionBy = Seq("lang"),
      expect = Seq(Expectations.NotNull("lang")))
    val r = CuratePipeline.run(spark, cfg, runId = 1L)
    assert(r.logVersion === Some(1L))
    assert(r.expectations.forall(_._3),
      "a partition column must not validate as NULL (basePath read)")
    // the shards landed under lang=… dirs
    assert(new java.io.File(out).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("lang=")))
    // the published version declares the layout; reads re-attach lang
    assert(SnapshotLog.partitionColsOf(spark, log, 1L) === Seq("lang"))
    val full = SnapshotLog.read(spark, log)
    assert(full.columns.contains("lang") && full.count() === r.finalRows)
    // manifest-grain slice prune, exact content
    val (en, scanned, total) =
      SnapshotLog.readPartition(spark, log, Map("lang" -> "en"))
    assert(scanned < total, s"slice prune scanned $scanned/$total")
    assert(en.count() === full.filter(col("lang") === "en").count())
    // equivalence with the unpartitioned run, content-wise
    val out2 = tmp("curate-out-flat")
    val flat = CuratePipeline.run(spark,
      cfgWith(out2).copy(partitionBy = Seq.empty), runId = 0L)
    assert(flat.finalRows === r.finalRows)
    // config text round trip + load-time validation of the key shape
    val cfgText = goodConfig.replace("OUT", tmp("x"))
      .replace("stages:", "  partition_by: [lang]\nstages:")
    assert(CuratePipeline.parse(cfgText.linesIterator.toSeq, "t.yaml")
      .partitionBy === Seq("lang"))
    // an absent partition column fails at RUN, named loudly
    val bad = cfgWith(tmp("curate-out-badpart"))
      .copy(partitionBy = Seq("nope"))
    val e = intercept[IllegalArgumentException] {
      CuratePipeline.run(spark, bad, runId = 1L)
    }
    assert(e.getMessage.contains("partition_by column 'nope'"))
  }

  test("input_log + input_filter: the run reads a manifest-pruned slice of a snapshot table") {
    import spark.implicits._
    // publish a lang-partitioned snapshot table, then re-curate ONE
    // slice of it through the config surface — the 100 TB reality
    val tableDir = tmp("curate-src-log") + "/tbl"
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    SnapshotLog.commitPartitioned(spark, tableDir, docs, Seq("lang"))
    val out = tmp("curate-slice-out")
    val cfgText =
      s"""curate:
         |  input: $tableDir
         |  input_log: true
         |  input_filter: "lang IN ('en')"
         |  out_dir: $out
         |stages:
         |  - stage: dedup_exact
         |""".stripMargin
    val cfg = CuratePipeline.parse(cfgText.linesIterator.toSeq, "slice.yaml")
    assert(cfg.inputLog && cfg.inputFilter === Some("lang IN ('en')"))
    val report = CuratePipeline.run(spark, cfg)
    // the input funnel row counts ONLY the slice
    val enDocs = docs.filter(col("lang") === "en")
    assert(report.stageRows.head._2 === enDocs.count())
    val got = spark.read.parquet(out)
    assert(got.select("lang").distinct().as[String].collect().toSeq ===
      Seq("en"))
    // and the slice read itself pruned at manifest grain (the partition
    // tuple skip the pipeline is riding)
    val (_, scanned, total) =
      SnapshotLog.readFilterSql(spark, tableDir, "lang IN ('en')")
    assert(scanned < total, s"slice read scanned $scanned/$total")
    // same filter against plain parquet still works (ordinary pushdown)
    val out2 = tmp("curate-slice-out2")
    val cfg2 = CuratePipeline.parse(
      s"""curate:
         |  input: $Sf/documents.parquet
         |  input_filter: "lang IN ('en')"
         |  out_dir: $out2
         |stages:
         |  - stage: dedup_exact
         |""".stripMargin.linesIterator.toSeq, "slice2.yaml")
    val report2 = CuratePipeline.run(spark, cfg2)
    assert(report2.stageRows.head._2 === enDocs.count())
    // a predicate typo fails at LOAD, naming the line
    val bad = intercept[IllegalArgumentException] {
      CuratePipeline.parse(
        s"""curate:
           |  input: $Sf/documents.parquet
           |  input_filter: "lang IIN ('en'"
           |  out_dir: $out2
           |stages:
           |  - stage: dedup_exact
           |""".stripMargin.linesIterator.toSeq, "bad.yaml")
    }
    assert(bad.getMessage.contains("input_filter"))
  }

  test("persist_checks installs row-scalar expectations as table CHECKs") {
    import spark.implicits._
    val out = tmp("curate-out-pc")
    val log = tmp("curate-log-pc")
    val cfg = cfgWith(out, log = Some(log)).copy(
      expect = Seq(Expectations.NotNull("text"),
        Expectations.MinRows(1)), // table-shaped: must NOT become a CHECK
      persistChecks = true)
    CuratePipeline.run(spark, cfg, runId = 1L)
    val checksNow = graft.sources.SnapshotLog.checksOf(spark, log,
      graft.sources.SnapshotLog.versions(spark, log).last)
    assert(checksNow.map(_._1) === Seq("not_null(text)"),
      s"row-scalar bridged, table-shaped skipped; got $checksNow")
    // the table boundary now refuses ANY writer violating the contract,
    // not just this pipeline
    val bad = intercept[IllegalArgumentException] {
      graft.sources.SnapshotLog.commitBatch(spark, log,
        Seq((99L, null: String)).toDF("doc_id", "text"), batchId = 50L)
    }
    assert(bad.getMessage.contains("not_null"))
    // a second run never duplicates the installed checks
    CuratePipeline.run(spark, cfg.copy(outDir = tmp("curate-out-pc2")),
      runId = 2L)
    assert(graft.sources.SnapshotLog.checksOf(spark, log,
      graft.sources.SnapshotLog.versions(spark, log).last)
      .map(_._1) === Seq("not_null(text)"))
  }

  test("expect section parses from config text; unknown check fails at load") {
    val text = goodConfig.replace("OUT", "/tmp/x") +
      "expect:\n" +
      "  - check: not_null\n    col: text\n" +
      "  - check: accepted_values\n    col: lang\n    values: [en, de]\n" +
      "  - check: in_range\n    col: n_chars\n    lo: 0\n    hi: 100000\n" +
      "  - check: min_rows\n    n: 5\n" +
      "  - check: unique\n    col: doc_id\n" +
      "  - check: predicate\n    label: chars_pos\n    sql: n_chars > 0\n"
    val cfg = CuratePipeline.parse(text.linesIterator.toSeq, "t.yaml")
    assert(cfg.expect.map(_.name) === Seq("not_null(text)",
      "accepted_values(lang)", "in_range(n_chars)", "min_rows(5)",
      "unique(doc_id)", "predicate(chars_pos)"))
    val ep = intercept[IllegalArgumentException] {
      CuratePipeline.parse((goodConfig.replace("OUT", "/tmp/x") +
        "expect:\n  - check: predicate\n    label: x\n    sql: ((broken\n")
        .linesIterator.toSeq, "t.yaml")
    }
    assert(ep.getMessage.contains("unparseable predicate"))
    assert(!cfg.persistChecks)
    // persist_checks is a curate-root key, not an expect-item key
    def withRoot(v: String) =
      text.replace("  out_dir:", s"  persist_checks: $v\n  out_dir:")
    assert(CuratePipeline.parse(withRoot("true").linesIterator.toSeq,
      "t.yaml").persistChecks)
    val eb = intercept[IllegalArgumentException] {
      CuratePipeline.parse(withRoot("yes").linesIterator.toSeq, "t.yaml")
    }
    assert(eb.getMessage.contains("persist_checks"))
    val e = intercept[IllegalArgumentException] {
      CuratePipeline.parse((goodConfig.replace("OUT", "/tmp/x") +
        "expect:\n  - check: exactly_one\n").linesIterator.toSeq, "t.yaml")
    }
    assert(e.getMessage.contains("unknown check"))
    val e2 = intercept[IllegalArgumentException] {
      CuratePipeline.parse((goodConfig.replace("OUT", "/tmp/x") +
        "expect:\n  - check: in_range\n    col: x\n    lo: 0\n").linesIterator.toSeq, "t.yaml")
    }
    assert(e2.getMessage.contains("requires 'hi'"))
  }

  test("config mistakes fail at load, with the offending line") {
    def bad(mutate: String => String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        CuratePipeline.parse(mutate(goodConfig).linesIterator.toSeq, "t.yaml")
      }
      assert(e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    bad(_.replace("- stage: dedup_exact", "- stage: dedup_exactly"),
      "unknown stage")
    bad(_.replace("    min_tok: 20\n", ""), "requires parameter 'min_tok'")
    bad(_.replace("min_tok: 20", "min_tok: twenty"), "must be an integer")
    bad(_.replace("    per_source: 8", "    per_source: 8\n    extra: 1"),
      "does not take parameter")
    bad(_.replace("  input: ", "  in_put: "), "unknown key")
    bad(_.replace("curate:\n", ""), "key before 'curate:' root")
    // decontaminate without eval_path
    bad(_ + "  - stage: decontaminate\n", "requires parameter 'eval_path'")
  }

  test("log_dir colliding with out_dir is rejected at load") {
    val e = intercept[IllegalArgumentException] {
      CuratePipeline.parse(
        goodConfig.replace("OUT", "/tmp/x")
          .replace("stages:", "  log_dir: /tmp/x\nstages:")
          .linesIterator.toSeq, "t.yaml")
    }
    assert(e.getMessage.contains("log_dir must differ"))
  }

  test("pack_audit stage: reports the q_seq_pack audit at its pipeline position, transforms nothing") {
    val out = tmp("curate-pack")
    val config =
      s"""curate:
         |  input: $Sf/documents.parquet
         |  out_dir: $out
         |stages:
         |  - stage: lang_keep
         |    langs: [en, de]
         |  - stage: pack_audit
         |    seq_tokens: 128
         |  - stage: source_quota
         |    per_source: 8
         |  - stage: pack_audit
         |    seq_tokens: 128
         |""".stripMargin
    val cfg = CuratePipeline.parse(config.linesIterator.toSeq, "t.yaml")
    val report = CuratePipeline.run(spark, cfg)

    // the audit stage is a REPORT: the funnel skips it and the row
    // counts are untouched by it
    assert(report.stageRows.map(_._1) ===
      Seq("s00_input", "s01_lang_keep", "s03_source_quota"))
    assert(report.packAudit.map(_._1) ===
      Seq("s02_pack_audit", "s04_pack_audit"))

    // each audit equals the library call over the hand-composed frame
    // AT THAT POSITION (they differ — that's the point of positioning)
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val afterLang = CuratePipeline.applyStage(spark, docs,
      cfg.stages.head, cfg)
    val afterQuota = CuratePipeline.applyStage(spark, afterLang,
      cfg.stages(2), cfg)
    def statsOf(df: org.apache.spark.sql.DataFrame) =
      CuratePipeline.packAudit(df, "source", "doc_id", "text", 128)
        .collect().toSeq.map(r => CuratePipeline.PackStat(r.getString(0),
          r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))
    assert(report.packAudit.head._2 === statsOf(afterLang))
    assert(report.packAudit(1)._2 === statsOf(afterQuota))
    assert(report.packAudit.head._2 !== report.packAudit(1)._2)

    // the written output is the transform-only composition
    assert(spark.read.parquet(out).count() === afterQuota.count())

    // q_seq_pack delegates to the same helper: identical output shape
    val q = ops.OlapStatOps.seqPack.fn(spark, Sf)
    assert(q.columns.toSeq === Seq("source", "n_docs", "total_tokens",
      "n_seqs", "n_straddlers", "pad_tokens"))

    // config validation: seq_tokens required and integer
    intercept[IllegalArgumentException] {
      CuratePipeline.parse(config.replace("    seq_tokens: 128\n", "")
        .linesIterator.toSeq, "t.yaml")
    }
  }
}
