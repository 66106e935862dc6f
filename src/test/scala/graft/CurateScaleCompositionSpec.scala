package graft

import graft.sources.SnapshotLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The curation twin of [[CdcScaleCompositionSpec]]: the FULL text-stage
  * vocabulary composed in ONE config at sf0.1 volume (5,000 docs, the
  * bench corpus) — lang gate, quality floors, all four dedup grains
  * (exact, simhash, MinHash-LSH Jaccard, sidecar SemDeDup with partial
  * embedding coverage), decontamination against an eval slice, PII
  * scrub, per-source quota, token budget, chunk re-grain, hive-
  * partitioned snapshot publish with expectations — proving the stages
  * COMPOSE at bench scale, not just pass unit specs in isolation. The
  * sidecar deliberately covers only doc ids 0..1999 of 5,000: the
  * ride-through path runs at volume. Replays of the finished run are
  * no-ops (the log guard), and the published table prunes by the
  * partition column at manifest grain.
  */
class CurateScaleCompositionSpec extends AnyFunSuite with SparkFixture {

  private val SfDir = "/root/testdata/sf0.1"

  test("sf0.1 composition: every text stage in one run — funnel sane, " +
      "decontaminated eval grams gone, publish prunes by lang, replay " +
      "is a no-op") {
    val root = Files.createTempDirectory("curate-comp").toString
    val evalDir = s"$root/eval"
    val out = s"$root/out"
    val log = s"$root/log"
    // eval slice: 20 real docs — decontaminate must drop (at least)
    // every doc sharing a 6-gram with them, including themselves
    spark.read.parquet(s"$SfDir/documents.parquet")
      .filter(col("doc_id") % 250 === 0)
      .select("doc_id", "text")
      .write.mode("overwrite").parquet(evalDir)
    val cfg = CuratePipeline.parse(
      s"""curate:
         |  input: $SfDir/documents.parquet
         |  out_dir: $out
         |  log_dir: $log
         |  partition_by: [lang]
         |stages:
         |  - stage: lang_keep
         |    langs: [en, de, fr]
         |  - stage: quality
         |    min_tok: 5
         |    max_tok: 100000
         |    min_ttr_milli: 100
         |  - stage: dedup_exact
         |  - stage: dedup_near
         |  - stage: dedup_jaccard
         |    threshold_milli: 700
         |    shingle: 4
         |  - stage: dedup_semantic
         |    tau_milli: 350
         |    clusters: 20
         |    embed_path: $SfDir/embeddings.parquet
         |    embed_key: vec_id
         |  - stage: decontaminate
         |    eval_path: $evalDir
         |    gram: 6
         |  - stage: decontaminate_fuzzy
         |    eval_path: $evalDir
         |    threshold_milli: 600
         |  - stage: pii_scrub
         |  - stage: source_quota
         |    per_source: 200
         |  - stage: token_budget
         |    per_source_tokens: 20000
         |  - stage: chunk
         |    chunk_tokens: 64
         |    stride_tokens: 48
         |expect:
         |  - check: not_null
         |    col: doc_id
         |  - check: unique
         |    col: doc_id
         |  - check: min_rows
         |    n: 100
         |""".stripMargin.linesIterator.toSeq, "comp.yaml")
    val t0 = System.nanoTime()
    val report = CuratePipeline.run(spark, cfg, runId = 1L)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"sf0.1 full-vocabulary run: $secs%.1f s, " +
      s"funnel ${report.stageRows.map(_._2).mkString(" -> ")}")

    // funnel sanity: input is the full corpus; every dedup/gate stage
    // only removes; chunk (the one re-grain) may add; nothing empties
    val byTag = report.stageRows.toMap
    assert(byTag("s00_input") === 5000L)
    val preChunk = report.stageRows.dropRight(1)
    assert(preChunk.map(_._2).sliding(2).forall(p => p(1) <= p(0)),
      s"a filter stage ADDED rows: ${report.stageRows}")
    assert(preChunk.last._2 > 100L, "the funnel emptied before chunk")
    assert(byTag("s12_chunk") >= preChunk.last._2,
      "chunk re-grain lost documents")
    // each dedup grain did real work at this volume
    for (st <- Seq("s03_dedup_exact", "s04_dedup_near",
        "s05_dedup_jaccard", "s06_dedup_semantic"))
      assert(byTag.contains(st), s"missing funnel row $st")
    assert(byTag("s05_dedup_jaccard") < byTag("s04_dedup_near"),
      "MinHash-LSH dedup dropped nothing at sf0.1")
    assert(byTag("s06_dedup_semantic") < byTag("s05_dedup_jaccard"),
      "semantic dedup dropped nothing at sf0.1")
    // expectations all passed and published
    assert(report.expectations.forall(_._3),
      s"publish gate failed: ${report.expectations}")
    val v1 = report.logVersion.getOrElse(fail("no published version"))

    // decontamination law: no published chunk contains an eval 6-gram
    val evalGrams = spark.read.parquet(evalDir)
      .select(explode(expr(
        """transform(sequence(1, greatest(size(split(text, ' ')) - 5, 0)),
          |  i -> concat_ws(' ', slice(split(text, ' '), i, 6)))"""
          .stripMargin)).as("g"))
      .distinct().collect().map(_.getString(0)).toSet
    val leaked = SnapshotLog.read(spark, log)
      .select(explode(expr(
        """transform(sequence(1, greatest(size(split(text, ' ')) - 5, 0)),
          |  i -> concat_ws(' ', slice(split(text, ' '), i, 6)))"""
          .stripMargin)).as("g"))
      .filter(col("g").isInCollection(evalGrams.take(500)))
      .count()
    assert(leaked === 0L, s"$leaked eval 6-grams leaked past decontaminate")

    // hive partition pruning: a lang slice reads only its files
    val (slice, kept, total) =
      SnapshotLog.readFilterSql(spark, log, "lang = 'de'")
    assert(slice.filter(col("lang") =!= "de").isEmpty)
    assert(kept < total,
      s"lang slice did not prune at manifest grain ($kept of $total)")

    // replay of the finished run is a no-op returning the same version
    val replay = CuratePipeline.run(spark, cfg, runId = 1L)
    assert(replay.logVersion === Some(v1), "replay re-published")
    assert(SnapshotLog.versions(spark, log).last === v1,
      "replay added a version")
  }
}
