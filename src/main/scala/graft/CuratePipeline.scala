package graft

import graft.sources.SnapshotLog
import graft.streaming.CurateStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Config-driven CURATION pipeline — the LLM-data twin of the CDC
  * [[Pipeline]]: a scheduled "crawl slice in, training shard out" run
  * declared in the same dependency-free YAML subset [[ConfigFile]]
  * parses, composing the engine's curation operators in a user-chosen
  * order:
  *
  * {{{
  * curate:
  *   input: /data/crawl/slice42      # parquet documents table
  *   modality: image                 # optional (default text): an IMAGE
  *                                   #   corpus curates by a binary
  *                                   #   payload column; the stage
  *                                   #   vocabulary narrows to the
  *                                   #   raster-valid stages (dedup_image,
  *                                   #   dedup_exact, source_quota) and
  *                                   #   text stages refuse at load
  *   payload_col: payload            # optional (default payload): the
  *                                   #   image-modality binary column
  *   input_log: true                 # optional: input is a snapshot-log
  *                                   #   TABLE (latest version, DV-applied)
  *   input_filter: "lang IN ('en') AND quality IS NOT NULL"
  *                                   # optional: SQL slice predicate —
  *                                   #   against a snapshot log it prunes
  *                                   #   at MANIFEST grain (readFilterSql);
  *                                   #   against parquet, a pushed filter
  *   out_dir: /data/train/slice42
  *   id_col: doc_id                  # optional (default doc_id)
  *   text_col: text                  # optional (default text)
  *   log_dir: /data/train/_log      # optional: atomic SnapshotLog publish
  *   persist_checks: true            # optional: install row-scalar expect
  *                                   #   rules as table CHECK constraints,
  *                                   #   so the published table refuses ANY
  *                                   #   writer violating the contract
  *   shards: 8                       # optional: hash-sharded output
  *   partition_by: [lang]            # optional: hive-layout shards; the
  *                                   #   published snapshot-log version
  *                                   #   records the layout + per-file
  *                                   #   tuples, so readPartition prunes
  *                                   #   the training table by slice
  * stages:
  *   - stage: lang_keep
  *     langs: [en, de]
  *   - stage: quality                # token-count band + TTR floor
  *     min_tok: 20
  *     max_tok: 400
  *     min_ttr_milli: 300            # integer milli-units — no float cfg
  *   - stage: dedup_exact            # min-id election per md5(text)
  *   - stage: dedup_near             # min-id election per simhash64
  *   - stage: dedup_jaccard          # MinHash-LSH + exact-Jaccard verify,
  *     threshold_milli: 800          #   component closure, min-id canonical
  *     shingle: 4                    #   (optional, default 4)
  *   - stage: dedup_semantic         # SemDeDup: k-means-blocked cosine,
  *     tau_milli: 950                #   drop iff a lower-id cluster-mate
  *     clusters: 64                  #   has cosine >= tau; clusters is
  *     embed_col: embedding          #   the scale knob (optional:
  *     embed_path: /data/embs        #   embed_col, iters, max_list_size;
  *     embed_key: vec_id             #   embed_path/embed_key join a
  *                                   #   sidecar embedding table — docs
  *                                   #   with no sidecar row ride through;
  *                                   #   quantizer_path INSTEAD of
  *                                   #   clusters loads a frozen Maintain
  *                                   #   train-quantizer artifact — also
  *                                   #   the streaming form via runStream)
  *   - stage: pii_scrub              # email/IP/number-run redaction
  *   - stage: chunk                  # re-grain into fixed-token chunks
  *     chunk_tokens: 64
  *     stride_tokens: 48             # optional: overlapping windows
  *                                   #   (new chunk every stride tokens)
  *   - stage: decontaminate          # drop docs sharing an n-gram w/ eval
  *     eval_path: /data/benchmarks
  *     gram: 4
  *   - stage: decontaminate_fuzzy    # NEAR-dup decontamination: drop
  *     eval_path: /data/benchmarks   #   docs whose Jaccard to any eval
  *     threshold_milli: 700          #   doc clears the threshold (the
  *     shingle: 4                    #   lightly-edited-leak catcher;
  *                                   #   optional bands/num_hashes tune
  *                                   #   LSH recall, default 8x2)
  *   - stage: source_quota           # keep first N docs per source
  *     per_source: 100
  *   - stage: token_budget           # greedy per-source token-budget fill
  *     per_source_tokens: 5000
  *   - stage: quality_image          # image modality only: decodable
  *     min_w: 16                     #   payloads within dimension
  *     min_h: 16                     #   floors (corrupt rasters drop
  *     max_bytes: 1048576            #   here, never reaching dedup)
  *   - stage: quality_audio          # audio modality only: PCM-WAV
  *     min_ms: 500                   #   parse + duration floor/ceiling
  *     min_rate: 8000                #   and sample-rate floor, all from
  *     max_bytes: 10485760           #   the chunk walk alone
  *   - stage: dedup_image            # image modality only: perceptual
  *     max_dist: 6                   #   near-dup election (dHash + banded
  *     store_dir: /data/fps          #   Hamming); optional store_dir also
  *                                   #   screens against the persisted
  *                                   #   standing corpus and appends the
  *                                   #   published run's fingerprints
  * expect:                            # publish gate: the OUTPUT must pass
  *   - check: not_null                #   every declared expectation or the
  *     col: text                      #   snapshot-log version is never
  *   - check: unique                  #   committed (shards stay on disk
  *     col: doc_id                    #   for debugging, unpublished)
  *   - check: min_rows
  *     n: 100
  *   - check: predicate               # arbitrary single-line SQL row rule
  *     label: chars_positive          #   (NULL counts as a violation in
  *     sql: n_chars > 0               #   the gate; as a persisted table
  *                                    #   CHECK it follows SQL NULL-passes)
  * }}}
  *
  * Execution model — why this composes well at 100 TB:
  *  - Stages build ONE lazy plan. Filter-shaped stages (lang_keep,
  *    quality) fuse into the input scan under Catalyst — a 6-stage
  *    config does not mean 6 passes.
  *  - Both dedup elections are key-partitioned windows (md5 / simhash
  *    keys — never partition-less), the same min-id survivor rule as
  *    [[graft.streaming.CurateStream]]'s batch election.
  *  - decontaminate broadcasts the DISTINCT'd eval gram set and
  *    anti-joins map-side (the [[graft.ops.GovernOps]] asymmetric-join
  *    shape) — the corpus side never shuffles.
  *  - source_quota is one window partitioned by source, doc-id ordered —
  *    the deterministic cut line.
  *  - Per-stage audit counts ride the single output write via
  *    `Dataset.observe` (the `Observation` listener API — the write-side
  *    twin of [[graft.sources.Observe]]): the funnel report costs ZERO
  *    extra passes — where a naive per-stage count() would re-scan the
  *    corpus once per stage.
  *  - With `log_dir` the written shard files are committed BY REFERENCE
  *    as one atomic [[SnapshotLog]] version stamped `#batch=runId`
  *    (commitBatchExternal): downstream trainers switch snapshots
  *    atomically, replays of a finished run are no-ops, and old slices
  *    time-travel until vacuumed.
  */
object CuratePipeline {

  final case class Stage(name: String, params: Map[String, String])

  final case class CurateConfig(
      inputPath: String,
      outDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      logDir: Option[String] = None,
      shards: Option[Int] = None,
      partitionBy: Seq[String] = Seq.empty,
      stages: Seq[Stage] = Seq.empty,
      expect: Seq[Expectations.Check] = Seq.empty,
      persistChecks: Boolean = false,
      // input_log: true reads `input` as a snapshot-log TABLE (latest
      // version, DV-applied); input_filter is a SQL predicate applied
      // before stage 1 — against a snapshot log it plans through
      // readFilterSql, so the slice prunes at MANIFEST grain (zone
      // maps, IN-lists, null flags, partition tuples) before any
      // footer opens; against plain parquet it is an ordinary pushed
      // filter. The 100 TB re-curation reality: runs slice by
      // lang/source/quality band, never full-table.
      inputLog: Boolean = false,
      inputFilter: Option[String] = None,
      // modality: "text" (default) curates by textCol; "image" curates
      // by payloadCol (a binary raster column) and narrows the stage
      // vocabulary to the raster-valid stages — a text stage over an
      // image corpus (or vice versa) is a config error, caught at load
      modality: String = "text",
      payloadCol: String = "payload")

  /** Per-run report: the stage funnel (ordered, first entry = raw input)
    * and, when publishing through a snapshot log, the committed
    * version. `packAudit` carries the sequence-packing audit of every
    * `pack_audit` stage: (stageTag, per-source packing rows). */
  final case class CurateReport(
      stageRows: Seq[(String, Long)],
      finalRows: Long,
      logVersion: Option[Long],
      expectations: Seq[(String, Long, Boolean)] = Seq.empty,
      packAudit: Seq[(String, Seq[PackStat])] = Seq.empty)

  /** One source's row of the sequence-packing audit (the q_seq_pack
    * shape): how `nDocs`/`totalTokens` concatenate-and-chop into
    * `seqTokens`-sized training sequences — `nStraddlers` docs cross a
    * chop boundary (attention-mask leakage candidates), `padTokens`
    * fill the final sequence. */
  final case class PackStat(source: String, nDocs: Long, totalTokens: Long,
      nSeqs: Long, nStraddlers: Long, padTokens: Long)

  // ------------------------------------------------------------------
  // config
  // ------------------------------------------------------------------

  def load(path: String): CurateConfig =
    parse(Files.readAllLines(Paths.get(path)).asScala.toSeq, path)

  private val StageKeys: Map[String, (Set[String], Set[String])] = Map(
    // name -> (required params, optional params)
    "lang_keep" -> ((Set("langs"), Set.empty[String])),
    "quality" -> ((Set("min_tok", "max_tok", "min_ttr_milli"),
      Set.empty[String])),
    "dedup_exact" -> ((Set.empty[String], Set.empty[String])),
    "dedup_near" -> ((Set.empty[String], Set.empty[String])),
    "dedup_jaccard" -> ((Set("threshold_milli"), Set("shingle"))),
    "dedup_semantic" -> ((Set("tau_milli"),
      Set("clusters", "embed_col", "iters", "max_list_size",
        "embed_path", "embed_key", "quantizer_path"))),
    "chunk" -> ((Set("chunk_tokens"), Set("stride_tokens"))),
    "decontaminate" -> ((Set("eval_path"), Set("gram"))),
    "decontaminate_fuzzy" -> ((Set("eval_path", "threshold_milli"),
      Set("shingle", "bands", "num_hashes"))),
    "pii_scrub" -> ((Set.empty[String], Set.empty[String])),
    "source_quota" -> ((Set("per_source"), Set.empty[String])),
    "token_budget" -> ((Set("per_source_tokens"), Set.empty[String])),
    "pack_audit" -> ((Set("seq_tokens"), Set.empty[String])),
    "dedup_image" -> ((Set.empty[String], Set("max_dist", "store_dir"))),
    "quality_image" -> ((Set("min_w", "min_h"),
      Set("max_bytes", "max_w", "max_h"))),
    "quality_audio" -> ((Set("min_ms"),
      Set("max_bytes", "max_ms", "min_rate"))))

  /** Stages valid over an IMAGE corpus (modality: image): the raster
    * quality gate and dedup leg, byte-exact dedup (md5 of the payload),
    * and the modality-agnostic per-source quota and embedding dedup
    * (SemDeDup's original domain WAS image embeddings — the stage reads
    * embed_col, never the payload). Everything else reads textCol and
    * refuses at load. */
  private val ImageStages =
    Set("quality_image", "dedup_image", "dedup_exact", "source_quota",
      "dedup_semantic")

  /** Stages that DECODE the binary payload — meaningless over text, so
    * a text-modality config declaring one refuses at load. */
  private val ImageOnlyStages = Set("quality_image", "dedup_image")

  /** Stages valid over an AUDIO corpus (modality: audio): the waveform
    * quality gate, byte-exact dedup, the per-source quota, and
    * embedding dedup over an audio-embedding column. No perceptual
    * audio fingerprint ships yet (dHash is raster geometry), so
    * near-dedup at waveform grain is dedup_semantic's job. */
  private val AudioStages =
    Set("quality_audio", "dedup_exact", "source_quota", "dedup_semantic")

  private val AudioOnlyStages = Set("quality_audio")

  private[graft] def parse(rawLines: Seq[String],
      where: String): CurateConfig = {
    def fail(i: Int, msg: String): Nothing =
      throw new IllegalArgumentException(s"$where:${i + 1}: $msg")

    def stripComment(s: String): String = {
      var q: Char = 0; val out = new StringBuilder; var done = false
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

    val lines = rawLines.map(stripComment)
    val root = scala.collection.mutable.LinkedHashMap[String, (Int, String)]()
    val stages = scala.collection.mutable.ArrayBuffer[
      (Int, scala.collection.mutable.LinkedHashMap[String, (Int, String)])]()
    val expects = scala.collection.mutable.ArrayBuffer[
      (Int, scala.collection.mutable.LinkedHashMap[String, (Int, String)])]()
    var section: String = "" // "", "curate", "stages", "expect"

    def addPair(li: Int, kv: String,
        into: scala.collection.mutable.LinkedHashMap[String, (Int, String)])
        : Unit = {
      val idx = kv.indexOf(':')
      if (idx <= 0) fail(li, s"expected 'key: value', got '$kv'")
      val k = kv.substring(0, idx).trim
      val v = kv.substring(idx + 1).trim
      if (v.isEmpty) fail(li, s"'$k' has no value")
      if (into.contains(k)) fail(li, s"duplicate key '$k'")
      into += k -> ((li, v))
    }

    lines.zipWithIndex.foreach { case (line, i) =>
      val t = line.trim
      if (t.nonEmpty) {
        if (t == "curate:") {
          if (section.nonEmpty) fail(i, "'curate:' must come first, once")
          section = "curate"
        } else if (t == "stages:") {
          if (section != "curate") fail(i, "'stages:' must follow 'curate:'")
          section = "stages"
        } else if (t == "expect:") {
          if (section != "stages") fail(i, "'expect:' must follow 'stages:'")
          section = "expect"
        } else if (t.startsWith("- ")) {
          if (section != "stages" && section != "expect")
            fail(i, "list item outside 'stages:'/'expect:'")
          val target = if (section == "stages") stages else expects
          target += ((i, scala.collection.mutable.LinkedHashMap()))
          val rest = t.drop(2).trim
          if (rest.nonEmpty) addPair(i, rest, target.last._2)
        } else if (t.contains(":")) {
          section match {
            case "curate" => addPair(i, t, root)
            case "stages" =>
              if (stages.isEmpty) fail(i, s"key outside a '- stage:' item: '$t'")
              addPair(i, t, stages.last._2)
            case "expect" =>
              if (expects.isEmpty) fail(i, s"key outside a '- check:' item: '$t'")
              addPair(i, t, expects.last._2)
            case _ => fail(i, s"key before 'curate:' root: '$t'")
          }
        } else fail(i, s"unparseable line: '$t'")
      }
    }
    if (section.isEmpty) fail(0, "missing 'curate:' root")

    val knownRoot = Set("input", "out_dir", "id_col", "text_col",
      "log_dir", "shards", "persist_checks", "partition_by",
      "input_log", "input_filter", "modality", "payload_col")
    root.foreach { case (k, (li, _)) =>
      if (!knownRoot(k)) fail(li,
        s"unknown key '$k' (known: ${knownRoot.toSeq.sorted.mkString(", ")})")
    }
    def req(k: String): String = unquote(root.getOrElse(k,
      fail(0, s"missing required key '$k' under curate:"))._2)
    def opt(k: String): Option[String] =
      root.get(k).map { case (_, v) => unquote(v) }
    def intOf(li: Int, k: String, v: String): Int =
      try v.toInt
      catch { case _: NumberFormatException =>
        fail(li, s"'$k' must be an integer, got '$v'") }

    val parsedStages = stages.toSeq.map { case (itemLine, m) =>
      val (nameLi, nameV) = m.getOrElse("stage",
        fail(itemLine, "stage item missing 'stage: <name>'"))
      val name = unquote(nameV)
      val (required, optional) = StageKeys.getOrElse(name,
        fail(nameLi, s"unknown stage '$name' " +
          s"(known: ${StageKeys.keys.toSeq.sorted.mkString(", ")})"))
      val params = m.toMap - "stage"
      params.foreach { case (k, (li, _)) =>
        if (!required(k) && !optional(k))
          fail(li, s"stage '$name' does not take parameter '$k'")
      }
      required.foreach { k =>
        if (!params.contains(k))
          fail(itemLine, s"stage '$name' requires parameter '$k'")
      }
      // integer params validate at LOAD — a typo must fail before the
      // run has mutated the output directory
      params.foreach { case (k, (li, v)) =>
        if (Set("min_tok", "max_tok", "min_ttr_milli", "gram",
            "per_source", "threshold_milli", "shingle", "chunk_tokens",
            "per_source_tokens", "max_dist", "min_w", "min_h",
            "max_bytes", "stride_tokens", "max_w", "max_h",
            "tau_milli", "clusters", "iters", "max_list_size",
            "bands", "num_hashes", "min_ms", "max_ms", "min_rate")(k)) {
          intOf(li, k, unquote(v)); ()
        }
      }
      params.get("max_dist").foreach { case (li, v) =>
        val d = intOf(li, "max_dist", unquote(v))
        // the 8×8-band store/join layout guarantees recall only to 7 —
        // a larger radius must re-shard, not silently lose recall
        if (d < 0 || d > 7)
          fail(li, s"max_dist must be in [0, 7] (the 8-band layout's " +
            s"exact-recall radius), got $d")
      }
      if (name == "decontaminate_fuzzy") {
        val nh = params.get("num_hashes")
          .map { case (li, v) => intOf(li, "num_hashes", unquote(v)) }
          .getOrElse(16)
        val nb = params.get("bands")
          .map { case (li, v) => intOf(li, "bands", unquote(v)) }
          .getOrElse(8)
        if (nb < 1 || nh < 1 || nh % nb != 0)
          fail(nameLi, s"decontaminate_fuzzy: bands ($nb) must divide " +
            s"num_hashes ($nh) — the signature slices into equal bands")
      }
      if (name == "dedup_semantic") {
        // the quantizer comes from exactly ONE place: clusters trains
        // in-run; quantizer_path loads a frozen artifact (the Maintain
        // train-quantizer output). Neither → no quantizer; both →
        // ambiguous which one judges.
        if (params.contains("clusters") == params.contains("quantizer_path"))
          fail(nameLi, "dedup_semantic needs exactly one of 'clusters' " +
            "(train in-run) or 'quantizer_path' (frozen artifact)")
        params.get("tau_milli").foreach { case (li, v) =>
          val t = intOf(li, "tau_milli", unquote(v))
          // τ ≤ 0 marks EVERYTHING in a cluster as duplicate (cosine of
          // unrelated vectors hovers near 0) — always a config mistake
          if (t <= 0 || t > 1000)
            fail(li, s"tau_milli must be in (0, 1000] (cosine in " +
              s"milli-units), got $t")
        }
        params.get("clusters").foreach { case (li, v) =>
          if (intOf(li, "clusters", unquote(v)) < 1)
            fail(li, "clusters must be >= 1")
        }
        params.get("iters").foreach { case (li, v) =>
          if (intOf(li, "iters", unquote(v)) < 1)
            fail(li, "iters must be >= 1")
        }
        params.get("max_list_size").foreach { case (li, v) =>
          if (intOf(li, "max_list_size", unquote(v)) < 0)
            fail(li, "max_list_size must be >= 0 (0 = no hot-list split)")
        }
      }
      Stage(name, params.map { case (k, (_, v)) => k -> unquote(v) })
    }
    if (parsedStages.isEmpty) fail(0, "config declares no stages")
    // modality gates the stage vocabulary at LOAD: a text stage would
    // read textCol off an image corpus (and dedup_image would decode
    // text bytes as a raster) — both are config mistakes, not run-time
    // surprises
    val modality = root.get("modality").map { case (li, v) =>
      val m = unquote(v)
      if (m != "text" && m != "image" && m != "audio")
        fail(li, s"modality must be text, image or audio, got '$m'")
      m
    }.getOrElse("text")
    stages.toSeq.zip(parsedStages).foreach { case ((itemLine, _), st) =>
      if (modality == "image" && !ImageStages(st.name))
        fail(itemLine, s"stage '${st.name}' reads text — an image-" +
          s"modality run supports ${ImageStages.toSeq.sorted.mkString(", ")}")
      if (modality == "audio" && !AudioStages(st.name))
        fail(itemLine, s"stage '${st.name}' is not audio-valid — an " +
          s"audio-modality run supports " +
          s"${AudioStages.toSeq.sorted.mkString(", ")}")
      if (modality != "image" && ImageOnlyStages(st.name))
        fail(itemLine,
          s"stage '${st.name}' decodes a binary raster payload — " +
            "declare 'modality: image' (and payload_col if not " +
            "'payload') under curate:")
      if (modality != "audio" && AudioOnlyStages(st.name))
        fail(itemLine,
          s"stage '${st.name}' decodes a binary waveform payload — " +
            "declare 'modality: audio' (and payload_col if not " +
            "'payload') under curate:")
    }

    val shards = root.get("shards").map { case (li, v) =>
      val n = intOf(li, "shards", unquote(v))
      if (n < 1) fail(li, s"shards must be >= 1, got $n")
      n
    }
    val outDir = req("out_dir")
    val logDir = opt("log_dir")
    if (logDir.contains(outDir))
      fail(0, "log_dir must differ from out_dir (manifests would " +
        "interleave with shard files)")
    def parseList2(i: Int, v: String): Seq[String] = {
      val t = v.trim
      if (!(t.startsWith("[") && t.endsWith("]")))
        fail(i, s"expected an inline [a, b] list, got '$v'")
      val body = t.substring(1, t.length - 1).trim
      if (body.isEmpty) fail(i, "empty list")
      body.split(",").map(unquote).map(_.trim).toSeq
    }
    val parsedChecks: Seq[Expectations.Check] =
      expects.toSeq.map { case (itemLine, m) =>
        val (kindLi, kindV) = m.getOrElse("check",
          fail(itemLine, "expect item missing 'check: <kind>'"))
        def p(k: String): (Int, String) = m.getOrElse(k,
          fail(itemLine, s"check '${unquote(kindV)}' requires '$k'"))
        def pv(k: String): String = unquote(p(k)._2)
        unquote(kindV) match {
          case "not_null" => Expectations.NotNull(pv("col"))
          case "unique" => Expectations.Unique(Seq(pv("col")))
          case "accepted_values" =>
            Expectations.AcceptedValues(pv("col"),
              { val (li, v) = p("values"); parseList2(li, v) })
          case "in_range" =>
            Expectations.InRange(pv("col"),
              intOf(p("lo")._1, "lo", pv("lo")).toDouble,
              intOf(p("hi")._1, "hi", pv("hi")).toDouble)
          case "min_rows" =>
            Expectations.MinRows(intOf(p("n")._1, "n", pv("n")).toLong)
          case "predicate" =>
            // arbitrary single-line SQL row rule; parse errors surface at
            // load time (expr throws), not at run time
            val sqlText = pv("sql")
            val colP = org.apache.spark.sql.functions.expr(sqlText)
            // functions.expr defers parsing to analysis time (Spark 4's
            // connect-compatible Column nodes) — force it NOW so a typo
            // fails at config load, naming the line, not mid-run
            try org.apache.spark.sql.graftshim.ColumnBridge.sqlOf(colP)
            catch {
              case e: Exception =>
                fail(p("sql")._1, s"unparseable predicate '$sqlText': " +
                  e.getMessage)
            }
            Expectations.Predicate(pv("label"), colP)
          case other => fail(kindLi, s"unknown check '$other' (known: " +
            "accepted_values, in_range, min_rows, not_null, predicate, " +
            "unique)")
        }
      }
    // partition_by: [lang] or a single bare column — the published
    // table's hive layout (the training-data reality: slices are read
    // per lang/source; the snapshot log prunes them at manifest grain)
    val partitionBy = root.get("partition_by").map { case (li, v) =>
      val t = unquote(v)
      if (t.trim.startsWith("[")) parseList2(li, t) else Seq(t.trim)
    }.getOrElse(Seq.empty)
    CurateConfig(
      inputPath = req("input"),
      outDir = outDir,
      idCol = opt("id_col").getOrElse("doc_id"),
      textCol = opt("text_col").getOrElse("text"),
      logDir = logDir,
      shards = shards,
      partitionBy = partitionBy,
      stages = parsedStages,
      expect = parsedChecks,
      persistChecks = opt("persist_checks") match {
        case None          => false
        case Some("true")  => true
        case Some("false") => false
        case Some(other) =>
          fail(0, s"persist_checks must be true/false, got '$other'")
      },
      inputLog = opt("input_log") match {
        case None          => false
        case Some("true")  => true
        case Some("false") => false
        case Some(other) =>
          fail(0, s"input_log must be true/false, got '$other'")
      },
      inputFilter = root.get("input_filter").map { case (li, v) =>
        val sql = unquote(v)
        // parse NOW so a predicate typo fails at config load, naming
        // the line, not mid-run (the expect-block discipline)
        try {
          org.apache.spark.sql.graftshim.ColumnBridge.sqlOf(
            org.apache.spark.sql.functions.expr(sql))
        } catch {
          case e: Exception =>
            fail(li, s"unparseable input_filter '$sql': ${e.getMessage}")
        }
        sql
      },
      modality = modality,
      payloadCol = opt("payload_col").getOrElse("payload"))
  }

  // ------------------------------------------------------------------
  // stages
  // ------------------------------------------------------------------

  /** One TOLERANT fingerprint pass over (id, payload): dims-admitted
    * (IHDR read only — a decompression bomb's declared raster never
    * allocates) and decodable payloads emit (media_id, dhash); corrupt
    * or over-ceiling payloads emit nothing. Shared by the dedup_image
    * stage and both store-append sites, so an undecodable payload that
    * rode through the stage can never poison the append either. */
  private def tolerantFps(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val s2 = df.sparkSession
    import s2.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, png) =>
        scala.util.Try {
          val (w, h) = graft.multimodal.Png.dims(png)
          require(w <= 16384 && h <= 16384) // bomb: never allocate
          (id, graft.dedup.ImageDedup.dHash64(
            graft.multimodal.Png.decode(png)))
        }.toOption
      }.toDF("media_id", "dhash")
  }

  /** Minimum-id survivor election per `key` — the engine's one dedup
    * rule (CurateStream / Components / exact dedup all use it):
    * deterministic under any partitioning, key-partitioned window. */
  private def electMin(df: DataFrame, key: org.apache.spark.sql.Column,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  private[graft] def applyStage(spark: SparkSession, df: DataFrame,
      st: Stage, cfg: CurateConfig, runId: Long = 0L): DataFrame =
    st.name match {
    case "lang_keep" =>
      df.filter(col("lang").isin(parseLangs(st.params("langs")): _*))
    case "quality" =>
      CurateStream.qualityGate(df, CurateStream.Config(
        idCol = cfg.idCol, textCol = cfg.textCol,
        minTok = st.params("min_tok").toInt,
        maxTok = st.params("max_tok").toInt,
        minTtr = st.params("min_ttr_milli").toInt / 1000.0))
    case "dedup_exact" =>
      // byte-exact election: over an image corpus the key is the raw
      // payload's md5 (re-uploads of identical bytes), over text the
      // text's — same min-id survivor rule either way
      val key = if (cfg.modality == "image") md5(col(cfg.payloadCol))
                else md5(col(cfg.textCol))
      electMin(df, key, cfg.idCol)
    case "quality_image" =>
      // per-image quality gate, the raster twin of the text `quality`
      // stage: keep payloads that DECODE (a crawl slice's truncated /
      // corrupt rasters must never reach dedup — a fingerprint of
      // garbage is garbage) and meet the declared dimension floors;
      // max_bytes cuts oversize payloads as a pure pushed filter before
      // any decode. Admission order is cheapest-first: byte cap
      // (pushed), then the IHDR header alone ([[graft.multimodal.Png
      // .dims]] — 8 bytes, no inflate) decides floors AND the dimension
      // CEILING (max_w/max_h, default 16384), so a decompression bomb
      // (tiny stream declaring a huge raster) is rejected before any
      // raster allocation and an undersized thumbnail never pays a full
      // decode just to be dropped; only header-admitted payloads pay
      // the integrity decode. Per-partition map, no UDF, no shuffle;
      // the verdict joins back left-semi on id so every other column
      // rides through untouched.
      require(df.columns.contains(cfg.payloadCol),
        s"quality_image needs binary column '${cfg.payloadCol}' " +
          s"(have ${df.columns.mkString(",")})")
      val minW = st.params("min_w").toInt
      val minH = st.params("min_h").toInt
      val maxW = st.params.get("max_w").map(_.toInt).getOrElse(16384)
      val maxH = st.params.get("max_h").map(_.toInt).getOrElse(16384)
      val sized = st.params.get("max_bytes").map(_.toLong)
        .fold(df)(b => df.filter(length(col(cfg.payloadCol)) <= b))
      val s2 = df.sparkSession
      import s2.implicits._
      val decodable = sized
        .select(col(cfg.idCol).cast("long"), col(cfg.payloadCol))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, png) =>
          scala.util.Try(graft.multimodal.Png.dims(png)).toOption
            .filter { case (w, h) =>
              w >= minW && h >= minH && w <= maxW && h <= maxH
            }
            .flatMap(_ =>
              scala.util.Try(graft.multimodal.Png.decode(png)).toOption)
            .map(_ => id)
        }.toDF(cfg.idCol)
      sized.join(decodable, Seq(cfg.idCol), "left_semi")
    case "quality_audio" =>
      // per-clip quality gate, the waveform twin of quality_image: keep
      // payloads that parse as PCM WAV and meet the declared duration
      // floor (optional ceiling and sample-rate floor). Admission order
      // is cheapest-first: byte cap (pushed filter), then the chunk
      // walk ALONE ([[graft.multimodal.WavPcm.info]] — fmt + data
      // size, no sample allocation) decides everything. Unlike PNG
      // there is no second integrity pass: PCM carries no checksums or
      // compressed stream, so the chunk walk IS the full structural
      // validation, and nFrames counts bytes actually present
      // (truncation clamped) — a hostile declared size cannot fake
      // duration. Per-partition map, no UDF, no shuffle; verdict joins
      // back left-semi so every other column rides through untouched.
      require(df.columns.contains(cfg.payloadCol),
        s"quality_audio needs binary column '${cfg.payloadCol}' " +
          s"(have ${df.columns.mkString(",")})")
      val minMs = st.params("min_ms").toLong
      val maxMs = st.params.get("max_ms").map(_.toLong)
        .getOrElse(Long.MaxValue)
      val minRate = st.params.get("min_rate").map(_.toInt).getOrElse(1)
      val sizedA = st.params.get("max_bytes").map(_.toLong)
        .fold(df)(b => df.filter(length(col(cfg.payloadCol)) <= b))
      val s3 = df.sparkSession
      import s3.implicits._
      val admissible = sizedA
        .select(col(cfg.idCol).cast("long"), col(cfg.payloadCol))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, wav) =>
          scala.util.Try(graft.multimodal.WavPcm.info(wav)).toOption
            .filter { case (_, rate, _, frames) =>
              val ms = frames * 1000L / rate
              rate >= minRate && ms >= minMs && ms <= maxMs
            }
            .map(_ => id)
        }.toDF(cfg.idCol)
      sizedA.join(admissible, Seq(cfg.idCol), "left_semi")
    case "dedup_image" =>
      // the raster leg as a declarable stage: (1) with store_dir, screen
      // the batch against the PERSISTED standing corpus first — an image
      // near a published fingerprint (Hamming <= max_dist) drops, the
      // FingerprintStore incremental-ingest gate; (2) elect one
      // canonical (min id) per in-batch near-dup component AMONG THE
      // SCREEN SURVIVORS — banded Hamming pairs (exact recall <= 7,
      // never all-pairs), transitive closure, exactly dedup_jaccard's
      // shape at raster grain. The published run's fingerprints append
      // to the store AFTER the publish gate (see run()), so a failed
      // gate never pollutes the standing corpus.
      //
      // Decode discipline: fingerprints compute in ONE tolerant
      // per-partition pass, eagerly materialized (16 bytes/row) so the
      // screen's touched-bucket collect, the accept join and the
      // in-batch pairing all reuse it — never a second decode of the
      // payloads. Tolerant: a payload whose IHDR exceeds the decoder
      // ceiling or that fails to decode CANNOT be fingerprinted — it
      // rides through un-deduplicated rather than poisoning the batch
      // (a crawl slice always contains some corrupt bytes; gate them
      // out with quality_image — this stage's contract is dedup, and
      // silently DROPPING undecodables here would make dedup also a
      // quality gate nobody declared).
      require(df.columns.contains(cfg.payloadCol),
        s"dedup_image needs binary column '${cfg.payloadCol}' " +
          s"(have ${df.columns.mkString(",")})")
      val maxDist = st.params.get("max_dist").map(_.toInt).getOrElse(6)
      val fps = tolerantFps(df, cfg.idCol, cfg.payloadCol)
        .localCheckpoint(true) // decode ONCE; three consumers below
      val storeRejected = st.params.get("store_dir") match {
        case Some(sd) =>
          graft.dedup.FingerprintStore
            .screen(spark, sd, fps, asOfBatch = runId, maxDist = maxDist)
            .filter(!col("accept")).select(col("media_id"))
        case None => fps.select("media_id").limit(0)
      }
      val screenedFps =
        fps.join(storeRejected, Seq("media_id"), "left_anti")
      val pairs = graft.dedup.SimHash.bandedHammingPairs(
        screenedFps, "media_id", "dhash", maxDist, bands = 8)
      val comps = graft.dedup.Components.connectedComponents(
        graft.dedup.Components.symmetrize(pairs, "id_a", "id_b"))
      val losers = comps.filter(col("id") =!= col("comp")).select("id")
      val rejected = storeRejected
        .unionByName(losers.select(col("id").as("media_id")))
      df.join(rejected, df(cfg.idCol) === rejected("media_id"),
        "left_anti")
    case "dedup_near" =>
      electMin(df,
        graft.functions.HashExprs.simHash64(split(col(cfg.textCol), " ")),
        cfg.idCol)
    case "dedup_jaccard" =>
      // the production-grade near dedup: MinHash-LSH candidate pairs
      // verified by exact Jaccard, transitively closed, one canonical
      // (min id) elected per component — everything else drops. Pairs /
      // components run over (id, text) only; the anti-join brings the
      // verdict back to the full row.
      val lshCfg = graft.dedup.MinHashLsh.Config(
        shingleSize = st.params.get("shingle").map(_.toInt).getOrElse(4),
        threshold = st.params("threshold_milli").toInt / 1000.0)
      val pairs = graft.dedup.MinHashLsh.nearDuplicates(
        df, cfg.idCol, cfg.textCol, lshCfg)
      val comps = graft.dedup.Components.connectedComponents(
        graft.dedup.Components.symmetrize(pairs, "id_a", "id_b"))
      val losers = comps.filter(col("id") =!= col("comp")).select("id")
      df.join(losers, df(cfg.idCol) === losers("id"), "left_anti")
    case "dedup_semantic" =>
      // SemDeDup (Abbas et al. 2023) as config surface: "these two
      // documents say the same thing in different words" — k-means
      // coarse quantizer, cosine compares ONLY within a cluster, a
      // vector drops iff a LOWER-id cluster-mate lies within τ. The
      // quantizer seeds from pmod(xxhash64(id), clusters) — `clusters`
      // is the declared SCALE KNOB (k grows with the corpus so clusters
      // stay constant-sized; the per-cluster pair stage is the
      // quadratic term the caller bounds), deterministic with no RNG
      // and no dependence on any label column the corpus may not have.
      // Modality-agnostic: reads embed_col (array<float>), never
      // textCol or the payload — SemDeDup's original domain was image
      // embeddings. Optional max_list_size splits hot lists to the
      // FIXPOINT: every cluster ends within the bound except
      // exact-duplicate clumps no plane can cut.
      //
      // embed_path: the realistic sidecar shape — embeddings computed
      // by a separate job into their own table, keyed by `embed_key`
      // (default: the corpus id column). The sidecar equi-joins on, the
      // stage judges, and the embedding column never reaches the
      // output. A doc with NO sidecar row rides through
      // un-deduplicated, the image leg's tolerant convention: this
      // stage's contract is dedup, and silently dropping
      // not-yet-embedded docs would make it an embedding-coverage gate
      // nobody declared.
      val embCol = st.params.getOrElse("embed_col", "embedding")
      val frame = st.params.get("embed_path") match {
        case Some(p) =>
          require(!df.columns.contains(embCol),
            s"dedup_semantic: the corpus already has '$embCol' AND " +
              "embed_path is set — ambiguous; drop one of them")
          val key = st.params.getOrElse("embed_key", cfg.idCol)
          val sidecar = spark.read.parquet(p)
          require(sidecar.columns.contains(key) &&
            sidecar.columns.contains(embCol),
            s"dedup_semantic: sidecar $p needs columns '$key' and " +
              s"'$embCol' (have ${sidecar.columns.mkString(",")}) — " +
              "set embed_key/embed_col to its spelling")
          df.join(sidecar.select(col(key).as(cfg.idCol), col(embCol)),
            Seq(cfg.idCol), "left")
        case None =>
          require(df.columns.contains(embCol),
            s"dedup_semantic needs embedding column '$embCol' " +
              s"(have ${df.columns.mkString(",")}) — set embed_col if " +
              "the corpus spells it differently, or embed_path if " +
              "embeddings live in a sidecar table")
          df
      }
      val judgeable = frame.filter(col(embCol).isNotNull)
      val tauMicro = st.params("tau_milli").toLong * 1000L
      val maxList =
        st.params.get("max_list_size").map(_.toInt).getOrElse(0)
      // config-declared bounds run to the split FIXPOINT: a stage that
      // promises max_list_size must deliver it even when one halving
      // round is not enough (adversarial blob corpora)
      val verdicts = st.params.get("quantizer_path") match {
        case Some(qp) =>
          // frozen artifact (Maintain train-quantizer): daily batch
          // verdicts stay stable across runs, the same reason the
          // incremental/streaming paths freeze theirs
          val cents = spark.read.parquet(qp)
          require(Seq("list_id", "centroid")
              .forall(cents.columns.contains),
            s"dedup_semantic: quantizer $qp needs columns " +
              s"(list_id, centroid), have ${cents.columns.mkString(",")}")
          graft.dedup.SemDedup.verdictsWith(judgeable, cents,
            cfg.idCol, embCol, tauMicro, maxList, splitRounds = 16)
        case None =>
          val k = st.params("clusters").toLong
          graft.dedup.SemDedup.verdicts(
            judgeable.withColumn("__seed",
              pmod(xxhash64(col(cfg.idCol)), lit(k))),
            cfg.idCol, embCol, "__seed", tauMicro,
            iters = st.params.get("iters").map(_.toInt).getOrElse(2),
            maxListSize = maxList, splitRounds = 16)
            .drop("__seed")
      }
      // ONE anti-join of the dup ids against the ORIGINAL frame: docs
      // without an embedding are never in the dup set so they ride
      // through, the sidecar column never touches the output, and the
      // (possibly sidecar-joined) frame is evaluated exactly once —
      // a null-split + union formulation would pay the join twice
      val dropped = verdicts.filter(col("is_dup"))
        .select(col(cfg.idCol).as("__dup_id"))
      df.join(dropped, df(cfg.idCol) === col("__dup_id"), "left_anti")
    case "chunk" =>
      // re-grain documents into fixed-size token chunks (the
      // tokenize-and-pack ingest shape): text becomes the chunk, id
      // becomes doc_id * 100000 + chunk_ix (ids stay unique while a
      // doc has < 100000 chunks — 2M-token docs at 20-token chunks;
      // longer docs should chunk upstream), all other columns ride
      // along. Optional stride_tokens < chunk_tokens makes the windows
      // OVERLAP (the q_chunk_docs sliding-context shape a retrieval
      // ingest feeds from): a new chunk starts every stride tokens,
      // n_starts = ceil(max(n_tok − chunk, 0)/stride) + 1, so every
      // token is covered and consecutive chunks share chunk − stride
      // tokens. Default stride = chunk_tokens (non-overlapping, token-
      // conserving). Map-side only — one explode, no shuffle.
      val n = st.params("chunk_tokens").toInt
      require(n >= 1, s"chunk_tokens must be >= 1, got $n")
      val stride = st.params.get("stride_tokens").map(_.toInt).getOrElse(n)
      require(stride >= 1 && stride <= n,
        s"stride_tokens must be in [1, chunk_tokens=$n], got $stride")
      val others = df.columns.toSeq
        .filterNot(c => c == cfg.idCol || c == cfg.textCol)
      // the id scheme (doc_id*100000 + ix) holds only while a doc
      // yields < 100000 windows; past that, ids silently collide
      // across documents and corrupt every id-keyed consumer. Guard the
      // sequence UPPER BOUND (once per doc, not per chunk): the explode
      // determines the row count, so even a fully column-pruned count()
      // must evaluate it — the guard cannot be optimized away.
      df.withColumn("__toks", split(col(cfg.textCol), " "))
        .withColumn("__hi",
          expr(s"(greatest(size(__toks) - $n, 0) + ${stride - 1}) " +
            s"div $stride"))
        .withColumn("__ix", explode(sequence(lit(0L),
          expr("IF(__hi < 100000, __hi, raise_error(" +
            s"concat('chunk: document ', CAST(${cfg.idCol} AS STRING), " +
            "' yields >= 100000 windows at chunk_tokens/stride_tokens " +
            s"= $n/$stride — chunk ids (doc_id*100000+ix) would " +
            "collide across documents; re-grain upstream or raise " +
            "the stride')))"))))
        .select(
          (col(cfg.idCol) * 100000L + col("__ix")).as(cfg.idCol) +:
          array_join(
            expr(s"slice(__toks, int(__ix) * $stride + 1, $n)"), " ")
            .as(cfg.textCol) +:
          others.map(col): _*)
    case "token_budget" =>
      // greedy per-source prefix fill: order docs by id within source,
      // keep while the running token total fits the budget — the
      // q_token_budget policy as a pipeline stage. ONE window shuffle
      // partitioned by source.
      val budget = st.params("per_source_tokens").toInt
      val w = Window.partitionBy("source").orderBy(col(cfg.idCol))
      df.withColumn("__n", size(split(col(cfg.textCol), " ")))
        .withColumn("__cum", sum("__n").over(w))
        .filter(col("__cum") <= budget)
        .drop("__n", "__cum")
    case "decontaminate" =>
      val scfg = CurateStream.Config(idCol = cfg.idCol,
        textCol = cfg.textCol,
        decontGram = st.params.get("gram").map(_.toInt).getOrElse(4))
      val eval = spark.read.parquet(st.params("eval_path"))
      CurateStream.decontGate(df, CurateStream.evalGramSet(eval, scfg), scfg)
    case "decontaminate_fuzzy" =>
      // NEAR-dup decontamination: drop docs whose n-gram Jaccard to any
      // eval doc clears the threshold — catches the lightly-edited eval
      // leaks exact-gram `decontaminate` misses (a benchmark answer with
      // three words swapped shares almost no exact n-gram but ~0.8
      // Jaccard). Scale shape is [[graft.dedup.MinHashLsh
      // .crossNearDuplicates]]'s: the eval set's band buckets BROADCAST,
      // the corpus side is map-only probed — never shuffled — and the
      // verify join touches only candidate rows. Per-document semantics
      // (the verdict depends on the doc and the static eval set alone),
      // so runSubscription accepts it alongside exact decontaminate.
      // Banding default is 8 bands × 2 rows — MORE permissive than
      // dedup_jaccard's 4×4: decontamination thresholds sit lower
      // (0.5–0.7) than near-dup thresholds, and at J=0.6 an r=4 band
      // collides with only p≈34% while r=2 reaches ≈95% — a gate that
      // silently misses most leaks at its own declared threshold would
      // be worse than no gate.
      val fuzzyCfg = graft.dedup.MinHashLsh.Config(
        numHashes = st.params.get("num_hashes").map(_.toInt).getOrElse(16),
        bands = st.params.get("bands").map(_.toInt).getOrElse(8),
        shingleSize = st.params.get("shingle").map(_.toInt).getOrElse(4),
        threshold = st.params("threshold_milli").toInt / 1000.0)
      val evalDocs = spark.read.parquet(st.params("eval_path"))
      require(evalDocs.columns.contains(cfg.textCol),
        s"decontaminate_fuzzy: eval set ${st.params("eval_path")} " +
          s"needs a '${cfg.textCol}' column " +
          s"(have ${evalDocs.columns.mkString(",")})")
      // the probe id only labels report rows — synthesize a stable one
      // from the text so the eval set needs no id contract
      val probe = evalDocs.select(
        xxhash64(col(cfg.textCol)).as(cfg.idCol), col(cfg.textCol))
      val flagged = graft.dedup.MinHashLsh.crossNearDuplicates(
          df.select(col(cfg.idCol), col(cfg.textCol)), probe,
          cfg.idCol, cfg.textCol, fuzzyCfg)
        .select(col("id_a")).distinct()
      df.join(flagged, df(cfg.idCol) === flagged("id_a"), "left_anti")
    case "pii_scrub" =>
      // deterministic map-only redaction of the PII shapes a crawl-slice
      // ingest must not train on: emails, long digit runs (phone/card/
      // SSN-ish), and bare IPv4s each collapse to a typed placeholder.
      // Regex-only (codegen'd regexp_replace, no UDF); recall-oriented
      // patterns — a redacted false positive costs one token, a missed
      // true positive trains the model on someone's number.
      df.withColumn(cfg.textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(col(cfg.textCol),
              "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
            "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
          "[+]?\\b\\d[\\d() .-]{5,}\\d\\b", "<NUM>"))
    case "source_quota" =>
      val n = st.params("per_source").toInt
      val w = Window.partitionBy("source").orderBy(col(cfg.idCol))
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= n).drop("__rn")
    case other =>
      throw new IllegalArgumentException(s"unknown stage '$other'")
  }

  // ------------------------------------------------------------------
  // run
  // ------------------------------------------------------------------

  /** Execute the configured run. ONE action materializes the output
    * shards AND every stage's audit count (observe free-ride); with
    * `log_dir`, the shard files then commit as one atomic snapshot
    * version stamped `#batch=runId`.
    *
    * Replay discipline (log mode): a runId at or below the log's newest
    * committed `#batch=` returns the already-committed version WITHOUT
    * rewriting the output directory — rewriting would replace (delete +
    * recreate under new names) the very files the committed manifest
    * references, corrupting the published version. Such a replay report
    * carries `finalRows = -1` and no stage funnel (the run didn't
    * execute). A crash BETWEEN the shard write and the log commit heals
    * on replay: nothing was committed, so the rerun rewrites the
    * (unreferenced) shards and commits normally. */
  def run(spark: SparkSession, cfg: CurateConfig,
      runId: Long = 0L): CurateReport = {
    cfg.logDir.foreach { ld =>
      if (SnapshotLog.lastBatch(spark, ld).exists(runId <= _)) {
        val v = SnapshotLog.versionOfBatch(spark, ld, runId)
          .getOrElse(SnapshotLog.versions(spark, ld).last)
        return CurateReport(Seq.empty, -1L, Some(v))
      }
    }
    val input =
      if (cfg.inputLog) cfg.inputFilter match {
        // manifest-pruned slice read: zone maps / IN-lists / null flags
        // / partition tuples skip files BEFORE any footer opens — the
        // re-curation slice never pays for the other slices
        case Some(p) => SnapshotLog.readFilterSql(spark, cfg.inputPath, p)._1
        case None    => SnapshotLog.read(spark, cfg.inputPath)
      }
      else {
        val raw = spark.read.parquet(cfg.inputPath)
        cfg.inputFilter
          .map(p => raw.filter(org.apache.spark.sql.functions.expr(p)))
          .getOrElse(raw) // plain parquet: an ordinary pushed filter
      }
    // a WRITE action runs under its own QueryExecution, so plan-side
    // observedMetrics (Observe.metricsOf — the aggregate-driven free
    // ride) never see it; the Observation listener API is the sanctioned
    // write-side channel: each stage registers one named observation and
    // get() returns its metrics once the write completes. Unique names
    // per run (Spark requires them session-globally for the listener).
    val runTag = java.util.UUID.randomUUID().toString.take(8)
    val observations = scala.collection.mutable.ArrayBuffer[
      (String, org.apache.spark.sql.Observation)]()
    def tagged(df: DataFrame, tag: String): DataFrame = {
      val o = new org.apache.spark.sql.Observation(s"$tag-$runTag")
      observations += tag -> o
      df.observe(o, count(lit(1)).as("rows"))
    }
    var df = tagged(input, "s00_input")
    // pack_audit stages REPORT, never transform: each captures a lazy
    // audit frame over the pipeline AT ITS POSITION (post-chunk vs
    // post-budget audits differ — that's the point); collected after
    // the write, costing one dedicated slice pass each, like
    // table-shaped expectation checks
    val packAudits =
      scala.collection.mutable.ArrayBuffer[(String, DataFrame)]()
    cfg.stages.zipWithIndex.foreach { case (st, i) =>
      val tag = f"s${i + 1}%02d_${st.name}"
      if (st.name == "pack_audit") {
        require(df.columns.contains("source"),
          "pack_audit needs a 'source' column in the curated frame")
        packAudits += tag -> packAudit(df, "source", cfg.idCol,
          cfg.textCol, st.params("seq_tokens").toInt)
      } else df = tagged(applyStage(spark, df, st, cfg, runId), tag)
    }
    val sharded = cfg.shards match {
      case Some(n) => df.repartition(n, col(cfg.idCol))
      case None    => df
    }
    // PUBLISH GATE, part 1: every RIDABLE expectation (all but the
    // distinct-shaped unique) attaches to the shard WRITE itself as an
    // observed metric — the gate costs ZERO extra passes for row-scalar
    // rules, exactly like the funnel counts. Only table-shaped checks
    // pay a dedicated read of the written output below.
    val (ridden, tableShaped) = cfg.expect.partition(Expectations.ridable)
    val gateObs = if (ridden.isEmpty) None else {
      val o = new org.apache.spark.sql.Observation(s"expect-$runTag")
      Some(o)
    }
    val toWrite = gateObs match {
      case Some(o) =>
        val aggs = ridden.map(c =>
          Expectations.violationAgg(c).cast("long").as(c.name))
        sharded.observe(o, aggs.head, aggs.tail: _*)
      case None => sharded
    }
    // partition_by: hive-layout shards (the lang/source slice layout a
    // trainer reads); validated against the post-stage schema HERE —
    // the input schema is unknowable at config load
    cfg.partitionBy.foreach { c =>
      require(sharded.columns.contains(c),
        s"partition_by column '$c' absent from the curated output " +
          s"(have ${sharded.columns.mkString(",")})")
    }
    val writer = toWrite.write.mode("overwrite")
    (if (cfg.partitionBy.isEmpty) writer
     else writer.partitionBy(cfg.partitionBy: _*)).parquet(cfg.outDir)

    val stageRows = observations.toSeq.map { case (t, o) =>
      t -> o.get("rows").asInstanceOf[Long]
    }
    // PUBLISH GATE, part 2: assemble verdicts — ridden checks read off
    // the completed write, table-shaped checks via one dedicated pass
    // over the written shards (post-funnel-sized, not the corpus) —
    // BEFORE any snapshot-log commit. On failure the shards stay on
    // disk for debugging but the version is never published — a
    // trainer reading the log can never see a slice that failed its
    // own quality contract.
    val riddenReport: Seq[(String, Long, Boolean)] = gateObs.map { o =>
      val m = o.get
      ridden.map { c =>
        val v = m(c.name).asInstanceOf[Long]
        (c.name, v, v == 0L)
      }
    }.getOrElse(Seq.empty)
    val tableReport: Seq[(String, Long, Boolean)] =
      if (tableShaped.isEmpty) Seq.empty
      else Expectations.run(spark.read.parquet(cfg.outDir), tableShaped)
        .collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val byName = (riddenReport ++ tableReport).map(r => r._1 -> r).toMap
    val expectReport: Seq[(String, Long, Boolean)] =
      cfg.expect.map(c => byName(c.name)) // declaration order preserved
    val failed = expectReport.filterNot(_._3)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "curation output failed its expectations — shards written to " +
          s"${cfg.outDir} but NOT published: " +
          failed.map { case (n, v, _) => s"$n ($v violations)" }
            .mkString(", "))
    // dedup_image with store_dir: the PUBLISHED corpus' fingerprints
    // enter the standing store, stamped with this runId (which the
    // stage's own screen excluded via as-of) — AFTER the gate, so a
    // quarantined run never pollutes the store, and BEFORE the log
    // commit, so a crash between them replays the whole run and the
    // re-append dynamic-overwrites its own batch idempotently. One
    // dedicated fingerprint pass over the written shards (post-funnel
    // sized), the table-shaped-check cost class. Daily runs must carry
    // increasing runIds, the same contract the log replay guard keys on.
    cfg.stages.filter(st => st.name == "dedup_image" &&
        st.params.contains("store_dir")).foreach { st =>
      // run-id monotonicity: an append whose id is BEHIND the store's
      // newest batch would dynamic-overwrite a newer batch's partitions
      // with unrelated content — refuse loudly (equality is the legal
      // same-run replay; the screen's as-of already excludes it)
      graft.dedup.FingerprintStore
        .maxBatchId(spark, st.params("store_dir")).foreach { m =>
          require(runId >= m,
            s"run id $runId is behind the fingerprint store's newest " +
              s"batch $m (${st.params("store_dir")}) — daily runs must " +
              "carry increasing run ids; an older id would overwrite " +
              "newer fingerprints")
        }
      graft.dedup.FingerprintStore.append(spark, st.params("store_dir"),
        tolerantFps(spark.read.parquet(cfg.outDir), cfg.idCol,
          cfg.payloadCol), batchId = runId)
    }
    val version = cfg.logDir.map { ld =>
      val fs = new org.apache.hadoop.fs.Path(cfg.outDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // recursive: partition_by nests shards under c=v dirs
      val files = {
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        val it = fs.listFiles(new org.apache.hadoop.fs.Path(cfg.outDir), true)
        while (it.hasNext) {
          val s = it.next()
          if (s.isFile && s.getPath.getName.startsWith("part-"))
            buf += s.getPath.toString
        }
        buf.toSeq.sorted
      }
      // the published version records the layout + per-file tuples, so
      // SnapshotLog.readPartition prunes the training table by slice
      val v = SnapshotLog.commitBatchExternal(spark, ld, files,
        sharded.schema, runId, partitionCols = cfg.partitionBy)
      // persist_checks: install every ROW-SCALAR expectation as a table
      // CHECK constraint, so the table's own commit boundary re-enforces
      // the pipeline contract against ANY writer (a direct commitBatch
      // bypassing this pipeline is refused the same way). Table-shaped
      // expectations (unique/min_rows) stay publish-gate-only — they are
      // not row-scalar CHECKs. Idempotent across runs: already-installed
      // names are skipped, so replays and daily runs never duplicate.
      if (cfg.persistChecks) {
        val installed = SnapshotLog
          .checksOf(spark, ld, SnapshotLog.versions(spark, ld).last)
          .map(_._1).toSet
        cfg.expect.foreach { c =>
          val sql =
            try Some(Expectations.toCheckSql(c))
            catch { case _: IllegalArgumentException => None }
          sql.foreach { s =>
            val nm = c.name.replace("=", "_")
            if (!installed(nm)) SnapshotLog.addCheck(spark, ld, nm, s)
          }
        }
      }
      v
    }
    // source-count-bounded collects; the frames are lazy until here so
    // a failed publish gate above never pays for audits
    val packReport = packAudits.toSeq.map { case (tag, adf) =>
      tag -> adf.collect().toSeq.map(r => PackStat(r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    }
    CurateReport(stageRows, stageRows.last._2, version, expectReport,
      packReport)
  }

  /** The sequence-packing audit frame — the q_seq_pack recipe as a
    * library call (OlapStatOps.seqPack delegates here): per `srcCol`,
    * docs concatenate in `idCol` order into one token stream chopped
    * into `seqTokens`-sized training sequences; reports docs, tokens,
    * sequence count, boundary-straddling docs (attention-mask leakage
    * candidates) and pad tokens in the final sequence. Tokens are the
    * house whitespace convention; ONE source-partitioned prefix window
    * with an explicit ROWS frame over the unique id order; integer
    * division throughout (`div`, never `/`). */
  def packAudit(df: DataFrame, srcCol: String, idCol: String,
      textCol: String, seqTokens: Int): DataFrame = {
    require(seqTokens >= 1, s"seq_tokens must be >= 1, got $seqTokens")
    val n = seqTokens
    val d = df.select(col(srcCol).as("source"), col(idCol).as("_pa_id"),
      size(split(col(textCol), " ")).cast("long").as("ntok"))
    val w = Window.partitionBy("source").orderBy("_pa_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = d.withColumn("cum", sum("ntok").over(w))
    cum.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ntok").cast("long").as("total_tokens"),
        expr(s"CAST((max(cum) + ${n - 1}) div $n AS BIGINT)").as("n_seqs"),
        expr(s"CAST(sum(CASE WHEN (cum - ntok) div $n <> (cum - 1) div $n" +
          " THEN 1 ELSE 0 END) AS BIGINT)").as("n_straddlers"),
        expr(s"CAST((max(cum) + ${n - 1}) div $n * $n - max(cum) AS BIGINT)")
          .as("pad_tokens"))
      .orderBy("source")
  }

  /** Load + run in one call — the scheduled-deployment entry. */
  def runFile(spark: SparkSession, configPath: String,
      runId: Long = 0L): CurateReport =
    run(spark, load(configPath), runId)

  /** The SAME config driving a STREAMING curation run — the
    * batch/stream duality the CDC [[Pipeline]] has (runBatch/runStream),
    * for the curation pillar: `docs` is a streaming document frame; the
    * config's `quality` stage parameterizes the per-batch gate, a
    * `decontaminate` stage binds the static eval gram set, and
    * [[graft.streaming.CurateStream]] supplies the cross-batch near-dup
    * state + replay idempotence. Stages OUTSIDE the streaming engine's
    * vocabulary (lang_keep runs map-side and is applied here too;
    * dedup_exact/dedup_near are subsumed by CurateStream's signature
    * store; anything else — jaccard/chunk/quotas — is batch-only and
    * rejected loudly: a silent drop of a configured stage would ship an
    * uncurated stream). */
  def runStream(spark: SparkSession, cfg: CurateConfig, docs: DataFrame,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    if (cfg.modality == "image") {
      val allowed = Set("quality_image", "dedup_image")
      val bad = cfg.stages.map(_.name).filterNot(allowed)
      require(bad.isEmpty,
        s"stages [${bad.mkString(", ")}] are not streamable over an " +
          "image corpus — runStream supports quality_image/dedup_image " +
          "(per-batch gate + store-screened dedup)")
      return docs.writeStream
        .option("checkpointLocation", checkpointDir)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          runImageBatch(batch.sparkSession, batch, id, cfg); ()
        }
        .start()
    }
    // a dedup_semantic config drives the EMBEDDING stream engine
    // (SemDedupStream): the docs frame is (id, embedding) vectors, the
    // quantizer is the frozen train-quantizer artifact (training on a
    // stream would re-cluster history batch by batch), and the accepted
    // vectors land under out_dir/accepted_vecs — the standing corpus
    // every later batch screens against
    val semantic = cfg.stages.find(_.name == "dedup_semantic")
    if (semantic.isDefined) {
      val st = semantic.get
      require(cfg.stages.size == 1,
        "a dedup_semantic stream is single-stage (the text gates read " +
          s"textCol, the vector feed has none) — got " +
          s"[${cfg.stages.map(_.name).mkString(", ")}]")
      require(st.params.contains("quantizer_path"),
        "streaming dedup_semantic needs quantizer_path (a frozen " +
          "Maintain train-quantizer artifact) — in-run training would " +
          "re-cluster history batch by batch")
      require(!st.params.contains("embed_path"),
        "streaming dedup_semantic reads the embedding column inline — " +
          "a sidecar join has no arrival-order contract on a stream")
      val cents = spark.read.parquet(st.params("quantizer_path"))
      require(Seq("list_id", "centroid").forall(cents.columns.contains),
        s"quantizer ${st.params("quantizer_path")} needs columns " +
          s"(list_id, centroid), have ${cents.columns.mkString(",")}")
      return graft.streaming.SemDedupStream.run(docs, cfg.outDir,
        checkpointDir, cents,
        graft.streaming.SemDedupStream.Config(
          idCol = cfg.idCol,
          embCol = st.params.getOrElse("embed_col", "embedding"),
          tauMicro = st.params("tau_milli").toLong * 1000L))
    }
    val streamable = Set("lang_keep", "quality", "dedup_exact",
      "dedup_near", "decontaminate")
    val bad = cfg.stages.map(_.name).filterNot(streamable)
    require(bad.isEmpty,
      s"stages [${bad.mkString(", ")}] are batch-only — " +
        "runStream supports lang_keep/quality/dedup_exact/dedup_near/" +
        "decontaminate (the CurateStream vocabulary), or a single " +
        "dedup_semantic stage for an embedding feed")
    val quality = cfg.stages.find(_.name == "quality")
    val scfg = CurateStream.Config(
      idCol = cfg.idCol, textCol = cfg.textCol,
      minTok = quality.map(_.params("min_tok").toInt).getOrElse(0),
      maxTok = quality.map(_.params("max_tok").toInt)
        .getOrElse(Int.MaxValue),
      minTtr = quality.map(_.params("min_ttr_milli").toInt / 1000.0)
        .getOrElse(0.0),
      decontGram = cfg.stages.find(_.name == "decontaminate")
        .flatMap(_.params.get("gram")).map(_.toInt).getOrElse(4))
    val evalGrams = cfg.stages.find(_.name == "decontaminate").map { st =>
      CurateStream.evalGramSet(
        spark.read.parquet(st.params("eval_path")), scfg)
    }
    val gated = cfg.stages.find(_.name == "lang_keep") match {
      case Some(st) =>
        docs.filter(col("lang").isin(parseLangs(st.params("langs")): _*))
      case None => docs
    }
    CurateStream.run(gated, cfg.outDir, checkpointDir, scfg, evalGrams)
  }

  /** One STREAMING image-curation micro-batch — the foreachBatch body
    * [[runStream]] wires for image-modality configs, callable directly
    * for batch backfills and replay tests (the [[graft.streaming
    * .ImageDedupStream.mergeBatch]] design). Gate + dedup run the same
    * [[applyStage]] code the batch pipeline uses (runId = the stream
    * batch id, so the store screen reads strictly-earlier batches);
    * survivors' fingerprints append to the stage's store and the
    * surviving IMAGES commit to `cfg.outDir` as one snapshot-log
    * version stamped `#batch=<id>` — downstream trainers read a real
    * table, not a side effect. Idempotent under at-least-once replay
    * END TO END: the screen excludes the replayed batch's own
    * fingerprints, the election is deterministic, the store append
    * dynamic-overwrites its own partitions, and the `#batch=` header
    * makes the replayed table commit a no-op. The fingerprint append
    * deliberately lands BEFORE the table commit: a crash between them
    * replays the batch, which rewrites the append byte-identically and
    * then commits — whereas the opposite order would let the replay
    * guard skip the whole batch with the append missing. Returns the
    * number of published images. */
  private[graft] def runImageBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, cfg: CurateConfig): Long = {
    val survivors = cfg.stages
      .foldLeft(batch)((df, st) => applyStage(spark, df, st, cfg, batchId))
      .localCheckpoint(true) // feeds fps append + table commit + count
    cfg.stages.filter(st => st.name == "dedup_image" &&
        st.params.contains("store_dir")).foreach { st =>
      graft.dedup.FingerprintStore.append(spark, st.params("store_dir"),
        tolerantFps(survivors, cfg.idCol, cfg.payloadCol), batchId)
    }
    SnapshotLog.commitBatch(spark, cfg.outDir, survivors, batchId)
    survivors.count()
  }

  /** Curation DRIVEN BY a snapshot-log subscription — training shards
    * that FOLLOW an upstream table through churn (the composition of
    * the CDC pillar's poll/ack cursor protocol with the curation
    * pillar's stage vocabulary). Each drain iteration polls the changes
    * since the subscriber's cursor, curates the changed documents
    * through the config's PER-DOCUMENT stages, and commits ONE keyed
    * merge into the published shard table (`cfg.outDir`, itself a
    * snapshot log):
    *
    *  - inserts / update post-images that SURVIVE curation upsert;
    *  - upstream DELETES delete the shard row;
    *  - a changed doc that FAILS curation (or leaves `input_filter`'s
    *    slice) is EVICTED — an update that degrades a doc below the
    *    quality bar must remove the stale curated copy, not leave it.
    *
    * Only per-document stages are allowed (lang_keep / quality /
    * decontaminate / decontaminate_fuzzy / pii_scrub): corpus-grain
    * stages (dedup_*, quotas,
    * chunk) over a changed-rows slice would judge against the slice,
    * not the corpus — silently different semantics, so they refuse
    * loudly (dedup across churn is CurateStream's signature-store job).
    *
    * Replay-idempotent end to end: the output merge is stamped
    * `#batch=<ack version>` ([[SnapshotLog.mergeBatch]]), so a crash
    * between commit and ack re-polls the same span and the replayed
    * merge is a no-op; the ack then advances and the loop converges.
    * Cost ∝ churn: a poll reads only changed files (manifest-pruned),
    * curation maps only changed docs, the merge rewrites only shard
    * files holding a changed key. Returns the committed output versions
    * (empty when already caught up). */
  def runSubscription(spark: SparkSession, cfg: CurateConfig,
      cursorFile: String,
      maxVersionsPerPoll: Option[Long] = None,
      maxBytesPerPoll: Option[Long] = None): Seq[Long] = {
    require(cfg.inputLog,
      "subscription curation follows a snapshot-log table — set " +
        "input_log true (plain parquet has no change feed to subscribe to)")
    // per-document stages only, per modality: an image corpus following
    // churn re-gates changed images through quality_image (decode +
    // dimension floors are per-doc); dedup_image stays corpus-grain —
    // its in-batch election over a churn slice would judge against the
    // slice (cross-batch image dedup is ImageDedupStream's job)
    val perDoc =
      if (cfg.modality == "image") Set("quality_image")
      else if (cfg.modality == "audio") Set("quality_audio")
      else Set("lang_keep", "quality", "decontaminate",
        "decontaminate_fuzzy", "pii_scrub")
    val bad = cfg.stages.map(_.name).filterNot(perDoc)
    require(bad.isEmpty,
      s"stages [${bad.mkString(", ")}] are corpus-grain (or the wrong " +
        "modality) — over a changed-rows slice they would judge against " +
        "the slice, not the corpus; runSubscription supports " +
        s"${perDoc.toSeq.sorted.mkString("/")} for modality " +
        s"'${cfg.modality}' (cross-batch image dedup is " +
        "graft.streaming.ImageDedupStream's job)")
    val committed = Seq.newBuilder[Long]
    var draining = true
    while (draining) {
      SnapshotLog.pollChanges(spark, cfg.inputPath, cursorFile,
        keys = Seq(cfg.idCol), maxVersions = maxVersionsPerPoll,
        maxBytes = maxBytesPerPoll) match {
        case None => draining = false // caught up
        case Some((feed, ackV)) =>
          val changed = feed
            .filter(col("_change_type") =!= "update_preimage")
          val upserts0 = changed
            .filter(col("_change_type") =!= "delete").drop("_change_type")
          val upserts = cfg.inputFilter.fold(upserts0)(upserts0.filter)
          val survivors = cfg.stages
            .foldLeft(upserts)((df, st) =>
              applyStage(spark, df, st, cfg, ackV))
          // evict every changed key with no surviving curated row:
          // upstream deletes AND curation/slice failures
          val evict = changed.select(cfg.idCol).distinct()
            .join(survivors.select(cfg.idCol), Seq(cfg.idCol), "left_anti")
          val delta = survivors.withColumn("__evict", lit(false))
            .unionByName(evict.withColumn("__evict", lit(true)),
              allowMissingColumns = true)
          committed +=
            (if (SnapshotLog.versions(spark, cfg.outDir).isEmpty)
              // bootstrap: the shard table doesn't exist yet — declare
              // it with the first curated batch (evictions are no-ops
              // against an empty table)
              SnapshotLog.commitBatch(spark, cfg.outDir, survivors, ackV)
            else SnapshotLog.mergeBatch(spark, cfg.outDir, delta,
              keys = Seq(cfg.idCol), batchId = ackV,
              deleteWhen = Some(col("__evict")), dropCols = Seq("__evict")))
          SnapshotLog.ackChanges(spark, cfg.inputPath, cursorFile, ackV)
      }
    }
    committed.result()
  }

  private def parseLangs(v: String): Seq[String] = {
    val t = v.trim
    require(t.startsWith("[") && t.endsWith("]"),
      s"langs must be an inline [a, b] list, got '$t'")
    val body = t.substring(1, t.length - 1).trim
    require(body.nonEmpty, "langs list is empty")
    body.split(",").map(_.trim.stripPrefix("'").stripSuffix("'")
      .stripPrefix("\"").stripSuffix("\"")).toSeq
  }
}
