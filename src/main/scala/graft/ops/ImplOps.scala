package graft.ops

import graft.{Q, Tables}
import graft.dedup.{MinHashLsh, SimHash}
import graft.multimodal.{DeterministicStubDecoder, Multimodal}
import graft.sim.Ann
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Impl-only query surfaces (SURVEY.md §2.2 ✗ rows): registered in
  * `SparkEntry.queries` but intentionally absent from `oracleSql` — their
  * semantics are not ANSI-SQL-expressible in DuckDB (hash-seed-sensitive
  * LSH/SimHash buckets, HLL sketches, binary feature extraction), so the
  * driver records a rows-only check and ScalaTest carries the real
  * verification (LshSpec / MultimodalSpec compare against exact ground
  * truth).
  */
object ImplOps {

  /** MinHash-LSH near-dup pipeline over documents — the 100 TB dedup
    * path. Jaccard values on emitted pairs are exact (verify step). */
  val dedupMinhash: Q = Q.implOnly("q_dedup_minhash") { (s, dir) =>
    // fanned (here and on the other corpus-compute legs below): the
    // shingle/signature map work otherwise runs in one scan task on
    // sub-split input — Tables.fanned, identity at production scale
    MinHashLsh.nearDuplicates(Tables.fanned(s, dir, "documents", "doc_id"),
      "doc_id", "text",
        MinHashLsh.Config(numHashes = 32, bands = 8, shingleSize = 3,
          threshold = 0.5))
      .orderBy("id_a", "id_b")
  }

  /** SimHash near-dup pairs (Hamming ≤ 6 over 64-bit signatures). */
  val dedupSimhash: Q = Q.implOnly("q_dedup_simhash") { (s, dir) =>
    SimHash.nearDuplicates(Tables.fanned(s, dir, "documents", "doc_id"),
        "doc_id", "text", maxDist = 6)
      .orderBy("id_a", "id_b")
  }

  /** Raster leg of the dedup matrix: perceptual (dHash) image near-dup
    * detection over a deterministic synthetic PNG corpus — one smooth
    * 32×32 raster per embedding row, with every third image also
    * present as a RE-ENCODED copy (±1-level codec jitter) and a
    * box-RESIZED 16×16 copy, the two transforms a byte/pixel hash
    * misses. [[graft.dedup.ImageDedup]]: per-partition decode → 8×8
    * box-resize → 64-bit gradient-sign fingerprint, then the 8×8-band
    * multi-index Hamming join (exact recall ≤ 7, never all-pairs —
    * ImageDedupSpec plan-asserts no cartesian and pins a sequential
    * all-pairs reference). Rows-only by design (DuckDB has no PNG
    * codec); media_id = vec_id·10 + {0 orig, 1 re-encode, 2 resize}. */
  val dedupImage: Q = Q.implOnly("q_dedup_image") { (s, dir) =>
    import s.implicits._
    import graft.dedup.ImageDedup
    import graft.multimodal.Png
    val corpus = Tables.embeddings(s, dir)
      .select(col("vec_id")).limit(200).as[Long]
      .flatMap { id =>
        val base = ImageDedup.testRaster(id, 32, 32)
        val orig = (id * 10, Png.encode(32, 32, 1, base.pixels))
        if (id % 3 != 0) Seq(orig)
        else {
          val jittered = base.pixels.zipWithIndex.map { case (p, i) =>
            val x = i % 32; val y = i / 32
            math.min(255, (p & 0xff) + (x + y) % 2).toByte
          }
          val small = Png.resizeBox(base, 16, 16)
          Seq(orig,
            (id * 10 + 1, Png.encode(32, 32, 1, jittered)),
            (id * 10 + 2, Png.encode(16, 16, 1, small.pixels)))
        }
      }
      .toDF("media_id", "payload")
    ImageDedup.nearDuplicates(corpus, "media_id", "payload", maxDist = 6)
      .withColumn("same_source", expr("id_a div 10 = id_b div 10"))
      .orderBy("id_a", "id_b")
  }

  /** INCREMENTAL image screen — the daily-ingest twin of
    * [[dedupImage]] (the shape q_dedup_passage_incr establishes): the
    * deterministic mod-5 "incoming batch" of rasters is fingerprinted
    * and screened against the STANDING corpus only (two-sided banded
    * join — incoming never votes against incoming), emitting per
    * incoming image its standing near-dup count, nearest distance and
    * the accept/reject verdict an ingest gate acts on. Scale: the
    * standing side collapses to 16-byte fingerprints once; per-batch
    * cost is O(batch + matched candidates), never standing² — in
    * production the standing fingerprints are the PERSISTED
    * band-bucketed store of [[graft.dedup.FingerprintStore]] (appended
    * per accepted batch; screen reads prune to the ≤ 2048 touched
    * band-buckets; FingerprintStoreSpec proves the store-backed screen
    * row-identical to this formulation). Rows-only by design (no PNG
    * codec in DuckDB); ImageDedupSpec pins the two-sided join against a
    * sequential reference. */
  val dedupImageIncr: Q = Q.implOnly("q_dedup_image_incr") { (s, dir) =>
    import s.implicits._
    import graft.dedup.{ImageDedup, SimHash}
    import graft.multimodal.Png
    val all = Tables.embeddings(s, dir)
      .select(col("vec_id")).limit(200).as[Long]
      .map { id =>
        // every 5th source image arrives as a RESIZED re-ingest of a
        // standing image (id-4): the screen must catch it
        val srcId = if (id % 5 == 4) id - 4 else id
        val base = ImageDedup.testRaster(srcId, 32, 32)
        val png =
          if (id % 5 == 4)
            Png.encode(16, 16, 1, Png.resizeBox(base, 16, 16).pixels)
          else Png.encode(32, 32, 1, base.pixels)
        (id, png, id % 5 == 4)
      }
      .toDF("media_id", "payload", "incoming")
    val fps = ImageDedup.fingerprints(
      all.select("media_id", "payload"), "media_id", "payload")
      .join(all.select("media_id", "incoming"), "media_id")
    val incoming = fps.filter(col("incoming"))
    val standing = fps.filter(!col("incoming"))
    val hits = SimHash.bandedHammingJoin(incoming, "media_id",
      standing, "media_id", "dhash", maxDist = 6, bands = 8)
    incoming.select(col("media_id"))
      .join(hits.groupBy("id_a").agg(
        count(lit(1)).as("n_dups"), min("hamming").as("nearest")),
        col("media_id") === col("id_a"), "left_outer")
      .select(col("media_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("nearest"), lit(64)).as("nearest"),
        (coalesce(col("n_dups"), lit(0L)) === 0L).as("accept"))
      .orderBy("media_id")
  }

  /** LSH-bucketed ANN top-10 for probe vec_id=0 (brute-force twin:
    * q_sim_topk). */
  val simAnn: Q = Q.implOnly("q_sim_ann") { (s, dir) =>
    Ann.annTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
      probeId = 0L, k = 10, nBits = 4)
  }

  /** Binary-payload feature extraction through the stubbed decoder —
    * exercises the multimodal schema + per-partition batch shape. */
  val multimodalFeatures: Q = Q.implOnly("q_multimodal_features") { (s, dir) =>
    Multimodal.extractFeatures(
        Multimodal.fixtureFromDocuments(Tables.documents(s, dir)),
        DeterministicStubDecoder)(s)
      .toDF()
      .select("media_id", "modality", "n_bytes", "checksum")
      .orderBy("media_id")
  }

  /** IVF-style ANN top-10 for the same probe (label-seeded coarse
    * quantizer, nProbe=3 of 10 lists; brute-force twin: q_sim_topk). */
  val simIvf: Q = Q.implOnly("q_sim_ivf") { (s, dir) =>
    graft.sim.Ivf.probeTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
      "label", probeId = 0L, k = 10, nProbe = 3)
  }

  /** PQ/ADC ANN top-10 for the same probe (m=8 one-byte codes per
    * 64-dim vector — the 32× memory-compression leg of the ANN set;
    * brute-force twin: q_sim_topk). Snapped to integer 1e6-units for a
    * byte-stable rows-only dump. */
  val simPq: Q = Q.implOnly("q_sim_pq") { (s, dir) =>
    graft.sim.Pq.probeTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
        probeId = 0L, k = 10, refine = 50)
      .select(col("vec_id"),
        floor(col("approx_cos") * 1e6 + 0.5).cast(LongType).as("cos6"))
  }

  /** HLL approximate distinct vs exact — approx_count_distinct's sketch
    * differs from DuckDB's, so never oracle-checked; ImplSpec bounds the
    * relative error instead. */
  val approxDistinct: Q = Q.implOnly("q_approx_distinct") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy("event_type")
  }

  /** Bounded-shuffle top-3 per customer via the k-capped TopKAgg buffer —
    * map-side partials carry ≤3 rows per group per partition, vs the
    * window twin q_topk_per_group which shuffles+sorts every order row.
    * Oracle-checked since round 4: the aggregator's total order
    * (value DESC, payload ASC) is exactly the window twin's SQL order,
    * so the plain row_number query is a valid oracle. FunctionsSpec
    * additionally asserts row parity against the in-engine window plan. */
  val topkGroupAgg: Q = Q.checked(
    "q_topk_group_agg",
    """WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
      |FROM r WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
  ) { (s, dir) =>
    val top3 = udaf(new graft.functions.TopKAgg(3))
    Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(top3(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rn"),
        col("t._2").as("o_orderkey"), col("t._1").as("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** REAL-codec round trip on a driver-visible path: each embedding is
    * quantized into an 8×8 grayscale raster, ENCODED as an actual PNG
    * (zlib IDAT, CRC'd chunks), then DECODED back through
    * [[graft.multimodal.PngDecoder]]'s per-partition pipeline into
    * brightness/contrast features — the codec the stub decoder used to
    * stand in for, exercised end-to-end (encode half + decode half +
    * Spark plumbing). Deterministic: quantization is integer, the codec
    * is bit-exact, features sum in pixel order. Rows-only check by
    * design (DuckDB has no PNG codec); MultimodalSpec carries the
    * bit-level verification. */
  val multimodalDecode: Q = Q.implOnly("q_multimodal_decode") { (s, dir) =>
    import s.implicits._
    import graft.multimodal.{Png, PngDecoder}
    val records = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding")).limit(200)
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val px = v.take(64).map(f => (math.round(f * 127).toInt & 0xff).toByte)
        (id, Png.encode(8, 8, 1, px.padTo(64, 0.toByte)))
      }
      .toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("image").as("modality"), lit(8).as("width"),
          lit(8).as("height"), lit(0).as("sampleRateHz"),
          lit(0).as("nFrames")).as("meta"),
        col("payload"))
    Multimodal.extractFeatures(records, PngDecoder)(s)
      .toDF()
      .select(col("media_id"), col("n_bytes"),
        // snap the two float features to integer milli-units so the
        // rows-only dump is byte-stable across runs/partitionings
        floor(element_at(col("features"), 1) * 1000).cast("long")
          .as("mean_milli"),
        floor(element_at(col("features"), 5) * 1000).cast("long")
          .as("std_milli"))
      .orderBy("media_id")
  }

  /** RESIZE leg of the multimodal set — the normalize-resolution step a
    * training ingest runs on every image: decode each 8×8 PNG, box-
    * average it to 4×4 ([[graft.multimodal.Png.resizeBox]], pure
    * integer arithmetic ⇒ bit-identical across partitionings), re-encode
    * as a real PNG, and prove the round trip by decoding the RESIZED
    * payload for the emitted stats. Per-partition Dataset map — the
    * same no-driver-bytes plumbing as the decode/audio/video legs;
    * at 100 TB the resize is embarrassingly parallel and shuffle-free.
    * Rows-only by design (no PNG codec in DuckDB); MultimodalSpec pins
    * the box-average arithmetic and the codec round trip bit-level. */
  val multimodalResize: Q = Q.implOnly("q_multimodal_resize") { (s, dir) =>
    import s.implicits._
    import graft.multimodal.Png
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding")).limit(200)
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        val px = v.take(64).map(f => (math.round(f * 127).toInt & 0xff).toByte)
        val full = Png.encode(8, 8, 1, px.padTo(64, 0.toByte))
        val small = Png.encode(4, 4, 1,
          Png.resizeBox(Png.decode(full), 4, 4).pixels)
        val back = Png.decode(small)
        val sum = back.pixels.map(_ & 0xff).map(_.toLong).sum
        (id, full.length.toLong, small.length.toLong,
          back.width.toLong, back.height.toLong,
          sum * 1000L / (back.width * back.height))
      }
      .toDF("media_id", "bytes_full", "bytes_resized", "w", "h",
        "mean_milli")
      .orderBy("media_id")
  }

  /** AUDIO leg of the real-codec round trip (PNG: q_multimodal_decode,
    * MP4: q_multimodal_video): embeddings quantized to 16-bit PCM
    * waveforms, ENCODED as actual RIFF/WAVE files, decoded back through
    * [[graft.multimodal.WavPcmDecoder]]'s per-partition pipeline into
    * 8-bin RMS energy envelopes — the silence/clipping/loudness triage
    * features a curation pass filters on. Deterministic end to end
    * (integer quantization, bit-exact codec, sample-order bin sums);
    * energy snapped to integer micro-units for a byte-stable rows-only
    * dump. MultimodalSpec carries the bit-level codec verification. */
  val multimodalAudio: Q = Q.implOnly("q_multimodal_audio") { (s, dir) =>
    import s.implicits._
    import graft.multimodal.{WavPcm, WavPcmDecoder}
    val records = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding")).limit(200)
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        // clamp to [-1, 1] then encode as 16-bit PCM at 8 kHz mono
        val samples = v.map(f => math.max(-1.0f, math.min(1.0f, f)))
        (id, WavPcm.encodePcm16(samples, sampleRateHz = 8000, channels = 1))
      }
      .toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("audio").as("modality"), lit(0).as("width"),
          lit(0).as("height"), lit(8000).as("sampleRateHz"),
          lit(0).as("nFrames")).as("meta"),
        col("payload"))
    Multimodal.extractFeatures(records, WavPcmDecoder)(s)
      .toDF()
      .select(col("media_id"), col("n_bytes"),
        floor(element_at(col("features"), 1) * 1e6).cast(LongType)
          .as("rms_bin1_micro"),
        floor(element_at(col("features"), 8) * 1e6).cast(LongType)
          .as("rms_bin8_micro"))
      .orderBy("media_id")
  }

  /** Kept-chain throttle: drop an event within 6 h of the last KEPT
    * event for its (user, type) — true per-key rate limiting. Unlike
    * q_event_dedup_window's lag filter (≡ keep-first-of-session), the
    * chain semantic re-opens the gate 6 h after the last SURVIVOR, so a
    * steady drizzle of sub-6 h events still yields one kept event per
    * 6 h instead of one per burst. Greedy chains are inherently
    * sequential — no window/prefix-sum expresses them — but they ARE
    * recursively SQL-expressible: the successor of a kept event is a
    * STATIC function of the data (first same-key event ≥ 6 h later), so
    * the oracle precomputes per-event `next` pointers with one range
    * join and walks them from each key's first event with WITH
    * RECURSIVE — hash-checked, not rows-only (r14, retiring the largest
    * unchecked relational surface). ThrottleSpec still carries the
    * path-equivalence laws.
    * Routed via [[ThrottleScale.guardedChain]]: per-user keys take the
    * sanctioned `flatMapGroups` shape (hash-shuffle on the key, one
    * in-group sort, linear scan); a pathological hot key whose event
    * list would blow a task falls back to
    * [[ThrottleScale.bucketedChain]] — gap-width time buckets + pointer
    * doubling, exact, with no task ever holding more than one bucket of
    * one key (ThrottleSpec proves both paths identical). */
  val throttleChain: Q = Q.checked(
    "q_throttle_chain",
    "WITH RECURSIVE " + Tables.EventsCte.stripPrefix("WITH ") +
      """,
        |o AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |        row_number() OVER (PARTITION BY user_id, event_type
        |                           ORDER BY epoch_us(ts), event_id) AS rn
        |      FROM ev),
        |nxt AS (
        |  SELECT a.user_id, a.event_type, a.rn, min(b.rn) AS next_rn
        |  FROM o a JOIN o b
        |    ON b.user_id = a.user_id AND b.event_type = a.event_type
        |   AND b.us >= a.us + 21600000000
        |  GROUP BY a.user_id, a.event_type, a.rn),
        |kept(user_id, event_type, rn) AS (
        |  SELECT user_id, event_type, rn FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT k.user_id, k.event_type, n.next_rn
        |  FROM kept k JOIN nxt n ON n.user_id = k.user_id
        |    AND n.event_type = k.event_type AND n.rn = k.rn)
        |SELECT o.event_id, o.user_id, o.event_type
        |FROM kept k JOIN o ON o.user_id = k.user_id
        |  AND o.event_type = k.event_type AND o.rn = k.rn
        |ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    val gapUs = 21600000000L // 6 h
    ThrottleScale.guardedChain(
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us")),
      gapUs)
      .orderBy("event_id")
  }

  /** VIDEO leg of the multimodal set: synthesize deterministic MP4
    * containers (one per embedding row — duration/track layout derived
    * from vec_id), run [[graft.multimodal.Mp4MetaDecoder]]'s container
    * parse through the same per-partition plumbing as the PNG/WAV legs,
    * and emit the triage columns a curation pass filters on. Rows-only
    * check by design (DuckDB has no ISO-BMFF parser); MultimodalSpec
    * carries the byte-level round-trip + hostile-input verification. */
  val multimodalVideo: Q = Q.implOnly("q_multimodal_video") { (s, dir) =>
    import s.implicits._
    import graft.multimodal.{Mp4, Mp4MetaDecoder}
    val records = Tables.embeddings(s, dir)
      .select(col("vec_id")).limit(200).as[Long]
      .map { id =>
        val tracks = Mp4.Track("vide", "avc1") ::
          (if (id % 3 != 0) List(Mp4.Track("soun", "mp4a")) else Nil)
        (id, Mp4.encodeMeta("isom", timescaleHz = 1000,
          durationTicks = 1000L + (id % 600) * 1000L, tracks))
      }
      .toDF("media_id", "payload")
      .select(col("media_id"),
        struct(lit("video").as("modality"), lit(0).as("width"),
          lit(0).as("height"), lit(0).as("sampleRateHz"),
          lit(0).as("nFrames")).as("meta"),
        col("payload"))
    Multimodal.extractFeatures(records, Mp4MetaDecoder)(s)
      .toDF()
      .select(col("media_id"), col("n_bytes"),
        element_at(col("features"), 1).cast(LongType).as("duration_s"),
        element_at(col("features"), 2).cast(LongType).as("n_tracks"),
        element_at(col("features"), 4).cast(LongType).as("has_audio"))
      .orderBy("media_id")
  }

  /** SemDeDup cluster-then-dedup over the embeddings table: label-seeded
    * 2-iteration Lloyd quantizer, within-cluster snapped-cosine dup rule
    * at τ=0.35 (the q_dedup_embed threshold, so the two legs are
    * comparable), per-cluster kept/dropped report. Impl-only: the
    * k-means quantizer is iterative model state DuckDB SQL cannot
    * express; SemDedupSpec pins verdicts against a sequential
    * reference. */
  val dedupSemantic: Q = Q.implOnly("q_dedup_semantic") { (s, dir) =>
    graft.dedup.SemDedup.report(Tables.embeddings(s, dir), "vec_id",
      "embedding", "label", tauMicro = 350000L, iters = 2)
  }

  /** Incremental SemDeDup — the daily-ingest twin of q_dedup_semantic
    * (and the embedding twin of q_dedup_incr): the deterministic mod-5
    * "incoming batch" classified against the standing corpus under the
    * corpus-trained frozen quantizer, O(Δ·cluster) per batch. Corpus
    * members always win; within the batch, lowest id wins. */
  val dedupSemanticIncr: Q = Q.implOnly("q_dedup_semantic_incr") { (s, dir) =>
    val e = Tables.embeddings(s, dir)
    graft.dedup.SemDedup.incrementalReport(
      e.filter(col("vec_id") % 5 =!= 0), e.filter(col("vec_id") % 5 === 0),
      "vec_id", "embedding", "label", tauMicro = 350000L, iters = 2)
  }

  /** ANN quality dashboard: recall@10 of every approximate leg (LSH,
    * IVF, PQ+re-rank) against the exact brute-force top-10, macro-
    * averaged over a FIXED 8-probe set — one noisy probe must not
    * decide the dashboard. The probes are the 8 smallest md5-of-id
    * values: deterministic, pseudo-randomly spread across the id space,
    * and guaranteed to exist at any SF. IVF and PQ train ONCE for all
    * probes ([[graft.sim.Ivf.multiProbeTopK]] /
    * [[graft.sim.Pq.multiProbeTopK]] — per-probe retraining is the
    * scale cliff a dashboard must not normalize); recall arithmetic
    * runs on the collected 8×10-row frames (bounded model-state
    * collect, the Ivf contract). Rows-only by design: the approximate
    * legs are iterative model state no SQL oracle can express (their
    * bounds live in IvfSpec/PqSpec/AnnSpec). */
  val evalAnnRecall: Q = Q.implOnly("q_eval_ann_recall") { (s, dir) =>
    // NOT fanned (measured r16): this dashboard is ~20 short JOBS
    // (model-state collects across 4 concurrent legs), and a fan
    // exchange re-executes in EVERY one of them — one extra stage per
    // job outweighs parallelizing the 100-600 ms single-task corpus
    // passes, which already overlap across the concurrent legs
    // (measured 3.7-4.2 s unfanned vs 5.4-7.4 s fanned at sf0.1 c32)
    val e = Tables.embeddings(s, dir)
    val probes = e.select("vec_id")
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(8).collect().map(_.getLong(0)).toSeq.sorted
    def byProbe(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // fetch all probe vectors in ONE job; per-probe similarity is then a
    // LITERAL dot (no per-branch broadcast future — the 16 tiny
    // broadcast stages were half this dashboard's wall, TimeQ-measured)
    import graft.functions.VectorExprs.{dotLit, norm2}
    val probeVecs: Map[Long, Array[Double]] =
      e.filter(col("vec_id").isin(probes: _*))
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def litCos(p: Long): org.apache.spark.sql.Column = {
      val w = probeVecs(p)
      val wNorm = math.sqrt(w.map(x => x * x).sum)
      dotLit(col("embedding"), w) /
        (sqrt(norm2(col("embedding"))) * lit(wNorm))
    }
    // ALL probes in ONE corpus pass: each row evaluates its 8 literal
    // cosines, explodes to (probe_id, vec_id, cos), and a k-bounded
    // TopKAgg keeps 10 per probe — map-side combine caps the shuffle at
    // 8×10 rows per map partition. The previous shape (one
    // orderBy-limit job per probe, unioned) scanned the corpus 8 times
    // for brute and 8 more for LSH; per-probe wall was this dashboard's
    // entire regression when the probe set grew from 1 to 8.
    val top10 = udaf(new graft.functions.TopKAgg(10))
    def onePassTopK(src: org.apache.spark.sql.DataFrame,
        branches: Seq[org.apache.spark.sql.Column],
        extraFilter: org.apache.spark.sql.Column = lit(true)) =
      src.select(col("vec_id"), explode(array(branches: _*)).as("pc"))
        .filter(col("vec_id") =!= col("pc.probe_id") && extraFilter)
        .groupBy(col("pc.probe_id").as("probe_id"))
        .agg(top10(col("pc.cos"), col("vec_id")).as("top"))
        .select(col("probe_id"), explode(col("top")).as("t"))
        .select(col("probe_id"), col("t._2").as("vec_id"))
    // LSH: bucket signatures computed ONCE for the corpus (the nBits
    // interpreted plane folds were previously re-evaluated per probe)
    val bucketed = graft.sim.Ann.withBucket(e, "embedding", nBits = 4)
      .select("vec_id", "embedding", "bucket")
    val probeBuckets: Map[Long, Long] =
      bucketed.filter(col("vec_id").isin(probes: _*))
        .select("vec_id", "bucket").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the four legs are independent job chains dominated by SEQUENTIAL
    // tiny model-state stages (kmeans rounds, broadcast futures) that
    // leave a 32-way executor idle — submit them as concurrent Spark
    // jobs from separate threads (the supported multi-job pattern) so
    // one leg's scheduling gaps overlap another's work; results are
    // per-leg deterministic so concurrency cannot change the output
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val bruteF = Future(byProbe(onePassTopK(e,
      probes.map(p => struct(lit(p).as("probe_id"), litCos(p).as("cos"))))))
    val legFs = Seq(
      "lsh" -> Future(byProbe(onePassTopK(bucketed,
        probes.map(p => struct(lit(p).as("probe_id"),
          lit(probeBuckets(p)).as("pb"), litCos(p).as("cos"))),
        extraFilter = col("bucket") === col("pc.pb")))),
      "ivf" -> Future(byProbe(graft.sim.Ivf.multiProbeTopK(e, "vec_id",
        "embedding", "label", probes, k = 10, nProbe = 3, iters = 2)
        .select("probe_id", "vec_id"))),
      "pq_rerank" -> Future(byProbe(graft.sim.Pq.multiProbeTopK(e, "vec_id",
        "embedding", probes, k = 10, refine = 50)
        .select("probe_id", "vec_id"))))
    val brute = Await.result(bruteF, Duration("600s"))
    val legs = legFs.map { case (m, f) =>
      m -> Await.result(f, Duration("600s")) }
    import s.implicits._
    legs.map { case (m, got) =>
      val recalls = probes.map { p =>
        val b = brute.getOrElse(p, Set.empty)
        if (b.isEmpty) 1000L
        else got.getOrElse(p, Set.empty).intersect(b).size * 1000L / b.size
      }
      (m, 10L, probes.size.toLong, recalls.sum / recalls.size,
        recalls.min, recalls.max)
    }.toDF("method", "k", "n_probes", "macro_recall_milli",
      "min_recall_milli", "max_recall_milli")
      .orderBy("method")
  }

  /** Distributed PCA over the embedding corpus (k=8): per-label mean of
    * the top-2 principal coordinates plus the model's explained-variance
    * share — the decorrelate-then-index pre-flight for a 100 TB
    * embedding store. Model = one integer-snapped moment pass + driver
    * Jacobi (`sim/Pca.scala`, layout-invariant by construction); the
    * projection is map-only literal dots; per-label means go through
    * per-row 1e6 snapping so the distributed sums are order-free. */
  val embedPca: Q = Q.implOnly("q_embed_pca") { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    val model = graft.sim.Pca.fit(emb, "embedding", k = 8)
    val evr = model.explainedVarianceRatio
    graft.sim.Pca.project(emb, "embedding", model)
      .select(col("label"),
        floor(col("pc1") * 1e6 + 0.5).cast(LongType).as("p1"),
        floor(col("pc2") * 1e6 + 0.5).cast(LongType).as("p2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        expr("sum(p1) div count(1)").as("pc1_mean_micro"),
        expr("sum(p2) div count(1)").as("pc2_mean_micro"))
      .withColumn("evr_top2_milli",
        lit(math.floor((evr(0) + evr(1)) * 1000 + 0.5).toLong))
      .orderBy("label")
  }

  val all: Seq[Q] = Seq(dedupMinhash, dedupSimhash, dedupImage,
    dedupImageIncr, simAnn, simIvf,
    multimodalFeatures, approxDistinct, topkGroupAgg, multimodalDecode,
    throttleChain, multimodalVideo, simPq, dedupSemantic, dedupSemanticIncr,
    multimodalAudio, evalAnnRecall, embedPca, multimodalResize)
}
