package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus retrieval & passage-grain dedup — two pillars of a pretraining
  * data pipeline the document-grain operators don't cover:
  *
  *  - [[passageDedup]] finds EXACT duplicated passages *inside* otherwise
  *    distinct documents (the Lee et al. 2022 "Deduplicating Training Data
  *    Makes Language Models Better" signal: memorization risk lives at the
  *    n-gram span level, not the document level — two distinct pages
  *    sharing a boilerplate paragraph still teach the model that paragraph
  *    twice).
  *  - [[rrfFusion]] fuses a lexical (BM25) ranking with a dense
  *    (embedding-cosine) ranking by Reciprocal Rank Fusion
  *    (Cormack et al. 2009) — the standard hybrid-retrieval primitive for
  *    RAG / eval-set construction on top of q_bm25_query + q_sim_topk.
  *
  * (Reference surface: the upstream repo is a CDC composition script;
  * these are north-star LLM-pipeline additions per BASELINE.json:6 — no
  * reference file:line exists, SURVEY §0.)
  *
  * Scale design, passage dedup: every corpus-sized stage is either a
  * map-only generate (shingle explode) or a hash AGGREGATE — cross-doc
  * counts/owners are computed as groupBy(h) + equi-join back, never as a
  * window over the shingle hash: a boilerplate passage present in 1% of
  * a 100 TB corpus would put every copy into one combiner-less window
  * task, while the aggregate emits one partial row per h per map task
  * and AQE skew-splits the join's probe side. The price is a second
  * evaluation of the shingle subtree (linear, parallel) instead of a
  * straggler cliff. The shuffle carries a 16-byte unhex(md5) binary,
  * never document text — 128 bits so collisions stay negligible at
  * trillions of distinct shingles (xxhash64 would birthday-collide).
  *
  * Scale design, RRF: both input rankings reduce to 50-row frames via
  * `orderBy().limit()` (TakeOrderedAndProject — parallel partial top-k,
  * never a global sort); the only partition-less windows run on those
  * ≤50-row stage frames (the q_filter_funnel boundedness precedent), and
  * the fusion join is a 50×50 full-outer merge. Rank arithmetic is exact
  * integer floor division (1e6 div (60+rank)) so fused scores and their
  * ordering are engine-independent.
  *
  * Determinism: BM25 scores are DECIMAL(18,6)-snapped before the per-doc
  * sum (TextRankOps recipe); cosine is the bit-identical dotVec/norm2
  * left-fold rounded to 4 dp (TextSimOps recipe); every rank and the
  * final order carry a doc_id tie-break.
  */
object RetrievalOps {

  /** Per-document duplicated-passage report: of a document's distinct
    * 8-token shingles, how many also appear in at least one OTHER
    * document (n_dup), and the integer dup fraction in milli-units.
    * Documents shorter than 8 tokens have no 8-shingle and are excluded
    * by construction (`sequence` is only generated when size ≥ 8 — Spark's
    * `sequence(0, n)` would count DOWN for n < 0, so the guard is
    * correctness, not just hygiene). */
  val passageDedup: Q = Q.checked(
    "q_dedup_passage",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |starts AS (SELECT doc_id, t,
      |             unnest(range(0, greatest(len(t) - 7, 0))) AS i
      |           FROM toks),
      |sh AS (SELECT DISTINCT doc_id,
      |         md5(array_to_string(t[i + 1 : i + 8], ' ')) AS h
      |       FROM starts),
      |marked AS (SELECT doc_id, h,
      |             count(*) OVER (PARTITION BY h) AS n_docs
      |           FROM sh)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
      |  CAST(count(*) FILTER (WHERE n_docs >= 2) AS BIGINT) AS n_dup,
      |  (count(*) FILTER (WHERE n_docs >= 2)) * 1000 // count(*) AS dup_milli
      |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    // fanned: the shingle explode + md5 otherwise runs in a single scan
    // task on sub-split input (Tables.fanned; identity at scale)
    val sh = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 8)).as("i"))
      .select(col("doc_id"),
        unhex(md5(array_join(slice(col("t"), col("i") + 1, lit(8)), " ")
          .cast(BinaryType))).as("h"))
      .distinct() // (doc, shingle) grain: one vote per doc per shingle
    // NO checkpoint (measured r16): both consumers (h-grain count + join
    // probe) sit directly above the distinct's exchange, whose two plan
    // copies are canonically identical — AQE ReusedExchange already
    // computes the tokenize+explode+md5 map side ONCE (visible in the
    // final adaptive plan, plans/r16). A localCheckpoint here measured
    // 0.75 → 1.21 s at sf0.1 c32: pure added materialization.
    // #docs containing h: an AGGREGATE + equi-join back, deliberately NOT
    // a count-over-Window.partitionBy(h). A boilerplate shingle present
    // in 1% of a 100 TB corpus puts every copy in ONE window task with no
    // combiner; the aggregate gets map-side partial rows (1 per h per map
    // task) and AQE skew-split handles the probe side of the join.
    val counts = sh.groupBy("h").agg(count(lit(1)).as("n_docs"))
    sh.join(counts, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("n_docs") >= 2, 1)).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        expr("n_dup * 1000 div n_shingles").as("dup_milli"))
      .orderBy("doc_id")
  }

  /** INCREMENTAL passage dedup — the daily-ingest twin of
    * [[passageDedup]] (the shape q_dedup_incr / q_dedup_semantic_incr
    * establish): the deterministic mod-5 "incoming batch" is screened
    * against the STANDING corpus only — for each incoming doc, how many
    * of its distinct 8-token shingles already exist anywhere in the
    * standing set, and the milli-fraction that are novel. Incoming docs
    * never vote against each other (the batch is screened, not
    * deduped — in-batch passage dedup is [[passageDedup]] run on the
    * accepted set afterwards).
    *
    * Scale: the standing side collapses to DISTINCT shingle hashes
    * (type grain, far smaller than occurrences) before a left-semi-
    * style membership join on the 16-byte hash; per-batch cost is
    * O(batch shingles + matched types), never standing². In production
    * the standing shingle-type set is the PERSISTED bucketed store of
    * [[graft.dedup.ShingleStore]] — appended per accepted batch, screen
    * reads prune to matched buckets; ShingleStoreSpec proves the
    * store-backed screen row-identical to this formulation. */
  val passageIncr: Q = Q.checked(
    "q_dedup_passage_incr",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |         md5(array_to_string(t[i + 1 : i + 8], ' ')) AS h
      |       FROM (SELECT doc_id, t,
      |               unnest(range(0, greatest(len(t) - 7, 0))) AS i
      |             FROM toks)),
      |standing AS (SELECT DISTINCT h FROM sh WHERE doc_id % 5 <> 0),
      |incoming AS (SELECT doc_id, h FROM sh WHERE doc_id % 5 = 0),
      |m AS (SELECT i.doc_id, i.h,
      |        CASE WHEN s.h IS NOT NULL THEN 1 ELSE 0 END AS seen
      |      FROM incoming i LEFT JOIN standing s ON i.h = s.h)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
      |  CAST(sum(seen) AS BIGINT) AS n_seen,
      |  CAST((count(*) - sum(seen)) * 1000 // count(*) AS BIGINT)
      |    AS novel_milli
      |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val sh = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 8)).as("i"))
      .select(col("doc_id"),
        unhex(md5(array_join(slice(col("t"), col("i") + 1, lit(8)), " ")
          .cast(BinaryType))).as("h"))
      .distinct()
    // NO checkpoint (measured r16): the %5 filters push below the
    // explode into each branch's scan, so the two "duplicate"
    // evaluations actually PARTITION the corpus (4/5 + 1/5 ≈ one full
    // pass, each branch pruning pre-explode); a checkpoint materializes
    // the full shingle grain first and measured 0.18 → 0.30 s
    val standing = sh.filter(col("doc_id") % 5 =!= 0)
      .select(col("h").as("sh_h")).distinct()
    sh.filter(col("doc_id") % 5 === 0)
      .join(standing, col("h") === col("sh_h"), "left_outer")
      .select(col("doc_id"),
        when(col("sh_h").isNotNull, 1L).otherwise(0L).as("seen"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), sum("seen").as("n_seen"))
      .select(col("doc_id"), col("n_shingles"), col("n_seen"),
        expr("(n_shingles - n_seen) * 1000 div n_shingles").as("novel_milli"))
      .orderBy("doc_id")
  }

  /** The passage-dedup TREATMENT to [[passageDedup]]'s report: rewrite the
    * corpus with cross-doc duplicated passages REMOVED from every
    * non-canonical holder (canonical = lowest doc_id containing the
    * shingle — it keeps its copy, so each passage survives exactly once
    * corpus-wide; within-doc repeats inside the canonical doc are kept,
    * the rule is cross-doc only). A token is removed iff it lies inside
    * any removed 8-token shingle span, i.e. some marked start i with
    * i ≤ p ≤ i+7 — computed as a per-doc rows-frame window max over the
    * marked flag, never an interval join.
    *
    * Scale: one token-grain pass (posexplode); the canonical owner per
    * shingle is an aggregate + equi-join back (the [[passageDedup]]
    * hot-shingle rationale — never a min-over-window on h), tail
    * positions with no shingle bypass that join via union so no
    * null-hash mega-partition exists, and the coverage window + final
    * per-doc fold share one doc_id exchange. Doc reconstruction is the
    * sort_array(collect_list(struct)) recipe (AggOps top-N-names
    * precedent) — per-doc frames bounded by doc length. */
  val passageClean: Q = Q.checked(
    "q_dedup_passage_clean",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |pos AS (SELECT doc_id, t, unnest(range(0, len(t))) AS p FROM toks),
      |sh AS (SELECT doc_id, p, t[p + 1] AS token,
      |         CASE WHEN p <= len(t) - 8
      |              THEN md5(array_to_string(t[p + 1 : p + 8], ' ')) END AS h
      |       FROM pos),
      |mk AS (SELECT doc_id, p, token,
      |         CASE WHEN h IS NOT NULL
      |              AND min(doc_id) OVER (PARTITION BY h) < doc_id
      |              THEN 1 ELSE 0 END AS marked
      |       FROM sh),
      |cov AS (SELECT doc_id, p, token,
      |          max(marked) OVER (PARTITION BY doc_id ORDER BY p
      |            ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS covered
      |        FROM mk)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
      |  CAST(sum(covered) AS BIGINT) AS n_removed,
      |  coalesce(string_agg(token, ' ' ORDER BY p)
      |             FILTER (WHERE covered = 0), '') AS clean_text
      |FROM cov GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val pos = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"), posexplode(col("t")).as(Seq("p", "token")))
      .select(col("doc_id"), col("p"), col("token"),
        when(col("p") <= size(col("t")) - 8,
          unhex(md5(array_join(slice(col("t"), col("p") + 1, lit(8)), " ")
            .cast(BinaryType)))).as("h"))
      // one evaluation feeds owners + the marked probe + the tail union.
      // UNLIKE passageDedup, no common exchange sits above this explode
      // (each consumer filters h differently BEFORE its own exchange),
      // so AQE ReusedExchange cannot dedup it — without the checkpoint
      // the posexplode+md5 subtree genuinely runs THREE times
      // (within-query materialization, rebuilt per invocation)
      .localCheckpoint(false)
    // canonical owner per shingle: aggregate + equi-join back (not a
    // min-over-Window.partitionBy(h) — see passageDedup's hot-shingle
    // note: the aggregate combines map-side, the join AQE-skew-splits),
    // and only over rows that HAVE a shingle — the tail positions union
    // back around it so no null-h mega-partition ever reaches an exchange
    val withH = pos.filter(col("h").isNotNull)
    val owners = withH.groupBy("h").agg(min(col("doc_id")).as("min_doc"))
    val starts = withH.join(owners, "h")
      .withColumn("marked",
        (col("min_doc") < col("doc_id")).cast(IntegerType))
    val tails = pos.filter(col("h").isNull).withColumn("marked", lit(0))
    starts.select("doc_id", "p", "token", "marked")
      .unionByName(tails.select("doc_id", "p", "token", "marked"))
      .withColumn("covered",
        max(col("marked")).over(Window.partitionBy("doc_id").orderBy("p")
          .rowsBetween(-7, 0)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        sum(col("covered")).as("n_removed"),
        array_join(expr(
          "transform(sort_array(collect_list(" +
            "CASE WHEN covered = 0 THEN struct(p, token) END)), x -> x.token)"),
          " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Hybrid retrieval: top-20 documents by Reciprocal Rank Fusion of the
    * BM25 top-50 (query {join, fast, table}) and the cosine top-50
    * (probe = vec_id 0), k=60, contributions in exact integer micro-units
    * (1e6 div (60+rank); absent from a list contributes 0). Emits both
    * source ranks so the report shows WHY a doc won (lexical, dense, or
    * both). */
  val rrfFusion: Q = Q.checked(
    "q_rrf_fusion",
    """WITH toks AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |         unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM toks
      |       WHERE token IN ('join', 'fast', 'table') GROUP BY 1, 2, 3),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      |n AS (SELECT count(*) AS n_docs,
      |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_dl
      |      FROM documents),
      |scored AS (
      |  SELECT tf.doc_id,
      |    CAST(CAST((((n_docs - df) * 2 + 1) * 1000000) // (df * 2 + 1)
      |           AS DOUBLE)
      |      * (CAST(tf AS DOUBLE) * 2.2e0)
      |      / (CAST(tf AS DOUBLE) + 3.0e-1 + 9.0e-1
      |         * (CAST(dl AS DOUBLE)
      |            * (CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))))
      |      AS DECIMAL(18,6)) AS term_score
      |  FROM tf JOIN df USING (token), n),
      |lex AS (SELECT doc_id, sum(term_score) AS score FROM scored
      |        GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 50),
      |lexr AS (SELECT doc_id,
      |           CAST(row_number() OVER (ORDER BY score DESC, doc_id)
      |                AS BIGINT) AS lex_rank
      |         FROM lex),
      |v0 AS (SELECT embedding AS e0 FROM embeddings WHERE vec_id = 0),
      |sims AS (
      |  SELECT vec_id,
      |    round(list_sum(list_transform(range(1, 65),
      |        i -> CAST(embedding[i] AS DOUBLE) * CAST(e0[i] AS DOUBLE)))
      |      / (sqrt(list_sum(list_transform(embedding,
      |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |         * sqrt(list_sum(list_transform(e0,
      |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS sim
      |  FROM embeddings, v0 WHERE vec_id <> 0),
      |vtop AS (SELECT vec_id, sim FROM sims ORDER BY sim DESC, vec_id LIMIT 50),
      |vecr AS (SELECT vec_id,
      |           CAST(row_number() OVER (ORDER BY sim DESC, vec_id)
      |                AS BIGINT) AS vec_rank
      |         FROM vtop),
      |fused AS (
      |  SELECT coalesce(l.doc_id, v.vec_id) AS doc_id, l.lex_rank, v.vec_rank,
      |    coalesce(1000000 // (60 + l.lex_rank), 0)
      |      + coalesce(1000000 // (60 + v.vec_rank), 0) AS rrf6
      |  FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.vec_id)
      |SELECT doc_id, lex_rank, vec_rank, CAST(rrf6 AS BIGINT) AS rrf6
      |FROM fused ORDER BY rrf6 DESC, doc_id LIMIT 20""".stripMargin
  ) { (s, dir) =>
    import graft.functions.VectorExprs.{dotVec, norm2}
    // lexical leg: per-doc DECIMAL BM25 scores (shared scorer), parallel
    // partial top-50 (TakeOrderedAndProject), then ranks on the 50-row
    // stage frame — the partition-less window is bounded by the LIMIT
    val lexr = TextRankOps
      .bm25DocScores(Tables.fanned(s, dir, "documents", "doc_id"),
        Seq("join", "fast", "table"))
      .orderBy(col("score_dec").desc, col("doc_id")).limit(50)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score_dec").desc, col("doc_id")))
        .cast(LongType))
      .select("doc_id", "lex_rank")
    val e = Tables.embeddings(s, dir)
    val v0 = e.filter(col("vec_id") === 0).select(col("embedding").as("e0"))
    val vecr = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(v0))
      .select(col("vec_id"),
        round(dotVec(col("embedding"), col("e0")) /
          (sqrt(norm2(col("embedding"))) * sqrt(norm2(col("e0")))), 4)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(50)
      .withColumn("vec_rank", row_number()
        .over(Window.orderBy(col("sim").desc, col("vec_id")))
        .cast(LongType))
      .select("vec_id", "vec_rank")
    lexr.join(vecr, col("doc_id") === col("vec_id"), "full_outer")
      .select(coalesce(col("doc_id"), col("vec_id")).as("doc_id"),
        col("lex_rank"), col("vec_rank"),
        (coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + vec_rank)"), lit(0L))).as("rrf6"))
      .orderBy(col("rrf6").desc, col("doc_id"))
      .limit(20)
  }

  /** Retrieval-quality evaluation: NDCG@10 of the BM25 ranking, with
    * graded relevance = number of distinct query terms the doc matches
    * (1..3 — coverage as a label proxy; a production eval substitutes
    * human/LLM judgments through the identical arithmetic). All float
    * hazards are removed up front: the rank discount 1/log2(rank+1) is a
    * FIXED micro-unit lookup (authored constants, identical literals in
    * both engines), gains are 2^rel−1 integers, so DCG/IDCG are exact
    * integer sums and NDCG an integer milli-ratio — hash-stable
    * cross-engine with zero transcendental calls at query time.
    *
    * Scale: the ranking is the shared scorer + TakeOrdered(10); the eval
    * itself runs on the 10-row frame (partition-less windows bounded by
    * the LIMIT — the q_filter_funnel precedent). */
  val evalNdcg: Q = {
    // floor(1e6 / log2(rank+1)) for rank 1..10 — authored once, used as
    // literals in BOTH engines so no runtime log2 exists anywhere
    val w = Seq(1000000L, 630929L, 500000L, 430676L, 386852L,
      356207L, 333333L, 315464L, 301029L, 289064L)
    val caseSql = w.zipWithIndex
      .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }.mkString(" ")
    Q.checked(
      "q_eval_ndcg",
      s"""WITH toks AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
        |         unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM toks
        |       WHERE token IN ('join', 'fast', 'table') GROUP BY 1, 2, 3),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n_docs,
        |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_dl
        |      FROM documents),
        |scored AS (
        |  SELECT tf.doc_id,
        |    CAST(CAST((((n_docs - df) * 2 + 1) * 1000000) // (df * 2 + 1)
        |           AS DOUBLE)
        |      * (CAST(tf AS DOUBLE) * 2.2e0)
        |      / (CAST(tf AS DOUBLE) + 3.0e-1 + 9.0e-1
        |         * (CAST(dl AS DOUBLE)
        |            * (CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))))
        |      AS DECIMAL(18,6)) AS term_score
        |  FROM tf JOIN df USING (token), n),
        |perdoc AS (SELECT doc_id, count(*) AS rel, sum(term_score) AS score
        |           FROM scored GROUP BY doc_id
        |           ORDER BY score DESC, doc_id LIMIT 10),
        |ranked AS (SELECT doc_id, rel,
        |             CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |                  AS BIGINT) AS rnk
        |           FROM perdoc),
        |ideal AS (SELECT rel,
        |            CAST(row_number() OVER (ORDER BY rel DESC) AS BIGINT)
        |              AS irnk
        |          FROM ranked),
        |g AS (SELECT
        |        sum((power(2, rel) - 1)
        |            * (CASE rnk $caseSql END)) AS dcg_micro
        |      FROM ranked),
        |ig AS (SELECT
        |         sum((power(2, rel) - 1)
        |             * (CASE irnk $caseSql END)) AS idcg_micro
        |       FROM ideal)
        |SELECT CAST(dcg_micro AS BIGINT) AS dcg_micro,
        |  CAST(idcg_micro AS BIGINT) AS idcg_micro,
        |  CAST(dcg_micro * 1000 // idcg_micro AS BIGINT) AS ndcg_milli
        |FROM g, ig""".stripMargin
    ) { (s, dir) =>
      val wCol = w.zipWithIndex.foldLeft(lit(0L)) { case (acc, (v, i)) =>
        when(col("rnk") === (i + 1), lit(v)).otherwise(acc)
      }
      val ranked = TextRankOps
        .bm25DocScores(Tables.fanned(s, dir, "documents", "doc_id"),
          Seq("join", "fast", "table"))
        .orderBy(col("score_dec").desc, col("doc_id")).limit(10)
        .withColumn("rnk", row_number()
          .over(Window.orderBy(col("score_dec").desc, col("doc_id")))
          .cast(LongType))
        .select(col("n_terms").as("rel"), col("rnk"))
      val ideal = ranked
        .withColumn("irnk", row_number()
          .over(Window.orderBy(col("rel").desc)).cast(LongType))
      val gain = expr("shiftleft(1L, cast(rel as int)) - 1")
      val dcg = ranked.agg(sum(gain * wCol).as("dcg_micro"))
      val idcg = ideal
        .withColumn("rnk", col("irnk"))
        .agg(sum(gain * wCol).as("idcg_micro"))
      dcg.crossJoin(broadcast(idcg))
        .select(col("dcg_micro"), col("idcg_micro"),
          expr("dcg_micro * 1000 div idcg_micro").as("ndcg_milli"))
    }
  }

  /** Cross-source contamination matrix at passage grain: for every
    * source pair, how many distinct 8-token shingle TYPES they share,
    * plus the overlap as a milli-fraction of the smaller side — the
    * "which corpus leaked into which" report read before mixing sources
    * into a training set (the passage-grain sibling of document-grain
    * decontamination).
    *
    * Scale: the corpus collapses straight to shingle-type grain in ONE
    * aggregate — collect_set(source) per shingle subsumes the r14
    * DISTINCT (source, h) step, and the per-key set is bounded by the
    * source count (tens), so map-side partials never grow even on a
    * boilerplate shingle every document shares. Source pairs come out
    * of an index HOF over the sorted set map-side (at most C(S,2) per
    * type — the all-pairs blowup cannot occur), where the r14 shape
    * self-joined the type frame on h, evaluating the shingle explode +
    * distinct three times (both join sides + the per-source totals)
    * and shuffling two of them. The totals re-derive from the same
    * grouped frame by explode. Output is |sources|²/2 rows. */
  val crossSource: Q = Q.checked(
    "q_dedup_cross_source",
    """WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
      |starts AS (SELECT source, t,
      |             unnest(range(0, greatest(len(t) - 7, 0))) AS i
      |           FROM toks),
      |sh AS (SELECT DISTINCT source,
      |         md5(array_to_string(t[i + 1 : i + 8], ' ')) AS h
      |       FROM starts),
      |tot AS (SELECT source, count(*) AS n_types FROM sh GROUP BY source),
      |shared AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
      |  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
      |  CAST(ta.n_types AS BIGINT) AS types_a,
      |  CAST(tb.n_types AS BIGINT) AS types_b,
      |  CAST(n_shared * 1000 // least(ta.n_types, tb.n_types) AS BIGINT)
      |    AS overlap_milli
      |FROM shared
      |JOIN tot ta ON ta.source = src_a
      |JOIN tot tb ON tb.source = src_b
      |ORDER BY src_a, src_b""".stripMargin
  ) { (s, dir) =>
    val sh = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("source"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 8)
      .select(col("source"),
        explode(sequence(lit(0), size(col("t")) - 8)).as("i"),
        col("t"))
      .select(col("source"),
        unhex(md5(array_join(slice(col("t"), col("i") + 1, lit(8)), " ")
          .cast(BinaryType))).as("h"))
    val byType = sh.groupBy("h")
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
    val tot = byType.select(explode(col("srcs")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("n_types"))
    byType
      .select(explode(expr(
        """flatten(transform(srcs,
          |  (a, i) -> transform(slice(srcs, i + 2, size(srcs)),
          |    b -> named_struct('src_a', a, 'src_b', b))))"""
          .stripMargin)).as("pr"))
      .select(col("pr.src_a").as("src_a"), col("pr.src_b").as("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
      // tot is |sources| rows — a domain constant (tens), never
      // data-scaled — so broadcast it DELIBERATELY (guide §3.1): without
      // the hint AQE picks the build side from runtime bytes and, both
      // frames being tiny, sometimes builds the PAIR side instead, which
      // breaks the second join's broadcast reuse (one extra stage) and
      // flips the plan shape run-to-run
      .join(broadcast(tot.toDF("src_a", "types_a")), "src_a")
      .join(broadcast(tot.toDF("src_b", "types_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("types_a"), col("types_b"),
        expr("n_shared * 1000 div least(types_a, types_b)")
          .as("overlap_milli"))
      .orderBy("src_a", "src_b")
  }

  /** Materialized inverted index — "build once, query many", the layout
    * that turns every BM25 query from a corpus scan into a
    * few-directories read:
    *
    *  - `dir/postings/` — (token, doc_id, tf, dl, df), hive-partitioned
    *    by `bucket` = md5-nibble-pair of the token mod [[IndexBuckets]].
    *    df is denormalized onto each posting (one long per row) so query
    *    time needs NO lexicon join; production would split a lexicon
    *    table at a larger B.
    *  - `dir/stats/` — the 1-row (n_docs, sum_dl) corpus totals.
    *
    * At query time the bucket predicate is a LITERAL list derived from
    * the query terms, so directory pruning happens at planning time (a
    * B-bucket index reads |distinct term buckets| directories, never the
    * corpus), and the token IN list is pushed to the parquet scan inside
    * the surviving buckets. At 100 TB: postings shard by bucket across
    * the fleet; a 3-term query touches ≤3 shards. RetrievalSpec proves
    * query-over-index == scan-over-corpus exactly (they share
    * TextRankOps.bm25Score) AND that the scan reads strictly fewer files
    * than the index holds (real pruning, not just a plan string).
    */
  val IndexBuckets = 16

  private[graft] def bucketCol(token: org.apache.spark.sql.Column) =
    (conv(substring(md5(token.cast(BinaryType)), 1, 2), 16, 10)
      .cast(IntegerType) % IndexBuckets).as("bucket")

  /** Driver-side mirror of [[bucketOf]] for deriving the pruning list. */
  private[graft] def bucketOf(token: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    ((d(0) & 0xff) % IndexBuckets + IndexBuckets) % IndexBuckets
  }

  /** Build the index from a documents frame. One explode + one tf
    * aggregate + one df window (both hash-partitioned on the token);
    * the write shuffles once more on bucket so each directory is one
    * writer task's output, not nBuckets small files per task. */
  def writeInvertedIndex(docs: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    val tf = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
        explode(col("toks")).as("token"))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
      .withColumn("bucket", bucketCol(col("token")))
    tf.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/postings")
    TextRankOps.corpusStats(docs)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Score `terms` against the index: bucket-pruned, token-pushed-down
    * postings read → the SAME bm25Score arithmetic as q_bm25_query →
    * top-k. Never touches the documents table. */
  def queryInvertedIndex(s: org.apache.spark.sql.SparkSession, dir: String,
      terms: Seq[String], k: Int = 10): org.apache.spark.sql.DataFrame = {
    val buckets = terms.map(bucketOf).distinct
    val postings = s.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("token").isin(terms: _*))
    TextRankOps.bm25Score(postings, s.read.parquet(s"$dir/stats"))
      .select(col("doc_id"), col("n_terms"),
        col("score_dec").cast(DoubleType).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  val all: Seq[Q] =
    Seq(passageDedup, passageIncr, passageClean, rrfFusion, evalNdcg,
      crossSource)
}
