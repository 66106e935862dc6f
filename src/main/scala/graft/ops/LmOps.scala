package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Language-model-flavored corpus scoring: unigram-LM surprisal (the
  * perplexity-proxy quality filter), PMI token association, and
  * out-of-vocabulary rate — the statistical triage a pretraining corpus
  * pass runs between raw text stats and the expensive model-based
  * filters. (North-star LLM-pipeline surface per BASELINE.json:6; no
  * reference file:line exists — SURVEY §0.)
  *
  * Determinism: every log2 is evaluated on an INTEGER argument and
  * snapped to BIGINT at 1e10 scale (floor(x·1e10 + 0.5) — the
  * q_text_entropy recipe, ulp-drift-proof), so ratios become exact
  * BIGINT differences of snapped logs: log2(a/b) ≈ L(a) − L(b). Sums are
  * integer (order-free); the only floating math is final single
  * divisions — correctly rounded, bit-identical cross-engine.
  */
object LmOps {

  /** Unigram-LM surprisal per document: nll10 = dl·L(T) − Σ_t tf_t·L(f_t)
    * (surprisal of doc under the corpus unigram model, ×1e10), where f_t
    * is the corpus frequency of token t and T the total token count. Top
    * 20 most-surprising docs — the "statistical outlier" shortlist a
    * quality pass reviews first.
    *
    * Scale design: L(f) is computed once per VOCAB entry, not per
    * occurrence; the corpus total T is a 1-row broadcast; the per-doc
    * reduce is one hash aggregation at (doc, token) grain then (doc) —
    * shuffles carry counts, never text. limit(20) plans as
    * TakeOrderedAndProject. */
  val lmScore: Q = Q.checked(
    "q_lm_score",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf
      |       FROM toks GROUP BY doc_id, token),
      |gf AS (SELECT token, CAST(sum(tf) AS BIGINT) AS f FROM tf
      |       GROUP BY token),
      |tot AS (SELECT CAST(sum(f) AS BIGINT) AS t,
      |          CAST(floor(log2(CAST(sum(f) AS DOUBLE)) * 1e10 + 5.0e-1)
      |            AS BIGINT) AS lt
      |        FROM gf),
      |lf AS (SELECT token,
      |         CAST(floor(log2(CAST(f AS DOUBLE)) * 1e10 + 5.0e-1)
      |           AS BIGINT) AS lf
      |       FROM gf),
      |doc AS (
      |  SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS dl,
      |    CAST(sum(tf.tf * lf.lf) AS BIGINT) AS sum_lf
      |  FROM tf JOIN lf ON tf.token = lf.token
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, dl, dl * tot.lt - sum_lf AS nll10,
      |  CAST(dl * tot.lt - sum_lf AS DOUBLE) / 1e10 / CAST(dl AS DOUBLE)
      |    AS nll_per_tok
      |FROM doc, tot
      |ORDER BY nll_per_tok DESC, doc_id LIMIT 20""".stripMargin
  ) { (s, dir) =>
    // fanned: the tokenize+explode otherwise runs inside a single-task
    // scan stage on sub-split input (see Tables.fanned); keyed by doc_id
    // so the (doc_id, token) aggregate reuses the fan-out exchange
    val tf = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val gf = tf.groupBy("token").agg(sum(col("tf")).as("f"))
    val tot = gf.agg(
      floor(log2(sum(col("f")).cast(DoubleType)) * lit(1e10) + lit(0.5))
        .cast(LongType).as("lt"))
    val lf = gf.select(col("token"),
      floor(log2(col("f").cast(DoubleType)) * lit(1e10) + lit(0.5))
        .cast(LongType).as("lf"))
    tf.join(lf, "token")
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast(LongType).as("dl"),
        sum(col("tf") * col("lf")).cast(LongType).as("sum_lf"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("dl"),
        (col("dl") * col("lt") - col("sum_lf")).as("nll10"),
        ((col("dl") * col("lt") - col("sum_lf")).cast(DoubleType)
          / lit(1e10) / col("dl").cast(DoubleType)).as("nll_per_tok"))
      .orderBy(col("nll_per_tok").desc, col("doc_id"))
      .limit(20)
  }

  /** Pointwise mutual information of token pairs over the 100 highest-df
    * vocabulary tokens: pmi10 = L(c_ab·N) − L(c_a·c_b) for pairs
    * co-occurring in ≥ 5 docs — the collocation detector behind phrase
    * mining and tokenizer-merge candidates.
    *
    * Scale design: the vocabulary cap is the asymptotic guard — the
    * per-doc pair generator fans out at most C(100,2) regardless of doc
    * length or corpus size, and the vocab/df table is broadcast. Counts
    * stay ≪ 2^53 so the integer products are exact doubles before log2. */
  val pmi: Q = Q.checked(
    "q_pmi",
    """WITH dtok AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |df AS (SELECT token, count(*) AS df FROM dtok GROUP BY token),
      |voc AS (SELECT token, df FROM (
      |          SELECT token, df,
      |            row_number() OVER (ORDER BY df DESC, token) AS rn
      |          FROM df) WHERE rn <= 100),
      |dv AS (SELECT d.doc_id, d.token, v.df FROM dtok d
      |       JOIN voc v ON d.token = v.token),
      |n AS (SELECT count(*) AS n FROM documents),
      |pair AS (
      |  SELECT a.token AS tok_a, b.token AS tok_b,
      |    max(a.df) AS df_a, max(b.df) AS df_b, count(*) AS c_ab
      |  FROM dv a JOIN dv b
      |    ON a.doc_id = b.doc_id AND a.token < b.token
      |  GROUP BY a.token, b.token HAVING count(*) >= 5)
      |SELECT tok_a, tok_b, c_ab,
      |  CAST(floor(log2(CAST(c_ab * n.n AS DOUBLE)) * 1e10 + 5.0e-1)
      |    AS BIGINT)
      |  - CAST(floor(log2(CAST(df_a * df_b AS DOUBLE)) * 1e10 + 5.0e-1)
      |    AS BIGINT) AS pmi10
      |FROM pair, n
      |ORDER BY pmi10 DESC, tok_a, tok_b LIMIT 20""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    // fanned tokenize (single-task scan stage otherwise — Tables.fanned);
    // the (doc_id, token) distinct reuses the doc_id fan-out exchange
    val dtok = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct()
    val df = dtok.groupBy("token").agg(count(lit(1)).as("df"))
    // top-K under a total order: orderBy+limit plans a fully parallel
    // TakeOrderedAndProject (per-partition partial top-K, merged on the
    // driver) — hash-identical to rank-window+filter under the same
    // tie-break, but never moves the whole vocabulary to one partition.
    val voc = df
      .orderBy(col("df").desc, col("token"))
      .limit(100).select("token", "df")
    val dv = dtok.join(broadcast(voc), "token")
    val n = docs.agg(count(lit(1)).as("n"))
    // pair generation WITHOUT the doc_id self-join: each doc's surviving
    // vocab tokens (≤ 100 by the cap) are collected into one sorted set
    // and the a<b pairs come out of an index HOF map-side — the r14
    // self-join evaluated the dtok⋈voc subtree twice (each side carrying
    // its own copy of the vocab build) and moved both through a doc_id
    // join; this shape pays one doc_id-keyed exchange of ≤100-element
    // arrays and nothing else. df rides inside the struct, so max(df) is
    // the same per-token constant the join carried.
    dv.groupBy("doc_id")
      .agg(sort_array(collect_set(struct(col("token"), col("df"))))
        .as("ts"))
      .select(explode(expr(
        """flatten(transform(ts,
          |  (a, i) -> transform(slice(ts, i + 2, size(ts)),
          |    b -> named_struct('tok_a', a.token, 'df_a', a.df,
          |                      'tok_b', b.token, 'df_b', b.df))))"""
          .stripMargin)).as("pr"))
      .select(col("pr.tok_a").as("tok_a"), col("pr.tok_b").as("tok_b"),
        col("pr.df_a").as("df_a"), col("pr.df_b").as("df_b"))
      .groupBy("tok_a", "tok_b")
      .agg(max(col("df_a")).as("df_a"), max(col("df_b")).as("df_b"),
        count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
      .crossJoin(broadcast(n))
      .select(col("tok_a"), col("tok_b"), col("c_ab"),
        (floor(log2((col("c_ab") * col("n")).cast(DoubleType))
            * lit(1e10) + lit(0.5)).cast(LongType)
          - floor(log2((col("df_a") * col("df_b")).cast(DoubleType))
            * lit(1e10) + lit(0.5)).cast(LongType)).as("pmi10"))
      .orderBy(col("pmi10").desc, col("tok_a"), col("tok_b"))
      .limit(20)
  }

  /** Out-of-vocabulary rate per (lang, source) against the top-500
    * corpus vocabulary — the tokenizer-coverage health metric: a slice
    * whose OOV rate spikes is a slice the tokenizer will shred into
    * bytes. Exact integer sums; the rate is one IEEE division.
    *
    * Scale design: the vocabulary is built once (parallel
    * TakeOrderedAndProject top-K) and broadcast; the corpus-side pass is a map-only explode +
    * broadcast hash join + two-level aggregation — the big side never
    * shuffles at token grain, only (lang, source) partials. */
  val oovRate: Q = Q.checked(
    "q_oov_rate",
    """WITH toks AS (
      |  SELECT doc_id, lang, source,
      |    unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |gf AS (SELECT token, count(*) AS f FROM toks GROUP BY token),
      |voc AS (SELECT token FROM (
      |          SELECT token, row_number() OVER (ORDER BY f DESC, token)
      |            AS rn FROM gf) WHERE rn <= 500)
      |SELECT lang, source, count(*) AS n_tok,
      |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_oov,
      |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) AS oov_rate
      |FROM toks t LEFT JOIN voc v ON t.token = v.token
      |GROUP BY lang, source ORDER BY lang, source""".stripMargin
  ) { (s, dir) =>
    val toks = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), col("lang"), col("source"),
        explode(split(col("text"), " ")).as("token"))
    val gf = toks.groupBy("token").agg(count(lit(1)).as("f"))
    // orderBy+limit → TakeOrderedAndProject: parallel partial top-K,
    // same rows as the rank window under the identical (f desc, token)
    // total order, no single-partition sort of the vocabulary.
    val voc = gf
      .orderBy(col("f").desc, col("token"))
      .limit(500)
      .select(col("token").as("v_token"))
    toks.join(broadcast(voc), col("token") === col("v_token"), "left")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("v_token").isNull, 1).otherwise(0)).cast(LongType)
          .as("n_oov"))
      .select(col("lang"), col("source"), col("n_tok"), col("n_oov"),
        (col("n_oov").cast(DoubleType) / col("n_tok").cast(DoubleType))
          .as("oov_rate"))
      .orderBy("lang", "source")
  }

  /** Zipf slope per language: least-squares fit of ln(freq) against
    * ln(rank) over the top-100 token ranks — the corpus-health signal a
    * curation pass tracks (natural language sits near −1; templated or
    * deduplicated-to-death corpora drift shallow). Scale: token
    * frequency is ONE hash aggregation (vocab-sized output); the rank
    * window runs over the per-lang VOCAB frame, never the token stream;
    * the regression is a 5-row aggregate.
    *
    * Determinism (§7.5): each ln() is snapped once to integer 1e6-units
    * (libm engines agree to 1 ulp ≈ 2e-9 at this scale — far below the
    * 0.5 rounding threshold, the q_text_entropy recipe), every moment
    * (Σx, Σy, Σxy, Σx²) is exact integer arithmetic bounded well inside
    * int64 at the 1e6 snap, and the slope is ONE terminal IEEE division
    * both engines compute identically. */
  val textZipf: Q = Q.checked(
    "q_text_zipf",
    """WITH toks AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT lang, token, count(*) AS f FROM toks GROUP BY 1, 2),
      |rk AS (SELECT lang, f,
      |         row_number() OVER (PARTITION BY lang
      |           ORDER BY f DESC, token) AS rn
      |       FROM tf),
      |top AS (
      |  SELECT lang,
      |    CAST(floor(ln(CAST(rn AS DOUBLE)) * 1e6 + 5.0e-1) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(f AS DOUBLE)) * 1e6 + 5.0e-1) AS BIGINT) AS y
      |  FROM rk WHERE rn <= 100),
      |mo AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x*y) AS BIGINT) AS sxy,
      |         CAST(sum(x*x) AS BIGINT) AS sxx
      |       FROM top GROUP BY lang)
      |SELECT lang, n,
      |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
      |    AS zipf_slope
      |FROM mo ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    val tf = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("f"))
    def snap(c: org.apache.spark.sql.Column) =
      floor(log(c.cast(DoubleType)) * lit(1e6) + lit(0.5)).cast(LongType)
    // k-bounded top-100 per language via TopKDoubleStrAgg instead of a
    // rank window: the window twin sorts a language's ENTIRE vocabulary
    // in one task (lang count is ~dozens ⇒ that is the parallelism cap);
    // the aggregator's buffer caps the shuffle at 100 (f, token) pairs
    // per lang per map partition. Counts < 2^52 are exact as Double, and
    // the order (f desc, token asc) matches the window twin ⇒
    // hash-identical regression inputs.
    val top100 = udaf(new graft.functions.KAggs.TopKDoubleStrAgg(100))
    tf.groupBy("lang")
      .agg(top100(col("f").cast(DoubleType), col("token")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("lang"), (col("pos") + 1).as("rn"), col("t._1").as("f"))
      .select(col("lang"), snap(col("rn")).as("x"), snap(col("f")).as("y"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("lang"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType) /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
          .as("zipf_slope"))
      .orderBy("lang")
  }

  /** Per-source bigram novelty: of each source's DISTINCT bigrams, the
    * share that appears in NO other source — the cross-slice overlap
    * triage a corpus-mixing pass runs before weighting a new crawl slice
    * (a slice whose n-grams are all shared adds diversity, not volume).
    *
    * Scale design: ONE heavy exchange. The corpus explodes once and
    * aggregates straight to bigram grain with `collect_set(source)` —
    * the set is bounded by the SOURCE COUNT (a config-sized dimension,
    * never data-sized), and the partial-aggregate side dedups sources
    * map-side, so the shuffle carries ≤ |sources| entries per bigram.
    * Re-exploding the set yields every (bigram, source) pair already
    * tagged with its spread — no second corpus scan, no self-join (the
    * naïve pairs⋈spread formulation scans and explodes the corpus
    * TWICE). The final source-grain aggregate is dimension-sized.
    * Novelty is an exact integer ratio (×1000, floor div) — no float
    * drift. */
  val ngramNovelty: Q = Q.checked(
    "q_ngram_novelty",
    """WITH pairs AS (
      |  SELECT DISTINCT source, bigram FROM (
      |    SELECT source,
      |      unnest(list_transform(range(1, len(string_split(text, ' '))),
      |        i -> string_split(text, ' ')[i] || ' ' ||
      |             string_split(text, ' ')[i+1])) AS bigram
      |    FROM documents)),
      |spread AS (
      |  SELECT bigram, count(*) AS n_src FROM pairs GROUP BY bigram)
      |SELECT source,
      |  count(*) AS n_bigrams,
      |  CAST(count_if(n_src = 1) AS BIGINT) AS n_novel,
      |  CAST(count_if(n_src = 1) AS BIGINT) * 1000 // count(*)
      |    AS novelty_milli
      |FROM pairs JOIN spread USING (bigram)
      |GROUP BY source ORDER BY source""".stripMargin
  ) { (s, dir) =>
    Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("source"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""
          .stripMargin)).as("bigram"))
      .groupBy("bigram")
      .agg(collect_set(col("source")).as("srcs"))
      .select(explode(col("srcs")).as("source"), size(col("srcs")).as("n_src"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("n_src") === 1, 1)).as("n_novel"))
      .withColumn("novelty_milli", expr("n_novel * 1000 div n_bigrams"))
      .orderBy("source")
  }

  /** Vocabulary-growth (Heaps-law) curve over the corpus in arrival
    * order: cumulative distinct bigram types vs cumulative bigram tokens
    * across 20 fixed doc-id buckets — the saturation signal that tells a
    * crawl "new data has stopped adding new language" before another
    * 10 TB is ingested.
    *
    * Scale design: a bigram's FIRST document (min doc_id) is a vocab-
    * sized hash aggregate with map-side combine — the cumulative-distinct
    * problem never touches a data-scaled window. The bucket count is
    * FIXED at 20 regardless of corpus size (doc_id·20 div n_docs), so
    * the prefix-sum window runs over exactly ≤20 rows — a bounded stage
    * frame (q_filter_funnel precedent), never a per-doc frame. */
  val vocabGrowth: Q = Q.checked(
    "q_vocab_growth",
    """WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |bg AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, len(string_split(text, ' '))),
      |      i -> string_split(text, ' ')[i] || ' ' ||
      |           string_split(text, ' ')[i+1])) AS bigram
      |  FROM documents),
      |bgfirst AS (SELECT bigram, min(doc_id) AS first_doc FROM bg
      |            GROUP BY bigram),
      |firsts AS (
      |  SELECT first_doc * 20 // tot.n_docs AS b, count(*) AS nt
      |  FROM bgfirst, tot GROUP BY 1),
      |toks AS (
      |  SELECT doc_id * 20 // tot.n_docs AS b, count(*) AS nbg
      |  FROM bg, tot GROUP BY 1),
      |cum AS (
      |  SELECT t.b AS bucket,
      |    CAST(sum(t.nbg) OVER (ORDER BY t.b ROWS BETWEEN UNBOUNDED
      |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_bigrams,
      |    CAST(sum(coalesce(f.nt, 0)) OVER (ORDER BY t.b ROWS BETWEEN
      |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_types
      |  FROM toks t LEFT JOIN firsts f ON t.b = f.b)
      |SELECT bucket, cum_bigrams, cum_types,
      |  1000 * cum_types // cum_bigrams AS growth_milli
      |FROM cum ORDER BY bucket""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val tot = docs.agg(count(lit(1)).as("n_docs"))
    val bg = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""
          .stripMargin)).as("bigram"))
    val firsts = bg.groupBy("bigram").agg(min(col("doc_id")).as("first_doc"))
      .crossJoin(broadcast(tot))
      .groupBy(expr("first_doc * 20 div n_docs").as("b"))
      .agg(count(lit(1)).as("nt"))
    val toks = bg.crossJoin(broadcast(tot))
      .groupBy(expr("doc_id * 20 div n_docs").as("b"))
      .agg(count(lit(1)).as("nbg"))
    // ≤20-row stage frame: the partition-less prefix sum is bounded by
    // the FIXED bucket count, not the corpus (BASELINE.md warning note)
    val w = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(firsts, Seq("b"), "left")
      .select(col("b").as("bucket"),
        sum(col("nbg")).over(w).cast(LongType).as("cum_bigrams"),
        sum(coalesce(col("nt"), lit(0))).over(w).cast(LongType)
          .as("cum_types"))
      .select(col("bucket"), col("cum_bigrams"), col("cum_types"),
        expr("1000 * cum_types div cum_bigrams").as("growth_milli"))
      .orderBy("bucket")
  }

  /** Per-source KL divergence from the corpus unigram distribution —
    * KL(p_source ‖ p_corpus) in bits: the "which slice diverges from the
    * mix" drift number read next to q_ngram_novelty before reweighting a
    * source. Identical integer-snapped-log recipe as lmScore: each log2
    * is evaluated once on an integer count and snapped to BIGINT 1e10
    * micro-units, so every per-token term f_st·(L(f_st)−L(n_s)−L(f_t)+
    * L(N)) is an exact integer, sums are fold-order-free, and the only
    * IEEE ops are the two terminal divisions.
    *
    * Scale: token-grain frames are vocab-sized hash aggregates (map-side
    * combined); the source totals (|sources| rows) and the 1-row corpus
    * total broadcast back — nothing data-scaled past the first agg. */
  val klSource: Q = Q.checked(
    "q_kl_source",
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |st AS (SELECT source, token, CAST(count(*) AS BIGINT) AS f_st
      |       FROM tok GROUP BY 1, 2),
      |t AS (SELECT token, CAST(count(*) AS BIGINT) AS f_t FROM tok
      |      GROUP BY 1),
      |ns AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM tok
      |       GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
      |terms AS (
      |  SELECT st.source,
      |    st.f_st * (
      |      CAST(floor(log2(CAST(st.f_st AS DOUBLE)) * 1e10 + 5.0e-1)
      |        AS BIGINT)
      |      - CAST(floor(log2(CAST(ns.n_s AS DOUBLE)) * 1e10 + 5.0e-1)
      |        AS BIGINT)
      |      - CAST(floor(log2(CAST(t.f_t AS DOUBLE)) * 1e10 + 5.0e-1)
      |        AS BIGINT)
      |      + CAST(floor(log2(CAST(tot.n AS DOUBLE)) * 1e10 + 5.0e-1)
      |        AS BIGINT)) AS t10,
      |    ns.n_s AS n_s
      |  FROM st JOIN t ON st.token = t.token
      |    JOIN ns ON st.source = ns.source, tot)
      |SELECT source, CAST(max(n_s) AS BIGINT) AS n_tokens,
      |  CAST(sum(t10) AS DOUBLE) / 1e10 / CAST(max(n_s) AS DOUBLE)
      |    AS kl_bits
      |FROM terms GROUP BY source ORDER BY source""".stripMargin
  ) { (s, dir) =>
    def snap10(c: org.apache.spark.sql.Column) =
      floor(log2(c.cast(DoubleType)) * lit(1e10) + lit(0.5)).cast(LongType)
    val tok = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
    val st = tok.groupBy("source", "token").agg(count(lit(1)).as("f_st"))
    val t = tok.groupBy("token").agg(count(lit(1)).as("f_t"))
    val ns = tok.groupBy("source").agg(count(lit(1)).as("n_s"))
    val tot = tok.agg(count(lit(1)).as("n"))
    st.join(t, "token").join(broadcast(ns), "source")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"),
        (col("f_st") * (snap10(col("f_st")) - snap10(col("n_s"))
          - snap10(col("f_t")) + snap10(col("n")))).as("t10"))
      .groupBy("source")
      .agg(max(col("n_s")).as("n_tokens"),
        (sum(col("t10")).cast(DoubleType) / lit(1e10)
          / max(col("n_s")).cast(DoubleType)).as("kl_bits"))
      .orderBy("source")
  }

  /** Bigram LM with stupid backoff, trained on the in-corpus docs
    * (doc_id % 5 ≠ 0 — the established held-out convention) and scored
    * on the held-out fifth: per held-out doc,
    * nll = Σ over its bigrams of
    *   seen (w1,w2) in train:  L(c(w1)) − L(c(w1,w2))   [−log2 c12/c1]
    *   unseen:                 L(T) − L(c(w2)) + K      [−log2 α·c2/T]
    * with α = 0.4 (Brants et al. stupid backoff), K = round(−log2 0.4 ·
    * 1e10) = 13219280949 hardcoded identically in both engines, and an
    * OOV w2 counted as 1 (L = 0). Top 20 most-surprising held-out docs —
    * the KenLM-style fluency filter one rung above q_lm_score's unigram.
    *
    * Scale design: snapped logs are computed once per DISTINCT unigram /
    * bigram TYPE, never per occurrence; the train total is a 1-row
    * broadcast; the only data-grain operations are the doc-partitioned
    * lag window (scales with doc count, no tiny-key cliff) and the
    * held-bigram ⋈ count-table joins, which carry counts — never text
    * bodies. Integer nll terms sum fold-order-free; the single terminal
    * division is correctly rounded IEEE. */
  val lmBigram: Q = Q.checked(
    "q_lm_bigram",
    """WITH toks AS (
      |  SELECT doc_id,
      |    generate_subscripts(string_split(text, ' '), 1) AS pos,
      |    unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |big AS (
      |  SELECT doc_id, lag(token) OVER (PARTITION BY doc_id ORDER BY pos)
      |    AS w1, token AS w2
      |  FROM toks),
      |tbig AS (
      |  SELECT w1, w2,
      |    CAST(floor(log2(CAST(count(*) AS DOUBLE)) * 1e10 + 5.0e-1)
      |      AS BIGINT) AS l12
      |  FROM big WHERE w1 IS NOT NULL AND doc_id % 5 <> 0 GROUP BY w1, w2),
      |tuni AS (SELECT token AS w, count(*) AS c FROM toks
      |         WHERE doc_id % 5 <> 0 GROUP BY token),
      |luni AS (SELECT w,
      |    CAST(floor(log2(CAST(c AS DOUBLE)) * 1e10 + 5.0e-1) AS BIGINT)
      |      AS lc
      |  FROM tuni),
      |tot AS (SELECT CAST(floor(log2(CAST(sum(c) AS DOUBLE)) * 1e10
      |          + 5.0e-1) AS BIGINT) AS lt FROM tuni),
      |held AS (SELECT doc_id, w1, w2 FROM big
      |         WHERE w1 IS NOT NULL AND doc_id % 5 = 0),
      |scored AS (
      |  SELECT h.doc_id,
      |    CASE WHEN tb.l12 IS NOT NULL THEN u1.lc - tb.l12
      |         ELSE tot.lt - coalesce(u2.lc, 0) + 13219280949 END AS nll
      |  FROM held h
      |  LEFT JOIN tbig tb ON h.w1 = tb.w1 AND h.w2 = tb.w2
      |  LEFT JOIN luni u1 ON h.w1 = u1.w
      |  LEFT JOIN luni u2 ON h.w2 = u2.w
      |  CROSS JOIN tot)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(nll) AS BIGINT) AS nll10,
      |  CAST(sum(nll) AS DOUBLE) / 1e10 / count(*) AS nll_per_bigram
      |FROM scored GROUP BY doc_id
      |ORDER BY nll_per_bigram DESC, doc_id LIMIT 20""".stripMargin
  ) { (s, dir) =>
    def snapLog2(c: org.apache.spark.sql.Column) =
      floor(log2(c.cast(DoubleType)) * lit(1e10) + lit(0.5)).cast(LongType)
    val toks = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
    val big = toks.withColumn("w1",
        lag(col("token"), 1).over(
          Window.partitionBy("doc_id").orderBy("pos")))
      .withColumnRenamed("token", "w2")
    val trainBig = big
      .filter(col("w1").isNotNull && col("doc_id") % 5 =!= 0)
      .groupBy("w1", "w2").agg(snapLog2(count(lit(1))).as("l12"))
    val trainUni = toks.filter(col("doc_id") % 5 =!= 0)
      .groupBy("token").agg(count(lit(1)).as("c"))
    val luni = trainUni.select(col("token").as("w"), snapLog2(col("c")).as("lc"))
    val tot = trainUni.agg(snapLog2(sum(col("c"))).as("lt"))
    val held = big.filter(col("w1").isNotNull && col("doc_id") % 5 === 0)
      .select("doc_id", "w1", "w2")
    held
      .join(trainBig, Seq("w1", "w2"), "left_outer")
      .join(luni.select(col("w").as("w1"), col("lc").as("lc1")),
        Seq("w1"), "left_outer")
      .join(luni.select(col("w").as("w2"), col("lc").as("lc2")),
        Seq("w2"), "left_outer")
      .crossJoin(broadcast(tot))
      .withColumn("nll",
        when(col("l12").isNotNull, col("lc1") - col("l12"))
          .otherwise(col("lt") - coalesce(col("lc2"), lit(0L))
            + lit(13219280949L)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("nll")).cast(LongType).as("nll10"),
        (sum(col("nll")).cast(DoubleType) / lit(1e10)
          / count(lit(1)).cast(DoubleType)).as("nll_per_bigram"))
      .orderBy(col("nll_per_bigram").desc, col("doc_id"))
      .limit(20)
  }

  val all: Seq[Q] = Seq(lmScore, pmi, oovRate, textZipf, ngramNovelty,
    vocabGrowth, klSource, lmBigram)
}
