package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data curation operators (north-star brief: the ops a 100 TB
  * LLM-pretraining pipeline runs between raw crawl and tokenizer):
  * deterministic sampling/splits, corpus vocabulary + TF-IDF, n-gram
  * statistics, sequence packing, quantile/dispersion profiling, and the
  * composite quality→dedup→retention pipeline.
  *
  * Scale design notes per query are inline; the common rules: every
  * per-document stage is a map-only projection (no shuffle), every
  * corpus-wide stage is ONE hash shuffle with map-side partial
  * aggregation, and top-k never global-sorts (TakeOrderedAndProject).
  * Determinism follows SURVEY §7.5: integer-exact scores where possible
  * (scaled integer idf, not ln), single IEEE divisions otherwise, total
  * ORDER BY, BIGINT casts on every DuckDB integer sum.
  */
object CurateOps {

  /** Deterministic train/eval split by content-independent key hash:
    * split = first md5 hex nibble of the doc id, train ≈ 13/16. The split
    * is reproducible across runs/engines/partitionings and stable under
    * corpus growth (a doc's split never changes when neighbors arrive) —
    * the property random() sampling lacks. Map-only + one tiny shuffle. */
  val sampleSplit: Q = Q.checked(
    "q_sample_split",
    """SELECT lang,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'd'
      |       THEN 'train' ELSE 'eval' END AS split,
      |  count(*) AS n_docs,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .withColumn("split",
        when(substring(md5(col("doc_id").cast(StringType)), 1, 1) < "d",
          "train").otherwise("eval"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("lang", "split")
  }

  /** Corpus vocabulary: term frequency + document frequency, top 100.
    * explode → ONE groupBy(token) shuffle (map-side combined); df via
    * count(DISTINCT doc_id) — Spark plans the standard two-phase distinct
    * expansion. Top-k is TakeOrderedAndProject, never a global sort. */
  val vocabTopk: Q = Q.checked(
    "q_vocab_topk",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents)
      |SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      |FROM toks GROUP BY token ORDER BY tf DESC, token LIMIT 100""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token"))
      .limit(100)
  }

  /** TF-IDF with an integer-exact scaled idf: idf_milli = (N·1000) div df
    * (floor division — identical in both engines), score = tf·idf_milli.
    * Integer arithmetic sidesteps ln()'s cross-engine last-ulp drift
    * entirely (SURVEY §7.5). N is a 1-row broadcast, not a second pass
    * over the big side. */
  val tfidf: Q = Q.checked(
    "q_tfidf",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |stats AS (
      |  SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      |  FROM toks GROUP BY token),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT token, tf, df, tf * ((n_docs * 1000) // df) AS tfidf_milli
      |FROM stats, n
      |ORDER BY tfidf_milli DESC, token LIMIT 50""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val stats = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    stats.crossJoin(broadcast(n))
      .withColumn("tfidf_milli", col("tf") * expr("(n_docs * 1000) div df"))
      .select("token", "tf", "df", "tfidf_milli")
      .orderBy(col("tfidf_milli").desc, col("token"))
      .limit(50)
  }

  /** Bigram (2-gram) counts, top 50 — n-gram LM corpus statistics.
    * Docs with <2 tokens are filtered BEFORE the transform on the Spark
    * side: sequence(1, 0) is a DESCENDING [1,0] in Spark (the
    * sampleFrames footgun), while DuckDB's range(1,1) is empty. */
  val ngramCounts: Q = Q.checked(
    "q_ngram_counts",
    """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i+1])) AS bigram
      |  FROM t)
      |SELECT bigram, count(*) AS n
      |FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""
          .stripMargin)).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(50)
  }

  /** Sequence packing: assign docs (per lang, in doc_id order) to
    * fixed-budget token bins of 2048 — bin_id = floor(tokens-before /
    * 2048), the deterministic offset-packing a tokenizer sharder runs.
    * One window shuffle on lang (in-partition running sum), one tiny
    * groupBy. At scale the window key would be (lang, shard) to bound
    * partition width; the running sum itself is O(1) memory. */
  val packBins: Q = Q.checked(
    "q_pack_bins",
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    len(string_split(text, ' ')) AS n_tok
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, lang, n_tok,
      |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) // 2048 AS bin_id
      |  FROM d)
      |SELECT lang, bin_id, count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM w GROUP BY lang, bin_id ORDER BY lang, bin_id""".stripMargin
  ) { (s, dir) =>
    // Two-pass bucketed prefix sum (the q_skyline treatment): a plain
    // Window.partitionBy(lang) running sum puts one LANGUAGE's whole
    // corpus in one task — parallelism capped at #languages, per-task
    // work corpus-scale. Instead: coarse doc_id buckets → per-bucket
    // totals → prefix offsets over the BUCKET frame (corpus/4096 rows)
    // → broadcast back → intra-bucket running sum partitioned by
    // (lang, bucket). Same cum_before values, hash-identical bins.
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
      .withColumn("bkt", expr("doc_id div 4096"))
    val offsets = d.groupBy("lang", "bkt")
      .agg(sum("n_tok").as("bkt_tok"))
      .withColumn("offset", coalesce(
        sum(col("bkt_tok")).over(Window.partitionBy("lang").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("lang", "bkt", "offset")
    val intra = Window.partitionBy("lang", "bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    // no forced broadcast: the offsets frame is corpus/4096 rows — tiny
    // until it isn't (the q_winsorize guard lesson); AQE broadcasts it
    // while small and falls back to a shuffle join past the threshold
    d.join(offsets, Seq("lang", "bkt"))
      .withColumn("cum_before",
        col("offset") + coalesce(sum(col("n_tok")).over(intra), lit(0L)))
      .withColumn("bin_id", expr("cum_before div 2048"))
      .groupBy("lang", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy("lang", "bin_id")
  }

  /** The composite curation pipeline in one query: quality gate (token
    * count in [20,400], type-token ratio ≥ 0.3) → exact dedup (survivor =
    * min doc_id per md5(text)) → per-lang retention report. The quality
    * stage is map-only; dedup is one hash shuffle on md5; the left join
    * back is on the 8-byte survivor id. Retention is a single IEEE
    * division of exact counts. */
  val curate: Q = Q.checked(
    "q_curate",
    """WITH q AS (
      |  SELECT doc_id, lang, text,
      |    len(string_split(text, ' ')) AS n_tok,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS ttr
      |  FROM documents),
      |flags AS (
      |  SELECT doc_id, lang, text,
      |    CASE WHEN n_tok BETWEEN 20 AND 400 AND ttr >= 0.3
      |         THEN 1 ELSE 0 END AS is_kept
      |  FROM q),
      |surv AS (
      |  SELECT min(doc_id) AS sid FROM flags WHERE is_kept = 1
      |  GROUP BY md5(text))
      |SELECT lang, count(*) AS n_total,
      |  CAST(sum(is_kept) AS BIGINT) AS n_quality,
      |  CAST(sum(CASE WHEN sid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_final,
      |  CAST(sum(CASE WHEN sid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) AS retention
      |FROM flags LEFT JOIN surv ON doc_id = sid
      |GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    val toks = split(col("text"), " ")
    val flags = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        size(toks).cast(LongType).as("n_tok"),
        (size(array_distinct(toks)).cast(DoubleType) / size(toks)).as("ttr"))
      .withColumn("is_kept",
        when(col("n_tok").between(20, 400) && col("ttr") >= 0.3, 1L)
          .otherwise(0L))
    val surv = flags.filter(col("is_kept") === 1)
      .groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("sid"))
      .select("sid")
    flags.join(surv, col("doc_id") === col("sid"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        sum(col("is_kept")).as("n_quality"),
        sum(when(col("sid").isNotNull, 1L).otherwise(0L)).as("n_final"),
        (sum(when(col("sid").isNotNull, 1L).otherwise(0L)).cast(DoubleType) /
          count(lit(1))).as("retention"))
      .orderBy("lang")
  }

  /** Discrete quantiles (p25/p50/p75 of account balance per market
    * segment) via the rank-crossing formulation — the value at row
    * ceil(q·n) of the (value, key)-ordered partition. No interpolation,
    * so no cross-engine FP-combination drift: every output is an element
    * of the data. One window shuffle + one tiny agg. */
  val quantileDisc: Q = Q.checked(
    "q_quantile_disc",
    """WITH r AS (
      |  SELECT c_mktsegment, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal, c_custkey) AS rn,
      |    count(*) OVER (PARTITION BY c_mktsegment) AS n
      |  FROM customer)
      |SELECT c_mktsegment,
      |  min(CASE WHEN rn * 4 >= n THEN c_acctbal END) AS p25,
      |  min(CASE WHEN rn * 2 >= n THEN c_acctbal END) AS p50,
      |  min(CASE WHEN rn * 4 >= n * 3 THEN c_acctbal END) AS p75
      |FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, dir) =>
    // global rank via the bucketed two-pass (RankedFrames) — a direct
    // per-segment window would sort the whole corpus on ~5 tasks
    RankedFrames.rankedByValue(
        Tables.customer(s, dir)
          .select("c_mktsegment", "c_acctbal", "c_custkey"),
        "c_mktsegment", "c_acctbal", "c_custkey")
      .groupBy("c_mktsegment")
      .agg(
        min(when(col("rn") * 4 >= col("n"), col("c_acctbal"))).as("p25"),
        min(when(col("rn") * 2 >= col("n"), col("c_acctbal"))).as("p50"),
        min(when(col("rn") * 4 >= col("n") * 3, col("c_acctbal"))).as("p75"))
      .orderBy("c_mktsegment")
  }

  /** Distribution windows: percent_rank + cume_dist of account balance
    * within nation. Both are rank-count ratios — single IEEE divisions of
    * exact integers, bit-identical cross-engine. One window shuffle. */
  val winCume: Q = Q.checked(
    "q_win_cume",
    """SELECT c_custkey, c_nationkey,
      |  percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal)
      |    AS pr,
      |  cume_dist() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal)
      |    AS cd
      |FROM customer ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
      .orderBy("c_custkey")
  }

  /** Near-dup clustering: two blocking passes (40-char prefix + 40-char
    * suffix) emit candidate pairs; connected components stitch pairs into
    * clusters (similarity is not transitive — retention policy needs the
    * transitive closure); component id = min doc_id. Spark side is
    * iterative min-label propagation ([[graft.dedup.Components]] — one
    * shuffle join per round, lineage checkpointed); the oracle is the
    * same fixpoint via a recursive CTE. Both converge to the identical
    * unique labeling. */
  val dedupComponents: Q = Q.checked(
    "q_dedup_components",
    """WITH RECURSIVE
      |k AS (SELECT doc_id, substr(text, 1, 40) AS k1,
      |        substr(text, greatest(length(text) - 39, 1), 40) AS k2
      |      FROM documents),
      |e AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst FROM k a JOIN k b
      |    ON a.k1 = b.k1 AND a.doc_id <> b.doc_id
      |  UNION
      |  SELECT a.doc_id, b.doc_id FROM k a JOIN k b
      |    ON a.k2 = b.k2 AND a.doc_id <> b.doc_id),
      |reach(src, dst) AS (
      |  SELECT src, src FROM e
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src)
      |SELECT src AS doc_id, min(dst) AS component_id
      |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val k = Tables.documents(s, dir).select(col("doc_id"),
      substring(col("text"), 1, 40).as("k1"),
      expr("substring(text, greatest(length(text) - 39, 1), 40)").as("k2"))
    def pass(key: String) = {
      val a = k.select(col("doc_id").as("src"), col(key).as("bk"))
      val b = k.select(col("doc_id").as("dst"), col(key).as("bk_b"))
      a.join(b, col("bk") === col("bk_b") && col("src") =!= col("dst"))
        .select("src", "dst")
    }
    val edges = pass("k1").unionByName(pass("k2")).distinct()
    graft.dedup.Components.connectedComponents(edges)
      .select(col("id").as("doc_id"), col("comp").as("component_id"))
      .orderBy("doc_id")
  }

  /** Table profiling — the ANALYZE-TABLE primitive a pipeline runs before
    * choosing partition counts and join strategies: per-column row count,
    * nulls, distincts, min/max (stringified for a uniform schema). ONE
    * scan computes every metric (Spark plans the multi-distinct via one
    * expand, still a single pass over the parquet); the long output shape
    * comes from unpivoting the single aggregated row, NOT from per-column
    * passes. */
  val profile: Q = Q.checked(
    "q_profile",
    """WITH m AS (
      |  SELECT count(*) AS n,
      |    count(c_name) AS nn_name, count(DISTINCT c_name) AS nd_name,
      |      CAST(min(c_name) AS VARCHAR) AS mn_name,
      |      CAST(max(c_name) AS VARCHAR) AS mx_name,
      |    count(c_nationkey) AS nn_nat, count(DISTINCT c_nationkey) AS nd_nat,
      |      CAST(min(c_nationkey) AS VARCHAR) AS mn_nat,
      |      CAST(max(c_nationkey) AS VARCHAR) AS mx_nat,
      |    count(c_mktsegment) AS nn_seg, count(DISTINCT c_mktsegment) AS nd_seg,
      |      CAST(min(c_mktsegment) AS VARCHAR) AS mn_seg,
      |      CAST(max(c_mktsegment) AS VARCHAR) AS mx_seg
      |  FROM customer)
      |SELECT col_name, n_rows, n_nonnull, n_distinct, min_val, max_val
      |FROM (
      |  SELECT 'c_name' AS col_name, n AS n_rows, nn_name AS n_nonnull,
      |         nd_name AS n_distinct, mn_name AS min_val, mx_name AS max_val
      |  FROM m
      |  UNION ALL
      |  SELECT 'c_nationkey', n, nn_nat, nd_nat, mn_nat, mx_nat FROM m
      |  UNION ALL
      |  SELECT 'c_mktsegment', n, nn_seg, nd_seg, mn_seg, mx_seg FROM m)
      |ORDER BY col_name""".stripMargin
  ) { (s, dir) =>
    val agg = Tables.customer(s, dir).agg(
      count(lit(1)).as("n"),
      count(col("c_name")).as("nn_name"),
      countDistinct(col("c_name")).as("nd_name"),
      min(col("c_name")).cast(StringType).as("mn_name"),
      max(col("c_name")).cast(StringType).as("mx_name"),
      count(col("c_nationkey")).as("nn_nat"),
      countDistinct(col("c_nationkey")).as("nd_nat"),
      min(col("c_nationkey")).cast(StringType).as("mn_nat"),
      max(col("c_nationkey")).cast(StringType).as("mx_nat"),
      count(col("c_mktsegment")).as("nn_seg"),
      countDistinct(col("c_mktsegment")).as("nd_seg"),
      min(col("c_mktsegment")).cast(StringType).as("mn_seg"),
      max(col("c_mktsegment")).cast(StringType).as("mx_seg"))
    agg.select(expr(
      """stack(3,
        |  'c_name',       nn_name, nd_name, mn_name, mx_name,
        |  'c_nationkey',  nn_nat,  nd_nat,  mn_nat,  mx_nat,
        |  'c_mktsegment', nn_seg,  nd_seg,  mn_seg,  mx_seg)
        |AS (col_name, n_nonnull, n_distinct, min_val, max_val)""".stripMargin),
      col("n").as("n_rows"))
      .select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_val",
        "max_val")
      .orderBy("col_name")
  }

  /** Fuzzy entity matching (sorted-neighborhood ER): Levenshtein ≤ 1 over
    * name pairs inside (nation, segment) blocks, restricted to a key
    * window of W = 400 — pair count grows O(n·W), linear in n, where
    * unwindowed within-block pairs grow O(block²) (the q_dedup_embed
    * round-2 lesson, applied preemptively here). The exact-DP edit
    * distance agrees cross-engine. Spark side bucketizes the window into
    * an EQUI-join on (nation, segment, key div W) with side a exploded
    * into {bucket, bucket+1} — no range probe, no nested loop. At real
    * scale the neighborhood ordering comes from a phonetic/q-gram sort
    * key rather than the surrogate key; the shape is identical. */
  val fuzzyMatch: Q = Q.checked(
    "q_fuzzy_match",
    """SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
      |  a.c_name AS name_a, b.c_name AS name_b,
      |  CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
      |FROM customer a JOIN customer b
      |  ON a.c_nationkey = b.c_nationkey
      |  AND a.c_mktsegment = b.c_mktsegment
      |  AND b.c_custkey > a.c_custkey AND b.c_custkey <= a.c_custkey + 400
      |WHERE levenshtein(a.c_name, b.c_name) <= 1
      |ORDER BY key_a, key_b""".stripMargin
  ) { (s, dir) =>
    BlockedSelfJoin.windowPairs(Tables.customer(s, dir), "c_custkey",
        Seq("c_nationkey", "c_mktsegment"), Seq("c_name"), 400)
      .withColumn("edit_dist",
        levenshtein(col("c_name_a"), col("c_name_b")).cast(LongType))
      .filter(col("edit_dist") <= 1)
      .select(col("key_a"), col("key_b"), col("c_name_a").as("name_a"),
        col("c_name_b").as("name_b"), col("edit_dist"))
      .orderBy("key_a", "key_b")
  }

  /** Per-language quota sampling: exactly min(quota, n) docs per lang,
    * chosen by md5-rank — deterministic, uniform-ish, and stable under
    * corpus growth ordering (a doc's rank moves only when same-lang docs
    * arrive). The window sorts (hash, doc_id) — a total order, so both
    * engines pick the identical set. One window shuffle on lang. */
  val sampleQuota: Q = Q.checked(
    "q_sample_quota",
    """WITH r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, lang, rn FROM r WHERE rn <= 40
      |ORDER BY lang, rn""".stripMargin
  ) { (s, dir) =>
    // k-bounded bottom-40 per language via BottomKStrAgg instead of a
    // row_number window: lang cardinality is ~dozens, so the window twin
    // sorts a language's whole corpus in one task; the aggregator's
    // buffer caps the shuffle at 40 (hash, id) pairs per lang per map
    // partition. Same order (md5 asc, doc_id asc) ⇒ hash-identical.
    val bot40 = udaf(new graft.functions.KAggs.BottomKStrAgg(40))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast(StringType)).as("hx"))
      .groupBy("lang")
      .agg(bot40(col("hx"), col("doc_id")).as("bot"))
      .select(col("lang"), posexplode(col("bot")).as(Seq("pos", "t")))
      .select(col("t._2").as("doc_id"), col("lang"),
        (col("pos") + 1).cast(LongType).as("rn"))
      .orderBy("lang", "rn")
  }

  /** Data-mixing weights: per source, the up/down-sampling factor that
    * moves its token share to a uniform target (1/n_sources) — the
    * pretraining mixture computation. share and weight are single IEEE
    * divisions of exact integer token counts (bit-identical
    * cross-engine); the per-source aggregate is ONE shuffle and the
    * totals join is a 1-row broadcast. */
  val mixWeights: Q = Q.checked(
    "q_mix_weights",
    """WITH per_src AS (
      |  SELECT source,
      |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
      |      AS toks
      |  FROM documents GROUP BY source),
      |tot AS (
      |  SELECT CAST(sum(toks) AS BIGINT) AS all_toks,
      |    count(*) AS n_src
      |  FROM per_src)
      |SELECT source, toks,
      |  CAST(toks AS DOUBLE) / all_toks AS share,
      |  (CAST(all_toks AS DOUBLE) / n_src) / toks AS weight
      |FROM per_src, tot ORDER BY source""".stripMargin
  ) { (s, dir) =>
    val perSrc = Tables.documents(s, dir)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast(LongType)).as("toks"))
    val tot = perSrc.agg(sum(col("toks")).as("all_toks"),
      count(lit(1)).as("n_src"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("toks"),
        (col("toks").cast(DoubleType) / col("all_toks")).as("share"),
        ((col("all_toks").cast(DoubleType) / col("n_src")) / col("toks"))
          .as("weight"))
      .orderBy("source")
  }

  /** Near-dup components from 40-char prefix/suffix blocking keys —
    * the shared transitive-closure frame under q_cluster_canonical and
    * q_split_leakfree: equal prefix OR equal suffix is an edge,
    * checkpoint-truncated min-label propagation closes it. Only docs
    * with a blocking-key collision enter the edge frame — a tiny slice
    * of the corpus; everyone else never touches the iteration. */
  /** 40-char prefix/suffix blocking keys per doc — the near-dup edge
    * grain shared by q_cluster_canonical, q_split_leakfree and
    * q_split_contamination. */
  private def blockingKeys(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      substring(col("text"), 1, 40).as("k1"),
      expr("substring(text, greatest(length(text) - 39, 1), 40)").as("k2"))

  private def prefixSuffixComponents(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val k = blockingKeys(docs)
    def pass(key: String) = {
      val a = k.select(col("doc_id").as("src"), col(key).as("bk"))
      val b = k.select(col("doc_id").as("dst"), col(key).as("bk_b"))
      a.join(b, col("bk") === col("bk_b") && col("src") =!= col("dst"))
        .select("src", "dst")
    }
    val edges = pass("k1").unionByName(pass("k2")).distinct()
    graft.dedup.Components.connectedComponents(edges)
      .select(col("id").as("doc_id"), col("comp").as("component_id"))
  }

  /** Canonical-document election per near-dup cluster — the retention
    * step after q_dedup_components' transitive closure: inside every
    * multi-member cluster keep the longest document (n_chars desc, then
    * min doc_id — a total order, so the survivor is unique). This is the
    * policy half of dedup: components say WHAT is duplicated, this says
    * WHICH copy the corpus keeps.
    *
    * Scale design: the rank window runs at cluster grain over the
    * (doc → component) frame, never the raw text; the documents join
    * carries only (doc_id, n_chars). Every cluster in the frame has ≥ 2
    * members by construction (components are built from edges). */
  val clusterCanonical: Q = Q.checked(
    "q_cluster_canonical",
    """WITH RECURSIVE
      |k AS (SELECT doc_id, substr(text, 1, 40) AS k1,
      |        substr(text, greatest(length(text) - 39, 1), 40) AS k2
      |      FROM documents),
      |e AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst FROM k a JOIN k b
      |    ON a.k1 = b.k1 AND a.doc_id <> b.doc_id
      |  UNION
      |  SELECT a.doc_id, b.doc_id FROM k a JOIN k b
      |    ON a.k2 = b.k2 AND a.doc_id <> b.doc_id),
      |reach(src, dst) AS (
      |  SELECT src, src FROM e
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
      |comp AS (SELECT src AS doc_id, min(dst) AS component_id
      |         FROM reach GROUP BY src),
      |m AS (SELECT c.component_id, c.doc_id, d.n_chars,
      |        row_number() OVER (PARTITION BY c.component_id
      |          ORDER BY d.n_chars DESC, c.doc_id) AS rk,
      |        count(*) OVER (PARTITION BY c.component_id) AS n_members
      |      FROM comp c JOIN documents d ON c.doc_id = d.doc_id)
      |SELECT component_id, doc_id AS canonical_doc, n_chars AS canon_chars,
      |  n_members
      |FROM m WHERE rk = 1 ORDER BY component_id""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val comp = prefixSuffixComponents(docs)
    val wc = Window.partitionBy("component_id")
    comp.join(docs.select("doc_id", "n_chars"), "doc_id")
      .withColumn("rk", row_number().over(
        wc.orderBy(col("n_chars").desc, col("doc_id"))))
      .withColumn("n_members", count(lit(1)).over(wc))
      .filter(col("rk") === 1)
      .select(col("component_id"), col("doc_id").as("canonical_doc"),
        col("n_chars").as("canon_chars"), col("n_members"))
      .orderBy("component_id")
  }

  /** Leak-free train/eval split: the q_sample_split hash split made
    * contamination-safe — near-duplicate documents must land in the
    * SAME split (a near-copy of a training doc in the eval set is a
    * leaked answer), so the split key is the doc's near-dup COMPONENT
    * id (singletons: the doc's own id), not the doc id. Same
    * first-md5-nibble rule as q_sample_split (train ≈ 13/16); report
    * per (lang, split): docs, distinct split groups, clustered docs.
    *
    * Leak-freedom is by construction, not by check: every member of a
    * component shares gid, so shares the hash, so shares the split.
    *
    * Scale: the split decision is a map-only hash of the group id. The
    * transitive-closure machinery only ever sees docs with a blocking
    * key collision ([[prefixSuffixComponents]]); the rest of the corpus
    * takes the left-join + coalesce fast path — at 100 TB the iteration
    * runs on the collision slice, the split itself on a single pass. */
  val splitLeakfree: Q = Q.checked(
    "q_split_leakfree",
    """WITH RECURSIVE
      |k AS (SELECT doc_id, substr(text, 1, 40) AS k1,
      |        substr(text, greatest(length(text) - 39, 1), 40) AS k2
      |      FROM documents),
      |e AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst FROM k a JOIN k b
      |    ON a.k1 = b.k1 AND a.doc_id <> b.doc_id
      |  UNION
      |  SELECT a.doc_id, b.doc_id FROM k a JOIN k b
      |    ON a.k2 = b.k2 AND a.doc_id <> b.doc_id),
      |reach(src, dst) AS (
      |  SELECT src, src FROM e
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
      |comp AS (SELECT src AS doc_id, min(dst) AS component_id
      |         FROM reach GROUP BY src),
      |assigned AS (
      |  SELECT d.lang, coalesce(c.component_id, d.doc_id) AS gid,
      |    (c.doc_id IS NOT NULL) AS clustered
      |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
      |SELECT lang,
      |  CASE WHEN substr(md5(CAST(gid AS VARCHAR)), 1, 1) < 'd'
      |       THEN 'train' ELSE 'eval' END AS split,
      |  count(*) AS n_docs,
      |  CAST(count(DISTINCT gid) AS BIGINT) AS n_groups,
      |  CAST(sum(CASE WHEN clustered THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clustered
      |FROM assigned GROUP BY 1, 2 ORDER BY lang, split""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val comp = prefixSuffixComponents(docs)
    docs.select("doc_id", "lang")
      .join(comp, Seq("doc_id"), "left_outer")
      .withColumn("gid", coalesce(col("component_id"), col("doc_id")))
      .withColumn("clustered", col("component_id").isNotNull)
      .withColumn("split",
        when(substring(md5(col("gid").cast(StringType)), 1, 1) < "d",
          "train").otherwise("eval"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("gid")).as("n_groups"),
        sum(when(col("clustered"), 1L).otherwise(0L)).as("n_clustered"))
      .orderBy("lang", "split")
  }

  /** Split-contamination audit: measure cross-split near-dup LEAKAGE —
    * eval docs sharing a blocking key (40-char prefix or suffix) with
    * any train doc — under BOTH split rules side by side: the naive
    * per-doc hash (q_sample_split) leaks wherever a near-dup pair
    * straddles the hash boundary, while the component-keyed split
    * (q_split_leakfree) must show EXACTLY zero, because a shared
    * blocking key IS an edge, so both endpoints share a component and
    * therefore a split. The zero is structural, and this query makes it
    * measurable next to the naive rule's real leak count — the audit a
    * data team runs before trusting an eval set.
    *
    * Scale: leak detection is two equi-joins on the blocking keys
    * (never an OR-join — Spark would plan a nested loop), key-grain
    * frames only; the component machinery again touches only the
    * collision slice. */
  val splitContamination: Q = Q.checked(
    "q_split_contamination",
    """WITH RECURSIVE
      |k AS (SELECT doc_id, substr(text, 1, 40) AS k1,
      |        substr(text, greatest(length(text) - 39, 1), 40) AS k2
      |      FROM documents),
      |e AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst FROM k a JOIN k b
      |    ON a.k1 = b.k1 AND a.doc_id <> b.doc_id
      |  UNION
      |  SELECT a.doc_id, b.doc_id FROM k a JOIN k b
      |    ON a.k2 = b.k2 AND a.doc_id <> b.doc_id),
      |reach(src, dst) AS (
      |  SELECT src, src FROM e
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
      |comp AS (SELECT src AS doc_id, min(dst) AS component_id
      |         FROM reach GROUP BY src),
      |assigned AS (
      |  SELECT d.doc_id, d.lang, k.k1, k.k2,
      |    CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) < 'd'
      |         THEN 'train' ELSE 'eval' END AS naive_split,
      |    CASE WHEN substr(md5(CAST(coalesce(c.component_id, d.doc_id)
      |           AS VARCHAR)), 1, 1) < 'd'
      |         THEN 'train' ELSE 'eval' END AS safe_split
      |  FROM documents d JOIN k ON d.doc_id = k.doc_id
      |  LEFT JOIN comp c ON d.doc_id = c.doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS ev, a.naive_split AS a_n, a.safe_split AS a_s,
      |    b.naive_split AS b_n, b.safe_split AS b_s
      |  FROM assigned a JOIN assigned b
      |    ON a.k1 = b.k1 AND a.doc_id <> b.doc_id
      |  UNION
      |  SELECT a.doc_id, a.naive_split, a.safe_split,
      |    b.naive_split, b.safe_split
      |  FROM assigned a JOIN assigned b
      |    ON a.k2 = b.k2 AND a.doc_id <> b.doc_id),
      |leak_n AS (SELECT DISTINCT ev FROM pairs
      |           WHERE a_n = 'eval' AND b_n = 'train'),
      |leak_s AS (SELECT DISTINCT ev FROM pairs
      |           WHERE a_s = 'eval' AND b_s = 'train')
      |SELECT a.lang,
      |  CAST(sum(CASE WHEN a.naive_split = 'eval' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_eval_naive,
      |  CAST(count(ln.ev) AS BIGINT) AS n_leak_naive,
      |  CAST(sum(CASE WHEN a.safe_split = 'eval' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_eval_safe,
      |  CAST(count(ls.ev) AS BIGINT) AS n_leak_safe
      |FROM assigned a
      |LEFT JOIN leak_n ln ON a.doc_id = ln.ev
      |LEFT JOIN leak_s ls ON a.doc_id = ls.ev
      |GROUP BY a.lang ORDER BY a.lang""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val k = blockingKeys(docs)
    val comp = prefixSuffixComponents(docs)
    def nibbleSplit(c: org.apache.spark.sql.Column) =
      when(substring(md5(c.cast(StringType)), 1, 1) < "d", "train")
        .otherwise("eval")
    val assigned = docs.select("doc_id", "lang").join(k, "doc_id")
      .join(comp, Seq("doc_id"), "left_outer")
      .withColumn("naive_split", nibbleSplit(col("doc_id")))
      .withColumn("safe_split",
        nibbleSplit(coalesce(col("component_id"), col("doc_id"))))
      .select("doc_id", "lang", "k1", "k2", "naive_split", "safe_split")
    def pairPass(key: String) = {
      val a = assigned.select(col("doc_id").as("ev"), col(key).as("bk"),
        col("naive_split").as("a_n"), col("safe_split").as("a_s"))
      val b = assigned.select(col("doc_id").as("other"), col(key).as("bk_b"),
        col("naive_split").as("b_n"), col("safe_split").as("b_s"))
      a.join(b, col("bk") === col("bk_b") && col("ev") =!= col("other"))
        .select("ev", "a_n", "a_s", "b_n", "b_s")
    }
    val pairs = pairPass("k1").unionByName(pairPass("k2")).distinct()
    val leakN = pairs.filter(col("a_n") === "eval" && col("b_n") === "train")
      .select(col("ev")).distinct()
    val leakS = pairs.filter(col("a_s") === "eval" && col("b_s") === "train")
      .select(col("ev").as("ev_s")).distinct()
    assigned
      .join(leakN, col("doc_id") === col("ev"), "left_outer")
      .join(leakS, col("doc_id") === col("ev_s"), "left_outer")
      .groupBy("lang")
      .agg(
        sum(when(col("naive_split") === "eval", 1L).otherwise(0L))
          .as("n_eval_naive"),
        count(col("ev")).as("n_leak_naive"),
        sum(when(col("safe_split") === "eval", 1L).otherwise(0L))
          .as("n_eval_safe"),
        count(col("ev_s")).as("n_leak_safe"))
      .orderBy("lang")
  }

  /** Per-source adaptive quality cut: drop each source's bottom 30% by
    * an exact integer quality score (type-token ratio in milli — the
    * q_text_quality signal, integer-floored so the rank order is
    * engine-independent), report kept/dropped counts and the realized
    * threshold per source. Unlike the global gate in q_curate, the
    * cutoff ADAPTS to each source's own score distribution — the "keep
    * the best 70% of every domain" policy that prevents one noisy crawl
    * slice from being wiped out by a corpus-wide threshold.
    *
    * Scale: ONE window shuffle partitioned by source (never
    * partition-less) + a source-grain aggregate. Ties break on doc_id —
    * total order, deterministic cut line. */
  val qualityCut: Q = Q.checked(
    "q_quality_cut",
    """WITH scored AS (
      |  SELECT source, doc_id,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000
      |      // len(string_split(text, ' ')) AS score_milli
      |  FROM documents),
      |ranked AS (
      |  SELECT source, doc_id, score_milli,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY score_milli, doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM scored),
      |flagged AS (
      |  SELECT source, score_milli,
      |    CASE WHEN rn <= n * 3 // 10 THEN 1 ELSE 0 END AS dropped
      |  FROM ranked)
      |SELECT source, count(*) AS n_total,
      |  CAST(sum(dropped) AS BIGINT) AS n_dropped,
      |  CAST(count(*) - sum(dropped) AS BIGINT) AS n_kept,
      |  min(CASE WHEN dropped = 0 THEN score_milli END) AS cut_milli
      |FROM flagged GROUP BY source ORDER BY source""".stripMargin
  ) { (s, dir) =>
    // Score-grain two-pass instead of a per-source rank window: TTR
    // milli-scores live in 0..1000, so per-(source, score) counts are a
    // ≤|sources|·1001-row frame — the ONLY window (the cumulative) runs
    // there, never over the corpus. The rank-window twin sorts a whole
    // source in one task; this is one map-side-combined aggregate.
    // Identity: with cum_before(s) = docs scoring < s, a score's docs
    // hold ranks cum_before+1..cum_before+c, so rn <= k drops exactly
    // k = n*3 div 10 docs and the kept minimum is the first score whose
    // cumulative count exceeds k — the same numbers the rank plan emits.
    val scored = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        expr("CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000" +
          " div size(split(text, ' '))").as("score_milli"))
    val grain = scored.groupBy("source", "score_milli")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy("source").orderBy("score_milli")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("source")))
      .withColumn("k", expr("n * 3 div 10"))
    grain.groupBy("source")
      .agg(max(col("n")).as("n_total"),
        max(col("k")).as("n_dropped"),
        (max(col("n")) - max(col("k"))).as("n_kept"),
        min(when(col("cum") > col("k"), col("score_milli"))).as("cut_milli"))
      .orderBy("source")
  }

  /** Temperature-sampled mixture schedule (α = 0.5): sampling weight
    * w_s ∝ share_s^α, the standard up/down-sampling of multilingual /
    * multi-source pretraining mixes (low-resource slices sampled above
    * their natural share). Epochs per source = w_s · T / toks_s — how
    * many passes over each slice one "epoch" of the mixed corpus makes.
    *
    * Determinism: share^0.5 = sqrt(share) is IEEE-correctly-rounded on
    * bit-equal inputs (single divisions of exact integer token counts);
    * each sqrt is snapped to DECIMAL(18,12) BEFORE normalizing, so the
    * normalizer is an exact decimal sum (order-free) and every output is
    * a single IEEE division of deterministic operands. */
  val mixSchedule: Q = Q.checked(
    "q_mix_schedule",
    """WITH per_src AS (
      |  SELECT source,
      |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
      |      AS toks
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(toks) AS BIGINT) AS all_toks FROM per_src),
      |sq AS (
      |  SELECT source, toks, all_toks,
      |    CAST(sqrt(CAST(toks AS DOUBLE) / all_toks) AS DECIMAL(18,12)) AS sw
      |  FROM per_src, tot),
      |norm AS (SELECT CAST(sum(sw) AS DECIMAL(22,12)) AS z FROM sq)
      |SELECT source, toks,
      |  CAST(sw AS DOUBLE) / CAST(z AS DOUBLE) AS weight,
      |  (CAST(sw AS DOUBLE) / CAST(z AS DOUBLE)) * all_toks / toks
      |    AS epochs
      |FROM sq, norm ORDER BY source""".stripMargin
  ) { (s, dir) =>
    val perSrc = Tables.documents(s, dir)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast(LongType)).as("toks"))
    val tot = perSrc.agg(sum(col("toks")).as("all_toks"))
    val sq = perSrc.crossJoin(broadcast(tot))
      .withColumn("sw",
        sqrt(col("toks").cast(DoubleType) / col("all_toks"))
          .cast(DecimalType(18, 12)))
    val norm = sq.agg(sum(col("sw")).cast(DecimalType(22, 12)).as("z"))
    sq.crossJoin(broadcast(norm))
      .select(col("source"), col("toks"),
        (col("sw").cast(DoubleType) / col("z").cast(DoubleType)).as("weight"),
        ((col("sw").cast(DoubleType) / col("z").cast(DoubleType)) *
          col("all_toks") / col("toks")).as("epochs"))
      .orderBy("source")
  }

  /** Sequential quality-rule FUNNEL with per-rule attribution — "which
    * filter costs us the data": five C4/Gopher-style rules applied in a
    * fixed order (min length → mean word length → type-token ratio →
    * stopword presence → single-token repetition), each doc charged to
    * the FIRST rule it fails; output one row per stage with the docs
    * dropped there and the docs that entered it (stage 99 = survivors).
    * q_curate answers "what survives"; this answers "why the rest died",
    * the report a pipeline owner reads before retuning a threshold.
    *
    * Scale shape: one corpus scan computes four of the five signals as
    * per-row expressions; the repetition signal (per-doc mode count) is
    * the one explode + two map-side-combined aggregates at doc grain.
    * The funnel itself is integer CASE arithmetic folded into a 6-row
    * stage frame — the only window runs on those ≤6 rows (bounded, per
    * the ARCHITECTURE rule on partition-less windows), and the corpus
    * total joins in as a 1-row broadcast. All thresholds are integer
    * milli-ratios — no FP anywhere. */
  val filterFunnel: Q = Q.checked(
    "q_filter_funnel",
    """WITH t AS (
      |  SELECT doc_id,
      |    len(string_split(text,' ')) AS n_tok,
      |    len(replace(text,' ','')) AS n_chr,
      |    len(list_distinct(string_split(text,' '))) AS n_dis,
      |    list_contains(string_split(text,' '), 'the')
      |      OR list_contains(string_split(text,' '), 'a') AS has_stop
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, max(cnt) AS max_tok FROM (
      |    SELECT doc_id, count(*) AS cnt
      |    FROM (SELECT doc_id, unnest(string_split(text,' ')) AS tok
      |          FROM documents)
      |    GROUP BY doc_id, tok) GROUP BY doc_id),
      |f AS (
      |  SELECT CASE
      |      WHEN NOT (n_tok >= 25)                             THEN 1
      |      WHEN NOT (n_chr*1000//n_tok BETWEEN 4000 AND 5200) THEN 2
      |      WHEN NOT (n_dis*1000 >= 400*n_tok)                 THEN 3
      |      WHEN NOT has_stop                                  THEN 4
      |      WHEN NOT (max_tok*1000 <= 150*n_tok)               THEN 5
      |      ELSE 99 END AS stage
      |  FROM t JOIN m USING (doc_id)),
      |c AS (SELECT stage, count(*) AS n_docs FROM f GROUP BY stage),
      |tot AS (SELECT count(*) AS n FROM documents)
      |SELECT CAST(stage AS INTEGER) AS stage,
      |  CASE stage WHEN 1 THEN 'min_len' WHEN 2 THEN 'mean_word_len'
      |       WHEN 3 THEN 'ttr' WHEN 4 THEN 'stopword'
      |       WHEN 5 THEN 'repetition' ELSE 'kept' END AS rule,
      |  n_docs,
      |  CAST(n - coalesce(sum(n_docs) OVER (ORDER BY stage
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |    AS n_in
      |FROM c, tot ORDER BY stage""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val toks = split(col("text"), " ")
    val t = docs.select(col("doc_id"),
      size(toks).cast(LongType).as("n_tok"),
      length(translate(col("text"), " ", "")).cast(LongType).as("n_chr"),
      size(array_distinct(toks)).cast(LongType).as("n_dis"),
      (array_contains(toks, "the") || array_contains(toks, "a"))
        .as("has_stop"))
    val m = docs.select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max(col("cnt")).as("max_tok"))
    val staged = t.join(m, "doc_id")
      .withColumn("stage",
        when(expr("NOT (n_tok >= 25)"), 1)
          .when(expr("NOT (n_chr * 1000 div n_tok BETWEEN 4000 AND 5200)"), 2)
          .when(expr("NOT (n_dis * 1000 >= 400 * n_tok)"), 3)
          .when(!col("has_stop"), 4)
          .when(expr("NOT (max_tok * 1000 <= 150 * n_tok)"), 5)
          .otherwise(99))
    val c = staged.groupBy("stage").agg(count(lit(1)).as("n_docs"))
    val tot = docs.agg(count(lit(1)).as("n"))
    c.crossJoin(broadcast(tot)) // 1-row total: BroadcastNestedLoop, not cartesian
      .withColumn("rule",
        when(col("stage") === 1, "min_len")
          .when(col("stage") === 2, "mean_word_len")
          .when(col("stage") === 3, "ttr")
          .when(col("stage") === 4, "stopword")
          .when(col("stage") === 5, "repetition")
          .otherwise("kept"))
      .withColumn("n_in",
        (col("n") - coalesce(
          sum(col("n_docs")).over(Window.orderBy("stage")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .cast(LongType))
      .select(col("stage"), col("rule"), col("n_docs"), col("n_in"))
      .orderBy("stage")
  }

  /** Per-source token-budget fill: order each source's docs by quality
    * (integer milli TTR, doc_id tie-break) and greedily keep the prefix
    * whose cumulative token count fits a fixed 600-token budget — the
    * "fill the training budget with the best of every domain" allocation
    * run after q_mix_schedule decides the budgets. Prefix semantics are
    * deliberate: the first doc that would overflow the budget is cut and
    * so is everything after it (deterministic, engine-identical — no
    * knapsack backtracking).
    *
    * Scale: ONE window shuffle partitioned by source (never
    * partition-less), integer-only arithmetic (milli TTR via integer
    * div, exact BIGINT prefix sums), then a per-source hash aggregate of
    * the windowed frame reusing the same exchange. */
  val tokenBudget: Q = Q.checked(
    "q_token_budget",
    """WITH d AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
      |    CAST(1000 * len(list_distinct(string_split(text, ' ')))
      |      // len(string_split(text, ' ')) AS BIGINT) AS ttr_milli
      |  FROM documents),
      |w AS (
      |  SELECT source, doc_id, ntok, ttr_milli,
      |    CAST(sum(ntok) OVER (PARTITION BY source
      |      ORDER BY ttr_milli DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_tok
      |  FROM d)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN cum_tok <= 600 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_kept,
      |  CAST(sum(CASE WHEN cum_tok <= 600 THEN ntok ELSE 0 END) AS BIGINT)
      |    AS tokens_kept,
      |  CAST(min(CASE WHEN cum_tok <= 600 THEN ttr_milli END) AS BIGINT)
      |    AS ttr_floor_milli,
      |  1000 * CAST(sum(CASE WHEN cum_tok <= 600 THEN ntok ELSE 0 END)
      |    AS BIGINT) // 600 AS util_milli
      |FROM w GROUP BY source ORDER BY source""".stripMargin
  ) { (s, dir) =>
    val d = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        split(col("text"), " ").as("toks"))
      .select(col("source"), col("doc_id"),
        size(col("toks")).cast(LongType).as("ntok"),
        expr("CAST(1000 * size(array_distinct(toks)) div size(toks) AS BIGINT)")
          .as("ttr_milli"))
    val w = Window.partitionBy("source")
      .orderBy(col("ttr_milli").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = col("cum_tok") <= 600
    d.withColumn("cum_tok", sum(col("ntok")).over(w).cast(LongType))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(kept, 1).otherwise(0)).cast(LongType).as("n_kept"),
        sum(when(kept, col("ntok")).otherwise(0)).cast(LongType)
          .as("tokens_kept"),
        min(when(kept, col("ttr_milli"))).cast(LongType)
          .as("ttr_floor_milli"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        col("tokens_kept"), col("ttr_floor_milli"),
        expr("1000 * tokens_kept div 600").as("util_milli"))
      .orderBy("source")
  }

  /** Readability profile per language (round 11): exact word /
    * vowel-cluster-"syllable" / sentence counts over the corpus plus
    * integer milli-ratios (words-per-sentence, syllables-per-word) —
    * the Flesch-style complexity screen a curation pipeline applies
    * beside [[textQuality]]'s length/punctuation signals (which see
    * none of sentence structure). Counting is regex-cluster based and
    * engine-exact: `regexp_extract_all` match COUNTS, never float
    * scores; ratios ship as corpus-level milli integers (`div`). One
    * scan-side aggregate, ≤|langs| rows. Spark needs the explicit
    * group-0 index (its default extracts group 1); DuckDB's default is
    * already the whole match. */
  val readability: Q = Q.checked(
    "q_readability",
    """WITH m AS (
      |  SELECT lang,
      |    length(regexp_extract_all(text, '[A-Za-z]+')) AS words,
      |    length(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl,
      |    greatest(length(regexp_extract_all(text, '[.!?]+')), 1) AS sents
      |  FROM documents)
      |SELECT lang,
      |  count(*) AS docs,
      |  CAST(sum(words) AS BIGINT) AS words,
      |  CAST(sum(syl) AS BIGINT) AS syllables,
      |  CAST(sum(sents) AS BIGINT) AS sentences,
      |  CAST(sum(words) * 1000 // sum(sents) AS BIGINT)
      |    AS words_per_sent_milli,
      |  CAST(sum(syl) * 1000 // greatest(sum(words), 1) AS BIGINT)
      |    AS syl_per_word_milli
      |FROM m GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    val m = Tables.documents(s, dir).select(col("lang"),
      size(expr("regexp_extract_all(text, '[A-Za-z]+', 0)"))
        .cast(LongType).as("words"),
      size(expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
        .cast(LongType).as("syl"),
      greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
        .cast(LongType).as("sents"))
    m.groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        sum(col("words")).cast(LongType).as("words"),
        sum(col("syl")).cast(LongType).as("syllables"),
        sum(col("sents")).cast(LongType).as("sentences"))
      .select(col("lang"), col("docs"), col("words"), col("syllables"),
        col("sentences"),
        expr("words * 1000 div sentences").as("words_per_sent_milli"),
        // the per-row sentence count is greatest(...,1)-floored, so
        // sum(sents) >= docs >= 1; words has no such row floor — an
        // all-CJK corpus (zero [A-Za-z] runs) sums to 0, and the same
        // explicit floor keeps the ratio integral instead of relying on
        // both engines agreeing that x div 0 is NULL
        expr("syllables * 1000 div greatest(words, 1)")
          .as("syl_per_word_milli"))
      .orderBy("lang")
  }

  val all: Seq[Q] = Seq(sampleSplit, sampleQuota, vocabTopk, tfidf,
    ngramCounts, packBins, curate, quantileDisc, winCume, dedupComponents,
    profile, fuzzyMatch, mixWeights, clusterCanonical, qualityCut,
    mixSchedule, filterFunnel, tokenBudget, splitLeakfree,
    splitContamination, readability)
}
