package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM-data-pipeline operators (SURVEY.md §2.2-K, BASELINE north star):
  * text statistics, exact/near dedup, vector similarity, multimodal join —
  * all over the documents/embeddings tables, all built-in expressions.
  *
  * Scale design: dedup groups by a hash/prefix key (one shuffle, no
  * pairwise compare); similarity against a single probe vector broadcasts
  * the probe (map-side only + a top-k, no shuffle of the big side). The
  * O(n²)-free near-dup path at 100 TB is MinHash-LSH
  * ([[graft.dedup.MinHashLsh]], impl-only — LSH output is hash-seed
  * sensitive, so the oracle checks deterministic prefix blocking instead).
  */
object TextSimOps {

  /** Per-language corpus statistics: doc counts, char sums, whitespace
    * token counts, distinct sources. */
  val textStats: Q = Q.checked(
    "q_text_stats",
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
      |  CAST(sum(CAST(length(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS sum_tokens,
      |  count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    // fanned (here and in the other tokenize/shingle-heavy queries
    // below): sub-split input reads as ONE scan task, serializing the
    // per-row split/explode/regex work — see Tables.fanned; identity at
    // production scale
    Tables.fanned(s, dir, "documents", "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"),
        sum(size(split(col("text"), " ")).cast(LongType)).as("sum_tokens"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")
  }

  /** Exact dedup by content hash over a feed with planted duplicates
    * (docs ∪ re-keyed copies of every 10th doc): survivor = min(doc_id)
    * per md5(text), with the duplicate-group size. One hash-shuffle. */
  val dedupExact: Q = Q.checked(
    "q_dedup_exact",
    """WITH feed AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
      |SELECT md5(text) AS h, min(doc_id) AS survivor_id,
      |  count(*) AS n_copies
      |FROM feed GROUP BY md5(text) ORDER BY survivor_id""".stripMargin
  ) { (s, dir) =>
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val copies = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    d.unionByName(copies)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("survivor_id"), count(lit(1)).as("n_copies"))
      .orderBy("survivor_id")
  }

  /** Near-dup clusters by deterministic prefix blocking — the testdata
    * plants near-duplicates (476 distinct 40-char prefixes for 500 docs at
    * sf0.01). Emits only multi-member clusters. */
  val dedupNear: Q = Q.checked(
    "q_dedup_near",
    """SELECT substr(text, 1, 40) AS prefix, count(*) AS n_members,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents
      |GROUP BY 1 HAVING count(*) > 1
      |ORDER BY prefix""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(substring(col("text"), 1, 40).as("prefix"))
      .agg(count(lit(1)).as("n_members"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .filter(col("n_members") > 1)
      .orderBy("prefix")
  }

  /** Brute-force cosine top-10 neighbors of vec_id = 0. The probe vector is
    * broadcast (crossJoin of a 1-row frame); dot/norm are sequential
    * left-folds over 64 floats — float×float is exact in double, and both
    * engines fold in index order, so round(·,4) is stable. limit(10) keeps
    * the result a TakeOrderedAndProject. */
  val simTopk: Q = Q.checked(
    "q_sim_topk",
    """WITH v0 AS (SELECT embedding AS e0 FROM embeddings WHERE vec_id = 0),
      |sims AS (
      |  SELECT vec_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(e0[i] AS DOUBLE))) AS dot,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n1,
      |    sqrt(list_sum(list_transform(e0,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n0
      |  FROM embeddings, v0 WHERE vec_id <> 0)
      |SELECT vec_id, round(dot / (n1 * n0), 4) AS sim
      |FROM sims ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
  ) { (s, dir) =>
    import graft.functions.VectorExprs.{dotVec, norm2}
    val e = Tables.embeddings(s, dir)
    val v0 = e.filter(col("vec_id") === 0).select(col("embedding").as("e0"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(v0))
      // native codegen'd loops (VectorExprs) with the identical left-fold
      // order as the DuckDB list_sum folds — bit-identical results
      .withColumn("dot", dotVec(col("embedding"), col("e0")))
      .withColumn("n1", sqrt(norm2(col("embedding"))))
      .withColumn("n0", sqrt(norm2(col("e0"))))
      .select(col("vec_id"), round(col("dot") / (col("n1") * col("n0")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(10)
  }

  /** Per-label centroid norm, exactly: per-dimension mean via DECIMAL sums
    * (fold-order-free), squared and re-summed in DECIMAL, one sqrt at the
    * end. Two shuffles on tiny keys (label·64 then label). */
  val simCentroid: Q = Q.checked(
    "q_sim_centroid",
    """WITH dims AS (
      |  SELECT label, CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
      |         unnest(embedding) AS val
      |  FROM embeddings),
      |means AS (
      |  SELECT label, pos,
      |    CAST(CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,8))) AS DOUBLE) / count(*)
      |         AS DECIMAL(18,8)) AS mean_v
      |  FROM dims GROUP BY label, pos)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_dims,
      |  round(sqrt(CAST(sum(mean_v * mean_v) AS DOUBLE)), 4) AS centroid_norm
      |FROM means GROUP BY label ORDER BY label""".stripMargin
  ) { (s, dir) =>
    val D8 = DecimalType(18, 8)
    Tables.fanned(s, dir, "embeddings", "vec_id")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "val")))
      .select(col("label"), (col("pos0") + 1).cast(LongType).as("pos"), col("val"))
      .groupBy("label", "pos")
      .agg((sum(col("val").cast(DoubleType).cast(D8)).cast(DoubleType) /
        count(lit(1))).cast(D8).as("mean_v"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_dims"),
        round(sqrt(sum(col("mean_v") * col("mean_v")).cast(DoubleType)), 4)
          .as("centroid_norm"))
      .orderBy("label")
  }

  /** Multimodal join: text metadata ⋈ vector labels on doc_id = vec_id. */
  val multimodalJoin: Q = Q.checked(
    "q_multimodal_join",
    """SELECT lang, label, count(*) AS n,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars
      |FROM documents JOIN embeddings ON doc_id = vec_id
      |GROUP BY lang, label ORDER BY lang, label""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .join(Tables.embeddings(s, dir), col("doc_id") === col("vec_id"))
      .groupBy("lang", "label")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"))
      .orderBy("lang", "label")
  }

  /** Per-document quality scoring: token counts, type-token ratio,
    * stopword ratio, average token length — all exact integer counts with
    * single IEEE divisions (bit-identical cross-engine, no rounding). */
  val textQuality: Q = Q.checked(
    "q_text_quality",
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS ttr,
      |  CAST(len(list_filter(string_split(text, ' '),
      |    t -> t = 'a' OR t = 'the')) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stop_ratio,
      |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS avg_tok_len
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast(LongType)
    Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars"),
        nTok.as("n_tokens"),
        size(array_distinct(toks)).cast(LongType).as("n_distinct"),
        (size(array_distinct(toks)).cast(DoubleType) / nTok).as("ttr"),
        (size(filter(toks, t => t === "a" || t === "the")).cast(DoubleType) /
          nTok).as("stop_ratio"),
        (length(regexp_replace(col("text"), " ", "")).cast(DoubleType) / nTok)
          .as("avg_tok_len"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic: score fixed marker-token lists per language,
    * argmax with a deterministic lexicographic tie-break, then confusion
    * counts vs the labeled lang. (The synthetic corpus shares one
    * vocabulary across langs — the mechanism, not the accuracy, is what
    * is under test.) */
  val textLangid: Q = Q.checked(
    "q_text_langid",
    """WITH scored AS (
      |  SELECT lang,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('agg','table','hash')))   AS s_de,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('scan','row','slow')))    AS s_en,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('stream','batch','group'))) AS s_es,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('line','window','order')))  AS s_fr,
      |    len(list_filter(string_split(text, ' '), t -> t IN ('join','merge','big')))   AS s_zh
      |  FROM documents),
      |pred AS (
      |  SELECT lang,
      |    CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
      |         WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
      |         WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
      |         WHEN s_fr >= s_zh THEN 'fr'
      |         ELSE 'zh' END AS pred_lang
      |  FROM scored)
      |SELECT lang, pred_lang, count(*) AS n
      |FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
  ) { (s, dir) =>
    val toks = split(col("text"), " ")
    def score(markers: Seq[String]) =
      size(filter(toks, t => markers.map(t === _).reduce(_ || _))).cast(LongType)
    Tables.fanned(s, dir, "documents", "doc_id")
      .withColumn("s_de", score(Seq("agg", "table", "hash")))
      .withColumn("s_en", score(Seq("scan", "row", "slow")))
      .withColumn("s_es", score(Seq("stream", "batch", "group")))
      .withColumn("s_fr", score(Seq("line", "window", "order")))
      .withColumn("s_zh", score(Seq("join", "merge", "big")))
      .withColumn("pred_lang",
        when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es")
          && col("s_de") >= col("s_fr") && col("s_de") >= col("s_zh"), "de")
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr")
            && col("s_en") >= col("s_zh"), "en")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_zh"), "es")
          .when(col("s_fr") >= col("s_zh"), "fr")
          .otherwise("zh"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")
  }

  /** Document fingerprint: the minimum md5 over 3-token shingles — a
    * winnowing-style content signature, stable under doc_id reshuffles and
    * cross-engine reproducible (md5 exists in both engines). */
  val textFingerprint: Q = Q.checked(
    "q_text_fingerprint",
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) - 2 AS BIGINT) AS n_shingles,
      |  list_aggregate(list_transform(range(1, len(string_split(text, ' ')) - 1),
      |    i -> md5(array_to_string(string_split(text, ' ')[i:i+2], ' '))),
      |    'min') AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val toks = split(col("text"), " ")
    val shingleHashes = expr(
      """transform(sequence(1, size(split(text, ' ')) - 2),
        |i -> md5(concat_ws(' ', slice(split(text, ' '), i, 3))))""".stripMargin)
    Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"),
        (size(toks) - 2).cast(LongType).as("n_shingles"),
        array_min(shingleHashes).as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Token counting with a BPE-ish pre-tokenizer regex (north-star
    * brief): `\w+|[^\w\s]` — word runs plus single punctuation marks —
    * alongside alpha/digit run counts. Whitespace tokenization lives in
    * q_text_stats; this is the regex path. */
  val textTokens: Q = Q.checked(
    "q_text_tokens",
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens_bpe,
      |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_runs,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"),
        size(expr("""regexp_extract_all(text, '\\w+|[^\\w\\s]', 0)"""))
          .cast(LongType).as("n_tokens_bpe"),
        size(expr("regexp_extract_all(text, '[a-z]+', 0)"))
          .cast(LongType).as("n_alpha_runs"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)"))
          .cast(LongType).as("n_digit_runs"))
      .orderBy("doc_id")
  }

  /** n-gram Jaccard near-dup: exact 3-shingle Jaccard over prefix-blocked
    * candidate pairs (the deterministic blocking keeps this O(block²), not
    * O(n²)). jaccard is a single IEEE division of exact ints — no rounding
    * (round() at a decimal tie like 1/32 diverges between engines). */
  val dedupNgram: Q = Q.checked(
    "q_dedup_ngram",
    """WITH sh AS (
      |  SELECT doc_id, substr(text, 1, 40) AS prefix,
      |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
      |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingles
      |  FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS n_int,
      |  CAST(len(a.shingles) + len(b.shingles)
      |    - len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS n_union,
      |  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      |    / (len(a.shingles) + len(b.shingles)
      |       - len(list_intersect(a.shingles, b.shingles))) AS jaccard
      |FROM sh a JOIN sh b ON a.prefix = b.prefix AND a.doc_id < b.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, dir) =>
    val sh = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), substring(col("text"), 1, 40).as("prefix"),
        expr(
          """array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
            |i -> concat_ws(' ', slice(split(text, ' '), i, 3))))""".stripMargin)
          .as("shingles"))
    val a = sh.select(col("doc_id").as("doc_a"), col("prefix"),
      col("shingles").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("prefix").as("prefix_b"),
      col("shingles").as("sh_b"))
    val nInt = size(array_intersect(col("sh_a"), col("sh_b"))).cast(LongType)
    val nUnion = (size(col("sh_a")) + size(col("sh_b"))).cast(LongType) - nInt
    a.join(b, col("prefix") === col("prefix_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), nInt.as("n_int"),
        nUnion.as("n_union"),
        (nInt.cast(DoubleType) / nUnion).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** The banded multi-index Hamming join's ARITHMETIC, oracle-pinned:
    * [[graft.dedup.SimHash.bandedHammingPairs]] is the one join
    * primitive behind the SimHash text leg AND the dHash image leg, but
    * its production inputs are hash-seed/codec-derived, so those
    * queries are rows-only. Here the 64-bit fingerprints are
    * synthesized IN-QUERY from md5(doc_id) — 15 hex chars = 60 bits,
    * engine-portable with no overflow — and the exact production join
    * path runs over them (8×8-bit bands, the image geometry): banding
    * by shiftright/&, candidate equi-join on (band_id, band_val),
    * bit_count(xor) verify. maxDist 20 > bands−1 deliberately: recall
    * beyond the pigeonhole radius is a property of the BANDING, so the
    * DuckDB oracle spells the same banding algebra (not an all-pairs
    * distance scan) — any drift in the slice/shift/mask arithmetic
    * between the two engines breaks the hash match. */
  val dedupBanded: Q = Q.checked(
    "q_dedup_banded",
    """WITH sigs AS (
      |  SELECT doc_id,
      |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |      AS BIGINT) AS sig
      |  FROM documents),
      |banded AS (
      |  SELECT doc_id, sig, b AS band_id, (sig >> (b*8)) & 255 AS band_val
      |  FROM sigs, range(8) t(b))
      |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
      |FROM banded a JOIN banded b
      |  ON a.band_id = b.band_id AND a.band_val = b.band_val
      |  AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 20
      |ORDER BY id_a, id_b""".stripMargin
  ) { (s, dir) =>
    val sigs = Tables.documents(s, dir).select(col("doc_id"),
      expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 15), " +
        "16, 10) as bigint)").as("sig"))
    graft.dedup.SimHash
      .bandedHammingPairs(sigs, "doc_id", "sig", maxDist = 20, bands = 8)
      .select(col("id_a"), col("id_b"),
        col("hamming").cast(LongType).as("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** The MinHash-LSH ALGEBRA, oracle-pinned — the q_dedup_banded move
    * applied to the other production near-dup primitive. The production
    * path ([[graft.dedup.MinHashLsh.nearDuplicates]], q_dedup_minhash)
    * is rows-only because its signature hash is the xxhash64 family
    * Spark codegens; here the per-shingle hash is swapped for an
    * engine-portable family built from ONE md5 per shingle
    * (Kirsch–Mitzenmacher double hashing: h1/h2 = the digest's two
    * 15-hex-char halves, h_j = h1 + j·(h2 mod 2^58) — k draws for one
    * digest, j·h2 ≤ 15·2^58 < 2^62 so ANSI arithmetic never
    * overflows), and everything AROUND the hash is the production
    * algebra under a cross-engine hash check: the production
    * [[graft.dedup.MinHashLsh.shingleExpr]] tokenize/slice/distinct
    * arithmetic, min-over-shingles per permutation, banded bucket keys
    * (md5 over the band's signature slice), the production
    * [[graft.dedup.MinHashLsh.candidatePairs]] grouping join (never
    * all-pairs), and an exact-Jaccard verify over the once-materialized
    * shingle arrays, in INTEGER form (2·|∩| ≥ |∪| ⟺
    * J ≥ 0.5 — no float compare to flake). A drift in shingle windows,
    * band slicing, candidate dedup or the Jaccard denominator between
    * the engines breaks a hash-checked row. k=16 hashes in 4 bands of
    * 4 rows — the production [[graft.dedup.MinHashLsh.Config]] default
    * geometry: r=4 bands are SELECTIVE (band-collision ≈ j⁴), which is
    * what keeps the candidate set (and the per-candidate verify)
    * data-proportional on a template-heavy corpus — an r=2 draft of
    * this query ground the sf0.1 bench to 12 s on candidate blow-up. */
  val minhashLsh: Q = Q.checked(
    "q_minhash_lsh",
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, greatest(len(t) - 2, 0) + 1),
      |    i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS shingles
      |  FROM toks),
      |hs AS (
      |  SELECT doc_id,
      |    CAST(concat('0x', substr(d, 1, 15)) AS BIGINT) AS h1,
      |    CAST(concat('0x', substr(d, 17, 15)) AS BIGINT)
      |      % 288230376151711744 AS h2
      |  FROM (SELECT doc_id, md5(unnest(shingles)) AS d FROM sh)),
      |sigs AS (
      |  SELECT doc_id,
      |    min(h1 + 0 * h2) AS m0, min(h1 + 1 * h2) AS m1,
      |    min(h1 + 2 * h2) AS m2, min(h1 + 3 * h2) AS m3,
      |    min(h1 + 4 * h2) AS m4, min(h1 + 5 * h2) AS m5,
      |    min(h1 + 6 * h2) AS m6, min(h1 + 7 * h2) AS m7,
      |    min(h1 + 8 * h2) AS m8, min(h1 + 9 * h2) AS m9,
      |    min(h1 + 10 * h2) AS m10, min(h1 + 11 * h2) AS m11,
      |    min(h1 + 12 * h2) AS m12, min(h1 + 13 * h2) AS m13,
      |    min(h1 + 14 * h2) AS m14, min(h1 + 15 * h2) AS m15
      |  FROM hs GROUP BY doc_id),
      |banded AS (
      |  SELECT doc_id, b AS band_id,
      |    CASE b
      |      WHEN 0 THEN CAST(concat('0x', substr(md5(
      |        concat_ws(',', m0, m1, m2, m3)), 1, 15)) AS BIGINT)
      |      WHEN 1 THEN CAST(concat('0x', substr(md5(
      |        concat_ws(',', m4, m5, m6, m7)), 1, 15)) AS BIGINT)
      |      WHEN 2 THEN CAST(concat('0x', substr(md5(
      |        concat_ws(',', m8, m9, m10, m11)), 1, 15)) AS BIGINT)
      |      ELSE CAST(concat('0x', substr(md5(
      |        concat_ws(',', m12, m13, m14, m15)), 1, 15)) AS BIGINT)
      |    END AS band_hash
      |  FROM sigs, range(4) tb(b)),
      |cands AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM banded a JOIN banded b
      |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
      |    AND a.doc_id < b.doc_id)
      |SELECT c.id_a, c.id_b,
      |  CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT)
      |    AS inter,
      |  CAST(len(sa.shingles) + len(sb.shingles)
      |    - len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT)
      |    AS uni
      |FROM cands c
      |JOIN sh sa ON sa.doc_id = c.id_a
      |JOIN sh sb ON sb.doc_id = c.id_b
      |WHERE 2 * len(list_intersect(sa.shingles, sb.shingles))
      |  >= len(sa.shingles) + len(sb.shingles)
      |    - len(list_intersect(sa.shingles, sb.shingles))
      |ORDER BY id_a, id_b""".stripMargin
  ) { (s, dir) =>
    import graft.dedup.MinHashLsh
    val n = 3; val k = 16; val bands = 4; val r = 4
    // fanned BEFORE the shingle checkpoint: the checkpointed RDD keeps
    // its input partitioning, so an unfanned (single-task) scan would
    // serialize every downstream HOF/md5 pass over it as well
    val eligible = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= n)
    // the shingle arrays come from an interpreted HOF
    // (MinHashLsh.shingleExpr's own caveat) and feed FOUR consumers —
    // the signature pass plus both sides of the candidate self-join's
    // verify — so materialize them ONCE: without the checkpoint each
    // consumer re-evaluates the HOF over the corpus (or worse,
    // per candidate pair — a per-pair-eval draft of this query cost
    // 2.5 HOF evals per corpus row on a dup-dense corpus)
    val sh = MinHashLsh.withShingles(eligible, "text", n)
      .select(col("doc_id"), col("shingles"))
      .localCheckpoint(false)
    // one md5 per shingle; the k draws are arithmetic over its halves
    val hashed = sh
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .withColumn("d", md5(col("s")))
      .select(col("doc_id"),
        expr("cast(conv(substring(d, 1, 15), 16, 10) as bigint)").as("h1"),
        (expr("cast(conv(substring(d, 17, 15), 16, 10) as bigint)")
          % 288230376151711744L).as("h2"))
    val aggs = (0 until k).map(j =>
      min(col("h1") + lit(j.toLong) * col("h2")).as(s"m$j"))
    val sigs = hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val bandKeys = (0 until bands).map { b =>
      val slice = (0 until r).map(i => s"m${b * r + i}").mkString(", ")
      expr(s"cast(conv(substring(md5(concat_ws(',', $slice)), " +
        "1, 15), 16, 10) as bigint)")
    }
    val buckets = sigs.select(col("doc_id"),
      posexplode(array(bandKeys: _*)).as(Seq("band_id", "band_hash")))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
      .cast(LongType)
    MinHashLsh.candidatePairs(buckets, "doc_id")
      .join(sh.select(col("doc_id").as("id_a"),
        col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"),
        col("shingles").as("sh_b")), "id_b")
      .withColumn("inter", inter)
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast(LongType)
          - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
      .orderBy("id_a", "id_b")
  }

  /** Embedding-cosine near-dup over a sorted-neighborhood candidate window:
    * only pairs within W = 200 of each other on vec_id (and sharing a
    * label) are compared — the classic bounded-blocking dedup move. Pair
    * count grows O(n·W), linear in n, unlike within-label-only blocking
    * whose O((n/labels)²) growth round 2's bench flagged as a scale-killer.
    * Threshold 0.35 (this corpus's embeddings are near-orthogonal; max
    * within-label cosine ≈ 0.47). The unblocked/recall-complete scale path
    * is LSH (graft.sim / graft.dedup, impl-only). */
  val dedupEmbed: Q = Q.checked(
    "q_dedup_embed",
    """WITH n AS (
      |  SELECT vec_id, label, embedding,
      |    sqrt(list_sum(list_transform(embedding,
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
      |  round(list_sum(list_transform(range(1, 65),
      |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (a.nrm * b.nrm), 4) AS cos_sim
      |FROM n a JOIN n b ON a.label = b.label
      |  AND b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 200
      |WHERE list_sum(list_transform(range(1, 65),
      |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |    / (a.nrm * b.nrm) >= 0.35
      |ORDER BY vec_a, vec_b""".stripMargin
  ) { (s, dir) =>
    // bounded-window equi-join via the shared BlockedSelfJoin helper
    // (the q_join_range technique; see that object for the mechanics)
    import graft.functions.VectorExprs.{dotVec, norm2}
    val W = 200
    val withNorm = Tables.embeddings(s, dir)
      .withColumn("nrm", sqrt(norm2(col("embedding"))))
    // native codegen'd dot loop (VectorExprs.DotVec): same left-fold
    // addition order as the DuckDB list_sum fold, so the oracle matches
    // bit-for-bit; unlike the round-2 unrolled 64-term tree it doesn't
    // bloat the generated code (janino compile was the hidden cost).
    val cos = dotVec(col("embedding_a"), col("embedding_b")) /
      (col("nrm_a") * col("nrm_b"))
    BlockedSelfJoin.windowPairs(withNorm, "vec_id", Seq("label"),
        Seq("embedding", "nrm"), W)
      .withColumnRenamed("key_a", "vec_a")
      .withColumnRenamed("key_b", "vec_b")
      .withColumn("cos_raw", cos)
      .filter(col("cos_raw") >= 0.35)
      .select(col("vec_a"), col("vec_b"), col("label"),
        round(col("cos_raw"), 4).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** Per-modality storage/shape profile of the multimodal fixture
    * ([[graft.multimodal.Multimodal.fixtureFromDocuments]]) — the
    * capacity-planning report a media corpus needs before decode ever
    * runs: row counts, payload bytes, pixel area, frame totals. Pure
    * integer aggregates over the typed metadata (the decode stub is NOT
    * on this path — metadata is real), 3-row key space collapses
    * map-side. The oracle reconstructs the same deterministic metadata
    * derivation in SQL; byte lengths via octet_length on both engines. */
  val multimodalProfile: Q = Q.checked(
    "q_multimodal_profile",
    """WITH m AS (
      |  SELECT ['image','audio','video'][CAST(doc_id % 3 + 1 AS INTEGER)]
      |      AS modality,
      |    CAST(doc_id % 64 + 1 AS BIGINT) AS width,
      |    CAST(doc_id % 48 + 1 AS BIGINT) AS height,
      |    CAST(doc_id % 30 + 1 AS BIGINT) AS n_frames,
      |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
      |  FROM documents)
      |SELECT modality, count(*) AS n,
      |  CAST(sum(n_bytes) AS BIGINT) AS sum_bytes,
      |  CAST(max(n_bytes) AS BIGINT) AS max_bytes,
      |  CAST(sum(width * height) AS BIGINT) AS sum_pixels,
      |  CAST(sum(n_frames) AS BIGINT) AS sum_frames
      |FROM m GROUP BY modality ORDER BY modality""".stripMargin
  ) { (s, dir) =>
    graft.multimodal.Multimodal
      .fixtureFromDocuments(Tables.documents(s, dir))
      .select(col("meta.modality").as("modality"),
        col("meta.width").cast(LongType).as("width"),
        col("meta.height").cast(LongType).as("height"),
        col("meta.nFrames").cast(LongType).as("n_frames"),
        expr("CAST(octet_length(payload) AS BIGINT)").as("n_bytes"))
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).cast(LongType).as("sum_bytes"),
        max(col("n_bytes")).cast(LongType).as("max_bytes"),
        sum(col("width") * col("height")).cast(LongType).as("sum_pixels"),
        sum(col("n_frames")).cast(LongType).as("sum_frames"))
      .orderBy("modality")
  }

  /** Boilerplate detection: the 50 most-repeated word 5-gram shingles
    * appearing in ≥3 distinct documents — how a curation pass finds
    * template headers/footers/navigation chrome to strip before
    * training. Scale: explode fans each doc into (words−4) shingles,
    * then ONE hash aggregation on the shingle key (partial aggregation
    * collapses repeats map-side); the ≥3-doc HAVING cut shrinks the
    * frame before the global top-50 (TakeOrdered — never a full sort).
    * At 100 TB the shingle key would be xxhash64-hashed first (the
    * q_simjoin_prefix trick) to cut shuffle bytes; kept as text here so
    * the oracle can compare the human-readable shingles. Order is total:
    * (n_total, n_docs, shingle) — shingle is unique in the output. */
  val boilerplate: Q = Q.checked(
    "q_boilerplate",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
      |           FROM documents),
      |s AS (SELECT doc_id, array_to_string(w[i:i+4], ' ') AS shingle
      |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(w)-4))
      |                       AS i) u
      |      WHERE len(w) >= 5)
      |SELECT shingle, CAST(count(*) AS BIGINT) AS n_total,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM s GROUP BY shingle HAVING count(DISTINCT doc_id) >= 3
      |ORDER BY n_total DESC, n_docs DESC, shingle LIMIT 50""".stripMargin
  ) { (s, dir) =>
    Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 4)," +
          " i -> concat_ws(' ', slice(w, i, 5)))")).as("shingle"))
      .groupBy("shingle")
      .agg(count(lit(1)).as("n_total"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 3)
      .orderBy(col("n_total").desc, col("n_docs").desc, col("shingle"))
      .limit(50)
  }

  /** INCREMENTAL near-dup: an incoming batch (docs with doc_id % 5 = 0 —
    * a deterministic 20% "new crawl" slice) is checked against the
    * standing corpus (the other 80%) WITHOUT re-comparing the corpus to
    * itself — the O(Δ) shape a daily-ingest dedup pass needs at 100 TB,
    * where re-running the full self-join per batch is a non-starter.
    *
    * Scale design: only the DELTA side drives the join; the corpus side
    * is the prefix-blocked index frame a production pipeline would keep
    * materialized (bucketed by prefix, so the per-batch join is
    * shuffle-free on the corpus side). Candidates = prefix-block matches
    * (never all-pairs); verification is exact trigram Jaccard, reported
    * as an integer milli-ratio (floor div — no float drift), with the
    * ≥ 0.5 duplicate flag the apply step would act on. */
  val dedupIncr: Q = Q.checked(
    "q_dedup_incr",
    """WITH sh AS (
      |  SELECT doc_id, substr(text, 1, 40) AS prefix,
      |    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
      |      i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS shingles
      |  FROM documents)
      |SELECT d.doc_id AS delta_doc, c.doc_id AS corpus_doc,
      |  CAST(len(list_intersect(d.shingles, c.shingles)) AS BIGINT) AS n_int,
      |  CAST(len(d.shingles) + len(c.shingles)
      |    - len(list_intersect(d.shingles, c.shingles)) AS BIGINT) AS n_union,
      |  CAST(len(list_intersect(d.shingles, c.shingles)) AS BIGINT) * 1000
      |    // CAST(len(d.shingles) + len(c.shingles)
      |         - len(list_intersect(d.shingles, c.shingles)) AS BIGINT)
      |    AS jaccard_milli,
      |  CASE WHEN CAST(len(list_intersect(d.shingles, c.shingles)) AS BIGINT) * 1000
      |    // CAST(len(d.shingles) + len(c.shingles)
      |         - len(list_intersect(d.shingles, c.shingles)) AS BIGINT) >= 500
      |    THEN 1 ELSE 0 END AS is_dup
      |FROM sh d JOIN sh c
      |  ON d.prefix = c.prefix AND d.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
      |ORDER BY delta_doc, corpus_doc""".stripMargin
  ) { (s, dir) =>
    val sh = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), substring(col("text"), 1, 40).as("prefix"),
        expr(
          """array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
            |i -> concat_ws(' ', slice(split(text, ' '), i, 3))))""".stripMargin)
          .as("shingles"))
    val delta = sh.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id").as("delta_doc"), col("prefix"),
        col("shingles").as("sh_d"))
    val corpus = sh.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id").as("corpus_doc"), col("prefix").as("prefix_c"),
        col("shingles").as("sh_c"))
    val nInt = size(array_intersect(col("sh_d"), col("sh_c"))).cast(LongType)
    val nUnion = (size(col("sh_d")) + size(col("sh_c"))).cast(LongType) - nInt
    delta.join(corpus, col("prefix") === col("prefix_c"))
      .select(col("delta_doc"), col("corpus_doc"), nInt.as("n_int"),
        nUnion.as("n_union"))
      .withColumn("jaccard_milli", expr("n_int * 1000 div n_union"))
      .withColumn("is_dup",
        when(col("jaccard_milli") >= 500, 1).otherwise(0))
      .orderBy("delta_doc", "corpus_doc")
  }

  /** Token-LENGTH histogram per language (round 12): whitespace-token
    * lengths bucketed 1..9 with a ≥10 cap, counts plus per-language
    * milli shares — the tokenizer-diagnostics view ([[q_text_tokens]]
    * counts tokens, this profiles their SHAPE: a language whose mass
    * sits in the cap bucket needs byte-level pre-splitting; a spike at
    * 1 flags tokenization debris). Exact integers end to end. Scale:
    * the explode is map-side (one pass over text), the aggregate
    * map-side-combines onto ≤ |langs|×10 groups, and the share window
    * runs over that same bounded frame — never token-grain rows. */
  val tokenLenHist: Q = Q.checked(
    "q_token_len_hist",
    """WITH t AS (
      |  SELECT lang, least(length(tok), 10) AS len
      |  FROM (SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS tok
      |        FROM documents) u
      |  WHERE length(tok) > 0)
      |SELECT lang, CAST(len AS BIGINT) AS len, count(*) AS n_tokens,
      |  CAST(count(*) * 1000 //
      |    sum(count(*)) OVER (PARTITION BY lang) AS BIGINT) AS share_milli
      |FROM t GROUP BY lang, len ORDER BY lang, len""".stripMargin
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.fanned(s, dir, "documents", "doc_id").select(col("lang"),
      explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("lang"),
        least(length(col("tok")), lit(10)).cast(LongType).as("len"))
    toks.groupBy("lang", "len")
      .agg(count(lit(1)).as("n_tokens"))
      .withColumn("__tot", sum(col("n_tokens"))
        .over(Window.partitionBy("lang")))
      .withColumn("share_milli", expr("n_tokens * 1000 div __tot"))
      .drop("__tot")
      .orderBy("lang", "len")
  }

  val all: Seq[Q] = Seq(textStats, textQuality, textLangid, textFingerprint,
    textTokens, dedupExact, dedupNear, dedupNgram, dedupBanded, minhashLsh,
    dedupEmbed,
    simTopk,
    simCentroid, multimodalJoin, multimodalProfile, boilerplate, dedupIncr,
    tokenLenHist)
}
