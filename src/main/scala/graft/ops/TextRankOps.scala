package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pretraining text preparation beyond the curation pillar: context-window
  * chunking, BM25 relevance ranking, and token-entropy quality scoring.
  * (Reference surface: the upstream repo processes whole extracts;
  * chunking/ranking are north-star LLM-pipeline additions per
  * BASELINE.json:6 — no reference file:line exists, SURVEY §0.)
  *
  * Scale design: chunking is a map-only generate (rows out = Σ chunks, no
  * shuffle — the downstream tokenizer shard is where the first shuffle
  * belongs); BM25 is two hash aggregations over the term-filtered slice of
  * the posting explosion plus two broadcast joins (the corpus constants
  * are a 1-row frame, term df a |terms|-row frame — nothing global ever
  * shuffles the big side); entropy is one hash aggregation at (doc, token)
  * grain then a per-doc reduce — both shuffles carry counts, not text.
  *
  * Determinism (SURVEY §7.5): BM25 idf is floor-division integer-scaled
  * (the q_tfidf recipe) so no ln() crosses engines; the tf-saturation part
  * is a fixed tree of correctly-rounded IEEE double ops, bit-identical
  * given identical inputs. Entropy terms are snapped to integers at 1e10
  * scale via floor(x + 0.5) — floor never ties (the VectorOps recipe) —
  * and summed exactly in BIGINT, so the per-doc sum is order-free.
  */
object TextRankOps {

  /** Sliding context-window chunking: 32-token chunks every 24 tokens
    * (8-token overlap), the shape a pretraining tokenizer feeds from.
    * n_chunks = ceil(max(n-32,0)/24) + 1 in pure integer math; every
    * chunk is non-empty by construction (last start < n). Emits a
    * per-chunk md5 fingerprint — the join key chunk-level dedup uses. */
  val chunkDocs: Q = Q.checked(
    "q_chunk_docs",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents),
      |c AS (SELECT doc_id, toks,
      |        unnest(range(0, (greatest(len(toks) - 32, 0) + 23) // 24 + 1))
      |          AS chunk_id
      |      FROM t),
      |s AS (SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
      |        toks[chunk_id * 24 + 1 : least(chunk_id * 24 + 32, len(toks))]
      |          AS ctoks
      |      FROM c)
      |SELECT doc_id, chunk_id, CAST(len(ctoks) AS BIGINT) AS n_tok,
      |  ctoks[1] AS first_tok, md5(array_to_string(ctoks, ' ')) AS fp
      |FROM s ORDER BY doc_id, chunk_id""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          expr("(greatest(size(toks) - 32, 0) + 23) div 24"))).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast(LongType).as("chunk_id"),
        slice(col("toks"), col("chunk_id") * 24 + 1, lit(32)).as("ctoks"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ctoks")).cast(LongType).as("n_tok"),
        element_at(col("ctoks"), 1).as("first_tok"),
        md5(array_join(col("ctoks"), " ").cast(BinaryType)).as("fp"))
      .orderBy("doc_id", "chunk_id")
  }

  /** BM25 (k1=1.2, b=0.75) top-10 docs per query term, over terms from
    * three df bands (dup is the planted-near-dup marker, ~5% df).
    *
    * idf6 = ((N-df)·2+1)·10⁶ div (df·2+1) — the BM25 idf ratio
    * (N-df+0.5)/(df+0.5) scaled ×10⁶ in exact integer floor division
    * (no ln: the saturation in tf already yields the ranking; idf's log
    * only compresses the range, and the integer ratio preserves its
    * ordering). The remaining double math is one fixed expression tree:
    *   score = idf6 · (tf·2.2) / (tf + 0.3 + 0.9·(dl·(N/Σdl)))
    * — every op correctly rounded, so both engines produce bit-identical
    * doubles and identical ranks. */
  val bm25: Q = Q.checked(
    "q_bm25",
    """WITH toks AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |         unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, dl, token, count(*) AS tf FROM toks
      |       WHERE token IN ('dup', 'join', 'spark') GROUP BY 1, 2, 3),
      |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      |n AS (SELECT count(*) AS n_docs,
      |        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_dl
      |      FROM documents),
      |scored AS (
      |  SELECT tf.token, tf.doc_id, tf.tf, tf.dl,
      |    (((n_docs - df) * 2 + 1) * 1000000) // (df * 2 + 1) AS idf6,
      |    CAST((((n_docs - df) * 2 + 1) * 1000000) // (df * 2 + 1) AS DOUBLE)
      |      * (CAST(tf AS DOUBLE) * 2.2e0)
      |      / (CAST(tf AS DOUBLE) + 3.0e-1 + 9.0e-1
      |         * (CAST(dl AS DOUBLE)
      |            * (CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))))
      |      AS score
      |  FROM tf JOIN df USING (token), n),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY token
      |    ORDER BY score DESC, doc_id) AS rnk
      |  FROM scored)
      |SELECT token, CAST(rnk AS BIGINT) AS rnk, doc_id, tf, dl, idf6, score
      |FROM ranked WHERE rnk <= 10 ORDER BY token, rnk""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val tf = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
        explode(col("toks")).as("token"))
      .filter(col("token").isin("dup", "join", "spark"))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
      // df as a window over the tf frame (one row per (doc, token), so
      // rows-per-token = docs containing the token): a separate
      // groupBy+join would recompute the whole tf subtree and rescan
      // documents — plan-audited, round 4
      .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
    val n = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast(LongType)).as("sum_dl"))
    val scored = tf.crossJoin(broadcast(n))
      .withColumn("idf6",
        expr("(((n_docs - df) * 2 + 1) * 1000000) div (df * 2 + 1)"))
      .withColumn("score",
        col("idf6").cast(DoubleType) * (col("tf").cast(DoubleType) * lit(2.2)) /
          (col("tf").cast(DoubleType) + lit(0.3) +
            lit(0.9) * (col("dl").cast(DoubleType) *
              (col("n_docs").cast(DoubleType) / col("sum_dl").cast(DoubleType)))))
    val w = Window.partitionBy("token").orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 10)
      .select("token", "rnk", "doc_id", "tf", "dl", "idf6", "score")
      .orderBy("token", "rnk")
  }

  /** Per-document token-level Shannon entropy — the "word-soup vs
    * repeated-token spam" quality signal (low entropy = pathological
    * repetition; complements q_text_repetition's n-gram rate).
    *
    * H = (dl·log2(dl) − Σ tf·log2(tf)) / dl, so only integer-argument
    * log2 is ever evaluated. EVERY log term — the Σ members and the
    * dl·log2(dl) head — is snapped to a BIGINT at 1e10 scale
    * (floor(x·1e10 + 0.5)): engines' libm log2 can drift a ulp on the
    * same integer argument (measured: Spark vs DuckDB differ at the last
    * bit for some arguments), and the snap absorbs it (1 ulp ≈ 1e-3 at
    * this scale — far from the .5 boundary, verified over the full
    * corpus). The remaining math is exact BIGINT subtraction (order-free
    * across partitions) and two correctly-rounded divisions. */
  val textEntropy: Q = Q.checked(
    "q_text_entropy",
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, lang, token, count(*) AS tf
      |       FROM toks GROUP BY 1, 2, 3),
      |per_doc AS (
      |  SELECT doc_id, lang, CAST(sum(tf) AS BIGINT) AS dl,
      |    CAST(sum(CAST(floor(CAST(tf AS DOUBLE) * log2(CAST(tf AS DOUBLE))
      |      * 1e10 + 5.0e-1) AS BIGINT)) AS BIGINT) AS h10
      |  FROM tf GROUP BY 1, 2)
      |SELECT doc_id, lang, dl,
      |  CAST(CAST(floor(CAST(dl AS DOUBLE) * log2(CAST(dl AS DOUBLE))
      |      * 1e10 + 5.0e-1) AS BIGINT) - h10 AS DOUBLE)
      |    / 1e10 / CAST(dl AS DOUBLE) AS entropy
      |FROM per_doc ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      .groupBy("doc_id", "lang", "token").agg(count(lit(1)).as("tf"))
    tf.groupBy("doc_id", "lang")
      .agg(sum(col("tf")).as("dl"),
        sum(floor(col("tf").cast(DoubleType) * log2(col("tf").cast(DoubleType))
          * lit(1e10) + lit(0.5))).as("h10"))
      .select(col("doc_id"), col("lang"), col("dl"),
        ((floor(col("dl").cast(DoubleType) * log2(col("dl").cast(DoubleType))
            * lit(1e10) + lit(0.5)) - col("h10")).cast(DoubleType) /
          lit(1e10) / col("dl").cast(DoubleType)).as("entropy"))
      .orderBy("doc_id")
  }

  /** Multi-term BM25 retrieval — the actual search/RAG primitive on top
    * of q_bm25's per-term machinery: score every document against the
    * fixed query {join, fast, table} as the SUM of its per-term BM25
    * contributions, return the top-10 (doc, score, terms matched).
    *
    * Scale design: identical single-pass shape to q_bm25 — tf only for
    * query terms (the explode filters to a 3-token IN list before any
    * shuffle), df as a window over the tf frame (rows-per-token = docs
    * containing it; never a documents rescan), corpus totals a 1-row
    * broadcast, final top-k a TakeOrderedAndProject. The per-doc sum
    * folds ≤ |query| term scores: each term score is snapped to
    * DECIMAL(18,6) first, so the sum is exact and order-free
    * cross-engine (a raw double sum would depend on fold order). */
  /** Shared per-doc BM25 scorer over a fixed term set (the q_bm25_query
    * pipeline up to the per-doc aggregate): tf only for query terms, df as
    * a window over the tf frame, corpus totals a 1-row broadcast, each
    * term score snapped to DECIMAL(18,6) before the per-doc sum so the
    * fold is exact and order-free. Returns (doc_id, n_terms, score_dec)
    * with score_dec still DECIMAL — callers order on it exactly
    * ([[bm25Query]] casts to double only for display; q_rrf_fusion ranks
    * on the decimal).
    *
    * Scale note on the df window: it runs over ≤|query terms| partitions
    * whose size is docs-containing-the-term — fine for analysis terms,
    * hot for stopwords. The alternative (df as groupBy + join back)
    * recomputes the tf subtree — a second corpus scan on EVERY query.
    * The production answer is neither: serve repeated queries from the
    * materialized inverted index (RetrievalOps.writeInvertedIndex /
    * IndexStream / CdcIndex), where df is stored or derived from the
    * bucket-pruned postings and this window never runs. This corpus-scan
    * path is the build-time / ad-hoc form. */
  private[graft] def bm25DocScores(docs: org.apache.spark.sql.DataFrame,
      terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    val tf = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast(LongType).as("dl"),
        explode(col("toks")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
    bm25Score(tf, corpusStats(docs))
  }

  /** 1-row corpus totals frame (n_docs, sum_dl) — the broadcast side of
    * every BM25 scoring path. */
  private[graft] def corpusStats(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast(LongType)).as("sum_dl"))

  /** The BM25 arithmetic proper, shared by the corpus path above and the
    * inverted-index path (RetrievalOps): input is a posting-shaped frame
    * (doc_id, dl, token, tf, df) + the 1-row stats frame. Keeping this a
    * single function is what makes "query the index" provably equal to
    * "scan the corpus" — both paths run the same snapped expressions. */
  private[graft] def bm25Score(postings: org.apache.spark.sql.DataFrame,
      stats: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    postings.crossJoin(broadcast(stats))
      .withColumn("idf6",
        expr("(((n_docs - df) * 2 + 1) * 1000000) div (df * 2 + 1)"))
      .withColumn("term_score",
        (col("idf6").cast(DoubleType) *
          (col("tf").cast(DoubleType) * lit(2.2)) /
          (col("tf").cast(DoubleType) + lit(0.3) +
            lit(0.9) * (col("dl").cast(DoubleType) *
              (col("n_docs").cast(DoubleType) /
                col("sum_dl").cast(DoubleType)))))
          .cast(DecimalType(18, 6)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        sum(col("term_score")).as("score_dec"))

  val bm25Query: Q = Q.checked(
    "q_bm25_query",
    """WITH toks AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |         unnest(string_split(text, ' ')) AS token
      |  FROM documents),
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
      |  FROM tf JOIN df USING (token), n)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
      |  CAST(sum(term_score) AS DOUBLE) AS score
      |FROM scored GROUP BY doc_id
      |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  ) { (s, dir) =>
    bm25DocScores(Tables.documents(s, dir), Seq("join", "fast", "table"))
      .select(col("doc_id"), col("n_terms"),
        col("score_dec").cast(DoubleType).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(10)
  }

  val all: Seq[Q] = Seq(chunkDocs, bm25, textEntropy, bm25Query)
}
