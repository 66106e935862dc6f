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
      |  sum(n_chars) AS sum_chars,
      |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
      |  sum(CAST(length(string_split(text, ' ')) AS BIGINT)) AS sum_tokens,
      |  count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    Tables.documents(s, dir)
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
    val e = Tables.embeddings(s, dir)
    val v0 = e.filter(col("vec_id") === 0).select(col("embedding").as("e0"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(v0))
      .withColumn("dot", expr(
        """aggregate(zip_with(embedding, e0,
          |(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))
      .withColumn("n1", sqrt(expr(
        """aggregate(embedding, CAST(0 AS DOUBLE),
          |(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""".stripMargin)))
      .withColumn("n0", sqrt(expr(
        """aggregate(e0, CAST(0 AS DOUBLE),
          |(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""".stripMargin)))
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
    Tables.embeddings(s, dir)
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
      |  sum(n_chars) AS sum_chars,
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

  val all: Seq[Q] = Seq(textStats, dedupExact, dedupNear, simTopk,
    simCentroid, multimodalJoin)
}
