package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Weighted sampling and continuous quantiles — the two distribution ops
  * CurateOps' discrete machinery (hash splits, quota samples, rank-crossing
  * quantiles) deliberately left out. (North-star additions; SURVEY §0.)
  *
  * Scale design: the weighted sample is the A-ES reservoir formulation —
  * a map-only priority key per row, then per-stratum top-k — so it runs
  * as one window shuffle on the stratum key (or a TopKAgg-style bounded
  * aggregation at real scale) with NO global state and NO driver RNG:
  * the "randomness" is a multiplicative integer hash of the row key,
  * reproducible across runs, partitionings, and engines. Continuous
  * quantiles are one window shuffle + a 5-row lerp.
  *
  * Determinism (SURVEY §7.5): the A-ES priority −ln(u)/w is transcendental,
  * so the key is snapped to a BIGINT at 1e12 scale with floor(x+0.5)
  * (the engines' libm ln may drift an ulp; the snap absorbs it — verified
  * over the full corpus at sf0.01 and sf0.1), and all ordering ties break
  * on doc_id. Quantile interpolation fractions are exact quarters
  * (m mod 4 · 0.25), and the lerp is a fixed correctly-rounded tree.
  */
object SampleOps {

  /** Weighted sample without replacement (A-ES, Efraimidis–Spirakis),
    * 20 docs per language, weight = n_chars: priority = −ln(u)/w with
    * u = (knuth_hash(doc_id) + ½)/2³², smallest-k selected — equivalent
    * to largest u^(1/w). Longer docs are proportionally likelier to be
    * drawn, and the draw is stable under corpus growth: a doc's priority
    * never changes when neighbors arrive. */
  val sampleWeighted: Q = Q.checked(
    "q_sample_weighted",
    """WITH k AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(floor((0.0e0 - ln((CAST((doc_id * 2654435761) % 4294967296
      |            AS DOUBLE) + 5.0e-1) / 4294967296.0e0))
      |          / CAST(n_chars AS DOUBLE) * 1.0e12 + 5.0e-1) AS BIGINT)
      |      AS priority
      |  FROM documents),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang
      |        ORDER BY priority, doc_id) AS rnk FROM k)
      |SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars, priority
      |FROM r WHERE rnk <= 20 ORDER BY lang, rnk""".stripMargin
  ) { (s, dir) =>
    val h = (col("doc_id") * lit(2654435761L)) % lit(4294967296L)
    val u = (h.cast(DoubleType) + lit(0.5)) / lit(4294967296.0)
    val priority = floor((lit(0.0) - log(u)) / col("n_chars").cast(DoubleType)
      * lit(1.0e12) + lit(0.5)).as("priority")
    // smallest-20 per lang via TopKAgg on the NEGATED priority (priority
    // ≤ ~1e13 < 2^52 is exact as Double, and negation preserves the
    // doc_id tie-break): k-bounded map-side buffers instead of a rank
    // window that sorts a language's whole corpus in one task. n_chars
    // re-attaches via a broadcast of the ≤20·|langs| winners.
    val bot20 = udaf(new graft.functions.TopKAgg(20))
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), priority)
    val top = d.groupBy("lang")
      .agg(bot20((col("priority") * -1).cast(DoubleType), col("doc_id"))
        .as("bot"))
      .select(col("lang"), posexplode(col("bot")).as(Seq("pos", "t")))
      .select(col("lang"), (col("pos") + 1).cast(LongType).as("rnk"),
        col("t._2").as("doc_id"),
        (col("t._1") * -1).cast(LongType).as("priority"))
    d.select("doc_id", "n_chars")
      .join(broadcast(top), "doc_id")
      .select("lang", "rnk", "doc_id", "n_chars", "priority")
      .orderBy("lang", "rnk")
  }

  /** Continuous (type-7, the R/NumPy/DuckDB-default) interpolated
    * quartiles per market segment, computed manually on both engines so
    * neither's builtin FP-combination order is trusted: position
    * h = (n−1)·q splits into integer rank + exact quarter fraction, the
    * two bracketing values are picked by rank-crossing (q_quantile_disc's
    * technique), and p = lo + f·(hi−lo) is one fixed IEEE tree. */
  val quantileCont: Q = Q.checked(
    "q_quantile_cont",
    """WITH r AS (
      |  SELECT c_mktsegment, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal, c_custkey) AS rn,
      |    count(*) OVER (PARTITION BY c_mktsegment) AS n
      |  FROM customer),
      |pick AS (
      |  SELECT c_mktsegment, n,
      |    min(CASE WHEN rn = (n-1) // 4 + 1 THEN c_acctbal END) AS lo25,
      |    min(CASE WHEN rn = least((n-1) // 4 + 2, n) THEN c_acctbal END)
      |      AS hi25,
      |    min(CASE WHEN rn = (n-1) // 2 + 1 THEN c_acctbal END) AS lo50,
      |    min(CASE WHEN rn = least((n-1) // 2 + 2, n) THEN c_acctbal END)
      |      AS hi50,
      |    min(CASE WHEN rn = (3*(n-1)) // 4 + 1 THEN c_acctbal END) AS lo75,
      |    min(CASE WHEN rn = least((3*(n-1)) // 4 + 2, n) THEN c_acctbal END)
      |      AS hi75
      |  FROM r GROUP BY c_mktsegment, n)
      |SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
      |  lo25 + (CAST((n-1) % 4 AS DOUBLE) * 2.5e-1) * (hi25 - lo25) AS p25,
      |  lo50 + (CAST((n-1) % 2 AS DOUBLE) * 5.0e-1) * (hi50 - lo50) AS p50,
      |  lo75 + (CAST((3*(n-1)) % 4 AS DOUBLE) * 2.5e-1) * (hi75 - lo75)
      |    AS p75
      |FROM pick ORDER BY c_mktsegment""".stripMargin
  ) { (s, dir) =>
    def pickAt(rnExpr: String, name: String) =
      min(when(expr(s"rn = $rnExpr"), col("c_acctbal"))).as(name)
    // global rank via the bucketed two-pass (RankedFrames) — a direct
    // per-segment window would sort the whole corpus on ~5 tasks
    graft.ops.RankedFrames.rankedByValue(
        Tables.customer(s, dir)
          .select("c_mktsegment", "c_acctbal", "c_custkey"),
        "c_mktsegment", "c_acctbal", "c_custkey")
      .groupBy("c_mktsegment", "n")
      .agg(pickAt("(n-1) div 4 + 1", "lo25"),
        pickAt("least((n-1) div 4 + 2, n)", "hi25"),
        pickAt("(n-1) div 2 + 1", "lo50"),
        pickAt("least((n-1) div 2 + 2, n)", "hi50"),
        pickAt("(3*(n-1)) div 4 + 1", "lo75"),
        pickAt("least((3*(n-1)) div 4 + 2, n)", "hi75"))
      .select(col("c_mktsegment"), col("n").cast(LongType).as("n"),
        (col("lo25") + (expr("(n-1) % 4").cast(DoubleType) * lit(0.25))
          * (col("hi25") - col("lo25"))).as("p25"),
        (col("lo50") + (expr("(n-1) % 2").cast(DoubleType) * lit(0.5))
          * (col("hi50") - col("lo50"))).as("p50"),
        (col("lo75") + (expr("(3*(n-1)) % 4").cast(DoubleType) * lit(0.25))
          * (col("hi75") - col("lo75"))).as("p75"))
      .orderBy("c_mktsegment")
  }

  /** Deterministic EPOCH SHUFFLE sharding — "globally shuffle 100 TB
    * without a global sort": order key = md5 of (epoch salt, doc_id), a
    * uniform pseudo-random permutation that changes per epoch (vary the
    * salt) and is identical across runs and engines; shard = the key's
    * first hex nibble. Writers `partitionBy(shard)` and sort WITHIN each
    * shard by the remaining key — a map-only pass plus one local sort,
    * no global exchange — and readers stream shards in any order for a
    * uniformly shuffled epoch. The report proves the two properties the
    * layout depends on: shard sizes are balanced (count per shard) and
    * shard key ranges partition the keyspace (min/max per shard are
    * disjoint across shards by construction of the nibble split). */
  val shuffleShards: Q = Q.checked(
    "q_shuffle_shards",
    """WITH k AS (
      |  SELECT md5(concat('epoch1:', CAST(doc_id AS VARCHAR))) AS okey,
      |    len(string_split(text,' ')) AS n_tok
      |  FROM documents)
      |SELECT substr(okey, 1, 1) AS shard, count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
      |  min(okey) AS key_lo, max(okey) AS key_hi
      |FROM k GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    val k = Tables.documents(s, dir)
      .select(md5(concat(lit("epoch1:"), col("doc_id").cast(StringType)))
          .as("okey"),
        size(split(col("text"), " ")).cast(LongType).as("n_tok"))
    k.groupBy(substring(col("okey"), 1, 1).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        min(col("okey")).as("key_lo"),
        max(col("okey")).as("key_hi"))
      .orderBy("shard")
  }

  val all: Seq[Q] = Seq(sampleWeighted, quantileCont, shuffleShards)
}
