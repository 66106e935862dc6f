package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-governance operators for a pretraining corpus: benchmark
  * decontamination, repetition (quality) scoring, and anonymization with a
  * k-anonymity publish gate. These close the loop the curation pillar
  * (CurateOps) opens: after sampling/dedup, a real pipeline must prove the
  * training split does not contain the eval set, score pathological
  * repetition, and strip quasi-identifiers before the corpus leaves the
  * trust boundary.
  *
  * Scale design: decontamination is the canonical asymmetric join — the
  * eval set is tiny by construction (≤1% of docs), so its n-gram set is
  * DISTINCT'd and broadcast; the 100 TB training side is map-only scanned
  * with a broadcast semi-join probe (no shuffle of the big side, no
  * pairwise doc compare). Repetition and anonymization are single-shuffle
  * integer-exact aggregations.
  */
object GovernOps {

  /** Benchmark decontamination: flag training documents sharing any
    * 4-gram (word shingle) with the eval holdout (doc_id % 97 == 0 — the
    * deterministic ~1% eval split). Counts are per language so the
    * decontamination report lines up with the mixture report
    * (q_mix_weights).
    *
    * The join carries the shingle STRINGS for oracle-exactness; at 100 TB
    * the same plan ships xxhash64(gram) (8 bytes vs ~25) — collision odds
    * ~n²/2⁶⁵ are acceptable for a flag-and-review pipeline but would be a
    * (vanishingly rare) nondeterminism vs the string oracle here.
    */
  val decontaminate: Q = Q.checked(
    "q_decontaminate",
    """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
      |           FROM documents),
      |g AS (SELECT doc_id, lang,
      |        unnest(list_transform(range(1, len(toks) - 2),
      |          i -> array_to_string(toks[i:i+3], ' '))) AS gram
      |      FROM d WHERE len(toks) >= 4),
      |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
      |hit AS (SELECT DISTINCT g.doc_id, g.lang FROM g
      |        JOIN ev USING (gram) WHERE g.doc_id % 97 <> 0),
      |base AS (SELECT lang, count(*) AS n_train FROM d
      |         WHERE doc_id % 97 <> 0 GROUP BY lang),
      |c AS (SELECT lang, count(*) AS n_contaminated FROM hit GROUP BY lang)
      |SELECT base.lang, base.n_train,
      |  CAST(coalesce(c.n_contaminated, 0) AS BIGINT) AS n_contaminated
      |FROM base LEFT JOIN c USING (lang) ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
    // one shared shingle expression across the engine (MinHashLsh,
    // CurateStream.decontGate, here): empty array for sub-4-token docs
    // (explode drops them), per-doc-distinct grams (hits are DISTINCT'd
    // by doc anyway, so the dedup is free correctness)
    val grams = docs
      .select(col("doc_id"), col("lang"), explode(expr(
        graft.dedup.MinHashLsh.shingleExpr("toks", 4))).as("gram"))
    val eval = grams.filter(col("doc_id") % 97 === 0).select("gram").distinct()
    // broadcast the small eval-gram set; LEFT SEMI keeps the big side
    // shuffle-free and never duplicates a training row
    val hits = grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(eval), Seq("gram"), "left_semi")
      .select("doc_id", "lang").distinct()
    val base = docs.filter(col("doc_id") % 97 =!= 0)
      .groupBy("lang").agg(count(lit(1)).as("n_train"))
    val contam = hits.groupBy("lang").agg(count(lit(1)).as("n_contaminated"))
    base.join(contam, Seq("lang"), "left")
      .select(col("lang"), col("n_train"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .orderBy("lang")
  }

  /** Gopher-style repetition scoring: per language, total tokens, total
    * duplicated tokens (n_tok − n_distinct), and how many docs are more
    * than half duplicates. Integer-exact throughout — the >0.5 threshold
    * is the cross-multiplied `2·n_dup > n_tok`, so no float ever forms
    * (SURVEY §7.5). Map-only per-doc scoring + one shuffle on lang. */
  val textRepetition: Q = Q.checked(
    "q_text_repetition",
    """WITH r AS (SELECT lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST(len(string_split(text, ' '))
      |      - len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_dup
      |  FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
      |  CAST(sum(n_dup) AS BIGINT) AS sum_dup,
      |  CAST(count_if(2 * n_dup > n_tok) AS BIGINT) AS n_repetitive
      |FROM r GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    val toks = split(col("text"), " ")
    Tables.documents(s, dir)
      .select(col("lang"), size(toks).cast(LongType).as("n_tok"),
        (size(toks) - size(array_distinct(toks))).cast(LongType).as("n_dup"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tok"),
        sum(col("n_dup")).as("sum_dup"),
        count(when(col("n_dup") * 2 > col("n_tok"), 1)).as("n_repetitive"))
      .orderBy("lang")
  }

  /** Anonymized release table: generalize the quasi-identifiers
    * (nation, account balance → 1000-unit bucket), pseudonymize the direct
    * identifier (md5 of name — count distinct proves no two customers
    * fused), and publish ONLY k-anonymous groups (HAVING n ≥ 5 — the
    * suppression gate). floor(x/1000) is boundary-exact: balances carry 2
    * decimals, so the quotient is never within 1 ulp of an integer except
    * at exact multiples, which both engines divide identically. */
  val anonymize: Q = Q.checked(
    "q_anonymize",
    """SELECT c_nationkey,
      |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
      |  count(*) AS n,
      |  CAST(count(DISTINCT md5(c_name)) AS BIGINT) AS n_pseudonyms
      |FROM customer
      |GROUP BY 1, 2 HAVING count(*) >= 5
      |ORDER BY 1, 2""".stripMargin
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast(LongType).as("bal_bucket"))
      .agg(count(lit(1)).as("n"),
        countDistinct(md5(col("c_name").cast(BinaryType))).as("n_pseudonyms"))
      .filter(col("n") >= 5)
      .orderBy("c_nationkey", "bal_bucket")
  }

  /** Free-ride ingest audit through the driver contract: tag the
    * lineitem scan with observed metrics (row count, exact decimal
    * quantity checksum, null-date tally), drive it with a DOWNSTREAM
    * revenue aggregate — the query a job would run anyway — and emit
    * the audit row the observation produced. The oracle computes the
    * same three aggregates directly; equality proves the piggybacked
    * audit measures exactly what a dedicated pass would, for zero extra
    * scans ([[graft.sources.Observe]]). The revenue result itself is
    * carried in the row so the driving action is visibly real work. */
  val auditFreeride: Q = Q.checked(
    "q_audit_freeride",
    """SELECT count(*) AS rows_seen,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(28,12))) AS DOUBLE)
      |    AS qty_checksum,
      |  CAST(count(CASE WHEN l_shipdate IS NULL THEN 1 END) AS BIGINT)
      |    AS null_ship,
      |  CAST(sum(CASE WHEN l_quantity > 10
      |    THEN CAST(l_extendedprice AS DECIMAL(28,12)) END) AS DOUBLE)
      |    AS revenue_gt10
      |FROM lineitem""".stripMargin
  ) { (s, dir) =>
    import graft.sources.Observe
    val tagged = Observe.tagged(Tables.lineitem(s, dir), "ingest",
      "rows_seen" -> count(lit(1)),
      "qty_checksum" -> sum(col("l_quantity").cast("decimal(28,12)")),
      "null_ship" -> count(when(col("l_shipdate").isNull, 1)))
    val driving = tagged.filter(col("l_quantity") > 10)
      .agg(sum(col("l_extendedprice").cast("decimal(28,12)")).as("rev"))
    val revenue = driving.collect()(0).getDecimal(0)
    val m = Observe.metricsOf(driving, "ingest")
      .getOrElse(sys.error("observed metrics missing"))
    import s.implicits._
    Seq((m("rows_seen").asInstanceOf[Long],
      m("qty_checksum").asInstanceOf[java.math.BigDecimal].doubleValue(),
      m("null_ship").asInstanceOf[Long],
      revenue.doubleValue()))
      .toDF("rows_seen", "qty_checksum", "null_ship", "revenue_gt10")
  }

  val all: Seq[Q] = Seq(decontaminate, textRepetition, anonymize,
    auditFreeride)
}
