package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 global-order analytics + corpus-profile additions: customer
  * spend deciles and part ABC classification (the two canonical
  * "order the WHOLE relation" reports — both ride [[RankedFrames]],
  * never a partition-less window), new-vs-returning revenue splits,
  * hapax-legomena vocabulary health, and exact histogram-derived
  * document-length percentiles.
  *
  * Determinism (SURVEY §7.5): money flows through decimal(18,2) cents
  * as BIGINT; ratios ship as BIGINT milli/micro integer divisions
  * (`div`, never `/`); NO decimal at any output boundary (the verified
  * driver-hash envelope); every multi-row output carries a total
  * ORDER BY. The oracles state plain global windows (ntile / running
  * sums); the engine computes the SAME answers distributively and the
  * hash-compare proves the two formulations identical. */
object OlapRankOps {

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,2)") * 100).cast("long")

  /** Global customer-spend deciles: every customer ranked by lifetime
    * revenue (cents DESC, custkey ties), NTILE(10), then per decile the
    * population, total and [lo, hi] band in cents — the
    * wallet-concentration table (which tenth of customers carries the
    * revenue). The oracle states the global window; the engine ranks
    * via [[RankedFrames.withGlobalNtile]] — a sampled range exchange +
    * per-partition offsets, the distributed sort-rank — so no task ever
    * holds the whole customer frame. */
  val decileSpend: Q = Q.checked(
    "q_decile_spend",
    """WITH rc AS (
      |  SELECT o_custkey,
      |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |      AS DECIMAL(18,0)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |banded AS (
      |  SELECT cents, ntile(10) OVER (ORDER BY cents DESC, o_custkey)
      |    AS decile
      |  FROM rc)
      |SELECT CAST(decile AS INT) AS decile,
      |  CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(sum(cents) AS BIGINT) AS total_cents,
      |  max(cents) AS hi_cents, min(cents) AS lo_cents
      |FROM banded GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    val rc = Tables.orders(s, dir)
      .groupBy("o_custkey")
      .agg(cents(sum(col("o_totalprice").cast("decimal(18,2)"))).as("cents"))
    RankedFrames.withGlobalNtile(rc,
        Seq(col("cents").desc, col("o_custkey")), 10, "decile")
      .groupBy("decile")
      .agg(count(lit(1)).as("n_cust"),
        sum("cents").cast("long").as("total_cents"),
        max("cents").as("hi_cents"), min("cents").as("lo_cents"))
      .orderBy("decile")
  }

  /** ABC inventory classification of parts by revenue: parts sorted by
    * revenue DESC, class A while the running share stays ≤80%, B to
    * ≤95%, C beyond — pure integer threshold tests (5·cum ≤ 4·total;
    * 20·cum ≤ 19·total), no division at all. The global running sum is
    * [[RankedFrames.withGlobalCumSum]] — per-range-partition sums
    * prefix-offset-joined, the distributed prefix-sum — where the
    * oracle states the plain cumulative window. Complements q_pareto
    * (per-SEGMENT 80/20 via partitioned windows): this is the
    * global-grain variant a partitioned window cannot reach. */
  val abcClass: Q = Q.checked(
    "q_abc_class",
    """WITH pr AS (
      |  SELECT l_partkey,
      |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
      |      AS DECIMAL(18,0)) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |c AS (
      |  SELECT l_partkey, cents,
      |    sum(cents) OVER (ORDER BY cents DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(cents) OVER () AS total
      |  FROM pr),
      |cls AS (
      |  SELECT l_partkey, cents,
      |    CASE WHEN 5 * cum <= 4 * total THEN 'A'
      |         WHEN 20 * cum <= 19 * total THEN 'B'
      |         ELSE 'C' END AS abc
      |  FROM c)
      |SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(cents) AS BIGINT) AS cents
      |FROM cls GROUP BY abc ORDER BY abc""".stripMargin
  ) { (s, dir) =>
    val pr = Tables.lineitem(s, dir)
      .groupBy("l_partkey")
      .agg(cents(sum(col("l_extendedprice").cast("decimal(18,2)")))
        .as("cents"))
    RankedFrames.withGlobalCumSum(pr,
        Seq(col("cents").desc, col("l_partkey")), col("cents"))
      .withColumn("abc",
        when(lit(5) * col("cum") <= lit(4) * col("total"), lit("A"))
          .when(lit(20) * col("cum") <= lit(19) * col("total"), lit("B"))
          .otherwise(lit("C")))
      .groupBy("abc")
      .agg(count(lit(1)).as("n_parts"), sum("cents").cast("long").as("cents"))
      .orderBy("abc")
  }

  /** New-vs-returning revenue split per month: each order is NEW when
    * its month equals the customer's first-order month, RETURNING
    * otherwise; per month the order counts and cents of both sides —
    * the acquisition-vs-retention revenue mix. The firsts frame is
    * per-customer, joined on the SAME key the orders hash on (plain
    * equi-join — AQE broadcasts when small, co-partitions when not;
    * the q_cohort_retention lesson: no forced broadcast of an
    * unbounded frame). */
  val newVsReturning: Q = Q.checked(
    "q_new_vs_returning",
    """WITH f AS (
      |  SELECT o_custkey,
      |    CAST(min(date_trunc('month', o_orderdate)) AS DATE) AS m0
      |  FROM orders GROUP BY 1)
      |SELECT CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
      |  CAST(count(*) FILTER (WHERE
      |    CAST(date_trunc('month', o.o_orderdate) AS DATE) = f.m0)
      |    AS BIGINT) AS n_new,
      |  CAST(coalesce(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
      |      * 100 AS DECIMAL(18,0)) AS BIGINT))
      |    FILTER (WHERE CAST(date_trunc('month', o.o_orderdate) AS DATE)
      |      = f.m0), 0) AS BIGINT) AS new_cents,
      |  CAST(count(*) FILTER (WHERE
      |    CAST(date_trunc('month', o.o_orderdate) AS DATE) <> f.m0)
      |    AS BIGINT) AS n_ret,
      |  CAST(coalesce(sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
      |      * 100 AS DECIMAL(18,0)) AS BIGINT))
      |    FILTER (WHERE CAST(date_trunc('month', o.o_orderdate) AS DATE)
      |      <> f.m0), 0) AS BIGINT) AS ret_cents
      |FROM orders o JOIN f ON o.o_custkey = f.o_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val f = o.groupBy("o_custkey")
      .agg(date_trunc("month", min(col("o_orderdate"))).cast("date")
        .as("m0"))
    o.join(f, "o_custkey")
      .select(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"),
        col("m0"), cents(col("o_totalprice")).as("c"))
      .withColumn("is_new", (col("month") === col("m0")).cast("long"))
      .groupBy("month")
      .agg(sum("is_new").as("n_new"),
        coalesce(sum(when(col("is_new") === 1L, col("c"))), lit(0L))
          .as("new_cents"),
        (count(lit(1)) - sum("is_new")).as("n_ret"),
        coalesce(sum(when(col("is_new") === 0L, col("c"))), lit(0L))
          .as("ret_cents"))
      .orderBy("month")
  }

  /** Hapax-legomena share per language — the vocabulary-health screen
    * (a rising hapax share flags OCR noise / tokenizer drift; a
    * collapsing one flags template spam): per lang the vocabulary
    * size, token total, hapax count (tokens seen exactly once) and the
    * milli-share hapax/vocab. Tokens are the house whitespace
    * convention; the aggregation is vocab-grain (two hash aggregates,
    * map-side combined), never a window. */
  val hapaxShare: Q = Q.checked(
    "q_hapax_share",
    """WITH t AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |v AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
      |      FROM t GROUP BY 1, 2)
      |SELECT lang, CAST(count(*) AS BIGINT) AS vocab,
      |  CAST(sum(c) AS BIGINT) AS tokens,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
      |  CAST(1000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) // count(*)
      |    AS BIGINT) AS hapax_milli
      |FROM v GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    val v = Tables.documents(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok")
      .agg(count(lit(1)).as("c"))
    v.groupBy("lang")
      .agg(count(lit(1)).as("vocab"),
        sum("c").cast("long").as("tokens"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"))
      .select(col("lang"), col("vocab"), col("tokens"), col("hapax"),
        expr("CAST(1000 * hapax div vocab AS BIGINT)").as("hapax_milli"))
      .orderBy("lang")
  }

  /** Exact document-length percentiles per source (p50/p90/p99 token
    * counts, nearest-rank definition: the smallest length whose
    * cumulative count reaches ⌈k·n/100⌉) — computed from the LENGTH
    * HISTOGRAM, so the cumulative window runs over the bounded token-
    * count DOMAIN per source, never over doc-grain rows: the exact
    * distributed percentile without a sort of the corpus. Both engines
    * state the identical histogram + threshold formulation. */
  val docLenPctl: Q = Q.checked(
    "q_doc_len_pctl",
    """WITH d AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT)
      |    AS ntok
      |  FROM documents),
      |h AS (SELECT source, ntok, CAST(count(*) AS BIGINT) AS c
      |      FROM d GROUP BY 1, 2),
      |w AS (
      |  SELECT source, ntok, c,
      |    sum(c) OVER (PARTITION BY source ORDER BY ntok
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(c) OVER (PARTITION BY source) AS n
      |  FROM h)
      |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
      |  CAST(min(CASE WHEN 100 * cum >= 50 * n THEN ntok END) AS BIGINT)
      |    AS p50,
      |  CAST(min(CASE WHEN 100 * cum >= 90 * n THEN ntok END) AS BIGINT)
      |    AS p90,
      |  CAST(min(CASE WHEN 100 * cum >= 99 * n THEN ntok END) AS BIGINT)
      |    AS p99
      |FROM w GROUP BY source ORDER BY source""".stripMargin
  ) { (s, dir) =>
    val h = Tables.documents(s, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .groupBy("source", "ntok")
      .agg(count(lit(1)).as("c"))
    // windows over the per-source LENGTH-DOMAIN frame (≤ max doc length
    // rows per source) — domain-bounded, source-partitioned
    val cumW = Window.partitionBy("source").orderBy("ntok")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val w = h.withColumn("cum", sum("c").over(cumW))
      .withColumn("n", sum("c").over(Window.partitionBy("source")))
    w.groupBy("source")
      .agg(max("n").cast("long").as("n_docs"),
        min(when(lit(100) * col("cum") >= lit(50) * col("n"), col("ntok")))
          .cast("long").as("p50"),
        min(when(lit(100) * col("cum") >= lit(90) * col("n"), col("ntok")))
          .cast("long").as("p90"),
        min(when(lit(100) * col("cum") >= lit(99) * col("n"), col("ntok")))
          .cast("long").as("p99"))
      .orderBy("source")
  }

  val all: Seq[Q] =
    Seq(decileSpend, abcClass, newVsReturning, hapaxShare, docLenPctl)
}
