package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 OLAP/statistics additions: four shapes the registry did not
  * yet cover — inequality/concentration measure (Gini), semi-additive
  * balance semantics (last-per-period then aggregate across the other
  * dimension), a non-parametric trend test (Mann-Kendall S), and
  * RANK-based top-N WITH TIES (vs the row_number top-k family).
  *
  * Determinism (SURVEY §7.5): money flows through decimal(18,2) cents
  * as BIGINT; ratios ship as cleared-denominator integer pairs, never
  * floats; every multi-row output carries a total ORDER BY.
  */
object OlapExtraOps {

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast("decimal(18,2)") * 100).cast("long")

  /** Gini concentration of customer revenue within each market segment —
    * the source-mix concentration audit shape (who dominates a slice).
    * With per-customer revenue x(1..n) ascending (ties broken by key —
    * sum i·x is tie-order-invariant), Gini = (2·Σi·xᵢ − (n+1)·Σxᵢ) /
    * (n·Σxᵢ); shipped as exact (num, den) BIGINT pair — the
    * cleared-denominator BIGINT-statistics recipe (values fit with ~5
    * decimal orders of headroom at sf0.1: |num| ≲ 5e14, den ≲ 7e17 <
    * 2^63; intermediate sums run at DECIMAL(38,0) before the final
    * narrowing cast). den grows ~quadratically with SF (n_cust·Σcents),
    * so the narrowing is GUARDED: past 2⁶³ the query raises instead of
    * Spark's silent non-ANSI decimal→long NULL (DuckDB's HUGEINT→BIGINT
    * cast already errors loudly — the guard keeps both engines loud).
    * One partitioned window (per segment) over per-customer aggregates,
    * never raw rows. */
  val gini: Q = Q.checked(
    "q_gini",
    """WITH rev AS (
      |  SELECT c_mktsegment AS segment, c_custkey,
      |         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |           AS DECIMAL(18,0)) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT segment, cents,
      |         row_number() OVER (PARTITION BY segment
      |           ORDER BY cents, c_custkey) AS i
      |  FROM rev)
      |SELECT segment,
      |  CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(2 * sum(CAST(i AS HUGEINT) * cents)
      |    - (count(*) + 1) * sum(CAST(cents AS HUGEINT))
      |    AS BIGINT) AS gini_num,
      |  CAST(count(*) * sum(CAST(cents AS HUGEINT))
      |    AS BIGINT) AS gini_den
      |FROM ranked GROUP BY segment ORDER BY segment""".stripMargin
  ) { (s, dir) =>
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
      .agg(cents(sum(col("o_totalprice").cast("decimal(18,2)"))).as("cents"))
    val ranked = rev.withColumn("i",
      row_number().over(Window.partitionBy("segment")
        .orderBy(col("cents"), col("c_custkey"))))
    val big = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    // loud BIGINT envelope: non-ANSI decimal→long overflow is a silent
    // NULL, so guard the narrowing explicitly (conditional branches are
    // lazy — raise_error fires only on actual overflow)
    val guard = (c: org.apache.spark.sql.Column, name: String) =>
      when(abs(c) <= lit(Long.MaxValue).cast("decimal(38,0)"),
        c.cast("long"))
        .otherwise(raise_error(lit(s"$name overflows BIGINT at this " +
          "scale — recast the query to micro-ratio form")).cast("long"))
    ranked.groupBy("segment")
      .agg(count(lit(1)).as("n_cust"),
        (lit(2) * sum(big(col("i")) * big(col("cents"))) -
          (count(lit(1)) + 1) * sum(big(col("cents")))).as("num0"),
        (count(lit(1)) * sum(big(col("cents")))).as("den0"))
      .select(col("segment"), col("n_cust"),
        guard(col("num0"), "gini_num").as("gini_num"),
        guard(col("den0"), "gini_den").as("gini_den"))
      .orderBy("segment")
  }

  /** Semi-additive measure (the account-balance OLAP shape): a
    * customer's "balance" for a month is their LAST order's total that
    * month (latest date, order-key tie-break) — last-per-period is NOT
    * additive across time but IS additive across customers, so the
    * month rollup sums balances over customers. One window partitioned
    * by (customer, month) over orders, then a plain month aggregate. */
  val semiAdditive: Q = Q.checked(
    "q_semi_additive",
    """WITH lasts AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
      |         o_custkey,
      |         o_totalprice,
      |         row_number() OVER (
      |           PARTITION BY o_custkey, date_trunc('month', o_orderdate)
      |           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders)
      |SELECT mon, CAST(count(*) AS BIGINT) AS n_cust,
      |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |    AS DECIMAL(28,0)) AS BIGINT) AS balance_cents
      |FROM lasts WHERE rn = 1
      |GROUP BY mon ORDER BY mon""".stripMargin
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .withColumn("mon", date_trunc("month", col("o_orderdate")))
    val w = Window.partitionBy("o_custkey", "mon")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .groupBy("mon")
      .agg(count(lit(1)).as("n_cust"),
        cents(sum(col("o_totalprice").cast("decimal(18,2)")))
          .as("balance_cents"))
      .orderBy("mon")
  }

  /** Mann-Kendall trend statistic over 1996's daily revenue series:
    * S = Σ_{i<j} sign(x_j − x_i). The pair join runs on the AGGREGATED
    * series (≤366 rows → ≤67k pairs, broadcast), never on raw orders —
    * the bounded-series discipline every O(n²) statistic here follows.
    * Output is the exact integer (n_days, n_pairs, s_stat): S > 0 means
    * rising revenue, and |S| feeds the normal approximation a caller
    * applies off-engine. */
  val mannKendall: Q = Q.checked(
    "q_mann_kendall",
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |           AS DECIMAL(28,0)) AS BIGINT) AS cents
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY 1)
      |SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
      |  CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(sign(b.cents - a.cents)) AS BIGINT) AS s_stat
      |FROM daily a JOIN daily b ON a.d < b.d""".stripMargin
  ) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(cents(sum(col("o_totalprice").cast("decimal(18,2)"))).as("cents"))
    val a = daily.alias("a")
    val b = daily.alias("b")
    // lazy 1-row count frame (no Spark job at registry construction):
    // the pair agg cross-joins a broadcast single-row n_days frame.
    val nDays = daily.agg(count(lit(1)).as("n_days"))
    a.join(b, col("a.d") < col("b.d"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(signum(col("b.cents") - col("a.cents")).cast("long"))
          .as("s_stat"))
      .crossJoin(broadcast(nDays))
      .select(col("n_days"), col("n_pairs"), col("s_stat"))
  }

  /** Top-3 customers per segment WITH TIES: rank() (not row_number)
    * keeps every customer tying at the boundary revenue — the result
    * SET is deterministic even though a row_number cut there would not
    * be. Total order on output (segment, rnk, custkey). */
  val topWithTies: Q = Q.checked(
    "q_top_with_ties",
    """WITH rev AS (
      |  SELECT c_mktsegment AS segment, c_custkey,
      |         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
      |           AS DECIMAL(18,0)) AS BIGINT) AS revenue_cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT segment, c_custkey, revenue_cents,
      |       CAST(rnk AS INT) AS rnk FROM (
      |  SELECT *, rank() OVER (PARTITION BY segment
      |    ORDER BY revenue_cents DESC) AS rnk
      |  FROM rev) t
      |WHERE rnk <= 3
      |ORDER BY segment, rnk, c_custkey""".stripMargin
  ) { (s, dir) =>
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
      .agg(cents(sum(col("o_totalprice").cast("decimal(18,2)")))
        .as("revenue_cents"))
    rev.withColumn("rnk", rank().over(Window.partitionBy("segment")
        .orderBy(col("revenue_cents").desc)))
      .filter(col("rnk") <= 3)
      .orderBy(col("segment"), col("rnk"), col("c_custkey"))
  }

  /** Prefix-duplicate detection over the document corpus — the crawl
    * artifact exact-dedup misses: truncated re-crawls and boilerplate
    * mirrors share an identical leading prefix while differing in the
    * tail. Group by the 160-char prefix (hash-partitioned groupBy, one
    * shuffle on the prefix — never all-pairs), elect the min-id
    * canonical, report per lang: duplicate groups, surplus docs (beyond
    * each canonical) and the surplus chars a cut would reclaim. */
  val dedupPrefix: Q = Q.checked(
    "q_dedup_prefix",
    """WITH g AS (
      |  SELECT lang, substr(text, 1, 160) AS pfx,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(min(doc_id) AS BIGINT) AS canonical,
      |         CAST(sum(n_chars) AS BIGINT) AS chars,
      |         CAST(max(n_chars) AS BIGINT) AS max_chars
      |  FROM documents GROUP BY 1, 2)
      |SELECT lang,
      |  CAST(count(*) FILTER (WHERE n > 1) AS BIGINT) AS dup_groups,
      |  CAST(coalesce(sum(n - 1) FILTER (WHERE n > 1), 0) AS BIGINT)
      |    AS surplus_docs,
      |  CAST(coalesce(sum(chars - max_chars) FILTER (WHERE n > 1), 0)
      |    AS BIGINT) AS surplus_chars
      |FROM g GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    val g = Tables.documents(s, dir)
      .groupBy(col("lang"), substring(col("text"), 1, 160).as("pfx"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("canonical"),
        sum(col("n_chars")).as("chars"), max(col("n_chars")).as("max_chars"))
    g.groupBy("lang")
      .agg(count_if(col("n") > 1).as("dup_groups"),
        coalesce(sum(when(col("n") > 1, col("n") - 1)), lit(0L))
          .as("surplus_docs"),
        coalesce(sum(when(col("n") > 1, col("chars") - col("max_chars"))),
          lit(0L)).as("surplus_chars"))
      .orderBy("lang")
  }

  val all: Seq[Q] =
    Seq(gini, semiAdditive, mannKendall, topWithTies, dedupPrefix)
}
