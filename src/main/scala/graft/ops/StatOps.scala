package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution-profiling operators: fixed-width histograms, z-score
  * outlier detection, and per-group mode — the data-quality triage a
  * pipeline runs before trusting a 100 TB table. (North-star additions;
  * no reference file:line — upstream has no profiling stage, SURVEY §0.)
  *
  * Scale design: the histogram is ONE hash aggregation whose key space is
  * the bucket count (constant — partial aggregation collapses each map
  * task to ≤20 rows before the shuffle). Outlier detection is the
  * two-pass pattern: a tiny per-group moment frame (count/sum/sum²) is
  * computed in one shuffle, broadcast back, and the second pass is a
  * map-only probe — no window over the raw table, no sort. Mode is one
  * hash aggregation at (group, value) grain plus a window over the
  * already-aggregated counts.
  *
  * Determinism (SURVEY §7.5): moments are exact DECIMAL sums (2-dp money
  * in DECIMAL(18,2), squares in the widened product type), converted to
  * double once; mean/variance/σ are then a fixed tree of correctly-rounded
  * IEEE ops — bit-identical cross-engine, so the `> 2σ` cut never
  * disagrees at the boundary. Bucket ids use floor (never ties).
  */
object StatOps {

  /** 20 equal-width price buckets (width 5000, top bucket open-ended):
    * per-bucket count, min/max, and exact-decimal sum. */
  val histogram: Q = Q.checked(
    "q_histogram",
    """SELECT CAST(least(floor(l_extendedprice / 5.0e3), 19) AS BIGINT)
      |    AS bucket,
      |  count(*) AS n,
      |  CAST(min(l_extendedprice) AS DOUBLE) AS lo,
      |  CAST(max(l_extendedprice) AS DOUBLE) AS hi,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(least(floor(col("l_extendedprice") / lit(5.0e3)), lit(19L))
        .cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_price"))
      .orderBy("bucket")
  }

  /** Per-segment 2σ account-balance outliers. Moments (n, Σx, Σx²) are
    * exact decimals from ONE pass; the per-segment mean/σ frame (5 rows)
    * broadcasts back onto customer for a map-only flag pass. min/max of
    * an empty outlier set is NULL on both engines. */
  val outliers: Q = Q.checked(
    "q_outliers",
    """WITH st AS (
      |  SELECT c_mktsegment, count(*) AS n,
      |    sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
      |    sum(CAST(c_acctbal AS DECIMAL(18,2))
      |        * CAST(c_acctbal AS DECIMAL(18,2))) AS s2
      |  FROM customer GROUP BY 1),
      |m AS (
      |  SELECT c_mktsegment, n,
      |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)
      |           * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
      |         / CAST(n - 1 AS DOUBLE)) AS sd
      |  FROM st)
      |SELECT m.c_mktsegment, CAST(min(n) AS BIGINT) AS n_customers,
      |  CAST(count_if(abs(CAST(c_acctbal AS DOUBLE) - mean) > 2.0e0 * sd)
      |    AS BIGINT) AS n_outliers,
      |  CAST(min(CASE WHEN abs(CAST(c_acctbal AS DOUBLE) - mean) > 2.0e0 * sd
      |               THEN c_acctbal END) AS DOUBLE) AS min_outlier,
      |  CAST(max(CASE WHEN abs(CAST(c_acctbal AS DOUBLE) - mean) > 2.0e0 * sd
      |               THEN c_acctbal END) AS DOUBLE) AS max_outlier
      |FROM customer c JOIN m USING (c_mktsegment)
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val d = col("c_acctbal").cast(DecimalType(18, 2))
    val st = cust.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum(d).as("s"), sum(d * d).as("s2"))
    val mean = col("s").cast(DoubleType) / col("n").cast(DoubleType)
    val m = st.select(col("c_mktsegment"), col("n"), mean.as("mean"),
      sqrt((col("s2").cast(DoubleType) -
        col("s").cast(DoubleType) * mean) /
        (col("n") - 1).cast(DoubleType)).as("sd"))
    val isOut = abs(col("c_acctbal").cast(DoubleType) - col("mean")) >
      lit(2.0) * col("sd")
    cust.join(broadcast(m), "c_mktsegment")
      .groupBy("c_mktsegment")
      .agg(min(col("n")).as("n_customers"),
        count(when(isOut, 1)).as("n_outliers"),
        min(when(isOut, col("c_acctbal"))).as("min_outlier"),
        max(when(isOut, col("c_acctbal"))).as("max_outlier"))
      .orderBy("c_mktsegment")
  }

  /** Most frequent order priority per status (grouped mode), lexicographic
    * tiebreak. The window runs over the 15-row aggregated frame, never the
    * raw table. */
  val groupedMode: Q = Q.checked(
    "q_grouped_mode",
    """WITH c AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |           FROM orders GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
      |        ORDER BY n DESC, o_orderpriority) AS rk FROM c)
      |SELECT o_orderstatus, o_orderpriority AS mode_priority, n
      |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin
  ) { (s, dir) =>
    val c = Tables.orders(s, dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("n").desc, col("o_orderpriority"))
    c.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("n"))
      .orderBy("o_orderstatus")
  }

  /** 2-D skyline (Pareto frontier): parts where no other part is cheaper
    * (≤) AND larger (≥) with one strict — minimize p_retailprice,
    * maximize p_size. O(n²) dominance collapses to one prefix-max pass:
    * group to one max-size row per distinct price (first shuffle, key
    * space = distinct prices ≪ rows), running max over the price-ordered
    * aggregate (a window over the SMALL frame, never the raw table),
    * then a survivor is a part at its price group's max size that beats
    * every strictly-cheaper group's max. Equal (price, size) twins both
    * survive — neither strictly dominates. All comparisons are on raw
    * column values, no derived floats. */
  val skyline: Q = Q.checked(
    "q_skyline",
    """WITH per_price AS (
      |  SELECT p_retailprice AS price, max(p_size) AS gmax
      |  FROM part GROUP BY 1),
      |pfx AS (
      |  SELECT price, gmax,
      |    max(gmax) OVER (ORDER BY price
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM per_price)
      |SELECT p.p_partkey, p.p_name, p.p_retailprice, p.p_size
      |FROM part p JOIN pfx ON p.p_retailprice = pfx.price
      |WHERE p.p_size = pfx.gmax AND (pfx.pmax IS NULL OR p.p_size > pfx.pmax)
      |ORDER BY p.p_retailprice, p.p_partkey""".stripMargin
  ) { (s, dir) =>
    val part = Tables.part(s, dir)
    val perPrice = part.groupBy(col("p_retailprice").as("price"))
      .agg(max(col("p_size")).as("gmax"))
    val w = Window.orderBy("price")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pfx = perPrice.withColumn("pmax", max(col("gmax")).over(w))
    part.join(pfx, part("p_retailprice") === pfx("price"))
      .filter(col("p_size") === col("gmax") &&
        (col("pmax").isNull || col("p_size") > col("pmax")))
      .select("p_partkey", "p_name", "p_retailprice", "p_size")
      .orderBy("p_retailprice", "p_partkey")
  }

  val all: Seq[Q] = Seq(histogram, outliers, groupedMode, skyline)
}
