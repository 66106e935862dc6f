package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reshaping operators: unpivot (wide→long melt) and time-series
  * gap-filling with last-observation-carried-forward — the two
  * "make the table the shape the next stage wants" ops every
  * warehouse-to-feature pipeline runs.
  *
  * Scale design: unpivot is a map-only generate (k output rows per input
  * row, no shuffle until the downstream agg); gap-fill never materializes
  * a calendar join against the raw table — it aggregates to (key, day)
  * FIRST (one shuffle at day grain), then joins the generated calendar
  * against that already-tiny frame, so calendar work is O(keys × days)
  * regardless of raw row count.
  */
object ReshapeOps {

  /** Melt lineitem's four measures into (metric, val) rows via the
    * native `Dataset.unpivot` (Spark's Expand operator — one generate, no
    * shuffle), then profile each metric. Sums decimal-cast on both
    * engines (SURVEY §7.5): double→DECIMAL(24,6) rounds identically in
    * Spark and DuckDB, and the exact decimal sum casts back to one
    * deterministic double. */
  val unpivot: Q = Q.checked(
    "q_unpivot",
    """WITH u AS (
      |  SELECT 'quantity' AS metric, l_quantity AS val FROM lineitem
      |  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT 'discount', l_discount FROM lineitem
      |  UNION ALL SELECT 'tax', l_tax FROM lineitem)
      |SELECT metric, count(*) AS n,
      |  CAST(sum(CAST(val AS DECIMAL(24,6))) AS DOUBLE) AS sum_val,
      |  CAST(min(val) AS DOUBLE) AS min_val,
      |  CAST(max(val) AS DOUBLE) AS max_val
      |FROM u GROUP BY metric ORDER BY metric""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select(col("l_quantity").as("quantity"),
        col("l_extendedprice").as("extendedprice"),
        col("l_discount").as("discount"), col("l_tax").as("tax"))
      .unpivot(Array.empty[Column],
        Array(col("quantity"), col("extendedprice"), col("discount"),
          col("tax")),
        "metric", "val")
      .groupBy("metric")
      .agg(count(lit(1)).as("n"),
        sum(col("val").cast(DecimalType(24, 6))).cast(DoubleType)
          .as("sum_val"),
        min(col("val")).cast(DoubleType).as("min_val"),
        max(col("val")).cast(DoubleType).as("max_val"))
      .orderBy("metric")
  }

  /** Daily order counts per priority over a COMPLETE calendar (generated
    * min..max day, zero-filled), with the day's average price carried
    * forward across order-less days (LOCF). The carry uses the
    * gaps-and-islands trick — `grp` = running count of non-null
    * observations, then max over (key, grp) — which both engines express
    * in pure windows, unlike IGNORE NULLS frames. avg_price is an exact
    * decimal sum divided once per (key, day) — one IEEE division, stable
    * across partitioning. */
  val gapfill: Q = Q.checked(
    "q_gapfill",
    """WITH o AS (SELECT o_orderpriority AS p, CAST(o_orderdate AS DATE) AS d,
      |    count(*) AS n,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(24,6))) AS DOUBLE)
      |      / count(*) AS avg_price
      |  FROM orders GROUP BY 1, 2),
      |b AS (SELECT min(d) AS lo, max(d) AS hi FROM o),
      |cal AS (SELECT p, CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
      |      CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
      |    FROM (SELECT DISTINCT p FROM o), b),
      |j AS (SELECT cal.p, cal.d, CAST(coalesce(o.n, 0) AS BIGINT) AS n,
      |    o.avg_price,
      |    count(o.avg_price) OVER (PARTITION BY cal.p ORDER BY cal.d) AS grp
      |  FROM cal LEFT JOIN o ON o.p = cal.p AND o.d = cal.d)
      |SELECT p, d, n,
      |  max(avg_price) OVER (PARTITION BY p, grp) AS locf_avg_price
      |FROM j ORDER BY p, d""".stripMargin
  ) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("p"),
        to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"),
        (sum(col("o_totalprice").cast(DecimalType(24, 6))).cast(DoubleType)
          / count(lit(1))).as("avg_price"))
    val bounds = daily.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
    val cal = daily.select("p").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("p"),
        explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
    val runW = Window.partitionBy("p").orderBy("d")
    cal.join(daily, Seq("p", "d"), "left")
      .select(col("p"), col("d"), coalesce(col("n"), lit(0L)).as("n"),
        col("avg_price"))
      .withColumn("grp", count(col("avg_price")).over(runW))
      .withColumn("locf_avg_price",
        max(col("avg_price")).over(Window.partitionBy("p", "grp")))
      .select("p", "d", "n", "locf_avg_price")
      .orderBy("p", "d")
  }

  val all: Seq[Q] = Seq(unpivot, gapfill)
}
