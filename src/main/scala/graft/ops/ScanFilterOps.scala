package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scans, projection, filtering, CASE WHEN (SURVEY.md §2.2-A/B).
  *
  * At scale these queries are the pushdown/pruning canaries: the physical
  * plan must show `PushedFilters` and a `ReadSchema` limited to the
  * selected columns (asserted in PlanSpec).
  */
object ScanFilterOps {

  /** Parquet scan + 4-column projection (column pruning canary). */
  val scanProject: Q = Q.checked(
    "q_scan_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin
  ) { (s, dir) =>
    // ORDER BY spans every output column: (l_orderkey, l_linenumber) is NOT
    // unique in the driver testdata (45,832 distinct of 60,000 at sf0.01),
    // so a shorter order would leave tie order engine-dependent and flake
    // the hash compare (SURVEY §7.5 rule 1).
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
  }

  /** Compound predicate: AND/OR, BETWEEN, IN, NOT, IS NOT NULL, equality. */
  val filter: Q = Q.checked(
    "q_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
      |FROM lineitem
      |WHERE l_returnflag IN ('A','R')
      |  AND l_quantity BETWEEN 10 AND 20
      |  AND NOT (l_discount < 0.02)
      |  AND (l_linestatus = 'F' OR l_quantity > 15)
      |  AND l_shipdate IS NOT NULL
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag").isin("A", "R")
        && col("l_quantity").between(10, 20)
        && !(col("l_discount") < 0.02)
        && (col("l_linestatus") === "F" || col("l_quantity") > 15)
        && col("l_shipdate").isNotNull)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag")
  }

  /** CASE WHEN classifier (scalar form of the CDC R6 pattern). */
  val caseWhen: Q = Q.checked(
    "q_case_when",
    """SELECT
      |  CASE WHEN o_totalprice < 50000 THEN 'low'
      |       WHEN o_totalprice < 150000 THEN 'mid'
      |       ELSE 'high' END AS band,
      |  CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'closed' END AS state,
      |  count(*) AS n, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      |FROM orders GROUP BY 1, 2 ORDER BY band, state""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .withColumn("band",
        when(col("o_totalprice") < 50000, "low")
          .when(col("o_totalprice") < 150000, "mid")
          .otherwise("high"))
      .withColumn("state",
        when(col("o_orderstatus") === "O", "open").otherwise("closed"))
      .groupBy("band", "state")
      .agg(count(lit(1)).as("n"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
      .orderBy("band", "state")
  }

  val all: Seq[Q] = Seq(scanProject, filter, caseWhen)
}
