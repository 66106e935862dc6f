package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation surface (SURVEY.md §2.2-D).
  *
  * Determinism contract with the DuckDB oracle (SURVEY.md §7.4/§7.5):
  * money sums are computed over `DECIMAL(18,2)`-cast inputs — exact,
  * association-order-independent — then cast to DOUBLE for a
  * schema-stable output. Averages divide the exact decimal sum (as
  * double) by the count, which is bit-identical across engines. No
  * floating aggregation whose result depends on partition order ever
  * reaches a checked output unrounded.
  */
object AggOps {
  private val D = DecimalType(18, 2)

  /** Flagship: TPC-H Q1 shape over lineitem [SURVEY §2.2 q_agg_group]. */
  val aggGroup: Q = Q.checked(
    "q_agg_group",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(D)).cast(DoubleType).as("sum_qty"),
        sum(col("l_extendedprice").cast(D)).cast(DoubleType).as("sum_base_price"),
        sum(col("l_extendedprice").cast(D) * (lit(1) - col("l_discount").cast(D)))
          .cast(DoubleType).as("sum_disc_price"),
        (sum(col("l_quantity").cast(D)).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(col("l_extendedprice").cast(D)).cast(DoubleType) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val all: Seq[Q] = Seq(aggGroup)
}
