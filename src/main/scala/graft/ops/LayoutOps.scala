package graft.ops

import graft.{Q, Tables}
import graft.functions.ZOrderExprs
import org.apache.spark.sql.functions._

/** Data-layout operators: Z-order (Morton) clustering statistics — the
  * query a table-maintenance job runs to decide (and prove) a multi-column
  * clustered rewrite. (North-star addition; upstream has no layout stage —
  * no reference file:line, SURVEY §0.)
  *
  * q_zorder buckets rows by the top bits of their z-value, exactly the
  * file boundaries a z-ordered write would produce, and reports each
  * bucket's bounding box in BOTH source dimensions. The payoff it
  * demonstrates: every z-cell is a tight 64×64 box (asserted in
  * ZOrderSpec), so parquet min/max footer stats prune on EITHER column —
  * a lexicographic sort gives the same guarantee only for the leading
  * column. At 100 TB this is the difference between touching O(√files)
  * and a full scan for the second dimension.
  */
object LayoutOps {

  private val Bits = 8
  /** z // 4096: 16 cells of the 65536-point (8+8-bit) z-space — each a
    * contiguous z-range AND a 64×64 axis-aligned box. */
  private val CellShift = 12

  private def zTermsSql(x: String, y: String): String =
    (0 until Bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")

  val zorder: Q = Q.checked(
    "q_zorder",
    s"""WITH b AS (SELECT l_partkey % 256 AS px, l_suppkey % 256 AS ps
       |           FROM lineitem),
       |z AS (SELECT px, ps, ${zTermsSql("px", "ps")} AS zval FROM b)
       |SELECT CAST(zval >> $CellShift AS BIGINT) AS cell, count(*) AS n,
       |  CAST(min(zval) AS BIGINT) AS z_lo, CAST(max(zval) AS BIGINT) AS z_hi,
       |  CAST(min(px) AS BIGINT) AS px_lo, CAST(max(px) AS BIGINT) AS px_hi,
       |  CAST(min(ps) AS BIGINT) AS ps_lo, CAST(max(ps) AS BIGINT) AS ps_hi
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select((col("l_partkey") % 256).as("px"),
        (col("l_suppkey") % 256).as("ps"))
      .withColumn("zval", ZOrderExprs.zOrder2(col("px"), col("ps"), Bits))
      .groupBy(shiftright(col("zval"), CellShift).as("cell"))
      .agg(count(lit(1)).as("n"),
        min("zval").as("z_lo"), max("zval").as("z_hi"),
        min("px").as("px_lo"), max("px").as("px_hi"),
        min("ps").as("ps_lo"), max("ps").as("ps_hi"))
      .orderBy("cell")
  }

  private def zTerms3Sql(a: String, b: String, c: String): String =
    (0 until 6).flatMap(i => Seq(
      s"((($a >> $i) & 1) << ${3 * i})",
      s"((($b >> $i) & 1) << ${3 * i + 1})",
      s"((($c >> $i) & 1) << ${3 * i + 2})")).mkString(" + ")

  /** Three-dimensional z-cells (the [[graft.functions.ZOrderExprs.ZOrderN]]
    * interleave, oracle-checked bit for bit): 64 cells of the 18-bit
    * (6+6+6) z-space, each a contiguous z-range AND a tight 16×16×16
    * box — so a table clustered on THREE columns prunes on any of them.
    * The oracle recomputes the interleave with explicit shift/mask
    * arithmetic, so the native expression's bit layout is pinned
    * cross-engine, not just against the Scala model in ZOrderSpec. */
  val zorder3: Q = Q.checked(
    "q_zorder3",
    s"""WITH b AS (SELECT l_partkey % 64 AS pa, l_suppkey % 64 AS pb,
       |                  l_orderkey % 64 AS pc
       |           FROM lineitem),
       |z AS (SELECT pa, pb, pc, ${zTerms3Sql("pa", "pb", "pc")} AS zval
       |      FROM b)
       |SELECT CAST(zval >> 12 AS BIGINT) AS cell, count(*) AS n,
       |  CAST(min(zval) AS BIGINT) AS z_lo, CAST(max(zval) AS BIGINT) AS z_hi,
       |  CAST(min(pa) AS BIGINT) AS pa_lo, CAST(max(pa) AS BIGINT) AS pa_hi,
       |  CAST(min(pb) AS BIGINT) AS pb_lo, CAST(max(pb) AS BIGINT) AS pb_hi,
       |  CAST(min(pc) AS BIGINT) AS pc_lo, CAST(max(pc) AS BIGINT) AS pc_hi
       |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .select((col("l_partkey") % 64).as("pa"),
        (col("l_suppkey") % 64).as("pb"),
        (col("l_orderkey") % 64).as("pc"))
      .withColumn("zval", ZOrderExprs.zOrderN(
        Seq(col("pa"), col("pb"), col("pc")), 6))
      .groupBy(shiftright(col("zval"), 12).as("cell"))
      .agg(count(lit(1)).as("n"),
        min("zval").as("z_lo"), max("zval").as("z_hi"),
        min("pa").as("pa_lo"), max("pa").as("pa_hi"),
        min("pb").as("pb_lo"), max("pb").as("pb_hi"),
        min("pc").as("pc_lo"), max("pc").as("pc_hi"))
      .orderBy("cell")
  }

  val all: Seq[Q] = Seq(zorder, zorder3)
}
