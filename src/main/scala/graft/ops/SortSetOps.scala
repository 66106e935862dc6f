package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Sort / limit / top-k and set operations (SURVEY.md §2.2-F/G).
  *
  * Every orderBy+limit plans as `TakeOrderedAndProject` — per-partition
  * top-k then a driver-side merge of k·partitions rows, never a global
  * sort. That is the 100 TB-safe pattern for bounded outputs.
  */
object SortSetOps {

  /** Global top-10 orders by (totalprice DESC, orderkey ASC) — total order. */
  val topk: Q = Q.checked(
    "q_topk",
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** Multi-column sort with explicit null ordering; limit keeps the plan a
    * TakeOrderedAndProject (per-partition top-k + driver merge, no global
    * sort). The trailing o_orderkey makes the order total. */
  val sortMulti: Q = Q.checked(
    "q_sort_multi",
    """SELECT o_orderpriority, o_orderstatus, o_totalprice, o_orderkey
      |FROM orders
      |ORDER BY o_orderpriority DESC NULLS LAST, o_totalprice ASC NULLS FIRST,
      |  o_orderkey
      |LIMIT 50""".stripMargin
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .select("o_orderpriority", "o_orderstatus", "o_totalprice", "o_orderkey")
      .orderBy(col("o_orderpriority").desc_nulls_last,
        col("o_totalprice").asc_nulls_first, col("o_orderkey"))
      .limit(50)
  }

  val all: Seq[Q] = Seq(topk, sortMulti)
}
