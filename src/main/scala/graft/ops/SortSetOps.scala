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

  val all: Seq[Q] = Seq(topk)
}
