package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-shuffle per-group top-k (SURVEY §2.2-E/§4 scale note): a typed
  * `Aggregator` whose buffer never exceeds k (sort value, payload) pairs,
  * so map-side partial aggregation caps what the shuffle carries at
  * k rows per group PER MAP PARTITION — versus the window-function plan
  * (`row_number over (partition by g order by v) <= k`), which shuffles
  * and sorts EVERY row of every group before discarding all but k.
  * At 100 TB with k=3 that is the difference between a full-table
  * shuffle+sort and a few kilobytes per group.
  *
  * Semantics: largest k by value descending, ties broken by SMALLER
  * payload first — identical total order to the window twin's
  * `ORDER BY v DESC, payload ASC`. The merge is a k-bounded
  * merge of sorted buffers: associative, commutative, and idempotent-safe
  * under Spark's partial-aggregation contract.
  *
  * Because that total order is deterministic, q_topk_group_agg is
  * oracle-checked directly (the window-twin SQL is its oracle) — the one
  * sanctioned non-built-in aggregate in an oracle path, exempted by name
  * in PlanSpec's UDF scan. FunctionsSpec additionally asserts row parity
  * with the in-engine window plan q_topk_per_group.
  */
final case class TopKBuf(var items: List[(Double, Long)])

final class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {
  require(k > 0)

  override def zero: TopKBuf = TopKBuf(Nil)

  /** Insert keeping `items` sorted descending, truncated at k. */
  override def reduce(b: TopKBuf, v: (Double, Long)): TopKBuf = {
    b.items = insert(b.items, v, k)
    b
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    a.items = mergeSorted(a.items, b.items, k)
    a
  }

  override def finish(b: TopKBuf): Seq[(Double, Long)] = b.items

  private def gt(x: (Double, Long), y: (Double, Long)): Boolean =
    x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)

  private def insert(l: List[(Double, Long)], v: (Double, Long),
                     room: Int): List[(Double, Long)] =
    if (room == 0) Nil
    else l match {
      case h :: t if gt(h, v) => h :: insert(t, v, room - 1)
      case _ => v :: l.take(room - 1)
    }

  private def mergeSorted(a: List[(Double, Long)], b: List[(Double, Long)],
                          room: Int): List[(Double, Long)] =
    if (room == 0) Nil
    else (a, b) match {
      case (Nil, _) => b.take(room)
      case (_, Nil) => a.take(room)
      case (ha :: ta, hb :: _) if gt(ha, hb) =>
        ha :: mergeSorted(ta, b, room - 1)
      case (_, hb :: tb) => hb :: mergeSorted(a, tb, room - 1)
    }

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
