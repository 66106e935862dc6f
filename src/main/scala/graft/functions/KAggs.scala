package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Siblings of [[TopKAgg]] for the remaining rank-then-filter-K window
  * sites (SURVEY §4): same k-bounded sorted-buffer design — map-side
  * partial aggregation caps the shuffle at k rows per group per map
  * partition, where the window twin (`row_number over (partition by g
  * order by …) <= k`) shuffles and sorts EVERY row of a group into one
  * task. That cliff is worst exactly when the group count is small
  * (lang ≈ dozens, mktsegment = 5): parallelism caps at the group count
  * and one task absorbs a corpus-scale sort. Both aggregators keep the
  * window twin's total order bit-for-bit, so rewritten queries stay
  * hash-identical to their SQL oracles.
  */
object KAggs {

  /** Smallest-k by (String asc, Long asc) — the deterministic-sample
    * order (md5 hex, id). Buffer ≤ k, ascending. */
  final case class BotBuf(var items: List[(String, Long)])

  final class BottomKStrAgg(k: Int)
      extends Aggregator[(String, Long), BotBuf, Seq[(String, Long)]] {
    require(k > 0)
    override def zero: BotBuf = BotBuf(Nil)
    override def reduce(b: BotBuf, v: (String, Long)): BotBuf = {
      b.items = insert(b.items, v, k); b
    }
    override def merge(a: BotBuf, b: BotBuf): BotBuf = {
      a.items = mergeSorted(a.items, b.items, k); a
    }
    override def finish(b: BotBuf): Seq[(String, Long)] = b.items
    private def lt(x: (String, Long), y: (String, Long)): Boolean = {
      val c = x._1.compareTo(y._1)
      c < 0 || (c == 0 && x._2 < y._2)
    }
    private def insert(l: List[(String, Long)], v: (String, Long),
                       room: Int): List[(String, Long)] =
      if (room == 0) Nil
      else l match {
        case h :: t if lt(h, v) => h :: insert(t, v, room - 1)
        case _ => v :: l.take(room - 1)
      }
    private def mergeSorted(a: List[(String, Long)], b: List[(String, Long)],
                            room: Int): List[(String, Long)] =
      if (room == 0) Nil
      else (a, b) match {
        case (Nil, _) => b.take(room)
        case (_, Nil) => a.take(room)
        case (ha :: ta, hb :: _) if lt(ha, hb) =>
          ha :: mergeSorted(ta, b, room - 1)
        case (_, hb :: tb) => hb :: mergeSorted(a, tb, room - 1)
      }
    override def bufferEncoder: Encoder[BotBuf] = Encoders.product
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Largest-k by (Double desc, String asc) — the frequency-rank order
    * (count desc, token asc). Buffer ≤ k, descending. */
  final case class TopDSBuf(var items: List[(Double, String)])

  final class TopKDoubleStrAgg(k: Int)
      extends Aggregator[(Double, String), TopDSBuf, Seq[(Double, String)]] {
    require(k > 0)
    override def zero: TopDSBuf = TopDSBuf(Nil)
    override def reduce(b: TopDSBuf, v: (Double, String)): TopDSBuf = {
      b.items = insert(b.items, v, k); b
    }
    override def merge(a: TopDSBuf, b: TopDSBuf): TopDSBuf = {
      a.items = mergeSorted(a.items, b.items, k); a
    }
    override def finish(b: TopDSBuf): Seq[(Double, String)] = b.items
    private def gt(x: (Double, String), y: (Double, String)): Boolean =
      x._1 > y._1 || (x._1 == y._1 && x._2.compareTo(y._2) < 0)
    private def insert(l: List[(Double, String)], v: (Double, String),
                       room: Int): List[(Double, String)] =
      if (room == 0) Nil
      else l match {
        case h :: t if gt(h, v) => h :: insert(t, v, room - 1)
        case _ => v :: l.take(room - 1)
      }
    private def mergeSorted(a: List[(Double, String)], b: List[(Double, String)],
                            room: Int): List[(Double, String)] =
      if (room == 0) Nil
      else (a, b) match {
        case (Nil, _) => b.take(room)
        case (_, Nil) => a.take(room)
        case (ha :: ta, hb :: _) if gt(ha, hb) =>
          ha :: mergeSorted(ta, b, room - 1)
        case (_, hb :: tb) => hb :: mergeSorted(a, tb, room - 1)
      }
    override def bufferEncoder: Encoder[TopDSBuf] = Encoders.product
    override def outputEncoder: Encoder[Seq[(Double, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, String)]]()
  }
}
