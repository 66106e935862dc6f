package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.2-D impl row): an exact centroid
  * aggregator over embedding vectors — Kahan-free double sums in a
  * mutable buffer, mergeable across partitions (the Aggregator contract
  * gives map-side partial aggregation for free, same as built-in aggs).
  *
  * Register per-session via `functions.udaf(CentroidAgg)`; the
  * oracle-checked exact twin is q_sim_centroid (posexplode + decimal
  * means), which FunctionsSpec compares against within float tolerance.
  */
final case class CentroidBuffer(var n: Long, var sums: Array[Double])

object CentroidAgg extends Aggregator[Array[Float], CentroidBuffer, Array[Double]] {

  override def zero: CentroidBuffer = CentroidBuffer(0L, Array.emptyDoubleArray)

  override def reduce(b: CentroidBuffer, v: Array[Float]): CentroidBuffer = {
    if (b.sums.isEmpty) b.sums = new Array[Double](v.length)
    require(b.sums.length == v.length, "ragged embedding dimensions")
    var i = 0
    while (i < v.length) { b.sums(i) += v(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(a: CentroidBuffer, b: CentroidBuffer): CentroidBuffer = {
    if (a.sums.isEmpty) b
    else if (b.sums.isEmpty) a
    else {
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      a.n += b.n
      a
    }
  }

  override def finish(b: CentroidBuffer): Array[Double] =
    if (b.n == 0) Array.emptyDoubleArray else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[CentroidBuffer] = Encoders.product
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
