package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Z-order (Morton) curve encoding — the multi-dimensional data-layout
  * primitive. Sorting a 100 TB table by `zorder2(dim_a, dim_b, bits)`
  * before writing clusters BOTH dimensions into every file: a predicate
  * on either column then prunes to O(√files) via min/max footer stats,
  * where a lexicographic (a, b) sort serves only `a`. This is the layout
  * trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed as a plain
  * codegen'd Catalyst expression so it composes with any write path
  * (e.g. [[graft.sources.Maintenance]] compaction's repartition/sort).
  *
  * Interleaves the low `bits` bits of two non-negative integers
  * (x even positions, y odd): z = Σᵢ ((x≫i)&1)·4ⁱ + ((y≫i)&1)·2·4ⁱ.
  * Out-of-range input (negative, or ≥ 2^bits) throws — a silently
  * masked coordinate would place rows in the wrong cluster and quietly
  * break pruning, the same silent-corruption policy VectorExprs applies
  * to length mismatches.
  */
object ZOrderExprs {

  def badRange(fn: String, v: Long, bits: Int): Nothing =
    throw new IllegalArgumentException(
      s"$fn: input $v out of range [0, 2^$bits) — widen bits or pre-mod " +
        "the column; masking silently would corrupt the clustering")

  /** z-interleave of two integral columns' low `bits` bits (1..31). */
  case class ZOrder2(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    require(bits >= 1 && bits <= 31, s"zorder2: bits must be 1..31, got $bits")
    override def dataType: DataType = LongType
    override def prettyName: String = "zorder2"
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(left, right).forall(e =>
        e.dataType == LongType || e.dataType == IntegerType ||
          e.dataType == ShortType || e.dataType == ByteType)
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"zorder2 expects integral inputs, got ${left.dataType.catalogString}" +
          s", ${right.dataType.catalogString}")
    }
    private def asLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
    }
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val x = asLong(l)
      val y = asLong(r)
      val lim = 1L << bits
      if (x < 0 || x >= lim) badRange(prettyName, x, bits)
      if (y < 0 || y >= lim) badRange(prettyName, y, bits)
      var z = 0L
      var i = 0
      while (i < bits) {
        z |= ((x >>> i) & 1L) << (2 * i)
        z |= ((y >>> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (l, r) => {
        val (x, y, i) = (ctx.freshName("x"), ctx.freshName("y"), ctx.freshName("i"))
        s"""
           |long $x = (long) $l;
           |long $y = (long) $r;
           |if ($x < 0 || $x >= (1L << $bits))
           |  graft.functions.ZOrderExprs.badRange("zorder2", $x, $bits);
           |if ($y < 0 || $y >= (1L << $bits))
           |  graft.functions.ZOrderExprs.badRange("zorder2", $y, $bits);
           |${ev.value} = 0L;
           |for (int $i = 0; $i < $bits; $i++) {
           |  ${ev.value} |= (($x >>> $i) & 1L) << (2 * $i);
           |  ${ev.value} |= (($y >>> $i) & 1L) << (2 * $i + 1);
           |}
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ZOrder2 = copy(left = l, right = r)
  }

  def zOrder2(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(
      ZOrder2(ColumnBridge.expression(x), ColumnBridge.expression(y), bits))

  /** Reference deinterleave (tests + driver-side sanity): extract
    * dimension `dim` (0 = x, 1 = y) back out of a z-value. */
  def unpack(z: Long, bits: Int, dim: Int): Long = {
    var v = 0L
    var i = 0
    while (i < bits) { v |= ((z >>> (2 * i + dim)) & 1L) << i; i += 1 }
    v
  }

  /** N-ary z-interleave (2..8 dims): bit i of dimension d lands at
    * z-bit `i·ndims + d` — the straight generalization of [[ZOrder2]]
    * (whose layout this reproduces bit-identically at ndims=2). A 100 TB
    * fact table clustered on (day, customer, region) wants all THREE
    * dims prunable; the 2-D special case can't express that, and
    * lexicographic sort serves only the leading column. `bits · ndims`
    * must fit a positive long (≤ 63). Same loud out-of-range policy —
    * and a NULL coordinate is an error too (a silently-defaulted null
    * would cluster the row arbitrarily and quietly break pruning).
    *
    * Takes its coordinates as ONE array child (the [[HashExprs]]
    * unary-over-array recipe), so the [[zOrderN]] builder wraps the
    * columns in `array(...)` and the whole thing stays inside
    * whole-stage codegen via nullSafeCodeGen. */
  case class ZOrderN(child: Expression, ndims: Int, bits: Int)
      extends UnaryExpression {
    require(ndims >= 2 && ndims <= 8, s"zordern: 2..8 dims, got $ndims")
    require(bits >= 1 && bits * ndims <= 63,
      s"zordern: bits*dims must be 1..63, got ${bits * ndims}")
    override def dataType: DataType = LongType
    override def prettyName: String = "zordern"
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"zordern expects array<bigint>, got ${other.catalogString}")
      }
    override protected def nullSafeEval(arr: Any): Any = {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (a.numElements() != ndims)
        throw new IllegalArgumentException(
          s"zordern: expected $ndims coordinates, got ${a.numElements()}")
      var z = 0L
      var d = 0
      while (d < ndims) {
        if (a.isNullAt(d))
          throw new IllegalArgumentException(
            s"zordern: NULL coordinate at dim $d — coalesce the " +
              "clustering key first; a defaulted null would corrupt pruning")
        val x = a.getLong(d)
        if (x < 0 || x >= (1L << bits)) badRange(prettyName, x, bits)
        var i = 0
        while (i < bits) {
          z |= ((x >>> i) & 1L) << (i * ndims + d)
          i += 1
        }
        d += 1
      }
      z
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val (x, i, d) =
          (ctx.freshName("x"), ctx.freshName("i"), ctx.freshName("d"))
        s"""
           |if ($c.numElements() != $ndims)
           |  throw new IllegalArgumentException(
           |    "zordern: expected $ndims coordinates, got " + $c.numElements());
           |${ev.value} = 0L;
           |for (int $d = 0; $d < $ndims; $d++) {
           |  if ($c.isNullAt($d))
           |    throw new IllegalArgumentException(
           |      "zordern: NULL coordinate at dim " + $d);
           |  long $x = $c.getLong($d);
           |  if ($x < 0 || $x >= (1L << $bits))
           |    graft.functions.ZOrderExprs.badRange("zordern", $x, $bits);
           |  for (int $i = 0; $i < $bits; $i++) {
           |    ${ev.value} |= (($x >>> $i) & 1L) << ($i * $ndims + $d);
           |  }
           |}
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): ZOrderN =
      copy(child = c)
  }

  def zOrderN(cols: Seq[Column], bits: Int): Column = {
    import org.apache.spark.sql.functions.{array => mkArray}
    ColumnBridge.column(ZOrderN(
      ColumnBridge.expression(
        mkArray(cols.map(_.cast(LongType)): _*)),
      cols.size, bits))
  }

  /** Reference deinterleave for [[ZOrderN]]. */
  def unpackN(z: Long, bits: Int, ndims: Int, dim: Int): Long = {
    var v = 0L
    var i = 0
    while (i < bits) { v |= ((z >>> (i * ndims + dim)) & 1L) << i; i += 1 }
    v
  }
}
