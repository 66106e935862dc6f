package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native set operations over SORTED `array<bigint>` signature columns
  * (the [[graft.ops.SimJoinOps]] verification kernel).
  *
  * Why not `size(array_intersect(a, b))`: ArrayIntersect builds a hash
  * set AND materializes the intersection array per row, only for `size`
  * to throw it away — measured ~1.1 s over 69 k candidate pairs at
  * sf0.1. A two-pointer merge over already-sorted inputs is O(n+m) with
  * zero allocation and stays inside whole-stage codegen. Same preference
  * tier as [[VectorExprs]]: a custom expression only where the built-in
  * is structurally wasteful on the hot path.
  *
  * Inputs MUST be sorted ascending (produced via `sort_array`); a null
  * ARRAY yields null, but a null ELEMENT throws — signatures are
  * non-null by construction, and silently reading a null slot as 0
  * (what a bare getLong would do) would count phantom matches for a
  * SQL caller handing in a malformed array.
  */
object SetExprs {

  /** Public for janino static-forwarder reach (the VectorExprs.badLength
    * rule). */
  def nullElement(name: String): Nothing =
    throw new IllegalArgumentException(
      s"$name: null array element — signature arrays must be non-null")

  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_count"
    override def checkInputDataTypes(): TypeCheckResult = {
      val bad = Seq(left, right).find(c =>
        !c.dataType.isInstanceOf[ArrayType] ||
          c.dataType.asInstanceOf[ArrayType].elementType != LongType)
      bad match {
        case Some(c) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<bigint>, got ${c.dataType.catalogString}")
        case None => TypeCheckResult.TypeCheckSuccess
      }
    }
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val (na, nb) = (a.numElements(), b.numElements())
      var (i, j) = (0, 0)
      var n = 0L
      while (i < na && j < nb) {
        if (a.isNullAt(i) || b.isNullAt(j))
          SetExprs.nullElement(prettyName)
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { n += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      n
    }
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |int $i = 0; int $j = 0;
           |${ev.value} = 0L;
           |while ($i < $a.numElements() && $j < $b.numElements()) {
           |  if ($a.isNullAt($i) || $b.isNullAt($j))
           |    graft.functions.SetExprs.nullElement("sorted_intersect_count");
           |  long $x = $a.getLong($i); long $y = $b.getLong($j);
           |  if ($x == $y) { ${ev.value}++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
           |}
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): SortedIntersectCount = copy(left = l, right = r)
  }

  /** `sorted_intersect_count(a, b)` — |a ∩ b| of two sorted bigint
    * arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
