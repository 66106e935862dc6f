package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Transparent MATERIALIZED-VIEW rewrite — the aggregate-navigator /
  * Calcite-style rollup rewrite, as an injected Catalyst optimizer rule:
  * a grouped aggregate over a huge fact SCAN is silently re-planned to
  * read a registered pre-aggregated summary instead, when (and only
  * when) the summary can answer it exactly:
  *
  *  - the query scans the MV's registered source path (single-root
  *    parquet relation). Residual Filters are allowed when DETERMINISTIC
  *    and referencing ONLY the MV's group columns (the summary holds
  *    every distinct group tuple, so the predicate selects exactly the
  *    groups it would over the source — `WHERE region = 'ASIA' GROUP BY
  *    nation` rewrites); any predicate touching a measure needs rows the
  *    summary collapsed and blocks the rewrite;
  *  - it groups by a SUBSET of the MV's group columns (plain column
  *    references only), with at least one group column (global
  *    aggregates are excluded: over an empty source `count(*)` is 0 but
  *    `sum(partial)` is NULL — the one shape where the rollup is not
  *    exactly equivalent);
  *  - every aggregate is re-expressible from the partials:
  *    `count(*) → sum(cnt)`, `sum(x) → sum(sum_x)`,
  *    `min(x) → min(min_x)`, `max(x) → max(max_x)` — no DISTINCT, no
  *    FILTER clause, and sums restricted to BIGINT/DOUBLE columns
  *    (decimal sum result types widen per level, so a rewritten decimal
  *    sum would change the output type).
  *
  * Output attribute ids are PRESERVED (each rewritten expression is
  * aliased back under the original exprId), so parent operators above
  * the aggregate never notice the substitution.
  *
  * At 100 TB this is the difference between a full fact scan and
  * reading a few thousand summary rows — the summary is maintained
  * incrementally elsewhere (graft's IncrementalAgg does exactly this
  * over CDC feeds); this rule closes the loop by letting EXISTING
  * queries benefit without being rewritten by hand.
  *
  * Scope guards make misfire impossible rather than unlikely: any shape
  * outside the list above is left untouched, and an empty registry makes
  * the rule a no-op (zero overhead for sessions that never register).
  */
object MvRewrite {

  /** A registered rollup: `summaryPath` holds one row per distinct
    * `groupCols` tuple of the source with columns `cnt` (row count),
    * `sum_<c>`, `min_<c>`, `max_<c>` for each declared column. */
  final case class Mv(
      sourcePath: String,
      summaryPath: String,
      groupCols: Seq[String],
      sumCols: Seq[String],
      minCols: Seq[String] = Seq.empty,
      maxCols: Seq[String] = Seq.empty)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Mv]()

  private def canon(p: String): String = new Path(p).toUri.getPath

  /** Register a rollup for transparent rewrite (keyed by source path —
    * one summary per source). */
  def register(mv: Mv): Unit = { registry.put(canon(mv.sourcePath), mv); () }

  def unregister(sourcePath: String): Unit = {
    registry.remove(canon(sourcePath)); ()
  }

  def clear(): Unit = registry.clear()

  /** Build + write + register the summary in one call: one aggregation
    * over the source (cost ∝ source, paid once), parquet at
    * `summaryPath`. */
  def materialize(spark: SparkSession, mv: Mv): Unit = {
    val src = spark.read.parquet(mv.sourcePath)
    val aggs =
      (count(lit(1)).as("cnt") +:
        (mv.sumCols.map(c => sum(col(c)).as(s"sum_$c")) ++
          mv.minCols.map(c => min(col(c)).as(s"min_$c")) ++
          mv.maxCols.map(c => max(col(c)).as(s"max_$c"))))
    src.groupBy(mv.groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(mv.summaryPath)
    register(mv)
  }

  /** The injected rule (one instance per session via
    * [[graft.functions.GraftExtensions]]). */
  final class RewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else plan.transformUp {
        case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
      }

    /** The scan under `child`, seen through column-pruning Projects of
      * plain attributes and Filters — returns the relation plus every
      * filter condition collected on the way down. The CALLER decides
      * whether those conditions are answerable from the summary
      * (deterministic, group-columns-only); collecting here keeps the
      * walk total. */
    private def scanOf(child: LogicalPlan)
        : Option[(LogicalRelation, Seq[Expression])] =
      child match {
        case lr: LogicalRelation => Some((lr, Seq.empty))
        case Project(exprs, inner) if exprs.forall {
          case _: AttributeReference => true
          case _ => false
        } => scanOf(inner)
        case Filter(cond, inner) =>
          scanOf(inner).map { case (lr, cs) => (lr, cond +: cs) }
        case _ => None
      }

    private def sourcePathOf(lr: LogicalRelation): Option[String] =
      lr.relation match {
        case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
          Some(canon(fs.location.rootPaths.head.toString))
        case _ => None
      }

    private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
      val (lr, filterConds) = scanOf(agg.child).getOrElse(return None)
      val mv = Option(registry.get(sourcePathOf(lr).getOrElse(return None)))
        .getOrElse(return None)

      // filters are answerable iff DETERMINISTIC and referencing ONLY
      // the MV's group columns — the summary holds every distinct group
      // tuple, so a group-column predicate selects exactly the same
      // groups it would over the source. Anything touching a measure or
      // an unregistered column needs rows the summary collapsed.
      if (!filterConds.forall(c => c.deterministic && c.references.forall(
        a => mv.groupCols.contains(a.name)))) return None

      // groupings: plain source columns, subset of the MV's group cols,
      // and at least one (global aggregates excluded — see scaladoc)
      val groupAttrs = agg.groupingExpressions.map {
        case a: AttributeReference => a
        case _ => return None
      }
      if (groupAttrs.isEmpty) return None
      if (!groupAttrs.forall(a => mv.groupCols.contains(a.name))) return None

      val summary = spark.read.parquet(mv.summaryPath)
        .queryExecution.analyzed
      val sumAttr: Map[String, Attribute] =
        summary.output.map(a => a.name -> a).toMap
      def s(name: String): Attribute = sumAttr.getOrElse(name,
        throw new IllegalStateException(
          s"registered summary ${mv.summaryPath} lacks column '$name'"))

      // re-express one aggregate call from the partials
      def reagg(ae: AggregateExpression): Option[Expression] = {
        if (ae.isDistinct || ae.filter.isDefined) return None
        ae.aggregateFunction match {
          case Count(Seq(Literal(1, _))) =>
            Some(AggregateExpression(Sum(s("cnt")), Complete,
              isDistinct = false))
          case Sum(a: AttributeReference, _)
            if mv.sumCols.contains(a.name) &&
              (a.dataType == LongType || a.dataType == DoubleType) =>
            Some(AggregateExpression(Sum(s(s"sum_${a.name}")), Complete,
              isDistinct = false))
          case Min(a: AttributeReference) if mv.minCols.contains(a.name) =>
            Some(AggregateExpression(Min(s(s"min_${a.name}")), Complete,
              isDistinct = false))
          case Max(a: AttributeReference) if mv.maxCols.contains(a.name) =>
            Some(AggregateExpression(Max(s(s"max_${a.name}")), Complete,
              isDistinct = false))
          case _ => None
        }
      }

      val groupIds = groupAttrs.map(_.exprId).toSet
      val newResult: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: AttributeReference if groupIds.contains(a.exprId) =>
          Alias(s(a.name), a.name)(exprId = a.exprId)
        case al @ Alias(a: AttributeReference, _)
          if groupIds.contains(a.exprId) =>
          Alias(s(a.name), al.name)(exprId = al.exprId)
        case al @ Alias(ae: AggregateExpression, _) =>
          Alias(reagg(ae).getOrElse(return None), al.name)(exprId = al.exprId)
        case _ => return None
      }
      val newGroupings = groupAttrs.map(a => s(a.name))
      // group-column filters rebase by NAME onto the summary's attrs
      val rebasedChild =
        if (filterConds.isEmpty) summary
        else Filter(filterConds.map(_.transform {
          case a: AttributeReference => s(a.name)
        }).reduce(org.apache.spark.sql.catalyst.expressions.And),
          summary)
      // count(*)-shaped outputs change nullability (sum of partials is
      // nullable); that is advisory metadata, value-identical per group
      Some(Aggregate(newGroupings, newResult, rebasedChild))
    }
  }
}
