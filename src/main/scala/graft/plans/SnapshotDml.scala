package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** EXECUTE-at-EXECUTION carrier for the SQL DML table functions
  * (`snapshot_delete_where` / `snapshot_update_where` /
  * `snapshot_merge_into` / `snapshot_optimize`).
  *
  * An injected table function must return a LogicalPlan at RESOLUTION
  * time — so the round-8 implementation ran the verb inside the builder
  * and returned the report as a literal relation. That made EXPLAIN,
  * dry resolution, and re-analysis of any plan containing the TVF
  * perform the DELETE/UPDATE/MERGE as a side effect, and re-resolution
  * re-run it (a re-analyzed merge with deleteWhen, or a repeated
  * optimize, commits extra versions).
  *
  * This node closes that: the builder returns a RESOLVED leaf carrying
  * the verb as a thunk; [[Strategy]] plans it to [[DmlExec]], whose
  * `doExecute` runs the thunk — the RunnableCommand discipline. EXPLAIN
  * shows the node without running anything; each EXECUTION of the
  * statement runs the verb exactly once (re-collecting the SAME
  * DataFrame reuses the materialized RDD and does not re-run). Verb
  * errors (NULL merge keys, CHECK violations, DV refusals) surface at
  * execution, as DML errors do everywhere else in SQL. */
object SnapshotDml {

  /** The one-row report relation (verb, table, version); born resolved.
    * `output` is a constructor field (defaulted) so tree copies keep
    * the SAME attribute ids — a regenerating `val` would orphan the
    * parent Project's references at binding time. */
  final case class DmlPlan(verb: String, table: String, run: () => Long,
      output: Seq[Attribute] = Seq(
        AttributeReference("verb", StringType, nullable = false)(),
        AttributeReference("table", StringType, nullable = false)(),
        AttributeReference("version", LongType, nullable = false)()))
      extends LeafNode {
    override def computeStats(): Statistics =
      Statistics(sizeInBytes = 64L) // one tiny row — always broadcastable
  }

  /** Plans [[DmlPlan]] as [[DmlExec]] — injected by
    * [[graft.functions.GraftExtensions]]. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case DmlPlan(verb, table, run, output) =>
        DmlExec(verb, table, run, output) :: Nil
      case _ => Nil
    }
  }

  final case class DmlExec(verb: String, table: String, run: () => Long,
      output: Seq[Attribute]) extends LeafExecNode {
    override protected def doExecute(): RDD[InternalRow] = {
      val v = run() // the verb runs HERE — execution time, never analysis
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      val row = proj(new GenericInternalRow(Array[Any](
        UTF8String.fromString(verb), UTF8String.fromString(table), v)))
        .copy()
      sparkContext.parallelize(Seq[InternalRow](row), 1)
    }
  }
}
