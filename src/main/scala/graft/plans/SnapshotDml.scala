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
  * shows the node without running anything; the verb runs AT MOST ONCE
  * per planned statement: SparkPlan.execute() re-invokes doExecute on
  * every action over the same DataFrame (show() then collect() would
  * otherwise commit twice), so [[DmlExec]] memoizes the verb's result
  * in a lazy val — the second action re-reports the SAME new version
  * without re-applying the verb. Verb errors (NULL merge keys, CHECK
  * violations, DV refusals) surface at execution, as DML errors do
  * everywhere else in SQL. */
object SnapshotDml {

  /** The one-row report relation (verb, table, version); born resolved.
    * `output` is a constructor field (defaulted) so tree copies keep
    * the SAME attribute ids — a regenerating `val` would orphan the
    * parent Project's references at binding time. */
  final case class DmlPlan(verb: String, table: String, run: () => Long,
      output: Seq[Attribute] = Seq(
        AttributeReference("verb", StringType, nullable = false)(),
        AttributeReference("table", StringType, nullable = false)(),
        AttributeReference("version", LongType, nullable = false)()),
      memo: java.util.concurrent.atomic.AtomicReference[Option[Long]] =
        new java.util.concurrent.atomic.AtomicReference(None))
      extends LeafNode {
    override def computeStats(): Statistics =
      Statistics(sizeInBytes = 64L) // one tiny row — always broadcastable
    /** The verb's result, memoized in a box SHARED ACROSS PLAN COPIES:
      * every action clones the logical plan (QueryExecution optimizes a
      * clone(), and `stmt.show()` additionally derives a new Dataset),
      * so neither a lazy val on this node nor one on [[DmlExec]]
      * survives — makeCopy re-invokes the constructor, but copies the
      * `memo` REFERENCE, so all clones of one statement share the box
      * and the verb runs at most once per statement. */
    def result: Long = memo.synchronized {
      memo.get() match {
        case Some(v) => v
        case None    => val v = run(); memo.set(Some(v)); v
      }
    }
  }

  /** Plans [[DmlPlan]] as [[DmlExec]] — injected by
    * [[graft.functions.GraftExtensions]]. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case p: DmlPlan =>
        DmlExec(p.verb, p.table, () => p.result, p.output) :: Nil
      case _ => Nil
    }
  }

  final case class DmlExec(verb: String, table: String, run: () => Long,
      output: Seq[Attribute]) extends LeafExecNode {
    // the verb runs at EXECUTION time, never analysis — and at most
    // once per plan instance: SparkPlan.execute() never memoizes
    // doExecute, so without this guard a second action on the same
    // DataFrame (show then collect) would apply the DML twice
    @transient private lazy val result: Long = run()
    override protected def doExecute(): RDD[InternalRow] = {
      val v = result
      val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
      val row = proj(new GenericInternalRow(Array[Any](
        UTF8String.fromString(verb), UTF8String.fromString(table), v)))
        .copy()
      sparkContext.parallelize(Seq[InternalRow](row), 1)
    }
  }
}
