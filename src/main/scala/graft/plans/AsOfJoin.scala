package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native AS-OF JOIN — the whole-operator tier of the extension ladder
  * (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered via
  * `SparkSessionExtensions`): for every left row, the LAST right row
  * with the same key strictly before it in (time, tiebreak) order,
  * optionally within a staleness tolerance — the feature-store lookup
  * the engine previously expressed as a union+window carry-forward
  * (`ops/JoinOps.joinAsof`).
  *
  * Why a physical operator when the window form works: the window
  * formulation must UNION both tables into one relation and sort the
  * combined stream per key, so the clicks table flows through the
  * purchases window even though only its last-before row is ever used.
  * The native exec hash-partitions each side by key and streams ONE
  * ordered merge per partition — no union materialization, no window
  * buffer, right rows held one at a time (O(1) state per key), exactly
  * the plan a hand-written engine would run. At 100 TB both sides
  * shuffle once on the key (same as the window's single shuffle), but
  * peak memory drops from "window partition" to "one row".
  *
  * Semantics (deliberately exact): keys equal; match is the greatest
  * (rt, rtb) with rt < lt OR (rt == lt AND rtb < ltb) — the same total
  * order as the window twin's ORDER BY (ts, event_id) ROWS ... 1
  * PRECEDING; with `toleranceUs` set, a match older than the tolerance
  * (lt − rt > tol, microseconds) yields NULL instead (freshness SLA).
  * Unmatched left rows emit the right side as typed NULLs (left-outer
  * shape). NULL left keys/times match nothing; NULL right keys/times
  * never match.
  *
  * Scope guard: key/time/tiebreak must be LongType or TimestampType
  * (micros-backed longs) — loud failure otherwise. Both inputs must
  * carry DISJOINT attribute ids (alias one side of a self-join first);
  * the builder rejects overlap rather than silently mis-binding.
  */
object AsOfJoin {

  /** Resolved logical node. Key/time/tie expressions are attributes OF
    * the respective child, so the node is born resolved — no analyzer
    * rule needed. */
  final case class AsOfJoinPlan(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      leftTie: Expression, rightTie: Expression,
      toleranceUs: Option[Long]) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]] — injected by
    * [[graft.functions.GraftExtensions]]. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(l, r, lk, rk, lt, rt, ltb, rtb, tol) =>
        AsOfJoinExec(planLater(l), planLater(r),
          lk, rk, lt, rt, ltb, rtb, tol) :: Nil
      case _ => Nil
    }
  }

  /** Partition-wise ordered merge. Children are hash-clustered on the
    * key (EnsureRequirements inserts + co-aligns the Exchanges, the
    * SortMergeJoin discipline) and sorted by (key, time, tie), so each
    * partition pair merges in one pass holding ONE buffered right row. */
  final case class AsOfJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKey: Expression, rightKey: Expression,
      leftTime: Expression, rightTime: Expression,
      leftTie: Expression, rightTie: Expression,
      toleranceUs: Option[Long]) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKey :: Nil) ::
        ClusteredDistribution(rightKey :: Nil) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
        SortOrder(leftTie, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
        SortOrder(rightTie, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    protected override def doExecute(): RDD[InternalRow] = {
      val tol = toleranceUs
      val lSchema = left.output
      val rSchema = right.output
      val (lk, lt, ltb) = (leftKey, leftTime, leftTie)
      val (rk, rt, rtb) = (rightKey, rightTime, rightTie)
      val rWidth = rSchema.size
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        // one [key, time, tie] long-triple projection per side; rows with
        // any NULL component can never match (SQL equality semantics)
        val lProj = UnsafeProjection.create(Seq(lk, lt, ltb), lSchema)
        val rProj = UnsafeProjection.create(Seq(rk, rt, rtb), rSchema)
        val nullRight = new GenericInternalRow(rWidth)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private var rRow: InternalRow = _      // lookahead right row
          private var rKey = 0L; private var rT = 0L; private var rTb = 0L
          private var rValid = false
          // the buffered best-so-far match and which key it belongs to
          private var matchRow: InternalRow = _
          private var matchKey = 0L
          private var matchT = 0L
          private var haveMatch = false

          private def advanceRight(): Unit = {
            rValid = false
            while (!rValid && rIter.hasNext) {
              val row = rIter.next()
              val p = rProj(row)
              if (!p.isNullAt(0) && !p.isNullAt(1) && !p.isNullAt(2)) {
                rRow = row; rKey = p.getLong(0); rT = p.getLong(1)
                rTb = p.getLong(2); rValid = true
              }
            }
          }
          advanceRight()

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val lRow = lIter.next()
            val p = lProj(lRow)
            if (p.isNullAt(0) || p.isNullAt(1) || p.isNullAt(2))
              return joined(lRow, nullRight) // null key/time: no match
            val k = p.getLong(0); val t = p.getLong(1); val tb = p.getLong(2)
            // consume right rows strictly before (k, t, tb); the latest
            // same-key one is the candidate match (sorted ⇒ monotone)
            while (rValid && (rKey < k ||
                (rKey == k && (rT < t || (rT == t && rTb < tb))))) {
              if (rKey == k) {
                matchRow = rRow.copy(); matchKey = k; matchT = rT
                haveMatch = true
              }
              advanceRight()
            }
            val usable = haveMatch && matchKey == k &&
              tol.forall(t - matchT <= _)
            if (usable) joined(lRow, matchRow)
            else joined(lRow, nullRight)
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  private def resolveAttr(df: DataFrame, name: String): Attribute = {
    val plan = df.queryExecution.analyzed
    val attr = plan.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"as-of column '$name' not found in [${plan.output.map(_.name).mkString(", ")}]"))
    require(attr.dataType == LongType || attr.dataType == TimestampType ||
      attr.dataType.isInstanceOf[org.apache.spark.sql.types.TimestampNTZType],
      s"as-of column '$name' must be BIGINT or TIMESTAMP (micros-backed), " +
        s"got ${attr.dataType.simpleString}")
    attr
  }

  /** Build the as-of join: for each `left` row, the last `right` row
    * with equal `key` strictly before it in (`time`, `tie`) order,
    * within `toleranceUs` when given. Output = left columns ++ right
    * columns (NULL when unmatched). Alias one side of a self-join first
    * — overlapping attribute ids are rejected loudly. */
  def asof(left: DataFrame, right: DataFrame,
      key: (String, String), time: (String, String), tie: (String, String),
      toleranceUs: Option[Long] = None): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val overlap = lPlan.outputSet.intersect(rPlan.outputSet)
    require(overlap.isEmpty,
      s"as-of sides share attributes ${overlap.toSeq.map(_.name).mkString(", ")} — " +
        "alias one side (select ... as r_...) before joining")
    ColumnBridge.ofRows(left.sparkSession, AsOfJoinPlan(
      lPlan, rPlan,
      resolveAttr(left, key._1), resolveAttr(right, key._2),
      resolveAttr(left, time._1), resolveAttr(right, time._2),
      resolveAttr(left, tie._1), resolveAttr(right, tie._2),
      toleranceUs))
  }
}
