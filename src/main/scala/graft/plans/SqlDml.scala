package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, CaseWhen, Cast, EqualTo, Expression, Literal, Or, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.DataType

import graft.sources.{SnapshotCatalogTable, SnapshotLog}

/** Native SQL `UPDATE` and `MERGE INTO` for [[graft.sources.GraftCatalog]]
  * tables — the last DML verbs the SQL surface lacked (DELETE FROM
  * already plans through `SupportsDelete`).
  *
  * Spark's own row-level path requires `SupportsRowLevelOperations`
  * (a scan+replace write pair). The snapshot log already HAS that whole
  * machinery as library verbs — [[SnapshotLog.updateWhere]] (file-grain
  * copy-on-write with DV composition) and [[SnapshotLog.merge]] (keyed
  * COW upsert with NULL/duplicate-key guards and the claim/rebase commit
  * protocol) — so instead of re-implementing the rewrite we translate
  * the RESOLVED logical plans onto those verbs with one analyzer rule:
  *
  *  - `UPDATE t SET ... WHERE ...` → [[GraftUpdateCommand]] →
  *    `updateWhere(dir, pred, set)`. Expressions are re-bound BY NAME
  *    (single table — unambiguous), so the verb's internal file-grain
  *    scans resolve them against each rewrite frame.
  *  - `MERGE INTO t USING s ON ... WHEN ...` → [[GraftMergeCommand]]:
  *    the rule compiles the action clauses into ONE keyed change-set
  *    plan (matched inner join / not-matched anti join / not-matched-by-
  *    source anti join, each projecting full target-schema post-image
  *    rows plus a `__graft_op` tombstone marker, first-match-wins via
  *    `CaseWhen`, rows matching no clause filtered out = untouched), and
  *    the verb merges it at file grain. Attribute references stay
  *    RESOLVED here — target and source may share column names, so the
  *    joins are built as logical plans over the original relations.
  *
  * Both commit exactly ONE snapshot version through the library verb —
  * time travel, CHECK constraints, DV carry, `#lastbatch` watermark and
  * concurrency rebase all apply to SQL DML for free, and the verbs'
  * loud guards (NULL/duplicate merge keys, unknown SET columns) surface
  * as SQL errors.
  *
  * Scale shape (the verbs' cost model): UPDATE/MERGE rewrite only files
  * containing a matched row — located by ONE column-pruned scan — and
  * carry the rest by reference; the MERGE change-set joins are planned
  * by Catalyst (broadcast when the source is small). UNCORRELATED
  * subqueries are supported in UPDATE/DELETE WHERE, MERGE WHEN
  * conditions and action values (the inner plan rides resolved and
  * Catalyst plans the extra join); non-equality ON clauses,
  * nested-field SET targets and CORRELATED subqueries are refused
  * loudly rather than silently mistranslated. */
object SqlDml {
  private[plans] val OpCol = "__graft_op"

  /** The catalog table a DML statement targets, if it is ours and
    * writable (not time-traveled). */
  private def targetOf(plan: LogicalPlan): Option[SnapshotCatalogTable] =
    plan match {
      case SubqueryAlias(_, child) => targetOf(child)
      case r: DataSourceV2Relation => r.table match {
        case t: SnapshotCatalogTable => Some(t)
        case _                       => None
      }
      case _ => None
    }

  /** Subqueries in DML predicates/values are supported when
    * UNCORRELATED: the inner plan is self-contained (already resolved —
    * Catalyst plans it like any read, seeing the pre-statement table
    * state), so it survives the by-name re-bind and the verb's internal
    * re-analysis untouched. A CORRELATED subquery carries outer
    * attribute ids that would dangle once the outer frame re-binds —
    * refused loudly instead of silently mis-resolving. */
  private def refuseCorrelated(e: Expression, what: String): Unit =
    e.foreach {
      case s: SubqueryExpression if s.isCorrelated ||
          s.plan.expressions.exists(_.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.OuterReference])) =>
        throw new UnsupportedOperationException(
          s"graft SQL DML: CORRELATED subqueries in $what are not " +
            "supported — pre-compute the subquery into the source frame")
      case _ => ()
    }

  /** Re-bind a resolved single-table expression BY NAME so the library
    * verb can resolve it against its own internal scans. Uncorrelated
    * subquery plans ride along resolved (`Expression.transform` never
    * descends into a [[SubqueryExpression]]'s plan — exactly the
    * behavior wanted here: outer references re-bind, the inner plan
    * stays bound to its own relations). */
  private def byName(e: Expression, what: String): Column = {
    refuseCorrelated(e, what)
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  private def castTo(e: Expression, dt: DataType): Expression =
    if (e.dataType == dt) e else Cast(e, dt)

  /** Analyzer rule: rewrite resolved UPDATE/MERGE over snapshot-catalog
    * tables into runnable commands on the library verbs. Runs inside the
    * resolution fixed point, so Spark's "table does not support row-level
    * operations" rejection never sees the plan. */
  class ResolveDml(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsDown {
        case u @ UpdateTable(table, _, _) if u.resolved =>
          targetOf(table).map(rewriteUpdate(_, u)).getOrElse(u)
        // DELETE normally plans through SupportsDelete (pushed filters);
        // a subquery-bearing condition has no filter translation and
        // Spark refuses it at physical planning — route it onto the
        // library verb instead, where the subquery plans like any read
        // (seeing the pre-statement table state, as SQL requires)
        case d @ DeleteFromTable(table, condition) if d.resolved &&
            SubqueryExpression.hasSubquery(condition) =>
          targetOf(table) match {
            case Some(t) =>
              requireWritable(t)
              GraftDeleteCommand(t.dir, byName(condition, "DELETE WHERE"))
            case None => d
          }
        case m: MergeIntoTable if m.resolved =>
          targetOf(m.targetTable).map(rewriteMerge(_, m)).getOrElse(m)
        // dynamic partition overwrite: Spark has no V1-fallback exec for
        // OverwritePartitionsDynamic, so the resolved plan translates
        // onto the library verb instead (one atomic manifest-surgery
        // commit). The analyzer has already aligned `query`'s output to
        // the table's columns (o.resolved requires it).
        case o: OverwritePartitionsDynamic if o.resolved =>
          targetOf(o.table) match {
            case Some(t) =>
              requireWritable(t)
              GraftDynamicOverwriteCommand(t.dir, o.query)
            case None => o
          }
      }
  }

  private def requireWritable(t: SnapshotCatalogTable): Unit =
    require(t.versionAsOf.isEmpty,
      s"${t.name()} VERSION/TIMESTAMP AS OF is a read-only relation")

  private def rewriteUpdate(t: SnapshotCatalogTable,
      u: UpdateTable): LogicalPlan = {
    requireWritable(t)
    val set = u.assignments.map { a =>
      a.key match {
        case k: AttributeReference => k.name -> byName(a.value, "SET")
        case other => throw new UnsupportedOperationException(
          "graft UPDATE sets top-level columns; nested-field target " +
            s"'${other.sql}' is not supported")
      }
    }
    GraftUpdateCommand(t.dir, set, u.condition.map(byName(_, "WHERE")))
  }

  private def rewriteMerge(t: SnapshotCatalogTable,
      m: MergeIntoTable): LogicalPlan = {
    requireWritable(t)
    // WITH SCHEMA EVOLUTION arrives here ALREADY APPLIED: the table
    // declares AUTOMATIC_SCHEMA_EVOLUTION, so Spark's
    // ResolveMergeIntoSchemaEvolution widened the target (one
    // alterCommit metadata version) and re-resolved every action —
    // star expansion included — against the widened relation before
    // this rule matched the resolved plan. Nothing left to special-case.
    val target = m.targetTable
    val source = m.sourceTable
    val tOut = target.output
    require(!tOut.exists(_.name == OpCol),
      s"graft MERGE reserves the column name $OpCol")
    // WHEN conditions and action values may carry UNCORRELATED
    // subqueries: they stay RESOLVED inside the compiled change-set
    // plan (no re-bind happens on this path at all) and Catalyst plans
    // them as ordinary subquery joins. ON stays the keyed-equality
    // contract (keyPairs refuses anything else below).
    (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
      .foreach { a =>
        a.condition.foreach(refuseCorrelated(_, "WHEN ... AND"))
        a match {
          case UpdateAction(_, as, _) =>
            as.foreach(x => refuseCorrelated(x.value, "UPDATE SET"))
          case InsertAction(_, as) =>
            as.foreach(x => refuseCorrelated(x.value, "INSERT VALUES"))
          case _ => ()
        }
      }

    // merge keys: the ON clause must be an equality conjunction pairing
    // one target COLUMN with a source-side expression — that is the keyed
    // contract SnapshotLog.merge locates files by
    def keyPairs(e: Expression): Seq[(String, Expression)] = e match {
      case And(l, r) => keyPairs(l) ++ keyPairs(r)
      case EqualTo(l: AttributeReference, r)
        if target.outputSet.contains(l) &&
          r.references.subsetOf(source.outputSet) => Seq(l.name -> r)
      case EqualTo(l, r: AttributeReference)
        if target.outputSet.contains(r) &&
          l.references.subsetOf(source.outputSet) => Seq(r.name -> l)
      case other => throw new UnsupportedOperationException(
        "graft MERGE needs ON as a conjunction of target.col = " +
          s"<source expr> equalities; cannot translate '${other.sql}'")
    }
    val pairs = keyPairs(m.mergeCondition)
    val keys = pairs.map(_._1).distinct

    def stripCast(e: Expression): Expression = e match {
      case c: Cast => stripCast(c.child)
      case other   => other
    }
    def sameExpr(a: Expression, b: Expression): Boolean =
      stripCast(a).canonicalized == stripCast(b).canonicalized

    // the source expression each key column was matched on — a key
    // constrained by TWO different source expressions (t.k = s.a AND
    // t.k = s.b) is refused: neither is THE key of an unmatched row,
    // so the key-consistency guard below could not be sound
    val keyExpr: Map[String, Expression] =
      pairs.groupBy(_._1).map { case (k, ps) =>
        val distinctExprs = ps.map(_._2).foldLeft(Seq.empty[Expression]) {
          (acc, e) => if (acc.exists(sameExpr(_, e))) acc else acc :+ e
        }
        require(distinctExprs.length == 1,
          s"graft MERGE: ON constrains key column '$k' with " +
            s"${distinctExprs.length} different source expressions — " +
            "an unmatched row has no single key value to insert under; " +
            "use one equality per key column")
        k -> distinctExprs.head
      }

    // KEY-CONSISTENCY contract (loud, never silent): the verb locates
    // target rows by the change row's KEY VALUES, so a post-image whose
    // key differs from what the ON clause matched (or failed to match)
    // on would silently rewrite/replace the WRONG rows. Key columns may
    // only keep their target value or carry the ON clause's own source
    // expression; re-keying rows through MERGE is refused.
    def requireKeysConsistent(as: Seq[Assignment], what: String,
        allowOnExpr: Boolean): Unit =
      keys.foreach { k =>
        tOut.find(_.name == k).foreach { attr =>
          assigned(as, attr).foreach { v =>
            val ok = sameExpr(v, attr) ||
              (allowOnExpr && keyExpr.get(k).exists(sameExpr(v, _)))
            require(ok,
              s"graft MERGE: $what assigns key column '$k' a value other " +
                "than the ON clause's own match expression — re-keying " +
                "rows through MERGE would silently target the wrong rows " +
                "and is refused; update non-key columns, or delete+insert")
          }
        }
      }
    m.matchedActions.foreach {
      case UpdateAction(_, as, _) =>
        requireKeysConsistent(as, "WHEN MATCHED UPDATE", allowOnExpr = true)
      case _ => ()
    }
    m.notMatchedBySourceActions.foreach {
      case UpdateAction(_, as, _) =>
        requireKeysConsistent(as, "WHEN NOT MATCHED BY SOURCE UPDATE",
          allowOnExpr = false) // no source row exists for these
      case _ => ()
    }
    m.notMatchedActions.foreach {
      case InsertAction(_, as) =>
        keys.foreach { k =>
          tOut.find(_.name == k).foreach { attr =>
            val v = assigned(as, attr).getOrElse(
              throw new UnsupportedOperationException(
                s"graft MERGE: WHEN NOT MATCHED INSERT must assign key " +
                  s"column '$k' (a NULL key can never match)"))
            require(keyExpr.get(k).exists(sameExpr(v, _)),
              s"graft MERGE: INSERT assigns key column '$k' a value other " +
                "than the ON clause's match expression — the inserted row " +
                "would silently replace an unrelated existing row with " +
                "that key; insert exactly the key the row failed to match on")
          }
        }
      case _ => ()
    }

    // FAST PATH — the pure upsert shape (`WHEN MATCHED THEN UPDATE SET *
    // / WHEN NOT MATCHED THEN INSERT *`, or explicit assignments that
    // agree leg-to-leg), with every value referencing ONLY the source:
    // the change-set is a plain PROJECTION of the source — no join
    // against the target at all. The verb's own file-grain key join is
    // then the ONLY target read, so a sparse CDC batch against a 100 TB
    // table scans the target once (key-pruned), not twice. Conditional
    // clauses, target-referencing SETs, deletes and NOT MATCHED BY
    // SOURCE keep the exact general path below.
    def sourceOnly(e: Expression): Boolean =
      e.references.subsetOf(source.outputSet)
    def assigned(assignments: Seq[Assignment], attr: Attribute)
        : Option[Expression] =
      assignments.collectFirst {
        case Assignment(k: AttributeReference, v)
          if k.exprId == attr.exprId || k.name == attr.name => v
      }
    val fastUpsert: Option[LogicalPlan] =
      (m.matchedActions, m.notMatchedActions,
        m.notMatchedBySourceActions) match {
        case (Seq(UpdateAction(None, us, _)), Seq(InsertAction(None, is_)),
            Seq()) =>
          val cols = tOut.map { attr =>
            (assigned(us, attr), assigned(is_, attr)) match {
              case (Some(u), Some(i))
                if sourceOnly(u) && sourceOnly(i) &&
                  u.canonicalized == i.canonicalized =>
                Some(Alias(castTo(u, attr.dataType), attr.name)())
              case _ => None
            }
          }
          if (cols.forall(_.isDefined))
            // "I": every fast-path row is insert-ELIGIBLE (pure upsert —
            // a NULL-keyed source row matches nothing and plainly
            // inserts, the SQL MERGE contract), which relaxes the verb's
            // NULL-key guard for exactly these rows
            Some(Project(cols.flatten :+
              Alias(Literal("I"), OpCol)(), source))
          else None
        case _ => None
      }
    fastUpsert.foreach { changes =>
      return GraftMergeCommand(t.dir, keys, changes)
    }

    /** One change-set leg: project every action-hit row of `rows` to a
      * full target-schema post-image + op marker; rows hitting no action
      * clause are filtered out (left untouched by the merge). */
    def leg(rows: LogicalPlan, actions: Seq[MergeAction],
        valueFor: (MergeAction, Attribute) => Expression)
        : Option[LogicalPlan] =
      if (actions.isEmpty) None
      else {
        val conds = actions.map(_.condition.getOrElse(Literal(true)))
        val cols = tOut.map { attr =>
          val branches = actions.zip(conds).map { case (a, c) =>
            c -> castTo(valueFor(a, attr), attr.dataType)
          }
          Alias(CaseWhen(branches, None), attr.name)()
        }
        val op = Alias(CaseWhen(actions.zip(conds).map { case (a, c) =>
          c -> Literal(a match {
            case _: DeleteAction => "D"
            case _: InsertAction => "I" // not-matched: NULL keys allowed
            case _               => "U"
          })
        }, None), OpCol)()
        Some(Project(cols :+ op, Filter(conds.reduce(Or), rows)))
      }

    // WHEN MATCHED: inner join carries both sides; UPDATE keeps
    // unassigned columns at their target value, DELETE keeps the
    // pre-image (only the key + op marker matter)
    val matched = leg(
      Join(target, source, Inner, Some(m.mergeCondition), JoinHint.NONE),
      m.matchedActions,
      (a, attr) => a match {
        case UpdateAction(_, as, _) => assigned(as, attr).getOrElse(attr)
        case _: DeleteAction     => attr
        case other => throw new UnsupportedOperationException(
          s"graft MERGE: unsupported matched action $other")
      })

    // WHEN NOT MATCHED: source rows with no target match; unassigned
    // insert columns evaluate the column's CURRENT_DEFAULT when one is
    // declared (the SQL INSERT contract — the analyzer does the same
    // for the explicit DEFAULT keyword), else typed NULLs
    def insertDefault(attr: Attribute): Expression = {
      val f = org.apache.spark.sql.types.StructField(attr.name,
        attr.dataType, attr.nullable, attr.metadata)
      if (f.metadata.contains(org.apache.spark.sql.catalyst.util
          .ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY))
        org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
          .analyze(f, "MERGE INSERT")
      else Literal.create(null, attr.dataType)
    }
    val notMatched = leg(
      Join(source, target, LeftAnti, Some(m.mergeCondition), JoinHint.NONE),
      m.notMatchedActions,
      (a, attr) => a match {
        case InsertAction(_, as) =>
          assigned(as, attr).getOrElse(insertDefault(attr))
        case other => throw new UnsupportedOperationException(
          s"graft MERGE: unsupported not-matched action $other")
      })

    // WHEN NOT MATCHED BY SOURCE: target rows with no source match
    // (expressions reference the target only)
    val notMatchedBySource = leg(
      Join(target, source, LeftAnti, Some(m.mergeCondition), JoinHint.NONE),
      m.notMatchedBySourceActions,
      (a, attr) => a match {
        case UpdateAction(_, as, _) => assigned(as, attr).getOrElse(attr)
        case _: DeleteAction     => attr
        case other => throw new UnsupportedOperationException(
          s"graft MERGE: unsupported not-matched-by-source action $other")
      })

    val legs = Seq(matched, notMatched, notMatchedBySource).flatten
    require(legs.nonEmpty, "MERGE needs at least one WHEN clause")
    val changes =
      if (legs.length == 1) legs.head else Union(legs, false, false)
    GraftMergeCommand(t.dir, keys, changes)
  }
}

/** `UPDATE <catalog table> SET ... WHERE ...` → one
  * [[SnapshotLog.updateWhere]] commit (file-grain copy-on-write). */
case class GraftUpdateCommand(dir: String, set: Seq[(String, Column)],
    cond: Option[Column]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotLog.updateWhere(spark, dir, cond.getOrElse(lit(true)),
      set.toMap)
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"GraftUpdateCommand $dir [${set.map(_._1).mkString(", ")}]"
}

/** `DELETE FROM <catalog table> WHERE <subquery-bearing cond>` → one
  * [[SnapshotLog.deleteWhere]] commit. Only subquery-bearing conditions
  * land here ([[SqlDml.ResolveDml]]); plain ones keep the
  * `SupportsDelete` pushdown path. */
case class GraftDeleteCommand(dir: String, cond: Column)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotLog.deleteWhere(spark, dir, cond)
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"GraftDeleteCommand $dir"
}

/** Dynamic `INSERT OVERWRITE` (partitionOverwriteMode=dynamic /
  * `writeTo(...).overwritePartitions()`) → one
  * [[SnapshotLog.overwritePartitions]] commit: replace exactly the
  * partitions the incoming data touches, carry the rest by reference —
  * O(manifest) planning, no old data read. */
case class GraftDynamicOverwriteCommand(dir: String,
    query: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotLog.overwritePartitions(spark, dir,
      ColumnBridge.ofRows(spark, query))
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"GraftDynamicOverwriteCommand $dir"
}

/** `MERGE INTO <catalog table>` → one [[SnapshotLog.merge]] commit of
  * the compiled change-set plan: matched keys replaced (or tombstoned
  * when the op marker says delete), unmatched inserted, untouched files
  * carried by reference. The verb's guards (one row per key, no NULL
  * keys) surface MERGE cardinality violations loudly. */
case class GraftMergeCommand(dir: String, keys: Seq[String],
    changes: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(changes)
  override def run(spark: SparkSession): Seq[Row] = {
    val df = ColumnBridge.ofRows(spark, changes)
    SnapshotLog.merge(spark, dir, df, keys,
      deleteWhen = Some(col(SqlDml.OpCol) === lit("D")),
      dropCols = Seq(SqlDml.OpCol),
      // NOT MATCHED INSERT rows may carry NULL keys (SQL: NULL matches
      // nothing, the row just inserts) — the verb's guard still refuses
      // NULL keys on every other leg
      insertOnlyWhen = Some(col(SqlDml.OpCol) === lit("I")))
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"GraftMergeCommand $dir keys=[${keys.mkString(", ")}]"
}
