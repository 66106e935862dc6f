package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the dbt-test / Deequ-style
  * constraint runner, engineered for the 100 TB cost model: every
  * ROW-SCALAR check (not-null, accepted-values, range, custom predicate,
  * uniqueness) over one table FUSES into a SINGLE aggregation pass — one
  * scan, column-pruned to exactly the checked columns, map-side partial
  * — where a naive per-check runner scans the table once per check.
  * Referential checks (foreign keys) cost one anti-join each, with the
  * reference side DISTINCT'd and broadcast when it is dimension-sized.
  *
  * Two run modes:
  *  - [[Expectations.run]]: dedicated validation pass → a report frame
  *    `(check, violations, pass)`, deterministic order.
  *  - [[Expectations.observed]]: ZERO-COST monitoring — scalar checks
  *    ride an existing query's action via `Dataset.observe`
  *    ([[graft.sources.Observe]] free-ride recipe); read the violation
  *    counts off the driven frame afterwards. The production shape:
  *    the nightly aggregation job IS the data-quality scan.
  *
  * Violations are COUNTS, never booleans-only: "how broken" decides
  * whether a 100 TB backfill aborts or quarantines. NULL semantics are
  * explicit per check: NotNull counts nulls; AcceptedValues and Range
  * do NOT count nulls (compose with NotNull to forbid them — matching
  * SQL CHECK constraint three-valued logic); Unique counts rows beyond
  * the first per duplicated key; Predicate counts rows where the
  * predicate is not definitely true (NULL = violation — a data-quality
  * rule that cannot evaluate is failing).
  */
object Expectations {

  sealed trait Check { def name: String }

  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }

  /** Non-NULL values of `col` must be one of `values`. */
  final case class AcceptedValues(col: String, values: Seq[String])
      extends Check {
    def name = s"accepted_values($col)"
  }

  /** Non-NULL values of `col` must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double)
      extends Check {
    def name = s"in_range($col)"
  }

  /** `cols` must be row-unique; violations = rows beyond the first per
    * duplicated key (NULL keys group like values, the GROUP BY rule). */
  final case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Arbitrary row predicate; a row where `pred` is NULL violates. */
  final case class Predicate(label: String, pred: Column) extends Check {
    def name = s"predicate($label)"
  }

  /** The table must have at least `n` rows — the "did the pipeline eat
    * everything" guard; violations = the shortfall. */
  final case class MinRows(n: Long) extends Check {
    def name = s"min_rows($n)"
  }

  /** Every non-NULL `col` must exist in `ref`'s `refCol` (FK shape).
    * Costs one anti-join (the only non-fused check kind); `broadcastRef`
    * broadcasts the DISTINCT'd reference side — keep it on for
    * dimension-sized refs, off when the ref is itself fact-sized. */
  final case class RefIntegrity(col: String, ref: DataFrame, refCol: String,
      broadcastRef: Boolean = true) extends Check {
    def name = s"ref_integrity($col)"
  }

  /** Violation-count aggregate for one scalar check. */
  private def violations(c: Check): Column = c match {
    case NotNull(col0) => count_if(col(col0).isNull)
    case AcceptedValues(col0, vs) =>
      count_if(col(col0).isNotNull && !col(col0).isin(vs: _*))
    case InRange(col0, lo, hi) =>
      count_if(col(col0).isNotNull &&
        (col(col0) < lo || col(col0) > hi))
    case Unique(cols0) =>
      // rows beyond the first per key = n - distinct(keys); NULL keys
      // participate (count_distinct skips all-NULL tuples, so add those
      // groups back via a null-flagged composite)
      count(lit(1)) - countDistinct(
        concat_ws("\u0000", cols0.map(c =>
          coalesce(col(c).cast("string"), lit("\u0001null"))): _*))
    case Predicate(_, pred) => count_if(!coalesce(pred, lit(false)))
    case MinRows(n) => greatest(lit(n) - count(lit(1)), lit(0L))
    case _: RefIntegrity =>
      throw new IllegalArgumentException(
        "RefIntegrity is join-shaped; handled in run()")
  }

  /** Can this check RIDE an existing action as an observed metric?
    * Everything but the distinct-shaped Unique (Spark forbids DISTINCT
    * aggregates in observed metrics) and the join-shaped RefIntegrity.
    * [[graft.CuratePipeline]]'s publish gate uses this split to attach
    * the ridable checks to the shard WRITE itself — zero extra passes —
    * keeping the dedicated output pass for table-shaped checks only. */
  private[graft] def ridable(c: Check): Boolean = c match {
    case _: Unique | _: RefIntegrity => false
    case _                           => true
  }

  /** The violation-count aggregate of a ridable check, for callers
    * wiring their own `Observation`. */
  private[graft] def violationAgg(c: Check): Column = violations(c)

  /** Validate `df` against `checks` → report frame
    * `(check: string, violations: bigint, pass: boolean)` in the order
    * given. All scalar checks share ONE aggregation pass. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val spark = df.sparkSession
    import spark.implicits._
    val (refs, scalars) = checks.partition(_.isInstanceOf[RefIntegrity])
    val scalarRows: Seq[(String, Long)] =
      if (scalars.isEmpty) Seq.empty
      else {
        val aggs = scalars.map(c => violations(c).cast("long").as(c.name))
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        scalars.zipWithIndex.map { case (c, i) => c.name -> row.getLong(i) }
      }
    val refRows: Seq[(String, Long)] = refs.map {
      case r @ RefIntegrity(col0, ref, refCol, bc) =>
        val dist = ref.select(col(refCol).as("__ref")).distinct()
        val side = if (bc) broadcast(dist) else dist
        val n = df.filter(col(col0).isNotNull)
          .join(side, col(col0) === col("__ref"), "left_anti")
          .count()
        r.name -> n
      case other => throw new IllegalStateException(other.name)
    }
    val byName = (scalarRows ++ refRows).toMap
    checks.map(c => (c.name, byName(c.name), byName(c.name) == 0L))
      .toDF("check", "violations", "pass")
  }

  /** Attach the scalar checks to `df` as observed metrics named `tag` —
    * they ride whatever action later drives the frame (zero extra
    * passes). Read results with [[observedReport]]. Join-shaped checks
    * (RefIntegrity) cannot ride an unrelated action — rejected. */
  def observed(df: DataFrame, tag: String, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    require(!checks.exists(_.isInstanceOf[RefIntegrity]),
      "RefIntegrity is join-shaped and cannot ride another action — " +
        "use run() for referential checks")
    require(!checks.exists(_.isInstanceOf[Unique]),
      "Unique is distinct-shaped and Spark forbids DISTINCT aggregates " +
        "in observed metrics (INVALID_OBSERVED_METRICS) — use run() for " +
        "uniqueness")
    graft.sources.Observe.tagged(df, tag,
      checks.map(c => c.name -> violations(c).cast("long")): _*)
  }

  /** The violation counts observed under `tag` after `driven` ran an
    * action: (check, violations, pass) in check order, or None before
    * any action completed. */
  def observedReport(driven: DataFrame, tag: String,
      checks: Seq[Check]): Option[Seq[(String, Long, Boolean)]] =
    graft.sources.Observe.metricsOf(driven, tag).map { m =>
      checks.map { c =>
        val v = m(c.name).asInstanceOf[Long]
        (c.name, v, v == 0L)
      }
    }

  /** Bridge to [[graft.sources.SnapshotLog.addCheck]]: render a
    * row-scalar expectation as the single-line SQL CHECK expression the
    * snapshot log stores and enforces at every commit — declare the
    * rule ONCE, validate it both in the pipeline (this runner / the
    * observe free-ride) and at the table boundary (commit refusal).
    *
    * Semantics shift to SQL CHECK three-valued logic on the table side:
    * NULL passes there, so NotNull renders as an explicit IS NOT NULL
    * and AcceptedValues/InRange keep their null-tolerant runner
    * semantics unchanged. Table-level shapes (Unique, MinRows,
    * RefIntegrity) are NOT row-scalar CHECKs — refused loudly rather
    * than silently weakened. */
  def toCheckSql(c: Check): String = c match {
    case NotNull(c0) => s"$c0 IS NOT NULL"
    case AcceptedValues(c0, vs) =>
      s"$c0 IN (${vs.map(v => s"'${v.replace("'", "''")}'").mkString(", ")})"
    case InRange(c0, lo, hi) => s"$c0 >= $lo AND $c0 <= $hi"
    case Predicate(_, pred) =>
      // eager node→Expression conversion; .sql on the converted tree is
      // parseable text (the bridge spec proves round-trip enforceability)
      org.apache.spark.sql.graftshim.ColumnBridge.sqlOf(pred)
    case other => throw new IllegalArgumentException(
      s"${other.name} is table-shaped, not a row-scalar CHECK — " +
        "enforce it with Expectations.run at publish time instead")
  }
}
