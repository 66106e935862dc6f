package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the query inventory (SURVEY.md §2.2).
  *
  * Cross-engine determinism (SURVEY.md §7.4/§7.5): money aggregations go
  * through DECIMAL(18,2) so sums are exact and association-order-free;
  * the final cast back to DOUBLE is deterministic. Oracles mirror the
  * same casts verbatim.
  */
package object ops {
  val Money: DecimalType = DecimalType(18, 2)

  /** Exact money sum, surfaced as a schema-stable DOUBLE. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Oracle fragment mirroring [[dsum]]. */
  def dsumSql(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
}
