package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** ANSI-mode safety + collation surfaces (Spark 4 defaults ANSI ON —
  * plain division by zero or an overflow THROWS, so the `try_*` family
  * is the sanctioned way to keep a 100 TB job from dying on one bad row;
  * and string comparison semantics are now a COLUMN property via
  * collations, not a session flag). Both rows pin the cross-engine
  * semantics with counts only — exact integers, no float edges.
  */
object AnsiOps {

  /** Case-insensitive semantics via Spark 4 collations (UTF8_LCASE):
    * distinct counts and equality under a collated comparison vs binary,
    * over a deliberately case-mangled segment column. The DuckDB oracle
    * states the same semantics with lower() — for ASCII data UTF8_LCASE
    * equality IS lowercase equality, which is exactly the parity this
    * row pins (an engine upgrading its collation library must not change
    * these counts). Outputs are counts, so the nondeterministic "which
    * case variant represents a collated group" never appears. */
  val collation: Q = Q.checked(
    "q_collation",
    """SELECT
      |  CAST(count(DISTINCT s) AS BIGINT) AS n_binary,
      |  CAST(count(DISTINCT lower(s)) AS BIGINT) AS n_ci,
      |  CAST(count(*) FILTER (WHERE lower(s) = 'building') AS BIGINT)
      |    AS n_eq_building
      |FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
      |        ELSE lower(c_mktsegment) END AS s
      |      FROM customer) t""".stripMargin
  ) { (s, dir) =>
    val mangled = Tables.customer(s, dir)
      .select(when(col("c_custkey") % 2 === 0, upper(col("c_mktsegment")))
        .otherwise(lower(col("c_mktsegment"))).as("s"))
    mangled.agg(
      countDistinct(col("s")).as("n_binary"),
      countDistinct(collate(col("s"), "UTF8_LCASE")).as("n_ci"),
      count_if(collate(col("s"), "UTF8_LCASE") === lit("BuIlDiNg"))
        .as("n_eq_building"))
  }

  /** The try_* family under default-on ANSI mode: division by zero,
    * BIGINT overflow and a bad cast each yield NULL instead of killing
    * the job — counted over lineitem so the non-null tallies are exact
    * row-membership facts both engines must agree on. The DuckDB oracle
    * expresses the same semantics with guarded CASE / TRY_CAST (DuckDB
    * has no try_divide/try_multiply — overflow and ÷0 are stated as
    * predicates instead, which is precisely the cross-engine parity
    * being pinned). */
  val tryArith: Q = Q.checked(
    "q_try_arith",
    """SELECT
      |  CAST(count(CASE WHEN l_quantity <> 25
      |    THEN l_extendedprice / (l_quantity - 25) END) AS BIGINT)
      |    AS n_div_ok,
      |  CAST(count(CASE WHEN l_orderkey <= 1
      |    THEN l_orderkey * 9223372036854775807 END) AS BIGINT)
      |    AS n_mul_ok,
      |  CAST(count(TRY_CAST(CASE WHEN l_returnflag = 'R' THEN '1'
      |    ELSE l_returnflag END AS INT)) AS BIGINT) AS n_cast_ok
      |FROM lineitem""".stripMargin
  ) { (s, dir) =>
    Tables.lineitem(s, dir).agg(
      count(try_divide(col("l_extendedprice"), col("l_quantity") - 25))
        .as("n_div_ok"),
      count(try_multiply(col("l_orderkey"), lit(Long.MaxValue)))
        .as("n_mul_ok"),
      count(when(col("l_returnflag") === "R", lit("1"))
        .otherwise(col("l_returnflag")).try_cast(IntegerType.sql))
        .as("n_cast_ok"))
  }

  val all: Seq[Q] = Seq(collation, tryArith)
}
