package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.2-G): UNION ALL / UNION / INTERSECT /
  * EXCEPT over deterministic order-derived sets.
  *
  * INTERSECT/EXCEPT plan as left-semi/left-anti hash joins over distinct
  * keys — one shuffle each, no sort until the bounded checked output.
  */
object SetOps {

  private def custkeysOfYear(s: SparkSession, dir: String, yr: Int): DataFrame =
    Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === yr)
      .select("o_custkey")

  /** UNION ALL of two disjointly-filtered order bands, re-aggregated. */
  val unionAll: Q = Q.checked(
    "q_union_all",
    s"""SELECT band, o_orderstatus, count(*) AS n, ${dsumSql("o_totalprice")} AS sum_price
       |FROM (
       |  SELECT 'hi' AS band, o_orderstatus, o_totalprice
       |  FROM orders WHERE o_totalprice > 300000
       |  UNION ALL
       |  SELECT 'lo' AS band, o_orderstatus, o_totalprice
       |  FROM orders WHERE o_totalprice < 20000)
       |GROUP BY band, o_orderstatus ORDER BY band, o_orderstatus""".stripMargin
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val hi = o.filter(col("o_totalprice") > 300000)
      .select(lit("hi").as("band"), col("o_orderstatus"), col("o_totalprice"))
    val lo = o.filter(col("o_totalprice") < 20000)
      .select(lit("lo").as("band"), col("o_orderstatus"), col("o_totalprice"))
    hi.unionByName(lo)
      .groupBy("band", "o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("band", "o_orderstatus")
  }

  /** UNION (distinct) of two overlapping customer-key sets. */
  val unionDistinct: Q = Q.checked(
    "q_union_distinct",
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |UNION
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |ORDER BY o_custkey""".stripMargin
  ) { (s, dir) =>
    custkeysOfYear(s, dir, 1995)
      .union(custkeysOfYear(s, dir, 1996))
      .distinct()
      .orderBy("o_custkey")
  }

  /** Customers active in BOTH years (INTERSECT = distinct ∩). */
  val intersect: Q = Q.checked(
    "q_intersect",
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |ORDER BY o_custkey""".stripMargin
  ) { (s, dir) =>
    custkeysOfYear(s, dir, 1995)
      .intersect(custkeysOfYear(s, dir, 1996))
      .orderBy("o_custkey")
  }

  /** Customers active in 1995 but not 1996 (EXCEPT = distinct ∖). */
  val except: Q = Q.checked(
    "q_except",
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
      |ORDER BY o_custkey""".stripMargin
  ) { (s, dir) =>
    custkeysOfYear(s, dir, 1995)
      .except(custkeysOfYear(s, dir, 1996))
      .orderBy("o_custkey")
  }

  /** Multiset difference (EXCEPT ALL): a customer with three 1995 orders
    * and one 1996 order survives TWICE — bag semantics the distinct
    * variant destroys (the difference that matters when rows are events,
    * not members). Output grouped with multiplicities so the bag
    * structure is visible and the hash total-ordered. Spark `exceptAll`
    * plans the same hash-agg + generate shape both engines use — no
    * join, one shuffle on the value. */
  val exceptAll: Q = Q.checked(
    "q_except_all",
    """SELECT o_custkey, count(*) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    custkeysOfYear(s, dir, 1995)
      .exceptAll(custkeysOfYear(s, dir, 1996))
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .orderBy("o_custkey")
  }

  /** Multiset intersection (INTERSECT ALL): min(multiplicity) per side —
    * "how many order-events repeat across both years", not just which
    * customers do. */
  val intersectAll: Q = Q.checked(
    "q_intersect_all",
    """SELECT o_custkey, count(*) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, dir) =>
    custkeysOfYear(s, dir, 1995)
      .intersectAll(custkeysOfYear(s, dir, 1996))
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .orderBy("o_custkey")
  }

  val all: Seq[Q] = Seq(unionAll, unionDistinct, intersect, except,
    exceptAll, intersectAll)
}
