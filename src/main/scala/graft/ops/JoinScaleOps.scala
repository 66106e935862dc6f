package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join techniques that only matter at scale — salting for skewed keys
  * and bloom-filter pre-pruning for selective dims — each expressed so the
  * RESULT is bit-identical to the plain join (the technique changes the
  * plan, never the semantics), which is exactly what makes them
  * oracle-checkable against the plain-SQL formulation.
  */
object JoinScaleOps {

  private val NSalt = 8

  /** Skew-salted fact→dim join: revenue per order priority. The fact side
    * derives a deterministic salt in [0, 8) from non-join columns; the
    * dim side replicates each row across all 8 salts (a generate, cheap —
    * you salt the SMALL side's copies, never the fact). The join key
    * becomes (orderkey, salt), splitting any hot orderkey's rows across 8
    * reducers instead of one straggler task. Uniform keys here make it a
    * no-op semantically — which is the point: the oracle proves
    * salting-then-unsalting is invisible to results. (AQE's
    * skewedJoin handles MODERATE skew by splitting partitions; explicit
    * salting is the tool when a single KEY exceeds one partition. The
    * production two-path refinement — salt ONLY detected hot keys — is
    * [[Salt.hotColdJoin]].) The dim side carries a SHUFFLE_HASH hint:
    * salted keys are unique per (key, salt) by construction, so the
    * sort-merge's two sorts buy nothing. */
  val joinSkew: Q = Q.checked(
    "q_join_skew",
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(24,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  ) { (s, dir) =>
    val fact = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        pmod(xxhash64(col("l_partkey"), col("l_suppkey"),
          col("l_linenumber")), lit(NSalt)).as("salt"))
    val dim = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(expr(s"sequence(0, ${NSalt - 1})")))
    fact.join(dim.hint("shuffle_hash"),
      fact("l_orderkey") === dim("o_orderkey")
        && fact("salt") === dim("salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(24, 6))).cast(DoubleType).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** Bloom-pruned selective join: urgent-order revenue. A bloom filter
    * built over the FILTERED dim keys (scalar subquery, a few KB) guards
    * the fact scan, so at 100 TB the shuffle receives only probable
    * matches (~3% here) instead of every fact row; the exact join then
    * removes bloom false positives, keeping results exact — why the plain
    * join is a valid oracle. Uses graft's `bloom_agg`/`bloom_contains`
    * SQL surface over Spark's internal runtime-filter expressions
    * ([[graft.functions.GraftExtensions]]). */
  val joinBloom: Q = Q.checked(
    "q_join_bloom",
    """WITH dim AS (SELECT o_orderkey FROM orders
      |            WHERE o_orderpriority = '1-URGENT')
      |SELECT count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
      |    AS DECIMAL(24,6))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN dim ON l_orderkey = o_orderkey""".stripMargin
  ) { (s, dir) =>
    // bloom_contains needs its filter as a scalar subquery (engine rule),
    // which only SQL text can express — views get a per-invocation unique
    // name and are dropped right after analysis (s.sql resolves the plan
    // eagerly), so concurrent invocations on a shared session never read
    // each other's tables
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val (ordV, liV) = (s"g_bloom_orders_$tag", s"g_bloom_lineitem_$tag")
    Tables.orders(s, dir).createOrReplaceTempView(ordV)
    Tables.lineitem(s, dir).createOrReplaceTempView(liV)
    try s.sql(
      s"""WITH dim AS (SELECT o_orderkey FROM $ordV
         |             WHERE o_orderpriority = '1-URGENT')
         |SELECT count(*) AS n,
         |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
         |    AS DECIMAL(24,6))) AS DOUBLE) AS revenue
         |FROM (SELECT l_orderkey, l_extendedprice, l_discount
         |      FROM $liV
         |      WHERE bloom_contains(
         |        (SELECT bloom_agg(o_orderkey) FROM dim), l_orderkey)) l
         |JOIN dim ON l.l_orderkey = dim.o_orderkey""".stripMargin)
    finally {
      s.catalog.dropTempView(ordV)
      s.catalog.dropTempView(liV)
    }
  }

  val all: Seq[Q] = Seq(joinSkew, joinBloom)
}
