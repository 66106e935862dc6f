package graft

import graft.ops.Salt
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join equivalence: salting must change the physical key
  * distribution, never the join result. */
class SaltSpec extends AnyFunSuite with SparkFixture {

  test("saltedJoin equals the plain equi-join") {
    val orders = Tables.orders(spark, Sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, Sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))

    val plain = orders.join(customer, "o_custkey")
      .select("o_orderkey", "c_mktsegment")
    val salted = Salt.saltedJoin(orders, customer, "o_custkey", n = 8)
      .select("o_orderkey", "c_mktsegment")

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("hotColdJoin equals the plain join (hot and cold paths partition exactly)") {
    val orders = Tables.orders(spark, Sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, Sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    // "hot" = the 10 most frequent customer keys, as a pre-pass would find
    val hot = orders.groupBy("o_custkey").count()
      .orderBy(col("count").desc, col("o_custkey")).limit(10)
      .select("o_custkey")

    val plain = orders.join(customer, "o_custkey")
      .select("o_orderkey", "c_mktsegment")
    val twoPath = Salt.hotColdJoin(orders, customer, "o_custkey", hot, n = 8)
      .select("o_orderkey", "c_mktsegment")

    assert(twoPath.count() === plain.count())
    assert(twoPath.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(twoPath).count() === 0)
  }

  test("salt spreads a hot key across all n buckets") {
    // a worst-case skew: every row has the same join key
    val hot = Tables.lineitem(spark, Sf)
      .select(lit(1L).as("k"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
    val salts = hot.withColumn("s", Salt.saltCol(hot, 8))
      .groupBy("s").count()
    assert(salts.count() === 8, "hot key not spread over all salt buckets")
    // roughly balanced: no bucket more than 3× the ideal share
    val max = salts.agg(org.apache.spark.sql.functions.max("count"))
      .collect()(0).getLong(0)
    assert(max <= 3 * hot.count() / 8)
  }
}
