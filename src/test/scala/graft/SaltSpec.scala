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

  test("AQE skew-join rescue engages: skewed SMJ partitions split at runtime") {
    // the automatic complement to manual salting: prove Spark's own
    // OptimizeSkewedJoin actually fires on an unsalted skewed join when
    // the thresholds are sized to the fixture (the prod knobs, scaled
    // down), by reading the final adaptive plan — not by trusting docs
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption
        .flatMap(Option(_))).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // 100k rows, 90% on one key — the hot partition dwarfs the rest
      val left = spark.range(0, 100000)
        .select(when(col("id") % 10 =!= 0, 7L).otherwise(col("id") % 97)
          .as("k"), col("id").as("payload"))
      val right = spark.range(0, 97).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))
      val joined = left.join(right, "k")
      // drive joined's OWN execution (count() would plan separately and
      // leave this AdaptiveSparkPlan unexecuted / non-final)
      assert(joined.collect().length === 100000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not engage; plan:\n${finalPlan.take(2000)}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
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
