package graft

import graft.ops.GovernOps
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Governance pillar: decontamination, repetition scoring, k-anonymity.
  * Oracle parity is the driver's job; these specs pin the SEMANTIC
  * invariants the SQL can't express (eval isolation, brute-force parity,
  * suppression guarantee) and the scale-plan shape (broadcast semi-join
  * on the eval side). */
class GovernOpsSpec extends AnyFunSuite with SparkFixture
    with AdaptiveSparkPlanHelper {

  test("q_decontaminate: counts match a brute-force pairwise check") {
    // independent ground truth: per-doc 4-gram sets in Scala, contaminated
    // = train doc intersecting the union of eval doc grams
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
    def grams(t: Array[String]): Set[String] =
      if (t.length < 4) Set.empty
      else (0 to t.length - 4).map(i => t.slice(i, i + 4).mkString(" ")).toSet
    val evalGrams = docs.filter(_._1 % 97 == 0).flatMap(d => grams(d._3)).toSet
    val expected = docs.filter(_._1 % 97 != 0)
      .filter(d => grams(d._3).exists(evalGrams))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap

    val got = GovernOps.decontaminate.fn(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got.filter(_._2 > 0) === expected,
      "per-lang contaminated counts must equal brute force")
    // eval docs are never counted as training rows
    val nTrainTotal = GovernOps.decontaminate.fn(spark, Sf)
      .agg(sum("n_train")).collect()(0).getLong(0)
    val nEval = docs.count(_._1 % 97 == 0)
    assert(nTrainTotal === docs.length - nEval)
  }

  test("q_decontaminate plans a broadcast semi-join (eval side is the small side)") {
    val df = GovernOps.decontaminate.fn(spark, Sf)
    df.collect()
    val exec = df.queryExecution.executedPlan
    def leaves(p: SparkPlan): Seq[String] = collect(p) { case n => n.nodeName }
    assert(leaves(exec).exists(n => n.contains("BroadcastHashJoin")),
      s"expected a broadcast semi-join probe, plan:\n$exec")
  }

  test("q_text_repetition: per-doc dup arithmetic matches direct computation") {
    val raw = Tables.documents(spark, Sf).select("lang", "text").collect()
    val expected = raw.groupBy(_.getString(0)).view.mapValues { rows =>
      val perDoc = rows.map { r =>
        val t = r.getString(1).split(" ")
        (t.length.toLong, (t.length - t.distinct.length).toLong)
      }
      (perDoc.length.toLong, perDoc.map(_._1).sum, perDoc.map(_._2).sum,
        perDoc.count { case (n, d) => 2 * d > n }.toLong)
    }.toMap
    val got = GovernOps.textRepetition.fn(spark, Sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expected)
  }

  test("q_anonymize: publishes exactly the k-anonymous groups, pseudonyms 1:1") {
    // ground truth straight off the raw table
    val raw = Tables.customer(spark, Sf)
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("b"))
      .count().collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val published = GovernOps.anonymize.fn(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(published.keySet === raw.filter(_._2 >= 5).keySet,
      "published set must be exactly the groups with n >= 5")
    published.foreach { case (k, (n, pseudo)) =>
      assert(n === raw(k))
      // names are unique per customer, so pseudonym count == group size
      assert(pseudo === n, s"$k: md5 pseudonymization fused identities")
    }
    // sf0.001's customer table is too small for any k=5 group; the gate
    // itself is still exercised (suppressed = all), and larger SFs
    // publish non-empty (checked by the driver's oracle at sf0.01)
    assert(raw.nonEmpty)
  }
}
