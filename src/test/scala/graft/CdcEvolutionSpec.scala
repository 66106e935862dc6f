package graft

import graft.cdc.{CdcConfig, CdcMerge}
import graft.streaming.CdcBucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CDC schema evolution ([[CdcBucketed.alignStateToConfig]]): upstream
  * adds or drops value columns mid-stream; the merge must adapt without
  * re-bootstrapping the state, without spurious change-feed churn, and
  * without losing the shuffle-free state-side plan.
  */
class CdcEvolutionSpec extends AnyFunSuite with SparkFixture {

  private def ops(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.select(col("id"), col(CdcMerge.OpCol)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("adding a value column: null backfill, untouched rows stay N, no state shuffle") {
    import spark.implicits._
    val cfgV1 = CdcConfig(Seq("id"), Seq("name", "qty"))
    val cfgV2 = CdcConfig(Seq("id"), Seq("name", "qty", "email"))
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "name", "qty")
    CdcBucketed.writeState(v1, cfgV1, "evo_add_state", buckets = 4)

    // batch 2 arrives with the evolved schema: id 1 untouched (email
    // still null), id 2 updated, id 3 gone, id 4 new
    val batch2 = Seq(
      (1L, "a", 10L, Option.empty[String]),
      (2L, "b", 25L, Some("x@y")),
      (4L, "d", 1L, Some("d@z")))
      .toDF("id", "name", "qty", "email")
    val classified = CdcBucketed.classifyAgainstState(
      spark, "evo_add_state", batch2, cfgV2)
    assert(ops(classified) ===
      Map(1L -> "N", 2L -> "U", 3L -> "D", 4L -> "I"),
      "an unchanged row must NOT become a spurious U after evolution")

    // the evolution alignment is map-side: still exactly one exchange
    // (the incoming side), state scan still bucket-aware — same probe as
    // CdcBucketedSpec, on the finalized AQE plan's Final section
    val probe = CdcBucketed.classifyAgainstState(
      spark, "evo_add_state", batch2, cfgV2)
    probe.count() // finalize AQE
    val plan = probe.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"evolution must not cost the state side its shuffle-free plan:\n$plan")
    assert(plan.contains("Bucketed: true"), s"state scan lost buckets:\n$plan")

    // full merge commits the evolved schema; old rows carry null email
    val feed = CdcBucketed.mergeIntoState(
      spark, "evo_add_state", batch2, cfgV2, batchId = 2L, buckets = 4)
    assert(feed.count() === 3) // I + U + D
    val state = spark.table("evo_add_state")
      .select("id", "name", "qty", "email").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
        Option(r.getString(3)))).toMap
    assert(state === Map(
      1L -> (("a", 10L, None)),
      2L -> (("b", 25L, Some("x@y"))),
      4L -> (("d", 1L, Some("d@z")))))
  }

  test("dropping a value column: config is authoritative, equal rows stay N") {
    import spark.implicits._
    val cfgWide = CdcConfig(Seq("id"), Seq("name", "qty"))
    val cfgNarrow = CdcConfig(Seq("id"), Seq("name"))
    val wide = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "qty")
    CdcBucketed.writeState(wide, cfgWide, "evo_drop_state", buckets = 4)

    val batch = Seq((1L, "a"), (2L, "zz")).toDF("id", "name")
    val classified = CdcBucketed.classifyAgainstState(
      spark, "evo_drop_state", batch, cfgNarrow)
    assert(ops(classified) === Map(1L -> "N", 2L -> "U"),
      "dropping qty must not flag rows whose surviving columns are equal")

    CdcBucketed.mergeIntoState(
      spark, "evo_drop_state", batch, cfgNarrow, batchId = 2L, buckets = 4)
    assert(spark.table("evo_drop_state").columns.toSeq ===
      Seq("id", "name", CdcMerge.KeyHash, CdcMerge.NonKeyHash))
  }

  test("key-column evolution is rejected loudly") {
    import spark.implicits._
    val cfgV1 = CdcConfig(Seq("id"), Seq("name"))
    val v1 = Seq((1L, "a")).toDF("id", "name")
    CdcBucketed.writeState(v1, cfgV1, "evo_key_state", buckets = 2)
    val batch = Seq((1L, "r1", "a")).toDF("id", "region", "name")
    val cfgBadKey = CdcConfig(Seq("id", "region"), Seq("name"))
    val e = intercept[IllegalArgumentException] {
      CdcBucketed.classifyAgainstState(spark, "evo_key_state", batch, cfgBadKey)
    }
    assert(e.getMessage.contains("re-bootstrap"))
  }

  test("key REMOVAL and REORDER are rejected too (stale keyhash never reused)") {
    import spark.implicits._
    // two-key state: the persisted keyhash is computed over (id, region)
    val cfgV1 = CdcConfig(Seq("id", "region"), Seq("name"))
    val v1 = Seq((1L, "r1", "a"), (2L, "r2", "b")).toDF("id", "region", "name")
    CdcBucketed.writeState(v1, cfgV1, "evo_key2_state", buckets = 2)
    val batch = Seq((1L, "r1", "a")).toDF("id", "region", "name")
    // removal: config demotes region to a value column — every cfg key
    // still exists in the state, so only the key-provenance check can
    // catch the stale hash
    val removed = CdcConfig(Seq("id"), Seq("region", "name"))
    val e1 = intercept[IllegalArgumentException] {
      CdcBucketed.classifyAgainstState(spark, "evo_key2_state", batch, removed)
    }
    assert(e1.getMessage.contains("re-bootstrap"), e1.getMessage)
    // reorder: same key SET, different order — a concat-style keyhash is
    // order-sensitive, so this is stale too
    val reordered = CdcConfig(Seq("region", "id"), Seq("name"))
    val e2 = intercept[IllegalArgumentException] {
      CdcBucketed.classifyAgainstState(spark, "evo_key2_state", batch, reordered)
    }
    assert(e2.getMessage.contains("re-bootstrap"), e2.getMessage)
    // and the untouched config still classifies fine
    assert(CdcBucketed.classifyAgainstState(
      spark, "evo_key2_state", batch, cfgV1).count() === 2)
  }

  test("evolved column missing from the batch is rejected loudly") {
    import spark.implicits._
    val cfgV1 = CdcConfig(Seq("id"), Seq("name"))
    CdcBucketed.writeState(Seq((1L, "a")).toDF("id", "name"), cfgV1,
      "evo_miss_state", buckets = 2)
    val cfgV2 = CdcConfig(Seq("id"), Seq("name", "email"))
    val batchWithout = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      CdcBucketed.classifyAgainstState(
        spark, "evo_miss_state", batchWithout, cfgV2)
    }
  }
}
