package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vector expressions vs the built-in `aggregate()` HOF folds they
  * replace: results must be BIT-IDENTICAL (same left-fold order), not just
  * close — the DuckDB oracles hash-compare full-precision doubles. */
class VectorExprsSpec extends AnyFunSuite with SparkFixture {

  private def e = Tables.embeddings(spark, Sf)

  test("DotVec / Norm2 / DotLit match the interpreted aggregate() folds bit-for-bit") {
    val v0 = e.filter(col("vec_id") === 0).select(col("embedding").as("e0"))
    val probe = v0.head().getSeq[Float](0).map(_.toDouble).toArray
    val both = e.crossJoin(broadcast(v0))
      .withColumn("dot_hof", expr(
        """aggregate(zip_with(embedding, e0,
          |(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
          |CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))
      .withColumn("dot_native", VectorExprs.dotVec(col("embedding"), col("e0")))
      .withColumn("dot_lit", VectorExprs.dotLit(col("embedding"), probe))
      .withColumn("n2_hof", expr(
        """aggregate(embedding, CAST(0 AS DOUBLE),
          |(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""".stripMargin))
      .withColumn("n2_native", VectorExprs.norm2(col("embedding")))
    // === on doubles is bitwise here: both engines produce non-NaN finite sums
    assert(both.filter(col("dot_hof") =!= col("dot_native")).count() === 0)
    assert(both.filter(col("dot_hof") =!= col("dot_lit")).count() === 0)
    assert(both.filter(col("n2_hof") =!= col("n2_native")).count() === 0)
  }

  test("NearestCentroid matches min(struct(d2, list_id)) argmin semantics") {
    val cents = graft.sim.Ivf.centroids(e, "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val native = graft.sim.Ivf.assign(e,
        graft.sim.Ivf.centroids(e, "embedding", "label"), "vec_id", "embedding")
      .select("vec_id", "list_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: driver-side argmin with the same fold order + tie rule
    val ref = e.select("vec_id", "embedding").collect().map { r =>
      val v = r.getSeq[Float](1).toArray
      val best = cents.map { case (lid, c) =>
        var d2 = 0.0
        var i = 0
        while (i < c.length) {
          val d = v(i).toDouble - c(i); d2 += d * d; i += 1
        }
        (d2, lid)
      }.min
      r.getLong(0) -> best._2
    }.toMap
    assert(native === ref)
    assert(native.values.toSet.subsetOf(cents.map(_._1).toSet))
  }

  test("expressions stay inside WholeStageCodegen (no fallback, no giant unroll)") {
    val df = e.withColumn("d", VectorExprs.dotVec(col("embedding"), col("embedding")))
      .withColumn("n", VectorExprs.norm2(col("embedding")))
      .select(sum(col("d") + col("n")))
    // AQE wraps stages in QueryStageExec whose children are opaque to
    // plan.exists — turn it off for this plan-shape assertion only.
    // fallback=false: a janino compile error must FAIL here, not silently
    // drop to interpreted execution (which is how a package-private
    // badLength helper once shipped broken codegen past a green suite)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val plan = df.queryExecution.executedPlan
      assert(plan.exists(_.isInstanceOf[WholeStageCodegenExec]),
        s"expected WholeStageCodegen in:\n$plan")
      // and the generated source stays small — the whole point vs unrolling
      val cg = org.apache.spark.sql.execution.debug.codegenString(plan)
      assert(cg.length < 200000, s"generated code unexpectedly large: ${cg.length}")
      df.collect() // force compile + run
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.codegen.fallback", "true")
    }
  }

  test("length mismatch THROWS instead of computing a partial dot") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType), nullable = true),
      StructField("b", ArrayType(FloatType), nullable = true)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(Seq(1.0f, 2.0f), Seq(1.0f))), schema)
    // a truncated embedding must surface as an error, not a plausible
    // partial result (silent truncation hides data corruption)
    val eVec = intercept[Exception] {
      df.select(VectorExprs.dotVec(col("a"), col("b"))).collect()
    }
    assert(eVec.getMessage.contains("length mismatch")
      || Option(eVec.getCause).exists(_.getMessage.contains("length mismatch")))
    val eLit = intercept[Exception] {
      df.select(VectorExprs.dotLit(col("a"), Array(1.0))).collect()
    }
    assert(eLit.getMessage.contains("length mismatch")
      || Option(eLit.getCause).exists(_.getMessage.contains("length mismatch")))
    val eCent = intercept[Exception] {
      df.select(VectorExprs.nearestCentroid(col("a"),
        Array(Array(1.0)), Array(0L))).collect()
    }
    assert(eCent.getMessage.contains("length mismatch")
      || Option(eCent.getCause).exists(_.getMessage.contains("length mismatch")))
  }

  test("null array yields null; interpreted eval path agrees with codegen") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("v", ArrayType(FloatType), nullable = true)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(Seq(1.0f, 2.0f)), Row(null)), schema)
    val out = df.select(
      VectorExprs.norm2(col("v")).as("n"),
      VectorExprs.dotLit(col("v"), Array(0.5, 0.25)).as("d")).collect()
    assert(out(0).getDouble(0) === 5.0 && out(0).getDouble(1) === 1.0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
    // interpreted path (Expression.eval) — exercised directly
    val ex = VectorExprs.Norm2(org.apache.spark.sql.graftshim.ColumnBridge
      .expression(col("v")))
    assert(ex.nullable)
  }
}
