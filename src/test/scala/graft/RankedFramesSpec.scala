package graft

import graft.ops.RankedFrames
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.ops.RankedFrames]] — the distributed global rank/ntile/
  * prefix-sum core. Laws: bit-equal to the single-partition window
  * formulation, invariant to the input's partitioning, and the plan
  * never contains a partition-less WindowExec over the data frame. */
class RankedFramesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // adversarial value set: heavy ties (v % 17), negatives, a unique key
  private def frame(n: Int, parts: Int) =
    spark.range(0, n).select(col("id").as("k"),
      ((col("id") * 37 % 17) - 5).as("v"))
      .repartition(parts, col("k"))

  test("withGlobalPosition matches row_number over a global window") {
    for (parts <- Seq(1, 7, 32)) {
      val df = frame(5000, parts)
      val got = RankedFrames.withGlobalPosition(df,
        Seq(col("v").desc, col("k")), "gpos")
      val want = df.withColumn("gpos",
        row_number().over(Window.orderBy(col("v").desc, col("k")))
          .cast("long"))
      assert(got.orderBy("k").collect().map(_.toSeq) ===
        want.orderBy("k").collect().map(_.toSeq),
        s"positions diverged at $parts input partitions")
    }
  }

  test("withGlobalNtile matches SQL ntile, including the uneven-bucket tail") {
    for ((n, buckets) <- Seq((5000, 10), (4999, 7), (10, 3), (2, 5))) {
      val df = frame(n, 13)
      val got = RankedFrames.withGlobalNtile(df,
        Seq(col("v").desc, col("k")), buckets, "b")
      val want = df.withColumn("b",
        ntile(buckets).over(Window.orderBy(col("v").desc, col("k"))))
      assert(got.orderBy("k").collect().map(_.toSeq) ===
        want.orderBy("k").collect().map(_.toSeq),
        s"ntile($buckets) diverged at n=$n")
    }
  }

  test("withGlobalCumSum matches the running-sum window and total") {
    val df = frame(5000, 11)
    val w = Window.orderBy(col("v").desc, col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = RankedFrames.withGlobalCumSum(df,
      Seq(col("v").desc, col("k")), col("v") + col("k"))
    val want = df
      .withColumn("cum", sum(col("v") + col("k")).over(w))
      .withColumn("total",
        sum(col("v") + col("k")).over(Window.partitionBy()))
    assert(got.orderBy("k").collect().map(_.toSeq) ===
      want.orderBy("k").collect().map(_.toSeq))
  }

  test("no partition-less WindowExec over the data; offsets stay broadcast") {
    val df = frame(20000, 32)
    val pos = RankedFrames.withGlobalPosition(df,
      Seq(col("v").desc, col("k")))
    val qe = pos.queryExecution
    // any empty-partition window may run only over the bounded per-pid
    // offsets frame (≤ shuffle.partitions rows), never the data
    qe.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }.foreach { w =>
      val cols = w.child.output.map(_.name)
      assert(cols.exists(_.startsWith("_rf_")) && !cols.contains("k"),
        s"partition-less window over the data frame: ${cols.mkString(",")}")
    }
    pos.collect() // AQE finalize
    assert(pos.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      "per-partition offsets must broadcast, never shuffle the data side")
  }

  test("positions are exact on the empty and single-row edges") {
    val empty = spark.range(0).select(col("id").as("k"), col("id").as("v"))
    assert(RankedFrames.withGlobalPosition(empty,
      Seq(col("v"), col("k"))).count() === 0)
    val one = Seq((1L, 9L)).toDF("k", "v")
    val got = RankedFrames.withGlobalNtile(one, Seq(col("v"), col("k")), 4)
      .select("bucket").as[Int].head()
    assert(got === 1)
  }
}
