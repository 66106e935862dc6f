package graft

import graft.functions.ZOrderExprs
import graft.ops.LayoutOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.ZOrderExprs.ZOrder2]]: codegen/interpreted parity,
  * round-trip, range policy, SQL registration, and the locality guarantee
  * q_zorder exists to demonstrate. */
class ZOrderSpec extends AnyFunSuite with SparkFixture {

  private def model(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L)((z, i) =>
      z | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1))

  test("zorder2 matches the bit-interleave model (codegen path)") {
    import spark.implicits._
    val pairs = for {
      x <- Seq(0L, 1L, 2L, 127L, 128L, 255L)
      y <- Seq(0L, 1L, 63L, 200L, 255L)
    } yield (x, y)
    val got = pairs.toDF("x", "y")
      .withColumn("z", ZOrderExprs.zOrder2(col("x"), col("y"), 8))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === model(x, y, 8), s"($x,$y)")
      assert(ZOrderExprs.unpack(z, 8, 0) === x)
      assert(ZOrderExprs.unpack(z, 8, 1) === y)
    }
  }

  test("zorder2 registered as SQL function; wide-bits round-trip") {
    val z = spark.sql("SELECT zorder2(123456, 654321, 20) AS z")
      .head.getLong(0)
    assert(ZOrderExprs.unpack(z, 20, 0) === 123456L)
    assert(ZOrderExprs.unpack(z, 20, 1) === 654321L)
  }

  test("out-of-range input throws instead of silently masking") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((256L, 0L)).toDF("x", "y")
        .select(ZOrderExprs.zOrder2(col("x"), col("y"), 8)).collect()
    }
    assert(e.getMessage != null)
  }

  test("q_zorder: cells are contiguous z-ranges and tight 64x64 boxes") {
    val rows = LayoutOps.zorder.fn(spark, Sf).collect()
    assert(rows.nonEmpty && rows.length <= 16)
    rows.foreach { r =>
      val cell = r.getLong(0)
      assert(r.getLong(2) >= cell * 4096 && r.getLong(3) < (cell + 1) * 4096,
        s"cell $cell z-range")
      // the locality payoff: BOTH dimensions bounded in every cell,
      // which is what makes min/max footer pruning work on either column
      assert(r.getLong(5) - r.getLong(4) <= 63, s"cell $cell px box")
      assert(r.getLong(7) - r.getLong(6) <= 63, s"cell $cell ps box")
    }
    // total count conservation
    assert(rows.map(_.getLong(1)).sum ===
      Tables.lineitem(spark, Sf).count())
  }

  test("z-sort beats lexicographic sort for second-column pruning") {
    // simulate 16 equal files under each layout; count files whose
    // [min,max] ps-range intersects a point predicate ps = 7. The second
    // dimension must span the full 0..255 domain for locality to matter
    // (sf0.001 suppkey%256 is only 1..10 — ANY 64-wide box covers it all),
    // so the probe dimension is orderkey-derived
    val df = Tables.lineitem(spark, Sf)
      .select((col("l_partkey") % 256).as("px"), (col("l_orderkey") % 256).as("ps"))
    val n = df.count()
    def filesTouched(ordered: org.apache.spark.sql.DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window.orderBy("ord")
      ordered.withColumn("rn", row_number().over(w))
        .withColumn("file", ((col("rn") - 1) * 16 / n).cast("long"))
        .groupBy("file").agg(min("ps").as("lo"), max("ps").as("hi"))
        .filter(col("lo") <= 7 && col("hi") >= 7).count()
    }
    val zTouched = filesTouched(df.withColumn("ord",
      ZOrderExprs.zOrder2(col("px"), col("ps"), 8)))
    val lexTouched = filesTouched(df.withColumn("ord",
      col("px") * 256 + col("ps")))
    assert(zTouched < lexTouched,
      s"z-order touched $zTouched files, lexicographic $lexTouched")
  }
}
