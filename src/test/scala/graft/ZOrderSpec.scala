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

  // ----------------------------------------------------------------
  // ZOrderN — the 2..8-dim generalization
  // ----------------------------------------------------------------

  private def modelN(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    var z = 0L
    for (d <- 0 until n; i <- 0 until bits)
      z |= ((vals(d) >> i) & 1L) << (i * n + d)
    z
  }

  test("zorderN matches the model and round-trips at 3 and 5 dims") {
    import spark.implicits._
    val triples = for {
      a <- Seq(0L, 1L, 7L, 15L); b <- Seq(0L, 9L, 15L); c <- Seq(3L, 15L)
    } yield (a, b, c)
    val got3 = triples.toDF("a", "b", "c")
      .withColumn("z", ZOrderExprs.zOrderN(
        Seq(col("a"), col("b"), col("c")), 4))
      .as[(Long, Long, Long, Long)].collect()
    got3.foreach { case (a, b, c, z) =>
      assert(z === modelN(Seq(a, b, c), 4), s"($a,$b,$c)")
      assert(ZOrderExprs.unpackN(z, 4, 3, 0) === a)
      assert(ZOrderExprs.unpackN(z, 4, 3, 1) === b)
      assert(ZOrderExprs.unpackN(z, 4, 3, 2) === c)
    }
    val z5 = Seq((1L, 2L, 3L, 4L, 5L)).toDF("a", "b", "c", "d", "e")
      .select(ZOrderExprs.zOrderN(
        Seq(col("a"), col("b"), col("c"), col("d"), col("e")), 3))
      .head.getLong(0)
    (0 until 5).zip(Seq(1L, 2L, 3L, 4L, 5L)).foreach { case (d, v) =>
      assert(ZOrderExprs.unpackN(z5, 3, 5, d) === v)
    }
  }

  test("zorderN at 2 dims is bit-identical to zorder2") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 2L), (200L, 55L), (255L, 255L))
    val both = pairs.toDF("x", "y").select(
      ZOrderExprs.zOrder2(col("x"), col("y"), 8).as("z2"),
      ZOrderExprs.zOrderN(Seq(col("x"), col("y")), 8).as("zn"))
      .as[(Long, Long)].collect()
    both.foreach { case (z2, zn) => assert(z2 === zn) }
  }

  test("zordern registered as SQL function; matches the Column API") {
    val viaSql = spark.sql("SELECT zordern(array(3, 5, 9), 4) AS z")
      .head.getLong(0)
    assert(viaSql === modelN(Seq(3L, 5L, 9L), 4))
    val e = intercept[Exception] {
      spark.sql("SELECT zordern(sequence(1, 3), 4)").collect()
    }
    assert(e.getMessage.contains("inline array"),
      s"runtime-sized arrays must be rejected at analysis: ${e.getMessage}")
  }

  test("zorderN rejects NULL coordinates and out-of-range values loudly") {
    import spark.implicits._
    val nullE = intercept[Exception] {
      Seq((Some(1L), Option.empty[Long], Some(2L))).toDF("a", "b", "c")
        .select(ZOrderExprs.zOrderN(
          Seq(col("a"), col("b"), col("c")), 4)).collect()
    }
    assert(nullE.getMessage != null)
    val rangeE = intercept[Exception] {
      Seq((16L, 0L, 0L)).toDF("a", "b", "c")
        .select(ZOrderExprs.zOrderN(
          Seq(col("a"), col("b"), col("c")), 4)).collect()
    }
    assert(rangeE.getMessage != null)
  }

  test("3-dim z-sort bounds ALL THREE dims where lexicographic serves one") {
    // 16 simulated files; a point predicate on the THIRD column — the
    // dimension a lexicographic (a, b, c) sort cannot prune at all
    val df = Tables.lineitem(spark, Sf)
      .select((col("l_partkey") % 64).as("a"),
        (col("l_suppkey") % 64).as("b"),
        (col("l_orderkey") % 64).as("c"))
    val n = df.count()
    def filesTouched(ordered: org.apache.spark.sql.DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window.orderBy("ord")
      ordered.withColumn("rn", row_number().over(w))
        .withColumn("file", ((col("rn") - 1) * 16 / n).cast("long"))
        .groupBy("file").agg(min("c").as("lo"), max("c").as("hi"))
        .filter(col("lo") <= 7 && col("hi") >= 7).count()
    }
    val zTouched = filesTouched(df.withColumn("ord",
      ZOrderExprs.zOrderN(Seq(col("a"), col("b"), col("c")), 6)))
    val lexTouched = filesTouched(df.withColumn("ord",
      col("a") * 4096 + col("b") * 64 + col("c")))
    assert(zTouched < lexTouched,
      s"3-dim z-order touched $zTouched files, lexicographic $lexTouched")
  }

  test("SnapshotLog.optimize z-orders THREE cluster columns (prune on any dim)") {
    val dir = java.nio.file.Files.createTempDirectory("zn-log").toString
    import spark.implicits._
    val rows = (0 until 4096).map { i =>
      (i.toLong, (i * 37 % 64).toLong, (i * 11 % 64).toLong,
        (i * 53 % 64).toLong)
    }
    // many small files so optimize has something to rewrite
    val df = rows.toDF("id", "a", "b", "c").repartition(8)
    graft.sources.SnapshotLog.commit(spark, dir, df)
    val v = graft.sources.SnapshotLog.optimize(spark, dir,
      targetFiles = 8, clusterBy = Seq("a", "b", "c"), zorder = true)
    val out = graft.sources.SnapshotLog.read(spark, dir, Some(v))
    // identity: same multiset of rows
    assert(out.count() === 4096)
    assert(out.exceptAll(df).isEmpty && df.exceptAll(out).isEmpty)
    // locality: for EACH dim, a point predicate must avoid most files
    val withFile = out.withColumn("f", input_file_name())
    Seq("a", "b", "c").foreach { dim =>
      val touched = withFile.groupBy("f")
        .agg(min(dim).as("lo"), max(dim).as("hi"))
        .filter(col("lo") <= 7 && col("hi") >= 7).count()
      assert(touched < 8, s"dim $dim: every file intersects the probe")
    }
  }
}
