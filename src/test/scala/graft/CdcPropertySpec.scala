package graft

import graft.cdc.{CdcConfig, CdcMerge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties of the CDC algebra (SURVEY.md §5.2.3): for
  * arbitrary generated prev/curr tables —
  *   apply(classify(prev, curr)) == curr        (full-extract semantics)
  *   classify(s, s) == all-unchanged            (idempotence)
  *   |I|+|U|+|N| == |curr| and |D| == |prev ∖ curr| (count reconciliation)
  * Small generated tables (≤ 40 rows, keys from a small domain to force
  * I/U/D/N collisions), 10 cases per property — Spark jobs are the cost.
  */
class CdcPropertySpec extends AnyFunSuite with SparkFixture {

  /** forAll via explicit seeds (scalatestplus bridge is not in the
    * offline cache): deterministic, reproducible cases. */
  private def forAllSeeded[A](gen: Gen[A], cases: Int = 10)(body: A => Unit): Unit =
    (0 until cases).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val cfg = CdcConfig(Seq("k"), Seq("status", "amount"))

  private val rowGen: Gen[(Long, String, Double)] = for {
    k <- Gen.choose(0L, 25L)
    status <- Gen.oneOf("O", "F", "P")
    amount <- Gen.choose(0, 9999).map(_ / 100.0)
  } yield (k, status, amount)

  /** distinct keys: a CDC extract has one row per key */
  private val tableGen: Gen[List[(Long, String, Double)]] =
    Gen.listOfN(40, rowGen).map(_.groupBy(_._1).values.map(_.head).toList)

  private def toDf(rows: List[(Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "status", "amount")
  }

  private val pairGen: Gen[(List[(Long, String, Double)], List[(Long, String, Double)])] =
    Gen.zip(tableGen, tableGen)

  test("apply ∘ classify reproduces the incoming extract") {
    forAllSeeded(pairGen) { case (prevRows, currRows) =>
      val prev = toDf(prevRows)
      val curr = toDf(currRows)
      val applied = CdcMerge.applyChanges(
        CdcMerge.classify(prev, curr, cfg, useXxhash64 = true), cfg)
      assert(applied.exceptAll(curr).count() === 0)
      assert(curr.exceptAll(applied).count() === 0)
    }
  }

  test("classify(s, s) marks everything unchanged") {
    forAllSeeded(tableGen) { rows =>
      val s = toDf(rows)
      val classified = CdcMerge.classify(s, s, cfg, useXxhash64 = true)
      assert(classified.filter(col(CdcMerge.OpCol) =!= CdcMerge.Unchanged)
        .count() === 0)
      assert(classified.count() === rows.size)
    }
  }

  test("count reconciliation: I+U+N = |curr|, D = |prev keys ∖ curr keys|") {
    forAllSeeded(pairGen) { case (prevRows, currRows) =>
      val classified = CdcMerge.classify(
        toDf(prevRows), toDf(currRows), cfg, useXxhash64 = true)
      val byOp = CdcMerge.counts(classified).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val iun = byOp.getOrElse("I", 0L) + byOp.getOrElse("U", 0L) +
        byOp.getOrElse("N", 0L)
      assert(iun === currRows.size.toLong)
      val currKeys = currRows.map(_._1).toSet
      assert(byOp.getOrElse("D", 0L) ===
        prevRows.map(_._1).count(k => !currKeys.contains(k)).toLong)
    }
  }
}
