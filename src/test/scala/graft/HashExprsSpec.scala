package graft

import graft.functions.HashExprs
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Native signature expressions vs driver-side ground truth built on the
  * same XXH64 primitives — exact equality, plus the structural properties
  * the LSH layers rely on. */
class HashExprsSpec extends AnyFunSuite with SparkFixture {

  private def xxh(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  /** Chain-hash of one n-token shingle: left-fold of per-token hashes. */
  private def chain(toks: Seq[String]): Long =
    toks.tail.foldLeft(xxh(toks.head))((h, t) => XXH64.hashLong(xxh(t), h))

  private def refSig(toks: Seq[String], n: Int, k: Int): Seq[Long] =
    (0 until k).map { j =>
      toks.sliding(n).filter(_.length == n)
        .foldLeft(Long.MaxValue)((m, sh) =>
          math.min(m, XXH64.hashLong(chain(sh), j)))
    }

  test("MinHashSig matches a driver-side reference on real documents (n=3 and n=1)") {
    for (n <- Seq(3, 1)) {
      val k = 8
      val rows = Tables.documents(spark, Sf).limit(50)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("sig", HashExprs.minHashSig(col("toks"), n, k))
        .collect()
      rows.foreach { r =>
        val got = r.getSeq[Long](2)
        assert(got === refSig(r.getSeq[String](1), n, k),
          s"doc ${r.getLong(0)} n=$n")
      }
    }
  }

  test("SimHash64 matches a driver-side reference; empty array is 0") {
    import spark.implicits._
    val docs = Seq(
      Seq("scan", "row", "scan"), // multiplicity votes twice
      Seq("join", "merge"),
      Seq.empty[String]).toDF("toks")
      .withColumn("sig", HashExprs.simHash64(col("toks")))
    val got = docs.select("sig").as[Long].collect()
    def ref(toks: Seq[String]): Long = {
      val votes = new Array[Int](64)
      toks.foreach { t =>
        val h = xxh(t)
        (0 until 64).foreach(b =>
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1))
      }
      (0 until 64).foldLeft(0L)((s, b) => if (votes(b) > 0) s | (1L << b) else s)
    }
    assert(got(0) === ref(Seq("scan", "row", "scan")))
    assert(got(1) === ref(Seq("join", "merge")))
    assert(got(2) === 0L)
  }

  test("signatures respect set semantics: identical shingle sets, identical sigs") {
    import spark.implicits._
    // n=1: each element is its own shingle, so element order/multiplicity
    // must not affect the signature (min over a multiset = min over set)
    val df = Seq(
      (1L, Seq("a b c", "b c d")),
      (2L, Seq("b c d", "a b c", "b c d")), // same set, reordered + dup
      (3L, Seq("x y z"))).toDF("id", "shingles")
      .withColumn("sig", HashExprs.minHashSig(col("shingles"), 1, 16))
    val sigs = df.select("id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
    // shorter than n tokens → sentinel in every slot
    val empty = Seq((9L, Seq("only", "two"))).toDF("id", "toks")
      .withColumn("sig", HashExprs.minHashSig(col("toks"), 3, 4))
      .select("sig").collect()(0).getSeq[Long](0)
    assert(empty === Seq.fill(4)(Long.MaxValue))
  }
}
