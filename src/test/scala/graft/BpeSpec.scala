package graft

import graft.ops.BpeOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed BPE trainer must equal a sequential reference
  * implementation exactly — same merges, same order, same counts. */
class BpeSpec extends AnyFunSuite with SparkFixture {

  /** Textbook sequential BPE on a word-frequency map: count adjacent
    * pairs weighted by word freq, take the (count DESC, left, right)
    * winner, merge greedily left-to-right, repeat. */
  private def referenceMerges(wordFreq: Map[String, Long],
                              k: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      wordFreq.groupMapReduce(kv => kv._1.split("").toVector)(_._2)(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to k) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _            =>
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, n))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          syms.foldLeft(Vector.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == l && s == r)
              acc.init :+ (l + r)
            else acc :+ s
          }
        }(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("q_bpe_train equals the sequential reference (merges, order, counts)") {
    val wordFreq = Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceMerges(wordFreq, 8)
    val got = BpeOps.bpeTrain.fn(spark, Sf).collect().map { r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))
    }.toSeq
    assert(got === want, s"distributed BPE diverged from reference")
    // merged symbol is the concatenation, ranks are dense from 1
    assert(got.map(_._1) === (1 to got.length))
    // counts are non-increasing only within equal alphabets — not a law —
    // but every count must be positive and <= the total token count
    val totalToks = wordFreq.values.sum
    got.foreach { case (_, _, _, n) => assert(n > 0 && n <= totalToks) }
  }

  /** Sequential greedy encode of one word under an ordered merge list —
    * the reference for the vocab-collapsed distributed encode. */
  private def referenceEncode(word: String,
                              merges: Seq[(String, String)]): Int =
    merges.foldLeft(word.split("").toVector) { case (syms, (l, r)) =>
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == l && s == r) acc.init :+ (l + r)
        else acc :+ s
      }
    }.length

  test("q_bpe_encode equals the sequential greedy encode, per source") {
    val merges = BpeOps.trainMerges(spark, Sf, 8).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val docs = Tables.documents(spark, Sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs
      .flatMap { case (src, text) =>
        text.split(" ").filter(_.nonEmpty).map(w =>
          (src, 1L, referenceEncode(w, merges).toLong, w.length.toLong))
      }
      .groupBy(_._1).view.mapValues { ws =>
        val (n, tok, ch) =
          (ws.map(_._2).sum, ws.map(_._3).sum, ws.map(_._4).sum)
        (n, tok, ch, tok * 1000 / n, ch * 1000 / tok)
      }.toMap
    val got = BpeOps.bpeEncode.fn(spark, Sf).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }.toMap
    assert(got === want)
    // merges must actually compress: fewer tokens than characters
    got.values.foreach { case (_, tok, ch, _, _) => assert(tok < ch) }
  }

  test("BPE trainer is layout-invariant (repartitioned corpus, same merges)") {
    val docs = Tables.documents(spark, Sf)
    val a = BpeOps.trainMergesFrom(spark, docs.repartition(17), 4)
      .collect().toSeq
    val b = BpeOps.trainMergesFrom(spark, docs.coalesce(1), 4)
      .collect().toSeq
    assert(a === b)
  }
}
