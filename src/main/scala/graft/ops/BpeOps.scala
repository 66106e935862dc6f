package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding merge training — the tokenizer-construction step of
  * an LLM data pipeline (north-star surface; no reference file:line
  * exists — SURVEY §0). Classic BPE: start from characters, repeatedly
  * merge the most frequent adjacent symbol pair; the ordered merge list
  * IS the tokenizer.
  *
  * Scale design — the distributed shape real BPE trainers use: the
  * corpus is touched ONCE, collapsing to the word-frequency table (one
  * hash shuffle, map-side combined; at 100 TB the word-freq frame is
  * vocabulary-sized, orders of magnitude smaller than the corpus). Every
  * merge round then runs on that bounded frame: adjacent-pair counts are
  * a vocab-sized two-phase aggregate weighted by word frequency, the
  * winning pair is a TakeOrdered(1) with a total tie-break
  * (count DESC, left, right — deterministic across partitionings), and
  * the merge is applied map-side as a left fold over each word's symbol
  * array. Driver state per round is exactly ONE row (the winner) — the
  * same bounded-model-state pattern as Ivf/Pq. The vocab frame is
  * re-persisted each round so round k+1 reads a materialized O(vocab)
  * input, not a k-deep lineage.
  *
  * The greedy left-to-right fold matches the reference sub-after-sub
  * semantics: merging (l, r) in [a,a,a] yields [la+r, a] because the
  * just-merged symbol (the concatenation l+r) can never equal l again
  * (r is non-empty), so a fresh merge cannot chain onto its own output
  * within the same pass.
  */
object BpeOps {

  /** Word → its character symbol array. Train and encode MUST split
    * identically (encode parity with the trained merges breaks
    * otherwise), so this is the single definition both use. */
  private def charSyms(word: Column): Column =
    split(word, "").cast(ArrayType(StringType))

  /** One greedy left-to-right merge pass of pair (l, r) over a symbol
    * array: fold each symbol in, replacing a trailing `l` with `l+r`
    * when `r` arrives. */
  private def mergePass(syms: Column, l: String, r: String): Column =
    aggregate(
      syms,
      lit(Array.empty[String]),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(s))))

  /** Train `k` BPE merges over the token stream of `documents.text`.
    * Returns the ordered merge table: (rank, left, right, merged,
    * pair_count). Deterministic: ties on pair count break on (left,
    * right) lexicographically. */
  def trainMerges(s: SparkSession, dir: String, k: Int): DataFrame =
    // NOT fanned (re-measured r16): the fan's pre-shuffle parallelizes
    // only the tokenize→word-freq partial, but it also leaves the
    // persisted vocab frame at shuffle-parallelism partition count, and
    // the k training rounds then each schedule that many tasks over a
    // vocab-sized frame — k× the scheduler overhead for a one-time
    // partial-agg win. The r15 driver bench recorded the fanned shape
    // at 2× the unfanned wall (q_bpe_encode 1 s → 2 s).
    trainMergesFrom(s, Tables.documents(s, dir), k)

  /** [[trainMerges]] over an arbitrary documents frame (text column) —
    * the testable seam: results must not depend on the input's physical
    * layout. */
  def trainMergesFrom(s: SparkSession, docs: DataFrame, k: Int): DataFrame = {
    // corpus → word-frequency table: the ONLY corpus-sized stage, and the
    // only thing ever cached — each round re-derives its symbol arrays by
    // applying the accumulated merge list as a CHAINED column expression
    // over this base (vocab-sized compute, trivially cheap), which costs
    // one Spark job per round instead of a persist+materialize pair
    val base = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("syms", charSyms(col("word")))
      .select("syms", "freq")
      .persist()
    base.count() // materialize before the loop

    var symsCol: Column = col("syms") // base symbols + merges so far
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to k) {
      val top = base
        .withColumn("syms", symsCol)
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |i -> struct(element_at(syms, i) AS l,
            |            element_at(syms, i + 1) AS r))""".stripMargin))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect() // exactly one row: the round's model state
      if (top.nonEmpty) {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, l, r, n))
        symsCol = mergePass(symsCol, l, r)
      }
    }
    base.unpersist()
    import s.implicits._
    merges.result().toDF("rank", "left", "right", "pair_count")
      .withColumn("merged", concat(col("left"), col("right")))
      .select("rank", "left", "right", "merged", "pair_count")
      .orderBy("rank")
  }

  /** Top-8 BPE merges over the corpus (impl-only: iterative training is
    * not single-statement-SQL-expressible; BpeSpec pins it against a
    * sequential reference implementation). */
  val bpeTrain: Q = Q.implOnly("q_bpe_train") { (s, dir) =>
    trainMerges(s, dir, 8)
  }

  /** Tokenize a documents frame with an ordered merge list and report
    * per-source token economics: word/token/char totals plus integer
    * milli-ratios (tokens per word, chars per token — the "compression"
    * a tokenizer buys, the number that decides whose corpus fits the
    * training budget).
    *
    * Scale design — encode where the VOCABULARY is, not where the corpus
    * is: the greedy merge fold (k chained per-word passes) runs once per
    * DISTINCT word on the vocab frame, and the corpus-sized side only
    * does an equi-join back to (n_chars, n_tok) — at 100 TB the vocab is
    * orders of magnitude smaller than the token stream, and Catalyst
    * broadcasts it from AQE size stats (the frame is two ints per
    * distinct word; a web-scale vocab still fits, and if it ever did
    * not, the join key is already the shuffle key). The per-source
    * aggregate is map-side combined; every ratio is integer `div`
    * arithmetic — no FP, no fold-order sensitivity. */
  def encodeReport(s: SparkSession, docs: DataFrame,
                   merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val encoded = merges.foldLeft(charSyms(col("word"))) {
      case (acc, (l, r)) => mergePass(acc, l, r)
    }
    val vocabTok = words.select("word").distinct()
      .select(col("word"), length(col("word")).cast(LongType).as("w_chars"),
        size(encoded).cast(LongType).as("w_tok"))
    words.join(vocabTok, "word")
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"),
        sum(col("w_tok")).as("sum_tokens"),
        sum(col("w_chars")).as("sum_chars"))
      .withColumn("milli_tok_per_word",
        expr("sum_tokens * 1000 div n_words"))
      .withColumn("milli_chars_per_tok",
        expr("sum_chars * 1000 div sum_tokens"))
      .orderBy("source")
  }

  /** BPE APPLY — the other half of the tokenizer story: train 8 merges,
    * encode the corpus with them, report per-source token economics.
    * Impl-only (the merge table is iterative model state); BpeSpec pins
    * the encode against a sequential greedy reference. */
  val bpeEncode: Q = Q.implOnly("q_bpe_encode") { (s, dir) =>
    val merges = trainMerges(s, dir, 8).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // NOT fanned: same rule as trainMerges — the encode fold runs on the
    // DISTINCT-word vocab frame (post-shuffle, already parallel), so the
    // corpus side only tokenizes and joins; O(rows) map work
    encodeReport(s, Tables.documents(s, dir), merges)
  }

  val all: Seq[Q] = Seq(bpeTrain, bpeEncode)
}
