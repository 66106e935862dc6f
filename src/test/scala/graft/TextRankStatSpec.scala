package graft

import graft.ops.{StatOps, TextRankOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the round-4 text-rank and distribution-stat
  * operators (cross-engine value equality is the driver's DuckDB gate;
  * these pin the semantics the oracle can't see). */
class TextRankStatSpec extends AnyFunSuite with SparkFixture {

  test("q_chunk_docs: chunks tile every doc — coverage, stride, overlap") {
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = TextRankOps.chunkDocs.fn(spark, Sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("k"), sum("n_tok").as("tok_sum"),
        max("n_tok").as("max_tok"), min("n_tok").as("min_tok"))
      .collect()
    assert(chunks.length === docs.size) // every doc chunked, none dropped
    chunks.foreach { r =>
      val (id, k) = (r.getLong(0), r.getLong(1))
      val n = docs(id)
      val expectK = math.ceil(math.max(n - 32, 0) / 24.0).toLong + 1
      assert(k === expectK, s"doc $id n=$n")
      // stride 24 / size 32: total chunk tokens = n + 8*(k-1) (each
      // overlap region counted twice), proving exact 8-token overlap
      assert(r.getLong(2) === n + 8 * (k - 1), s"doc $id coverage")
      assert(r.getLong(3) <= 32 && r.getLong(4) >= 1)
    }
  }

  test("q_bm25: rarer term outranks common terms in idf; scores rank-consistent with tf within a doc-length class") {
    val rows = TextRankOps.bm25.fn(spark, Sf).collect()
    assert(rows.nonEmpty)
    val byTok = rows.groupBy(_.getString(0))
    // idf6 is constant per token and strictly decreasing in df
    val idf = byTok.map { case (t, rs) =>
      assert(rs.map(_.getLong(5)).distinct.length === 1, s"idf6 varies: $t")
      t -> rs.head.getLong(5)
    }
    assert(idf("dup") > idf("join") && idf("dup") > idf("spark"))
    // per token, rnk orders score descending (doc_id tiebreak)
    byTok.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      val scores = sorted.map(_.getDouble(6)).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }

  test("q_text_entropy: 0 <= H <= log2(dl), exact for uniform docs") {
    val out = TextRankOps.textEntropy.fn(spark, Sf).collect()
    val docs = Tables.documents(spark, Sf).count()
    assert(out.length === docs)
    out.foreach { r =>
      val (dl, h) = (r.getLong(2), r.getDouble(3))
      assert(h >= -1e-9 && h <= math.log(dl.toDouble) / math.log(2.0) + 1e-9,
        s"doc ${r.getLong(0)}: H=$h dl=$dl")
    }
    // brute-force check a handful of docs against plain Shannon entropy
    import spark.implicits._
    val sample = Tables.documents(spark, Sf).filter(col("doc_id") < 5)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val byId = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    sample.foreach { case (id, text) =>
      val tf = text.split(" ").groupBy(identity).map(_._2.length.toDouble)
      val n = tf.sum
      val expect = tf.map(c => -(c / n) * (math.log(c / n) / math.log(2.0))).sum
      assert(math.abs(byId(id) - expect) < 1e-6, s"doc $id")
    }
  }

  test("q_histogram: buckets partition the table; sums conserve") {
    val li = Tables.lineitem(spark, Sf)
    val out = StatOps.histogram.fn(spark, Sf).collect()
    assert(out.map(_.getLong(1)).sum === li.count())
    out.foreach { r =>
      val (b, lo, hi) = (r.getLong(0), r.getDouble(2), r.getDouble(3))
      assert(lo >= b * 5000.0 && (b === 19L || hi < (b + 1) * 5000.0),
        s"bucket $b bounds [$lo,$hi]")
    }
  }

  test("q_outliers: flagged values sit outside 2 sigma; counts bounded by Chebyshev") {
    StatOps.outliers.fn(spark, Sf).collect().foreach { r =>
      val (n, k) = (r.getLong(1), r.getLong(2))
      // Chebyshev: at most n/4 values beyond 2 sigma
      assert(k <= n / 4 + 1, s"${r.getString(0)}: $k of $n flagged")
    }
  }

  test("q_skyline: exactly the non-dominated set (brute-force check)") {
    val parts = Tables.part(spark, Sf)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expect = parts.filter { case (k, pr, sz) =>
      !parts.exists { case (k2, pr2, sz2) =>
        k2 != k && pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz)
      }
    }.map(_._1).toSet
    val got = StatOps.skyline.fn(spark, Sf).collect().map(_.getLong(0)).toSet
    assert(got === expect)
  }

  test("q_grouped_mode: matches brute-force mode per status") {
    val brute = Tables.orders(spark, Sf)
      .groupBy("o_orderstatus", "o_orderpriority").count()
      .collect()
      .groupBy(_.getString(0))
      .map { case (st, rs) =>
        st -> rs.map(r => (r.getString(1), r.getLong(2)))
          .sortBy { case (p, n) => (-n, p) }.head
      }
    val out = StatOps.groupedMode.fn(spark, Sf).collect()
    assert(out.length === brute.size)
    out.foreach { r =>
      val (p, n) = brute(r.getString(0))
      assert(r.getString(1) === p && r.getLong(2) === n)
    }
  }
}
