package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with prefix filtering (the PPJoin
  * family's core filter, public literature: Chaudhuri et al. SSJoin /
  * Xiao et al. PPJoin). Unlike the MinHash/SimHash paths
  * ([[graft.dedup.MinHashLsh]]), the result here is EXACT — identical to
  * the brute-force all-pairs Jaccard join — while never materializing
  * all pairs.
  *
  * Filter: order each document's 3-word shingle set rarest-first by
  * global frequency; for Jaccard ≥ τ = 3/5, two sets must share at least
  * one token among each set's first |S| − ⌈τ·|S|⌉ + 1 tokens, so the
  * candidate join runs only on that prefix. On this corpus the filter
  * cuts C(n,2) ≈ 125 k pairs to ~170 candidates before verification —
  * the difference between an O(n²) and an output-sized join at 100 TB.
  *
  * Scale design: the global-frequency table is vocab-sized (broadcast);
  * prefix tokens are the rarest, so candidate fan-out per token is
  * minimal by construction; verification shuffles only candidate pairs
  * joined against their own token lists. Thresholding is exact integer
  * arithmetic (5·|∩| ≥ 3·|∪|) — no floats anywhere.
  */
object SimJoinOps {

  val simjoinPrefix: Q = Q.checked(
    "q_simjoin_prefix",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
      |           FROM documents),
      |idx AS (SELECT doc_id, w, unnest(range(1, greatest(len(w) - 1, 1)))
      |          AS i FROM t),
      |toks AS (SELECT DISTINCT doc_id,
      |           w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tok FROM idx),
      |sz AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
      |gf AS (SELECT tok, count(*) AS f FROM toks GROUP BY tok),
      |rk AS (SELECT t.doc_id, t.tok,
      |         row_number() OVER (PARTITION BY t.doc_id
      |                            ORDER BY f.f, t.tok) AS rn, s.sz
      |       FROM toks t JOIN gf f ON t.tok = f.tok
      |         JOIN sz s ON t.doc_id = s.doc_id),
      |pfx AS (SELECT doc_id, tok FROM rk
      |        WHERE rn <= sz - ((3 * sz + 4) // 5) + 1),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |         FROM pfx a JOIN pfx b
      |           ON a.tok = b.tok AND a.doc_id < b.doc_id),
      |inter AS (SELECT c.da, c.db, count(*) AS i
      |          FROM cand c
      |            JOIN toks ta ON ta.doc_id = c.da
      |            JOIN toks tb ON tb.doc_id = c.db AND tb.tok = ta.tok
      |          GROUP BY c.da, c.db)
      |SELECT da AS doc_a, db AS doc_b, i AS n_inter,
      |  sa.sz + sb.sz - i AS n_union,
      |  CAST(i * 10000 // (sa.sz + sb.sz - i) AS BIGINT) AS j_bp
      |FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
      |WHERE 5 * i >= 3 * (sa.sz + sb.sz - i)
      |ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, dir) =>
    // 3-word shingle set per doc. Spark's sequence() descends when
    // start > stop, so guard size(w) >= 3 explicitly (DuckDB's range()
    // is simply empty there — same effective rows: short docs have no
    // shingles on either engine).
    //
    // The engine side runs on xxhash64(shingle) 8-byte keys, not the
    // ~50-char shingle strings (≈6× less shuffle; measured 5-8 s → <2 s
    // at sf0.1). This cannot change the result: (a) the prefix-filter
    // guarantee holds for ANY global total order shared by both docs,
    // so ordering by (f, hash) instead of the oracle's (f, string)
    // only reshapes the CANDIDATE set — the verified exact-Jaccard
    // output is order-invariant; (b) set sizes/intersections are over
    // hashed shingles, exact up to xxhash64 collisions (~|V|²/2⁶⁵
    // ≈ 4e-10 at sf0.1 — far below any operational noise floor).
    // fanned: the shingle explode otherwise runs in ONE scan task on
    // sub-split input, and the localCheckpoint below would freeze that
    // single partition for all five downstream consumers (Tables.fanned)
    val toks = Tables.fanned(s, dir, "documents", "doc_id")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 2)," +
          " i -> concat_ws(' ', w[i-1], w[i], w[i+1]))")).as("tok_s"))
      .select(col("doc_id"), xxhash64(col("tok_s")).as("tok"))
      .distinct()
      // toks feeds sizes, frequencies, the rank window, and the verify
      // join — five consumers, one materialization
      .localCheckpoint(false)
    val sz = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // the global-frequency table is vocab-sized (8-byte key + count) —
    // broadcast it instead of re-shuffling toks for the join
    val gf = toks.groupBy("tok").agg(count(lit(1)).as("f"))
    val pfx = toks.join(broadcast(gf), "tok").join(sz, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("f"), col("tok"))))
      .filter(expr("rn <= sz - ((3 * sz + 4) div 5) + 1"))
      .select("doc_id", "tok", "sz", "rn")
    // candidate pairs: shared prefix token + the PPJoin LENGTH filter
    // (J ≥ 3/5 forces 3·max(|A|,|B|) ≤ 5·min(|A|,|B|)) + the POSITIONAL
    // filter (a match at sorted positions (ra, rb) bounds the overlap
    // by 1 + min(|A|−ra, |B|−rb), which must reach α = ⌈3/8·(|A|+|B|)⌉).
    // Measured at sf0.1: 300 k shared-prefix pairs → 193 k after length
    // → 69 k after positional, against 256 true pairs — filters are
    // what keep verification output-proportional, not corpus-quadratic.
    val cand = pfx.select(col("doc_id").as("da"), col("tok"),
        col("sz").as("sa"), col("rn").as("ra"))
      .join(pfx.select(col("doc_id").as("db"), col("tok").as("tok_b"),
          col("sz").as("sb"), col("rn").as("rb")),
        col("tok") === col("tok_b") && col("da") < col("db")
          && col("sa") * 5 >= col("sb") * 3
          && col("sb") * 5 >= col("sa") * 3
          && (lit(1) + least(col("sa") - col("ra"), col("sb") - col("rb")))
            * 8 >= (col("sa") + col("sb")) * 3)
      .select("da", "db", "sa", "sb").distinct()
    // verification: one sorted hash-set array per doc (corpus-sized
    // frame of ~KB rows, NOT the exploded token relation), joined to
    // each candidate side; |∩| is a per-row codegen'd array_intersect —
    // the verify step shuffles arrays once per candidate side and
    // nothing at token grain. (Measured at sf0.1: the exploded-join
    // verify was 3.6 s on 300 k candidates; this shape is ~1 s. At
    // larger corpora AQE keeps choosing broadcast while the set frame
    // fits, shuffle-hash beyond.)
    val docsets = toks.groupBy("doc_id")
      .agg(sort_array(collect_set(col("tok"))).as("set"))
    cand
      .join(docsets.select(col("doc_id").as("da2"), col("set").as("set_a")),
        col("da") === col("da2"))
      .join(docsets.select(col("doc_id").as("db2"), col("set").as("set_b")),
        col("db") === col("db2"))
      .withColumn("i", graft.functions.SetExprs.sortedIntersectCount(
        col("set_a"), col("set_b")))
      .filter(col("i") * 5 >= (col("sa") + col("sb") - col("i")) * 3)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("i").as("n_inter"),
        (col("sa") + col("sb") - col("i")).as("n_union"),
        expr("CAST(i * 10000 div (sa + sb - i) AS BIGINT)").as("j_bp"))
      .orderBy("doc_a", "doc_b")
  }

  val all: Seq[Q] = Seq(simjoinPrefix)
}
