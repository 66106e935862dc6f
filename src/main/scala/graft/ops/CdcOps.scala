package graft.ops

import graft.{Q, Tables}
import graft.cdc.{CdcConfig, CdcMerge, Hashing}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC suite (SURVEY.md §2.2-I) — the reference's core semantics
  * [upstream `cdc.py`], exercised as deterministic synthetic batches over
  * the orders table so the DuckDB oracle can replay them exactly.
  *
  * Synthetic CDC fixture (fully deterministic, SURVEY §2.2 q_cdc_classify):
  *   prev = orders where o_orderkey % 10 != 0
  *   curr = orders where o_orderkey % 7  != 0,
  *          with o_totalprice bumped +1.00 where o_orderkey % 5 == 0
  * Key column: o_orderkey. Value columns: o_custkey, o_orderstatus,
  * o_totalprice (canonicalized per [[graft.cdc.Hashing]]).
  */
object CdcOps {
  private val cfg = CdcConfig(
    keyCols = Seq("o_orderkey"),
    valueCols = Seq("o_custkey", "o_orderstatus", "o_totalprice"))

  private def prev(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderkey") % 10 =!= 0)

  private def curr(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))

  /** Library path runs on 8-byte xxhash64 keys (half the shuffle bytes of
    * a 32-char md5 hex string — the 100 TB default); md5 appears only in
    * q_cdc_hash, where the oracle checks the hash bytes themselves. The
    * oracle CTE classifies via md5 equality — same op codes either way. */
  private def classified(s: SparkSession, dir: String): DataFrame =
    CdcMerge.classify(prev(s, dir), curr(s, dir), cfg, useXxhash64 = true)

  // ---- oracle SQL building blocks (mirror Hashing verbatim) ----
  private val khSql = s"md5(${Hashing.canonicalSql("o_orderkey", isFloating = false)})"
  private val nkhSql = "md5(concat_ws('|', " +
    Hashing.canonicalSql("o_custkey", isFloating = false) + ", " +
    Hashing.canonicalSql("o_orderstatus", isFloating = false) + ", " +
    Hashing.canonicalSql("o_totalprice", isFloating = true) + "))"

  /** WITH prev AS (...), curr AS (...), cls AS (full-outer classify) */
  private val clsCte: String =
    s"""WITH prev AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |         $khSql AS keyhash, $nkhSql AS nonkeyhash
       |  FROM orders WHERE o_orderkey % 10 <> 0),
       |curr AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |         $khSql AS keyhash, $nkhSql AS nonkeyhash
       |  FROM (SELECT o_orderkey, o_custkey, o_orderstatus,
       |          CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
       |               ELSE o_totalprice END AS o_totalprice
       |        FROM orders WHERE o_orderkey % 7 <> 0)),
       |cls AS (
       |  SELECT CASE WHEN c.keyhash IS NOT NULL THEN c.o_orderkey ELSE p.o_orderkey END AS o_orderkey,
       |         CASE WHEN c.keyhash IS NOT NULL THEN c.o_custkey ELSE p.o_custkey END AS o_custkey,
       |         CASE WHEN c.keyhash IS NOT NULL THEN c.o_orderstatus ELSE p.o_orderstatus END AS o_orderstatus,
       |         CASE WHEN c.keyhash IS NOT NULL THEN c.o_totalprice ELSE p.o_totalprice END AS o_totalprice,
       |         coalesce(c.keyhash, p.keyhash) AS keyhash,
       |         CASE WHEN p.keyhash IS NULL THEN 'I'
       |              WHEN c.keyhash IS NULL THEN 'D'
       |              WHEN p.nonkeyhash <> c.nonkeyhash THEN 'U'
       |              ELSE 'N' END AS op
       |  FROM prev p FULL OUTER JOIN curr c ON p.keyhash = c.keyhash)""".stripMargin

  /** R3 in scalar form: customer rows + keyhash + nonkeyhash. */
  val cdcHash: Q = Q.checked(
    "q_cdc_hash",
    s"""SELECT c_custkey,
       |  md5(${Hashing.canonicalSql("c_custkey", isFloating = false)}) AS keyhash,
       |  md5(concat_ws('|', ${Hashing.canonicalSql("c_name", isFloating = false)},
       |    ${Hashing.canonicalSql("c_nationkey", isFloating = false)},
       |    ${Hashing.canonicalSql("c_acctbal", isFloating = true)},
       |    ${Hashing.canonicalSql("c_mktsegment", isFloating = false)})) AS nonkeyhash
       |FROM customer ORDER BY c_custkey""".stripMargin
  ) { (s, dir) =>
    val c = CdcConfig(Seq("c_custkey"),
      Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    CdcMerge.withHashes(Tables.customer(s, dir), c)
      .select("c_custkey", CdcMerge.KeyHash, CdcMerge.NonKeyHash)
      .orderBy("c_custkey")
  }

  /** R5+R6 end-to-end classification. Checked output is (key, op) — the
    * hash is an internal join key, not part of the CDC contract. */
  val cdcClassify: Q = Q.checked(
    "q_cdc_classify",
    s"""$clsCte
       |SELECT o_orderkey, op FROM cls ORDER BY o_orderkey""".stripMargin
  ) { (s, dir) =>
    classified(s, dir)
      .select(col("o_orderkey"), col(CdcMerge.OpCol))
      .orderBy("o_orderkey")
  }

  /** R8: one aggregation, never count()-per-class. */
  val cdcCounts: Q = Q.checked(
    "q_cdc_counts",
    s"""$clsCte
       |SELECT op, count(*) AS count FROM cls GROUP BY op ORDER BY op""".stripMargin
  ) { (s, dir) => CdcMerge.counts(classified(s, dir)).orderBy("op") }

  /** R7: apply — next snapshot is everything but deletes. */
  val cdcApply: Q = Q.checked(
    "q_cdc_apply",
    s"""$clsCte
       |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
       |FROM cls WHERE op <> 'D' ORDER BY o_orderkey""".stripMargin
  ) { (s, dir) =>
    CdcMerge.applyChanges(classified(s, dir), cfg).orderBy("o_orderkey")
  }

  /** The change feed a downstream consumer reads (R9): I/U/D rows only,
    * stamped with a caller-supplied batch id (never current_timestamp —
    * SURVEY §7.5 rule 3). */
  val cdcFeed: Q = Q.checked(
    "q_cdc_feed",
    s"""$clsCte
       |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, op,
       |       CAST(42 AS BIGINT) AS batch_id
       |FROM cls WHERE op <> 'N' ORDER BY o_orderkey""".stripMargin
  ) { (s, dir) =>
    CdcMerge.changeFeed(classified(s, dir), batchId = 42L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col(CdcMerge.OpCol), col("batch_id"))
      .orderBy("o_orderkey")
  }

  /** Incrementally-maintained rollup ([[graft.cdc.IncrementalAgg]]):
    * bootstrap per-status (count, decimal sum) from PREV, then apply the
    * prev→curr change feed's signed deltas — never rescanning the table.
    * The oracle is a plain GROUP BY over CURR because the maintenance
    * algebra guarantees maintained == recompute exactly (decimal sums are
    * associative; updates retract old and add new). O(|changes|) per
    * batch is the CDC-at-scale payoff this engine exists for. */
  val incrAgg: Q = Q.checked(
    "q_incr_agg",
    """WITH curr AS (
      |  SELECT o_orderstatus,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 7 <> 0)
      |SELECT o_orderstatus, count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |    AS sum_o_totalprice
      |FROM curr GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, dir) =>
    import graft.cdc.IncrementalAgg
    val spec = IncrementalAgg.Spec(groupCols = Seq("o_orderstatus"),
      sumCols = Seq("o_totalprice"))
    val state0 = IncrementalAgg.init(prev(s, dir), spec)
    val feed = CdcMerge.classifyHashed(
      CdcMerge.withHashes(prev(s, dir), cfg, useXxhash64 = true),
      CdcMerge.withHashes(curr(s, dir), cfg, useXxhash64 = true),
      cfg, withPriors = true)
    IncrementalAgg.maintain(state0, feed, spec)
      .select(col("o_orderstatus"), col("cnt"),
        col("sum_o_totalprice").cast(org.apache.spark.sql.types.DoubleType)
          .as("sum_o_totalprice"))
      .orderBy("o_orderstatus")
  }

  /** Incrementally-maintained JOIN view ([[graft.cdc.IncrementalJoin]]):
    * bootstrap orders ⋈ customer from the PREV snapshots, then advance
    * one batch of two-sided churn — fact deletes, an FK MOVE
    * (o_custkey+1 on every 5th order — the case that must touch both the
    * old and new join key), price updates, dim deletes and value updates
    * — via affected-key maintenance. The oracle is a plain join+rollup
    * over the CURR snapshots because maintained == recompute exactly;
    * the rollup (5 rows, decimal sums) keeps the checked output compact
    * while hashing the whole maintained view's content through it. */
  val incrJoin: Q = Q.checked(
    "q_incr_join",
    """WITH lcurr AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_custkey + 1
      |         ELSE o_custkey END AS o_custkey,
      |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |rcurr AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1.0
      |         ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment
      |  FROM customer WHERE c_custkey % 11 <> 0)
      |SELECT c_mktsegment, count(*) AS n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
      |    AS sum_price
      |FROM lcurr JOIN rcurr ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, dir) =>
    import graft.cdc.IncrementalJoin
    val lCfg = CdcConfig(Seq("o_orderkey"),
      Seq("o_custkey", "o_totalprice"))
    val rCfg = CdcConfig(Seq("c_custkey"),
      Seq("c_acctbal", "c_mktsegment"))
    val spec = IncrementalJoin.Spec(Seq("o_custkey"), Seq("c_custkey"))
    val lPrev = Tables.orders(s, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lCurr = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 5 === 0, col("o_custkey") + 1)
          .otherwise(col("o_custkey")).as("o_custkey"),
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    val rPrev = Tables.customer(s, dir)
      .select("c_custkey", "c_acctbal", "c_mktsegment")
    val rCurr = Tables.customer(s, dir)
      .filter(col("c_custkey") % 11 =!= 0)
      .select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0, col("c_acctbal") + lit(1.0))
          .otherwise(col("c_acctbal")).as("c_acctbal"),
        col("c_mktsegment"))
    def feed(p: DataFrame, c: DataFrame, cfg: CdcConfig) =
      CdcMerge.classifyHashed(
        CdcMerge.withHashes(p, cfg, useXxhash64 = true),
        CdcMerge.withHashes(c, cfg, useXxhash64 = true),
        cfg, withPriors = true)
    val view0 = IncrementalJoin.init(lPrev, rPrev, spec)
    IncrementalJoin.maintain(view0, lCurr, feed(lPrev, lCurr, lCfg),
        rCurr, feed(rPrev, rCurr, rCfg), spec)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_price"))
      .orderBy("c_mktsegment")
  }

  /** Schema evolution through the merge
    * ([[graft.streaming.CdcBucketed.alignStateToConfig]]): the state was
    * hashed under the v1 config (no o_totalprice); the incoming batch
    * arrives with the evolved v2 schema, where upstream backfills the new
    * column LAZILY (every 3rd order) and also flips every 13th order's
    * status — the realistic DDL-change rollout. The state side is aligned
    * (null backfill + map-side value-hash recompute) and classified:
    * a matched row is U iff a surviving column actually differs OR the
    * new column arrived non-null; rows whose values are untouched and
    * whose new column is still null stay N — no spurious full-table
    * Update flood. Output: per-op row counts, backfill counts, exact
    * cent sums of the evolved column. */
  val cdcEvolve: Q = Q.checked(
    "q_cdc_evolve",
    """WITH prev AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus
      |  FROM orders WHERE o_orderkey % 10 <> 0),
      |curr AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 13 = 0 THEN 'X' ELSE o_orderstatus END
      |      AS o_orderstatus,
      |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS o_totalprice
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |cls AS (
      |  SELECT CASE WHEN p.o_orderkey IS NULL THEN 'I'
      |              WHEN c.o_orderkey IS NULL THEN 'D'
      |              WHEN (p.o_custkey IS DISTINCT FROM c.o_custkey)
      |                OR (p.o_orderstatus IS DISTINCT FROM c.o_orderstatus)
      |                OR (c.o_totalprice IS NOT NULL) THEN 'U'
      |              ELSE 'N' END AS op,
      |         CASE WHEN c.o_orderkey IS NOT NULL THEN c.o_totalprice
      |              END AS tp
      |  FROM prev p FULL OUTER JOIN curr c ON p.o_orderkey = c.o_orderkey)
      |SELECT op, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(tp) AS BIGINT) AS n_backfilled,
      |  coalesce(CAST(sum(CAST(CAST(tp AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT), 0) AS sum_cents
      |FROM cls GROUP BY op ORDER BY op""".stripMargin
  ) { (s, dir) =>
    import graft.streaming.CdcBucketed
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val cfgV1 = CdcConfig(Seq("o_orderkey"), Seq("o_custkey", "o_orderstatus"))
    val cfgV2 = CdcConfig(Seq("o_orderkey"),
      Seq("o_custkey", "o_orderstatus", "o_totalprice"))
    // the persisted-state shape: v1 columns + hashes computed under cfgV1
    val stateV1 = CdcMerge.withHashes(
      Tables.orders(s, dir).filter(col("o_orderkey") % 10 =!= 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus"),
      cfgV1, useXxhash64 = true)
    val batchV2 = Tables.orders(s, dir).filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderkey") % 13 === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        when(col("o_orderkey") % 3 === 0, col("o_totalprice"))
          .as("o_totalprice"))
    val classified = CdcMerge.classifyHashed(
      CdcBucketed.alignStateToConfig(stateV1, batchV2, cfgV2),
      CdcMerge.withHashes(batchV2, cfgV2, useXxhash64 = true),
      cfgV2)
    // D rows carry prev values, whose o_totalprice is the backfilled
    // null — matching the oracle's curr-side-only tp
    classified.groupBy(col(CdcMerge.OpCol).as("op"))
      .agg(count(lit(1)).as("n"),
        count(col("o_totalprice")).as("n_backfilled"),
        coalesce(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType)), lit(0L)).as("sum_cents"))
      .orderBy("op")
  }

  val all: Seq[Q] = Seq(cdcHash, cdcClassify, cdcCounts, cdcApply, cdcFeed,
    incrAgg, incrJoin, cdcEvolve)
}
